"""CLI — the `gdal vector pipeline` surface restated
(apps/gdal.cpp:78 -> apps/gdalalg_main.cpp; pipeline split on `!`,
apps/gdalalg_abstract_pipeline.cpp:804).

Usage:
  python -m gdal_ray vector pipeline \\
      'read path=/data/pts.parquet ! make-point ! clip clip_wkt="POLYGON((...))" ! write path=/tmp/out'
  python -m gdal_ray vector pipeline read path=a.parquet ! limit n=100 ! write path=/tmp/o
  python -m gdal_ray steps                    # list registered steps

Arguments are `key=value` pairs; values parse as JSON when possible
(numbers, lists, quoted strings), else raw strings. The CLI owns its Ray
session (guarded init, shutdown at exit).
"""

from __future__ import annotations

import json
import shlex
import sys


def _parse_val(v: str):
    try:
        return json.loads(v)
    except Exception:
        if "," in v and "(" not in v:
            return v.split(",")
        return v


def _parse_pipeline(tokens: list[str]):
    spec = []
    cur_name, cur_args = None, {}
    for tok in tokens:
        if tok == "!":
            if cur_name:
                spec.append((cur_name, cur_args))
            cur_name, cur_args = None, {}
        elif cur_name is None:
            cur_name = tok
        else:
            k, _, v = tok.partition("=")
            cur_args[k] = _parse_val(v)
    if cur_name:
        spec.append((cur_name, cur_args))
    return spec


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    from gdal_ray.pipelines.steps import STEPS, run_pipeline

    if argv[:1] == ["steps"]:
        for name in sorted(STEPS):
            print(name)
        return 0
    if argv[:2] != ["vector", "pipeline"]:
        print(__doc__)
        return 2
    rest = argv[2:]
    if len(rest) == 1:  # single quoted pipeline string
        rest = shlex.split(rest[0])
    spec = _parse_pipeline(rest)
    if not spec:
        print("empty pipeline", file=sys.stderr)
        return 2

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from gdal_ray.util import tune_data_context

    tune_data_context()
    try:
        ds = run_pipeline(spec)
        n = ds.count() if hasattr(ds, "count") else len(ds)
        names = " ! ".join(name for name, _ in spec)
        print(json.dumps({"pipeline": names, "rows": n}))
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
