"""PII redaction for web-text corpora: regex scrubbing of emails, phone
numbers, IPv4 addresses and SSN-shaped ids (the public C4/CCNet-style
cleanup step; patterns are the textbook ones, not lifted from anywhere).

Ray shape: pure Arrow kernel chain inside one `map_batches` —
`pc.replace_substring_regex` / `pc.count_substring_regex` are RE2, the
same engine DuckDB's regexp_replace uses, so the SQL oracle reproduces the
output byte-for-byte. No actor state, no Python rows; scales as a plain
streaming map."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied IN ORDER (email first so its
# digits/dots are gone before the looser ip/phone shapes run).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_table(t: pa.Table, text_col: str = "text",
                 out_col: str | None = None, counts: bool = True,
                 patterns=PII_PATTERNS) -> pa.Table:
    """Redact one batch; optionally append per-category match counts
    (counted on the ORIGINAL text, each pattern independently — the
    well-defined semantics an SQL oracle can restate)."""
    text = pc.cast(t[text_col], pa.string())
    red = text
    for _, pat, repl in patterns:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
    out = t.set_column(t.column_names.index(text_col),
                       out_col or text_col, red) \
        if out_col is None else t.append_column(out_col, red)
    if counts:
        for name, pat, _ in patterns:
            out = out.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(text, pattern=pat),
                        pa.int64()))
    return out


def redact_pii(ds, text_col: str = "text", out_col: str | None = None,
               counts: bool = True, patterns=PII_PATTERNS):
    """Dataset-level PII scrub: replaces matches in text_col (or appends
    out_col) and, with counts=True, appends n_email/n_ip/n_phone/n_ssn."""
    return ds.map_batches(
        lambda t: redact_table(t, text_col, out_col, counts, patterns),
        batch_format="pyarrow", batch_size=None)
