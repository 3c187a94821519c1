"""OGR-SQL-subset compiler: SELECT over one table -> Ray Data pipeline.

The reference's SQL surface (ogr/swq_parser.y grammar, ogr/swq_select.cpp
planner, ogr/ogrsf_frmts/generic/ogr_gensql.cpp executor; dialect doc
doc/source/user/ogr_sql_dialect.rst:80) re-expressed as a hand-written
tokenizer + recursive-descent parser compiling to the repo's own operators:
WHERE/projection -> pyarrow.compute expressions in map_batches, GROUP BY ->
groupby_agg (combiner + tree merge), ORDER BY [LIMIT] -> topk / sort,
DISTINCT -> distinct.

Supported grammar (the OGR dialect subset that maps to our operator layer):

  SELECT [DISTINCT] expr [AS name] (, ...)
  FROM <table>
  [WHERE <boolean expr>]
  [GROUP BY col (, ...)]
  [ORDER BY col [ASC|DESC] (, ...)]
  [LIMIT n]

Expressions: identifiers, numeric/string literals, + - * / %, comparisons
= <> != < <= > >=, AND OR NOT, IN (...), [NOT] BETWEEN a AND b, [NOT] LIKE,
IS [NOT] NULL, CAST(x AS INTEGER|BIGINT|FLOAT|TEXT), and aggregates
COUNT(*) COUNT(x) SUM MIN MAX AVG. The same SQL string is DuckDB-runnable,
so every compiled query is oracle-checkable verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<str>'(?:[^']|'')*')|"
    r"(?P<id>[A-Za-z_][A-Za-z_0-9]*)|(?P<op><>|!=|<=|>=|[(),*=<>+\-/%]))"
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "WHERE", "GROUP", "ORDER", "BY", "LIMIT",
    "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE", "IS", "NULL", "AS", "ASC",
    "DESC", "CAST", "COUNT", "SUM", "MIN", "MAX", "AVG", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "TEXT", "VARCHAR",
}


def tokenize(sql: str):
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"SQL tokenize error at: {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            v = m.group("num")
            out.append(("num", float(v) if "." in v else int(v)))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id") is not None:
            w = m.group("id")
            out.append(("kw", w.upper()) if w.upper() in _KEYWORDS else ("id", w))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


# ---------------------------------------------------------------------------
# AST + parser
# ---------------------------------------------------------------------------


@dataclass
class Node:
    kind: str          # col | lit | bin | un | call | cast | in | between |
                       # like | isnull | agg | star
    value: Any = None
    args: tuple = ()


class Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, typ, val=None):
        t = self.next()
        if t[0] != typ or (val is not None and t[1] != val):
            raise ValueError(f"expected {typ} {val}, got {t}")
        return t

    def accept(self, typ, val=None):
        t = self.peek()
        if t[0] == typ and (val is None or t[1] == val):
            self.i += 1
            return True
        return False

    # -- expression grammar (precedence climbing) --
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        left = self.and_expr()
        while self.accept("kw", "OR"):
            left = Node("bin", "or", (left, self.and_expr()))
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.accept("kw", "AND"):
            left = Node("bin", "and", (left, self.not_expr()))
        return left

    def not_expr(self):
        if self.accept("kw", "NOT"):
            return Node("un", "not", (self.not_expr(),))
        return self.cmp_expr()

    def cmp_expr(self):
        left = self.add_expr()
        t = self.peek()
        neg = False
        if t == ("kw", "NOT"):
            self.next()
            neg = True
            t = self.peek()
        if t[0] == "op" and t[1] in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.next()
            node = Node("bin", {"!=": "<>"}.get(t[1], t[1]), (left, self.add_expr()))
        elif t == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            vals = [self.expr()]
            while self.accept("op", ","):
                vals.append(self.expr())
            self.expect("op", ")")
            node = Node("in", None, (left, tuple(vals)))
        elif t == ("kw", "BETWEEN"):
            self.next()
            lo = self.add_expr()
            self.expect("kw", "AND")
            hi = self.add_expr()
            node = Node("between", None, (left, lo, hi))
        elif t == ("kw", "LIKE"):
            self.next()
            node = Node("like", None, (left, self.add_expr()))
        elif t == ("kw", "IS"):
            self.next()
            isnot = self.accept("kw", "NOT")
            self.expect("kw", "NULL")
            node = Node("isnull", not isnot, (left,))
        else:
            if neg:
                raise ValueError("dangling NOT")
            return left
        return Node("un", "not", (node,)) if neg else node

    def add_expr(self):
        left = self.mul_expr()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("+", "-"):
                self.next()
                left = Node("bin", t[1], (left, self.mul_expr()))
            else:
                return left

    def mul_expr(self):
        left = self.unary()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("*", "/", "%"):
                self.next()
                left = Node("bin", t[1], (left, self.unary()))
            else:
                return left

    def unary(self):
        if self.accept("op", "-"):
            return Node("bin", "-", (Node("lit", 0), self.unary()))
        return self.atom()

    def atom(self):
        t = self.next()
        if t[0] == "num" or t[0] == "str":
            return Node("lit", t[1])
        if t == ("kw", "NULL"):
            return Node("lit", None)
        if t == ("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return e
        if t == ("op", "*"):
            return Node("star")
        if t == ("kw", "CAST"):
            self.expect("op", "(")
            e = self.expr()
            self.expect("kw", "AS")
            ty = self.next()
            self.expect("op", ")")
            return Node("cast", ty[1], (e,))
        if t[0] == "kw" and t[1] in ("COUNT", "SUM", "MIN", "MAX", "AVG"):
            self.expect("op", "(")
            if t[1] == "COUNT" and self.accept("op", "*"):
                self.expect("op", ")")
                return Node("agg", ("count_star", None))
            inner = self.expr()
            self.expect("op", ")")
            if inner.kind != "col":
                raise ValueError("aggregates support plain columns only")
            kinds = {"COUNT": "count", "SUM": "sum", "MIN": "min",
                     "MAX": "max", "AVG": "mean"}
            return Node("agg", (kinds[t[1]], inner.value))
        if t[0] == "id":
            return Node("col", t[1])
        raise ValueError(f"unexpected token {t}")


@dataclass
class Select:
    items: list          # [(Node, alias or None)]
    distinct: bool
    table: str
    where: Node | None
    group_by: list
    order_by: list       # [(col, desc)]
    limit: int | None


def parse_select(sql: str) -> Select:
    p = Parser(tokenize(sql))
    p.expect("kw", "SELECT")
    distinct = p.accept("kw", "DISTINCT")
    items = []
    while True:
        e = p.expr()
        alias = None
        if p.accept("kw", "AS"):
            alias = p.expect("id")[1]
        items.append((e, alias))
        if not p.accept("op", ","):
            break
    p.expect("kw", "FROM")
    table = p.expect("id")[1]
    where = None
    if p.accept("kw", "WHERE"):
        where = p.expr()
    group_by = []
    if p.accept("kw", "GROUP"):
        p.expect("kw", "BY")
        group_by.append(p.expect("id")[1])
        while p.accept("op", ","):
            group_by.append(p.expect("id")[1])
    order_by = []
    if p.accept("kw", "ORDER"):
        p.expect("kw", "BY")
        while True:
            col = p.expect("id")[1]
            desc = False
            if p.accept("kw", "DESC"):
                desc = True
            else:
                p.accept("kw", "ASC")
            order_by.append((col, desc))
            if not p.accept("op", ","):
                break
    limit = None
    if p.accept("kw", "LIMIT"):
        limit = int(p.expect("num")[1])
    p.expect("end")
    return Select(items, distinct, table, where, group_by, order_by, limit)


# ---------------------------------------------------------------------------
# evaluation (pyarrow.compute, per batch)
# ---------------------------------------------------------------------------


def eval_expr(node: Node, t: pa.Table):
    k = node.kind
    if k == "col":
        return t[node.value]
    if k == "lit":
        return pa.scalar(node.value)
    if k == "bin":
        a = eval_expr(node.args[0], t)
        b = eval_expr(node.args[1], t)
        op = node.value
        if op in ("+", "-", "*", "/", "%"):
            if op == "/":  # SQL: integer/integer stays exact in DuckDB as double
                a = pc.cast(a, pa.float64()) if not pa.types.is_floating(_type_of(a)) else a
                b = pc.cast(b, pa.float64()) if not pa.types.is_floating(_type_of(b)) else b
            fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
                  "/": pc.divide, "%": _sql_mod}[op]
            return fn(a, b)
        fn = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
              "and": pc.and_kleene, "or": pc.or_kleene}[op]
        return fn(a, b)
    if k == "un":
        return pc.invert(eval_expr(node.args[0], t))
    if k == "in":
        vals = [a.value for a in node.args[1]]
        return pc.is_in(eval_expr(node.args[0], t), value_set=pa.array(vals))
    if k == "between":
        x = eval_expr(node.args[0], t)
        return pc.and_(
            pc.greater_equal(x, eval_expr(node.args[1], t)),
            pc.less_equal(x, eval_expr(node.args[2], t)),
        )
    if k == "like":
        return pc.match_like(eval_expr(node.args[0], t), node.args[1].value)
    if k == "isnull":
        v = pc.is_null(eval_expr(node.args[0], t))
        return v if node.value else pc.invert(v)
    if k == "cast":
        ty = {"INTEGER": pa.int32(), "BIGINT": pa.int64(),
              "FLOAT": pa.float64(), "DOUBLE": pa.float64(),
              "TEXT": pa.string(), "VARCHAR": pa.string()}[node.value]
        v = eval_expr(node.args[0], t)
        if pa.types.is_integer(ty) and pa.types.is_floating(_type_of(v)):
            # DuckDB CAST(double AS INT) rounds half to EVEN (measured:
            # 900.5 -> 900), unlike its round() which is half-away
            v = pc.round(v, ndigits=0, round_mode="half_to_even")
        return pc.cast(v, ty)
    raise ValueError(f"cannot evaluate {k} here")


def _type_of(v):
    return v.type


def _sql_mod(a, b):
    # SQL % on integers: DuckDB truncates toward zero like C
    return _mod_impl(a, b)


def _mod_impl(a, b):
    q = pc.cast(
        pc.round(
            pc.divide(pc.cast(a, pa.float64()), pc.cast(b, pa.float64())),
            ndigits=0, round_mode="towards_zero",
        ),
        pa.int64(),
    )
    return pc.subtract(a, pc.multiply(q, b))


def _item_name(node: Node, alias, idx) -> str:
    if alias:
        return alias
    if node.kind == "col":
        return node.value
    return f"expr_{idx}"


def execute(sql: str, sf_dir: str):
    """Compile + run a SELECT against the sf_dir parquet tables."""
    from gdal_ray.ops.relational import distinct as op_distinct
    from gdal_ray.ops.relational import groupby_agg, topk
    from gdal_ray.util import read_table

    q = parse_select(sql)
    ds = read_table(sf_dir, q.table)

    if q.where is not None:
        where = q.where

        def filt(t: pa.Table) -> pa.Table:
            return t.filter(eval_expr(where, t))

        ds = ds.map_batches(filt, batch_format="pyarrow", batch_size=None)

    has_agg = any(item.kind == "agg" for item, _ in q.items)
    if has_agg or q.group_by:
        specs = []
        names = []
        for idx, (item, alias) in enumerate(q.items):
            name = _item_name(item, alias, idx)
            names.append(name)
            if item.kind == "agg":
                kind, col = item.value
                specs.append((name, kind, col))
            elif item.kind == "col":
                if item.value not in q.group_by:
                    raise ValueError(f"non-aggregated column {item.value}")
            else:
                raise ValueError("select items in GROUP BY mode must be columns or aggregates")
        out = groupby_agg(ds, q.group_by, specs)
        # order output columns as written
        def proj(t: pa.Table) -> pa.Table:
            return t.select(names)

        out = out.map_batches(proj, batch_format="pyarrow", batch_size=None)
    else:
        items = list(q.items)

        def project(t: pa.Table) -> pa.Table:
            cols = {}
            for idx, (item, alias) in enumerate(items):
                if item.kind == "star":
                    for c in t.column_names:
                        cols[c] = t[c]
                    continue
                v = eval_expr(item, t)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * len(t))
                cols[_item_name(item, alias, idx)] = v
            return pa.table(cols)

        # ORDER BY may reference source columns that the projection drops
        # (standard SQL); order/limit on the filtered source first, then
        # project — unless every order key survives projection
        out_cols = set()
        for idx, (item, alias) in enumerate(items):
            if item.kind != "star":
                out_cols.add(_item_name(item, alias, idx))
        order_pre = bool(q.order_by) and not all(c in out_cols for c, _ in q.order_by)
        if order_pre:
            if q.limit is not None:
                ds = topk(ds, q.order_by, q.limit)
            else:
                ds = ds.sort([c for c, _ in q.order_by],
                             descending=[d for _, d in q.order_by])
            out = ds.map_batches(project, batch_format="pyarrow", batch_size=None)
            if q.distinct:
                out = op_distinct(out, [c for c in _out_names(q)])
            return out
        out = ds.map_batches(project, batch_format="pyarrow", batch_size=None)

    if q.distinct:
        out = op_distinct(out, [c for c in _out_names(q)])
    if q.order_by:
        if q.limit is not None:
            out = topk(out, q.order_by, q.limit)
        else:
            out = out.sort([c for c, _ in q.order_by],
                           descending=[d for _, d in q.order_by])
    elif q.limit is not None:
        out = out.limit(q.limit)
    return out


def _out_names(q: Select):
    names = []
    for idx, (item, alias) in enumerate(q.items):
        if item.kind == "star":
            raise ValueError("DISTINCT * not supported")
        names.append(_item_name(item, alias, idx))
    return names
