"""Minimal OpenMLDB-dialect SQL front-end for window queries.

Covers the shape that dominates the reference's YAML case corpus
(cases/function/window/*.yaml; grammar per
docs/en/reference/sql/dql/WINDOW_CLAUSE.md):

    SELECT <item, ...> FROM {0}
    WINDOW wN AS ([UNION {1},..] PARTITION BY {0}.k[, ...]
                  ORDER BY {0}.ts
                  ROWS|ROWS_RANGE BETWEEN <bound> AND <bound>
                  [MAXSIZE n] [EXCLUDE CURRENT_TIME]
                  [EXCLUDE CURRENT_ROW] [INSTANCE_NOT_IN_WINDOW])

where items are plain column refs or ``fn(args) OVER w AS alias``.
Everything else (expressions, subqueries, joins, HAVING, ...) is out of
scope — ``translate`` raises ``UnsupportedSQL`` and the case runner
counts it as a skip. This is NOT a general SQL engine; it exists so the
reference's own golden cases can drive ``window_agg`` directly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmldb_spark.operators.window_agg import Agg, WindowSpecFE, window_agg

_RID = "__case_rid"


class UnsupportedSQL(Exception):
    pass


_UNITS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

_AGG_FNS = {"sum", "count", "avg", "min", "max", "distinct_count",
            "first_value", "lag", "at", "top", "topn_frequency",
            "top1_ratio", "count_where", "sum_where", "avg_where",
            "min_where", "max_where"}


@dataclass
class _Win:
    name: str
    partition_by: list[str]
    order_by: str
    frame: str
    start: int
    end: int
    open_start: bool = False
    maxsize: int | None = None
    exclude_current_time: bool = False
    exclude_current_row: bool = False
    union_refs: list[int] = field(default_factory=list)
    instance_not_in_window: bool = False


def _strip_table(ref: str) -> str:
    ref = ref.strip().replace("`", "")
    m = re.match(r"\{\d+\}\.(\w+)$", ref)
    if m:
        return m.group(1)
    if re.match(r"^\w+$", ref):
        return ref
    raise UnsupportedSQL(f"column ref {ref!r}")


def _tbl_col(ref: str) -> tuple[int, str]:
    """'{i}.col' -> (i, col); bare col -> (0, col)."""
    ref = ref.strip().replace("`", "")
    m = re.match(r"\{(\d+)\}\.(\w+)$", ref)
    if m:
        return int(m.group(1)), m.group(2)
    if re.match(r"^\w+$", ref):
        return 0, ref
    raise UnsupportedSQL(f"column ref {ref!r}")


def _parse_bound(txt: str, frame: str,
                 is_end: bool = False) -> tuple[int, bool, bool]:
    """Returns (offset, open, exclude_self). An END bound of
    ``0 PRECEDING`` equals CURRENT ROW (inclusive — golden
    test_window_row_range.yaml#44/#47); exclude_self is reserved for
    future END variants and always False today."""
    t = txt.strip().lower()
    if t == "current row":
        return 0, False, False
    m = re.match(r"^(\d+)(ms|s|m|h|d)?\s+(open\s+)?preceding$", t)
    if not m:
        raise UnsupportedSQL(f"bound {txt!r}")
    val = int(m.group(1))
    unit = m.group(2)
    is_open = bool(m.group(3))
    excl_self = False
    if frame == "rows":
        if unit:
            raise UnsupportedSQL("unit on ROWS bound")
        return val, is_open, excl_self
    return val * _UNITS.get(unit or "ms", 1), is_open, excl_self


def _parse_window(name: str, body: str) -> _Win:
    b = " ".join(body.split())
    union_refs: list[int] = []
    mu = re.match(r"(?i)^\s*union\s+((?:\{\d+\}\s*,?\s*)+)(.*)$", b)
    if mu:
        union_refs = [int(x) for x in re.findall(r"\{(\d+)\}", mu.group(1))]
        b = mu.group(2)
    m = re.match(
        r"(?i)^\s*partition\s+by\s+(.+?)\s+order\s+by\s+(.+?)\s+"
        r"(rows_range|rows)\s+between\s+(.+?)\s+and\s+(.+?)\s*"
        r"(maxsize\s+\d+)?\s*(exclude\s+current_time)?\s*"
        r"(exclude\s+current_row)?\s*(instance_not_in_window)?\s*$", b)
    if not m:
        raise UnsupportedSQL(f"window body {body!r}")
    parts = [_strip_table(p) for p in m.group(1).split(",")]
    order = _strip_table(m.group(2))
    frame = "range" if m.group(3).lower() == "rows_range" else "rows"
    start, open_start, _ = _parse_bound(m.group(4), frame)
    end, open_end, end_excl_self = _parse_bound(m.group(5), frame,
                                                is_end=True)
    if open_end:
        raise UnsupportedSQL("OPEN end bound")
    maxsize = int(m.group(6).split()[1]) if m.group(6) else None
    return _Win(name, parts, order, frame, start, end, open_start, maxsize,
                exclude_current_time=bool(m.group(7)),
                exclude_current_row=bool(m.group(8)) or end_excl_self,
                union_refs=union_refs,
                instance_not_in_window=bool(m.group(9)))


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


@dataclass
class _Item:
    alias: str
    col: str | None = None           # plain column passthrough
    agg: Agg | None = None
    win: str | None = None


def _parse_item(item: str) -> _Item:
    it = " ".join(item.split())
    m = re.match(r"(?i)^(.*?)\s+over\s+(\w+)(?:\s+as\s+(\w+))?$", it)
    if m:
        call, win, alias = m.group(1), m.group(2), m.group(3)
        mc = re.match(r"(?i)^(\w+)\s*\(\s*(.*?)\s*\)$", call.strip())
        if not mc:
            raise UnsupportedSQL(f"agg call {call!r}")
        fn = mc.group(1).lower()
        if fn == "at":
            fn = "lag"
        if fn not in _AGG_FNS:
            raise UnsupportedSQL(f"agg fn {fn!r}")
        args = [a.strip() for a in _split_top_level(mc.group(2))] \
            if mc.group(2) else []
        col = None
        n = None
        if args:
            if args[0] == "*":
                col = None
            else:
                col = _strip_table(args[0])
        if fn in ("lag", "top", "topn_frequency") and len(args) > 1:
            n = int(args[1])
        if any("(" in a or "'" in a for a in args[1:]):
            raise UnsupportedSQL(f"complex agg args {args!r}")
        alias = alias or f"{fn}_{col}"
        return _Item(alias=alias, agg=Agg(alias, fn, col, n=n), win=win)
    m = re.match(r"(?i)^(\S+)(?:\s+as\s+(\w+))?$", it)
    if not m:
        raise UnsupportedSQL(f"select item {item!r}")
    col = _strip_table(m.group(1))
    return _Item(alias=m.group(2) or col, col=col)


def translate(sql: str) -> tuple[list[_Item], dict[str, _Win]]:
    """Parse the restricted dialect; returns (items, windows)."""
    s = " ".join(sql.strip().rstrip(";").split())
    m = re.match(r"(?i)^select\s+(.+?)\s+from\s+(?:\{0\}|`?\w+`?)\s*"
                 r"(?:window\s+(.+))?$", s)
    if not m:
        raise UnsupportedSQL("not a simple windowed SELECT")
    items = [_parse_item(i.strip()) for i in _split_top_level(m.group(1))]
    wins: dict[str, _Win] = {}
    if m.group(2):
        for wdef in _split_top_level(m.group(2)):
            mw = re.match(r"(?i)^\s*(\w+)\s+as\s*\((.*)\)\s*$",
                          wdef.strip())
            if not mw:
                raise UnsupportedSQL(f"window def {wdef!r}")
            wins[mw.group(1)] = _parse_window(mw.group(1), mw.group(2))
    for it in items:
        if it.win and it.win not in wins:
            raise UnsupportedSQL(f"unknown window {it.win!r}")
    return items, wins


def run_windowed_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Execute a restricted-dialect windowed SELECT against ``tables``
    ({0} = primary, {1}.. = WINDOW UNION tables). OpenMLDB storage order
    is emulated with an insertion-order row id as the tie-break
    (SURVEY.md §2.3: batch storage order; we always pin it)."""
    items, wins = translate(sql)
    prim = tables[0]
    if _RID not in prim.columns:
        raise UnsupportedSQL("primary table must carry __case_rid")

    out = prim
    for wname, w in wins.items():
        aggs = [it.agg for it in items if it.win == wname]
        if not aggs:
            continue
        union_dfs = []
        for ref in w.union_refs:
            if ref >= len(tables):
                raise UnsupportedSQL(f"missing union table {{{ref}}}")
            union_dfs.append(tables[ref])
        spec = WindowSpecFE(
            w.partition_by, w.order_by, frame=w.frame, start=w.start,
            end=w.end, open_start=w.open_start, maxsize=w.maxsize,
            exclude_current_time=w.exclude_current_time,
            exclude_current_row=w.exclude_current_row,
            union_dfs=union_dfs,
            instance_not_in_window=w.instance_not_in_window,
            tiebreak=(_RID,), peer="stream")
        # reference WindowUnion runtime quirk: SUM over an EMPTY frame
        # of a plain between-preceding UNION window is 0
        # (test_window.yaml#31 golden), while the same shape without
        # union (test_window_row_range.yaml#46) and union windows with
        # EXCLUDE CURRENT_ROW (test_current_row.yaml#18-21) keep SQL
        # NULL; emulate the narrow 0 case with a frame-count companion
        sum_aggs = [a for a in aggs if a.fn == "sum"] \
            if (w.union_refs and w.end > 0
                and not (w.exclude_current_row
                         or w.exclude_current_time)) else []
        frcnt = Agg(f"__frcnt_{wname}", "count", None) if sum_aggs else None
        res = window_agg(prim, spec, aggs + ([frcnt] if frcnt else []))
        cols = [_RID]
        for a in aggs:
            c = F.col(a.name)
            if frcnt is not None and a.fn == "sum":
                c = F.when((F.col(frcnt.name) == 0) & c.isNull(),
                           F.lit(0)).otherwise(c).alias(a.name)
            cols.append(c)
        res = res.select(*cols)
        out = out.join(res, on=_RID, how="left")
    sel = []
    for it in items:
        sel.append(F.col(it.col).alias(it.alias) if it.col
                   else F.col(it.alias))
    return out.select(_RID, *sel)


def run_lastjoin_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Execute ``SELECT cols FROM {0} LAST JOIN {1} [ORDER BY {1}.c]
    ON <equi [AND equi]* [AND {1}.t <= {0}.t]>``.

    Without ORDER BY the reference takes the last match in storage order
    (JOIN_CLAUSE.md; batch: arbitrary) — emulated deterministically with
    the right table's insertion row-id.
    """
    from openmldb_spark.operators.last_join import last_join

    s = " ".join(sql.strip().rstrip(";").split())
    m = re.match(
        r"(?i)^select\s+(.+?)\s+from\s+\{0\}\s+last\s+join\s+\{1\}\s*"
        r"(?:order\s+by\s+(\S+)\s*)?on\s+(.+)$", s)
    if not m:
        raise UnsupportedSQL("not a simple LAST JOIN")
    items = [_tbl_col(re.sub(r"(?i)\s+as\s+\w+$", "", it.strip()))
             for it in _split_top_level(m.group(1))]
    order_col = _strip_table(m.group(2)) if m.group(2) else None
    left, right = tables[0], tables[1]

    keys, left_ts, right_ts = [], None, None
    for cond in re.split(r"(?i)\s+and\s+", m.group(3)):
        mc = re.match(r"^(\S+)\s*(<=|=|==)\s*(\S+)$", cond.strip())
        if not mc:
            raise UnsupportedSQL(f"join condition {cond!r}")
        lt, lc = _tbl_col(mc.group(1))
        rt, rc = _tbl_col(mc.group(3))
        op = mc.group(2)
        if op in ("=", "=="):
            if lt == rt or lc != rc:
                raise UnsupportedSQL(f"equi cond {cond!r}")
            keys.append(lc)
        else:  # <=  : {1}.t <= {0}.t or reversed
            if lt == 1 and rt == 0:
                right_ts, left_ts = lc, rc
            elif lt == 0 and rt == 1:
                raise UnsupportedSQL("left <= right bound")
            else:
                raise UnsupportedSQL(f"cond {cond!r}")
    if not keys:
        raise UnsupportedSQL("no equi keys")

    order_by = order_col or _RID
    # a selected RIGHT key column must be NULL on unmatched left rows,
    # while the join equi-key itself survives as the left value — carry
    # a copy of each right key under a reserved name
    right2 = right
    for k in keys:
        right2 = right2.withColumn(f"__rk_{k}", F.col(k))
    out = last_join(left, right2, on=keys, order_by=order_by,
                    left_ts=left_ts, right_ts=right_ts,
                    strategy="join_rank", tiebreak=_RID)
    sel = [F.col(_RID)]
    for i_, (ti, col) in enumerate(items):
        if ti == 0:
            sel.append(F.col(col).alias(f"__o{i_}"))
        elif col in keys:
            sel.append(F.col(f"__rk_{col}").alias(f"__o{i_}"))
        else:
            name = col + "_r" if col in left.columns else col
            sel.append(F.col(name).alias(f"__o{i_}"))
    return out.select(*sel)
