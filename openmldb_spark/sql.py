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
                           F.lit(0)).otherwise(c)
            if a.fn == "sum" and a.col and a.col in prim.columns:
                st = dict(prim.dtypes)[a.col]
                if st in ("int", "smallint"):
                    # reference sum(int32/int16) keeps the narrow type
                    # and wraps (test_window.yaml#21 golden)
                    c = _wrap_narrow(c, st)
            cols.append(c.alias(a.name))
        res = res.select(*cols)
        out = out.join(res, on=_RID, how="left")
    sel = []
    for it in items:
        sel.append(F.col(it.col).alias(it.alias) if it.col
                   else F.col(it.alias))
    return out.select(_RID, *sel)


def _wrap_narrow(c, spark_type: str):
    """int32/int16 wraparound of a widened sum (reference keeps the
    narrow type and wraps; ANSI cast would throw on overflow)."""
    bits = 32 if spark_type == "int" else 16
    half = 1 << (bits - 1)
    full = 1 << bits
    return (F.pmod(c + F.lit(half), F.lit(full)) - F.lit(half)) \
        .cast(spark_type)


def run_lastjoin_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Execute ``SELECT cols FROM {0} (LAST JOIN {i} [ORDER BY {i}.c]
    ON <conds>)+`` — chained as-of joins (cluster/window_and_lastjoin
    cases chain two). Conditions: same- or different-name equi keys and
    one closed point-in-time bound per join (``{0}.t >= {i}.t2`` or
    ``{i}.t2 <= {0}.t``). Without ORDER BY the reference takes the last
    match in storage order — emulated with the right table's insertion
    row-id."""
    from openmldb_spark.operators.last_join import last_join

    s = " ".join(sql.strip().rstrip(";").split())
    m = re.match(r"(?i)^select\s+(.+?)\s+from\s+\{0\}\s+(last\s+join\s+.+)$",
                 s)
    if not m:
        raise UnsupportedSQL("not a LAST JOIN select")
    parts = re.split(r"(?i)\blast\s+join\b", " " + m.group(2))
    joins = []
    for part in parts[1:]:
        mj = re.match(r"(?i)^\s*\{(\d+)\}\s*"
                      r"(?:order\s+by\s+(\S+)\s+)?on\s+(.+?)\s*$", part)
        if not mj:
            raise UnsupportedSQL(f"join segment {part!r}")
        joins.append((int(mj.group(1)), mj.group(2), mj.group(3)))

    acc = tables[0]
    resmap: dict[tuple[int, str], str] = {}

    def resolve(ti: int, col: str) -> str:
        if ti == 0:
            return col
        try:
            return resmap[(ti, col)]
        except KeyError:
            raise UnsupportedSQL(f"unresolved ref {{{ti}}}.{col}")

    for ti, order_ref, conds_text in joins:
        if ti >= len(tables):
            raise UnsupportedSQL(f"missing table {{{ti}}}")
        right = tables[ti]
        keys = []            # accumulated-side key names
        key_src = {}         # acc key name -> original right col
        left_ts = right_ts = None
        for cond in re.split(r"(?i)\s+and\s+", conds_text):
            mc = re.match(r"^(\S+)\s*(<=|>=|=|==)\s*(\S+)$", cond.strip())
            if not mc:
                raise UnsupportedSQL(f"join condition {cond!r}")
            at, ac = _tbl_col(mc.group(1))
            bt, bc = _tbl_col(mc.group(3))
            op = mc.group(2)
            # normalize to (acc side, right side)
            if at == ti and bt != ti:
                at, ac, bt, bc = bt, bc, at, ac
                op = {"<=": ">=", ">=": "<="}.get(op, op)
            if bt != ti or at == ti:
                raise UnsupportedSQL(f"cond {cond!r}")
            if op in ("=", "=="):
                an = resolve(at, ac)
                keys.append(an)
                key_src[an] = bc
            elif op == ">=":     # acc.t >= right.t2  (closed PIT bound)
                left_ts, right_ts = resolve(at, ac), bc
            else:
                raise UnsupportedSQL(f"bound {cond!r}")
        if not keys:
            raise UnsupportedSQL("no equi keys")

        # collision-free right side: every payload column carries a
        # reserved __t{i}_ name so chained joins and same-name columns
        # can never become ambiguous; join keys are aliased to the
        # accumulated-side names
        sel_r = [F.col(key_src[an]).alias(an) for an in keys]
        sel_r += [F.col(c).alias(f"__t{ti}_{c}")
                  for c in tables[ti].columns if c != _RID]
        if _RID in right.columns:
            sel_r.append(F.col(_RID).alias(f"__jrid{ti}"))
        right2 = right.select(*sel_r)
        if right_ts is not None:
            right_ts = f"__t{ti}_{right_ts}"
        order_by = f"__t{ti}_{_strip_table(order_ref)}" if order_ref \
            else f"__jrid{ti}"
        acc = last_join(acc, right2, on=keys, order_by=order_by,
                        left_ts=left_ts, right_ts=right_ts,
                        strategy="join_rank", tiebreak=f"__jrid{ti}")
        for c in tables[ti].columns:
            if c != _RID:
                resmap[(ti, c)] = f"__t{ti}_{c}"

    def resolve_any(ref: str) -> str:
        ti, col = _tbl_col(ref)
        if re.match(r"\{\d+\}\.", ref.strip()):
            return resolve(ti, col)
        # bare name: first table owning it, in join order
        if col in tables[0].columns:
            return col
        for tj, _, _ in joins:
            if col in tables[tj].columns:
                return resolve(tj, col)
        raise UnsupportedSQL(f"unknown column {col!r}")

    sel = [F.col(_RID)]
    for i_, raw in enumerate(_split_top_level(m.group(1))):
        it = " ".join(raw.split())
        mo = re.match(r"(?i)^(\S+)(?:\s+as\s+(\w+))?$", it)
        if not mo:
            raise UnsupportedSQL(f"select item {it!r}")
        sel.append(F.col(resolve_any(mo.group(1))).alias(f"__o{i_}"))
    return acc.select(*sel)


def run_join_window_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Composite ``SELECT ... FROM {0} LAST JOIN {1} [ORDER BY {1}.o]
    ON <equis> WINDOW w AS (PARTITION BY ... ORDER BY ... frame)`` —
    the reference's flagship shape (join/test_lastjoin_complex.yaml,
    cluster/window_and_lastjoin.yaml): as-of join first, then per-row
    windows over the JOINED relation (window columns may come from
    either side). UNION windows over the joined schema are out of
    scope here."""
    from openmldb_spark.operators.last_join import last_join

    s = " ".join(sql.strip().rstrip(";").split())
    m = re.match(
        r"(?i)^select\s+(.+?)\s+from\s+\{0\}\s+last\s+join\s+\{1\}\s*"
        r"(?:order\s+by\s+(\S+)\s*)?on\s+(.+?)\s+window\s+(.+)$", s)
    if not m:
        raise UnsupportedSQL("not a LAST JOIN + WINDOW composite")
    left, right = tables[0], tables[1]

    keys, left_ts, right_ts = [], None, None
    for cond in re.split(r"(?i)\s+and\s+", m.group(3)):
        mc = re.match(r"^(\S+)\s*(<=|=|==)\s*(\S+)$", cond.strip())
        if not mc:
            raise UnsupportedSQL(f"join condition {cond!r}")
        lt, lc = _tbl_col(mc.group(1))
        rt, rc = _tbl_col(mc.group(3))
        if mc.group(2) in ("=", "=="):
            if lt == rt:
                raise UnsupportedSQL(f"equi cond {cond!r}")
            if lc != rc:
                # differing names: align by renaming the right key
                right = right.withColumnRenamed(rc, lc)
            keys.append(lc)
        else:
            if lt == 1 and rt == 0:
                right_ts, left_ts = lc, rc
            else:
                raise UnsupportedSQL(f"cond {cond!r}")
    if not keys:
        raise UnsupportedSQL("no equi keys")
    right2 = right
    for k in keys:
        right2 = right2.withColumn(f"__rk_{k}", F.col(k))
    # keep the right rid under a reserved name: storage-order fallback
    # and deterministic tie-break
    if _RID in right2.columns:
        right2 = right2.withColumnRenamed(_RID, "__r_rid")
    jorder = _strip_table(m.group(2)) if m.group(2) else "__r_rid"
    joined = last_join(left, right2, on=keys, order_by=jorder,
                       left_ts=left_ts, right_ts=right_ts,
                       strategy="join_rank", tiebreak="__r_rid")

    def resolve(ref: str) -> str:
        ti, col = _tbl_col(ref)
        if ti == 0:
            return col
        if col in keys:
            return f"__rk_{col}"
        return col + "_r" if col in left.columns else col

    # parse select items with table-qualified resolution
    items = []
    for raw in _split_top_level(m.group(1)):
        it = " ".join(raw.split())
        mo = re.match(r"(?i)^(.*?)\s+over\s+(\w+)(?:\s+as\s+(\w+))?$", it)
        if mo:
            mc2 = re.match(r"(?i)^(\w+)\s*\(\s*(.*?)\s*\)$",
                           mo.group(1).strip())
            if not mc2 or mc2.group(1).lower() not in _AGG_FNS:
                raise UnsupportedSQL(f"agg call {mo.group(1)!r}")
            fn = mc2.group(1).lower()
            fn = "lag" if fn == "at" else fn
            args = [a.strip() for a in _split_top_level(mc2.group(2))] \
                if mc2.group(2) else []
            col = resolve(args[0]) if args and args[0] != "*" else None
            n = int(args[1]) if len(args) > 1 and fn in (
                "lag", "top", "topn_frequency") else None
            alias = mo.group(3) or f"{fn}_{col}"
            items.append(_Item(alias=alias, agg=Agg(alias, fn, col, n=n),
                               win=mo.group(2)))
        else:
            mo2 = re.match(r"(?i)^(\S+)(?:\s+as\s+(\w+))?$", it)
            if not mo2:
                raise UnsupportedSQL(f"select item {it!r}")
            col = resolve(mo2.group(1))
            items.append(_Item(alias=mo2.group(2) or col, col=col))

    wins: dict[str, _Win] = {}
    for wdef in _split_top_level(m.group(4)):
        mw = re.match(r"(?i)^\s*(\w+)\s+as\s*\((.*)\)\s*$", wdef.strip())
        if not mw:
            raise UnsupportedSQL(f"window def {wdef!r}")
        # resolve table-qualified refs to joined column names BEFORE
        # parsing so {1}.c7 becomes c7_r etc.
        body = re.sub(r"\{\d+\}\.\w+", lambda mm: resolve(mm.group(0)),
                      mw.group(2))
        if re.search(r"(?i)union\s+\{", body):
            raise UnsupportedSQL("UNION window over joined relation")
        wins[mw.group(1)] = _parse_window(mw.group(1), body)

    out = joined
    for wname, w in wins.items():
        aggs = [it.agg for it in items if it.win == wname]
        if not aggs:
            continue
        spec = WindowSpecFE(
            w.partition_by,
            w.order_by, frame=w.frame, start=w.start, end=w.end,
            open_start=w.open_start, maxsize=w.maxsize,
            exclude_current_time=w.exclude_current_time,
            exclude_current_row=w.exclude_current_row,
            tiebreak=(_RID,), peer="stream")
        res = window_agg(joined, spec, aggs)
        sel2 = [F.col(_RID)]
        for a in aggs:
            c = F.col(a.name)
            if a.fn == "sum" and a.col and a.col in dict(joined.dtypes):
                st = dict(joined.dtypes)[a.col]
                if st in ("int", "smallint"):
                    c = _wrap_narrow(c, st)
            sel2.append(c.alias(a.name))
        res = res.select(*sel2)
        out = out.join(res, on=_RID, how="left")
    sel = [F.col(_RID)]
    for i_, it in enumerate(items):
        sel.append(F.col(it.col if it.col else it.alias).alias(f"__o{i_}"))
    return out.select(*sel)
