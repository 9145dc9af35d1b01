"""OpenMLDB-dialect SQL front-end.

Exists so the reference's own golden YAML corpus (its cross-engine
consistency mechanism, SURVEY.md §5.1 — 41 files / 465 passing cases)
can drive this engine directly. Two complementary paths:

1. **Window / LAST JOIN runners** (``run_windowed_sql``,
   ``run_lastjoin_sql``, ``run_join_window_sql``) parse the dialect's
   non-standard core — WINDOW clauses with the OpenMLDB frame
   extensions (ROWS_RANGE, MAXSIZE, EXCLUDE CURRENT_TIME/ROW, UNION
   tables, INSTANCE_NOT_IN_WINDOW, inline anonymous windows), LAST JOIN
   chains with ORDER BY / point-in-time bounds / θ-residuals, windowed
   expressions with embedded aggregates, and the FeatureZero
   window-split compositions — and execute them through ``window_agg``
   / ``last_join`` (grammar: docs/en/reference/sql/dql/
   WINDOW_CLAUSE.md, JOIN_CLAUSE.md).
2. **General-SELECT transpiler** (``run_general_sql``) rewrites
   everything else — scalar expressions, WHERE, GROUP BY / HAVING,
   LIMIT, subqueries — to Spark SQL text (``rewrite_expr``: cast
   function forms, scalar renames, fz_* families, CST-local date
   parts, epoch-ms timestamp casts, array literals) plus cross-type
   coercion wraps matching the reference's C++ runtime (string-vs-any
   lexical compare, timestamp±int ms arithmetic, bool arithmetic
   promotion, NOT-truthiness), then lets Catalyst run it (ANSI off:
   cast-failure→NULL, integer wraparound — the reference's semantics).

Shapes outside both paths raise ``UnsupportedSQL`` and the case runner
counts them as skips, mirroring the reference's own offline-unsupport
tagging. The production API remains the typed Python surface
(``window_agg``/``last_join``/...); this module is the SQL adapter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmldb_spark.operators.window_agg import Agg, WindowSpecFE, window_agg

_RID = "__case_rid"


class UnsupportedSQL(Exception):
    pass


_UNITS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

_AGG_FNS = {"sum", "count", "avg", "median", "min", "max", "distinct_count",
            "first_value", "lag", "at", "top", "topn_frequency",
            "top1_ratio", "count_where", "sum_where", "avg_where",
            "min_where", "max_where"}
# categorical families: {base}_cate(value, cate), {base}_cate_where(value,
# cond, cate), top_n_{key,value}_{base}_cate_where(value, cond, cate, n)
# (reference agg_by_category_def.cc / containers.h)
_CATE_CALL = re.compile(
    r"^(?:top_n_(key|value)_)?(count|sum|avg|min|max)_cate(_where)?$")
for _b in ("count", "sum", "avg", "min", "max"):
    _AGG_FNS |= {f"{_b}_cate", f"{_b}_cate_where",
                 f"top_n_key_{_b}_cate_where", f"top_n_value_{_b}_cate_where",
                 f"top_n_key_{_b}_cate", f"top_n_value_{_b}_cate"}


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


def _skip_literal(s: str, i: int) -> int:
    """Index just past the string literal opening at ``i`` — honors
    backslash escapes and doubled quotes (``'it''s'``, ``'a\\'b'``),
    so a ``--`` or ``/*`` inside string *content* is never treated as
    a comment/terminator (ADVICE r3 low #3)."""
    q, j, n = s[i], i + 1, len(s)
    while j < n:
        c = s[j]
        if c == "\\":
            j += 2
        elif c == q:
            if j + 1 < n and s[j + 1] == q:    # doubled quote
                j += 2
            else:
                return j + 1
        else:
            j += 1
    return n


def strip_sql_comments(s: str) -> str:
    """Drop ``-- …`` line comments and ``/* … */`` block comments
    outside string literals. The reference's lexer accepts both (its
    fz/usecase case SQL is heavily ``--``-commented, e.g.
    cases/usecase/autox.yaml); the runners flatten whitespace early,
    which would otherwise glue a comment onto real tokens."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            j = _skip_literal(s, i)
            out.append(s[i:j])
            i = j
        elif c == "-" and s.startswith("--", i):
            j = s.find("\n", i)
            i = n if j < 0 else j        # keep the newline itself
        elif c == "/" and s.startswith("/*", i):
            j = s.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_NOT_ALIAS_KW = {"last", "left", "inner", "on", "where", "window",
                 "group", "order", "limit", "union", "having", "as"}

_JOIN_OPERAND_RE = re.compile(
    r"(?i)\b(from|last\s+join)\s+`?\{(\d+)\}`?"
    r"(?:\s+(?:as\s+)?`?"
    r"(?!(?:last|left|inner|on|where|window|group|order|limit|union"
    r"|having|as)\b)"          # keyword after the operand ≠ an alias —
    r"([A-Za-z_]\w*)`?)?")     # and must stay unconsumed for the next
                               # `last join` match to anchor on it


def _inline_join_aliases(s: str, tables: list) -> tuple[str, list]:
    """Give every LAST JOIN operand its own table slot.

    ``LAST JOIN {i} [AS] a`` clones ``{i}`` to a fresh ``{vi}`` when the
    operand is aliased or ``{i}`` was already joined (chained self-joins:
    function/test_index_optimized.yaml#4 joins the same table twice under
    t1/t2 with different ORDER BY — the reference resolves each alias as
    an independent relation, hybridse name resolution binds per
    table-ref, not per physical table), then rewrites ``a.`` refs to
    ``{vi}.``. Without cloning, the chain executors' per-table-index
    column prefixes collide and the second join silently reads the
    first's payload."""
    tables = list(tables)
    seen: set[int] = {0}         # a LAST JOIN back to {0} must clone too
    aliases: list[tuple[str, int]] = []

    def repl(mm: re.Match) -> str:
        kw, ti, alias = mm.group(1), int(mm.group(2)), mm.group(3)
        if alias and alias.lower() in _NOT_ALIAS_KW:
            # keyword mis-captured as alias: restore the consumed token
            return f"{kw} {{{ti}}} {alias}"
        is_join = kw.lower() != "from"
        vi = ti
        if is_join and (alias or ti in seen):
            vi = len(tables)
            tables.append(tables[ti])
        if is_join:
            seen.add(vi)
        if alias:
            aliases.append((alias, vi))
        return f"{kw} {{{vi}}}"

    s = _JOIN_OPERAND_RE.sub(repl, s)
    names = [a for a, _ in aliases]
    if len(set(names)) != len(names):
        # two operands reusing one alias would rewrite both ref sets to
        # whichever slot the loop visits last — refuse loudly instead
        # (the reference's resolver errors on ambiguous aliases too)
        raise UnsupportedSQL(f"duplicate join alias in {names}")
    for alias, vi in aliases:
        # outside string literals only: an alias token inside a literal
        # ('see t2.x') must not be rewritten (ADVICE r3 low #4)
        s = _outside_quotes(
            s, lambda seg: re.sub(
                rf"`?\b{re.escape(alias)}\b`?\s*\.", f"{{{vi}}}.", seg))
    return s, tables


def _parse_bound(txt: str, frame: str,
                 is_end: bool = False) -> tuple[int, bool, bool]:
    """Returns (offset, open, exclude_self). An END bound of
    ``0 PRECEDING`` equals CURRENT ROW (inclusive — golden
    test_window_row_range.yaml#44/#47). An OPEN end bound excludes the
    endpoint: ROWS ``v OPEN PRECEDING`` ≡ ``v+1 PRECEDING``; ROWS_RANGE
    keeps only ``ts' < ts - v`` ≡ ``v+1ms PRECEDING`` on integer-ms
    order keys (integration_test/window/test_current_row.yaml#12/#13
    goldens: the same-ts peer row drops out too). exclude_self is
    reserved and always False today."""
    t = txt.strip().lower()
    if t == "current row":
        return 0, False, False
    m = re.match(r"^(\d+)(ms|s|m|h|d)?\s+(open\s+)?preceding$", t)
    if not m:
        raise UnsupportedSQL(f"bound {txt!r}")
    val = int(m.group(1))
    unit = m.group(2)
    is_open = bool(m.group(3))
    if frame == "rows":
        if unit:
            raise UnsupportedSQL("unit on ROWS bound")
        if is_end and is_open:
            return val + 1, False, False
        return val, is_open, False
    ms = val * _UNITS.get(unit or "ms", 1)
    if is_end and is_open:
        return ms + 1, False, False
    return ms, is_open, False


def _parse_window(name: str, body: str) -> _Win:
    b = " ".join(body.split())
    union_refs: list[int] = []
    mu = re.match(r"(?i)^\s*union\s+((?:\{\d+\}\s*,?\s*)+)(.*)$", b)
    if mu:
        union_refs = [int(x) for x in re.findall(r"\{(\d+)\}", mu.group(1))]
        b = mu.group(2)
    m = re.match(
        r"(?i)^\s*partition\s+by\s+(.+?)\s+order\s+by\s+(.+?)\s+"
        r"(rows_range|rows)\s+between\s+(.+?)\s+and\s+(.+?)"
        r"((?:\s+maxsize\s+\d+)?(?:\s+(?:exclude\s+current_time"
        r"|exclude\s+current_row|instance_not_in_window))*)\s*$", b)
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
    # EXCLUDE/INSTANCE options appear in any order after the optional
    # MAXSIZE (test_current_row.yaml#17 allows ROW-then-TIME; #30 pins
    # MAXSIZE *after* an EXCLUDE as a syntax error)
    tail = m.group(6) or ""
    mm = re.search(r"(?i)maxsize\s+(\d+)", tail)
    return _Win(name, parts, order, frame, start, end, open_start,
                int(mm.group(1)) if mm else None,
                exclude_current_time=bool(
                    re.search(r"(?i)exclude\s+current_time", tail)),
                exclude_current_row=bool(
                    re.search(r"(?i)exclude\s+current_row", tail))
                or end_excl_self,
                union_refs=union_refs,
                instance_not_in_window=bool(
                    re.search(r"(?i)instance_not_in_window", tail)))


def _split_conjuncts(text: str) -> list[str]:
    """Split an ON/WHERE conjunction on top-level ``AND``, keeping a
    ``[NOT] BETWEEN x AND y``'s inner AND attached to its predicate
    (between_predicate_1-3 golden cases) and ignoring ANDs inside
    parens or quotes."""
    out, cur, depth, q, pending_between = [], [], 0, None, 0
    toks = re.split(r"(\s+)", text)
    for tok in toks:
        low = tok.lower()
        if q is None and depth == 0 and low == "and" and pending_between:
            pending_between -= 1
            cur.append(tok)
            continue
        if q is None and depth == 0 and low == "and":
            out.append("".join(cur))
            cur = []
            continue
        for ch in tok:
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if q is None and depth == 0 and low == "between":
            pending_between += 1
        cur.append(tok)
    out.append("".join(cur))
    return [c.strip() for c in out if c.strip()]


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    out, depth, cur = [], 0, []
    quote = None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
            continue
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
    expr: str | None = None          # non-window scalar expression (SQL)
    arg_expr: str | None = None      # agg input as expression (SQL)
    post: str | None = None          # expression suffix around the agg
    hidden: list | None = None       # [(hidden_name, Agg)] inside expr
    slots: dict | None = None        # cate-family expr args by slot
    pre: list | None = None          # [(hidden, Agg)] nested in agg args


_AGG_ALIASES = {"at": "lag", "fz_top1_ratio": "top1_ratio",
                "fz_topn_frequency": "topn_frequency"}

# FeatureZero window-split inner calls -> (mode, arity)
_SPLIT_INNER = {
    "fz_window_split": ("all", 2), "window_split": ("all", 2),
    "fz_window_split_by_key": ("key", 3), "window_split_by_key": ("key", 3),
    "fz_window_split_by_value": ("value", 3),
    "window_split_by_value": ("value", 3),
}
# outer aggregate over a split list -> kernel fn
_SPLIT_OUTER = {"distinct_count": "distinct_count_split",
                "count": "count_split", "top1_ratio": "top1_ratio_split",
                "topn_frequency": "topn_frequency_split",
                "fz_join": "join_split", "join": "join_split"}

# cheap guard: does an argument text plausibly contain an aggregate
# call? (gates the nested-UDAF lifting so plain conds/exprs keep their
# exact pre-round-4 handling)
_NESTED_AGG_RE = re.compile(
    r"(?i)\b(" + "|".join(sorted(_AGG_FNS | set(_AGG_ALIASES),
                                 key=len, reverse=True)) + r")\s*\(")


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    raise UnsupportedSQL(f"expected string literal, got {s!r}")


def _parse_split_inner(text: str):
    mc = re.match(r"(?is)^(\w+)\s*\(\s*(.*)\s*\)$", text.strip())
    if not mc or mc.group(1).lower() not in _SPLIT_INNER:
        return None
    mode, arity = _SPLIT_INNER[mc.group(1).lower()]
    args = [a.strip() for a in _split_top_level(mc.group(2))]
    if len(args) != arity:
        raise UnsupportedSQL(f"{mc.group(1)} arity {len(args)}")
    col = _strip_table(args[0])
    sep = _unquote(args[1])
    kv = _unquote(args[2]) if arity == 3 else None
    return col, sep, kv, mode


def _parse_agg_call(name: str, argstext: str, alias: str) -> Agg | None:
    """Build an Agg from ``fn(args)`` if fn is an aggregate (including
    the FeatureZero split compositions); None if fn is not an agg."""
    fn = _AGG_ALIASES.get(name.lower(), name.lower())
    args = [a.strip() for a in _split_top_level(argstext)] \
        if argstext.strip() else []
    inner = _parse_split_inner(args[0]) if args else None
    if inner is not None:
        if fn not in _SPLIT_OUTER:
            raise UnsupportedSQL(f"{fn} over a window-split list")
        col, sep, kv, mode = inner
        n = jsep = None
        if fn == "topn_frequency":
            n = int(args[1])
        elif fn in ("fz_join", "join"):
            jsep = _unquote(args[1])
        return Agg(alias, _SPLIT_OUTER[fn], col, n=n, split_sep=sep,
                   split_kv=kv, split_mode=mode, join_sep=jsep)
    if fn not in _AGG_FNS:
        return None
    mcate = _CATE_CALL.match(fn)
    if mcate:
        topn_kind, base, has_where = mcate.groups()
        want = 2 + (1 if has_where else 0) + (1 if topn_kind else 0)
        if len(args) != want:
            raise UnsupportedSQL(f"{fn} expects {want} args, got {args!r}")
        it = iter(args)
        # value / category / n accept full expressions (the reference's
        # UDAF args are ordinary update args — hybridsql_gen_cases/
        # auto_gen_case_0.yaml passes arithmetic, scalar calls and a
        # column-valued n); non-column texts are recorded as slot
        # expressions for the item builder to materialize
        slot_exprs: dict[str, str] = {}
        a0 = next(it)
        try:
            col = _strip_table(a0)
        except UnsupportedSQL:
            col, slot_exprs["col"] = None, a0
        cond = next(it) if has_where else None
        c0 = next(it)
        try:
            cate = _strip_table(c0)
        except UnsupportedSQL:
            cate, slot_exprs["cate"] = None, c0
        n = None
        if topn_kind:
            ntext = next(it)
            try:
                n = int(ntext)
            except ValueError:
                slot_exprs["n"] = ntext
        out_fn = (f"top_n_{topn_kind}_{base}_cate" if topn_kind
                  else f"{base}_cate")
        a = Agg(alias, out_fn, col, cond=cond, cate=cate, n=n)
        if slot_exprs:
            a._slot_exprs = slot_exprs     # picked up by the item builder
        return a
    col = cond = None
    n = None
    arg_expr = None
    if args:
        if args[0] == "*":
            col = None
        else:
            try:
                col = _strip_table(args[0])
            except UnsupportedSQL:
                arg_expr = args[0]     # expression input
    if fn in ("lag", "top", "topn_frequency") and len(args) > 1:
        if len(args) > 2:
            raise UnsupportedSQL(f"extra agg args {args!r}")
        try:
            n = int(args[1])
        except ValueError:
            raise UnsupportedSQL(f"non-literal count arg {args[1]!r}")
    elif fn.endswith("_where") and len(args) > 1:
        if len(args) > 2:
            raise UnsupportedSQL(f"extra agg args {args!r}")
        cond = args[1]
    elif len(args) > 1:
        raise UnsupportedSQL(f"extra agg args {args!r}")
    a = Agg(alias, fn, col, cond=cond, n=n)
    a._arg_expr = arg_expr            # picked up by the item builder
    return a


def _extract_window_aggs(text: str, sink: list,
                         prefix: str = "__wagg") -> str:
    """Replace aggregate calls inside an expression with hidden column
    refs (collected into ``sink``); recurses into non-aggregate calls —
    the reference allows e.g. ``identity(CASE WHEN isnull(lag(c, 0))
    THEN ... ELSE distinct_count(fz_window_split(c, ',')) END)`` over a
    window (test_feature_zero_function.yaml#1, fz_sql.yaml)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"":
            # escape-aware skip (_skip_literal): 'a\'b' / 'it''s' must
            # not close early and expose literal content to the scanner
            j = _skip_literal(text, i)
            out.append(text[i:j])
            i = j
            continue
        m = _IDENT_RE.match(text, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        k = j
        while k < n and text[k].isspace():
            k += 1
        if k < n and text[k] == "(":
            depth, p = 1, k + 1
            while p < n and depth:
                c = text[p]
                if c in "'\"":
                    q = p + 1
                    while q < n and text[q] != c:
                        q += 1
                    p = q
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                p += 1
            inner = text[k + 1:p - 1]
            hid = f"{prefix}_{len(sink)}"
            agg = _parse_agg_call(name, inner, hid)
            if agg is not None:
                if getattr(agg, "_arg_expr", None):
                    raise UnsupportedSQL(
                        f"expression input inside nested agg {name}")
                if getattr(agg, "_slot_exprs", None) \
                        or (agg.cond and _NESTED_AGG_RE.search(agg.cond)):
                    # slot-expression / current-row-cond rewiring only
                    # happens for top-level items
                    raise UnsupportedSQL(
                        f"unsupported args inside nested agg {name}")
                sink.append((hid, agg))
                out.append(hid)
            else:
                out.append(name)
                out.append("(")
                out.append(_extract_window_aggs(inner, sink, prefix))
                out.append(")")
            i = p
            continue
        out.append(name)
        i = j
    return "".join(out)


def _extract_over_calls(text: str, sink: list,
                        prefix: str = "__wagg") -> tuple[str, str | None]:
    """Extract every ``fn(args) OVER w`` embedded anywhere in an
    expression (``CASE WHEN !isnull(lag(ts,1) OVER w1) THEN … END``,
    usecase/autox.yaml) into hidden agg refs. Returns (rewritten_text,
    window_name); all extracted calls must share one window — the
    runner joins one window result per item."""
    wins: set[str] = set()
    out = text
    while True:
        mo = re.search(r"(?i)\)\s*over\s+(\w+)", out)
        if not mo:
            break
        wins.add(mo.group(1))
        close = mo.start()                 # index of the ')'
        depth, i = 0, close
        while i >= 0:
            c = out[i]
            if c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if i < 0:
            raise UnsupportedSQL("unbalanced parens before OVER")
        mn = re.search(r"(\w+)\s*$", out[:i])
        if not mn:
            raise UnsupportedSQL("OVER not preceded by a call")
        hid = f"{prefix}_{len(sink)}"
        inner = out[i + 1:close].strip()
        agg = _parse_agg_call(mn.group(1), inner, hid)
        if agg is not None:
            if getattr(agg, "_arg_expr", None):
                raise UnsupportedSQL(
                    f"expression input inside embedded OVER "
                    f"{mn.group(1)!r}")
            if getattr(agg, "_slot_exprs", None) \
                    or (agg.cond and _NESTED_AGG_RE.search(agg.cond)):
                raise UnsupportedSQL(
                    f"unsupported args inside embedded OVER "
                    f"{mn.group(1)!r}")
            sink.append((hid, agg))
            repl = hid
        else:
            # scalar call carrying the OVER: its INTERNAL aggs are the
            # window calls (`!isnull(lag(c,0)) OVER w`, fz_ddl/
            # test_myhug.yaml — hybridse evaluates the wrapped aggs in
            # the window's context)
            n0 = len(sink)
            newinner = _extract_window_aggs(inner, sink, prefix)
            if len(sink) == n0:
                raise UnsupportedSQL(
                    f"non-aggregate {mn.group(1)!r} OVER window")
            repl = f"{mn.group(1)}({newinner})"
        out = out[:mn.start(1)] + repl + out[mo.end():]
    if len(wins) > 1:
        raise UnsupportedSQL("multiple windows in one expression item")
    return out, (wins.pop() if wins else None)


def _split_top_binop(text: str):
    """Split ``text`` at its single top-level binary arithmetic
    operator (outside parens/quotes, unary signs skipped). Returns
    (left, op, right) or None."""
    t = text.strip()
    depth, q, prev = 0, None, ""
    ops: list[tuple[int, str]] = []
    for i, ch in enumerate(t):
        if q:
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            prev = ch
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "+-*/":
            if ch in "+-" and (prev == "" or prev in "+-*/%(,=<>"):
                pass                       # unary sign
            else:
                ops.append((i, ch))
        if not ch.isspace():
            prev = ch
    if len(ops) != 1:
        return None
    i, ch = ops[0]
    return t[:i].strip(), ch, t[i + 1:].strip()


def _decompose_nested_agg_arg(fn: str, arg: str, cond: str | None) -> str:
    """Rewrite ``OUTER(P <op> INNER_AGG(...)[, cond])`` into a scalar
    expression over PLAIN windowed aggregates.

    Reference semantics (pinned by test_udaf_function.yaml#53 golden —
    ``sum(col1 + count(col1))`` = sum(col1) + count(col1)^2): a UDAF
    nested in another UDAF's update argument is evaluated over the
    CURRENT OUTPUT ROW's frame, i.e. it is a per-output-row constant Q;
    the outer aggregate then folds ``f(row_j, Q)`` over the frame. For
    a top-level binary op this decomposes exactly:
      sum(P+Q)=sum(P)+count(P)*Q  avg(P+Q)=avg(P)+Q  min(P+Q)=min(P)+Q
      min(Q-P)=Q-max(P)  min(P*Q)=CASE sign(Q)  count(P op Q)=count(P)
    with NULL/empty-frame semantics preserved (sum over empty -> NULL
    propagates through the arithmetic; count gets an explicit Q-NULL
    guard). The rewritten text re-enters the windowed-EXPRESSION path,
    so every emitted agg is an ordinary (native-plannable) window call.
    """
    fn = _AGG_ALIASES.get(fn.lower(), fn.lower())
    has_w = fn.endswith("_where")
    base = fn[:-6] if has_w else fn
    if base not in ("sum", "avg", "min", "max", "count"):
        raise UnsupportedSQL(f"nested UDAF argument in {fn}")
    if cond and _NESTED_AGG_RE.search(cond):
        raise UnsupportedSQL("nested UDAF in both arg and cond")
    sp = _split_top_binop(_strip_outer_parens(arg.strip()))
    if not sp:
        raise UnsupportedSQL(f"nested UDAF argument shape {arg!r}")
    a, op, b = sp
    ha = bool(_NESTED_AGG_RE.search(a))
    hb = bool(_NESTED_AGG_RE.search(b))
    if ha == hb:
        raise UnsupportedSQL("nested UDAF on both/neither operand")
    p, qtext, q_left = (b, a, True) if ha else (a, b, False)
    qs = _strip_outer_parens(qtext.strip())
    mq = re.match(r"(?is)^(\w+)\s*\(", qs)
    if not mq or _balanced_span(qs, qs.index("(")) != len(qs):
        # the agg-bearing operand must be a lone aggregate call — a
        # mixed expression would need per-row re-evaluation
        raise UnsupportedSQL(f"nested UDAF operand {qtext!r}")
    w = "_where" if has_w else ""
    c = f", {cond}" if has_w else ""
    Q = f"({qs})"

    def mk(f: str) -> str:
        return f"{f}{w}({p}{c})"

    if base == "sum":
        if op == "+":
            return f"({mk('sum')} + {mk('count')} * {Q})"
        if op == "-":
            return (f"({mk('count')} * {Q} - {mk('sum')})" if q_left
                    else f"({mk('sum')} - {mk('count')} * {Q})")
        if op == "*":
            return f"({mk('sum')} * {Q})"
        if op == "/" and not q_left:
            # P/0 nulls every arg -> NULL sum; nullif keeps that
            # contract under ANSI mode too
            return f"({mk('sum')} / nullif({Q}, 0))"
    elif base == "avg":
        if op == "+":
            return f"({mk('avg')} + {Q})"
        if op == "-":
            return (f"({Q} - {mk('avg')})" if q_left
                    else f"({mk('avg')} - {Q})")
        if op == "*":
            return f"({mk('avg')} * {Q})"
        if op == "/" and not q_left:
            return f"({mk('avg')} / nullif({Q}, 0))"
    elif base in ("min", "max"):
        me, other = (mk("min"), mk("max")) if base == "min" \
            else (mk("max"), mk("min"))
        if op == "+":
            return f"({me} + {Q})"
        if op == "-":
            return f"({Q} - {other})" if q_left else f"({me} - {Q})"
        if op == "*":
            # a negative constant flips the extremum; NULL Q falls to
            # the ELSE branch and nulls out either way
            return (f"(CASE WHEN {Q} >= 0 THEN {me} * {Q} "
                    f"ELSE {other} * {Q} END)")
    elif base == "count":
        if op == "/" and q_left:
            raise UnsupportedSQL("nested UDAF numerator in count")
        z = f" OR {Q} = 0" if op == "/" else ""
        return f"(CASE WHEN {Q} IS NULL{z} THEN 0 ELSE {mk('count')} END)"
    raise UnsupportedSQL(f"nested UDAF op {op!r} in {fn}")


def _split_top_eq(text: str):
    """Split at the single top-level ``=``/``==`` (outside parens and
    quotes; <=, >=, !=, <> excluded). Returns (lhs, rhs) or None."""
    t = text
    depth, q = 0, None
    pos: list[tuple[int, int]] = []
    i = 0
    while i < len(t):
        ch = t[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "=" and depth == 0:
            prev = t[i - 1] if i else ""
            if prev not in "<>!=":
                if i + 1 < len(t) and t[i + 1] == "=":
                    pos.append((i, i + 2))
                    i += 1
                else:
                    pos.append((i, i + 1))
        i += 1
    if len(pos) != 1:
        return None
    s, e = pos[0]
    return t[:s].strip(), t[e:].strip()


def _rewrite_cur_cond(agg, alias: str, pre: list) -> None:
    """``count_where(v, L = R)`` where R contains nested aggregates:
    the aggregate side is evaluated at the CURRENT output row's frame
    (test_udaf_function.yaml#47/#48 goldens — ifnull(first_value(c1),
    'a') / ifnull(lag(c1, 0), 'a') is the current row's value), the
    plain side per buffered row. Inner aggs lift into pre-agg columns
    (row-i binding); the kernel then counts frame rows whose L equals
    the row's R with a sliding counter (O(rows), not O(rows·frame))."""
    if agg.fn != "count_where":
        raise UnsupportedSQL(
            f"nested UDAF in {agg.fn} condition")
    sp = _split_top_eq(agg.cond)
    if not sp:
        raise UnsupportedSQL(
            f"nested UDAF condition shape {agg.cond!r}")
    a, b = sp
    ha = bool(_NESTED_AGG_RE.search(a))
    hb = bool(_NESTED_AGG_RE.search(b))
    if ha == hb:
        raise UnsupportedSQL("nested UDAF on both/neither cond side")
    ltxt, rtxt = (b, a) if ha else (a, b)
    rtxt = _extract_window_aggs(rtxt, pre, prefix=f"__wpre_{alias}")
    agg.cond = None
    agg._cond_cur = (ltxt, rtxt)


def _parse_item(item: str) -> _Item:
    it = " ".join(item.split())
    # trailing `AS alias` first (lazy-left + $-anchor: an `as` inside a
    # parenthesized CAST never matches because ')' follows the word)
    alias0 = None
    ma = re.match(r"(?is)^(.*?)\s+as\s+(`?\w+`?)$", it)
    if ma:
        it, alias0 = ma.group(1), ma.group(2).strip("`")
    m = re.match(r"(?i)^(.*?\))\s+over\s+(\w+)\s*(.*)$", it)
    if m:
        try:
            call, win, post, alias = (m.group(1), m.group(2),
                                      m.group(3).strip() or None, alias0)
            if post and re.search(r"(?i)\bover\b", post):
                # `sum(a) over w + sum(b) over w`: the post suffix
                # holds ANOTHER windowed call — F.expr over it would
                # reference a window Spark doesn't know; route to the
                # _extract_over_calls fallback, which computes
                # same-window arithmetic correctly
                raise UnsupportedSQL("windowed call in post suffix")
            mc = re.match(r"(?is)^(\w+)\s*\(\s*(.*)\s*\)$", call.strip())
            if not mc:
                raise UnsupportedSQL(f"agg call {call!r}")
            agg = _parse_agg_call(mc.group(1), mc.group(2), alias or "_")
            if agg is not None:
                arg_expr = getattr(agg, "_arg_expr", None)
                if arg_expr is not None \
                        and _NESTED_AGG_RE.search(arg_expr):
                    # UDAF-in-UDAF VALUE argument (auto_gen_case_0:
                    # min_where(c3 + sum_where(c3, c4), c5); golden
                    # test_udaf_function.yaml#53 sum(col1+count(col1))):
                    # the inner aggregate is a PER-OUTPUT-ROW constant
                    # (evaluated over the current row's frame), so the
                    # call decomposes algebraically into plain windowed
                    # aggs combined in a scalar post-expression — fully
                    # native, no O(n·frame) path
                    call = _decompose_nested_agg_arg(
                        mc.group(1), arg_expr, agg.cond)
                    agg = None
            if agg is not None:
                alias = alias or f"{agg.fn}_{agg.col}"
                agg.name = alias
                arg_expr = getattr(agg, "_arg_expr", None)
                slots = dict(getattr(agg, "_slot_exprs", None) or {})
                pre: list = []
                for slot, txt in list(slots.items()):
                    if txt is not None and _NESTED_AGG_RE.search(txt):
                        if slot != "n":
                            raise UnsupportedSQL(
                                f"nested UDAF in {slot} argument")
                        # the top-n bound is read at the CURRENT output
                        # row — lift inner aggs into pre-agg columns
                        # (row-i binding via the pre-agg window pass)
                        slots[slot] = _extract_window_aggs(
                            txt, pre, prefix=f"__wpre_{alias}")
                if agg.cond and _NESTED_AGG_RE.search(agg.cond):
                    # `*_where(v, expr = AGG(...))` — the aggregate side
                    # of the equality is bound at the CURRENT output
                    # row (test_udaf_function.yaml#47/#48 goldens:
                    # first_value/lag(c,0) = the current row's value),
                    # compared against every buffered row. Kernel
                    # counter path; count_where only.
                    _rewrite_cur_cond(agg, alias, pre)
                return _Item(alias=alias, agg=agg, win=win,
                             arg_expr=arg_expr, post=post,
                             slots=slots or None, pre=pre or None)
            # windowed EXPRESSION: aggs embedded in a scalar expression
            sink: list = []
            newtext = _extract_window_aggs(call.strip(), sink,
                                           prefix=f"__wagg_{alias or win}")
            if not sink:
                raise UnsupportedSQL(
                    f"no aggregate in windowed item {it!r}")
            if not alias:
                raise UnsupportedSQL(f"windowed expression without "
                                     f"alias: {item!r}")
            if post:
                newtext = f"({newtext}) {post}"
            return _Item(alias=alias, win=win, expr=newtext, hidden=sink)
        except UnsupportedSQL:
            # OVER calls embedded mid-expression (`CASE WHEN
            # !isnull(lag(ts,1) OVER w1) THEN … END AS f`): extract
            # every one into a hidden agg ref and treat the remainder
            # as a scalar expression over the joined window result
            if alias0:
                sink2: list = []
                newtext2, win2 = _extract_over_calls(
                    it, sink2, prefix=f"__wagg_{alias0}")
                if sink2 and win2:
                    return _Item(alias=alias0, win=win2, expr=newtext2,
                                 hidden=sink2)
            raise
    m = re.match(r"(?i)^(\S+)$", it)
    if m and not re.match(r"^[\d.'\"]", it):
        # numeric/string literals can't be column refs — let them fall
        # to the expression path (unaliased -> UnsupportedSQL -> the
        # general Spark-SQL runner names the output after the literal,
        # select_sample.yaml#14 `select ..., 1 from t`)
        try:
            col = _strip_table(m.group(1))
            return _Item(alias=alias0 or col, col=col)
        except UnsupportedSQL:
            pass
    if it == "*" and not alias0:
        # star select: expanded to the primary's columns by
        # run_windowed_sql (subquery operands in multiple_databases#9
        # and lifted `select * from t` FROM-sources)
        return _Item(alias="*", col="*")
    # scalar expression item (evaluated on the primary relation)
    if not alias0:
        raise UnsupportedSQL(f"expression item without alias: {item!r}")
    return _Item(alias=alias0, expr=it)


_DEPLOY_RE = re.compile(
    r"(?is)^\s*deploy\s+(?:\{\d+\}|`?\w+`?)\s+"
    r"(?:options\s*\(\s*long_windows\s*=\s*'([^']*)'\s*\)\s*)?(?=select\b)")


def strip_deploy_options(sql: str) -> tuple[str, dict[str, str]]:
    """Strip the reference's ``DEPLOY name OPTIONS(long_windows='w:b')``
    prefix (cases/function/long_window/long_window.yaml). The option is
    an online pre-agg STRATEGY hint — hybridse rewrites the deployment
    to read a maintained bucket table (kPassLongWindowOptimized) with
    the contract that results equal the plain window, which is exactly
    what running the underlying SELECT does here (the strategy itself
    is long_window.py, parity-pinned by tests/test_long_window.py).
    Unknown window names in the spec are ignored, as the reference
    accepts them (long_window.yaml#13/#14 expect success)."""
    m = _DEPLOY_RE.match(sql)
    if not m:
        return sql, {}
    hints: dict[str, str] = {}
    for part in (m.group(1) or "").split(","):
        if ":" in part:
            w, b = part.split(":", 1)
            hints[w.strip()] = b.strip()
    return sql[m.end():], hints


def translate(sql: str) -> tuple[list[_Item], dict[str, _Win], int | None]:
    """Parse the restricted dialect; returns (items, windows, limit)."""
    sql, _ = strip_deploy_options(sql)
    s = " ".join(strip_sql_comments(sql).strip().rstrip(";").split())
    limit = None
    ml = re.match(r"(?i)^(.*)\s+limit\s+(\d+)\s*$", s)
    if ml:
        s, limit = ml.group(1), int(ml.group(2))
    # inline anonymous windows: lift `OVER (body)` into named defs
    anon: dict[str, _Win] = {}

    def lift(mm):
        name = f"__anon{len(anon)}"
        anon[name] = _parse_window(name, mm.group(1))
        return f"over {name}"
    s = re.sub(r"(?i)\bover\s*\(([^()]*)\)", lift, s)
    # trivial UNION subqueries: (select * from {N}) == {N}
    s = re.sub(r"(?i)\(\s*select\s+\*\s+from\s+\{(\d+)\}\s*\)",
               r"{\1}", s)
    s = re.sub(r"`\{(\d+)\}`", r"{\1}", s)   # backticked table names
    # `from {0} as main`: drop the alias and fold alias-qualified refs
    # to bare columns (integration_test/window/test_window_union.yaml#22)
    ma = re.search(r"(?i)\bfrom\s+(\{0\}|`?\w+`?)\s+as\s+(\w+)\b", s)
    if ma and ma.group(2).lower() != "window":
        al = ma.group(2)
        s = s[:ma.start()] + f"from {ma.group(1)}" + s[ma.end():]
        s = _outside_quotes(s, lambda seg: re.sub(
            rf"\b{re.escape(al)}\s*\.", "", seg))
    m = re.match(r"(?i)^select\s+(.+?)\s+from\s+(?:\{0\}|`?\w+`?)\s*"
                 r"(?:window\s+(.+))?$", s)
    if not m:
        raise UnsupportedSQL("not a simple windowed SELECT")
    items = [_parse_item(i.strip())
             for i in _split_top_level(m.group(1)) if i.strip()]
    wins: dict[str, _Win] = dict(anon)
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
    # same default alias over two windows (`sum(c1) over w1, sum(c1)
    # over w2`): disambiguate with the window name — the collision
    # otherwise becomes an ambiguous join column downstream
    seen: set = set()
    for it in items:
        if it.alias and it.alias in seen and it.agg is not None:
            base = f"{it.alias}_{it.win}" if it.win else it.alias
            new, i = base, 2
            while new in seen:
                new, i = f"{base}_{i}", i + 1
            it.alias = new
            it.agg.name = new
        if it.alias:
            seen.add(it.alias)
    return items, wins, limit


def run_windowed_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Execute a restricted-dialect windowed SELECT against ``tables``
    ({0} = primary, {1}.. = WINDOW UNION tables). OpenMLDB storage order
    is emulated with an insertion-order row id as the tie-break
    (SURVEY.md §2.3: batch storage order; we always pin it)."""
    items, wins, limit = translate(sql)
    prim = tables[0]
    if _RID not in prim.columns:
        raise UnsupportedSQL("primary table must carry __case_rid")
    items = [x for it in items for x in
             ([_Item(alias=c, col=c) for c in prim.columns if c != _RID]
              if it.col == "*" else [it])]
    if not wins:
        # full-table aggregate (select count(c2) ... with no WINDOW /
        # OVER): this runner would emit a per-row select whose Aggregate
        # mixes the row id in (MISSING_GROUP_BY); route to the general
        # Spark-SQL path instead (v040/test_udaf.yaml#0/#2/#4)
        probe: list = []
        for it in items:
            if it.expr is not None:
                try:
                    _extract_window_aggs(it.expr, probe)
                except UnsupportedSQL:
                    probe.append((it.alias, None))
            if probe:
                raise UnsupportedSQL(
                    "aggregate select without WINDOW — general path")

    # expression agg inputs / conditions: materialize as derived columns
    # shared by the primary AND union tables (the union frame must carry
    # the same schema)
    tm = _type_map(prim.select(
        *[c for c in prim.columns if c != _RID]).schema)
    # strip comments BEFORE the strict type rejections: the fz/usecase
    # corpus is heavily --commented and a column name inside a comment
    # must not trip the arithmetic-type regexes
    _strict_reject(strip_sql_comments(sql), tm)

    # lifted inner aggregates (a top-n bound or an equals-current cond
    # side containing a UDAF): compute them over their window FIRST and
    # join their per-row outputs onto the primary — the value at row i
    # is row i's own-frame aggregate, the reference's CURRENT-OUTPUT-ROW
    # binding for nested UDAFs. (Nested UDAFs in plain VALUE args never
    # reach here — they decompose algebraically in _parse_item.)
    pre_by_win: dict[str, list] = {}
    for it in items:
        if it.agg and it.pre:
            pre_by_win.setdefault(it.win, []).extend(it.pre)
    for wname, plist in pre_by_win.items():
        w = wins[wname]
        if w.union_refs:
            raise UnsupportedSQL(
                "nested UDAF argument with a UNION window")
        spec = WindowSpecFE(
            w.partition_by, w.order_by, frame=w.frame, start=w.start,
            end=w.end, open_start=w.open_start, maxsize=w.maxsize,
            exclude_current_time=w.exclude_current_time,
            exclude_current_row=w.exclude_current_row,
            instance_not_in_window=w.instance_not_in_window,
            tiebreak=(_RID,), peer="stream")
        paggs = [a for _, a in plist]
        for a in paggs:
            if a.cond:
                a.cond = _xlate_expr(a.cond, tm)
        pres = window_agg(prim, spec, paggs)
        prim = prim.join(pres.select(_RID, *[a.name for a in paggs]),
                         on=_RID, how="left")
    if pre_by_win:
        tm = {**tm, **_type_map(prim.select(
            *[c for c in prim.columns if c != _RID]).schema)}

    derived: dict[str, str] = {}
    for it in items:
        if it.agg and it.arg_expr is not None:
            if it.arg_expr not in derived:
                derived[it.arg_expr] = f"__warg{len(derived)}"
            it.agg.col = derived[it.arg_expr]
        if it.agg and it.slots:
            # cate-family expression args: value / category / top-n
            # bound become derived columns (n as a per-row kernel bound)
            for slot, txt in it.slots.items():
                if txt not in derived:
                    derived[txt] = f"__warg{len(derived)}"
                cn = derived[txt]
                if slot == "col":
                    it.agg.col = cn
                elif slot == "cate":
                    it.agg.cate = cn
                else:
                    it.agg.n_col = cn
        if it.agg and getattr(it.agg, "_cond_cur", None):
            # equals-current-row condition: both sides become derived
            # per-row columns; the kernel compares L[j] (buffered) to
            # R[i] (current output row) with a sliding counter
            lt, rt = it.agg._cond_cur
            for txt in (lt, rt):
                if txt not in derived:
                    derived[txt] = f"__warg{len(derived)}"
            it.agg.cond_l = derived[lt]
            it.agg.cond_r = derived[rt]
        if it.agg and it.agg.cond:
            it.agg.cond = _xlate_expr(it.agg.cond, tm)

    def add_derived(df, fallback_types=None):
        for expr_text, cname in derived.items():
            try:
                d2 = df.withColumn(cname,
                                   F.expr(_xlate_expr(expr_text, tm)))
                d2.schema          # force analysis now
            except Exception:
                # a derived expr can reference columns that exist only
                # on the joined PRIMARY (e.g. a lifted __wpre_* column
                # from an equals-current cond in ANOTHER window); union
                # buffer rows never read the current-row side, so a
                # typed NULL keeps the frame schema aligned
                if fallback_types is None or cname not in fallback_types:
                    raise
                d2 = df.withColumn(
                    cname, F.lit(None).cast(fallback_types[cname]))
            df = d2
            # Spark parses bare float literals as DECIMAL (1.0 →
            # decimal(2,1)); the reference has no decimal type — its
            # float literals are doubles — so fold decimal results of
            # derived agg inputs to double (test_udaf_function.yaml#52
            # sum(col1 * 1.0) expects a double column)
            if df.schema[cname].dataType.simpleString().startswith(
                    "decimal"):
                df = df.withColumn(cname, F.col(cname).cast("double"))
        return df

    prim = add_derived(prim)
    derived_types = {c: prim.schema[c].dataType
                     for c in derived.values()}

    out = prim
    for wname, w in wins.items():
        aggs = [it.agg for it in items if it.win == wname and it.agg]
        for it in items:
            if it.win == wname and it.hidden:
                aggs.extend(a for _, a in it.hidden)
        if not aggs:
            continue
        union_dfs = []
        for ref in w.union_refs:
            if ref >= len(tables):
                raise UnsupportedSQL(f"missing union table {{{ref}}}")
            union_dfs.append(add_derived(tables[ref],
                                         fallback_types=derived_types))
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
        # ... but NOT under INSTANCE_NOT_IN_WINDOW: with no primary row
        # buffered the empty-frame sum stays NULL
        # (fz_ddl/test_myhug.yaml#1 golden: reqId1 sum_73 = NULL)
        sum_aggs = [a for a in aggs if a.fn == "sum"] \
            if (w.union_refs and w.end > 0
                and not (w.exclude_current_row
                         or w.exclude_current_time
                         or w.instance_not_in_window)) else []
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
    # expression items may reference hidden window outputs (embedded
    # OVER extraction) — their types live on the joined relation, not
    # the primary (autox: bigint(lag(ts,1) OVER w) must become
    # unix_millis, the reference's ts→int64 is milliseconds)
    tm_out = {**tm, **_type_map(out.select(
        *[c for c in out.columns if c != _RID]).schema)}
    for it in items:
        if it.col:
            sel.append(F.col(it.col).alias(it.alias))
        elif it.expr is not None:
            sel.append(F.expr(_xlate_expr(it.expr, tm_out))
                       .alias(it.alias))
        elif it.agg is not None and it.post:
            sel.append(F.expr(
                f"`{it.agg.name}` {_xlate_expr(it.post, tm_out)}")
                .alias(it.alias))
        else:
            sel.append(F.col(it.alias))
    res = out.select(_RID, *sel)
    # the reference has no DECIMAL type — its float literals are
    # doubles — but Spark parses `0.0` as DECIMAL(2,1); fold any decimal
    # output (e.g. a lifted subquery's literal column feeding a window
    # aggregate, sub_select.yaml#8) to double
    for f in res.schema.fields:
        if f.dataType.simpleString().startswith("decimal"):
            res = res.withColumn(f.name, F.col(f.name).cast("double"))
    return res.limit(limit) if limit is not None else res


def _rewrite_typed_casts(t: str, tm: dict[str, str],
                         per_table: dict[str, dict[str, str]]
                         | None = None) -> str:
    """Reference CAST semantics that depend on the ARGUMENT's static
    type (integration_test/expression/test_type.yaml#1/#3/#5 goldens —
    authoritative; the function/ siblings carry the same cases
    TODO-tagged as broken upstream):

    - timestamp -> numeric: the int64 epoch-MS payload truncated to the
      target width (Spark's cast is epoch SECONDS);
    - timestamp -> bool: payload != 0;
    - timestamp -> string/date: rendered at the reference CI's
      Asia/Shanghai wall clock (udf.cc:108 hardcoded +8 display);
    - date -> timestamp: midnight at that same wall clock;
    - date -> numeric/bool: NULL. Spark refuses these casts at ANALYSIS
      time, so the rewrite must be static — runtime typeof() dispatch
      can never make CAST(date AS INT) analyzable.
    """
    num = {"smallint": "SMALLINT", "int16": "SMALLINT", "i16": "SMALLINT",
           "int": "INT", "int32": "INT", "i32": "INT",
           "bigint": "BIGINT", "int64": "BIGINT", "i64": "BIGINT",
           "float": "FLOAT", "double": "DOUBLE"}

    def repl(m):
        ref, ty = m.group(1), m.group(2).lower()
        qm = re.match(r"^(\{\d+\}|\w+)\.", ref)
        c = ref[qm.end():].strip("`") if qm else ref.strip("`")
        # a qualified ref resolves in ITS table's map — a colliding
        # column name on another join operand must not inject a
        # different declared type (same hazard class as
        # _rewrite_table_udafs' per_table, ADVICE r3 #5)
        src = (per_table or {}).get(qm.group(1)) if qm else None
        ct = (src if src is not None else tm).get(c, "")
        if ct.startswith("timestamp"):
            if ty in num:
                return f"CAST(unix_millis({ref}) AS {num[ty]})"
            if ty in ("bool", "boolean"):
                return f"(unix_millis({ref}) <> 0)"
            if ty in ("string", "varchar"):
                return (f"date_format(from_utc_timestamp({ref}, "
                        f"'Asia/Shanghai'), 'yyyy-MM-dd HH:mm:ss')")
            if ty == "date":
                return (f"CAST(from_utc_timestamp({ref}, "
                        f"'Asia/Shanghai') AS DATE)")
        elif ct == "date":
            if ty in num:
                return f"CAST(NULL AS {num[ty]})"
            if ty in ("bool", "boolean"):
                return "CAST(NULL AS BOOLEAN)"
            if ty == "timestamp":
                return (f"to_utc_timestamp(CAST({ref} AS TIMESTAMP), "
                        f"'Asia/Shanghai')")
        return m.group(0)

    pat = re.compile(
        r"(?i)\bcast\s*\(\s*((?:\{\d+\}\.|\w+\.)?`?\w+`?)\s+as\s+"
        r"(\w+)\s*\)")
    return _outside_quotes(t, lambda seg: pat.sub(repl, seg))


def _xlate_expr(text: str, tm: dict[str, str]) -> str:
    """Transpile an embedded expression fragment: strip {i}. prefixes,
    rewrite dialect functions, apply cross-type coercion wraps."""
    text = _rewrite_typed_casts(text, tm)
    t = re.sub(r"\{\d+\}\.", "", text)
    # reference bigint(timestamp) is epoch MILLISECONDS
    # (hybridse codegen: ts payload is int64 ms); Spark's
    # CAST(ts AS BIGINT) is seconds — rewrite by declared type
    for c, ty in tm.items():
        if ty.startswith("timestamp"):
            t = re.sub(rf"(?i)\b(?:bigint|int64)\s*\(\s*{re.escape(c)}"
                       rf"\s*\)", f"unix_millis({c})", t)
    t = rewrite_expr(t)
    t = _wrap_compare_operands(t, tm)
    t = _wrap_not_truthiness(t, tm)
    wrappers = {c: ("CAST({} AS SMALLINT)" if ty == "boolean"
                    else "unix_millis({})")
                for c, ty in tm.items()
                if ty == "boolean" or ty.startswith("timestamp")}
    t = _wrap_ts_plusminus(
        t, {c for c, ty in tm.items() if ty.startswith("timestamp")})
    t = _wrap_arith_operands(t, wrappers)
    t = _wrap_numeric_fn_args(t, wrappers)
    t = _wrap_bool_call_arith(t)
    return t


# boolean-returning calls the dialect admits in arithmetic (bool
# promotes to 0/1 — auto_gen_case_0.yaml `isnull(c_7_double) +
# c_5_bool`); Spark rejects boolean operands outright, so wrap the CALL
# when it sits beside an arithmetic operator (the column-ref case is
# _wrap_arith_operands)
_BOOL_CALL_RE = re.compile(r"(?i)\b(isnull|like_match|ilike_match)\s*\(")


def _wrap_bool_call_arith(text: str) -> str:
    def seg_fn(seg: str) -> str:
        while True:
            for m in _BOOL_CALL_RE.finditer(seg):
                start = m.start()
                end = _balanced_span(seg, m.end() - 1)
                before = seg[:start].rstrip()
                after = seg[end:].lstrip()
                # the neighbor must EXIST: '' in "+-*/%" is True, which
                # would wrap a call at segment start/end (a bare
                # boolean isnull(..) silently became SMALLINT)
                if (before[-1:] != "" and before[-1] in "+-*/%") \
                        or (after[:1] != "" and after[0] in "+*/%") \
                        or (after[:1] == "-" and after[1:2] != "-"):
                    seg = (seg[:start] +
                           f"CAST({seg[start:end]} AS SMALLINT)" +
                           seg[end:])
                    break            # restart: offsets shifted
            else:
                return seg
    return _outside_quotes(text, seg_fn)


_QUOTED_SPAN = re.compile(
    r"'(?:\\.|''|[^'\\])*'|\"(?:\\.|\"\"|[^\"\\])*\"")


def _outside_quotes(text: str, fn) -> str:
    """Apply ``fn`` to the segments of ``text`` OUTSIDE string literals
    (single/double quoted, backslash escapes and doubled quotes
    honored). The coercion wrap passes are regex rewrites over raw SQL;
    without this a literal containing a column name next to an operator
    (``WHERE note = 'c1<c2'``) is corrupted in place (ADVICE r2 #5)."""
    out, pos = [], 0
    for m in _QUOTED_SPAN.finditer(text):
        out.append(fn(text[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(fn(text[pos:]))
    return "".join(out)


def _wrap_ts_plusminus(text: str, ts_cols: set[str]) -> str:
    """OpenMLDB ``timestamp +/- int`` yields a shifted TIMESTAMP (ms
    arithmetic); rewrite the simple binary forms so the result keeps the
    timestamp type: ts + x -> timestamp_millis(unix_millis(ts) + x)."""
    if not ts_cols:
        return text
    names = "|".join(re.escape(c) for c in sorted(ts_cols, key=len,
                                                  reverse=True))
    ref = rf"(?:\w+\.)?\b(?:{names})\b"
    pat1 = re.compile(rf"({ref})\s*([+-])\s*(\w+)")
    pat2 = re.compile(rf"(\w+)\s*([+-])\s*({ref})")

    def s1(m):
        return (f"timestamp_millis(unix_millis({m.group(1)}) "
                f"{m.group(2)} {m.group(3)})")

    def s2(m):
        if m.group(1).split(".")[-1] in ts_cols:
            return m.group(0)      # pat1 already handled ts +/- ts
        return (f"timestamp_millis({m.group(1)} {m.group(2)} "
                f"unix_millis({m.group(3)}))")

    return _outside_quotes(
        text, lambda seg: pat2.sub(s2, pat1.sub(s1, seg)))


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

    s = " ".join(strip_sql_comments(sql).strip().rstrip(";").split())
    s, tables = _inline_join_aliases(s, tables)
    m = re.match(r"(?i)^select\s+(.+?)\s+from\s+\{0\}\s+(last\s+join\s+.+)$",
                 s)
    if not m:
        raise UnsupportedSQL("not a LAST JOIN select")
    _strict_reject(s, {c: t for tdf in tables
                       for c, t in _type_map(tdf.schema).items()})
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
        residuals: list[str] = []
        for cond in _split_conjuncts(
                _strip_outer_parens(conds_text.strip())):
            cond = _strip_outer_parens(cond.strip())
            mc = re.match(r"^(\S+)\s*(<=|>=|=|==)\s*(\S+)$", cond.strip())
            if not mc:
                # θ-residual (strict bounds, arithmetic operands —
                # spark/test_jd.yaml `{4}.dt < {0}.date - 0`): evaluated
                # post-rank like the reference's JoinPlan residual
                residuals.append(cond.strip())
                continue
            try:
                at, ac = _tbl_col(mc.group(1))
                bt, bc = _tbl_col(mc.group(3))
            except UnsupportedSQL:
                residuals.append(cond.strip())
                continue
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
                residuals.append(cond.strip())
        if not keys:
            raise UnsupportedSQL("no equi keys")
        _lastjoin_strict(right, order_ref, key_src)

        # collision-free right side: every payload column carries a
        # reserved __t{i}_ name so chained joins and same-name columns
        # can never become ambiguous; join keys are aliased to the
        # accumulated-side names
        sel_r = [F.col(key_src[an]).alias(an) for an in keys]
        sel_r += [F.col(c).alias(f"__t{ti}_{c}")
                  for c in tables[ti].columns if c != _RID]
        # insertion-order id for the no-ORDER-BY fallback and same-ts
        # tiebreak; tables without the harness _RID get a synthesized
        # storage-order id (scan order) so the plan still resolves
        sel_r.append((F.col(_RID) if _RID in right.columns
                      else F.monotonically_increasing_id())
                     .alias(f"__jrid{ti}"))
        right2 = right.select(*sel_r)
        if right_ts is not None:
            right_ts = f"__t{ti}_{right_ts}"
        order_by = f"__t{ti}_{_strip_table(order_ref)}" if order_ref \
            else f"__jrid{ti}"
        extra = None
        if residuals:
            right_bare = {c for c in tables[ti].columns if c != _RID}

            def fix_ref(mm):
                rt, rc = int(mm.group(1)), mm.group(2)
                if rt == ti:
                    return f"__t{ti}_{rc}"
                nm_ = resolve(rt, rc)
                if nm_ in key_src:
                    return f"__t{ti}_{key_src[nm_]}"
                return nm_
            bare_map = {c: f"__t{ti}_{c}" for c in right_bare}
            parts_c = []
            for rc_ in residuals:
                # normalize backquoted dotted refs ({4}.`dt` -> {4}.dt)
                # FIRST: the tokenizer's dotted-skip sees the backquote,
                # not the dot, and would re-map the column to its
                # prefixed name twice (spark/test_jd.yaml residual)
                rc_ = re.sub(r"\.\s*`(\w+)`", r".\1", rc_)
                rc_ = rewrite_expr(rc_, bare_map)
                rc_ = re.sub(r"\{(\d+)\}\.(\w+)", fix_ref, rc_)
                # reference ts +/- int is millisecond arithmetic
                # (spark/test_jd.yaml residual: dt < date - 0)
                ts_cols = {f.name for f in acc.schema.fields
                           if f.dataType.simpleString()
                           .startswith("timestamp")}
                ts_cols |= {f"__t{ti}_{f.name}"
                            for f in tables[ti].schema.fields
                            if f.dataType.simpleString()
                            .startswith("timestamp")}
                rc_ = _wrap_ts_plusminus(rc_, ts_cols)
                parts_c.append(f"({rc_})")
            extra = F.expr(" AND ".join(parts_c))
        acc = last_join(acc, right2, on=keys, order_by=order_by,
                        left_ts=left_ts, right_ts=right_ts,
                        extra_cond=extra,
                        strategy="join_rank", tiebreak=f"__jrid{ti}")
        for c in tables[ti].columns:
            if c != _RID:
                resmap[(ti, c)] = f"__t{ti}_{c}"

    def resolve_any(ref: str) -> str:
        ti, col = _tbl_col(ref)
        if re.match(r"\{\d+\}\.", ref.strip()):
            return resolve(ti, col)
        # bare name: must be owned by exactly ONE join operand — the
        # reference's resolver rejects ambiguous unqualified refs
        # (test_lastjoin_complex.yaml #11-2 bare `id`, #14 bare `c3`)
        owner_slots = [0] if col in tables[0].columns else []
        owner_slots += [tj for tj, _, _ in joins
                        if col in tables[tj].columns]
        if len(set(owner_slots)) > 1:
            raise UnsupportedSQL(
                f"ambiguous bare column {col!r} across LAST JOIN "
                f"operands")
        if col in tables[0].columns:
            return col
        for tj, _, _ in joins:
            if col in tables[tj].columns:
                return resolve(tj, col)
        raise UnsupportedSQL(f"unknown column {col!r}")

    sel = [F.col(_RID)]
    # output naming: keep the DECLARED alias (or source name) when it
    # is unambiguous — a lifted subquery's outer query references these
    # names (fz_ddl/test_myhug.yaml joins on `reqId_74`); positional
    # `__o{i}` only for collisions (the golden compare is positional
    # either way)
    if m.group(1).strip() == "*":
        # star over LAST JOIN: left columns then each joined table's
        # columns in join order (sub_select.yaml#6 windowed-subquery
        # into LAST JOIN)
        k, used = 0, set()
        for c in tables[0].columns:
            if c != _RID:
                sel.append(F.col(c).alias(c))
                used.add(c)
                k += 1
        for ti, _, _ in joins:
            for c in tables[ti].columns:
                if c != _RID:
                    nm = c if c not in used else f"__o{k}"
                    used.add(nm)
                    sel.append(F.col(resolve(ti, c)).alias(nm))
                    k += 1
        return acc.select(*sel)
    used: set[str] = set()
    for i_, raw in enumerate(_split_top_level(m.group(1))):
        it = " ".join(raw.split())
        mo = re.match(r"(?i)^(\S+)(?:\s+as\s+`?(\w+)`?)?$", it)
        if not mo:
            raise UnsupportedSQL(f"select item {it!r}")
        src = resolve_any(mo.group(1))
        nm = mo.group(2)
        if not nm:
            bare = _strip_table(mo.group(1)).replace("`", "")
            nm = bare if re.match(r"^\w+$", bare) else None
        if not nm or nm in used:
            nm = f"__o{i_}"
        used.add(nm)
        sel.append(F.col(src).alias(nm))
    return acc.select(*sel)


def _collapse_trivial_star(s: str) -> str:
    """``(SELECT * FROM {i}) AS {i}`` == ``{i}``: the hybridsql fuzzer
    wraps LAST JOIN operands in star-subqueries aliased to the operand
    itself (auto_gen_case_0.yaml); collapse them so the composite
    runners see the plain two-table shape."""
    return re.sub(
        r"(?i)\(\s*select\s+\*\s+from\s+\{(\d+)\}\s*\)\s+as\s+\{(\d+)\}",
        lambda mm: (f"{{{mm.group(1)}}}"
                    if mm.group(1) == mm.group(2) else mm.group(0)),
        s)


def run_join_window_sql(sql: str, tables: list[DataFrame]) -> DataFrame:
    """Composite ``SELECT ... FROM {0} LAST JOIN {1} [ORDER BY {1}.o]
    ON <equis> WINDOW w AS (PARTITION BY ... ORDER BY ... frame)`` —
    the reference's flagship shape (join/test_lastjoin_complex.yaml,
    cluster/window_and_lastjoin.yaml): as-of join first, then per-row
    windows over the JOINED relation (window columns may come from
    either side). UNION windows over the joined schema are out of
    scope here."""
    from openmldb_spark.operators.last_join import last_join

    s = " ".join(strip_sql_comments(sql).strip().rstrip(";").split())
    s = _collapse_trivial_star(s)
    limit = None
    ml = re.match(r"(?i)^(.*)\s+limit\s+(\d+)\s*$", s)
    if ml:
        s, limit = ml.group(1), int(ml.group(2))
    m = re.match(
        r"(?i)^select\s+(.+?)\s+from\s+\{0\}\s+last\s+join\s+\{1\}\s*"
        r"(?:order\s+by\s+(\S+)\s*)?on\s+(.+?)\s+window\s+(.+)$", s)
    if not m:
        raise UnsupportedSQL("not a LAST JOIN + WINDOW composite")
    left, right = tables[0], tables[1]

    conds_text = _strip_outer_parens(m.group(3).strip())
    keys, left_ts, right_ts = [], None, None
    ren: dict[str, str] = {}     # right-col renames from key alignment
    for cond in _split_conjuncts(conds_text):
        cond = cond.strip().strip("()").strip()
        mc = re.match(r"^(\S+)\s*(<=|>=|=|==)\s*(\S+)$", cond)
        if not mc:
            raise UnsupportedSQL(f"join condition {cond!r}")
        lt, lc = _tbl_col(mc.group(1))
        rt, rc = _tbl_col(mc.group(3))
        op = mc.group(2)
        if op == ">=":               # {0}.t >= {1}.t  ==  {1}.t <= {0}.t
            lt, lc, rt, rc = rt, rc, lt, lc
            op = "<="
        if op in ("=", "=="):
            if lt == rt:
                raise UnsupportedSQL(f"equi cond {cond!r}")
            if rt == 0:              # {1}.k = {0}.k written right-first
                lt, lc, rt, rc = rt, rc, lt, lc
            if lc != rc:
                # differing names: align by renaming the right key; later
                # refs to the right name (ORDER BY {1}.timecol,
                # test_batch_request.yaml#2) resolve through `ren`
                right = right.withColumnRenamed(rc, lc)
                ren[rc] = lc
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
    # and deterministic tie-break; tables without the harness rid get
    # a synthesized scan-order id (the sibling join runners do the
    # same) so __r_rid can never be an unresolved column
    if _RID in right2.columns:
        right2 = right2.withColumnRenamed(_RID, "__r_rid")
    else:
        right2 = right2.withColumn("__r_rid",
                                   F.monotonically_increasing_id())
    jorder = _strip_table(m.group(2)) if m.group(2) else "__r_rid"
    jorder = ren.get(jorder, jorder)
    if jorder in keys:
        # ordering by the (renamed) equi key: order on its __rk_ copy
        # (the bare key column is consumed by the join itself)
        jorder = f"__rk_{jorder}"
    joined = last_join(left, right2, on=keys, order_by=jorder,
                       left_ts=left_ts, right_ts=right_ts,
                       strategy="join_rank", tiebreak="__r_rid")

    def resolve(ref: str) -> str:
        ti, col = _tbl_col(ref)
        if ti == 0:
            return col
        col = ren.get(col, col)
        if col in keys:
            return f"__rk_{col}"
        return col + "_r" if col in left.columns else col

    def _general_over_join():
        # delegate to the general windowed runner over the ALREADY
        # JOINED relation: rewrite {d}.col refs in the projection and
        # window text to joined-relation names and re-run as a plain
        # windowed SELECT. Carries the shapes the direct item parser
        # doesn't: expression UDAF args, nested UDAF-in-UDAF, per-row
        # top-n bounds (hybridsql_gen_cases/auto_gen_case_0.yaml).
        sel_parts = []
        for raw2 in _split_top_level(m.group(1)):
            it2 = " ".join(raw2.split())
            mref = re.match(r"^(\{\d+\}\.(\w+))$", it2)
            if mref:
                # unaliased qualified ref: its output name is the bare
                # column name (the outer wrapper selects it by that)
                it2 = f"{mref.group(1)} as {mref.group(2)}"
            sel_parts.append(re.sub(r"\{\d+\}\.\w+",
                                    lambda mm: resolve(mm.group(0)),
                                    it2))
        win_text = re.sub(r"\{\d+\}\.\w+",
                          lambda mm: resolve(mm.group(0)), m.group(4))
        if re.search(r"(?i)union\s+\{", win_text):
            raise UnsupportedSQL("UNION window over joined relation")
        q = f"select {', '.join(sel_parts)} from {{0}} window {win_text}"
        if limit is not None:
            q += f" limit {limit}"
        try:
            return run_windowed_sql(q, [joined])
        except AnalysisException as e:
            # a name that doesn't resolve against the JOINED relation
            # (e.g. subquery-projection aliases — query/
            # last_join_window_query.yaml#5) means this runner mis-fits
            # the shape: hand the statement back to the route chain
            # (subquery lifting) instead of hard-failing
            raise UnsupportedSQL(f"over-join fallback: {e}") from None
        except KeyError as e:
            # PySparkKeyError (KEY_NOT_EXISTS etc.) is a NAME lookup
            # failure at the DataFrame API — same reroute class as
            # AnalysisException (subquery-projection aliases, yaml#5).
            # A plain internal dict KeyError only reroutes when its key
            # is a name the statement references; anything else is a
            # real bug and must surface, not silently reroute
            from pyspark.errors import PySparkKeyError
            k = e.args[0] if e.args else None
            if isinstance(e, PySparkKeyError) or (
                    isinstance(k, str)
                    and re.search(rf"\b{re.escape(k)}\b", q)):
                raise UnsupportedSQL(f"over-join fallback: {e}") from None
            raise

    # parse select items with table-qualified resolution
    try:
        items = []
        for raw in _split_top_level(m.group(1)):
            it = " ".join(raw.split())
            mo = re.match(r"(?i)^(.*?)\s+over\s+(\w+)(?:\s+as\s+(\w+))?$",
                          it)
            if mo:
                # resolve {d}.col refs to joined-relation column names,
                # then delegate to the one agg-call parser (the ad-hoc
                # Agg() this path used to build dropped cond=/cate= for
                # the *_cate and *_where families)
                call = re.sub(r"\{\d+\}\.\w+",
                              lambda mm: resolve(mm.group(0)),
                              mo.group(1).strip())
                mc2 = re.match(r"(?is)^(\w+)\s*\(\s*(.*)\s*\)$", call)
                if not mc2:
                    raise UnsupportedSQL(f"agg call {mo.group(1)!r}")
                agg = _parse_agg_call(mc2.group(1), mc2.group(2), "_")
                if agg is None or getattr(agg, "_arg_expr", None) \
                        or getattr(agg, "_slot_exprs", None) \
                        or (agg.cond and _NESTED_AGG_RE.search(agg.cond)):
                    raise UnsupportedSQL(f"agg call {mo.group(1)!r}")
                alias = mo.group(3) or f"{agg.fn}_{agg.col}"
                agg.name = alias
                items.append(_Item(alias=alias, agg=agg,
                                   win=mo.group(2)))
            else:
                mo2 = re.match(r"(?i)^(\S+)(?:\s+as\s+(\w+))?$", it)
                if not mo2:
                    raise UnsupportedSQL(f"select item {it!r}")
                col = resolve(mo2.group(1))
                items.append(_Item(alias=mo2.group(2) or col, col=col))

        wins: dict[str, _Win] = {}
        for wdef in _split_top_level(m.group(4)):
            mw = re.match(r"(?i)^\s*(\w+)\s+as\s*\((.*)\)\s*$",
                          wdef.strip())
            if not mw:
                raise UnsupportedSQL(f"window def {wdef!r}")
            # resolve table-qualified refs to joined column names
            # BEFORE parsing so {1}.c7 becomes c7_r etc.
            body = re.sub(r"\{\d+\}\.\w+",
                          lambda mm: resolve(mm.group(0)), mw.group(2))
            if re.search(r"(?i)union\s+\{", body):
                raise UnsupportedSQL("UNION window over joined relation")
            wins[mw.group(1)] = _parse_window(mw.group(1), body)
    except UnsupportedSQL:
        return _general_over_join()

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
    res = out.select(*sel)
    return res.limit(limit) if limit is not None else res


# ---------------------------------------------------------------------------
# general SELECT path: expressions / WHERE / GROUP BY / HAVING / LIMIT /
# subqueries. Strategy: transpile the OpenMLDB dialect to Spark SQL at
# the text level (function renames, cast-function forms, MOD, dialect
# templates) and let Catalyst analyze/optimize/execute — the reference's
# ZetaSQL-parser + LLVM-codegen stack collapses into spark.sql()
# (SURVEY.md §3.1). LAST JOIN FROM-clauses (no Spark equivalent) are
# executed by the last_join operator first, then the rest of the query
# runs over the joined relation. Golden-case runs set
# spark.sql.ansi.enabled=false so cast-failure->NULL and integer
# wraparound match the reference's C++ semantics.

_CAST_FNS = {
    "bool": "BOOLEAN", "smallint": "SMALLINT", "int16": "SMALLINT",
    "int": "INT", "int32": "INT", "bigint": "BIGINT", "int64": "BIGINT",
    "float": "FLOAT", "double": "DOUBLE", "string": "STRING",
    "date": "DATE",
}

# OpenMLDB scalar surface -> Spark SQL text templates (reference
# registration sites: hybridse/src/udf/default_udf_library.cc; docs
# udfs_8h.md). Spark-native same-name functions pass through untouched.
_FN_TEMPLATES = {
    # int64 -> epoch-ms; numeric strings -> epoch-ms; date-ish strings /
    # dates / timestamps -> plain cast. The RLIKE guard keeps a real
    # TIMESTAMP arg out of the bigint branch (its non-ANSI bigint cast
    # would yield epoch SECONDS and silently shift the instant).
    # the bigint branch is bounded to the micros-representable range:
    # timestamp_millis(ms) multiplies by 1000 with an overflow THROW
    # even under ANSI-off, and fuzzer corpora pass arbitrary int64s
    # (auto_gen_case_0.yaml weekofyear(c_10_int64)) — out-of-range ms
    # yields NULL like any other failed conversion
    "timestamp": ("coalesce(timestamp_millis(try_cast(CASE WHEN "
                  "try_cast({0} AS STRING) RLIKE '^-?[0-9]+$' "
                  "AND try_cast(try_cast({0} AS STRING) AS BIGINT) "
                  "BETWEEN -9223372000000000 AND 9223372000000000 THEN "
                  "try_cast({0} AS STRING) END as bigint)), "
                  "CASE WHEN try_cast({0} AS STRING) "
                  "RLIKE '^-?[0-9]+$' THEN NULL "
                  "ELSE try_cast({0} as timestamp) END)"),
    "inc": "({0} + 1)",
    "identity": "({0})",
    "add": "({0} + {1})",
    "maximum": "greatest({0}, {1})",
    "minimum": "least({0}, {1})",
    "truncate": "(CASE WHEN {0} >= 0 THEN floor({0}) ELSE ceil({0}) END)",
    "strcmp": ("(CASE WHEN {0} < {1} THEN -1 WHEN {0} > {1} THEN 1 "
               "WHEN {0} = {1} THEN 0 END)"),
    "char_length": "length({0})",
    "character_length": "length({0})",
    "lcase": "lower({0})",
    "ucase": "upper({0})",
    "char": "chr({0})",
    "week": "weekofyear({0})",
    "like_match": "({0} LIKE {1})",
    "ilike_match": "({0} ILIKE {1})",
    "is_null": "isnull({0})",
    "if_null": "ifnull({0}, {1})",
    # split of NULL is the EMPTY list in the reference (size 0, join "")
    "fz_join": "array_join({0}, {1})",
    "fz_split": "coalesce(split({0}, {1}), array())",
    "fz_split_by_key": (
        "coalesce(transform(filter(split({0}, {1}),"
        " __kv -> locate({2}, __kv) > 0),"
        " __kv -> split_part(__kv, {2}, 1)), array())"),
    "fz_split_by_value": (
        "coalesce(transform(filter(split({0}, {1}),"
        " __kv -> size(split(__kv, {2})) >= 2),"
        " __kv -> element_at(split(__kv, {2}), 2)), array())"),
    # exact FarmHash Fingerprint64 over the reference's to_bytes_ref
    # layout (functions/hashing.py); typeof() carries the static type
    # into the packer
    "hash64": "__omls_hash64(CAST({0} AS STRING), typeof({0}))",
    # NULL probe matches a NULL element; not-found is false (never NULL)
    "array_contains": ("(CASE WHEN ({1}) IS NULL THEN "
                       "exists({0}, __x -> __x IS NULL) "
                       "ELSE coalesce(array_contains({0}, {1}), false) "
                       "END)"),
    "split_array": "coalesce(split({0}, {1}), array())",
    "farm_fingerprint": "__omls_hash64(CAST({0} AS STRING), typeof({0}))",
}

# reference-dialect to-string of a value inside concat/concat_ws:
# timestamps render '%Y-%m-%d %H:%M:%S' at the hardcoded UTC+8 display
# offset (udf.cc:108), everything else is the plain string cast
_STR_OF = ("(CASE WHEN typeof({0}) LIKE 'timestamp%' THEN "
           "date_format(from_utc_timestamp("
           "try_cast(CAST({0} AS STRING) AS TIMESTAMP), "
           "'Asia/Shanghai'), 'yyyy-MM-dd HH:mm:ss') "
           # float/double render %g-style: 30.0 -> '30' (Spark's cast
           # keeps the trailing .0)
           "WHEN typeof({0}) IN ('float', 'double') THEN "
           "regexp_replace(CAST({0} AS STRING), '\\\\.0$', '') "
           "ELSE CAST({0} AS STRING) END)")

# C-style strftime -> Java SimpleDateFormat codes (reference date_format
# is strftime-based, udf.cc:282-358)
_STRFTIME_MAP = {"Y": "yyyy", "y": "yy", "m": "MM", "d": "dd",
                 "H": "HH", "M": "mm", "S": "ss", "j": "DDD",
                 "e": "d", "%": "%"}


def _strftime_to_java(lit: str) -> str | None:
    """Translate a QUOTED strftime literal to a quoted Java pattern;
    None when the arg isn't a plain literal."""
    s = lit.strip()
    if len(s) < 2 or s[0] not in "'\"" or s[-1] != s[0]:
        return None
    body, out, i = s[1:-1], [], 0
    while i < len(body):
        if body[i] == "%" and i + 1 < len(body):
            code = body[i + 1]
            if code not in _STRFTIME_MAP:
                return None
            out.append(_STRFTIME_MAP[code])
            i += 2
        elif body[i].isalpha():
            out.append(f"'{body[i]}'")   # literal letters need quoting
            i += 1
        else:
            out.append(body[i])
            i += 1
    return "'" + "".join(out) + "'"
_FN_TEMPLATES["split_by_key"] = _FN_TEMPLATES["fz_split_by_key"]
_FN_TEMPLATES["split_by_value"] = _FN_TEMPLATES["fz_split_by_value"]
_FN_TEMPLATES["split"] = _FN_TEMPLATES["fz_split"]

# Date-part extractors: the reference computes them in LOCAL time and
# its golden corpus was authored in CST — normalize the arg through the
# ms-aware timestamp template, then shift to Asia/Shanghai. Date args
# survive the shift unchanged (midnight + 8h, same day).
_TS_ARG = _FN_TEMPLATES["timestamp"]
for _f in ("day", "dayofmonth", "month", "year", "week", "weekofyear",
           "dayofweek", "dayofyear", "hour", "minute", "second"):
    _base = "weekofyear" if _f == "week" else _f
    _FN_TEMPLATES[_f] = (_base + "(from_utc_timestamp(" + _TS_ARG
                         + ", 'Asia/Shanghai'))")
_FN_TEMPLATES["date"] = ("CAST(from_utc_timestamp(" + _TS_ARG
                         + ", 'Asia/Shanghai') AS DATE)")

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _apply_fn(name: str, args: list[str]) -> str:
    ln = name.lower()
    # templates take precedence: 'date'/'timestamp' function forms carry
    # ms/timezone semantics beyond a plain CAST
    if ln in _FN_TEMPLATES and not (
            ln in ("like_match", "ilike_match") and len(args) == 3):
        try:
            return _FN_TEMPLATES[ln].format(*args)
        except IndexError:
            raise UnsupportedSQL(f"{name} with {len(args)} args")
    if ln in _CAST_FNS and len(args) == 1:
        return f"CAST({args[0]} AS {_CAST_FNS[ln]})"
    if ln == "cast" and len(args) == 1:
        mc = re.match(r"(?is)^(.*\S)\s+as\s+(\w+)\s*$", args[0])
        if mc:
            ty = mc.group(2).lower()
            # OpenMLDB CAST(int AS TIMESTAMP) treats the int as epoch MS
            # (SURVEY.md §1.2); Spark treats it as seconds
            if ty == "timestamp":
                return _FN_TEMPLATES["timestamp"].format(mc.group(1))
            if ty in _CAST_FNS:      # normalize BOOL/INT16/... spellings
                return f"CAST({mc.group(1)} AS {_CAST_FNS[ty]})"
        return f"CAST({args[0]})"
    if ln == "atan" and len(args) == 2:      # OpenMLDB atan(y, x) = atan2
        return f"atan2({args[0]}, {args[1]})"
    if ln in ("ln", "log", "log2", "log10") and len(args) == 1:
        # C-math edge semantics: log(0) = -Inf, log(<0) = NaN — Spark
        # returns NULL for both (test_calculate.yaml#4 row 1)
        base = "ln" if ln in ("ln", "log") else ln
        # bare column refs stay unparenthesized so the bool-promotion
        # compare wrapper still sees them operator-adjacent
        a = args[0] if re.match(r"^\w+$", args[0]) else f"({args[0]})"
        return (f"(CASE WHEN {a} = 0 THEN CAST('-Infinity' AS DOUBLE) "
                f"WHEN {a} < 0 THEN CAST('NaN' AS DOUBLE) "
                f"ELSE {base}({a}) END)")
    if ln == "concat" and args:
        # every arg stringified reference-style (+8h ts render); Spark's
        # concat already yields NULL when any input is NULL — same as
        # the reference (test_string.yaml#0 row 2)
        return "concat(" + ", ".join(_STR_OF.format(a) for a in args) + ")"
    if ln == "concat_ws" and args:
        # the reference returns NULL when ANY argument (separator or
        # element) is NULL (test_string.yaml#3 row 2); Spark's concat_ws
        # skips null elements, so guard explicitly
        guard = " OR ".join(f"(({a}) IS NULL)" for a in args)
        body = ("concat_ws("
                + ", ".join(_STR_OF.format(a) for a in args) + ")")
        return f"(CASE WHEN {guard} THEN NULL ELSE {body} END)"
    if ln == "date_format" and len(args) == 2:
        pat = _strftime_to_java(args[1])
        if pat is not None:
            ts = _FN_TEMPLATES["timestamp"].format(args[0])
            # timestamps display at UTC+8 like the extractors; DATE args
            # format at midnight (no shift) — type-dispatched via the
            # static typeof()
            return (f"date_format(CASE WHEN typeof({args[0]}) = 'date' "
                    f"THEN try_cast({args[0]} AS timestamp) "
                    f"ELSE from_utc_timestamp({ts}, 'Asia/Shanghai') "
                    f"END, {pat})")
    if ln == "like_match" and len(args) == 3:
        if args[2] in ("''", '""'):      # empty escape = no escaping:
            # neutralize Spark's default backslash escape with a control
            # char that cannot appear in patterns
            return f"({args[0]} LIKE {args[1]} ESCAPE '\x01')"
        return f"({args[0]} LIKE {args[1]} ESCAPE {args[2]})"
    if ln == "ilike_match" and len(args) == 3:
        if args[2] in ("''", '""'):
            return f"({args[0]} ILIKE {args[1]} ESCAPE '\x01')"
        return f"({args[0]} ILIKE {args[1]} ESCAPE {args[2]})"
    t = _FN_TEMPLATES.get(ln)
    if t is not None:
        try:
            return t.format(*args)
        except IndexError:
            raise UnsupportedSQL(f"{name} with {len(args)} args")
    return f"{name}({', '.join(args)})"


def rewrite_expr(text: str, ident_map: dict[str, str] | None = None) -> str:
    """Transpile an OpenMLDB-dialect expression (or whole statement) to
    Spark SQL text: cast-function forms -> CAST, dialect function names
    -> Spark equivalents, infix MOD -> %. String literals pass through
    untouched; unknown function names pass through for Catalyst to
    resolve (same-name Spark builtins). ``ident_map`` renames bare
    (unqualified, non-call) identifiers — quote- and dot-aware."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"":
            # escape-aware skip (_skip_literal): 'a\'b' / 'it''s' must
            # not close early and expose literal content to the scanner
            j = _skip_literal(text, i)
            out.append(text[i:j])
            i = j
            continue
        m = _IDENT_RE.match(text, i)
        if not m:
            out.append(ch)
            i += 1
            continue
        name = m.group(0)
        j = m.end()
        k = j
        while k < n and text[k].isspace():
            k += 1
        if k < n and text[k] == "(" and name.lower() not in (
                "in", "and", "or", "not", "when", "then", "else", "on",
                "where", "select", "from", "by", "as", "between", "exists"):
            depth, p = 1, k + 1
            while p < n and depth:
                c = text[p]
                if c in "'\"":
                    q = p + 1
                    while q < n and text[q] != c:
                        q += 1
                    p = q
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                p += 1
            inner = text[k + 1:p - 1]
            args = ([rewrite_expr(a.strip(), ident_map)
                     for a in _split_top_level(inner)]
                    if inner.strip() else [])
            out.append(_apply_fn(name, args))
            i = p
            continue
        if name.upper() == "MOD":
            out.append("%")
        elif ident_map and name in ident_map \
                and not (out and out[-1].endswith(".")) \
                and not (i > 0 and text[i - 1] == "."):
            out.append(ident_map[name])
        else:
            out.append(name)
        i = j
    return "".join(out)


def _rewrite_array_literals(text: str) -> str:
    """OpenMLDB array literals: ``[a, b]`` and ``ARRAY<T>[a, b]`` ->
    Spark ``array(...)`` (typed form cast)."""
    def typed(m):
        ty = _CAST_FNS.get(m.group(1).lower(), m.group(1).upper())
        inner = m.group(2).strip()
        body = f"array({inner})" if inner else "array()"
        return f"CAST({body} AS ARRAY<{ty}>)"
    text = re.sub(r"(?i)\bARRAY\s*<\s*(\w+)\s*>\s*\[([^\]]*)\]",
                  typed, text)
    text = re.sub(r"\[([^\]]*)\]", r"array(\1)", text)
    return text


def _arith_operand_wrappers(schema) -> dict[str, str]:
    """Column-name -> wrapper template for types OpenMLDB admits in
    arithmetic but Spark rejects: bool promotes to 0/1, timestamp
    becomes its int64 epoch-ms value (SURVEY.md §1.2)."""
    out = {}
    for f_ in schema.fields:
        t = f_.dataType.simpleString()
        if t == "boolean":
            out[f_.name] = "CAST({} AS SMALLINT)"
        elif t.startswith("timestamp"):
            out[f_.name] = "unix_millis({})"
    return out


def _wrap_arith_operands(sql_text: str, wrappers: dict[str, str]) -> str:
    """Wrap column refs that sit directly beside an arithmetic operator;
    refs in logical/comparison contexts are untouched."""
    if not wrappers:
        return sql_text
    names = "|".join(re.escape(c) for c in sorted(wrappers, key=len,
                                                  reverse=True))
    op = r"(?:[%*/+-]|\b[dD][iI][vV]\b)"
    pat = re.compile(
        rf"((?:\w+\.)?\b(?:{names})\b)(\s*{op})|"
        rf"({op}\s*)((?:\w+\.)?\b(?:{names})\b)")

    def wrap(ref: str) -> str:
        bare = ref.split(".")[-1]
        return wrappers[bare].format(ref)

    def sub(m):
        if m.group(1) is not None:
            return f"{wrap(m.group(1))}{m.group(2)}"
        return f"{m.group(3)}{wrap(m.group(4))}"

    def seg_fn(seg: str) -> str:
        prev = None
        while prev != seg:           # handle 'a % b' with both wrapped
            prev = seg
            seg = pat.sub(sub, seg)
        return seg

    return _outside_quotes(sql_text, seg_fn)


# Spark-side numeric builtins the reference feeds BOOL (and timestamp)
# columns to via implicit promotion (test_calculate.yaml#0/#4/#5/#6:
# abs(bool)=1, log(bool), floor(bool), pow(bool, x) ...)
_NUMERIC_ARG_FNS = ("abs", "floor", "ceil", "ceiling", "round", "sqrt",
                    "exp", "ln", "log", "log2", "log10", "sin", "cos",
                    "tan", "cot", "asin", "acos", "atan", "atan2",
                    "pow", "power", "degrees", "radians")
_NUMFN_OPEN = re.compile(
    rf"(?i)\b(?:{'|'.join(_NUMERIC_ARG_FNS)})\s*\(")


def _strict_reject(sql_text: str, types: dict[str, str]) -> None:
    """Compile-time type rejections the reference's planner enforces and
    Spark's coercion would paper over (error-case conformance, VERDICT
    r2 missing #4): date/string operands in arithmetic, timestamp in
    multiplicative ops or unary minus, LIKE over non-string, date()
    casts of numerics. Raises UnsupportedSQL. Expression coercions the
    engine DOES support on purpose (string-vs-numeric compares, bool
    promotion) are not touched."""
    arith_bad = {c for c, t in types.items() if t in ("date", "string")}
    ts_cols = {c for c, t in types.items() if t.startswith("timestamp")}
    num_cols = {c for c, t in types.items() if t in _NUMERIC}

    def ref_pat(cols):
        return ("(?:\\w+\\.|\\{\\d+\\}\\.)?\\b(?:"
                + "|".join(re.escape(c) for c in sorted(cols, key=len,
                                                        reverse=True))
                + ")\\b")

    mul_op = r"(?:[%*/]|\b[dD][iI][vV]\b|\bMOD\b)"
    any_op = r"(?:[%*/+-]|\b[dD][iI][vV]\b|\bMOD\b)"

    def check(seg: str) -> str:
        if arith_bad:
            r = ref_pat(arith_bad)
            if re.search(rf"({r})\s*{any_op}", seg) or \
                    re.search(rf"{any_op}\s*({r})", seg):
                raise UnsupportedSQL(
                    "date/string operand in arithmetic "
                    "(test_arithmetic.yaml error cases)")
        if ts_cols:
            r = ref_pat(ts_cols)
            if re.search(rf"({r})\s*{mul_op}", seg) or \
                    re.search(rf"{mul_op}\s*({r})", seg):
                raise UnsupportedSQL(
                    "timestamp operand in multiplicative arithmetic")
            # `-` immediately before a ts ref covers unary minus
            # (test_arithmetic.yaml#16), int - ts (#9) and ts - ts
            # (#12); ts - int stays legal (#8)
            if re.search(rf"-\s*({r})", seg):
                raise UnsupportedSQL("minus into timestamp operand")
        # cross-domain comparisons: ts vs numeric/bool/date and date vs
        # numeric/bool/ts are compile errors (test_predicate.yaml#2/#4/
        # #5); string compares stay legal (lexical, #1/#3)
        time_doms = {**{c: "ts" for c in ts_cols},
                     **{c: "date" for c, t in types.items()
                        if t == "date"}}
        other = {c for c, t in types.items()
                 if t in _NUMERIC or t == "boolean"}
        if time_doms:
            ref2 = (r"(?:\w+\.|\{\d+\}\.)?(\w+)")
            for m in re.finditer(
                    rf"{ref2}\s*(?:>=|<=|<>|!=|==|=|>|<)\s*{ref2}", seg):
                d1, d2 = (time_doms.get(m.group(1)),
                          time_doms.get(m.group(2)))
                o1, o2 = m.group(1) in other, m.group(2) in other
                if (d1 and (o2 or (d2 and d2 != d1))) or (d2 and o1):
                    raise UnsupportedSQL(
                        f"comparison between {m.group(1)} and "
                        f"{m.group(2)} (incompatible time domains)")
        for m in re.finditer(
                r"(?i)(?:\w+\.|\{\d+\}\.)?\b(\w+)\s+(?:not\s+)?i?like\b",
                seg):
            t = types.get(m.group(1))
            if t and t != "string":
                raise UnsupportedSQL(
                    f"LIKE requires string input, {m.group(1)} is {t}")
        if re.search(r"(?i)\bi?like\s+null\b", seg):
            raise UnsupportedSQL("NULL LIKE pattern")
        if num_cols:
            r = ref_pat(num_cols)
            if re.search(rf"(?i)\bdate\s*\(\s*({r})\s*\)", seg) or \
                    re.search(rf"(?i)\bcast\s*\(\s*({r})\s+as\s+date\s*\)",
                              seg):
                raise UnsupportedSQL(
                    "cast of numeric to date (test_type.yaml#26-30)")
        # scalar-function first-arg type registrations the reference's
        # resolver enforces (function/function fail cases): strcmp and
        # substr admit only strings (test_string.yaml#5/#6/#8),
        # date_format only ts/date (test_date.yaml#1), day/month/...
        # int64/ts/date (#3), hour/minute int64/ts (#5)
        for fam, allowed in _FN_ARG1_TYPES:
            for m in re.finditer(
                    rf"(?i)\b(?:{fam})\s*\(\s*(?:\w+\.|\{{\d+\}}\.)?"
                    rf"(\w+)\s*[,)]", seg):
                t = types.get(m.group(1))
                if t and t not in allowed:
                    raise UnsupportedSQL(
                        f"{m.group(0).strip()}: {t} argument is not "
                        f"registered for this function")
        for m in re.finditer(
                r"(?i)\bstrcmp\s*\(\s*(?:\w+\.|\{\d+\}\.)?(\w+)\s*,"
                r"\s*(?:\w+\.|\{\d+\}\.)?(\w+)\s*\)", seg):
            for g in (1, 2):
                t = types.get(m.group(g))
                if t and t != "string":
                    raise UnsupportedSQL(
                        f"strcmp over {t} (string args required)")
        if re.search(r"(?i)\bi?like_match\s*\([^,]*,\s*null\b", seg):
            raise UnsupportedSQL(
                "NULL like_match pattern (test_like_match.yaml#17)")
        if re.search(r"(?i)\bcount\s*\(\s*\d+(?:\.\d+)?\s*\)", seg):
            # count(*) is special-cased in the reference; count over a
            # bare const literal is a resolver error
            # (v040/test_udaf.yaml#1)
            raise UnsupportedSQL(
                "count over a constant literal (reference rejects)")
        # the reference's planner requires hashable index-key types for
        # GROUP BY / window PARTITION BY — float/double keys are
        # compile errors (v040/test_groupby.yaml#6/#7,
        # test_performance_insensitive.yaml#14/#15/#17/#18)
        flt_cols = {c for c, t in types.items() if t in ("float",
                                                         "double")}
        if flt_cols:
            for m in re.finditer(
                    r"(?is)\b(?:group|partition)\s+by\s+(.*?)"
                    r"(?=\bhaving\b|\border\s+by\b|\blimit\b"
                    r"|\bwindow\b|\brows\b|\brows_range\b|\)|$)",
                    seg):
                for ref in re.findall(
                        r"(?:\w+\.|\{\d+\}\.)?\b(\w+)\b", m.group(1)):
                    if ref in flt_cols:
                        raise UnsupportedSQL(
                            f"float/double grouping key {ref!r} "
                            "(reference planner rejects)")
        return seg

    _outside_quotes(sql_text, check)
    _check_ifnull_types(sql_text, types)
    _reject_having_alias(sql_text, types)


def _reject_having_alias(sql_text: str, types: dict[str, str]) -> None:
    """The reference resolves HAVING against input columns and aggregate
    expressions only — a select-list alias in HAVING is a compile error
    (v040/test_groupby.yaml#18 ``having v1>1``), while Spark would
    happily resolve the alias."""
    mh = re.search(r"(?is)\bhaving\b(.*?)(?=\border\s+by\b|\blimit\b|$)",
                   sql_text)
    if not mh:
        return
    msel = re.search(r"(?is)^\s*select\s+(.*?)\s+from\b", sql_text)
    if not msel:
        return
    aliases = {a.strip("`")
               for a in re.findall(r"(?i)\bas\s+(`?\w+`?)", msel.group(1))}
    for ref in re.findall(r"\b(\w+)\b", mh.group(1)):
        if ref in aliases and ref not in types:
            raise UnsupportedSQL(
                f"select alias {ref!r} in HAVING "
                "(reference planner rejects)")


def _split_on_chars(text: str, seps: str) -> list[str]:
    """Split on any of ``seps`` chars at paren depth 0 outside quotes."""
    parts, depth, cur, q = [], 0, [], None
    for ch in text:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in seps:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    return parts


_PROMO = ["smallint", "int", "bigint", "float", "double"]


def _expr_type(text: str, types: dict[str, str]) -> str | None:
    """Static type of a LIMITED expression grammar (col refs, literals,
    + - * / % over them) under the reference's rules: int literals are
    int32, float literals double, ``/`` always double, other arith
    promotes along the numeric ladder with NO implicit widening beyond
    it. Returns None for shapes it cannot type (no check then)."""
    t = text.strip()
    while t.startswith("(") and t.endswith(")"):
        inner, depth, ok = t[1:-1], 0, True
        for ch in inner:
            depth += ch == "("
            depth -= ch == ")"
            if depth < 0:
                ok = False
                break
        if not ok or depth != 0:
            break
        t = inner.strip()
    for seps in ("+-", "*/%"):
        # empty heads are unary signs (`-3` splits to ['', '3'])
        parts = [p for p in _split_on_chars(t, seps) if p.strip()]
        if len(parts) > 1:
            kinds = [_expr_type(p, types) for p in parts]
            if any(k is None or k not in _PROMO for k in kinds):
                return None
            if seps == "*/%" and "/" in _top_level_ops(t, seps):
                return "double"        # fdiv always yields double
            return _PROMO[max(_PROMO.index(k) for k in kinds)]
    if re.fullmatch(r"'[^']*'|\"[^\"]*\"", t):
        return "string"
    if re.fullmatch(r"[-+]?\d+", t):
        return "int" if -2**31 <= int(t) < 2**31 else "bigint"
    if re.fullmatch(r"(?i)[-+]?(\d*\.\d+|\d+\.)(e[-+]?\d+)?", t):
        return "double"
    if re.fullmatch(r"(?i)(true|false)", t):
        return "boolean"
    m = re.fullmatch(r"(?:\{\d+\}\.|\w+\.)?(\w+)", t)
    if m:
        return types.get(m.group(1))
    return None


def _top_level_ops(text: str, seps: str) -> list[str]:
    ops, depth, q = [], 0, None
    for ch in text:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in seps:
            ops.append(ch)
    return ops


def _check_ifnull_types(sql_text: str, types: dict[str, str]) -> None:
    """ifnull/nvl(a, b) and nvl2(c, a, b) require a and b to have the
    SAME static type — the reference does NOT widen (int vs bigint is
    an error: test_condition.yaml#9/#11-1/#12/#13, NVL2-2)."""
    for m in re.finditer(r"(?i)\b(ifnull|nvl2|nvl)\s*\(", sql_text):
        start = m.end()
        depth, q, end = 1, None, None
        for i in range(start, len(sql_text)):
            ch = sql_text[i]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end is None:
            continue
        args = _split_on_chars(sql_text[start:end], ",")
        want = 3 if m.group(1).lower() == "nvl2" else 2
        if len(args) != want:
            continue
        ta = _expr_type(args[-2], types)
        tb = _expr_type(args[-1], types)
        if ta is not None and tb is not None and ta != tb:
            raise UnsupportedSQL(
                f"{m.group(1)} branch types differ: {ta} vs {tb} "
                f"(exact match required)")


_FN_ARG1_TYPES: list[tuple[str, set]] = [
    ("strcmp|substr|substring|char_length|character_length|lcase|ucase"
     "|lower|upper|reverse|like_match|ilike_match", {"string"}),
    ("date_format", {"timestamp", "timestamp_ntz", "date"}),
    ("day|dayofmonth|dayofweek|week|weekofyear|year|month",
     {"bigint", "timestamp", "timestamp_ntz", "date"}),
    ("hour|minute|second", {"bigint", "timestamp", "timestamp_ntz"}),
    # math registrations admit numerics (+bool via promotion) only —
    # string/timestamp/date args are compile errors
    # (test_calculate.yaml#7/#9)
    ("abs|cos|cot|sin|tan|acos|asin|atan|atan2|log|log2|log10|ln"
     "|ceil|ceiling|floor|round|truncate|exp|sqrt|pow|power",
     {"smallint", "int", "bigint", "float", "double", "boolean"}),
]


def _reject_interval_literals(sql_text: str) -> None:
    """Interval literals (1s/2d/...) are only legal inside frame bounds;
    as a project expression the reference rejects them
    (fail_query.yaml#1/#2)."""
    def check(seg: str) -> str:
        if re.search(r"\b\d+[smhd]\b", seg):
            raise UnsupportedSQL("interval literal outside frame bound")
        return seg
    _outside_quotes(sql_text, check)


def _wrap_numeric_fn_args(sql_text: str, wrappers: dict[str, str]) -> str:
    """Wrap bool/timestamp column refs appearing inside a numeric
    function's argument list — the operand-adjacent pass only covers
    refs beside an arithmetic operator."""
    if not wrappers:
        return sql_text
    colpat = re.compile(
        r"(?<![.\w])("
        + "|".join(re.escape(c) for c in sorted(wrappers, key=len,
                                                reverse=True))
        + r")\b(?!\s*[(.])")

    def wrap_refs(seg: str) -> str:
        return colpat.sub(lambda mm: wrappers[mm.group(1)]
                          .format(mm.group(1)), seg)

    out, i, n = [], 0, len(sql_text)
    while True:
        m = _NUMFN_OPEN.search(sql_text, i)
        if not m:
            out.append(sql_text[i:])
            return "".join(out)
        depth, p = 1, m.end()
        while p < n and depth:
            ch = sql_text[p]
            if ch in "'\"":
                q = p + 1
                while q < n and sql_text[q] != ch:
                    q += 1
                p = q
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            p += 1
        out.append(sql_text[i:m.end()])
        out.append(_outside_quotes(sql_text[m.end():p - 1], wrap_refs))
        out.append(sql_text[p - 1:p])
        i = p


_NUMERIC = {"smallint", "int", "bigint", "float", "double"}


_IN_LITLIST = re.compile(
    r"(?<![\w.'])([+-]?\d+(?:\.\d+)?|'[^']*')\s+(not\s+)?in\s*\(([^()]*)\)",
    re.IGNORECASE)


def _coerce_literal_in(sql_text: str) -> str:
    """Reference IN-list literal coercion (cases/query/simple_query.yaml
    in_predicate_type_cast_3/_4): '1' IN (1.0, 2.0) and 1 IN (1.0, '2')
    compare NUMERICALLY — any fractional literal among the operands
    pulls string literals to DOUBLE. Golden-case runs execute under
    spark.sql.ansi.enabled=false (for cast-failure->NULL parity with
    the reference's C++), where Spark's legacy resolver widens the set
    to STRING and compares lexically ('1' != '1.0' -> false) — this
    rewrite is what makes those cases match. Under ANSI sessions
    Spark's own resolver already coerces numerically and the added
    CASTs are semantic no-ops (both modes verified empirically,
    round 5). Literal-only by construction; column-ref coercions are
    handled below in _wrap_compare_operands.

    Quote-span aware without _outside_quotes (the lhs operand may
    itself be a quoted literal, which that helper would excise from the
    searched segments): a match rewrites only when every string literal
    it touches is one of its own operands — fully inside the match — so
    an IN-looking sequence INSIDE a string constant (``WHERE note =
    'call 1 in (1.5, ''x'') now'``) is left untouched (the corruption
    class _outside_quotes exists for, ADVICE r2 #5)."""
    spans = [(qm.start(), qm.end())
             for qm in _QUOTED_SPAN.finditer(sql_text)]

    def span_safe(m: re.Match) -> bool:
        for s, e in spans:
            if e <= m.start() or s >= m.end():
                continue                      # disjoint span
            if s < m.start() or e > m.end():
                return False                  # crosses a match edge
        return True

    def is_str(t: str) -> bool:
        return len(t) >= 2 and t.startswith("'") and t.endswith("'")

    def is_num(t: str) -> bool:
        return re.fullmatch(r"[+-]?\d+(?:\.\d+)?", t) is not None

    def sub(m: re.Match) -> str:
        if not span_safe(m):
            return m.group(0)
        lhs, neg, body = m.group(1), m.group(2) or "", m.group(3)
        items = [t.strip() for t in body.split(",")]
        ops = [lhs] + items
        if not all(is_str(t) or is_num(t) for t in ops):
            return m.group(0)
        has_frac = any(is_num(t) and "." in t for t in ops)
        if not (has_frac and any(is_str(t) for t in ops)):
            return m.group(0)
        cast = lambda t: f"CAST({t} AS DOUBLE)" if is_str(t) else t  # noqa: E731
        return f"{cast(lhs)} {neg}in ({', '.join(cast(t) for t in items)})"

    return _IN_LITLIST.sub(sub, sql_text)


def _wrap_compare_operands(sql_text: str, types: dict[str, str]) -> str:
    """Cross-type comparison coercions the reference applies but Spark
    resolves differently: string vs non-string compares LEXICALLY (cast
    the other side to string — Spark would cast the string to the other
    type, yielding NULL); timestamp vs numeric compares on epoch ms;
    bool vs numeric promotes bool to 0/1."""
    sql_text = _coerce_literal_in(sql_text)
    if not types:
        return sql_text
    names = "|".join(re.escape(c) for c in sorted(types, key=len,
                                                  reverse=True))
    ref = rf"(?:\w+\.)?\b(?:{names})\b"
    pat = re.compile(rf"({ref})(\s*(?:<=|>=|<>|!=|==|=|<|>)\s*)({ref})")

    def sub(m):
        a, op, b = m.group(1), m.group(2), m.group(3)
        ta = types.get(a.split(".")[-1], "")
        tb = types.get(b.split(".")[-1], "")
        if ta == tb:
            return m.group(0)
        def is_ts(t):
            return t.startswith("timestamp")
        def to_str(ref, t):
            # the reference renders timestamps as LOCAL-time strings and
            # its golden corpus was authored in CST — shift so lexical
            # comparison reproduces the goldens
            if t.startswith("timestamp"):
                return (f"CAST(from_utc_timestamp({ref}, 'Asia/Shanghai')"
                        f" AS STRING)")
            return f"CAST({ref} AS STRING)"
        if ta == "string" and tb != "string":
            b = to_str(b, tb)
        elif tb == "string" and ta != "string":
            a = to_str(a, ta)
        elif is_ts(ta) and tb in _NUMERIC:
            a = f"unix_millis({a})"
        elif is_ts(tb) and ta in _NUMERIC:
            b = f"unix_millis({b})"
        elif ta == "boolean" and tb in _NUMERIC:
            a = f"CAST({a} AS SMALLINT)"
        elif tb == "boolean" and ta in _NUMERIC:
            b = f"CAST({b} AS SMALLINT)"
        return f"{a}{op}{b}"

    return _outside_quotes(sql_text, lambda seg: pat.sub(sub, seg))


def _wrap_not_truthiness(sql_text: str, types: dict[str, str]) -> str:
    """OpenMLDB NOT/! accepts any type via truthiness (number != 0,
    non-empty string, NULL -> NULL); Spark requires boolean. Wraps only
    the unambiguous 'NOT <ref>' form where the ref is the whole operand
    (followed by a select-list boundary)."""
    nonbool = {c: t for c, t in types.items() if t != "boolean"}
    if not nonbool:
        return sql_text
    names = "|".join(re.escape(c) for c in sorted(nonbool, key=len,
                                                  reverse=True))
    pat = re.compile(
        rf"(\bNOT\b|!(?!=))\s*((?:\w+\.)?\b(?:{names})\b)"
        rf"(?=\s*(?:,|\bas\b|\bfrom\b|$))", re.IGNORECASE)

    def truthy(ref: str, t: str) -> str:
        if t in _NUMERIC:
            return f"({ref} <> 0)"
        if t == "string":
            return f"(length({ref}) > 0)"
        if t.startswith("timestamp"):
            return f"(unix_millis({ref}) <> 0)"
        return f"(CASE WHEN {ref} IS NULL THEN CAST(NULL AS BOOLEAN) " \
               f"ELSE TRUE END)"

    def sub(m):
        ref = m.group(2)
        return f"{m.group(1)} {truthy(ref, nonbool[ref.split('.')[-1]])}"

    return _outside_quotes(sql_text, lambda seg: pat.sub(sub, seg))


def _type_map(schema) -> dict[str, str]:
    return {f_.name: f_.dataType.simpleString() for f_ in schema.fields}


def _strip_outer_parens(text: str) -> str:
    while text.startswith("(") and text.endswith(")"):
        inner = text[1:-1]
        depth, ok = 0, True
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    ok = False
                    break
        if not ok or depth != 0:
            break
        text = inner.strip()
    return text


def _lastjoin_strict(right: DataFrame, order_ref: str | None,
                     key_src: dict[str, str]) -> None:
    """Reference LAST JOIN planner rules shared by both SQL runners:

    - ORDER BY sort keys may only be int32/int64/timestamp
      (test_lastjoin_simple.yaml: #6 int passes; #7-#10/#28/#29
      float/double/date/string/smallint/bool all expect failure).

    NOT enforced: the key/ts same-source-table rule for subquery
    right sides — test_lastjoin_complex.yaml#13-2 expects failure for
    it, but #13-1 in the same file runs the byte-identical SQL over the
    same indexes and records a SUCCESS golden with rows; we execute
    (matching #13-1) and pin #13-2 as a divergent golden."""
    if order_ref is None:
        return
    oc = _strip_table(order_ref)
    ot = dict(right.dtypes).get(oc)
    if ot is not None and ot not in (
            "int", "bigint", "timestamp", "timestamp_ntz"):
        raise UnsupportedSQL(
            f"LAST JOIN ORDER BY {oc}: {ot} is not a valid "
            f"sort-key type")


def _parse_lastjoin_chain(from_text: str, tables: list[DataFrame]):
    """Parse 'FROM {0} (LAST JOIN {i} [ORDER BY ref] ON conds)+ [tail]'
    and execute the chain with the last_join operator. Returns
    (joined_df, resolver, tail_text) where resolver maps ({i}, col) to
    the joined relation's column name."""
    from openmldb_spark.operators.last_join import last_join

    parts = re.split(r"(?i)\blast\s+join\b", " " + from_text)
    if parts[0].strip() != "{0}":
        raise UnsupportedSQL(f"FROM head {parts[0].strip()!r}")
    joins = []
    tail = ""
    for seg_i, part in enumerate(parts[1:]):
        mj = re.match(r"(?is)^\s*\{(\d+)\}\s*"
                      r"(?:order\s+by\s+(\S+)\s+)?on\s+(.+?)"
                      r"(\s+(?:where|limit|group)\b.*)?$", part)
        if not mj:
            raise UnsupportedSQL(f"join segment {part!r}")
        if mj.group(4) and seg_i < len(parts) - 2:
            raise UnsupportedSQL("tail before last join segment")
        joins.append((int(mj.group(1)), mj.group(2), mj.group(3)))
        tail = mj.group(4) or ""

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
        keys, key_src = [], {}
        left_ts = right_ts = None
        residuals: list[str] = []
        for cond in _split_conjuncts(
                _strip_outer_parens(conds_text.strip())):
            cond = _strip_outer_parens(cond.strip())
            mc = re.match(r"^(\S+)\s*(<=|>=|=|==)\s*(\S+)$", cond.strip())
            if not mc:
                residuals.append(cond.strip())
                continue
            try:
                at, ac = _tbl_col(mc.group(1))
                bt, bc = _tbl_col(mc.group(3))
            except UnsupportedSQL:
                residuals.append(cond.strip())
                continue
            op = mc.group(2)
            if at == ti and bt != ti:
                at, ac, bt, bc = bt, bc, at, ac
                op = {"<=": ">=", ">=": "<="}.get(op, op)
            if bt != ti or at == ti:
                raise UnsupportedSQL(f"cond {cond!r}")
            if op in ("=", "=="):
                an = resolve(at, ac)
                keys.append(an)
                key_src[an] = bc
            elif op == ">=":
                left_ts, right_ts = resolve(at, ac), bc
            else:
                # a `<=` (or other non-PIT) comparison is a θ-residual
                # — run_lastjoin_sql accepts the same shape; the two
                # chain parsers must agree
                residuals.append(cond.strip())
        if not keys:
            raise UnsupportedSQL("no equi keys")
        _lastjoin_strict(right, order_ref, key_src)
        sel_r = [F.col(key_src[an]).alias(an) for an in keys]
        sel_r += [F.col(c).alias(f"__t{ti}_{c}")
                  for c in tables[ti].columns if c != _RID]
        # same synthesized storage-order id as the windowed runner:
        # no-_RID tables must not leave __jrid{ti} unresolved
        sel_r.append((F.col(_RID) if _RID in right.columns
                      else F.monotonically_increasing_id())
                     .alias(f"__jrid{ti}"))
        right2 = right.select(*sel_r)
        rts = f"__t{ti}_{right_ts}" if right_ts is not None else None
        order_by = f"__t{ti}_{_strip_table(order_ref)}" if order_ref \
            else f"__jrid{ti}"
        extra = None
        if residuals:
            # θ-residual condition (reference JoinPlan residual filter):
            # rewrite {i}.col / bare right-col refs to the joined names
            right_bare = {c for c in tables[ti].columns if c != _RID}

            def fix_ref(mm):
                rt, rc = int(mm.group(1)), mm.group(2)
                if rt == ti:
                    return f"__t{ti}_{rc}"
                nm = resolve(rt, rc)
                if nm in key_src:
                    # the equi-key exists UNPREFIXED on both join sides
                    # (ambiguous in the join condition); values are
                    # equal per the equi constraint, so bind to the
                    # right side's prefixed copy (between_predicate_1)
                    return f"__t{ti}_{key_src[nm]}"
                return nm
            bare_map = {c: f"__t{ti}_{c}" for c in right_bare}
            parts_c = []
            for rc_ in residuals:
                # normalize backquoted dotted refs so the tokenizer's
                # dotted-skip applies, then bare-ref mapping FIRST (the
                # tokenizer skips dotted refs), then qualified-ref
                # resolution — the reverse order would re-map a resolved
                # left ref that shares its name with a right column
                rc_ = re.sub(r"\.\s*`(\w+)`", r".\1", rc_)
                rc_ = rewrite_expr(rc_, bare_map)
                rc_ = re.sub(r"\{(\d+)\}\.(\w+)", fix_ref, rc_)
                # reference ts +/- int is millisecond arithmetic
                # (spark/test_jd.yaml residual: dt < date - 0)
                ts_cols = {f.name for f in acc.schema.fields
                           if f.dataType.simpleString()
                           .startswith("timestamp")}
                ts_cols |= {f"__t{ti}_{f.name}"
                            for f in tables[ti].schema.fields
                            if f.dataType.simpleString()
                            .startswith("timestamp")}
                rc_ = _wrap_ts_plusminus(rc_, ts_cols)
                parts_c.append(f"({rc_})")
            extra = F.expr(" AND ".join(parts_c))
        acc = last_join(acc, right2, on=keys, order_by=order_by,
                        left_ts=left_ts, right_ts=rts, extra_cond=extra,
                        strategy="join_rank", tiebreak=f"__jrid{ti}")
        for c in tables[ti].columns:
            if c != _RID:
                resmap[(ti, c)] = f"__t{ti}_{c}"
    return acc, resolve, tail


def run_general_sql(spark, sql: str, tables: list[DataFrame],
                    names: list[str | None] | None = None) -> DataFrame:
    """Run a non-window OpenMLDB-dialect SELECT via Spark SQL after
    transpiling (see module section comment). ``names`` optionally
    registers each table under its case-declared name as well."""
    if not getattr(spark, "_omls_hash64_registered", False):
        from .functions.hashing import register_hash_udfs
        register_hash_udfs(spark)
        spark._omls_hash64_registered = True
    sql, _ = strip_deploy_options(sql)
    s = strip_sql_comments(sql).strip().rstrip(";").rstrip()
    # the reference's parser tolerates a trailing comma at the end of
    # the select list (test_udf_function.yaml#5)
    s = re.sub(r",\s*$", "", s)
    _reject_interval_literals(s)
    if re.search(r"(?i)\blast\s+join\b", s):
        # per-operand table slots for the join chain (self-join aliases)
        s, tables = _inline_join_aliases(s, tables)
        names = list(names) + [None] * (len(tables) - len(names)) \
            if names else names
    # table aliases: `{i} AS alias` -> rewrite alias-qualified refs —
    # OUTSIDE string literals only (a literal like 't1.x' must pass
    # through unchanged; same hazard class as _inline_join_aliases,
    # ADVICE r3 low #4)
    for mm in list(re.finditer(r"\{(\d+)\}\s+[aA][sS]\s+(\w+)", s)):
        ti, al = mm.group(1), mm.group(2)
        s = _outside_quotes(s, lambda seg: re.sub(
            r"(\{\d+\})\s+[aA][sS]\s+" + re.escape(al) + r"\b",
            r"\1", seg))
        s = _outside_quotes(s, lambda seg: re.sub(
            rf"\b{re.escape(al)}\s*\.", f"{{{ti}}}.", seg))
    low = " " + " ".join(s.lower().split()) + " "
    if " window " in low or re.search(r"(?i)\bover\s*\(", s):
        raise UnsupportedSQL("window clause — use the window runners")

    wrappers: dict[str, str] = {}
    for i, t in enumerate(tables):
        view_cols = [c for c in t.columns if c != _RID]
        tv = t.select(*view_cols)
        tv.createOrReplaceTempView(f"__t{i}")
        if names and i < len(names) and names[i] \
                and re.match(r"^\w+$", str(names[i])):
            tv.createOrReplaceTempView(names[i])
        wrappers.update(_arith_operand_wrappers(tv.schema))

    if re.search(r"(?i)\blast\s+join\b", s):
        m = re.match(r"(?is)^\s*select\s+(.+?)\s+from\s+(\{0\}\s+"
                     r"last\s+join\s+.+)$", s)
        if not m:
            raise UnsupportedSQL("unparseable LAST JOIN select")
        joined, resolve, tail = _parse_lastjoin_chain(m.group(2), tables)
        joined = joined.drop(_RID) if _RID in joined.columns else joined
        joined.createOrReplaceTempView("__rel")

        def sub_ref(mm):
            return resolve(int(mm.group(1)), mm.group(2))
        # bare refs to right-table columns that the left table lacks
        bare_map: dict[str, str] = {}
        for ti in range(1, len(tables)):
            for c in tables[ti].columns:
                if c == _RID or c in tables[0].columns or c in bare_map:
                    continue
                try:
                    bare_map[c] = resolve(ti, c)
                except UnsupportedSQL:
                    pass
        items_txt = m.group(1).strip()
        if items_txt == "*":
            # star over LAST JOIN = left columns then each joined table's
            # columns under their original names (duplicates allowed)
            parts_sel = [c for c in tables[0].columns if c != _RID]
            for ti in range(1, len(tables)):
                for c in tables[ti].columns:
                    if c != _RID:
                        try:
                            parts_sel.append(f"{resolve(ti, c)} AS {c}")
                        except UnsupportedSQL:
                            pass
            items_txt = ", ".join(parts_sel)
        else:
            # a bare select-item ref living in MORE THAN ONE join
            # operand is ambiguous — the reference's resolver rejects
            # it (test_lastjoin_complex.yaml #11-2 bare `id`, #14 bare
            # `c3` twice); qualified refs are untouched
            operands = {0} | {int(x) for x in
                              re.findall(r"\{(\d+)\}", m.group(2))}
            counts: dict[str, int] = {}
            for oi in operands:
                if oi < len(tables):
                    for c in set(tables[oi].columns) - {_RID}:
                        counts[c] = counts.get(c, 0) + 1
            for item in _split_top_level(items_txt):
                mi = re.match(r"(?i)^\s*(\w+)\s*(?:as\s+\w+)?\s*$",
                              item)
                if mi and counts.get(mi.group(1), 0) > 1:
                    raise UnsupportedSQL(
                        f"ambiguous bare column {mi.group(1)!r} "
                        f"across LAST JOIN operands")
        final = f"SELECT {items_txt} FROM __rel {tail}"
        final = re.sub(r"\{(\d+)\}\.(\w+)", sub_ref, final)
        tm = _type_map(joined.schema)
        _strict_reject(final, tm)
        # reference CAST semantics over the joined relation — names are
        # already per-table (__t{i}_ prefixes), so the map is
        # collision-free here; bare right-column refs (rewritten to
        # their prefixed names only later, in rewrite_expr) resolve
        # through bare_map
        tm_cast = {**tm, **{b: tm[p] for b, p in bare_map.items()
                            if p in tm}}
        final = _rewrite_typed_casts(final, tm_cast)
        final = rewrite_expr(final, bare_map)
        final = _wrap_compare_operands(final, tm)
        final = _wrap_not_truthiness(final, tm)
        jw = _arith_operand_wrappers(joined.schema)
        final = _wrap_arith_operands(final, jw)
        final = _wrap_numeric_fn_args(final, jw)
        return spark.sql(final)

    s2 = _outside_quotes(s, lambda seg: re.sub(
        r"\{(\d+)\}", lambda mm: f"__t{mm.group(1)}", seg))
    s2 = _rewrite_array_literals(s2)
    _strict_reject(s2, {**{c: t for tdf in tables
                           for c, t in _type_map(tdf.schema).items()}})
    if _TBL_UDAF_RE.search(s2):
        from .functions.sql_udafs import register_table_udafs
        register_table_udafs(spark)
        s2 = _rewrite_table_udafs(
            s2, {c: t for tdf in tables
                 for c, t in _type_map(tdf.schema).items()},
            per_table={f"__t{i}": _type_map(tdf.schema)
                       for i, tdf in enumerate(tables)})
    tm_all: dict[str, str] = {}
    for i, t in enumerate(tables):
        tm_all.update(_type_map(t.select(
            *[c for c in t.columns if c != _RID]).schema))
    s2 = _rewrite_typed_casts(
        s2, tm_all,
        per_table={f"__t{i}": _type_map(tdf.schema)
                   for i, tdf in enumerate(tables)})
    s2 = rewrite_expr(s2)
    s2 = _wrap_compare_operands(s2, tm_all)
    s2 = _wrap_not_truthiness(s2, tm_all)
    s2 = _wrap_arith_operands(s2, wrappers)
    s2 = _wrap_numeric_fn_args(s2, wrappers)
    return spark.sql(s2)


def _balanced_span(s: str, start: int) -> int:
    """End index (exclusive) of the paren group opening at ``start``,
    honoring string literals."""
    depth, i = 0, start
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            i = _skip_literal(s, i) - 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise UnsupportedSQL("unbalanced subquery parentheses")


def _renumber_refs(sql: str, tables: list[DataFrame],
                   names: list | None):
    """Densely renumber ``{i}`` placeholders with the FROM target first
    (the runners require the primary at {0}); returns
    (sql, tables, names) reordered to match."""
    order: list[int] = []
    for mm in re.finditer(r"\{(\d+)\}", sql):
        ti = int(mm.group(1))
        if ti not in order:
            order.append(ti)
    mfrom = re.search(r"(?i)\bfrom\s+`?\{(\d+)\}`?", sql)
    if mfrom:
        p = int(mfrom.group(1))
        order.remove(p)
        order.insert(0, p)
    remap = {old: new for new, old in enumerate(order)}
    out = re.sub(r"\{(\d+)\}",
                 lambda mm: f"{{{remap[int(mm.group(1))]}}}", sql)
    nm = list(names or [None] * len(tables))
    return (out, [tables[o] for o in order], [nm[o] for o in order])


def _eval_subquery(spark, inner: str, tables: list[DataFrame],
                   names: list | None) -> DataFrame:
    """Evaluate one lifted ``(select ...)`` to a DataFrame through the
    windowed runner (plain projections and windowed selects), which
    preserves the insertion row-id — required when the result becomes a
    window primary or a UNION side (reference evaluates subqueries to
    intermediate relations that keep storage order,
    hybridse plan: kProviderTypeRequest over subquery output)."""
    q, subt, _ = _renumber_refs(inner, tables, names)
    q = re.sub(r"`(\{\d+\})`", r"\1", q)
    low = " ".join(q.lower().split())
    if "last join" in low:
        # LAST JOIN subquery operand (fz_ddl/test_myhug.yaml lifts a
        # 1:1 multi_direct join as a feature block); the lastjoin
        # runner keeps the left row-id, preserving insertion order
        if " window " in low or re.search(r"\bover\b", low):
            return run_join_window_sql(q, subt)
        return run_lastjoin_sql(q, subt)
    return run_windowed_sql(q, subt)


def expand_case_subqueries(spark, sql: str, tables: list[DataFrame],
                           names: list | None):
    """Lift top-level ``(select ...)`` subqueries (FROM sources, window
    UNION sides, LAST JOIN operands) into evaluated DataFrames appended
    to ``tables``, replacing their text with ``{N}`` placeholders and
    rewriting ``alias.`` references, then renumbering so the outer
    primary is {0}. Lets the single-relation runners drive composite
    shapes: a windowed subquery into LAST JOIN (sub_select.yaml#6) and
    subquery sample/union window tables (#7/#8). Callers use this as a
    FALLBACK after direct routing fails, so natively-supported subquery
    SQL (the general Spark-SQL path) is untouched."""
    _KW = {"last", "left", "inner", "on", "where", "window", "group",
           "order", "limit", "union", "partition", "having", "as"}
    s = " ".join(strip_sql_comments(sql).strip().rstrip(";").split())
    s = _collapse_trivial_star(s)
    tables = list(tables)
    names = list(names or [None] * len(tables))
    lifted = False
    while True:
        m = re.search(r"(?i)\(\s*select\b", s)
        if not m:
            break
        # descend to the INNERMOST subquery first: a lifted operand may
        # itself contain subqueries (autox: a FROM-subquery and a
        # UNION-window subquery inside the LAST JOIN's right side) —
        # the single-relation runners need those resolved before the
        # enclosing span is evaluable
        start = m.start()
        while True:
            end = _balanced_span(s, start)
            m2 = re.search(r"(?i)\(\s*select\b", s[start + 1:end - 1])
            if not m2:
                break
            start = start + 1 + m2.start()
        inner = s[start + 1:end - 1].strip()
        df = _eval_subquery(spark, inner, tables, names)
        tables.append(df)
        names.append(None)
        ph = f"{{{len(tables) - 1}}}"
        rest = s[end:]
        ma = re.match(r"(?i)\s+(?:as\s+)?([A-Za-z_]\w*)", rest)
        alias = None
        if ma and ma.group(1).lower() not in _KW:
            alias = ma.group(1)
            rest = rest[ma.end():]
        s = s[:start] + ph + rest
        if alias:
            s = re.sub(rf"\b{re.escape(alias)}\s*\.", ph + ".", s)
        lifted = True
    if not lifted:
        return sql, tables, names
    return _renumber_refs(s, tables, names)


_TBL_UDAF_RE = re.compile(
    r"(?i)\b(top_n_(?:key|value)_(?:count|sum|avg|min|max)_cate(?:_where)?"
    r"|(?:count|sum|avg|min|max)_cate(?:_where)?"
    r"|(?:count|sum|avg|min|max)_where)\s*\(")


def _rewrite_table_udafs(text: str, types: dict[str, str],
                         per_table: dict[str, dict[str, str]]
                         | None = None) -> str:
    """Rewrite table-level dialect UDAF calls for the general SQL path
    (integration_test/select/test_full_table.yaml):

    - ``{fn}_where(v, cond)`` -> pure Catalyst
      ``{fn}(CASE WHEN cond THEN v END)`` (reference
      default_udf_library.cc:2706-2826);
    - ``{fn}_cate[_where]`` / ``top_n_{key,value}_{fn}_cate[_where]``
      -> the registered grouped-agg pandas UDFs
      (functions/sql_udafs.py), with DECLARED types injected as literal
      args so k:v rendering matches v1::format_string. A _where cond
      NULLs the category so fully-excluded categories vanish (not
      rendered as count 0), matching agg_by_category_def.cc.
    """
    def typ(e: str) -> str:
        e = e.strip()
        mq = re.match(r"^(\w+)\.(\w+)$", e)
        if mq and per_table and mq.group(1) in per_table:
            # qualified ref: resolve in THAT table's schema — a merged
            # map would let a colliding column name from another table
            # inject the wrong declared type (ADVICE r3 low #5)
            return per_table[mq.group(1)].get(mq.group(2), "")
        c = re.sub(r"^\s*(?:\w+\.)?", "", e)
        return types.get(c, "")

    def unpack(args: list[str], n: int, name: str) -> list[str]:
        if len(args) != n:
            raise UnsupportedSQL(
                f"{name} expects {n} args, got {len(args)}")
        return args

    # a statement mixing *_where with a cate UDAF must keep EVERY
    # aggregate pandas-side (INVALID_PANDAS_UDF_PLACEMENT otherwise)
    has_cate = bool(re.search(r"(?i)\b\w*_cate(_where)?\s*\(", text))
    out = text
    while True:
        m = _TBL_UDAF_RE.search(out)
        if not m:
            break
        end = _balanced_span(out, m.end() - 1)
        args = [a.strip() for a in
                _split_top_level(out[m.end():end - 1])]
        name = m.group(1).lower()
        if name.startswith("top_n_"):
            mode = "key" if name.startswith("top_n_key_") else "value"
            fn = re.match(r"top_n_(?:key|value)_(\w+?)_cate",
                          name).group(1)
            if name.endswith("_where"):
                v, cond, k, n = unpack(args, 4, name)
                vx = f"CASE WHEN ({cond}) THEN ({v}) END"
                kx = f"CASE WHEN ({cond}) THEN ({k}) END"
            else:
                v, k, n = unpack(args, 3, name)
                vx, kx = v, k
            repl = (f"__omls_topn_cate({vx}, {kx}, '{fn}', "
                    f"'{typ(v)}', '{typ(k)}', {n}, '{mode}')")
        elif name.endswith("_cate") or name.endswith("_cate_where"):
            fn = name.split("_")[0]
            if name.endswith("_where"):
                v, cond, k = unpack(args, 3, name)
                vx = f"CASE WHEN ({cond}) THEN ({v}) END"
                kx = f"CASE WHEN ({cond}) THEN ({k}) END"
            else:
                v, k = unpack(args, 2, name)
                vx, kx = v, k
            repl = (f"__omls_cate_agg({vx}, {kx}, '{fn}', "
                    f"'{typ(v)}', '{typ(k)}')")
        else:                                    # {fn}_where
            fn = name[:-6]
            v, cond = unpack(args, 2, name)
            vt = typ(v)
            if has_cate and fn == "count":
                repl = f"__omls_count(CASE WHEN ({cond}) THEN ({v}) END)"
            elif has_cate and fn in ("min", "max") and vt in (
                    "string", "date"):
                # the double-typed twin would to_numeric a string
                # column into all-NaN -> NULL; lexicographic min/max
                # needs the string twin
                repl = (f"__omls_aggs(CASE WHEN ({cond}) THEN ({v}) "
                        f"END, '{fn}')")
            elif has_cate:
                repl = (f"__omls_aggd(CASE WHEN ({cond}) THEN ({v}) "
                        f"END, '{fn}')")
                if fn in ("sum", "min", "max") and vt in (
                        "smallint", "int", "bigint"):
                    # the pandas twin is declared double; restore the
                    # Catalyst rewrite's integer result type
                    repl = f"CAST({repl} AS BIGINT)"
            else:
                repl = f"{fn}(CASE WHEN ({cond}) THEN ({v}) END)"
        out = out[:m.start()] + repl + out[end:]
    return out
