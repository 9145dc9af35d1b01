"""Nested UDAF-in-UDAF semantics (reference: hybridse UDAF composition,
pinned by cases/function/function/test_udaf_function.yaml#47/#48/#53 and
cases/hybridsql_gen_cases/auto_gen_case_0.yaml).

Reference semantics: a UDAF nested inside another UDAF's update argument
is evaluated over the CURRENT OUTPUT ROW's frame (a per-output-row
constant Q); the outer aggregate folds ``f(row_j, Q)`` over the frame
rows j. The engine implements this two ways:

- VALUE arguments decompose algebraically into plain windowed aggs
  (``sum(v + count(v))`` -> ``sum(v) + count(v) * count(v)``) — fully
  native, no extra pass (sql._decompose_nested_agg_arg).
- ``count_where(v, L = AGG(...))`` conditions lift the aggregate side
  into a pre-agg column (row-i binding) and count frame rows whose L
  equals the current row's R with a sliding kernel counter
  (sql._rewrite_cur_cond; window_agg cond_l/cond_r path).

Each test checks against a brute-force double-loop oracle implementing
the reference binding directly.
"""

import numpy as np
import pandas as pd
import pytest

from openmldb_spark.sql import UnsupportedSQL, run_windowed_sql


def _frame_rows(g, i, w):
    """ROWS BETWEEN w PRECEDING AND CURRENT ROW frame indices."""
    return list(range(max(0, i - w), i + 1))


def _mkdf(spark, seed=7, n=40):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 5, n).astype(np.int64),
        "c": rng.choice([True, False], n),
        "__case_rid": np.arange(n, dtype=np.int64),
    })
    # a few NULL values exercise skip semantics
    pdf.loc[3, "v"] = None
    pdf.loc[11, "v"] = None
    df = spark.createDataFrame(
        pdf.astype({"v": "Int64"}),
        "k string, ts bigint, v bigint, c boolean, __case_rid bigint")
    return pdf, df


WIN = ("window w as (partition by k order by ts "
       "rows between 5 preceding and current row)")


def _oracle(pdf, outer, w=5):
    """outer(frame_js, Q_i) per row, grouped by k ordered by ts."""
    out = np.full(len(pdf), np.nan)
    for k, g in pdf.groupby("k"):
        g = g.sort_values("ts").reset_index()
        for i in range(len(g)):
            js = _frame_rows(g, i, w)
            out[g.loc[i, "index"]] = outer(g, js, i)
    return out


def test_sum_plus_count_decomposition(spark):
    pdf, df = _mkdf(spark)

    def outer(g, js, i):
        q = g.loc[js, "v"].notna().sum()          # count(v) over frame i
        vals = [g.loc[j, "v"] + q for j in js if pd.notna(g.loc[j, "v"])]
        return sum(vals) if vals else np.nan

    exp = _oracle(pdf, outer)
    got = run_windowed_sql(
        f"select ts, sum(v + count(v)) over w as s from {{0}} {WIN}",
        [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"])
    assert np.allclose(gv.to_numpy(np.float64), exp, equal_nan=True)


def test_min_where_plus_sum_where_decomposition(spark):
    pdf, df = _mkdf(spark, seed=11)

    def outer(g, js, i):
        q_vals = [g.loc[j, "v"] for j in js
                  if not g.loc[j, "c"] and pd.notna(g.loc[j, "v"])]
        q = sum(q_vals) if q_vals else np.nan      # sum_where(v, NOT c)
        vals = [g.loc[j, "v"] + q for j in js
                if g.loc[j, "c"] and pd.notna(g.loc[j, "v"])]
        vals = [x for x in vals if pd.notna(x)]
        return min(vals) if vals else np.nan

    exp = _oracle(pdf, outer)
    got = run_windowed_sql(
        "select ts, min_where(v + sum_where(v, NOT c), c) over w as s "
        f"from {{0}} {WIN}", [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"])
    assert np.allclose(gv.to_numpy(np.float64), exp, equal_nan=True)


def test_avg_minus_max_q_left(spark):
    pdf, df = _mkdf(spark, seed=23)

    def outer(g, js, i):
        vs = [g.loc[j, "v"] for j in js if pd.notna(g.loc[j, "v"])]
        q = max(vs) if vs else np.nan              # max(v) over frame i
        vals = [q - g.loc[j, "v"] for j in js if pd.notna(g.loc[j, "v"])]
        vals = [x for x in vals if pd.notna(x)]
        return float(np.mean(vals)) if vals else np.nan

    exp = _oracle(pdf, outer)
    got = run_windowed_sql(
        f"select ts, avg(max(v) - v) over w as s from {{0}} {WIN}",
        [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"])
    assert np.allclose(gv.to_numpy(np.float64), exp, equal_nan=True)


def test_count_where_equals_current(spark):
    """count_where(ts, v = first_value(v)): count of frame rows whose v
    equals the CURRENT row's v (first_value = newest buffered row =
    current row; test_udaf_function.yaml#47 golden semantics)."""
    pdf, df = _mkdf(spark, seed=31)

    def outer(g, js, i):
        r = g.loc[i, "v"]
        if pd.isna(r):
            return 0
        return sum(1 for j in js
                   if pd.notna(g.loc[j, "v"]) and g.loc[j, "v"] == r)

    exp = _oracle(pdf, outer)
    got = run_windowed_sql(
        "select ts, count_where(ts, v = first_value(v)) over w as s "
        f"from {{0}} {WIN}", [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"])
    assert np.allclose(gv.to_numpy(np.float64), exp, equal_nan=True)


def test_count_where_equals_lagged(spark):
    """The aggregate side may be any window UDAF — lag(v, 1) binds to
    the row 1 back from the CURRENT output row, constant per frame."""
    pdf, df = _mkdf(spark, seed=41)

    def outer(g, js, i):
        r = g.loc[i - 1, "v"] if i >= 1 else None
        if r is None or pd.isna(r):
            return 0
        return sum(1 for j in js
                   if pd.notna(g.loc[j, "v"]) and g.loc[j, "v"] == r)

    exp = _oracle(pdf, outer)
    got = run_windowed_sql(
        "select ts, count_where(ts, v = lag(v, 1)) over w as s "
        f"from {{0}} {WIN}", [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"])
    assert np.allclose(gv.to_numpy(np.float64), exp, equal_nan=True)


def test_unsupported_nested_shapes_reject(spark):
    _, df = _mkdf(spark)
    for sql in (
        # mixed operand on the aggregate side
        "select ts, sum(v + (count(v) + v)) over w as s from {0} " + WIN,
        # nested agg in a non-count _where condition
        "select ts, sum_where(v, v = first_value(v)) over w as s "
        "from {0} " + WIN,
        # nested agg in a cate VALUE slot
        "select ts, count_cate(sum(v), k) over w as s from {0} " + WIN,
    ):
        with pytest.raises(UnsupportedSQL):
            run_windowed_sql(sql, [df])


# ---------------------------------------------------------------------------
# full decomposition matrix: every supported (outer fn, op, Q side)


def _outer_fold(fn, vals):
    vals = [float(x) for x in vals if pd.notna(x)]
    if fn == "count":
        return len(vals)
    if not vals:
        return np.nan
    return {"sum": sum, "avg": lambda v: sum(v) / len(v),
            "min": min, "max": max}[fn](vals)


_MATRIX = []
for _fn in ("sum", "avg", "min", "max", "count"):
    _ops = {"sum": ["+", "-", "*", "/"], "avg": ["+", "-", "*", "/"],
            "min": ["+", "-", "*"], "max": ["+", "-", "*"],
            "count": ["+", "-", "*", "/"]}[_fn]
    for _op in _ops:
        for _qleft in (False, True):
            if _op == "/" and _qleft:
                continue          # Q in the numerator: unsupported
            if _op in ("+", "*") and _qleft:
                continue          # commutative: same rewrite
            _MATRIX.append((_fn, _op, _qleft))


@pytest.mark.parametrize("fn,op,q_left", _MATRIX)
def test_decomposition_matrix(spark, fn, op, q_left):
    """Every decomposition branch vs a brute-force double-loop oracle.

    The inner aggregate is min(v2) over the current row's frame with v2
    spanning NEGATIVE values — exercising the sign-flip CASE of
    min/max * Q — and hitting zero, exercising count's and sum's /0
    NULL contract."""
    rng = np.random.default_rng(97)
    n = 30
    pdf = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": np.arange(n, dtype=np.int64),
        "v": rng.integers(1, 6, n).astype(np.int64),
        "v2": rng.integers(-3, 4, n).astype(np.int64),   # negatives + 0
        "__case_rid": np.arange(n, dtype=np.int64),
    })
    pdf.loc[5, "v"] = None
    df = spark.createDataFrame(
        pdf.astype({"v": "Int64"}),
        "k string, ts bigint, v bigint, v2 bigint, __case_rid bigint")

    arg = f"min(v2) {op} v" if q_left else f"v {op} min(v2)"
    got = run_windowed_sql(
        f"select ts, {fn}({arg}) over w as s from {{0}} {WIN}",
        [df]).toPandas().sort_values("ts")
    gv = pd.to_numeric(got.set_index("ts")["s"]).reindex(pdf["ts"]) \
        .to_numpy(np.float64)

    def outer(g, js, i):
        q = min(g.loc[js, "v2"])                     # never empty/null
        vals = []
        for j in js:
            p = g.loc[j, "v"]
            if pd.isna(p):
                vals.append(np.nan)
                continue
            a, b = (q, p) if q_left else (p, q)
            if op == "/" and b == 0:
                vals.append(np.nan)                  # SQL /0 -> NULL
            else:
                vals.append({"+": a + b, "-": a - b, "*": a * b,
                             "/": a / b if b else np.nan}[op])
        return _outer_fold(fn, vals)

    exp = _oracle(pdf, outer)
    assert np.allclose(gv, exp, equal_nan=True), \
        f"{fn}({arg}):\n got {gv}\n exp {exp}"
