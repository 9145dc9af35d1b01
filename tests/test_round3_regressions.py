"""Round-3 regression tests for the ADVICE r2 / VERDICT r2 fixes:

1. multi_window_agg row-id pinned across fan-out branches (ADVICE #1)
2. salting under INSTANCE_NOT_IN_WINDOW counts union rows (ADVICE #2)
3. checkpoint._code_fp stable across processes for nested lambdas (#3)
4. kernel min/max on STRING columns is lexicographic by declared type (#4)
5. sql.py coercion wrap passes skip quoted literals (ADVICE #5)
6. ttl.time_live lazy by default — no driver job at plan time (VERDICT #7)
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- 1. rid pin

def test_multi_window_rid_stable_two_actions(spark):
    """Forced re-evaluation: two separate actions on the concat-joined
    result with no user-level cache. With the r2 monotonically_increasing_id
    scheme a recomputed shuffle ancestor could renumber rows between the
    kernel branch and the output branch; the localCheckpoint pin makes the
    zip deterministic. Values must match the solo window_agg runs."""
    from openmldb_spark import Agg, WindowSpecFE, multi_window_agg, window_agg

    rows = [("k%d" % (i % 7), 1_700_000_000_000 + i * 1000, float(i))
            for i in range(500)]
    df = (spark.createDataFrame(rows, "k: string, ts_ms: long, v: double")
          .repartition(8))                      # shuffle ancestor
    w_nat = WindowSpecFE(["k"], "ts_ms", frame="rows", start=3, end=0)
    w_ker = WindowSpecFE(["k"], "ts_ms", frame="range", start=10_000, end=0,
                         maxsize=4)
    out = multi_window_agg(df, [
        (w_nat, [Agg("s4", "sum", "v")]),
        (w_ker, [Agg("cm", "count", "v")]),
    ])
    assert out.count() == 500                   # action 1
    got = out.toPandas().sort_values(["k", "ts_ms"]).reset_index(drop=True)
    solo_n = window_agg(df, w_nat, [Agg("s4", "sum", "v")]) \
        .toPandas().sort_values(["k", "ts_ms"]).reset_index(drop=True)
    solo_k = window_agg(df, w_ker, [Agg("cm", "count", "v")]) \
        .toPandas().sort_values(["k", "ts_ms"]).reset_index(drop=True)
    assert got.s4.tolist() == solo_n.s4.tolist()
    assert got.cm.tolist() == solo_k.cm.tolist()
    assert got.cm.notna().all() and got.s4.notna().all()


# ------------------------------------------- 2. salt + instance_not_in_window

def test_salted_instance_not_in_window_matches_unsalted(spark):
    """Hot key whose newest physical rows are mostly PRIMARY rows: the
    physical-row row_reach rank under-replicates union rows (ADVICE #2).
    Salted result must equal unsalted."""
    from openmldb_spark import Agg, SkewConfig, WindowSpecFE, window_agg

    rows = []
    # one hot key: 400 primary rows interleaved with sparse union rows
    for i in range(400):
        rows.append(("hot", 1_700_000_000_000 + i * 1000, float(i), 1))
    for i in range(40):
        rows.append(("hot", 1_700_000_000_000 + i * 10_000 + 500,
                     float(1000 + i), 0))
    for i in range(20):
        rows.append(("cold", 1_700_000_000_000 + i * 1000, float(i), 1))
        rows.append(("cold", 1_700_000_000_000 + i * 1000 + 1,
                     float(100 + i), 0))
    df = spark.createDataFrame(
        rows, "k: string, ts_ms: long, v: double, is_primary: int")
    primary = df.filter("is_primary = 1").drop("is_primary")
    union = df.filter("is_primary = 0").drop("is_primary")

    spec = WindowSpecFE(["k"], "ts_ms", frame="rows", start=5, end=0,
                        union_dfs=[union], instance_not_in_window=True)
    aggs = [Agg("s", "sum", "v"), Agg("c", "count", "v")]
    plain = window_agg(primary, spec, aggs) \
        .toPandas().sort_values(["k", "ts_ms"]).reset_index(drop=True)
    salted = window_agg(primary, spec, aggs,
                        skew=SkewConfig(parts=4, min_rows=100)) \
        .toPandas().sort_values(["k", "ts_ms"]).reset_index(drop=True)
    assert plain.s.tolist() == salted.s.tolist()
    assert plain.c.tolist() == salted.c.tolist()


# ---------------------------------------------------------------- 3. code_fp

def _fp_of(src: str):
    from openmldb_spark.jobs.checkpoint import _code_fp
    ns: dict = {}
    exec(src, ns)
    return _code_fp(ns["stage"])


def test_code_fp_stable_for_nested_lambdas():
    """Identical source compiled twice (simulating two processes ->
    distinct code objects at different addresses) must fingerprint
    identically; editing the nested lambda body must change it."""
    src_a = ("def stage(df):\n"
             "    f = lambda x: x * 2\n"
             "    return [f(i) for i in df]\n")
    src_b = ("def stage(df):\n"
             "    f = lambda x: x * 3\n"
             "    return [f(i) for i in df]\n")
    assert _fp_of(src_a) == _fp_of(src_a)
    assert _fp_of(src_a) != _fp_of(src_b)


def test_code_fp_closure_function_value():
    """A function-valued closure cell is hashed structurally, not by
    repr (repr embeds an address -> unstable)."""
    from openmldb_spark.jobs.checkpoint import _code_fp

    def make(mult):
        inner = lambda x: x * mult          # noqa: E731

        def stage(df):
            return inner(df)
        return stage

    # same construction twice -> same fp even though the inner function
    # objects differ by identity/address
    assert _code_fp(make(2)) == _code_fp(make(2))
    assert _code_fp(make(2)) != _code_fp(make(3))


# ------------------------------------------------------ 4. string min/max

def test_kernel_min_max_string_lexicographic(spark):
    """STRING column with all-numeric-parsable values: reference compares
    lexically (min('9','10')='10') and keeps the string type. Kernel path
    forced via maxsize (range frame — MAXSIZE on ROWS is rejected, as in
    the reference)."""
    from openmldb_spark import Agg, WindowSpecFE, window_agg

    rows = [("a", 1000, "9"), ("a", 2000, "10"), ("a", 3000, "200"),
            ("a", 4000, "30")]
    df = spark.createDataFrame(rows, "k: string, ts_ms: long, s: string")
    spec = WindowSpecFE(["k"], "ts_ms", frame="range", start=10_000, end=0,
                        maxsize=10)
    out = window_agg(df, spec, [Agg("mn", "min", "s"),
                                Agg("mx", "max", "s")]) \
        .toPandas().sort_values("ts_ms").reset_index(drop=True)
    assert out.mn.tolist() == ["9", "10", "10", "10"]
    assert out.mx.tolist() == ["9", "9", "9", "9"]   # lexically '9' > '30'
    assert out.mn.dtype == object                     # stays string


# ----------------------------------------------------------- 5. quoted spans

def test_general_sql_literal_not_rewritten(spark):
    """A string literal containing column names adjacent to an operator
    must pass through the coercion wrap passes untouched."""
    from openmldb_spark.sql import run_general_sql

    df = spark.createDataFrame(
        [(1, 2, "c1<c2"), (3, 1, "other")],
        "c1: smallint, c2: int, note: string")
    out = run_general_sql(
        spark, "select c1, note from {0} where note = 'c1<c2';", [df]) \
        .toPandas()
    assert len(out) == 1
    assert out.note[0] == "c1<c2"
    # and the wrap still applies OUTSIDE the literal (smallint vs int)
    out2 = run_general_sql(
        spark, "select note from {0} where c1 < c2 and note != 'c1<c2';",
        [df]).toPandas()
    assert len(out2) == 0


# ------------------------------------------------------------- 6. ttl lazy

def test_time_live_default_no_driver_job(spark, monkeypatch):
    """Default (lazy) path must not run any driver job while BUILDING the
    plan — collect/toPandas/count monkeypatched to raise."""
    from openmldb_spark.operators.ttl import time_live

    df = spark.createDataFrame(
        [("a", 1_700_000_000_000 + i * 60_000) for i in range(10)],
        "k: string, ts_ms: long")

    def boom(self, *a, **k):            # pragma: no cover - must not run
        raise AssertionError("driver job triggered at plan time")
    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "count", boom)
    plan = time_live(df, "ts_ms", 5 * 60_000)       # must not raise
    monkeypatch.undo()
    out = plan.toPandas()
    exp = time_live(df, "ts_ms", 5 * 60_000, lazy=False).toPandas()
    assert sorted(out.ts_ms) == sorted(exp.ts_ms)
    assert len(out) == 6


def test_time_and_count_live_default_no_driver_job(spark, monkeypatch):
    from openmldb_spark.operators.ttl import time_and_count_live

    df = spark.createDataFrame(
        [("a", 1_700_000_000_000 + i * 60_000, i) for i in range(20)],
        "k: string, ts_ms: long, i: int")

    def boom(self, *a, **k):            # pragma: no cover
        raise AssertionError("driver job triggered at plan time")
    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "count", boom)
    plan = time_and_count_live(df, "k", "ts_ms", 3 * 60_000, 10,
                               tiebreak=("i",))
    monkeypatch.undo()
    out = plan.toPandas()
    exp = time_and_count_live(df, "k", "ts_ms", 3 * 60_000, 10,
                              tiebreak=("i",),
                              now_ms=1_700_000_000_000 + 19 * 60_000) \
        .toPandas()
    assert sorted(out.i) == sorted(exp.i)


# ------------------------------------------------- 7. NULL-safe LAST JOIN

def test_last_join_null_keys_match(spark):
    """Reference LAST JOIN matches NULL keys to NULL keys (the storage
    index encodes NULL as a regular key byte): goldens
    fz_ddl/test_luoji.yaml (NULL reqId row joins the NULL action row)
    and test_lastjoin_complex.yaml#10. Both strategies must agree."""
    from openmldb_spark import last_join

    l = spark.createDataFrame(
        [(None, 1000, 1), ("a", 1000, 2)], "k: string, ts: long, i: int")
    r = spark.createDataFrame(
        [(None, 900, 77), ("a", 900, 88)], "k: string, ts: long, v: int")
    jr = last_join(l, r, on="k", order_by="ts", left_ts="ts",
                   right_ts="ts", strategy="join_rank") \
        .toPandas().set_index("i")
    sm = last_join(l, r, on="k", order_by="ts", left_ts="ts",
                   right_ts="ts", strategy="sort_merge") \
        .toPandas().set_index("i")
    assert jr.loc[1, "v"] == 77 and jr.loc[2, "v"] == 88
    assert sm.loc[1, "v"] == 77 and sm.loc[2, "v"] == 88


# --------------------------- 8. INSTANCE_NOT_IN_WINDOW empty-frame SUM NULL

def test_inw_empty_union_sum_is_null(spark):
    """Under INSTANCE_NOT_IN_WINDOW an empty union frame sums to NULL
    (fz_ddl/test_myhug.yaml#1 golden) — the plain between-preceding
    union quirk (empty frame sums to 0, test_window.yaml#31) must NOT
    fire when the instance row is excluded from the buffer."""
    from openmldb_spark.sql import run_windowed_sql

    prim = spark.createDataFrame(
        [("A", 1_000_000, 0.0, 0), ("B", 1_000_000, 0.0, 1)],
        "k string, ts bigint, v double, __case_rid bigint")
    uni = spark.createDataFrame(
        [("B", 900_000, 100.0, 0)],
        "k string, ts bigint, v double, __case_rid bigint")
    sql = ("select k, sum(v) over w as s, max(v) over w as mx from {0} "
           "window w as (UNION {1} partition by k order by ts "
           "rows_range between 172801000 preceding and 1000 preceding "
           "INSTANCE_NOT_IN_WINDOW)")
    got = run_windowed_sql(sql, [prim, uni]).toPandas() \
        .set_index("k")
    assert pd.isna(got.loc["A", "s"]) and pd.isna(got.loc["A", "mx"])
    assert got.loc["B", "s"] == 100.0 and got.loc["B", "mx"] == 100.0


# ----------------------------- 9. θ-residual with backquotes + ts arithmetic

def test_lastjoin_residual_backquoted_ts_arith(spark):
    """spark/test_jd.yaml residual shape: strict bounds over a
    backquoted dotted ref with timestamp-minus-int millisecond
    arithmetic (`t.dt` < date - 0 AND `t.dt` > date - 1209600000)."""
    import datetime
    from openmldb_spark.sql import run_lastjoin_sql

    d = datetime.datetime
    left = spark.createDataFrame(
        [(1, "s1", d(2020, 1, 20), 0)],
        "id int, sku string, date timestamp, __case_rid bigint")
    right = spark.createDataFrame(
        [("s1", d(2020, 1, 19), 10, 0),    # inside (date-14d, date)
         ("s1", d(2020, 1, 1), 20, 1),     # too old
         ("s1", d(2020, 1, 20), 30, 2)],   # == date: excluded (strict <)
        "sku string, dt timestamp, v int, __case_rid bigint")
    sql = ("select {0}.id as id, {1}.v as v from {0} last join {1} "
           "order by {1}.`dt` on {0}.sku = {1}.sku and "
           "{1}.`dt` < {0}.date - 0 and "
           "{1}.`dt` > {0}.date - 1209600000")
    got = run_lastjoin_sql(sql, [left, right]).toPandas()
    assert got.v.tolist() == [10]
