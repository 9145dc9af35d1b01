"""TTL expiration + multi-window concat-join semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tdf(spark):
    rows = []
    for k in ["a", "b"]:
        for i in range(20):
            rows.append((k, i, 1_700_000_000_000 + i * 60_000, float(i)))
    return spark.createDataFrame(
        rows, "k: string, i: int, ts_ms: long, v: double") \
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))


def test_count_live(tdf):
    from openmldb_spark import count_live

    out = count_live(tdf, "k", "ts", 5, tiebreak=("i",)).toPandas()
    assert len(out) == 10
    assert sorted(out[out.k == "a"].i) == [15, 16, 17, 18, 19]


def test_time_live_relative_to_data_max(tdf):
    from openmldb_spark import time_live

    # newest ts = +19min; ttl 5min -> keep >= +14min (i >= 14)
    out = time_live(tdf, "ts", 5 * 60_000).toPandas()
    assert sorted(out[out.k == "a"].i) == list(range(14, 20))


def test_time_live_explicit_now(tdf):
    from openmldb_spark import time_live

    now = 1_700_000_000_000 + 30 * 60_000
    out = time_live(tdf, "ts", 12 * 60_000, now_ms=now).toPandas()
    # keep ts >= now-12min = +18min -> i in {18,19}
    assert sorted(out[out.k == "a"].i) == [18, 19]


def test_time_and_count_live_combines(tdf):
    from openmldb_spark import time_and_count_live

    out_and = time_and_count_live(tdf, "k", "ts", 3 * 60_000, 10,
                                  tiebreak=("i",)).toPandas()
    # and: pass both -> newest 10 AND within 3min (i>=16) -> i in 16..19
    assert sorted(out_and[out_and.k == "a"].i) == [16, 17, 18, 19]

    out_or = time_and_count_live(tdf, "k", "ts", 3 * 60_000, 10,
                                 combine="or", tiebreak=("i",)).toPandas()
    # or: newest 10 (i>=10) OR within 3min -> i in 10..19
    assert sorted(out_or[out_or.k == "a"].i) == list(range(10, 20))


def test_multi_window_native_single_pass(tdf):
    from openmldb_spark import Agg, WindowSpecFE, multi_window_agg

    w1 = WindowSpecFE(["k"], "ts", frame="rows", start=1, end=0,
                      tiebreak=("i",))
    w2 = WindowSpecFE(["k"], "ts", frame="rows", start=3, end=0,
                      tiebreak=("i",))
    out = multi_window_agg(tdf, [
        (w1, [Agg("s2", "sum", "v")]),
        (w2, [Agg("s4", "sum", "v"), Agg("c4", "count", "v")]),
    ]).toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    a = out[out.k == "a"].reset_index(drop=True)
    assert a.s2[0] == 0.0 and a.s2[1] == 1.0 and a.s2[5] == 9.0
    assert a.s4[5] == 2 + 3 + 4 + 5
    assert a.c4[1] == 2


def test_multi_window_mixed_native_kernel(tdf):
    """A kernel-path window (maxsize) zipped with a native one."""
    from openmldb_spark import Agg, WindowSpecFE, multi_window_agg

    w1 = WindowSpecFE(["k"], "ts", frame="rows", start=3, end=0,
                      tiebreak=("i",))
    w2 = WindowSpecFE(["k"], "ts", frame="range", start=10 * 60_000, end=0,
                      maxsize=3, tiebreak=("i",))
    out = multi_window_agg(tdf, [
        (w1, [Agg("c_rows", "count", "v")]),
        (w2, [Agg("c_max3", "count", "v")]),
    ]).toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    a = out[out.k == "a"].reset_index(drop=True)
    assert a.c_rows[10] == 4
    assert a.c_max3[10] == 3          # maxsize caps the 11-row range frame
    assert a.c_max3[1] == 2
    assert len(out) == 40             # concat-join kept one row per input


def test_multi_window_distinct_order_keys(tdf):
    """Regression (ADVICE r1 #1): two native windows with DIFFERENT order
    columns must not resolve to the last spec's key."""
    from openmldb_spark import Agg, WindowSpecFE, multi_window_agg, window_agg

    rev = tdf.withColumn("ts2_ms", F.lit(2_000_000_000_000) - F.col("ts_ms"))
    w1 = WindowSpecFE(["k"], "ts_ms", frame="rows", start=2, end=0,
                      tiebreak=("i",))
    w2 = WindowSpecFE(["k"], "ts2_ms", frame="rows", start=2, end=0,
                      tiebreak=("i",))
    out = multi_window_agg(rev, [
        (w1, [Agg("s_fwd", "sum", "v")]),
        (w2, [Agg("s_rev", "sum", "v")]),
    ]).toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    solo1 = window_agg(rev, w1, [Agg("s_fwd", "sum", "v")]) \
        .toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    solo2 = window_agg(rev, w2, [Agg("s_rev", "sum", "v")]) \
        .toPandas().sort_values(["k", "i"]).reset_index(drop=True)
    assert out.s_fwd.tolist() == solo1.s_fwd.tolist()
    assert out.s_rev.tolist() == solo2.s_rev.tolist()
    a = out[out.k == "a"].reset_index(drop=True)
    assert a.s_fwd[19] == 17.0 + 18.0 + 19.0   # forward order
    assert a.s_rev[19] == 19.0                 # reversed order: newest first


def test_multi_window_kernel_duplicate_keys(spark):
    """Regression (ADVICE r1 #5): duplicate (key, order, tiebreak) tuples
    must not multiply rows through the kernel concat-join."""
    from openmldb_spark import Agg, WindowSpecFE, multi_window_agg

    rows = [("a", 1000, 1.0), ("a", 1000, 2.0), ("a", 1000, 3.0),
            ("a", 2000, 4.0), ("b", 1000, 5.0)]
    df = spark.createDataFrame(rows, "k: string, ts_ms: long, v: double")
    w1 = WindowSpecFE(["k"], "ts_ms", frame="rows", start=1, end=0)
    w2 = WindowSpecFE(["k"], "ts_ms", frame="range", start=5000, end=0,
                      maxsize=2)
    out = multi_window_agg(df, [
        (w1, [Agg("s2", "sum", "v")]),
        (w2, [Agg("cm", "count", "v")]),
    ]).toPandas()
    assert len(out) == 5                      # no row multiplication
    assert set(out.columns) >= {"k", "ts_ms", "v", "s2", "cm"}
    assert (out[out.k == "a"].cm <= 2).all()  # maxsize respected
