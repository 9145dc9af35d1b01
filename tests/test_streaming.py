"""Structured Streaming smoke tests: file-source micro-batches drive the
streaming feature views and ingestion to completion synchronously
(memory sink + processAllAvailable)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture()
def stream_src(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(u, f"2024-01-01 00:{m:02d}:00", float(m))
            for u in (1, 2) for m in (0, 1, 2, 40, 41)]
    spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts")) \
        .write.mode("overwrite").parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src)


def _drain(df, name):
    q = (df.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()


def test_streaming_window_counts(spark, stream_src):
    from openmldb_spark.streaming import streaming_window_counts

    out = streaming_window_counts(stream_src, ["user_id"],
                                  window="5 minutes", value_col="value")
    _drain(out, "swc")
    pdf = spark.sql("SELECT * FROM swc").toPandas()
    # minutes 0,1,2 fall in one 5-min window; 40,41 in another → 2/user
    assert len(pdf) == 4
    first = pdf[(pdf.user_id == 1)].sort_values("win_start").iloc[0]
    assert first.n == 3 and first.sum_v == 0.0 + 1.0 + 2.0


def test_streaming_sessions(spark, stream_src):
    from openmldb_spark.streaming import streaming_sessions

    out = streaming_sessions(stream_src, ["user_id"], gap="10 minutes")
    _drain(out, "ss")
    pdf = spark.sql("SELECT * FROM ss").toPandas()
    # gap 10min splits (0,1,2) and (40,41) → 2 sessions/user
    assert len(pdf) == 4
    assert sorted(pdf[pdf.user_id == 1].n_events) == [2, 3]


def test_stream_ingest_appends_to_warehouse(spark, stream_src, tmp_path):
    from openmldb_spark.operators.table_io import Warehouse
    from openmldb_spark.streaming import stream_ingest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = stream_ingest(stream_src, wh, "raw.events",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = wh.read("raw.events")
    assert got.count() == 10
    # batch operators run over the ingested table
    from openmldb_spark import sessionize
    sess = sessionize(got, "user_id", "ts", gap_ms=10 * 60 * 1000)
    assert sess.agg(F.max("session_id")).collect()[0][0] == 1


def test_streaming_stateful_rolling_equals_batch_window(spark, tmp_path):
    """Online == offline consistency (the reference's core contract):
    the applyInPandasWithState rolling-feature operator must emit, per
    event, exactly the batch window_agg stream-peer RANGE frame row.
    Two micro-batches prove state survives batch boundaries."""
    import pandas as pd
    from openmldb_spark.operators.window_agg import (
        Agg, WindowSpecFE, window_agg)
    from openmldb_spark.streaming.stateful import (
        streaming_rolling_features)

    rows = [("k%d" % (i % 3), 1_700_000_000_000 + i * 7_000, i, float(i % 11))
            for i in range(60)]
    schema = "k string, ts long, event_id long, v double"
    src = str(tmp_path / "src")
    full = spark.createDataFrame(rows, schema)
    # batch 1 = older half, batch 2 = newer half (in-order arrival)
    full.filter(F.col("event_id") < 30).coalesce(1) \
        .write.parquet(src + "/b1")
    sschema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    stream = spark.readStream.schema(sschema) \
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    out = streaming_rolling_features(
        stream, ["k"], "ts", "v", window_ms=30_000, id_col="event_id")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("roll1").start())
    q.processAllAvailable()
    # second batch arrives after the first is fully processed
    full.filter(F.col("event_id") >= 30).coalesce(1) \
        .write.parquet(src + "/b2")
    q.processAllAvailable()
    q.stop()
    got = spark.table("roll1").toPandas() \
        .sort_values("event_id").reset_index(drop=True)

    spec = WindowSpecFE(["k"], "ts", frame="range", start=30_000, end=0,
                        tiebreak=["event_id"])
    exp = window_agg(full, spec, [
        Agg("cnt", "count", "v"), Agg("sum", "sum", "v"),
        Agg("avg", "avg", "v"), Agg("min", "min", "v"),
        Agg("max", "max", "v")]).toPandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == 60
    assert got.cnt.astype(int).tolist() == exp.cnt.astype(int).tolist()
    for c in ("sum", "avg", "min", "max"):
        assert (got[c].astype(float) - exp[c].astype(float)) \
            .abs().max() < 1e-9, c


def test_streaming_stateful_maxsize(spark, tmp_path):
    """MAXSIZE caps the state buffer (latest-k TTL shape): with
    maxsize=2 the rolling count never exceeds 2."""
    from openmldb_spark.streaming.stateful import (
        streaming_rolling_features)

    src = str(tmp_path / "src2")
    spark.createDataFrame(
        [("a", 1_000_000 + i * 1000, i, float(i)) for i in range(8)],
        "k string, ts long, event_id long, v double") \
        .coalesce(1).write.parquet(src)
    sschema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    stream = spark.readStream.schema(sschema).parquet(src)
    out = streaming_rolling_features(
        stream, ["k"], "ts", "v", window_ms=3_600_000,
        id_col="event_id", maxsize=2)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("roll2").start())
    q.processAllAvailable(); q.stop()
    got = spark.table("roll2").toPandas().sort_values("event_id")
    assert got.cnt.max() == 2
    # last event: buffer = values 6,7
    assert got.iloc[-1]["sum"] == 13.0


def test_streaming_stateful_bigint_keys(spark, tmp_path):
    """Key field types at the applyInPandasWithState boundary come from
    the input schema (ADVICE r3 low #1): a bigint partition key must
    round-trip as bigint, not be declared string."""
    from openmldb_spark.streaming.stateful import (
        streaming_rolling_features)

    src = str(tmp_path / "src3")
    spark.createDataFrame(
        [(uid, 1_000_000 + i * 1000, uid * 100 + i, float(i))
         for uid in (7, 8) for i in range(4)],
        "uid long, ts long, event_id long, v double") \
        .coalesce(1).write.parquet(src)
    sschema = T.StructType([
        T.StructField("uid", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    stream = spark.readStream.schema(sschema).parquet(src)
    out = streaming_rolling_features(
        stream, ["uid"], "ts", "v", window_ms=2_500, id_col="event_id")
    assert dict(out.dtypes)["uid"] == "bigint"
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("roll3").start())
    q.processAllAvailable(); q.stop()
    got = spark.table("roll3").toPandas().sort_values("event_id")
    assert sorted(got.uid.unique().tolist()) == [7, 8]
    # window [t-2500, t] over 1000ms-spaced events: cnt = min(i+1, 3)
    assert got[got.uid == 7].cnt.tolist() == [1, 2, 3, 3]


def _brute_rolling(ts, v, nb, window_ms, maxsize):
    """Reference loop semantics: front time-eviction, append, cap."""
    import numpy as np
    buf = list(zip(ts[:nb], v[:nb]))
    out = []
    for t, val in zip(ts[nb:], v[nb:]):
        buf = [(bt, bv) for bt, bv in buf if bt >= t - window_ms]
        buf.append((t, val))
        if maxsize is not None and len(buf) > maxsize:
            buf = buf[1:]
        vals = [bv for _, bv in buf if bv == bv]
        out.append((len(vals), sum(vals) if vals else np.nan,
                    min(vals) if vals else np.nan,
                    max(vals) if vals else np.nan))
    return out


def test_rolling_kernel_matches_brute_force():
    import numpy as np
    from openmldb_spark.streaming.stateful import rolling_over_ascending

    rng = np.random.RandomState(7)
    for maxsize in (None, 1, 3):
        for trial in range(5):
            n = 80
            # invariant from the operator: the carried buffer is the
            # last emitted frame, so nb <= maxsize always holds
            nb = rng.randint(0, 10 if maxsize is None
                             else min(10, maxsize + 1))
            ts = np.cumsum(rng.randint(0, 40, n)).astype(np.int64)
            v = rng.randn(n)
            v[rng.rand(n) < 0.1] = np.nan
            cnt, sm, mn, mx, new_start = rolling_over_ascending(
                ts, v, nb, 100, maxsize)
            exp = _brute_rolling(ts, v, nb, 100, maxsize)
            for i, (ec, es, emn, emx) in enumerate(exp):
                assert cnt[i] == ec, (maxsize, trial, i)
                if ec:
                    assert abs(sm[i] - es) < 1e-9
                    assert mn[i] == emn and mx[i] == emx
                else:
                    assert np.isnan(mn[i]) and np.isnan(mx[i])
            assert new_start >= 0


def test_rolling_kernel_per_event_cost_is_buffer_independent():
    """VERDICT r3 next #5 done-criterion: per-event cost must not grow
    with buffer length. Wide window (every frame spans all history) vs
    narrow window over the same 200k events — a per-event frame
    recompute would be ~1000x slower on the wide case; the vectorized
    kernel (searchsorted + cumsums + monotonic-deque rolling) is O(n)
    either way. Bound is a loose 6x for host noise."""
    import time
    import numpy as np
    from openmldb_spark.streaming.stateful import rolling_over_ascending

    n = 200_000
    ts = np.arange(n, dtype=np.int64)
    v = np.random.RandomState(1).randn(n)

    def best_of(window_ms, k=3):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            rolling_over_ascending(ts, v, 0, window_ms, None)
            best = min(best, time.perf_counter() - t0)
        return best

    narrow = best_of(50)          # ~50-row frames
    wide = best_of(10 * n)        # every frame = entire history
    assert wide < 6 * narrow, (narrow, wide)


# --------------------------- out-of-order fallback kernel (round 5)


def _brute_buffered(b_ts, b_v, e_ts, e_v, window_ms, maxsize):
    """The exact pre-round-5 per-row slow-path semantics: front-prefix
    time eviction STOPPING at the first non-expired entry (insertion
    order — the buffer is not sorted), append, one maxsize cap drop.
    Kept here as the differential reference for the vectorized
    rolling_over_buffered."""
    import numpy as np

    ts_buf = [int(t) for t in b_ts]
    v_buf = [float(x) for x in b_v]
    out = []
    for t, val in zip(e_ts, e_v):
        lo = t - window_ms
        i = 0
        while i < len(ts_buf) and ts_buf[i] < lo:
            i += 1
        if i:
            del ts_buf[:i], v_buf[:i]
        ts_buf.append(int(t))
        v_buf.append(float(val))
        if maxsize is not None and len(ts_buf) > maxsize:
            del ts_buf[0], v_buf[0]
        vals = [x for x in v_buf if x == x]
        n = len(vals)
        out.append((n, float(sum(vals)) if n else np.nan,
                    min(vals) if n else np.nan,
                    max(vals) if n else np.nan))
    return out, ts_buf, v_buf


def test_buffered_kernel_matches_sequential_semantics():
    """rolling_over_buffered (vectorized out-of-order fallback) must
    equal the sequential buffered-rows loop on arbitrary non-ascending
    carried buffers — including the maxsize corner where a cap drop
    exposes an expired entry hiding behind the dropped survivor."""
    import numpy as np
    from openmldb_spark.streaming.stateful import rolling_over_buffered

    rng = np.random.RandomState(11)
    # adversarial cap-interaction case first: big ts at the buffer
    # front shields an expired small ts; the cap drop removes the
    # shield and the next event must evict the straggler
    cases = [(np.array([100, 10], dtype=np.int64),
              np.array([1.0, 2.0]),
              np.array([110, 115], dtype=np.int64),
              np.array([3.0, 4.0]), 50, 2)]
    for maxsize in (None, 1, 2, 4, 8):
        for _ in range(8):
            nb = rng.randint(0, 8 if maxsize is None
                             else min(8, maxsize + 1))
            n = rng.randint(1, 60)
            b_ts = rng.randint(0, 300, nb).astype(np.int64)  # unsorted
            b_v = rng.randn(nb)
            b_v[rng.rand(nb) < 0.15] = np.nan
            e_ts = np.sort(rng.randint(100, 800, n)).astype(np.int64)
            e_v = rng.randn(n)
            e_v[rng.rand(n) < 0.15] = np.nan
            cases.append((b_ts, b_v, e_ts, e_v,
                          int(rng.choice([30, 100, 400])), maxsize))
    for b_ts, b_v, e_ts, e_v, window_ms, maxsize in cases:
        cnt, sm, mn, mx, new_start = rolling_over_buffered(
            b_ts, b_v, e_ts, e_v, window_ms, maxsize)
        exp, exp_ts, exp_v = _brute_buffered(
            b_ts, b_v, e_ts, e_v, window_ms, maxsize)
        s_ts = np.concatenate([b_ts, e_ts])
        for i, (ec, es, emn, emx) in enumerate(exp):
            assert cnt[i] == ec, (window_ms, maxsize, i)
            if ec:
                assert abs(sm[i] - es) < 1e-9, (window_ms, maxsize, i)
                assert mn[i] == emn and mx[i] == emx
            else:
                assert np.isnan(mn[i]) and np.isnan(mx[i])
        assert s_ts[new_start:].tolist() == exp_ts, (window_ms, maxsize)


def test_buffered_kernel_per_event_cost_is_buffer_independent():
    """Per-event cost of the out-of-order kernel must be flat in buffer
    length (VERDICT r4 next #4 done-criterion): wide windows keeping
    every row live vs narrow windows over the same 200k events."""
    import time
    import numpy as np
    from openmldb_spark.streaming.stateful import rolling_over_buffered

    n = 200_000
    rng = np.random.RandomState(3)
    b_ts = np.array([500, 100], dtype=np.int64)       # non-ascending
    b_v = rng.randn(2)
    e_ts = np.sort(rng.randint(600, 600 + 40 * n, n)).astype(np.int64)
    e_v = rng.randn(n)

    def best_of(window_ms, k=3):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            rolling_over_buffered(b_ts, b_v, e_ts, e_v, window_ms, None)
            best = min(best, time.perf_counter() - t0)
        return best

    narrow = best_of(50)
    wide = best_of(100 * 40 * n)   # every frame = entire history
    assert wide < 6 * narrow, (narrow, wide)
