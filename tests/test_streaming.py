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
