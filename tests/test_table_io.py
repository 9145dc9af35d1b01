"""LOAD DATA / SELECT INTO / warehouse layout (reference
LoadDataPlan.scala:30-134, SelectIntoPlan.scala:26-56)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def test_load_data_csv_roundtrip(spark, tmp_path):
    from openmldb_spark.operators.table_io import load_data, select_into

    df = spark.range(20).select(
        F.col("id"), (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("name"))
    p = str(tmp_path / "out_csv")
    select_into(df, p, fmt="csv", mode="overwrite", single_file=True)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(parts) == 1                      # single_file

    back = load_data(spark, p, fmt="csv")
    assert back.count() == 20
    assert set(back.columns) == {"id", "v", "name"}
    assert back.agg(F.sum("v")).collect()[0][0] == \
        pytest.approx(sum(i * 1.5 for i in range(20)))


def test_select_into_modes(spark, tmp_path):
    from openmldb_spark.operators.table_io import select_into

    df = spark.range(5)
    p = str(tmp_path / "m")
    select_into(df, p, mode="error_if_exists")
    with pytest.raises(Exception):
        select_into(df, p, mode="error_if_exists")
    select_into(df, p, mode="append")
    assert spark.read.parquet(p).count() == 10
    select_into(df, p, mode="overwrite")
    assert spark.read.parquet(p).count() == 5
    with pytest.raises(ValueError):
        select_into(df, p, mode="bogus")


def test_warehouse_partitioned_layout(spark, tmp_path):
    from openmldb_spark.operators.table_io import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    wh.write(ev, "feat.events", mode="overwrite",
             buckets=4, sort_by=["user_id", "ts"])
    assert wh.exists("feat.events")
    back = wh.read("feat.events")
    assert back.count() == ev.count()
    # sorted-within-bucket layout: each file's user_id runs are monotone
    pdf = back.withColumn("f", F.input_file_name()) \
              .select("f", "user_id", "ts").toPandas()
    for _, g in pdf.groupby("f"):
        u = g.user_id.to_numpy()
        assert (u[:-1] <= u[1:]).all()


def test_warehouse_iceberg_mode(spark, tmp_path):
    """Iceberg catalog path: exercised only when a catalog is configured
    (no Iceberg runtime in this sandbox -> falls back / skips); the
    fallback constructor must keep the parquet mode fully working."""
    import pytest
    from openmldb_spark.operators.table_io import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), catalog="nonexistent_cat")
    # unavailable catalog silently degrades to the parquet layout
    assert wh.catalog is None
    from pyspark.sql import functions as F
    df = spark.range(5).withColumnRenamed("id", "k") \
        .withColumn("v", F.col("k") * 2)
    wh.write(df, "db1.t", mode="overwrite", partition_by=["k"])
    assert wh.exists("db1.t")
    assert wh.read("db1.t").count() == 5
    try:
        spark.conf.get("spark.sql.catalog.ice")
    except Exception:
        pytest.skip("no Iceberg catalog configured in this environment")


def test_warehouse_create_table_from_ddl(spark, tmp_path):
    from openmldb_spark.ddl import DDLError
    from openmldb_spark.operators.table_io import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    tdef = wh.create_table(
        "create table conv (conv_id string NOT NULL, turn_idx int, "
        "role string, ts timestamp, "
        "index(key=(conv_id), ts=ts, ttl=(2), ttl_type=latest))")
    assert tdef.name == "conv" and tdef.indexes[0].lat_ttl == 2
    df = wh.read("default.conv")
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "ts"]
    assert df.count() == 0
    # duplicate create is rejected against the warehouse layout
    with pytest.raises(DDLError, match="already exists"):
        wh.create_table("create table conv (c1 string)")

    # read_live applies the main index's TTL (latest-2 per conv)
    rows = [("a", i, "user", None) for i in range(4)]
    d = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    ).withColumn("ts", F.timestamp_millis(1_000_000 + F.col("turn_idx")))
    wh.write(d, "default.conv", mode="append")
    live = wh.read_live("default.conv", tdef)
    assert sorted(r.turn_idx for r in live.collect()) == [2, 3]
