"""Regression pins for the round-4 self-review findings.

Each test reproduces a verified failure scenario from the round-4 code
review and pins the fixed behavior.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F


# -------------------------------------------- 1. per-table typed casts

def test_typed_cast_resolves_in_own_table(spark):
    """CAST({0}.c1 AS INT) with {0}.c1 int and {1}.c1 timestamp must
    NOT pick up the other operand's timestamp type (which would inject
    unix_millis over an int column)."""
    from openmldb_spark.sql import run_general_sql

    left = spark.createDataFrame([(1, 7)], "k: int, c1: int")
    right = spark.createDataFrame(
        [(1, 1590738989000)], "k: int, c1_ms: long") \
        .select("k", F.timestamp_millis(F.col("c1_ms")).alias("c1"))
    old = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        out = run_general_sql(
            spark,
            "select cast({0}.c1 as int) as a, cast({1}.c1 as int) as b "
            "from {0} last join {1} on {0}.k = {1}.k;",
            [left, right]).toPandas()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    import numpy as np
    assert out.a[0] == 7                      # plain int stays put
    # timestamp -> int keeps the reference's epoch-MS payload,
    # truncated to the target width
    assert out.b[0] == int(np.int64(1590738989000).astype(np.int32))


# -------------------------------------------- 2. csv header round-trip

def test_csv_roundtrip_keeps_row_matching_header_token(spark, tmp_path):
    """A data row whose FIRST field equals the first column's name must
    survive an outfile -> infile round trip (only full header lines are
    repeated-header artifacts)."""
    from openmldb_spark.operators.table_io import (read_csv_infile,
                                                   write_csv_outfile)

    df = spark.createDataFrame(
        [("c1", 1), ("x", 2)], "c1: string, n: int")
    path = str(tmp_path / "t.csv")
    write_csv_outfile(df, path)
    back = read_csv_infile(spark, path, "c1 string, n int")
    got = sorted((r.c1, r.n) for r in back.collect())
    assert got == [("c1", 1), ("x", 2)]


# -------------------------------------------- 3. cap_per_key total order

def test_cap_per_key_deterministic_under_ties(spark):
    """order_col ties without an id_col must still produce a
    deterministic kept set (hash tiebreak over the full row), not
    whatever row_number saw first."""
    from openmldb_spark.pipeline.sampling import cap_per_key

    rows = [("u", 100, f"p{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "user: string, ts: long, p: string")
    kept1 = sorted(r.p for r in
                   cap_per_key(df.repartition(8), ["user"], 5,
                               order_col="ts").collect())
    kept2 = sorted(r.p for r in
                   cap_per_key(df.repartition(3), ["user"], 5,
                               order_col="ts").collect())
    assert len(kept1) == 5
    assert kept1 == kept2
