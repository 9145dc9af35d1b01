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


# ------------------------------------------ ANSI-session public surface

def test_csv_load_is_ansi_safe(spark, tmp_path):
    """read_csv_infile under Spark 4's default ANSI-on session must
    yield NULL for unparseable cells (non-strict), not crash with
    CAST_INVALID_INPUT."""
    from openmldb_spark.operators.table_io import read_csv_infile

    path = str(tmp_path / "t.csv")
    with open(path, "w") as f:
        f.write("a,n,ts\nx,notanint,2020-05-22 10:43:40\ny,7,1590738989000\n")
    out = read_csv_infile(spark, path, "a string, n int, ts timestamp",
                          strict=False) \
        .toPandas().sort_values("a").reset_index(drop=True)
    assert pd.isna(out.n[0]) and out.n[1] == 7
    assert out.ts.notna().all()     # both datetime string and epoch-ms


def test_ttl_combined_zero_slot_means_unlimited(spark):
    """A zero abs or lat slot in absorlat/absandlat is UNLIMITED for
    that dimension (storage/table.h), not an active 0-length filter."""
    from openmldb_spark.ddl import parse_create_table, ttl_filter

    rows = [("a", 1000, 1), ("a", 2000, 2), ("a", 3000, 3)]
    df = spark.createDataFrame(rows, "k string, ts_ms long, id int")

    def ids(ttl, now=1_000_000):
        td = parse_create_table(
            f"create table t (k string, ts_ms bigint, id int, "
            f"index(key=k, ts=ts_ms, ttl={ttl}))")
        return sorted(r.id for r in
                      ttl_filter(df, td.indexes[0], now_ms=now).collect())

    # abs=0: only the count filter applies
    assert ids("(0s,2), ttl_type=absorlat") == [2, 3]
    # lat=0: only the time filter applies (all rows stale at now=1e6)
    assert ids("(1s,0), ttl_type=absorlat") == []
    # absandlat with a zero slot: nothing can satisfy the conjunction
    assert ids("(0s,2), ttl_type=absandlat") == [1, 2, 3]
    assert ids("(1s,0), ttl_type=absandlat") == [1, 2, 3]


def test_create_table_if_not_exists_noop(spark):
    from openmldb_spark.ddl import DDLError, parse_create_table

    td = parse_create_table("create table if not exists t (a int)",
                            existing=["t"])
    assert td.if_not_exists and td.name == "t"
    with pytest.raises(DDLError, match="already exists"):
        parse_create_table("create table t (a int)", existing=["t"])


def test_cate_udaf_timestamp_key_and_empty_group(spark):
    """Timestamp cate keys must render (Arrow hands over pd.Timestamp,
    not epoch-ms ints); a fully-excluded group renders '' per
    containers.h OutputString, not NULL."""
    from openmldb_spark.functions.sql_udafs import register_table_udafs

    register_table_udafs(spark)
    df = spark.createDataFrame(
        [("g1", 1590738989000, 2), ("g2", 1590738989000, 5)],
        "g string, ts_ms long, v int") \
        .select("g", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "v")
    df.createOrReplaceTempView("cate_t")
    out = spark.sql(
        "SELECT g, __omls_cate_agg(v, ts, 'sum', 'int', 'timestamp') AS c,"
        "       __omls_cate_agg(v, CAST(NULL AS timestamp), 'sum',"
        "                       'int', 'timestamp') AS empty "
        "FROM cate_t GROUP BY g ORDER BY g").collect()
    assert out[0].c == "2020-05-29 15:56:29:2"    # UTC+8 display
    assert out[0].empty == "" and out[1].empty == ""


def test_scalar_null_semantics(spark):
    from openmldb_spark.functions.scalar import (fz_split, like_match,
                                                 strcmp)

    df = spark.createDataFrame([("abc", None)], "a string, b string")
    r = df.select(
        strcmp(F.col("a"), F.col("b")).alias("s"),
        F.size(fz_split(F.col("b"), ",")).alias("n"),
        like_match(F.col("a"), "ab!%", escape="!").alias("m"),
    ).collect()[0]
    assert r.s is None            # NULL propagates, not "equal"
    assert r.n == 0               # split(NULL) -> empty list
    assert r.m is False           # '!' escapes '%': literal 'ab%' only


# --------------------------------------------- NULL/zero-input hygiene

def test_zero_norm_vectors_never_hijack_topk(spark):
    """A zero-norm embedding scores cosine 0 (not NaN, which Spark's
    desc sort ranks above every real double)."""
    from openmldb_spark.pipeline.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id int, embedding array<double>")
    q = spark.createDataFrame([(1, [1.0, 0.0])],
                              "vec_id int, embedding array<double>")
    out = brute_force_topk(corpus, q, k=2).toPandas()
    assert list(out.neighbor_id) == [2, 3]
    assert out.cosine.iloc[1] == 0.0          # zero vector scores 0


def test_lsh_num_planes_validated(spark):
    from openmldb_spark.pipeline.similarity import hyperplane_bucket_udf
    with pytest.raises(ValueError, match=r"\[1, 31\]"):
        hyperplane_bucket_udf(32, seed=1)


def test_time_live_lazy_eager_agree_on_all_null(spark):
    from openmldb_spark.operators.ttl import time_live

    df = spark.createDataFrame([("a", None), ("b", None)],
                               "k string, ts long")
    lazy = time_live(df, "ts", 1000, lazy=True).count()
    eager = time_live(df, "ts", 1000, lazy=False).count()
    assert lazy == eager == 2


def test_ffill_drops_null_order_rows(spark):
    """A NULL-ts row must not seed the forward fill (engine-wide NULL
    order-key rule)."""
    from openmldb_spark.operators.backfill import ffill

    df = spark.createDataFrame(
        [("a", None, 5.0), ("a", 1, None), ("a", 2, 7.0)],
        "k string, ts long, x double")
    out = ffill(df, "x", "k", "ts").toPandas().sort_values("ts")
    assert list(out.ts) == [1, 2]
    assert out.x.iloc[0] is None or pd.isna(out.x.iloc[0])


def test_streaming_buffer_survives_out_of_order(spark, tmp_path):
    """After a late batch leaves a non-ascending state buffer, the next
    in-order batch must NOT take the ascending fast path over unsorted
    timestamps (sequential buffered-rows semantics: the late row stays
    buffered behind the newer one and still counts)."""
    from pyspark.sql import types as T
    from openmldb_spark.streaming.stateful import (
        streaming_rolling_features)

    src = str(tmp_path / "src")
    sschema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    # batch 1 in order; batch 2 is a LATE event -> slow path leaves the
    # non-ascending buffer [100k, 50k]
    spark.createDataFrame([("a", 100_000, 1, 1.0)], sschema) \
        .coalesce(1).write.parquet(src + "/b1")
    stream = spark.readStream.schema(sschema) \
        .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    out = streaming_rolling_features(
        stream, ["k"], "ts", "v", window_ms=60_000, id_col="event_id")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("ooo").start())
    q.processAllAvailable()
    spark.createDataFrame([("a", 50_000, 0, 1.0)], sschema) \
        .coalesce(1).write.parquet(src + "/b2")
    q.processAllAvailable()
    # batch 3 in order: the ascending fast path over the unsorted
    # buffer would see only rows after searchsorted's broken boundary
    # (cnt=1); sequential buffered-rows semantics see all three
    spark.createDataFrame([("a", 120_000, 2, 1.0)], sschema) \
        .coalesce(1).write.parquet(src + "/b3")
    q.processAllAvailable()
    q.stop()
    got = spark.table("ooo").toPandas() \
        .sort_values("event_id").cnt.astype(int).tolist()
    assert got[-1] == 3


# ------------------------------------- checkpoint fingerprint contracts

def test_code_fp_sees_module_constants_and_partials():
    """Editing a module-level constant a stage reads must invalidate its
    checkpoint; functools.partial stages must fingerprint stably across
    processes (no memory addresses) yet stay arg-sensitive."""
    import functools

    from openmldb_spark.jobs.checkpoint import _code_fp

    ns1, ns2 = {"__name__": "m"}, {"__name__": "m"}
    exec("THRESHOLD = 5\ndef f(x):\n    return x + THRESHOLD\n", ns1)
    exec("THRESHOLD = 10\ndef f(x):\n    return x + THRESHOLD\n", ns2)
    assert _code_fp(ns1["f"]) != _code_fp(ns2["f"])
    assert _code_fp(ns1["f"]) == _code_fp(ns1["f"])

    ns3, ns4 = {"__name__": "m"}, {"__name__": "m"}
    exec("def h(x):\n    return x * 2\ndef g(x):\n    return h(x)\n", ns3)
    exec("def h(x):\n    return x * 3\ndef g(x):\n    return h(x)\n", ns4)
    assert _code_fp(ns3["g"]) != _code_fp(ns4["g"])

    def build(df, cfg):
        return cfg
    assert _code_fp(functools.partial(build, cfg=5)) \
        == _code_fp(functools.partial(build, cfg=5))
    assert _code_fp(functools.partial(build, cfg=5)) \
        != _code_fp(functools.partial(build, cfg=6))


# -------------------------------------------- 3. cap_per_key total order

def test_top_formatting_native_kernel_agree(spark):
    """top() renders doubles identically on both execution paths —
    v1::format_string %f (reference udf.cc:1267-1274) — so adding
    MAXSIZE to a spec can never change the string payload."""
    from openmldb_spark import Agg, WindowSpecFE, window_agg

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, 3.5)], "k string, ts long, v double")
    native = WindowSpecFE(["k"], "ts", frame="range", start=10, end=0,
                          peer="sql")
    kernel = WindowSpecFE(["k"], "ts", frame="range", start=10, end=0,
                          maxsize=10)
    n = {r.ts: r.t for r in
         window_agg(df, native, [Agg("t", "top", "v", n=2)]).collect()}
    k = {r.ts: r.t for r in
         window_agg(df, kernel, [Agg("t", "top", "v", n=2)]).collect()}
    assert n == k == {1: "2.000000", 2: "3.500000,2.000000"}


def test_last_join_null_order_keys_lose(spark):
    """A matched right row with a NULL order value must never outrank a
    real match (either strategy, either direction)."""
    from openmldb_spark import last_join

    left = spark.createDataFrame([(1, 5)], "k int, ts long")
    right = spark.createDataFrame(
        [(1, None, "nullrow"), (1, 3, "real")], "k int, ts long, v string")
    sm = last_join(left, right, on="k", order_by="ts",
                   left_ts="ts", right_ts="ts").collect()
    jr = last_join(left, right, on="k", order_by="ts", left_ts="ts",
                   right_ts="ts", strategy="join_rank").collect()
    assert sm[0].v == jr[0].v == "real"
    desc = last_join(left, right, on="k", order_by="ts",
                     strategy="join_rank", descending=True).collect()
    assert desc[0].v == "real"


def test_multi_window_drops_null_order_rows(spark):
    """multi_window_agg emits the same row set as window_agg: rows with
    a NULL order key drop (and never occupy other rows' ROWS frames)."""
    from openmldb_spark import Agg, WindowSpecFE
    from openmldb_spark.operators.window_agg import multi_window_agg

    df = spark.createDataFrame(
        [("a", None, 100), ("a", 1, 1), ("a", 2, 2)],
        "k string, ts long, v int")
    spec = WindowSpecFE(["k"], "ts", frame="rows", start=1, end=0,
                        peer="sql")
    out = multi_window_agg(df, [(spec, [Agg("s", "sum", "v")])]) \
        .toPandas().sort_values("ts").reset_index(drop=True)
    assert list(out.ts) == [1, 2]          # NULL-ts row dropped
    assert list(out.s) == [1, 3]           # and absent from frames


def test_long_window_count_star(spark):
    from openmldb_spark import Agg
    from openmldb_spark.operators.long_window import long_window_agg

    df = spark.createDataFrame(
        [("a", 1000, 1.0), ("a", 2000, 2.0), ("a", 12000, 3.0)],
        "k string, ts long, v double")
    out = long_window_agg(df, ["k"], "ts", 10_000, [Agg("c", "count")]) \
        .toPandas().sort_values("ts")
    assert list(out.c) == [1, 2, 2]        # 12000 sees [2000, 12000]


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
