"""Unit tests for the CREATE TABLE DDL front-end (openmldb_spark/ddl.py).

The golden-file conformance lives in test_reference_cases.py
(function/ddl/*.yaml); these pin the module's API behavior directly —
parse results, validation errors, option resolution, and the TTL
filter mapping onto the read-time expiry operators."""

from __future__ import annotations

import pytest

from openmldb_spark.ddl import (ClusterSpec, DDLError, parse_create_table,
                                ttl_filter)

BASE = ("create table t1 (c1 string NOT NULL, c2 int, c3 timestamp, "
        "c4 timestamp, index(key=(c1), ts=c4, ttl=3650d))")


def test_parse_basic():
    td = parse_create_table(BASE)
    assert td.name == "t1"
    assert [c.name for c in td.columns] == ["c1", "c2", "c3", "c4"]
    assert td.columns[0].not_null and not td.columns[1].not_null
    idx = td.indexes[0]
    assert idx.keys == ["c1"] and idx.ts == "c4"
    assert idx.abs_ttl_ms == 3650 * 86_400_000 and idx.lat_ttl is None
    assert td.partition_num == 8 and td.replica_num == 3


@pytest.mark.parametrize("sql,msg", [
    ("create table 1ab (c1 string, index(key=c1))", "invalid table"),
    ("create table order (c1 string)", "reserved"),
    ("create table t (use string)", "reserved"),
    ("create table t (c1 varchar2)", "unknown column type"),
    ("create table t (c1 string, index(key=(c9)))", "does not exist"),
    ("create table t (c1 string, c2 int, index(key=c1, ts=c2))",
     "timestamp/bigint"),
    ("create table t (c1 float, c2 timestamp, index(key=c1, ts=c2))",
     "type float"),
    # TTL slot rules: bare int = latest slot, interval = absolute slot
    ("create table t (c1 string, c2 timestamp, "
     "index(key=c1, ts=c2, ttl=3650))", "interval"),
    ("create table t (c1 string, c2 timestamp, "
     "index(key=c1, ts=c2, ttl=10m, ttl_type=latest))", "bare count"),
    ("create table t (c1 string, c2 timestamp, "
     "index(key=c1, ts=c2, ttl=(10,10m), ttl_type=absandlat))",
     "interval, count"),
    ("create table t (c1 string, c2 timestamp, "
     "index(key=c1, ts=c2, ttl=(3650), ttl_type=latest))", "over max"),
    ("create table t (c1 string, c2 timestamp, "
     "index(key=c1, ts=c2, ttl=0m, ttl_type=nosuch))", "not support"),
])
def test_rejects(sql, msg):
    with pytest.raises(DDLError, match=msg):
        parse_create_table(sql)


def test_backtick_quoted_reserved_name_ok():
    td = parse_create_table("create table `order` (c1 string)")
    assert td.name == "order"


def test_existing_table_rejected():
    with pytest.raises(DDLError, match="already exists"):
        parse_create_table("create table t1 (c1 string)",
                           existing=["t1"])


def test_keyless_index_auto_picks_first_indexable():
    td = parse_create_table(
        "create table t (c5 float, c1 string, c4 timestamp, "
        "index(ts=c4, ttl=0m))")
    assert td.indexes[0].keys == ["c1"]    # float skipped


MK = ("create table t (c1 string, c2 timestamp, "
      "index(key=c1, ts=c2)) options (%s)")
CL = ClusterSpec(tablets=("e0", "e1", "e2"))


def test_options_resolution_modern():
    """Current node_adapter.cc semantics (the integration_test golden
    generation): a distribution DEFINES both counts; explicit counts
    must match it exactly."""
    td = parse_create_table(MK % "partitionnum = 4, replicanum = 2",
                            cluster=CL)
    assert (td.partition_num, td.replica_num) == (4, 2)
    td = parse_create_table(
        MK % "distribution = [('e0', ['e1','e2'])]", cluster=CL)
    assert (td.partition_num, td.replica_num) == (1, 3)
    # dist alone with one endpoint: replica derives to 1 (int#19)
    td = parse_create_table(MK % "distribution = [('e0', [])]",
                            cluster=CL)
    assert (td.partition_num, td.replica_num) == (1, 1)
    # duplicate identical tuples accepted (int#5)
    td = parse_create_table(
        MK % ("partitionnum = 2, distribution = "
              "[('e0', ['e1','e2']), ('e0', ['e1','e2'])]"), cluster=CL)
    assert (td.partition_num, td.replica_num) == (2, 3)
    # explicit partitionnum must equal the entry count (int#21)
    with pytest.raises(DDLError, match="not match"):
        parse_create_table(
            MK % "partitionnum = 4, distribution = [('e0', [])]",
            cluster=CL)
    with pytest.raises(DDLError, match="outside"):
        parse_create_table(MK % "replicanum = 4", cluster=CL)
    with pytest.raises(DDLError, match="does not exist"):
        parse_create_table(MK % "distribution = [('nope', ['e1','e2'])]",
                           cluster=CL)
    with pytest.raises(DDLError, match="positive"):
        parse_create_table(MK % "partitionnum = 0", cluster=CL)


def test_options_resolution_legacy():
    """0.5-era resolution the function/ddl goldens encode."""
    def parse(opts):
        return parse_create_table(MK % opts, cluster=CL,
                                  legacy_options=True)
    # dist alone must match the DEFAULT replica count (fn#19 vs #24)
    with pytest.raises(DDLError, match="not match"):
        parse("distribution = [('e0', [])]")
    # explicit replicanum keeps the default partition count (fn#2)
    td = parse("replicanum = 1, distribution = [('e0', [])]")
    assert (td.partition_num, td.replica_num) == (8, 1)
    # partial distribution under a larger partitionnum accepted (fn#21)
    td = parse("partitionnum = 4, replicanum = 1, "
               "distribution = [('e0', [])]")
    assert (td.partition_num, td.replica_num) == (4, 1)
    with pytest.raises(DDLError, match="duplicate distribution"):
        parse("partitionnum = 2, distribution = "
              "[('e0', ['e1','e2']), ('e0', ['e1','e2'])]")


def test_ttl_filter_modes(spark):
    rows = [("a", 1000, 1), ("a", 2000, 2), ("a", 3000, 3),
            ("b", 9000, 4)]
    df = spark.createDataFrame(rows, "k string, ts_ms long, id int")

    def ids(sql, now):
        td = parse_create_table(sql)
        out = ttl_filter(df, td.indexes[0], now_ms=now)
        return sorted(r.id for r in out.collect())

    base = ("create table t (k string, ts_ms bigint, id int, "
            "index(key=k, ts=ts_ms, ttl=%s))")
    # absolute 1s: rows with ts >= now-1000 stay
    assert ids(base % "1s", 3500) == [3, 4]
    # latest 1 per key
    assert ids(base % "(1), ttl_type=latest", 3500) == [3, 4]
    # absorlat: expire when old OR beyond count
    assert ids(base % "(1s,2), ttl_type=absorlat", 3500) == [3, 4]
    # absandlat: expire only when old AND beyond count — id 2 is old
    # but within the 2 newest, id 1 is old AND third-newest -> expired
    assert ids(base % "(1s,2), ttl_type=absandlat", 3500) == [2, 3, 4]


def test_ttl_filter_latest_without_ts(spark):
    # latest-k on an index with NO ts column: storage (insertion)
    # order — the reference accepts `index(key=.., ttl=1,
    # ttl_type=latest)` with no ts (fz_ddl luoji reqId index)
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4)]
    df = spark.createDataFrame(rows, "k string, id int").coalesce(1)
    td = parse_create_table(
        "create table t (k string, id int, "
        "index(key=k, ttl=1, ttl_type=latest))")
    assert td.indexes[0].ts is None
    out = ttl_filter(df, td.indexes[0])
    assert sorted(r.id for r in out.collect()) == [3, 4]
    # time-based TTL without a ts column is a clear DDLError, not a
    # PySpark type error deep in the plan
    td2 = parse_create_table(
        "create table t (k string, id int, index(key=k, ttl=5m))")
    with pytest.raises(DDLError, match="ts column"):
        ttl_filter(df, td2.indexes[0], now_ms=1000)
