"""Data expiration — the reference's TTL semantics as logical filters.

OpenMLDB tables carry per-index TTL specs (hybridse/src/proto/
fe_type.proto:36-40: ``kTTLTimeLive`` — expire rows older than a time
horizon; ``kTTLCountLive`` — keep only the newest k rows per key;
``kTTLTimeLiveAndCountLive`` / or-combinations; cases
cases/function/data_expiration/). Storage-level expiry is an online-store
concern; in the batch engine TTL is a *logical* predicate applied at
read time — which is exactly how a lakehouse handles it (partition-prune
old data / rank-filter per key), so these transforms are the whole
feature.

``time_live`` compiles to a scan-level predicate (partition-prunable on
a date-partitioned table); ``count_live`` is one shuffle + row_number.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openmldb_spark.functions.timeutil import to_ms


def time_live(df: DataFrame, ts_col: str, ttl_ms: int,
              now_ms: int | None = None, lazy: bool = True) -> DataFrame:
    """kTTLTimeLive: keep rows with ts >= horizon.

    ``now_ms`` defaults to the max ts in the frame of reference of the
    *data* (batch semantics: expiry relative to the newest event, so a
    backfill over historical data is reproducible); pass an explicit
    wall-clock ms for online-parity behavior.

    Anchor evaluation: by default (``lazy=True``) the max-ts anchor is
    a 1-row aggregate broadcast-joined onto the scan, so the whole
    pipeline stays unevaluated until action time — no driver job is
    triggered just by *building* the plan (VERDICT r2 #7; the previous
    eager default ran a collect() at plan-construction time).
    ``lazy=False`` opts back into resolving the anchor eagerly so the
    filter becomes a LITERAL scan predicate (partition-prunable on a
    date-partitioned table — worth it when the scan is the dominant
    cost and the extra driver job is not).
    """
    ord_ms = to_ms(df, ts_col)
    if now_ms is None:
        if lazy:
            mx = df.agg(F.max(ord_ms).alias("__ttl_max"))
            # NULL max (empty / all-NULL ts) keeps every row — the
            # eager branch's `mx is None` semantics; without the guard
            # the NULL comparison would drop the whole table
            return (df.crossJoin(F.broadcast(mx))
                      .filter(F.col("__ttl_max").isNull()
                              | (ord_ms >= F.col("__ttl_max")
                                 - F.lit(ttl_ms)))
                      .drop("__ttl_max"))
        mx = df.agg(F.max(ord_ms).alias("m")).collect()[0]["m"]
        if mx is None:
            return df
        return df.filter(ord_ms >= F.lit(int(mx) - ttl_ms))
    return df.filter(ord_ms >= F.lit(int(now_ms) - ttl_ms))


def count_live(df: DataFrame, keys: str | Sequence[str],
               ts_col: str | None, k: int,
               tiebreak: Sequence[str] = ()) -> DataFrame:
    """kTTLCountLive: keep the newest k rows per key (ties pinned by
    ``tiebreak`` descending, newest-first).

    ``ts_col=None``: the index has no time column — latest-k is by
    STORAGE order (reference `index(key=..., ttl=1, ttl_type=latest)`
    with no ts, e.g. fz_ddl luoji's `index1:reqId:null:1:latest`;
    storage/table.h). The batch proxy for insertion order is the scan
    order of the source, pinned per-row up front so the window's order
    is total and stable across shuffles."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if ts_col is None:
        d = df.withColumn("__sid", F.monotonically_increasing_id())
        w = Window.partitionBy(*keys).orderBy(
            F.col("__sid").desc(), *[F.col(c).desc() for c in tiebreak])
        return (d.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k).drop("__rn", "__sid"))
    w = Window.partitionBy(*keys).orderBy(
        to_ms(df, ts_col).desc(),
        *[F.col(c).desc() for c in tiebreak])
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def time_and_count_live(df: DataFrame, keys: str | Sequence[str],
                        ts_col: str, ttl_ms: int, k: int,
                        now_ms: int | None = None,
                        tiebreak: Sequence[str] = (),
                        combine: str = "and") -> DataFrame:
    """kTTLTimeLiveAndCountLive: 'and' keeps rows passing BOTH filters,
    i.e. a row expires when it is old OR beyond the count — the
    reference's **absorlat** (ddl/test_ttl.yaml#23: three stale rows
    under ttl=(10m,2) all expire). 'or' keeps rows passing EITHER
    filter, i.e. a row expires only when old AND beyond the count —
    the reference's **absandlat** (storage/mem_table.cc TTLType)."""
    if combine == "and":
        return count_live(time_live(df, ts_col, ttl_ms, now_ms), keys,
                          ts_col, k, tiebreak)
    if combine != "or":
        raise ValueError("combine must be 'and' or 'or'")
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    ord_ms = to_ms(df, ts_col)
    w = Window.partitionBy(*keys_l).orderBy(
        ord_ms.desc(), *[F.col(c).desc() for c in tiebreak])
    if now_ms is None:
        # lazy anchor, same as time_live: no driver job at plan time
        mx = df.agg(F.max(ord_ms).alias("__ttl_max"))
        return (df.crossJoin(F.broadcast(mx))
                .withColumn("__rn", F.row_number().over(w))
                .filter((F.col("__rn") <= k)
                        | (ord_ms >= F.col("__ttl_max") - F.lit(ttl_ms)))
                .drop("__rn", "__ttl_max"))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") <= k)
                    | (ord_ms >= F.lit(int(now_ms) - ttl_ms)))
            .drop("__rn"))
