"""Long-window aggregation — the reference's LONG_WINDOWS optimization,
re-derived Spark-first.

Reference: deploy-time ``kPassLongWindowOptimized`` +
``kPassSplitAggregationOptimized`` rewrite long-window aggregates to read
a pre-aggregated bucket table maintained by the online store
(hybridse/src/passes/physical/long_window_optimized.h,
src/storage/aggregator.h:121-300; runtime merge of full buckets + raw
edge rows hybridse/src/vm/runner.cc:2967-3108). The point: a per-row
sliding aggregate over a very wide frame must not cost O(rows x frame).

In Spark the same goal decomposes by aggregate algebra instead of a
materialized bucket table:

- **subtractable aggregates (sum / count / avg)**: frame [t-W, t] equals
  ``running(t) - running(t-W-1)``. Both terms are *growing* frames
  (UNBOUNDED PRECEDING .. x), which Spark's window exec computes with a
  single running accumulator — O(n) per key regardless of W. Two native
  window columns, one shuffle, no bucket table to maintain.
- **non-subtractable aggregates (min / max / distinct_count / ...)**:
  handled by the ``window_agg`` kernel, whose sparse-table range queries
  are O(n log n) per key independent of frame width — already the
  long-window shape. ``long_window_agg`` routes them there.

This keeps the reference's asymptotics (its bucket merge is O(n + n/b)
amortized) without its moving part — the maintained pre-agg table — and
a differential test pins equality with the direct windowed computation.

Semantics: SQL peers (``peer='sql'``) on int64-ms order keys, closed
frame [t-W, t]; NULL order keys dropped (engine-wide rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openmldb_spark.functions.timeutil import to_ms
from openmldb_spark.operators.window_agg import (
    Agg, WindowSpecFE, window_agg)

_SUBTRACTABLE = {"count", "sum", "avg", "count_where", "sum_where",
                 "avg_where"}


def long_window_agg(df: DataFrame, partition_by: Sequence[str],
                    order_by: str, window_ms: int,
                    aggs: Sequence[Agg]) -> DataFrame:
    """Per-row aggregates over ``[t - window_ms, t]`` per key, computed
    with cost independent of ``window_ms``. See module docstring."""
    keys = list(partition_by)
    aggs = list(aggs)
    sub = [a for a in aggs if a.fn in _SUBTRACTABLE]
    rest = [a for a in aggs if a.fn not in _SUBTRACTABLE]

    out = df
    if sub:
        out = _running_difference(out, keys, order_by, window_ms, sub)
    if rest:
        spec = WindowSpecFE(keys, order_by, frame="range",
                            start=window_ms, end=0, peer="sql")
        out = window_agg(out, spec, rest)
    return out


def _running_difference(df: DataFrame, keys: list[str], order_by: str,
                        window_ms: int, aggs: list[Agg]) -> DataFrame:
    d = df.filter(F.col(order_by).isNotNull()) \
          .withColumn("__lw_ord", to_ms(df, order_by))
    w_now = (Window.partitionBy(*keys).orderBy(F.col("__lw_ord"))
             .rangeBetween(Window.unboundedPreceding, 0))
    # strictly-before-the-frame prefix: rows with ord <= t - W - 1
    w_before = (Window.partitionBy(*keys).orderBy(F.col("__lw_ord"))
                .rangeBetween(Window.unboundedPreceding, -(window_ms + 1)))

    cols = [F.col(c) for c in df.columns]
    for a in aggs:
        # count(*) / count_where(*): col=None counts rows, same as
        # window_agg's contract
        if a.col is None and not a.fn.startswith("count"):
            raise ValueError(f"{a.fn} requires a column")
        target = F.lit(1) if a.col is None else F.col(a.col)
        if a.cond:
            target = F.when(F.expr(a.cond), target)
        base = a.fn.split("_")[0]
        if base == "count":
            now = F.count(target).over(w_now)
            before = F.count(target).over(w_before)
            cols.append((now - before).alias(a.name))
        elif base == "sum":
            now = F.sum(target).over(w_now)
            before = F.coalesce(F.sum(target).over(w_before), F.lit(0))
            # frame-local nullness: SUM over an all-null frame is NULL,
            # which the running difference alone can't see
            n_in = F.count(target).over(w_now) - F.count(target).over(w_before)
            cols.append(F.when(n_in > 0, now - before).alias(a.name))
        else:  # avg
            s_now = F.sum(target).over(w_now)
            s_bef = F.coalesce(F.sum(target).over(w_before), F.lit(0))
            c_now = F.count(target).over(w_now)
            c_bef = F.count(target).over(w_before)
            n_in = c_now - c_bef
            cols.append(F.when(n_in > 0, (s_now - s_bef) / n_in)
                        .alias(a.name))
    return d.select(*cols)


# --------------------------------------------------------------------------
# Materialized pre-aggregation (the reference's maintained bucket table)
# --------------------------------------------------------------------------

_PREAGG_FNS = {"sum", "count", "avg", "min", "max"}


def long_window_preagg(df: DataFrame, partition_by: Sequence[str],
                       order_by: str, bucket_ms: int,
                       value_cols: Sequence[str]) -> DataFrame:
    """Materialize per-(key, bucket) partials for ``value_cols`` —
    the Spark form of the reference's maintained pre-agg table
    (src/storage/aggregator.h:121-300: one row per key per time bucket
    holding the bucket's partial aggregate).

    Returns one row per (partition keys, ``__lw_bucket``) with columns
    ``__lw_{col}_{sum,cnt,min,max}``. Persist it with
    ``.write.partitionBy(*keys)`` (or bucketBy) so repeated backfills
    prune to the touched keys; the table is ~rows/bucket_width smaller
    than the raw history, which is the whole point — a backfill of a few
    new rows reads partials + two raw edge buckets instead of the full
    window of history."""
    keys = list(partition_by)
    d = (df.filter(F.col(order_by).isNotNull())
           .withColumn("__lw_ord", to_ms(df, order_by))
           .withColumn("__lw_bucket",
                       F.floor(F.col("__lw_ord") / F.lit(bucket_ms))))
    aggs = []
    for c in value_cols:
        aggs += [F.sum(c).alias(f"__lw_{c}_sum"),
                 F.count(c).alias(f"__lw_{c}_cnt"),
                 F.min(c).alias(f"__lw_{c}_min"),
                 F.max(c).alias(f"__lw_{c}_max")]
    return d.groupBy(*keys, "__lw_bucket").agg(*aggs)


def long_window_agg_backfill(probe: DataFrame, partials: DataFrame,
                             raw: DataFrame,
                             partition_by: Sequence[str], order_by: str,
                             window_ms: int, bucket_ms: int,
                             aggs: Sequence[Agg],
                             probe_id: str | None = None) -> DataFrame:
    """Per-probe-row aggregates over ``[t - window_ms, t]`` merged from
    FULL bucket partials plus RAW rows of the two edge buckets — the
    reference's runtime long-window merge (hybridse/src/vm/runner.cc:
    2967-3108: full buckets from the pre-agg table, edge rows from the
    base table).

    Cost model (the reason this exists): a backfill of P new rows costs
    O(P x window/bucket) partial-bucket merges + O(P x rows-per-bucket)
    edge rows — independent of total history size. Both merge joins
    shuffle on the partition keys only. At corpus scale, write ``raw``
    partitioned by the bucket column so the edge join prunes to the two
    touched buckets per probe instead of scanning history.

    Supported: sum / count / avg / min / max (the reference's pre-agg
    registry is the same five, aggregator.h). ``probe`` rows are NOT
    assumed to be in ``raw``; the frame the probe row sees is
    [t - window_ms, t] over raw rows (append the probe delta to raw
    first if self-inclusion is wanted)."""
    keys = list(partition_by)
    aggs = list(aggs)
    for a in aggs:
        if a.fn not in _PREAGG_FNS:
            raise ValueError(f"{a.fn} has no pre-agg form (registry: "
                             f"{sorted(_PREAGG_FNS)}); use "
                             f"long_window_agg for it")
        if not a.col:
            raise ValueError(f"pre-agg {a.fn} requires an explicit "
                             f"value column (count(*) has none)")
    rid = probe_id or "__lw_rid"
    p = probe
    if probe_id is None:
        # `p` feeds three independent plan branches (full-bucket join,
        # edge join, final zip); a recomputed id could renumber
        # duplicate (keys, order_by) probe rows differently between
        # branch evaluations and silently mispair the merged aggregates
        # (same hazard as window_agg_multi, ADVICE r2 #1 / r3 medium).
        # So the id is distributed (monotonically_increasing_id — no
        # single-partition global sort) and PINNED by materializing
        # once: checkpoint when a checkpoint dir exists, else
        # localCheckpoint.
        p = probe.withColumn(rid, F.monotonically_increasing_id())
        sc = probe.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            p = p.checkpoint(eager=True)
        else:
            p = p.localCheckpoint(eager=True)
    p = (p.withColumn("__lw_t", to_ms(p, order_by))
          .withColumn("__lw_s", F.col("__lw_t") - F.lit(window_ms))
          .withColumn("__lw_bt",
                      F.floor(F.col("__lw_t") / F.lit(bucket_ms)))
          .withColumn("__lw_bs",
                      F.floor(F.col("__lw_s") / F.lit(bucket_ms))))

    val_cols = sorted({a.col for a in aggs})

    # ---- full buckets: strictly between the edge buckets. The join is
    # bounded: <= window/bucket partial rows per probe row (exactly the
    # reference's merge fan-in), shuffled on the partition keys.
    pj = p.select(rid, *keys, "__lw_bs", "__lw_bt").alias("p")
    pa = partials.alias("a")
    on = None
    for k in keys:
        c = pj[k].eqNullSafe(pa[k])
        on = c if on is None else (on & c)
    on = on & (pa["__lw_bucket"] > pj["__lw_bs"]) \
             & (pa["__lw_bucket"] < pj["__lw_bt"])
    full_aggs = []
    for c in val_cols:
        full_aggs += [F.sum(f"a.__lw_{c}_sum").alias(f"__f_{c}_sum"),
                      F.sum(f"a.__lw_{c}_cnt").alias(f"__f_{c}_cnt"),
                      F.min(f"a.__lw_{c}_min").alias(f"__f_{c}_min"),
                      F.max(f"a.__lw_{c}_max").alias(f"__f_{c}_max")]
    full = (pj.join(pa, on, "left")
              .groupBy(f"p.{rid}").agg(*full_aggs)
              .withColumnRenamed(rid, rid))

    # ---- edge rows: raw rows in the two partial buckets inside the
    # frame. Bounded by 2 x rows-per-bucket per probe row.
    r = (raw.filter(F.col(order_by).isNotNull())
            .withColumn("__lw_ord", to_ms(raw, order_by))
            .withColumn("__lw_bucket",
                        F.floor(F.col("__lw_ord") / F.lit(bucket_ms)))
            .alias("r"))
    pe = p.select(rid, *keys, "__lw_s", "__lw_t", "__lw_bs",
                  "__lw_bt").alias("p")
    eon = None
    for k in keys:
        c = pe[k].eqNullSafe(r[k])
        eon = c if eon is None else (eon & c)
    eon = eon & ((r["__lw_bucket"] == pe["__lw_bs"])
                 | (r["__lw_bucket"] == pe["__lw_bt"])) \
              & (r["__lw_ord"] >= pe["__lw_s"]) \
              & (r["__lw_ord"] <= pe["__lw_t"])
    edge_aggs = []
    for c in val_cols:
        edge_aggs += [F.sum(f"r.{c}").alias(f"__e_{c}_sum"),
                      F.count(f"r.{c}").alias(f"__e_{c}_cnt"),
                      F.min(f"r.{c}").alias(f"__e_{c}_min"),
                      F.max(f"r.{c}").alias(f"__e_{c}_max")]
    edge = pe.join(r, eon, "left").groupBy(f"p.{rid}").agg(*edge_aggs)

    out = (p.join(full, on=rid, how="left")
            .join(edge, on=rid, how="left"))
    # output schema = probe columns + agg names; the synthesized
    # internal row id must not leak (a caller-supplied probe_id is a
    # probe column already)
    sel = [F.col(c) for c in probe.columns]
    z = F.lit(0)
    for a in aggs:
        c = a.col
        fs, fc = F.coalesce(f"__f_{c}_sum", z), F.coalesce(f"__f_{c}_cnt", z)
        es, ec = F.coalesce(f"__e_{c}_sum", z), F.coalesce(f"__e_{c}_cnt", z)
        cnt = fc + ec
        if a.fn == "count":
            sel.append(cnt.alias(a.name))
        elif a.fn == "sum":
            sel.append(F.when(cnt > 0, fs + es).alias(a.name))
        elif a.fn == "avg":
            sel.append(F.when(cnt > 0, (fs + es) / cnt).alias(a.name))
        elif a.fn == "min":
            sel.append(F.least(F.col(f"__f_{c}_min"),
                               F.col(f"__e_{c}_min")).alias(a.name))
        else:
            sel.append(F.greatest(F.col(f"__f_{c}_max"),
                                  F.col(f"__e_{c}_max")).alias(a.name))
    return out.select(*sel)


# --------------------------------------------------------------------------
# Online pre-agg table replica (flushed-bucket contents)
# --------------------------------------------------------------------------

_BUCKET_UNITS = {"s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def parse_bucket(spec) -> tuple[str, int]:
    """``'2s'/'2m'/'2h'/'2d'`` -> ('range', width_ms); ``'2'``/``2`` ->
    ('rows', n). The reference's long-window bucket grammar
    (src/storage/aggregator.cc AlignedStart / WindowType)."""
    s = str(spec).strip().lower()
    if s and s[-1] in _BUCKET_UNITS:
        n = int(s[:-1])
        if n <= 0:
            raise ValueError(f"bad bucket spec {spec!r}")
        return "range", n * _BUCKET_UNITS[s[-1]]
    n = int(s)
    if n <= 0:
        raise ValueError(f"bad bucket spec {spec!r}")
    return "rows", n


def preagg_table(df: DataFrame, partition_by: Sequence[str],
                 order_by: str, agg_fn: str, value_col: str | None,
                 bucket, filter_col: str | None = None,
                 arrival_col: str | None = None) -> DataFrame:
    """The FLUSHED contents of the reference's online pre-agg table for
    one long-window aggregate — what ``SELECT key, ts_start, ts_end,
    num_rows, agg_val, filter_key FROM pre_<db>_<dep>_<w>_<fn>_<col>``
    returns after all rows are ingested (src/storage/aggregator.cc:100
    ``Aggregator::Update``; flush rule :189 ``CheckBufferFilled``).

    Semantics replicated exactly:

    - one buffer per (key, filter_key) series; ``filter_key`` is the
      stringified filter column value (``*_where`` pre-aggs), NULL
      filter values map to the reference's "" buffer;
    - time buckets (``'2s'``...): aligned at ``floor(ts/W)*W`` spanning
      ``[start, start+W-1]``; a bucket only reaches the table when a
      later event passes its end, so the series' max-ts bucket is still
      buffered and never appears (the open buffer only moves forward,
      which makes this exact under out-of-order ingest too —
      UpdateFlushedBuffer backfills older buckets, aggregator.cc:176);
    - row buckets (``'2'``): every N arrivals per key one bucket, in
      arrival order (``arrival_col``, else order-key order);
      ``ts_start``/``ts_end`` are the first/last arrival's ts; the last
      bucket is open even when exactly full (flush triggers on the NEXT
      arrival, aggregator.cc:189); filter columns are rejected, as the
      reference does (aggregator.cc:128);
    - ``num_rows`` counts every buffered row; ``agg_val`` skips NULLs
      (SumAggregator::UpdateAggrVal returns early on NULL); ``count``
      with a value column counts non-NULL, ``count(*)`` all rows; for
      ``avg`` the stored value is the running SUM (non-null count rides
      in num_rows' sibling field, aggregator.h AggrBuffer).

    At scale this is one shuffle (the groupBy) + a per-series window max
    over the already-aggregated frame (~rows/bucket), so materializing
    the replica is strictly cheaper than the raw history scan.
    """
    fn = agg_fn.lower()
    if fn not in _PREAGG_FNS:
        raise ValueError(f"{agg_fn} has no pre-agg form (registry: "
                         f"{sorted(_PREAGG_FNS)})")
    keys = list(partition_by)
    kind, width = parse_bucket(bucket)
    if kind == "rows" and filter_col is not None:
        # "unsupport rows bucket window for *_where agg op"
        raise ValueError("rows-bucket pre-agg cannot carry a filter "
                         "column (reference aggregator.cc:128)")
    d = df.filter(F.col(order_by).isNotNull())
    d = d.withColumn("__pa_ts", to_ms(d, order_by))
    fk = (F.coalesce(F.col(filter_col).cast("string"), F.lit(""))
          if filter_col is not None else F.lit(None).cast("string"))
    d = d.withColumn("__pa_fk", fk)

    if kind == "range":
        d = d.withColumn("__pa_b",
                         F.floor(F.col("__pa_ts") / F.lit(width)))
        ts_start = (F.col("__pa_b") * width).alias("ts_start")
        ts_end = (F.col("__pa_b") * width + (width - 1)).alias("ts_end")
    else:
        order = [arrival_col] if arrival_col else ["__pa_ts"]
        w = Window.partitionBy(*keys).orderBy(*order)
        d = d.withColumn(
            "__pa_b", F.floor((F.row_number().over(w) - 1) / width))
        ts_start, ts_end = (F.col("__pa_ts_min").alias("ts_start"),
                            F.col("__pa_ts_max").alias("ts_end"))

    if fn == "count":
        val = (F.count(F.lit(1)) if value_col is None
               else F.count(value_col))
    elif fn == "avg":
        val = F.sum(value_col)          # buffer stores the running sum
    else:
        val = getattr(F, fn)(value_col)
    if kind == "rows" and arrival_col:
        # ts_begin_/ts_end_ are the FIRST/LAST arrival's ts, which under
        # out-of-order ingest need not be the min/max (aggregator.cc:158)
        first_ts = F.min_by("__pa_ts", arrival_col)
        last_ts = F.max_by("__pa_ts", arrival_col)
    else:
        first_ts, last_ts = F.min("__pa_ts"), F.max("__pa_ts")
    g = (d.groupBy(*keys, "__pa_fk", "__pa_b")
          .agg(F.count(F.lit(1)).alias("num_rows"),
               val.alias("agg_val"),
               first_ts.alias("__pa_ts_min"),
               last_ts.alias("__pa_ts_max")))
    # drop the series' open buffer: max bucket per (key, filter_key)
    # for time buckets, max bucket per key for row buckets (one buffer
    # per key there). Window over the grouped frame — tiny.
    series = keys + (["__pa_fk"] if kind == "range" else [])
    mx = Window.partitionBy(*series)
    g = (g.withColumn("__pa_mx", F.max("__pa_b").over(mx))
          .filter(F.col("__pa_b") < F.col("__pa_mx")))
    return g.select(*keys, ts_start, ts_end, "num_rows", "agg_val",
                    F.col("__pa_fk").alias("filter_key"))
