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
        target = F.col(a.col)
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
