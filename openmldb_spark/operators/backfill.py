"""Forward/backward fill over partitioned time order.

OpenMLDB expresses this as ``at``/``lag`` + COALESCE chains; the idiomatic
Spark form is ``last(col, ignorenulls=True)`` over an unbounded-preceding
frame. ``bfill`` looks *forward* — it reads future rows and therefore
leaks time; it exists for offline label construction only and is marked so.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(df: DataFrame, keys: list[str], order_by: str,
       tiebreak: Sequence[str]):
    from openmldb_spark.functions.timeutil import to_ms

    return Window.partitionBy(*keys).orderBy(
        to_ms(df, order_by).asc(), *[F.col(c).asc() for c in tiebreak])


def ffill(df: DataFrame, cols: str | Sequence[str],
          partition_by: str | Sequence[str], order_by: str,
          tiebreak: Sequence[str] = ()) -> DataFrame:
    """Replace NULLs with the most recent non-NULL value at-or-before the
    row (leakage-free: only reads the past)."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    cols = [cols] if isinstance(cols, str) else list(cols)
    # engine-wide rule (window_agg, sessionize): NULL order keys drop —
    # a NULL-ts row would otherwise sort FIRST and seed the fill for
    # every real row in its partition with a time-meaningless value
    df = df.filter(F.col(order_by).isNotNull())
    w = _w(df, keys, order_by, tiebreak).rowsBetween(
        Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(df: DataFrame, cols: str | Sequence[str],
          partition_by: str | Sequence[str], order_by: str,
          tiebreak: Sequence[str] = ()) -> DataFrame:
    """Backward fill — READS FUTURE ROWS (temporal leakage by design;
    offline label construction only)."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    cols = [cols] if isinstance(cols, str) else list(cols)
    df = df.filter(F.col(order_by).isNotNull())   # NULL order keys drop
    w = _w(df, keys, order_by, tiebreak).rowsBetween(
        0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out
