"""Gap-based sessionization.

Not present in the reference dialect (OpenMLDB has no session windows —
SURVEY.md §2.8); mandated by the north star as a derived temporal feature.
Expressed fully natively: lag(ts) → gap > threshold → cumulative sum of
session boundaries. One shuffle (the partitionBy), whole-stage codegen'd.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(df: DataFrame, partition_by: str | Sequence[str],
               order_by: str, gap_ms: int,
               tiebreak: Sequence[str] = (),
               out_col: str = "session_id") -> DataFrame:
    """Assign 0-based session ids per partition key: a new session starts
    when the gap to the previous row's order key exceeds ``gap_ms``
    (strictly greater). Rows with NULL order key are dropped (consistent
    with window_agg's NULL-order-key rule)."""
    from openmldb_spark.functions.timeutil import to_ms

    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    d = df.filter(F.col(order_by).isNotNull()) \
          .withColumn("__ord_ms", to_ms(df, order_by))
    w = Window.partitionBy(*keys).orderBy(
        F.col("__ord_ms").asc(), *[F.col(c).asc() for c in tiebreak])
    gap = F.col("__ord_ms") - F.lag("__ord_ms", 1).over(w)
    boundary = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    d = d.withColumn("__b", boundary)
    sid = F.sum("__b").over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
    return d.withColumn(out_col, sid.cast("long")).drop("__ord_ms", "__b")
