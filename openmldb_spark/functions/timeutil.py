"""Order-key normalization: everything computes on int64 milliseconds.

The reference stores/computes timestamps as int64 ms (SURVEY.md §1.2;
WindowAggPlan.scala:369-373 divides Spark µs by 1000). We normalize any
supported order-key type (timestamp, timestamp_ntz, date, integral) to an
int64 ms Column. Session timezone is pinned to UTC (session.py), so
TIMESTAMP_NTZ → TIMESTAMP is instant-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_ms(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_millis(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_millis(F.col(col).cast("timestamp"))
    if isinstance(dt, T.DateType):
        return F.unix_millis(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")
