"""GROUP BY aggregate surface — OpenMLDB UDAF family as Catalyst expressions.

Reference: hybridse/src/udf/default_udf_library.cc (sum :2539, min :2586,
max :2610, count :2634, avg :2659, distinct_count :2682, sum_where :2706,
count_where :2730, avg_where :2755, min_where :2779, max_where :2803,
top :2828, median :2854) and hybridse/src/udf/default_defs/
feature_zero_def.cc (topn_frequency, top1_ratio) /
agg_by_category_def.cc (*_cate, *_cate_where).

Everything here is a Column builder (pure Catalyst, whole-stage codegen,
map-side partial aggregation preserved) except the frequency/category
families, which are *relational* helpers — a second groupBy is the
Spark-first shape for "aggregate by category inside a group" (no UDF, two
shuffles collapsed by AQE when the key sets nest).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _cond(cond: str | Column) -> Column:
    return F.expr(cond) if isinstance(cond, str) else cond


# -- conditional aggregates (reference *_where) ------------------------------

def count_where(col: str | Column, cond: str | Column) -> Column:
    return F.count(F.when(_cond(cond), _c(col)))


def sum_where(col: str | Column, cond: str | Column) -> Column:
    return F.sum(F.when(_cond(cond), _c(col)))


def avg_where(col: str | Column, cond: str | Column) -> Column:
    return F.avg(F.when(_cond(cond), _c(col)))


def min_where(col: str | Column, cond: str | Column) -> Column:
    return F.min(F.when(_cond(cond), _c(col)))


def max_where(col: str | Column, cond: str | Column) -> Column:
    return F.max(F.when(_cond(cond), _c(col)))


def distinct_count(col: str | Column) -> Column:
    return F.countDistinct(_c(col)).cast("long")


def median(col: str | Column) -> Column:
    """Reference median = percentile 0.5 (default_udf_library.cc:2854)."""
    return F.expr(f"percentile({col if isinstance(col, str) else ''}, 0.5)") \
        if isinstance(col, str) else F.percentile(_c(col), F.lit(0.5))


def top(col: str | Column, k: int) -> Column:
    """Comma-joined string of the k largest values, descending
    (default_udf_library.cc:2828-2853)."""
    return F.concat_ws(
        ",", F.slice(F.sort_array(F.collect_list(_c(col)), asc=False), 1, k))


# -- frequency / category families (relational helpers) ----------------------

def topn_frequency_agg(df: DataFrame, keys: Sequence[str], col: str,
                       n: int, out_col: str = "topn_frequency") -> DataFrame:
    """Per key-group: comma-joined top-n most frequent values of ``col``
    (ties broken by value ascending, matching the reference's
    feature_zero_def.cc ordering). Returns one row per key-group.

    Shape: groupBy(keys+col).count → row_number window → filter → string
    re-agg. All Catalyst; the window partitions by ``keys`` which the
    first groupBy already co-partitioned, so no extra shuffle.
    """
    keys = list(keys)
    cnt = df.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*keys).orderBy(F.col("__cnt").desc(),
                                          F.col(col).asc())
    ranked = cnt.withColumn("__rn", F.row_number().over(w)) \
                .filter(F.col("__rn") <= n)
    return (ranked.groupBy(*keys)
            .agg(F.concat_ws(",", F.array_sort(F.collect_list(
                F.struct(F.col("__rn").alias("r"),
                         F.col(col).cast("string").alias("v"))))
                .getField("v")).alias(out_col)))


def top1_ratio_agg(df: DataFrame, keys: Sequence[str], col: str,
                   out_col: str = "top1_ratio") -> DataFrame:
    """Per key-group: frequency of the most frequent value / group size."""
    keys = list(keys)
    cnt = df.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("__cnt"))
    return (cnt.groupBy(*keys)
            .agg((F.max("__cnt") / F.sum("__cnt"))
                 .cast("double").alias(out_col)))


_CATE_FNS = {"count": F.count, "sum": F.sum, "avg": F.avg,
             "min": F.min, "max": F.max}


def cate_agg(df: DataFrame, keys: Sequence[str], col: str | None, cate: str,
             fn: str, out_col: str | None = None,
             cond: str | Column | None = None,
             fmt: str = "auto") -> DataFrame:
    """``{fn}_cate[_where]``: per key-group, a ``cat1:val,cat2:val`` string
    with categories sorted ascending (reference agg_by_category_def.cc).

    ``fmt='int'`` renders values as integers (counts), ``'g'`` uses %g-ish
    trimming, ``'auto'`` picks by fn.
    """
    keys = list(keys)
    if fn not in _CATE_FNS:
        raise ValueError(f"cate fn must be one of {sorted(_CATE_FNS)}")
    out_col = out_col or f"{fn}_cate"
    target = F.lit(1) if fn == "count" and col is None else _c(col)
    if cond is not None:
        target = F.when(_cond(cond), target)
    per_cat = (df.filter(F.col(cate).isNotNull())
               .groupBy(*keys, cate)
               .agg(_CATE_FNS[fn](target).alias("__v")))
    if fn == "count":
        val_s = F.col("__v").cast("string")
    else:
        # integral-valued doubles render without trailing .0 (reference
        # formats via std::to_string-ish trimming)
        val_s = F.when(F.col("__v").cast("double") ==
                       F.floor("__v").cast("double"),
                       F.floor("__v").cast("long").cast("string")) \
                 .otherwise(F.col("__v").cast("string"))
    entry = F.concat(F.col(cate).cast("string"), F.lit(":"), val_s)
    return (per_cat.groupBy(*keys)
            .agg(F.concat_ws(",", F.array_sort(F.collect_list(
                F.struct(F.col(cate).cast("string").alias("k"),
                         entry.alias("e")))).getField("e"))
                .alias(out_col)))
