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


def _cate_per_cat(df: DataFrame, keys: list[str], col: str | None,
                  cate: str, fn: str, cond) -> DataFrame:
    target = F.lit(1) if fn == "count" and col is None else _c(col)
    if cond is not None:
        target = F.when(_cond(cond), target)
    return (df.filter(F.col(cate).isNotNull())
            .groupBy(*keys, cate)
            .agg(_CATE_FNS[fn](target).alias("__v"))
            .filter(F.col("__v").isNotNull()))


def _cate_val_str(fn: str) -> Column:
    if fn == "count":
        return F.col("__v").cast("string")
    return F.when(F.col("__v").cast("double") ==
                  F.floor("__v").cast("double"),
                  F.floor("__v").cast("long").cast("string")) \
            .otherwise(F.col("__v").cast("string"))


def _topn_cate(df: DataFrame, keys: Sequence[str], col: str | None,
               cate: str, fn: str, n: int, cond, order_cols,
               out_col: str) -> DataFrame:
    keys = list(keys)
    per_cat = _cate_per_cat(df, keys, col, cate, fn, cond)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    entry = F.concat(F.col(cate).cast("string"), F.lit(":"),
                     _cate_val_str(fn))
    ranked = (per_cat.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= n))
    return (ranked.groupBy(*keys)
            .agg(F.concat_ws(",", F.array_sort(F.collect_list(
                F.struct(F.col("__rn").alias("r"), entry.alias("e"))))
                .getField("e")).alias(out_col)))


def top_n_key_cate_agg(df: DataFrame, keys: Sequence[str],
                       col: str | None, cate: str, fn: str, n: int,
                       cond: str | Column | None = None,
                       out_col: str | None = None) -> DataFrame:
    """``top_n_key_{fn}_cate_where``: aggregate per category, keep the n
    LARGEST category keys, output "K:V,..." in DESCENDING key order
    (reference containers.h map reverse iteration; udfs_8h.md example
    "z:2,y:2")."""
    return _topn_cate(df, keys, col, cate, fn, n, cond,
                      [F.col(cate).desc()],
                      out_col or f"top{n}_key_{fn}_cate")


def top_n_value_cate_agg(df: DataFrame, keys: Sequence[str],
                         col: str | None, cate: str, fn: str, n: int,
                         cond: str | Column | None = None,
                         out_col: str | None = None) -> DataFrame:
    """``top_n_value_{fn}_cate_where``: keep the n largest aggregate
    VALUES, output in descending (value, key) order (reference
    containers.h PairCmp ascending + reverse output; the udfs_8h.md
    example output "x:3,y:2" is a doc typo — y's count-where is 1)."""
    return _topn_cate(df, keys, col, cate, fn, n, cond,
                      [F.col("__v").desc(), F.col(cate).desc()],
                      out_col or f"top{n}_value_{fn}_cate")


# -- FeatureZero window-split family (feature_zero_def.cc) -------------------

def window_split_agg(df: DataFrame, keys: Sequence[str], col: str,
                     sep: str, out_col: str = "window_split") -> Column | DataFrame:
    """``window_split``: split every string in the group and flatten into
    one list (order = input order within the group)."""
    return (df.groupBy(*list(keys))
            .agg(F.flatten(F.collect_list(F.split(F.col(col), sep)))
                 .alias(out_col)))


def window_split_by_key_agg(df: DataFrame, keys: Sequence[str], col: str,
                            item_sep: str, kv_sep: str,
                            out_col: str = "keys") -> DataFrame:
    """``window_split_by_key``: split "k1:v1,k2:v2" strings across the
    group, flatten the key parts."""
    return (df.groupBy(*list(keys))
            .agg(F.flatten(F.collect_list(F.map_keys(F.str_to_map(
                F.col(col), F.lit(item_sep), F.lit(kv_sep)))))
                .alias(out_col)))


def window_split_by_value_agg(df: DataFrame, keys: Sequence[str], col: str,
                              item_sep: str, kv_sep: str,
                              out_col: str = "values") -> DataFrame:
    """``window_split_by_value``: flatten the value parts."""
    return (df.groupBy(*list(keys))
            .agg(F.flatten(F.collect_list(F.map_values(F.str_to_map(
                F.col(col), F.lit(item_sep), F.lit(kv_sep)))))
                .alias(out_col)))
