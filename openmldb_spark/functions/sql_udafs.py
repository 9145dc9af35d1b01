"""Table-level ``*_cate`` / ``top_n_*_cate`` UDAF surface for the SQL
path.

The window path computes these families inside the Arrow kernel
(operators/window_agg.py ``_SlidingMultiset``); plain GROUP BY queries
reach them through two generic grouped-agg pandas UDFs registered for
Spark SQL (Arrow transfer, ONE python call per group — no per-row
Python). Semantics and rendering mirror the reference's
agg_by_category_def.cc with v1::format_string formatting
(containers.h:242-246): categories sort in natural key order, float and
double values render ``%f`` with six decimals, integrals plain,
timestamps at the hardcoded UTC+8 display offset (udf.cc:108).

The SQL transpiler (sql.py ``_rewrite_table_udafs``) rewrites the
dialect calls to these UDFs, injecting the DECLARED column types as
literal arguments — Arrow erases int-ness when a column carries nulls,
so formatting must come from the schema, not the wire dtype.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd


def _fmt_for(t: str):
    t = (t or "").lower()
    if t in ("float", "double"):
        return lambda v: f"{float(v):.6f}"
    if t in ("smallint", "int", "bigint", "int16", "int32", "int64"):
        return lambda v: str(int(v))
    if t.startswith("timestamp"):
        def _ts(v):
            # Arrow hands timestamp keys/values over as pd.Timestamp
            # (ns), not epoch-ms ints — int(pd.Timestamp) raises
            if isinstance(v, pd.Timestamp):
                ms = v.value // 1_000_000
            elif isinstance(v, datetime.datetime):
                ms = int(v.replace(
                    tzinfo=datetime.timezone.utc).timestamp() * 1000)
            else:
                ms = int(v)
            return datetime.datetime.utcfromtimestamp(
                (ms + 28_800_000) / 1000.0).strftime("%Y-%m-%d %H:%M:%S")
        return _ts
    if t in ("bool", "boolean"):
        return lambda v: "true" if v else "false"
    return str


def _agg_one(fn: str, vals: pd.Series):
    if fn == "count":
        return int(vals.notna().sum())
    v = vals.dropna()
    if len(v) == 0:
        return None
    if fn == "sum":
        return v.sum()
    if fn == "avg":
        return float(v.mean())
    if fn == "min":
        return v.min()
    return v.max()


def _per_category(v: pd.Series, k: pd.Series, fn: str):
    ok = k.notna()
    if not bool(ok.any()):
        return None
    df = pd.DataFrame({"k": k[ok].reset_index(drop=True),
                       "v": v[ok].reset_index(drop=True)})
    out = []
    for key, grp in df.groupby("k", sort=True):
        r = _agg_one(fn, grp["v"])
        if r is None and fn != "count":
            continue
        out.append((key, r))
    return out or None


def _fmts(fn: str, vt: str, kt: str):
    vfmt = _fmt_for("double" if fn == "avg"
                    else ("bigint" if fn == "count" else vt))
    return vfmt, _fmt_for(kt)


def register_table_udafs(spark) -> None:
    """Register the generic category UDAFs (idempotent per session)."""
    if getattr(spark, "_omls_table_udafs", False):
        return
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def __omls_cate_agg(v: pd.Series, k: pd.Series, fn: pd.Series,
                        vt: pd.Series, kt: pd.Series) -> str:
        f = fn.iloc[0]
        pairs = _per_category(v, k, f)
        if pairs is None:
            # empty container renders the EMPTY STRING, not NULL
            # (containers.h OutputString:250-253 — same pin as the
            # window kernel's cate finalizer)
            return ""
        vfmt, kfmt = _fmts(f, vt.iloc[0], kt.iloc[0])
        return ",".join(f"{kfmt(key)}:{vfmt(val)}" for key, val in pairs)

    @pandas_udf("string")
    def __omls_topn_cate(v: pd.Series, k: pd.Series, fn: pd.Series,
                         vt: pd.Series, kt: pd.Series, n: pd.Series,
                         mode: pd.Series) -> str:
        f = fn.iloc[0]
        pairs = _per_category(v, k, f)
        if pairs is None:
            return ""            # empty container -> empty string
        nn = int(n.iloc[0])
        if mode.iloc[0] == "key":
            # n LARGEST keys, descending key order (containers.h map
            # reverse iteration)
            pairs = sorted(pairs, key=lambda p: p[0], reverse=True)[:nn]
        else:
            # n largest aggregate VALUES, (value, key) descending
            pairs = sorted(pairs, key=lambda p: (p[1], p[0]),
                           reverse=True)[:nn]
        vfmt, kfmt = _fmts(f, vt.iloc[0], kt.iloc[0])
        return ",".join(f"{kfmt(key)}:{vfmt(val)}" for key, val in pairs)

    # Spark rejects mixing grouped-agg pandas UDFs with JVM aggregate
    # functions in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT), so the
    # *_where family gets pandas twins used ONLY in statements that
    # also call a cate UDAF (the transpiler keeps pure *_where queries
    # on the Catalyst rewrite)
    @pandas_udf("long")
    def __omls_count(v: pd.Series) -> int:
        return int(v.notna().sum())

    @pandas_udf("double")
    def __omls_aggd(v: pd.Series, fn: pd.Series) -> float:
        f = fn.iloc[0]
        x = pd.to_numeric(v, errors="coerce").dropna()
        if len(x) == 0:
            return None
        return float({"sum": x.sum, "avg": x.mean,
                      "min": x.min, "max": x.max}[f]())

    @pandas_udf("string")
    def __omls_aggs(v: pd.Series, fn: pd.Series) -> str:
        # lexicographic min/max for string/date columns (the double
        # twin would coerce them to NaN)
        x = v.dropna()
        if len(x) == 0:
            return None
        return str(x.min() if fn.iloc[0] == "min" else x.max())

    spark.udf.register("__omls_cate_agg", __omls_cate_agg)
    spark.udf.register("__omls_topn_cate", __omls_topn_cate)
    spark.udf.register("__omls_count", __omls_count)
    spark.udf.register("__omls_aggd", __omls_aggd)
    spark.udf.register("__omls_aggs", __omls_aggs)
    spark._omls_table_udafs = True
