"""Deterministic dataset sampling / splitting for training pipelines.

A 100 TB corpus cannot use stateful samplers (reservoirs, RNG streams):
any re-run, re-partition, or partial backfill must land every row in the
same split. These operators derive all randomness from a splitmix64 of
the row's OWN id (plus a seed literal), so assignment is

- **stable**: a row keeps its split across runs, partitionings, engine
  versions, and cluster sizes (no RNG state, no ordering dependence);
- **join-free**: one Arrow kernel pass per row — no shuffle, no lookup
  table, nothing broadcast;
- **exactly reproducible outside Spark**: the same arithmetic renders
  as HUGEINT SQL (the DuckDB driver oracles inline it), so downstream
  consumers can re-derive membership without this library.

Reference counterpart: OpenMLDB has no sampling surface (its offline
runs are full-table); these are the beyond-reference training-data ops
the task brief lists. Semantics modeled on the standard hash-split
used by large-scale data pipelines.

- ``split_column(df, id_col, weights)`` — adds a ``split`` string
  column ('train'/'val'/... ) by cumulative thresholds on
  ``splitmix64(id ^ seed-fold) mod 1e6``.
- ``downsample(df, id_col, fraction)`` — keeps a deterministic,
  id-stable ``fraction`` of rows (same hash, one threshold).
- ``cap_per_key(df, keys, n)`` — keeps at most ``n`` rows per key,
  chosen by deterministic hash order of a row id (or an explicit
  order column): a uniform per-key subsample that never materializes
  more than a row_number window per key partition.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GOLDEN = 0x9E3779B97F4A7C15
_M64 = 0xFFFFFFFFFFFFFFFF
_RES = 1_000_000            # threshold resolution: hash mod 1e6


def _splitmix_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 — the same arithmetic the
    DuckDB oracles render with HUGEINT mod-2^64 ops. Single definition
    shared with the minhash band hashes (dedup._splitmix_vec)."""
    from openmldb_spark.pipeline.dedup import _splitmix_vec
    return _splitmix_vec(x)


def split_hash_udf(seed: int):
    """Arrow kernel: ``splitmix64(id + seed * GOLDEN) mod 1e6`` as int.

    Runs on the id column only — one uint64 vector op per batch; rows
    never leave their partitions.
    """
    from pyspark.sql.functions import pandas_udf

    s = np.uint64((seed * _GOLDEN) & _M64)

    @pandas_udf("int")
    def h(ids: pd.Series) -> pd.Series:
        if len(ids) == 0:
            return pd.Series([], dtype="int32")
        x = ids.to_numpy(dtype="int64").view(np.uint64) + s
        return pd.Series((_splitmix_np(x) % np.uint64(_RES))
                         .astype(np.int32))

    return h


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds over the 1e6 hash space, in the
    dict's insertion order (deterministic; the last split absorbs the
    rounding remainder so every row lands somewhere)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    out, acc = [], 0.0
    names = list(weights)
    for i, name in enumerate(names):
        acc += weights[name] / total
        hi = _RES if i == len(names) - 1 else int(round(acc * _RES))
        out.append((name, hi))
    return out


def split_column(df: DataFrame, id_col: str,
                 weights: dict[str, float], seed: int = 42,
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test (or any mixture) assignment."""
    h = split_hash_udf(seed)(F.col(id_col))
    expr = None
    for name, hi in split_thresholds(weights):
        cond = h < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def downsample(df: DataFrame, id_col: str, fraction: float,
               seed: int = 42) -> DataFrame:
    """Keep an id-stable ``fraction`` of rows — unlike ``df.sample``,
    membership survives re-runs, repartitions, and incremental loads
    (a row added tomorrow doesn't reshuffle today's sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = int(round(fraction * _RES))
    return df.filter(split_hash_udf(seed)(F.col(id_col)) < F.lit(thr))


def downsample_per_key(df: DataFrame, id_col: str, key_col: str,
                       fractions: dict[str, float],
                       default: float = 1.0, seed: int = 42) -> DataFrame:
    """Per-key sampling rates — the corpus-mixing primitive (keep 100%
    of wiki, 30% of common-crawl, ...). Same id-stable splitmix hash as
    ``downsample``, with the threshold chosen by ``key_col``: join-free,
    one codegen'd filter, membership independent of partitioning and of
    other keys' volumes. Keys absent from ``fractions`` keep
    ``default``."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default must be in [0, 1]")
    thr = None
    for k, f in fractions.items():
        hi = F.lit(int(round(f * _RES)))
        cond = F.col(key_col) == F.lit(k)
        thr = F.when(cond, hi) if thr is None else thr.when(cond, hi)
    thr = F.lit(int(round(default * _RES))) if thr is None \
        else thr.otherwise(F.lit(int(round(default * _RES))))
    return df.filter(split_hash_udf(seed)(F.col(id_col)) < thr)


def cap_per_key(df: DataFrame, keys: Sequence[str], n: int,
                id_col: str | None = None,
                order_col: str | None = None,
                seed: int = 42) -> DataFrame:
    """At most ``n`` rows per key. With ``order_col``, keeps the first
    ``n`` by that order (e.g. newest-first history truncation); else a
    deterministic uniform choice ordered by ``splitmix64(id)`` — the
    hot-key mitigation for pair-generating ops (cap a skewed user's
    rows before a self-join instead of salting after).

    One hash-partitioned window per key group; the kernel never holds
    more than a partition. Ties under ``order_col`` break by id hash
    (or, without an id_col, by a whole-row hash) so the kept set is
    deterministic across runs, partitionings, and AQE replans.
    """
    if order_col is None and id_col is None:
        raise ValueError("need order_col or id_col")
    cols = []
    if order_col is not None:
        cols.append(F.col(order_col).asc())
    if id_col is not None:
        cols.append(split_hash_udf(seed)(F.col(id_col)).asc())
        cols.append(F.col(id_col).asc())      # total order under ties
    else:
        # no id: total order via a whole-row hash — rows equal in every
        # column are interchangeable, so this is deterministic up to
        # true duplicates
        cols.append(F.xxhash64(*[F.col(c) for c in df.columns]).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*cols)
    return (df.withColumn("__cap_rn", F.row_number().over(w))
            .filter(F.col("__cap_rn") <= n)
            .drop("__cap_rn"))


def _mulmod_sql(x: str, c: int) -> str:
    """``(x * c) mod 2^64`` in DuckDB HUGEINT (INT128) arithmetic via
    32-bit limb decomposition — a direct 64x64 multiply overflows
    INT128. ``c`` is a compile-time constant, so its limbs inline."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    b32 = "4294967296::HUGEINT"
    m = "18446744073709551616::HUGEINT"          # 2^64
    xl = f"(({x}) % {b32})"
    xh = f"(({x}) // {b32})"
    mid = f"(({xl} * {c_hi}::HUGEINT + {xh} * {c_lo}::HUGEINT) % {b32})"
    return f"(({xl} * {c_lo}::HUGEINT + {mid} * {b32}) % {m})"


def splitmix_sql(expr: str, seed: int = 42) -> str:
    """Render the SAME splitmix64-mod-1e6 as DuckDB HUGEINT SQL over a
    non-negative BIGINT column expression — used by the driver oracles
    so an external engine reproduces split membership bit-for-bit."""
    m = "18446744073709551616::HUGEINT"          # 2^64
    s = (seed * _GOLDEN) & _M64
    x = f"((({expr})::HUGEINT + {s}::HUGEINT + {_GOLDEN}::HUGEINT) % {m})"
    z1 = _mulmod_sql(f"xor({x}, ({x}) >> 30)", 0xBF58476D1CE4E5B9)
    z2 = _mulmod_sql(f"xor({z1}, ({z1}) >> 27)", 0x94D049BB133111EB)
    return f"CAST(xor({z2}, ({z2}) >> 31) % 1000000::HUGEINT AS INT)"
