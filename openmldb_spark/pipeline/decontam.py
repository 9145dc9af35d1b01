"""Benchmark decontamination: n-gram overlap of a training corpus
against a (small) evaluation/benchmark set.

The standard LLM-training-data hygiene pass: a training document whose
character shingles overlap an eval benchmark above a threshold leaks
the benchmark into training. Scale shape for 100 TB:

- the BENCHMARK side is small (eval sets are 10^3-10^6 docs) — its
  distinct shingle-hash set is computed once with the same Arrow kernel
  and broadcast as ONE sorted uint64 array (8 B/shingle; a guard raises
  if it exceeds ``bench_cap`` hashes rather than OOM the executors);
- the CORPUS side streams: one ``mapInPandas`` kernel pass per batch
  computes each doc's distinct shingle hashes (the same whole-batch
  byte-buffer rolling-polynomial vectorization as the minhash kernel —
  zero per-row Python) and membership-tests them against the broadcast
  set with a single ``searchsorted``. No shuffle, no join, nothing
  leaves its partition.

Shingle hash = base-257 rolling polynomial over the normalized utf-8
bytes mod 2^31-1 — the exact formulation the minhash kernel uses
(dedup.py) and the DuckDB driver oracle re-renders, so contamination
counts are integer-exact across engines.

Reference counterpart: none (OpenMLDB has no corpus-hygiene surface);
this is one of the beyond-reference training-data operators the task
brief lists under deduplication/text analysis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2147483647                   # 2^31 - 1, matches dedup._P


def _batch_shingle_hashes(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Distinct rolling-poly shingle hashes per doc — the SAME shared
    vectorized core as the minhash kernel (dedup._batch_window_hashes:
    one concatenated byte buffer, ``k`` strided passes, ragged
    segmentation) with a per-doc ``np.unique`` instead of permutation
    minima. Sharing the core keeps the DuckDB oracle arithmetic
    bit-identical across dedup and decontamination."""
    from openmldb_spark.pipeline.dedup import _batch_window_hashes

    (n_docs, short, short_h, long_idx, hs, starts,
     ends) = _batch_window_hashes(texts, k)
    out: list[np.ndarray | None] = [None] * n_docs
    for c, i in enumerate(short):        # rare path: whole-doc fallback
        out[i] = short_h[c:c + 1]
    for c, i in enumerate(long_idx):
        out[i] = np.unique(hs[starts[c]:ends[c]])
    return out


def benchmark_hash_set(bench: DataFrame, text_col: str = "text",
                       shingle: int = 8,
                       bench_cap: int = 50_000_000) -> np.ndarray:
    """The benchmark's distinct shingle hashes as ONE sorted uint64
    array — the broadcastable side. Raises if the set exceeds
    ``bench_cap`` (8 B each; the cap bounds executor broadcast memory,
    and a benchmark that large is a corpus, not an eval set)."""
    from pyspark.sql.functions import pandas_udf

    k = shingle

    @pandas_udf("array<bigint>")
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series([h.astype(np.int64)
                          for h in _batch_shingle_hashes(texts, k)])

    # limit(cap+1) BEFORE the fetch so an over-cap benchmark raises
    # after pulling cap+1 rows, never after materializing the full set
    # on the driver; Arrow toPandas avoids per-row Row-object overhead
    hs = (bench.select(F.explode(sh(F.col(text_col))).alias("h"))
          .distinct().limit(bench_cap + 1)
          .toPandas()["h"].to_numpy(dtype=np.int64))
    if len(hs) > bench_cap:
        raise ValueError(f"benchmark shingle set > bench_cap={bench_cap}")
    return np.sort(hs.view(np.uint64))


def contamination_scores(docs: DataFrame, bench: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle: int = 8,
                         bench_cap: int = 50_000_000) -> DataFrame:
    """(id, n_shingles, n_contaminated, contamination) per corpus doc:
    the fraction of the doc's DISTINCT shingles present anywhere in the
    benchmark. Filter ``contamination >= threshold`` downstream."""
    bset = benchmark_hash_set(bench, text_col, shingle, bench_cap)
    bc = docs.sparkSession.sparkContext.broadcast(bset)
    k = shingle
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, n_shingles int, "
              f"n_contaminated int, contamination double")

    def batches(it):
        bs = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            hlist = _batch_shingle_hashes(pdf[text_col], k)
            n = np.fromiter((len(h) for h in hlist), dtype=np.int64,
                            count=len(hlist))
            allh = (np.concatenate(hlist) if len(hlist)
                    else np.empty(0, np.uint64))
            # one membership pass for the whole batch
            idx = np.searchsorted(bs, allh)
            idx[idx >= len(bs)] = max(len(bs) - 1, 0)
            hit = ((bs[idx] == allh) if len(bs) else
                   np.zeros(len(allh), dtype=bool)).astype(np.int64)
            ends = np.cumsum(n)
            c = np.add.reduceat(hit, ends - n) if len(allh) else \
                np.zeros(0, dtype=np.int64)
            c = np.where(n > 0, c, 0)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "n_shingles": n.astype(np.int32),
                "n_contaminated": c.astype(np.int32),
                "contamination": np.where(n > 0, c / np.maximum(n, 1),
                                          0.0),
            })

    return docs.select(id_col, text_col).mapInPandas(batches, schema)
