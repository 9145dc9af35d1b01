"""Similarity search over an embedding column (``array<float>``).

- ``brute_force_topk`` — exact cosine top-k: the query set (small side)
  is broadcast as a numpy matrix; the corpus streams through an Arrow
  ``mapInPandas`` kernel doing one float64 matmul + per-batch top-k per
  Arrow batch. Only partitions × |Q| × k candidate rows reach the final
  global rank — the corpus never shuffles. The baseline; exact; scales
  linearly in corpus size with full parallelism.
- ``lsh_bucketed_topk`` — approximate: random-hyperplane signatures put
  corpus and queries into Hamming buckets; candidates are drawn from the
  query's bucket plus its 1-bit neighbor buckets (multi-probe), then
  exact-scored. Turns the O(Q×N) scan into O(Q×N/2^planes × probes) —
  the scale path for large Q.
- ``ivf_topk`` — approximate (IVF flat): a deterministic spherical
  k-means over a bounded hash-sample trains ``n_cells`` coarse
  centroids on the driver; every corpus vector is kernel-assigned to
  its nearest cell (one Arrow pass, centroids broadcast), each query
  probes its ``nprobe`` nearest cells, and candidates are exact-scored.
  ``nprobe = n_cells`` degenerates to the exact scan — the equivalence
  the driver oracle pins — while ``nprobe ≪ n_cells`` is the scale
  path: O(Q×N×nprobe/n_cells) scoring, data-adaptive cells (unlike
  LSH's data-oblivious planes, IVF keeps recall on clustered corpora).

Vectors are computed in float64 so results are stable across platforms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _cosine(a: Column, b: Column) -> Column:
    # zero-norm vectors have no direction: cosine is NULL, never a
    # NaN that Spark's desc sort would rank above every real value
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _dot(a, b) / den)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine).

    The query set (small side — same constraint as a broadcast join) is
    collected to numpy and shipped to executors; the corpus streams
    through an Arrow ``mapInPandas`` kernel doing ONE float64 matmul per
    batch and a per-batch top-k (argpartition), so only
    partitions × |Q| × k candidate rows reach the final global rank —
    the corpus itself never shuffles. Catalyst ``zip_with``/``aggregate``
    dot products are interpreted (CodegenFallback) and measured ~10x
    slower. Ties broken by neighbor id ascending.
    """
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not q_rows:
        raise ValueError("empty query set")
    qids = np.array([r[0] for r in q_rows])
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    # zero-norm -> all-zero unit row -> cosine 0 (not NaN, which would
    # outrank every real cosine in Spark's desc ordering)
    qm = qm / np.where(qn == 0, np.inf, qn)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qm))

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (f"query_id {id_type}, neighbor_id {id_type}, "
                  f"cosine double")

    def batches(it):
        b_qids, b_qm = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            cm = np.stack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            cm = cm / np.where(cn == 0, np.inf, cn)   # zero-norm -> 0
            sims = cm @ b_qm.T                        # (n, q)
            nids = pdf[id_col].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                s = sims[:, j]
                mask = np.ones(len(s), dtype=bool)
                if exclude_self:
                    mask = nids != b_qids[j]
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                kk = min(k, len(idx))
                # top-k by (sim desc, id asc); full lexsort — batches are
                # Arrow-bounded (≤65536 rows) so this is cheap and exact
                # under sim ties at the k boundary
                order = idx[np.lexsort((nids[idx], -s[idx]))][:kk]
                out_q.extend([b_qids[j]] * len(order))
                out_n.extend(nids[order])
                out_s.extend(s[order])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "cosine": out_s})

    cand = corpus.select(id_col, vec_col).mapInPandas(batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


_M64 = 0xFFFFFFFFFFFFFFFF


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def plane_matrix(num_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane coefficients in [-1, 1): pure-Python
    splitmix64 over (seed, plane, dim-index) — identical on every
    executor and reproducible in an external oracle by inlining the
    resulting doubles (no RNG state, no engine-specific hash)."""
    out = np.empty((num_planes, dim), dtype=np.float64)
    for p in range(num_planes):
        for j in range(dim):
            h = _splitmix64((seed * 0x9E3779B97F4A7C15
                             + p * 1_000_003 + j) & _M64)
            out[p, j] = (h % 1000) / 500.0 - 1.0
    return out


def hyperplane_bucket_udf(num_planes: int, seed: int):
    """Arrow-vectorized hyperplane bucketing (replaces an interpreted
    zip_with/aggregate Catalyst HOF chain that was CodegenFallback and
    measured ~10-40x slower on sibling ops — VERDICT r1 #7).

    The per-plane dot product accumulates dimension-by-dimension (a
    sequential left fold) so an external SQL oracle using the same fold
    order reproduces the sign bit-for-bit.
    """
    from pyspark.sql.functions import pandas_udf

    if not 1 <= num_planes <= 31:
        # bucket ids are int32 and multiprobe flips single bits with
        # (1 << p) int literals; 32+ planes would silently wrap the
        # bucket id and collapse recall
        raise ValueError(f"num_planes must be in [1, 31], got "
                         f"{num_planes}")

    pm_cache: dict[int, np.ndarray] = {}

    @pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        # the plane matrix is deterministic in (num_planes, dim, seed);
        # build it once per executor, not once per Arrow batch (the
        # pure-Python splitmix fill is O(planes x dim) Python calls)
        pm = pm_cache.get(v.shape[1])
        if pm is None:
            pm = pm_cache[v.shape[1]] = plane_matrix(
                num_planes, v.shape[1], seed)
        acc = np.zeros((len(vecs), num_planes))
        for j in range(v.shape[1]):
            acc += v[:, j:j + 1] * pm[:, j]
        bits = ((acc > 0) * (1 << np.arange(num_planes))).sum(axis=1)
        return pd.Series(bits.astype(np.int32))

    return bucket


def cosine_pairs_udf():
    """Arrow-vectorized cosine over two array columns (candidate-pair
    scoring) — one stacked numpy pass per batch, float64 throughout."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        am = np.stack([np.asarray(x, dtype=np.float64) for x in a])
        bm = np.stack([np.asarray(x, dtype=np.float64) for x in b])
        num = (am * bm).sum(axis=1)
        den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        # zero-norm pairs score 0, not NaN (NaN sorts ABOVE all reals
        # in Spark desc ordering and would hijack every top-k)
        return pd.Series(np.divide(num, den,
                                   out=np.zeros_like(num),
                                   where=den != 0))

    return cos


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      num_planes: int = 4, multiprobe: bool = True,
                      seed: int = 42,
                      exclude_self: bool = True) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH buckets.

    Each query probes its own bucket and (optionally) every 1-bit-flip
    neighbor bucket; candidates are exact-scored and ranked. Recall
    improves with ``multiprobe`` and fewer planes; cost improves with
    more planes — size ``num_planes ≈ log2(corpus_rows / target_bucket)``
    so buckets stay small enough that within-bucket candidate joins
    never go quadratic (e.g. 20 planes for 10^9 rows at ~1k/bucket).

    Bucketing and scoring run in Arrow kernels (hyperplane_bucket_udf /
    cosine_pairs_udf) — no interpreted Catalyst HOFs on the hot path.
    """
    b = hyperplane_bucket_udf(num_planes, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cvec"),
                      b(F.col(vec_col)).alias("bucket"))
    probes = [F.col("__qb")]
    if multiprobe:
        probes += [F.col("__qb").bitwiseXOR(F.lit(1 << p))
                   for p in range(num_planes)]
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qvec"),
                       b(F.col(vec_col)).alias("__qb"))
    q = q.select("query_id", "__qvec",
                 F.explode(F.array(*probes)).alias("bucket"))
    joined = c.join(F.broadcast(q), "bucket")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = cosine_pairs_udf()
    scored = joined.select(
        "query_id", "neighbor_id",
        cos(F.col("__qvec"), F.col("__cvec")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def kmeans_cells(sample: np.ndarray, n_cells: int, seed: int = 42,
                 n_iter: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (driver-side) over a bounded
    sample — the IVF coarse quantizer. No RNG state: initial centroids
    are sample rows at splitmix64-derived indices, Lloyd runs a FIXED
    ``n_iter`` sweeps, empty cells re-seed with the point worst-served
    by the current centroids (deterministic argmin). All float64, so
    the trained cells are bit-stable across runs and platforms.

    Sample rows must arrive in a deterministic order (ivf_topk sorts by
    id before calling) — k-means is init-order sensitive.
    """
    n = len(sample)
    if n == 0:
        raise ValueError("empty k-means sample")
    n_cells = min(n_cells, n)
    s = sample.astype(np.float64)
    s = s / np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-12)
    idx, used = [], set()
    j = 0
    while len(idx) < n_cells:
        h = _splitmix64((seed * 0x9E3779B97F4A7C15 + j * 1_000_003)
                        & _M64) % n
        if h not in used:
            used.add(h)
            idx.append(h)
        j += 1
    cent = s[np.array(idx)]
    for _ in range(n_iter):
        sims = s @ cent.T                      # (n, k) cosine
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, s)
        counts = np.bincount(assign, minlength=n_cells)
        empty = np.nonzero(counts == 0)[0]
        if len(empty):
            # re-seed each empty cell with the currently worst-served
            # points (lowest best-sim), one per cell, deterministically
            worst = np.argsort(sims.max(axis=1))[: len(empty)]
            new[empty] = s[worst]
            counts[empty] = 1
        cent = new / np.maximum(
            np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """Arrow-vectorized nearest-cell assignment: one matmul per batch
    against the broadcast (closure-captured) centroid matrix, returning
    the ``nprobe`` nearest cell ids ordered best-first."""
    from pyspark.sql.functions import pandas_udf

    cm = centroids.astype(np.float64)
    npb = min(nprobe, len(cm))

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                           1e-12)
        sims = v @ cm.T
        # top-nprobe cells, best first; ties by cell id ascending
        order = np.lexsort((np.broadcast_to(np.arange(sims.shape[1]),
                                            sims.shape), -sims), axis=1)
        top = order[:, :npb].astype(np.int32)
        return pd.Series(list(top))

    return cells


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 16, nprobe: int = 2, seed: int = 42,
             sample_mod: int = 1, sample_cap: int = 200_000,
             n_iter: int = 10, exclude_self: bool = True) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file, flat scoring).

    Scale shape (100 TB): centroid training reads a BOUNDED hash-sample
    (size corpus/``sample_mod``, hard-capped at ``sample_cap`` — raise
    ``sample_mod`` for big corpora; the cap raises loudly rather than
    OOM the driver); assignment is one Arrow pass with the (n_cells ×
    dim) centroid matrix closure-shipped; the candidate join is an
    equi-join on the cell id with the exploded query probes broadcast —
    the corpus itself NEVER shuffles, and only |Q| × nprobe × cell-size
    candidate rows are scored and ranked. Size ``n_cells ≈ N / 10^5``
    so cells stay scan-sized; recall tuning is ``nprobe``.

    ``nprobe >= n_cells`` probes every cell and is EXACTLY the brute
    force result (each corpus row lives in exactly one cell) — pinned
    against the DuckDB exact-top-k oracle as the ``ivf_topk`` driver
    query; small-``nprobe`` recall is pinned in tests/test_pipeline.py.
    """
    samp = corpus.select(F.col(id_col), F.col(vec_col))
    if sample_mod > 1:
        samp = samp.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                   F.lit(sample_mod)) == 0)
    rows = samp.limit(sample_cap + 1).collect()
    if len(rows) > sample_cap:
        raise ValueError(
            f"k-means sample exceeds sample_cap={sample_cap}; raise "
            f"sample_mod so the driver-side sample stays bounded")
    rows.sort(key=lambda r: r[0])          # deterministic init order
    sample = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    cent = kmeans_cells(sample, n_cells, seed, n_iter)

    one = ivf_assign_udf(cent, 1)
    probe = ivf_assign_udf(cent, nprobe)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cvec"),
                      F.element_at(one(F.col(vec_col)), 1).alias("cell"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qvec"),
                       F.explode(probe(F.col(vec_col))).alias("cell"))
    joined = c.join(F.broadcast(q), "cell")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = cosine_pairs_udf()
    scored = joined.select(
        "query_id", "neighbor_id",
        cos(F.col("__qvec"), F.col("__cvec")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))
