"""End-to-end pre-training corpus curation — the LLM-data-pipeline ops
as one runnable example.

Takes a raw document corpus (the driver testdata parquet by default)
through the standard curation stages, every one of them an
oracle-gated engine operator:

1. boilerplate removal — corpus-level line_dedup (CCNet/RefinedWeb
                         stage): nav menus / cookie banners that repeat
                         across docs are dropped from every doc
2. PII scrubbing       — chained codegen'd regexp masking
3. quality filtering   — Gopher composite keep-flag (token count, word
                         length, symbol/bullet ratios, stopword hits,
                         repetition signals)
4. dedup               — exact (hash-groupBy) then MinHash+LSH near-dup
                         candidates -> n-gram Jaccard verify ->
                         connected components -> keep cluster min
5. decontamination     — shingle overlap against a benchmark slice
6. corpus mixing       — id-stable per-source sampling rates
7. train/val/test      — deterministic hash split
8. packing             — global token offsets + the doc->training-
                         sequence chunk map (pack_chunks)

Run locally:      python examples/curation_pipeline.py [sf_dir] [out_dir]
Run on a cluster: spark-submit --py-files openmldb_spark.zip \
                      examples/curation_pipeline.py s3://corpus s3://out

Everything below is the public package API; no test helpers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmldb_spark import get_spark
from openmldb_spark.pipeline import pack_chunks, pack_offsets
from openmldb_spark.pipeline.decontam import contamination_scores
from openmldb_spark.pipeline.dedup import (
    dedup_components, exact_dedup, line_dedup, minhash_lsh_pairs,
    ngram_jaccard_pairs)
from openmldb_spark.pipeline.sampling import (
    downsample_per_key, split_column)
from openmldb_spark.pipeline.text import gopher_quality, scrub_pii


def curate(spark, sf_dir: str, chunk_tokens: int = 2048):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. corpus-level boilerplate-line removal (counts by xxhash64 so
    #    only 8-byte keys shuffle; at most_occurrences=2 a line must
    #    appear in 3+ docs to be treated as boilerplate)
    docs = line_dedup(docs, "text", "doc_id", max_occurrences=2)

    # 2. PII masking — pure chained regexp_replace, no Python, no shuffle
    docs = docs.withColumn("text", scrub_pii(F.col("text")))

    # 3. Gopher quality filter (thresholds tuned for the short synthetic
    #    docs; production uses the Rae et al. defaults)
    docs = gopher_quality(docs, min_tokens=10, max_tokens=100_000,
                          min_stopword_hits=1)
    kept = docs.filter("gopher_keep").drop("gopher_keep",
                                           "gopher_reasons")

    # 4a. exact dedup: one hash-groupBy over (md5, id) — text never
    #     shuffles; keep each content group's min id
    keep_ids = exact_dedup(kept, "text", "doc_id") \
        .select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(keep_ids, "doc_id", "left_semi")
    # 4b. near-dup: MinHash signatures -> LSH band join -> n-gram
    #     Jaccard verification of the candidates -> connected
    #     components; drop every doc that is not its cluster's min id.
    #     The verify step matters: band collisions are candidates, not
    #     duplicates (this synthetic corpus draws from a tiny
    #     vocabulary, so unverified bands over-merge badly).
    cand = minhash_lsh_pairs(kept, "text", "doc_id",
                             num_hashes=64, bands=16)
    verified = (ngram_jaccard_pairs(cand, kept, "text", "doc_id")
                .filter(F.col("jaccard") >= 0.8)
                .select("id_a", "id_b"))
    comp = dedup_components(verified)
    kept = (kept.join(comp.filter("doc_id != component_id"),
                      "doc_id", "left_anti"))

    # 5. benchmark decontamination: docs overlapping the eval slice
    #    (here: doc_id < 20 stands in for a benchmark set) are dropped
    bench = kept.filter(F.col("doc_id") < 20).select("doc_id", "text")
    scores = contamination_scores(kept, bench)
    kept = (kept.join(scores.select("doc_id", "contamination"), "doc_id")
            .filter((F.col("contamination") < 0.8)
                    | (F.col("doc_id") < 20))
            .drop("contamination"))

    # 6. corpus mixing: per-source sampling rates, id-stable
    kept = downsample_per_key(kept, "doc_id", "source",
                              {"src0": 0.25, "src1": 0.5}, default=1.0)

    # 7. deterministic split (rerun/repartition-stable)
    kept = split_column(kept, "doc_id",
                        {"train": 0.9, "val": 0.05, "test": 0.05})

    # 8. pack the train split into fixed token windows; reuse the
    #    prefix-sum shuffle for the chunk map
    train = kept.filter("split = 'train'")
    offsets = pack_offsets(train, chunk_tokens=chunk_tokens)
    chunks = pack_chunks(train, chunk_tokens=chunk_tokens,
                         offsets=offsets)
    return kept, offsets, chunks


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("curation-pipeline")

    kept, offsets, chunks = curate(spark, sf_dir)
    # The curation DAG is expensive (shuffles, MinHash, Jaccard join);
    # persist before fanning out into several actions, or each count /
    # agg / write below re-runs the whole lineage from the scan.
    # (pack_offsets/pack_chunks already pin their own prefix-sum input
    # with a localCheckpoint, so only `kept` needs it.)
    kept = kept.persist()
    try:
        n_in = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_kept = kept.count()
        n_chunks = chunks.select("chunk_id").distinct().count()
        total_tokens = offsets.agg(F.sum("n_tokens")).first()[0]
        print(f"docs in: {n_in}  kept: {n_kept}  "
              f"train tokens: {total_tokens}  chunks: {n_chunks}")
        print(kept.groupBy("split").count().orderBy("split").collect())

        if out:
            kept.write.mode("overwrite").partitionBy("split") \
                .parquet(f"{out}/documents")
            chunks.write.mode("overwrite").parquet(f"{out}/chunk_map")
    finally:
        kept.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
