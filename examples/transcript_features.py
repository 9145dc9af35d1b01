"""End-to-end transcript feature pipeline — the north-star workload as a
runnable example.

Builds the BASELINE.json-mandated table shape
(conv_id, turn_idx, role, text, tool, ts) from the deterministic
fixture generator, then computes the leakage-free point-in-time feature
vector the engine exists for:

1. text curation   — scrub PII, Gopher quality keep-flag + reasons
2. sessionize      — 30-min-gap session ids per conversation
3. rolling windows — 10-min ROWS_RANGE aggs (+ MAXSIZE cap) over role,
                     tool, and text-derived features
4. as-of LAST JOIN — latest conversation-meta row at or before each
                     turn (zero temporal leakage, asserted)
5. backfill        — forward-fill sparse tool labels within a session

Run locally:      python examples/transcript_features.py [out_dir]
Run on a cluster: spark-submit --py-files openmldb_spark.zip \
                      examples/transcript_features.py hdfs://.../features

Everything below is the public package API; no test helpers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmldb_spark import (
    Agg, WindowSpecFE, ffill, get_spark, last_join, sessionize,
    window_agg)
from openmldb_spark.fixtures import conv_meta_df, transcripts_df
from openmldb_spark.pipeline.text import (
    gopher_quality, scrub_pii, token_count)


def build_features(spark, n_convs=200):
    # --- input tables (swap for spark.read.table("...") in production)
    turns = transcripts_df(spark, n_convs=n_convs, max_turns=300)
    meta = conv_meta_df(spark, n_convs=n_convs)

    # --- 1. text curation: mask PII, Gopher keep-flag + failure reasons
    # (turn texts are short, so relax the doc-level token/stopword floors)
    turns = turns.withColumn("text", scrub_pii(F.col("text")))
    turns = gopher_quality(turns, min_tokens=1, min_stopword_hits=0)
    turns = turns.withColumn("n_tokens", token_count("text"))

    # --- 2. sessionize (gap-based, deterministic tie-break)
    sess = sessionize(turns, "conv_id", "ts", gap_ms=30 * 60 * 1000,
                      tiebreak=("turn_idx",))

    # --- 3. rolling point-in-time windows per conversation
    spec = WindowSpecFE(["conv_id"], "ts", frame="range",
                        start=600_000, end=0, maxsize=50,
                        tiebreak=("turn_idx",))
    feats = window_agg(sess, spec, [
        Agg("n_turns_10m", "count", "turn_idx"),
        Agg("n_user_10m", "count_where", "turn_idx",
            cond="role = 'user'"),
        Agg("n_tool_calls_10m", "count_where", "turn_idx",
            cond="tool IS NOT NULL"),
        Agg("tokens_10m", "sum", "n_tokens"),
        Agg("top_tool", "topn_frequency", "tool", n=2),
        Agg("top_role_ratio", "top1_ratio", "role"),
        Agg("prev_tool", "lag", "tool", n=1),
    ])

    # --- 4. as-of join: latest meta at or before each turn
    feats = last_join(feats, meta, on="conv_id", order_by="ts",
                      left_ts="ts", right_ts="ts", tiebreak="score")

    # --- 5. forward-fill sparse tool labels inside each session
    feats = ffill(feats, "tool", ["conv_id", "session_id"], "ts",
                  tiebreak=("turn_idx",))
    return feats


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("transcript-features")
    feats = build_features(spark)

    # zero-leakage invariant: every as-of payload is from the past
    leaks = feats.filter(F.col("ts_r") > F.col("ts")).count()
    assert leaks == 0, f"temporal leakage: {leaks} rows"

    feats.select("conv_id", "turn_idx", "session_id", "n_turns_10m",
                 "n_user_10m", "tokens_10m", "top_tool", "prev_tool",
                 "score").show(10, truncate=False)
    print(f"rows: {feats.count()}, leakage: {leaks}")
    if out_dir:
        feats.write.mode("overwrite").parquet(out_dir)
        print(f"written: {out_dir}")


if __name__ == "__main__":
    main()
