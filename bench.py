"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's headline operators on local[$SPARK_GRAFT_CPUS] and
prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "throughput_turns_per_sec": N}

Execution is forced with a noop-format write (full computation, no
driver-side collect). Each query is timed end-to-end including the scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from openmldb_spark import get_spark  # noqa: E402

# headline set: the two signature operators (window, as-of join), one
# kernel-path frame, sessionization, group/join aggregation, and the
# training-data pipeline ops
HEADLINE = [
    "window_range",
    "window_rows",
    "window_maxsize",
    "last_join_asof",
    "sessionize",
    "backfill",
    "pricing_summary",
    "join_agg_revenue",
    "topn_frequency",
    "dedup_exact",
    "minhash_pairs",
    "text_features",
    "embed_knn",
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # row count of the primary table → turns/sec figure
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # steady-state measurement: first run pays one-time plan analysis +
    # whole-stage-codegen JIT (~5-20s per distinct plan shape, independent
    # of data volume). Then k>=3 timed rounds, INTERLEAVED round-robin
    # across queries so a co-tenant noise window (this host shows 1.3-3x
    # bursts, BENCH_SCALING.json) cannot poison all samples of one query.
    # Every sample is recorded; the point estimate is the MIN (standard
    # noisy-host estimator); a query whose sample spread exceeds 1.5x is
    # flagged noisy so round-over-round comparison can discount it
    # (VERDICT r2 #2: r2's min-of-2 recorded a bogus 15x outlier).
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(2):                      # warmup x2, un-timed: one
        # pass leaves the FIRST timed round systematically ~2-3x slow
        # (whole-stage-codegen JIT still settling), which flagged most
        # queries "noisy" and drowned the real co-tenant signal
        for name in names:
            force(qs[name](spark, sf_dir))
            spark.catalog.clearCache()      # minhash persists signatures
    for _ in range(rounds):
        for name in names:
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            samples[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    times = {n: min(s) for n, s in samples.items()}
    noisy = sorted(n for n, s in samples.items()
                   if min(s) > 0 and max(s) / min(s) > 1.5)

    total = round(sum(times.values()), 3)
    # throughput: per-event feature queries processed events/sec
    feature_queries = ["window_range", "window_rows", "window_maxsize",
                       "last_join_asof", "sessionize", "backfill"]
    feat_time = sum(times[q] for q in feature_queries if q in times)
    thr = round(n_events * sum(1 for q in feature_queries if q in times)
                / feat_time, 1) if feat_time > 0 else None

    print(json.dumps({
        "metric": "headline_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "samples": samples,
        "noisy_queries": noisy,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "throughput_turns_per_sec": thr,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }))


if __name__ == "__main__":
    main()
