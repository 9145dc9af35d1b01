"""SparkSession factory with the engine's tuned defaults.

Local sandbox runs on local[N]; the same configs are what we would submit
with ``spark-submit --py-files openmldb_spark.zip job.py`` on a real
multi-executor cluster (see jobs/submit_job.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale: AQE on (runtime coalesce + skew-join splits),
# Arrow for every pandas kernel crossing, UTC so oracle comparisons are
# timezone-stable (reference computes on int64 UTC milliseconds —
# SURVEY.md §1.2).
_BASE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size bounds per-kernel memory at scale.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # At 100 TB this comes from cluster sizing; locally ~cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Always use the sort-based (Unsafe) shuffle writer. Below the
    # default threshold (200 reducers) Spark picks the bypass writer,
    # which creates one file per (map task x reducer); those
    # O(M*R) file creates serialize on the filesystem journal and were
    # the flattest-scaling component of the whole engine (measured
    # round 5: a 64-map x 128-reduce exchange of 6M rows dropped
    # 2.5s -> 0.43s at 32 cores, 3.4s -> 1.0s at 8). The sort writer
    # radix-sorts partition ids in memory and writes ONE file per map
    # task — the same shape it uses above 200 reducers at cluster scale.
    "spark.shuffle.sort.bypassMergeThreshold": "1",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(app: str = "openmldb_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = SparkSession.builder.appName(app).master(master)
    for k, v in {**_BASE_CONF, **(extra_conf or {})}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
