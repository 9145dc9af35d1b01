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
