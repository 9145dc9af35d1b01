from openmldb_spark.jobs.checkpoint import CheckpointedJob  # noqa: F401
