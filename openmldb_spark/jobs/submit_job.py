"""Example production entrypoint — the ``spark-submit --py-files`` shape.

Package the library and submit::

    cd /root/repo && zip -qr /tmp/openmldb_spark.zip openmldb_spark
    spark-submit --master <cluster> \\
        --py-files /tmp/openmldb_spark.zip \\
        openmldb_spark/jobs/submit_job.py \\
        --input /data/events --checkpoint /ckpt --output /out/features

The job itself is the north-star feature pipeline expressed as
checkpointed stages: sessionize → rolling window features → as-of join of
the latest prior purchase. Each stage is resumable (``CheckpointedJob``),
and on a real cluster identical code runs unchanged — only ``--master``
and the paths move.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def build(spark, input_path: str, checkpoint: str, output: str,
          gap_ms: int = 30 * 60 * 1000, window_ms: int = 3_600_000):
    from openmldb_spark import (
        Agg, WindowSpecFE, last_join, sessionize, window_agg)
    from openmldb_spark.jobs import CheckpointedJob

    job = CheckpointedJob(spark, checkpoint, "feature_backfill")

    job.stage("events", lambda s: s.read.parquet(input_path))

    def s_sessions(s, ev):
        return sessionize(ev, "user_id", "ts", gap_ms=gap_ms,
                          tiebreak=("event_id",))

    def s_window(s, sess):
        spec = WindowSpecFE(["user_id"], "ts", frame="range",
                            start=window_ms, end=0, peer="sql")
        return window_agg(sess, spec, [
            Agg("cnt_w", "count", "value"),
            Agg("sum_w", "sum", "value"),
            Agg("avg_w", "avg", "value"),
            Agg("prev_value", "lag", "value", n=1),
        ])

    def s_asof(s, feats, ev):
        purchases = ev.filter(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "event_id", "value")
        return last_join(feats, purchases, on="user_id", order_by="ts",
                         left_ts="ts", right_ts="ts", tiebreak="event_id")

    job.stage("sessions", s_sessions, deps=["events"])
    job.stage("window_feats", s_window, deps=["sessions"])
    job.stage("features", s_asof, deps=["window_feats", "events"])

    out = job.run()["features"]
    out.write.mode("overwrite").parquet(output)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from openmldb_spark import get_spark
    spark = get_spark("feature_backfill")
    build(spark, args.input, args.checkpoint, args.output)


if __name__ == "__main__":
    main()
