"""Streaming ingestion into tables.

The reference has NO streaming operators (SURVEY.md §2.8): streams reach
it through Kafka/Pulsar/RocketMQ connectors that append into tables
(extensions/kafka-connect-jdbc/, java/openmldb-spark-connector/), and
every query runs against tables. Our equivalent is Structured Streaming
appending micro-batches into the parquet warehouse — same architecture,
Spark-native: the batch operators (window_agg / last_join / ...) then
run over the continuously-growing table.

``foreachBatch`` is used (not a direct file sink) so each micro-batch
can be deduplicated against the watermark and written through the same
``Warehouse`` layout contract the batch side reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_ingest(stream_df: DataFrame, warehouse, table: str,
                  ts_col: str = "ts", watermark: str = "10 minutes",
                  dedup_keys: list[str] | None = None,
                  checkpoint_dir: str | None = None,
                  trigger_seconds: int | None = None):
    """Append a stream into ``warehouse`` table ``table``.

    - late data beyond ``watermark`` is dropped (watermark on ``ts_col``),
    - ``dedup_keys`` deduplicates within the watermark window
      (``dropDuplicates`` with watermark = exactly-once-ish ingestion for
      at-least-once sources),
    - each micro-batch appends through the Warehouse parquet layout.

    Returns the StreamingQuery (caller stops it / awaits termination).
    """
    s = stream_df.withWatermark(ts_col, watermark)
    if dedup_keys:
        # state must be watermark-bounded or the dedup store grows one
        # entry per distinct key FOREVER: dropDuplicatesWithinWatermark
        # evicts expired keys (Spark 3.5+); on older Spark the
        # event-time column must be part of the dedup key for eviction
        # to apply
        if hasattr(s, "dropDuplicatesWithinWatermark"):
            s = s.dropDuplicatesWithinWatermark(dedup_keys)
        else:                                       # pragma: no cover
            s = s.dropDuplicates(list(dedup_keys) + [ts_col])

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        warehouse.write(batch_df, table, mode="append")

    w = s.writeStream.foreachBatch(write_batch) \
        .outputMode("append")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()
