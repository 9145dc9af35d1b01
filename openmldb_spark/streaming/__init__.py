from openmldb_spark.streaming.ingest import stream_ingest  # noqa: F401
from openmldb_spark.streaming.features import (  # noqa: F401
    streaming_window_counts, streaming_sessions)
from openmldb_spark.streaming.stateful import (  # noqa: F401
    streaming_rolling_features)
