from openmldb_spark.fixtures.transcripts import (  # noqa: F401
    gen_transcripts,
    gen_tool_events,
    gen_conv_meta,
    transcripts_df,
    tool_events_df,
    conv_meta_df,
)
