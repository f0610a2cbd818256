from gmql_spark.streaming.rollup_stream import stream_rollup  # noqa: F401
