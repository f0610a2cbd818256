from gmql_spark.streaming.ingest_stream import stream_ingest  # noqa: F401
from gmql_spark.streaming.rollup_stream import stream_rollup  # noqa: F401
from gmql_spark.streaming.session_stream import stream_sessionize  # noqa: F401
