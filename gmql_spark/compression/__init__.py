from gmql_spark.compression.gorilla import (  # noqa: F401
    compress_series,
    decode_timestamps,
    decode_values,
    decompress_series,
    encode_timestamps,
    encode_values,
)
