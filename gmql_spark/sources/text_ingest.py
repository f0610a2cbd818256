"""Strict text-format ingest: CSV/TSV logs -> typed transcript rows.

The reference ingests delimited text with hand-rolled strict parsers
that RAISE on malformed lines (``GMQL-Spark .../loaders/BedParser.scala:
64-207``: a bad coordinate throws ``ParsingException`` instead of
silently skipping). The engine's native format is parquet (SURVEY
§2.1), but raw transcript logs arrive as delimited text; this module is
the missing pre-convert step with the same loudness contract,
recast onto Spark's CSV reader modes:

- ``mode='strict'`` (default) = FAILFAST: any malformed line or type
  mismatch fails the job with the offending record in the error — the
  BedParser contract.
- ``mode='quarantine'`` = PERMISSIVE + ``columnNameOfCorruptRecord``:
  well-formed rows flow through, malformed ones land in a side output
  the caller must handle (returned as a second DataFrame) — the
  bounded-blast-radius variant for multi-TB backfills where one bad
  shard must not kill a day of compute. The split is one pass (both
  outputs filter the same cached parse), and the counts are the
  caller's to assert on.

Schema is explicit and REQUIRED — inference samples the input (an extra
scan at scale) and silently widens types; a strict ingest must pin
types up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_CSV_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts_csv(
    spark: SparkSession,
    path: str,
    schema: str = TRANSCRIPT_CSV_SCHEMA,
    mode: str = "strict",
    sep: str = ",",
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Read delimited transcript logs with strict typing.

    ``mode='strict'`` returns one DataFrame and the job FAILS on the
    first malformed record (Spark FAILFAST). ``mode='quarantine'``
    returns ``(good, bad)``: ``bad`` holds the raw text of every
    malformed line (``_corrupt_record``), ``good`` the typed rows.
    """
    if mode not in ("strict", "quarantine"):
        raise ValueError("mode must be strict|quarantine")
    opts = {
        "header": str(header).lower(),
        "sep": sep,
        # strict typing: empty string is NOT a valid int/timestamp
        "nullValue": "",
    }
    if timestamp_format:
        opts["timestampFormat"] = timestamp_format
    if mode == "strict":
        return (
            spark.read.options(**opts)
            .option("mode", "FAILFAST")
            .schema(schema)
            .csv(path)
        )
    full_schema = schema + ", _corrupt_record string"
    df = (
        spark.read.options(**opts)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full_schema)
        .csv(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
