"""North-rule invariants: per-turn text byte-equality through the
storage layer, and file-layout insensitivity of rollup results
(FIXTURES.md §4, mirroring the reference's bin-size-invariance sweeps
``conf/test_map.xml:3-9``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gmql_spark import datagen
from gmql_spark.operators.rollup import rollup
from gmql_spark.sources.catalog import read_transcripts, write_transcripts


def test_text_byte_equality_through_storage(spark, tmp_path):
    """text must survive ingest → bucketed storage → read byte-for-byte
    under the stable (conv_id, turn_idx) ordering — including the empty /
    unicode / embedded-tab-newline cases datagen plants every 97th row."""
    pdf = datagen.gen_transcripts(n_conv=60)
    sdf = datagen.transcripts_spark(spark, n_conv=60)
    path = str(tmp_path / "fact")
    write_transcripts(sdf, path, n_buckets=4, precompute_gaps=True)

    back = (
        read_transcripts(spark, path)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(back) == len(exp)
    # byte-level equality, not just string equality
    eq = [
        a.encode() == b.encode() for a, b in zip(back["text"], exp["text"], strict=True)
    ]
    assert all(eq), f"{sum(not x for x in eq)} texts differ"
    specials = exp["text"].str.contains("\t|\n", regex=True) | (exp["text"] == "")
    assert specials.any(), "fixture must include special-char cases"


def test_rollup_layout_invariance(spark, tmp_path):
    """Same rows in 1 file vs 40 shuffled files -> identical rollups."""
    sdf = datagen.transcripts_spark(spark, n_conv=50)
    p1, p2 = str(tmp_path / "one"), str(tmp_path / "many")
    sdf.coalesce(1).write.parquet(p1)
    sdf.orderBy(F.rand(7)).repartition(40).write.parquet(p2)

    def roll(path):
        df = spark.read.parquet(path)
        return (
            rollup(df, "1h")
            .toPandas()
            .sort_values(["conv_id", "window_start"])
            .reset_index(drop=True)
        )

    a, b = roll(p1), roll(p2)
    for col in a.columns:
        if a[col].map(lambda x: isinstance(x, dict)).any():
            assert all(dict(x) == dict(y) for x, y in zip(a[col], b[col]))
        else:
            pd.testing.assert_series_equal(a[col], b[col], check_names=False)
