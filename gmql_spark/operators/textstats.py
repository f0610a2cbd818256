"""Text analysis: token counts, quality scores, language ID heuristic,
document fingerprints. All built-in pyspark.sql functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny fixed stopword lists per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "it": ["il", "la", "di", "che", "e", "un", "per"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
}


def token_count(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(toks)).cast("long")
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND punctuation AND
    letter/digit boundaries (a cheap stand-in for BPE tokenizers' piece
    counts; deterministic regex, JVM-side)."""
    pieces = F.split(text, r"(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])")
    cleaned = F.filter(pieces, lambda p: (p != "") & (p != " "))
    return F.size(cleaned).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a single
    [0,1] score (monotone combination, deterministic)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\p{Punct}]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    all_stop = [w for ws in LANG_MARKERS.values() for w in ws]
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in all_stop]))).cast("long")
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    out = df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tok,
            "punct_ratio": safe(n_punct, n_chars),
            "upper_ratio": safe(n_upper, n_chars),
            "digit_ratio": safe(n_digit, n_chars),
            "stopword_hits": n_stop,
            "mean_token_len": safe(
                F.length(F.regexp_replace(F.trim(t), r"\s+", "")), n_tok
            ),
        }
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0).otherwise(1.0)
        * (1.0 - F.least(F.col("punct_ratio") * 2, F.lit(1.0)))
        * (1.0 - F.least(F.col("digit_ratio") * 2, F.lit(1.0)))
    )
    return out.withColumn("quality_score", score.cast("double"))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts; 'und' (undetermined) when all zero. Deterministic tie-break
    by language code order."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.array_intersect(toks, markers))
        # count duplicated marker occurrences too: filter is heavier; use
        # total occurrences for better signal
        occ = F.size(F.filter(toks, lambda x: F.array_contains(markers, x)))
        scores.append(F.struct(occ.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", best["score"].cast("long"))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token-counting profile: whitespace token count,
    exact char length, and the sub-word-ish piece count — the three
    counters the ``token_count`` gate exposes, as one projection."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    return df.select(
        F.col(id_col),
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars_actual"),
        bpe_ish_token_count(t).alias("n_pieces"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: xxhash64 of the
    whitespace-normalized lowercase text (rolling-hash stand-in, exact
    and join-stable for dedup keys)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col), F.xxhash64(norm).alias("fingerprint"), F.md5(norm).alias("fingerprint_md5")
    )
