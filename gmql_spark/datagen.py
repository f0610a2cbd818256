"""Deterministic synthetic transcript generator (FIXTURES.md §1-2).

Produces the exact ``input_hint`` shape:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us] (UTC)

plus a small ``conversations`` dimension table (the analogue of GMQL's
per-sample metadata ``(id,(k,v))`` pairs, reference
``GMQL-Core/.../core/DataTypes.scala:69``).

All randomness flows from ``numpy.random.Generator(PCG64(seed))`` with
seed=42 by default; generation is pure numpy (vectorized) and importable by
both the pandas oracle and the Spark ingest so fixtures can never drift.

Mirrors the intent of the reference's synthetic-test specs
(``/root/reference/conf/test_conf.xml``, ``test_map.xml``: dataset-size /
value-range grids) translated to the transcript domain.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pandas as pd

SEED = 42
ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_WEIGHTS = np.array([0.35, 0.45, 0.02, 0.18])
TOOL_NAMES = np.array(
    [
        "bash", "read_file", "write_file", "search", "browser", "sql",
        "python", "calculator", "http_get", "summarize", "translate", "ocr",
    ]
)
CHANNELS = np.array(["web", "api", "mobile", "cli"])
MODELS = np.array(["m-alpha", "m-beta", "m-gamma", "m-delta", "m-epsilon"])
LANGS = np.array(["en", "it", "de", "ja"])

# named scales from FIXTURES.md §1
SCALES = {"tiny": 100, "small": 2000, "bench": 50000}

_EPOCH_2026_01_01_US = np.int64(pd.Timestamp("2026-01-01").value // 1000)
_DAY_US = np.int64(86_400_000_000)

_SPECIAL_TEXTS = np.array(
    ["", "🦜🔥 café ≠ caffè", "日本語のテキスト、句読点。", "tab\there", "line\nbreak", "\t\n mixed \t"]
)


def _texts(conv_ids: np.ndarray, turn_idx: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """text = f"{conv_id}:{turn_idx}:" + base64(sha256(seed,conv,idx))[:L].

    Deterministic per (conv_id, turn_idx); every 97th global row swaps in a
    special-case payload (empty / unicode / embedded tabs+newlines).
    """
    out = np.empty(len(conv_ids), dtype=object)
    for i in range(len(conv_ids)):
        h = hashlib.sha256(f"{SEED}|{conv_ids[i]}|{turn_idx[i]}".encode()).digest()
        b64 = base64.b64encode(h * 12).decode()  # 96*... enough for L<=512
        out[i] = f"{conv_ids[i]}:{turn_idx[i]}:{b64[: lengths[i]]}"
    special = np.arange(len(conv_ids)) % 97 == 0
    out[special] = _SPECIAL_TEXTS[np.arange(special.sum()) % len(_SPECIAL_TEXTS)]
    return out


def gen_transcripts(n_conv: int = 100, seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts fact table as a pandas DataFrame.

    ts is monotone non-decreasing per conversation; ~5% of gaps are long
    outliers (10 min–6 h, gap-fill targets); every 211th global turn has a
    duplicated timestamp (equal to its predecessor's, tie-break by turn_idx).
    """
    rng = np.random.Generator(np.random.PCG64(seed))

    n_turns = np.clip(
        np.round(rng.lognormal(mean=3.0, sigma=1.0, size=n_conv)).astype(np.int64), 1, 5000
    )
    total = int(n_turns.sum())
    conv_i = np.repeat(np.arange(n_conv), n_turns)
    conv_ids = np.array([f"conv{i:06d}" for i in range(n_conv)], dtype=object)[conv_i]
    # 0..n-1 within each conversation
    turn_idx = (np.arange(total) - np.repeat(np.cumsum(n_turns) - n_turns, n_turns)).astype(
        np.int32
    )

    roles = ROLES[rng.choice(len(ROLES), size=total, p=ROLE_WEIGHTS)]
    tools = np.where(
        (roles == "tool") & (rng.random(total) >= 0.05),  # occasional NULL even for tool role
        TOOL_NAMES[rng.choice(len(TOOL_NAMES), size=total)],
        None,
    )

    # timestamps: conv start uniform in Jan 2026, inter-turn gap Exp(20s) w/ outliers
    start_us = _EPOCH_2026_01_01_US + (rng.random(n_conv) * 30 * _DAY_US).astype(np.int64)
    gaps_us = (rng.exponential(scale=20.0, size=total) * 1e6).astype(np.int64)
    outlier = rng.random(total) < 0.05
    gaps_us[outlier] = (rng.uniform(600.0, 21600.0, size=int(outlier.sum())) * 1e6).astype(
        np.int64
    )
    gaps_us[np.arange(total) % 211 == 0] = 0  # duplicate-ts pairs
    first_of_conv = turn_idx == 0
    gaps_us[first_of_conv] = 0
    # cumulative within conversation: global cumsum minus offset at conv start
    g = np.cumsum(gaps_us)
    g = g - np.repeat(g[first_of_conv], n_turns)
    ts_us = start_us[conv_i] + g

    lengths = rng.integers(16, 513, size=total)
    texts = _texts(conv_ids, turn_idx, lengths)

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles.astype(object),
            "text": texts,
            "tool": tools.astype(object),
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def gen_conversations(n_conv: int = 100, seed: int = SEED) -> pd.DataFrame:
    """Dimension table (GMQL metadata analogue, FIXTURES.md §2)."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    return pd.DataFrame(
        {
            "conv_id": [f"conv{i:06d}" for i in range(n_conv)],
            "channel": CHANNELS[rng.choice(len(CHANNELS), size=n_conv)],
            "model": MODELS[rng.choice(len(MODELS), size=n_conv)],
            "lang": LANGS[rng.choice(len(LANGS), size=n_conv)],
            "priority": rng.integers(0, 4, size=n_conv).astype(np.int32),
        }
    )


def transcripts_spark(spark, n_conv: int = 100, seed: int = SEED):
    """Transcripts as a Spark DataFrame with the exact input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    pdf = gen_transcripts(n_conv, seed)
    return spark.createDataFrame(pdf, schema=schema)
