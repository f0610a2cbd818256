"""GSL full-board round trip (SURVEY §3.1; ``Translator.scala:311-393``
two-phase compile): every CORRECTNESS gate whose operator chain is
expressible in GSL has a script twin compiled through ``plans/dsl.py``
and compared EXACTLY (same dtypes, same rows) against the gate's own
``queries()`` DataFrame at sf0.001 — the script surface must be pure
sugar over the same Catalyst plans.

Serving/streaming twins (new r7): ``realtime_rollup`` → SERVE,
``range_stitch`` → frame-form STITCH, ``stream_rollup`` → STREAM (a
real second availableNow drain — deterministic, so frame-exact).

Not twinned (and why):

- ``multimodal_features`` / ``image_decode``: the gates synthesize
  their binary payloads in mapInPandas closures; the statement-level
  multimodal surface is covered by the ``frame_samples`` twin.
- ``ann_topk``'s ivf half: its centroids are a numpy PCG64 literal in
  the gate; the trained path is twinned via ``ivf_trained`` (TRAIN +
  IVF statements). The lsh half IS twinned.
- ``percentile_digest_ok``: an accuracy-contract gate — its output is
  a boolean comparison between the t-digest serving path and exact
  percentiles, parameterized by rank-band literals; the digest build/
  merge itself is an Arrow grouped-map, not a statement-level operator.

Tag-union gates (asof_join, sessions, rollup_windows, dedup_components,
gapfill, rollup variants): the script computes every variant frame; the
``variant`` literal + union presentation is applied identically to the
script outputs in the harness (the gate applies the same projections to
its own operator outputs). ``latency_histogram``'s final two-column map
explode is likewise applied as a presentation step on both sides — the
HIST statements cover the whole sketch pipeline.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import __spark_entry__ as entry
from gmql_spark.plans.dsl import compile_script

SF = "/root/testdata/sf0.001"

DEC_SUM = "cast(sum(cast(value as decimal(18,2))) as double)"


@pytest.fixture(scope="module")
def tables(spark):
    names = ("events", "documents", "embeddings", "lineitem", "orders",
             "customer", "nation")
    return {n[0].upper() if n != "embeddings" else "V": entry._read(spark, SF, n)
            for n in names}


def _mat(spark, tables, script: str) -> dict[str, DataFrame]:
    return compile_script(spark, script, tables=tables).materialized


def _assert_same(got: DataFrame, exp: DataFrame) -> None:
    assert got.dtypes == exp.dtypes, f"{got.dtypes}\n!=\n{exp.dtypes}"
    g, e = got.toPandas(), exp.toPandas()
    cols = list(e.columns)
    g = g.sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = e.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_exact=True)


CASES: dict = {}


def case(fn):
    CASES[fn.__name__[len("twin_"):]] = fn
    return fn


# --------------------------------------------------------------- rollups

@case
def twin_rollup_windows(spark, T):
    m = _mat(spark, T, f"""
        W1 = WINDOW(size: '1 minute', key: ['user_id'], n: 'count(1)',
                    val_sum: '{DEC_SUM}') E;
        W2 = WINDOW(size: '1 hour', slide: '30 minutes', key: ['user_id'],
                    n: 'count(1)', val_sum: '{DEC_SUM}') E;
        MATERIALIZE W1; MATERIALIZE W2;
    """)
    cols = ["user_id", "window_start", "window_end", "n", "val_sum"]
    return m["W1"].select(F.lit("tumbling_1m").alias("variant"), *cols).unionByName(
        m["W2"].select(F.lit("sliding_1h_30m").alias("variant"), *cols)
    )


@case
def twin_rollup_1h_cascade(spark, T):
    m = _mat(spark, T, f"""
        M = WINDOW(size: '1 minute', key: ['user_id'], n: 'count(1)',
                   val_sum_dec: 'sum(cast(value as decimal(18,2)))',
                   val_min: 'min(value)', val_max: 'max(value)') E;
        H = REWINDOW(size: '1 hour', key: ['user_id'], n: 'sum(n)',
                     val_sum: 'cast(sum(val_sum_dec) as double)',
                     val_min: 'min(val_min)', val_max: 'max(val_max)') M;
        O = PROJECT(keep: ['user_id', 'window_start', 'window_end', 'n',
                           'val_sum', 'val_min', 'val_max']) H;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_merge_global_1h(spark, T):
    m = _mat(spark, T, f"""
        W = WINDOW(size: '1 hour', n: 'count(1)', val_sum: '{DEC_SUM}') E;
        MATERIALIZE W;
    """)
    return m["W"]


@case
def twin_type_histogram(spark, T):
    m = _mat(spark, T, """
        G = GROUP(by: ['user_id', 'event_type'], n: 'count(1)') E;
        MATERIALIZE G;
    """)
    return m["G"]


@case
def twin_latency_percentiles(spark, T):
    m = _mat(spark, T, """
        G = GAPS(key: 'user_id', order: ['ts', 'event_id'], ts: 'ts') E;
        B = EXTEND(by: 'user_id', n_gaps: 'count(gap_s)',
                   latency_sum_us: 'sum(gap_us)') G;
        P = PERCENTILES(key: ['user_id'], value: 'gap_s') G;
        J = JOINBY(on: ['user_id']) B P;
        O = PROJECT(keep: ['user_id', 'n_gaps', 'latency_p50',
                           'latency_p95', 'latency_p99', 'latency_sum_us']) J;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_latency_histogram(spark, T):
    m = _mat(spark, T, """
        G = GAPS(key: 'user_id', order: ['ts', 'event_id'], ts: 'ts') E;
        M = HIST(tier: '1m', key: ['user_id'], value: 'gap_us') G;
        H = HIST(from: 'hist', tier: '1h', key: ['user_id']) M;
        MATERIALIZE H;
    """)
    return m["H"].select(
        "user_id", "window_start", F.explode("lat_hist").alias("bucket", "n")
    )


@case
def twin_gapfill(spark, T):
    m = _mat(spark, T, """
        W1 = WINDOW(size: '1 hour', key: ['user_id'], n: 'count(1)') E;
        G1 = GAPFILL(tier: '1h', key: 'user_id', value: 'n') W1;
        W2 = WINDOW(size: '1 hour', key: ['user_id'], n: 'count(1)',
                    val_max: 'max(value)') E;
        G2 = GAPFILL(tier: '1h', key: 'user_id', value: 'n',
                     interp: 'val_max') W2;
        MATERIALIZE G1; MATERIALIZE G2;
    """)
    cols = ["user_id", "window_start", "n", "is_gap", "n_locf"]
    zero = m["G1"].select(
        F.lit("zero").alias("variant"), *cols,
        F.lit(None).cast("double").alias("latency_interp"),
    )
    interp = m["G2"].select(
        F.lit("interp").alias("variant"), *cols, "latency_interp"
    )
    return zero.unionByName(interp)


# ------------------------------------------- select / project / order

@case
def twin_select_project(spark, T):
    m = _mat(spark, T, """
        S = SELECT(event_type = 'purchase' and value >= 50.0) E;
        P = PROJECT(keep: ['event_id', 'user_id', 'ts', 'value'],
                    value_bucket: 'cast(floor(value / 10) as long)') S;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_topk_per_user(spark, T):
    m = _mat(spark, T, """
        K = TOPK(key: 'user_id', by: ['value desc', 'event_id asc'], k: 3) E;
        O = PROJECT(keep: ['user_id', 'event_id', 'value', 'order_pos']) K;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_top_percent(spark, T):
    m = _mat(spark, T, """
        K = ORDER(key: 'user_id', by: ['value desc', 'event_id asc'],
                  percent: 0.05) E;
        O = PROJECT(keep: ['user_id', 'event_id', 'value', 'order_pct']) K;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_topg(spark, T):
    m = _mat(spark, T, """
        K = TOPK(key: 'user_id', group: 'event_type',
                 by: ['value desc', 'event_id asc'], k: 2) E;
        O = PROJECT(keep: ['user_id', 'event_type', 'event_id', 'value',
                           'order_pos']) K;
        MATERIALIZE O;
    """)
    return m["O"]


# -------------------------------------------------- joins / set ops

@case
def twin_semijoin(spark, T):
    m = _mat(spark, T, """
        U = SELECT(event_type = 'error') E;
        S = SEMIJOIN(key: 'user_id') E U;
        O = PROJECT(keep: ['event_id', 'user_id', 'event_type']) S;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_difference(spark, T):
    m = _mat(spark, T, """
        P = SELECT(event_type = 'purchase') E;
        X = SELECT(event_type = 'error') E;
        D = DIFFERENCE(key: 'user_id', dist: 600.0) P X;
        O = PROJECT(keep: ['event_id', 'user_id', 'ts', 'value']) D;
        MATERIALIZE O;
    """)
    return m["O"]


_GAP_S = "(unix_micros(ts) - unix_micros(ts_right)) / 1e6"


@case
def twin_asof_join(spark, T):
    m = _mat(spark, T, f"""
        P0 = SELECT(event_type = 'purchase') E;
        P = PROJECT(keep: ['event_id', 'user_id', 'ts']) P0;
        C0 = SELECT(event_type = 'click') E;
        C = PROJECT(keep: ['user_id', 'ts']) C0;
        A1 = ASOF(key: 'user_id', ts: 'ts') P C;
        A2 = ASOF(key: 'user_id', ts: 'ts', salt: 3600.0) P C;
        O1 = PROJECT(keep: ['event_id', 'user_id', 'ts'],
                     click_ts: 'ts_right', gap_s: '{_GAP_S}') A1;
        O2 = PROJECT(keep: ['event_id', 'user_id', 'ts'],
                     click_ts: 'ts_right', gap_s: '{_GAP_S}') A2;
        MATERIALIZE O1; MATERIALIZE O2;
    """)
    return m["O1"].select(F.lit("plain").alias("variant"), "*").unionByName(
        m["O2"].select(F.lit("salted").alias("variant"), "*")
    )


@case
def twin_nearest_k(spark, T):
    m = _mat(spark, T, """
        P0 = SELECT(event_type = 'purchase') E;
        P = PROJECT(keep: ['event_id', 'user_id', 'ts']) P0;
        C0 = SELECT(event_type = 'click') E;
        C = PROJECT(keep: ['user_id', 'ts']) C0;
        N = NEAREST(key: 'user_id', k: 3, dist: 1800.0, id: 'event_id') P C;
        O = PROJECT(keep: ['event_id', 'user_id', 'ts'], click_ts: 'ts_r',
                    distance_s: 'distance_s',
                    nn_rank: 'cast(nn_rank as long)') N;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_ring_join(spark, T):
    m = _mat(spark, T, """
        P0 = SELECT(event_type = 'purchase') E;
        P = PROJECT(keep: ['event_id', 'user_id', 'ts']) P0;
        C0 = SELECT(event_type = 'click') E;
        C = PROJECT(keep: ['user_id', 'ts']) C0;
        J = CONDJOIN(key: 'user_id', id: 'event_id',
                     conditions: ['dist_less 1800', 'dist_greater 300',
                                  'upstream']) P C;
        O = PROJECT(keep: ['event_id', 'user_id', 'ts'], click_ts: 'ts_r',
                    distance_s: 'distance_s') J;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_nearest_beyond(spark, T):
    m = _mat(spark, T, """
        P0 = SELECT(event_type = 'purchase') E;
        P = PROJECT(keep: ['event_id', 'user_id', 'ts']) P0;
        C0 = SELECT(event_type = 'click') E;
        C = PROJECT(keep: ['user_id', 'ts']) C0;
        J = CONDJOIN(key: 'user_id', id: 'event_id',
                     conditions: ['dist_less 7200', 'dist_greater 300',
                                  'min_distance 1']) P C;
        O = PROJECT(keep: ['event_id', 'user_id', 'ts'], click_ts: 'ts_r',
                    distance_s: 'distance_s',
                    nn_rank: 'cast(nn_rank as long)') J;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_interval_intersect(spark, T):
    m = _mat(spark, T, """
        R0 = SELECT(event_type = 'purchase') E;
        R = PROJECT(keep: ['user_id'], ref_id: 'event_id', start_ts: 'ts',
                    end_ts: 'ts + interval 1 hour') R0;
        X0 = SELECT(event_type = 'error') E;
        X = PROJECT(keep: ['user_id'], exp_id: 'event_id', start_ts: 'ts',
                    end_ts: 'ts + interval 10 minutes') X0;
        J = JOIN(key: 'user_id', builder: 'intersection') R X;
        O = PROJECT(keep: ['ref_id', 'exp_id', 'user_id', 'int_start',
                           'int_end']) J;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_union_provenance(spark, T):
    m = _mat(spark, T, """
        A = SELECT(event_type = 'click') E;
        B = SELECT(event_type = 'signup') E;
        U = UNION() A B;
        O = PROJECT(keep: ['event_id', 'user_id', 'event_type',
                           '_provenance']) U;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_join_dims(spark, T):
    m = _mat(spark, T, """
        C2 = PROJECT(keep: ['c_nationkey'], o_custkey: 'c_custkey') C;
        J1 = JOINBY(on: ['o_custkey'], broadcast: true) O C2;
        N2 = PROJECT(keep: ['n_name'], c_nationkey: 'n_nationkey') N;
        J2 = JOINBY(on: ['c_nationkey'], broadcast: true) J1 N2;
        G = GROUP(by: 'n_name', n_orders: 'count(1)',
                  sum_price: 'cast(sum(cast(o_totalprice as decimal(18,2))) as double)') J2;
        MATERIALIZE G;
    """)
    return m["G"]


@case
def twin_meta_accessor(spark, T):
    m = _mat(spark, T, f"""
        P = SELECT(event_type = 'purchase') E;
        D = GROUP(by: 'user_id',
                  threshold: '{DEC_SUM} / cast(count(1) as double)') P;
        J = JOINBY(on: ['user_id'], broadcast: true) E D;
        S = SELECT(value >= threshold) J;
        O = PROJECT(keep: ['event_id', 'user_id', 'value', 'threshold']) S;
        MATERIALIZE O;
    """)
    return m["O"]


# ------------------------------------------------------- cover family

_IV = """
    IV = PROJECT(start_ts: 'ts', end_ts: 'ts + interval 600 seconds') E;
"""


# ------------------------------------------------------- serving paths


@case
def twin_realtime_rollup(spark, T):
    # SERVE = realtime routing over in-script frames: tier (1m->1h
    # cascade) + raw recompute past the frozen watermark — the gate's
    # exact pipeline (realtime.serve_realtime under both)
    m = _mat(spark, T, f"""
        M = WINDOW(size: '1 minute', key: ['user_id'], n: 'count(1)',
                   val_sum_dec: 'sum(cast(value as decimal(18,2)))',
                   val_min: 'min(value)', val_max: 'max(value)') E;
        H = REWINDOW(size: '1 hour', key: ['user_id'], n: 'sum(n)',
                     val_sum_dec: 'sum(val_sum_dec)',
                     val_min: 'min(val_min)', val_max: 'max(val_max)') M;
        T1 = PROJECT(keep: ['user_id', 'window_start', 'window_end', 'n'],
                     val_sum: 'cast(val_sum_dec as double)',
                     val_min: 'val_min', val_max: 'val_max') H;
        S = SERVE(frozen: '2024-01-21T00:30:00', tier: '1h',
                  key: ['user_id'], n: 'count(1)', val_sum: '{DEC_SUM}',
                  val_min: 'min(value)', val_max: 'max(value)') T1 E;
        MATERIALIZE S;
    """)
    return m["S"]


@case
def twin_range_stitch(spark, T):
    m = _mat(spark, T, """
        S = STITCH(start: '2024-01-03T07:41:17', end: '2024-01-29T21:05:03',
                   key: ['user_id'],
                   n: 'count(1)',
                   val_sum_dec: 'sum(cast(value as decimal(18,2)))',
                   merge_n: 'sum(n)',
                   merge_val_sum_dec: 'sum(val_sum_dec)') E;
        O = PROJECT(keep: ['user_id', 'n'],
                    val_sum: 'cast(val_sum_dec as double)') S;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_stream_rollup(spark, T):
    # a REAL second drain through the streaming engine: deterministic,
    # so it reproduces the gate's emitted ∪ tail frame exactly
    import os as _os
    import tempfile as _tf

    work = _os.path.join(
        _tf.gettempdir(), "gmql_stream_gsl_twin", f"pid_{_os.getpid()}"
    )
    m = _mat(spark, T, f"""
        P = PROJECT(keep: ['user_id', 'ts', 'value']) E;
        S = STREAM(size: '1 minute', watermark: '10 minutes',
                   key: ['user_id'], dir: '{work}',
                   n: 'count(1)', val_sum: '{DEC_SUM}') P;
        MATERIALIZE S;
    """)
    return m["S"]


@case
def twin_cover_accumulation(spark, T):
    # r7 board merge: HISTOGRAM + SUMMIT tag union (shared sweep in the
    # gate; the script computes both variant frames)
    m = _mat(spark, T, _IV + """
        H = HISTOGRAM() IV;
        S = SUMMIT() IV;
        MATERIALIZE H; MATERIALIZE S;
    """)
    return m["H"].select(F.lit("hist").alias("variant"), "*").unionByName(
        m["S"].select(F.lit("summit").alias("variant"), "*")
    )


@case
def twin_cover_jaccard(spark, T):
    m = _mat(spark, T, _IV + "J = JACCARD(min: 3) IV; MATERIALIZE J;")
    return m["J"]


@case
def twin_flat_cover(spark, T):
    m = _mat(spark, T, _IV + "C = FLAT(min: 3) IV; MATERIALIZE C;")
    return m["C"]


# ------------------------------------------------------- text / dedup

@case
def twin_dedup_exact(spark, T):
    m = _mat(spark, T, """
        G = GROUP(by: 'text', keep_id: 'min(doc_id)', n_dups: 'count(1)') D;
        O = PROJECT(text_hash: 'md5(text)', keep_id: 'keep_id',
                    n_dups: 'n_dups') G;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_token_count(spark, T):
    m = _mat(spark, T, "S = TEXTSTATS(what: 'tokens') D; MATERIALIZE S;")
    return m["S"]


@case
def twin_textstats(spark, T):
    m = _mat(spark, T, """
        Q0 = TEXTSTATS(what: 'quality') D;
        Q = PROJECT(keep: ['doc_id', 'n_chars', 'n_tokens', 'punct_ratio',
                           'digit_ratio']) Q0;
        L0 = TEXTSTATS(what: 'lang') D;
        L = PROJECT(keep: ['doc_id', 'lang_pred', 'lang_score']) L0;
        G0 = TEXTSTATS(what: 'fingerprint') D;
        G = PROJECT(keep: ['doc_id', 'fingerprint_md5']) G0;
        J1 = JOINBY(on: ['doc_id']) Q L;
        J2 = JOINBY(on: ['doc_id']) J1 G;
        MATERIALIZE J2;
    """)
    return m["J2"]


@case
def twin_dataset_split(spark, T):
    m = _mat(spark, T, """
        SP0 = SPLIT(id: 'doc_id', train: 0.9, val: 0.05, test: 0.05) D;
        SP = PROJECT(keep: ['doc_id', 'split']) SP0;
        SM0 = SAMPLE(fraction: 0.1, id: 'doc_id') D;
        SM = PROJECT(doc_id: 'doc_id', in_10pct: 'true') SM0;
        J = JOINBY(on: ['doc_id'], how: 'left') SP SM;
        O = PROJECT(keep: ['doc_id', 'split'],
                    in_10pct: 'coalesce(in_10pct, false)') J;
        MATERIALIZE O;
    """)
    return m["O"]


_D2K = "D2 = SELECT(doc_id < 2000) D;\n"


@case
def twin_ngram_jaccard(spark, T):
    m = _mat(spark, T, _D2K + """
        P = DEDUP(mode: 'ngram', threshold: 0.5, n: 3) D2;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_minhash_lsh(spark, T):
    m = _mat(spark, T, _D2K + """
        P = DEDUP(mode: 'minhash', perms: 64, bands: 16, threshold: 0.5,
                  hash: 'md5') D2;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_simhash_pairs(spark, T):
    m = _mat(spark, T, _D2K + """
        P = DEDUP(mode: 'simhash', hamming: 3, hash: 'md5') D2;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_dedup_components(spark, T):
    m = _mat(spark, T, _D2K + """
        P = DEDUP(mode: 'ngram', threshold: 0.5, n: 3) D2;
        NODES = PROJECT(id_a: 'doc_id') D2;
        C1 = COMPONENTS(method: 'label') P NODES;
        C2 = COMPONENTS(method: 'star') P NODES;
        O1 = PROJECT(doc_id: 'id', component: 'component') C1;
        O2 = PROJECT(doc_id: 'id', component: 'component') C2;
        MATERIALIZE O1; MATERIALIZE O2;
    """)
    return m["O1"].select(F.lit("label").alias("variant"), "*").unionByName(
        m["O2"].select(F.lit("star").alias("variant"), "*")
    )


@case
def twin_canonical_pick(spark, T):
    m = _mat(spark, T, """
        G = GROUP(by: 'text', component: 'min(doc_id)') D;
        D2 = PROJECT(keep: ['doc_id', 'text']) D;
        J = JOINBY(on: ['text']) G D2;
        C = PROJECT(id: 'doc_id', component: 'component') J;
        K = CANONICAL() D C;
        O = PROJECT(keep: ['doc_id', 'component', 'is_canonical']) K;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_bag_aggregates(spark, T):
    m = _mat(spark, T, """
        G = GROUP(by: 'user_id',
            types_bagd: 'array_join(array_sort(collect_set(cast(event_type as string))), ",")',
            types_bag: 'array_join(array_sort(collect_list(cast(event_type as string))), ",")') E;
        MATERIALIZE G;
    """)
    return m["G"]


# --------------------------------------------------- similarity / ANN

@case
def twin_cosine_topk(spark, T):
    m = _mat(spark, T, """
        Q = SELECT(vec_id < 20) V;
        K = ANN(method: 'brute', k: 5) Q V;
        MATERIALIZE K;
    """)
    return m["K"]


@case
def twin_ann_topk_lsh(spark, T):
    m = _mat(spark, T, """
        Q = SELECT(vec_id < 20) V;
        K = ANN(method: 'lsh', k: 5, planes: 8, tables: 2, dim: 64,
                seed: 7) Q V;
        O = PROJECT(keep: ['query_id', 'neighbor_id', 'rank']) K;
        MATERIALIZE O;
    """)
    return m["O"].select(F.lit("lsh").alias("variant"), "*")


@case
def twin_ivf_trained(spark, T):
    m = _mat(spark, T, """
        CEN = TRAIN(cells: 8, seed: 0, iters: 20) V;
        Q = SELECT(vec_id < 20) V;
        K = IVF(k: 5, n_probe: 3) Q V CEN;
        O = PROJECT(keep: ['query_id', 'neighbor_id', 'rank']) K;
        MATERIALIZE O;
    """)
    return m["O"]


@case
def twin_embedding_neardup(spark, T):
    m = _mat(spark, T, """
        B = SELECT(vec_id < 300) V;
        P = NEARPAIRS(threshold: 0.35, method: 'brute') B;
        MATERIALIZE P;
    """)
    return m["P"]


# ----------------------------------------------- sessions / multimodal

@case
def twin_sessions(spark, T):
    m = _mat(spark, T, """
        S = PROJECT(keep: ['user_id', 'ts', 'event_id']) E;
        S1 = SESSIONIZE(key: 'user_id', gap: 1800.0, order: ['event_id']) S;
        S2 = SESSIONIZE(key: 'user_id', gap: 1800.0, salt: 3600.0) S;
        MATERIALIZE S1; MATERIALIZE S2;
    """)
    return m["S1"].select(F.lit("plain").alias("variant"), "*").unionByName(
        m["S2"].select(F.lit("salted").alias("variant"), "*")
    )


@case
def twin_profile(spark, T):
    m = _mat(spark, T, """
        P = PROFILE(key: 'user_id', ts: 'ts', per_key: true) E;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_frame_samples(spark, T):
    m = _mat(spark, T, """
        M = PROJECT(media_id: 'doc_id',
                    duration_ms: 'cast(length(text) * 10 as int)') D;
        S = FRAMES(every: 500) M;
        MATERIALIZE S;
    """)
    return m["S"]


# --------------------------------------------------------- TPC-H shapes

@case
def twin_group_lineitem(spark, T):
    m = _mat(spark, T, """
        G = GROUP(by: ['l_returnflag', 'l_linestatus'], n: 'count(1)',
            sum_qty: 'cast(sum(cast(l_quantity as decimal(18,2))) as double)',
            sum_price: 'cast(sum(cast(l_extendedprice as decimal(18,2))) as double)',
            min_ship: 'min(l_shipdate)', max_ship: 'max(l_shipdate)') L;
        MATERIALIZE G;
    """)
    return m["G"]


@case
def twin_project_extend(spark, T):
    m = _mat(spark, T, """
        P = PROJECT(keep: ['l_orderkey', 'l_linenumber'],
                    revenue: 'l_extendedprice * (1.0D - l_discount)') L;
        MATERIALIZE P;
    """)
    return m["P"]


@case
def twin_map_intervals(spark, T):
    m = _mat(spark, T, f"""
        R0 = SELECT(event_type = 'purchase') E;
        R1 = PROJECT(keep: ['user_id'], start_ts: 'ts',
                     end_ts: 'ts + interval 1 hour') R0;
        R2 = GROUP(by: ['user_id', 'start_ts', 'end_ts'], n: 'count(1)') R1;
        R = PROJECT(keep: ['user_id', 'start_ts', 'end_ts']) R2;
        C0 = SELECT(event_type = 'click') E;
        C = PROJECT(keep: ['user_id', 'ts', 'value']) C0;
        M = MAP(key: 'user_id', click_sum: '{DEC_SUM}',
                click_max: 'max(value)') R C;
        O = PROJECT(keep: ['user_id', 'start_ts', 'end_ts', 'n_events',
                           'click_sum', 'click_max']) M;
        MATERIALIZE O;
    """)
    return m["O"]


# ----------------------------------------------------------- the sweep

_GATE_FOR = {"ann_topk_lsh": "ann_topk"}


@pytest.mark.parametrize("name", sorted(CASES))
def test_board_gsl_round_trip(spark, tables, name):
    gate = _GATE_FOR.get(name, name)
    exp = entry.queries()[gate](spark, SF)
    if name == "ann_topk_lsh":
        exp = exp.filter(F.col("variant") == "lsh")
    got = CASES[name](spark, tables)
    _assert_same(got, exp)


def test_board_coverage_documented():
    """Every queries() gate is either twinned above or named in the
    module docstring's not-twinned list with a reason."""
    skipped = {"multimodal_features", "image_decode",
               "percentile_digest_ok"}
    twinned = {_GATE_FOR.get(n, n) for n in CASES}
    board = set(entry.queries())
    assert twinned | skipped == board, (
        f"unaccounted: {sorted(board - twinned - skipped)}; "
        f"stale twins: {sorted(twinned - board)}"
    )
    for s in skipped:
        assert s in __doc__
