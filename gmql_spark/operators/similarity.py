"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with JVM higher-order functions
(``zip_with`` dot product + ``aggregate`` fold — no Python). Scale path:
LSH-bucketed variant (random-hyperplane signs -> band buckets) so the
candidate join is proportional to collisions, not |Q|x|N|.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gmql_spark.operators.order import topk_per_key

# brute-force baselines collect/broadcast the query block by contract;
# past this the scale paths (LSH buckets / IVF cells) are the answer
_MAX_BRUTE_QUERIES = 100_000


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# ------------------------------------------ vectorized exact dot folds
#
# Catalyst evaluates higher-order functions (zip_with/aggregate) with an
# interpreted per-element path — no whole-stage codegen — which measures
# ~100 ns/element here: the corpus-side LSH signatures / IVF cell
# assignment / brute re-ranks were the dominant cost of every similarity
# gate (guide §4.2: hand whole batches to vectorized native code). The
# helpers below replay the EXACT JVM semantics in numpy so results stay
# bit-identical:
#   product  = cast(float→double) ∘ IEEE double multiply (exact widening)
#   dot      = left-to-right fold  (((0 + x0·y0) + x1·y1) + …)
#              → a loop over DIMENSIONS, vectorized over rows: each
#                `acc += X[:, j] * Y[j]` is the same IEEE add, same order
#   sim      = dot / (norm_a · norm_b), norms = sqrt(self-fold)
# NaN/None propagation matches the JVM (null vector → null result; NaN
# arithmetic is IEEE-identical; `dot > 0` is false for NaN both sides).
# Differential tests: tests/test_similarity_arrow.py (HOF vs Arrow).


def _np2d(col):
    """pyarrow list<float|double> column → (X float64 (n, d), null mask).
    float32→float64 widening is exact. Null rows come back as zero rows
    with mask=True (callers must null their outputs). Ragged lengths
    raise — the JVM path would silently null-pad (see ``_infer_dim``'s
    poison note); the vectorized path refuses instead."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    mask = np.zeros(n, dtype=bool)
    if a.null_count:
        mask = pc.is_null(a).to_numpy(zero_copy_only=False).astype(bool)
    inner_nulls = bool(a.flatten().null_count)
    lens = pc.list_value_length(a).to_numpy(zero_copy_only=False)
    valid_lens = lens[~mask]
    if valid_lens.size == 0:
        return np.zeros((n, 0), dtype=np.float64), np.ones(n, dtype=bool)
    d = int(valid_lens[0])
    if not (valid_lens == d).all():
        raise ValueError(
            "vectorized dot path: ragged embedding lengths "
            f"(expected {d}, saw {sorted(set(valid_lens.tolist()))[:5]})"
        )
    fast = not a.null_count and not inner_nulls
    if fast:
        flat = a.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, d), mask
    # slow path (null rows and/or null elements — rare): rebuild row by
    # row; a null ELEMENT nulls the entire JVM fold (null product → null
    # sum), so such rows are masked like null vectors
    X = np.zeros((n, d), dtype=np.float64)
    for i in range(n):
        if mask[i]:
            continue
        row = a[i].as_py()
        if any(x is None for x in row):
            mask[i] = True
        else:
            X[i] = np.asarray(row, dtype=np.float64)
    return X, mask


def _fold_mat(X, W):
    """(n, d) × (d, k) exact left-to-right dot fold per (row, col)."""
    import numpy as np

    acc = np.zeros((X.shape[0], W.shape[1]), dtype=np.float64)
    for j in range(X.shape[1]):
        acc += X[:, j, None] * W[None, j, :]
    return acc


def _fold_pair(X, Y):
    """(n, d) × (n, d) exact left-to-right dot fold per row."""
    import numpy as np

    acc = np.zeros(X.shape[0], dtype=np.float64)
    for j in range(X.shape[1]):
        acc += X[:, j] * Y[:, j]
    return acc


def _ddl_of(df: DataFrame, cols) -> str:
    types = dict(df.dtypes)
    return ", ".join(f"{c} {types[c]}" for c in cols)


def _arrow_pair_sim(df: DataFrame, out_cols, qv: str = "_qv", cv: str = "_cv",
                    out: str = "sim") -> DataFrame:
    """``df`` → ``select(*out_cols, sim)`` with
    sim = fold(qv·cv) / (sqrt(fold(qv·qv)) · sqrt(fold(cv·cv)))
    — bit-identical to the HOF expression (``_dot``-based re-rank), via
    one vectorized Arrow pass. Columns are projected BEFORE the map so
    only the pair vectors cross the boundary (guide §4.1)."""
    import pyarrow as pa

    out_cols = list(out_cols)
    src = df.select(*out_cols, qv, cv)
    ddl = _ddl_of(src, out_cols) + f", {out} double"
    nq, nc = len(out_cols), len(out_cols) + 1

    def fn(it):
        import numpy as np

        for batch in it:
            if batch.num_rows == 0:
                continue
            Q, qm = _np2d(batch.column(nq))
            C, cm = _np2d(batch.column(nc))
            if Q.shape[1] and C.shape[1]:
                if Q.shape[1] != C.shape[1]:
                    # JVM zip_with null-pads mismatched lengths → null sim
                    sim = np.zeros(batch.num_rows)
                    bad = np.ones(batch.num_rows, dtype=bool)
                else:
                    with np.errstate(invalid="ignore", divide="ignore"):
                        qn = np.sqrt(_fold_pair(Q, Q))
                        cn = np.sqrt(_fold_pair(C, C))
                        sim = _fold_pair(Q, C) / (qn * cn)
                    bad = qm | cm
            else:
                sim = np.zeros(batch.num_rows)
                bad = np.ones(batch.num_rows, dtype=bool)
            cols = [batch.column(i) for i in range(nq)]
            cols.append(pa.array(sim, type=pa.float64(), mask=bad))
            yield pa.RecordBatch.from_arrays(
                cols, names=out_cols + [out]
            )

    return src.mapInArrow(fn, ddl)


def _lit_arr(w):
    """Literal double array for inlined planes/centroids. Dots against
    it stay the HOF ``_dot`` (zip_with+aggregate): measured 4-7x FASTER
    than an explicit 64-term multiply-add chain, which bloats the
    expression tree past what codegen handles (4.8 MiB task binaries,
    26 s vs 4 s on the ann gate at sf0.1) — see NOTES_r3."""
    return F.array(*[F.lit(float(x)) for x in w])


def _with_lsh_buckets(frame: DataFrame, vc: str, planes) -> DataFrame:
    """Append ``(table, bucket)`` per row (``n_tables`` output rows per
    input row) via one vectorized Arrow pass. Bit-identical to the
    former broadcast-planes HOF formulation (r3–r7): each plane dot is
    the same cast-then-multiply left-to-right fold (``_fold_mat``), the
    sign test is ``dot > 0`` (false for NaN on both engines), and the
    bucket is Σ (bit << p) in ascending plane order — exact integer
    addition either way. A null vector row yields a null bucket (the
    HOF fold's null propagation), which the downstream candidate join
    then drops. The planes ride the task closure (n_tables × n_planes ×
    dim float64 — a few KB), not the plan, so plan/codegen size stays
    independent of the LSH configuration."""
    import numpy as np
    import pyarrow as pa

    planes = np.asarray(planes, dtype=np.float64)
    n_tables, n_planes = planes.shape[0], planes.shape[1]
    Ws = [np.ascontiguousarray(planes[t].T) for t in range(n_tables)]
    shifts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))[None, :]
    vc_idx = frame.columns.index(vc)
    ddl = _ddl_of(frame, frame.columns) + ", table int, bucket long"
    names = frame.columns + ["table", "bucket"]

    def fn(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            X, mask = _np2d(batch.column(vc_idx))
            for t in range(n_tables):
                if X.shape[1] == Ws[t].shape[0]:
                    acc = _fold_mat(X, Ws[t])
                    # Spark SQL orders NaN ABOVE every value, so the JVM
                    # sign test `dot > 0` is TRUE for NaN; IEEE/numpy
                    # comparison is false — mirror Spark
                    bits = (acc > 0) | np.isnan(acc)
                    bucket = (bits * shifts).sum(axis=1)
                    bad = mask
                else:  # dim mismatch: HOF would null-pad → null bucket
                    bucket = np.zeros(batch.num_rows, dtype=np.int64)
                    bad = np.ones(batch.num_rows, dtype=bool)
                cols = list(batch.columns)
                cols.append(pa.array(np.full(batch.num_rows, t, dtype=np.int32)))
                cols.append(pa.array(bucket, type=pa.int64(), mask=bad))
                yield pa.RecordBatch.from_arrays(cols, names=names)

    return frame.mapInArrow(fn, ddl)


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "_norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected small (the operator's brute-force contract —
    same bound class as the former broadcast crossJoin plan, enforced at
    ``_MAX_BRUTE_QUERIES``); corpus arbitrary. Output: (query_id,
    neighbor_id, rank). Self-matches excluded.

    r8: the |Q|×|N| sims come from ONE vectorized Arrow pass over the
    corpus with the collected query block riding the task closure
    (guide §8: move the decision work to a lightweight pass) instead of
    a crossJoin scored by interpreted HOF folds — bit-identical sims
    (see the fold-helper block above), ~5× less wall on the gate."""
    import numpy as np
    import pyarrow as pa

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).take(_MAX_BRUTE_QUERIES + 1)
    if len(q_rows) > _MAX_BRUTE_QUERIES:
        raise ValueError(
            f"cosine_topk is the bounded brute baseline: > {_MAX_BRUTE_QUERIES} "
            "query vectors — use lsh_bucket_topk / ivf_topk for large query sets"
        )
    id_t = dict(queries.dtypes)[id_col]
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    ddl = f"query_id {id_t}, neighbor_id {id_t}, sim double"
    valid, null_qids = [], []
    for r in q_rows:
        v = r["_qv"]
        if v is None or any(x is None for x in v):
            null_qids.append(r["query_id"])  # null vector → null sims (JVM fold)
        else:
            valid.append(r)
    if valid and len({len(r["_qv"]) for r in valid}) > 1:
        raise ValueError("cosine_topk: ragged query embedding lengths")
    qids = np.array([r["query_id"] for r in valid])
    Q = (
        np.array([list(r["_qv"]) for r in valid], dtype=np.float64)
        if valid else np.zeros((0, 0))
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        qn = np.sqrt(_fold_pair(Q, Q)) if valid else np.zeros(0)
    m = len(qids)

    def fn(it):
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            cids_arr = batch.column(0)
            cids = np.asarray(cids_arr.to_pylist(), dtype=object)
            X, mask = _np2d(batch.column(1))
            out_q, out_c, out_s, out_bad = [], [], [], []
            if m and X.shape[1] == Q.shape[1]:
                with np.errstate(invalid="ignore", divide="ignore"):
                    cn = np.sqrt(_fold_pair(X, X))
                    sims = _fold_mat(X, Q.T) / (cn[:, None] * qn[None, :])
                out_q.append(np.repeat(qids, n))
                out_c.append(np.tile(cids, m))
                out_s.append(sims.T.reshape(-1))
                out_bad.append(np.tile(mask, m))
            elif m:  # dim mismatch → HOF null-pads → null sims
                out_q.append(np.repeat(qids, n))
                out_c.append(np.tile(cids, m))
                out_s.append(np.zeros(m * n))
                out_bad.append(np.ones(m * n, dtype=bool))
            for nq in null_qids:  # null query vector → null sims
                out_q.append(np.full(n, nq, dtype=object))
                out_c.append(np.tile(cids, 1))
                out_s.append(np.zeros(n))
                out_bad.append(np.ones(n, dtype=bool))
            if not out_q:
                continue
            oq = np.concatenate(out_q)
            oc = np.concatenate(out_c)
            os_ = np.concatenate(out_s)
            ob = np.concatenate(out_bad)
            keep = oq != oc  # self-match excluded, as before
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(oq[keep].tolist(), type=cids_arr.type),
                    pa.array(oc[keep].tolist(), type=cids_arr.type),
                    pa.array(os_[keep], type=pa.float64(), mask=ob[keep]),
                ],
                names=["query_id", "neighbor_id", "sim"],
            )

    scored = c.mapInArrow(fn, ddl)
    out = topk_per_key(
        scored,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "rank")


def cosine_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "brute",
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine(a, b) >= threshold — the embedding modality of the dedup
    family (exact/minhash/simhash counterparts in ``operators.dedup``).

    ``method='brute'``: all-pairs self-join — the exact verification
    primitive; quadratic, for bounded blocks (gate scale / the re-rank
    stage of a blocked pipeline). ``method='lsh'``: random-hyperplane
    bucket candidates then exact verify — candidate cost ∝ collisions,
    recall < 1 tunable by ``n_tables`` (the scale path; recall-tested
    against brute)."""
    a = with_norm(
        df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_av")), "_av", "_an"
    )
    b = with_norm(
        df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_bv")), "_bv", "_bn"
    )
    if method == "brute":
        pairs = a.join(b, a["id_a"] < b["id_b"])
    elif method == "lsh":
        import numpy as np

        if dim is None:
            dim = _infer_dim(df, vec_col)
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((n_tables, n_planes, dim))
        ab = _with_lsh_buckets(a, "_av", planes)
        bb = _with_lsh_buckets(b, "_bv", planes)
        pairs = (
            ab.join(bb, on=["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .drop("table", "bucket")
            .distinct()
        )
    else:
        raise ValueError("method must be brute|lsh")
    sim = _dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
    return (
        pairs.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: every corpus vector is assigned to
    its nearest centroid cell (argmax cosine, ties to the lowest cell
    index); each query probes its ``n_probe`` nearest cells and exact
    cosine re-ranks within them. Candidates ∝ corpus/n_cells × n_probe
    per query instead of |corpus|; recall misses only neighbors whose
    cell the query does not probe.

    ``centroids`` is either
    - a (n_cells, dim) numpy array — inlined as literals so both the
      cell assignment and the probe ranking stay JVM-side Catalyst
      expressions (and a DuckDB oracle can inline the identical
      values). Right for oracle gates and small cell counts; literal
      plans grow with n_cells (measured: fine to a few hundred cells,
      codegen blowup beyond), or
    - a DataFrame ``(cell int 1-based, centroid array<numeric>)`` — the
      scale path for 10^4-10^5 cells: broadcast hash join on a constant
      key (NOT a nested-loop cross join) + ``max_by`` argmax for the
      corpus assignment (partial map-side combine — no corpus-scale
      window), window top-``n_probe`` on the tiny query side. Same
      argmax/tie semantics as the literal mode (ties to the lowest cell
      index); equality-tested against it at 256 cells.
    """
    import numpy as np

    if isinstance(centroids, DataFrame):
        return _ivf_topk_table(
            queries, corpus, centroids, k, n_probe, id_col, vec_col
        )
    cen = np.asarray(centroids, dtype=np.float64)

    def sims(vc, nrm):
        # row norm hoisted into one column (NOT recomputed per centroid);
        # centroid dots are codegen-able literal multiply-add chains
        return F.array(*[
            _dot(F.col(vc), _lit_arr(c)) / (F.col(nrm) * F.lit(float(np.sqrt(c @ c))))
            for c in cen
        ])

    # corpus cell assignment: the |corpus| × n_cells score matrix runs
    # through the vectorized Arrow fold (bit-identical to the literal
    # HOF chain, see fold-helper block) — this was the raw-scale cost of
    # the literal mode; argmax tie-break (first max = lowest cell) is
    # numpy's argmax, same as array_position-of-first-max
    c = _assign_cells_np(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "_cv",
        cen,
    )
    # query side is tiny — keep the literal JVM expressions (identical
    # values by the fold equivalence, no Python stage for 20 rows)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    qcells = (
        q.withColumn("_qn", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
        .withColumn("_sims", sims("_qv", "_qn"))
        .select("query_id", "_qv", F.posexplode("_sims").alias("_i", "_sim"))
        .withColumn("cell", F.col("_i") + 1)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cell").asc())
    probed = (
        qcells.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", "cell")
    )
    cands = probed.join(c, on="cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = _arrow_pair_sim(cands, ["query_id", "neighbor_id"], "_qv", "_cv")
    out = topk_per_key(
        scored,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "rank", "sim")


def _assign_cells_np(frame: DataFrame, vc: str, cen) -> DataFrame:
    """Append ``cell`` (1-based nearest-centroid argmax, first-max tie →
    lowest cell) to a vector frame via one vectorized Arrow pass —
    bit-identical to the literal-mode HOF chain it replaces:
    per-cell score = fold(v·cᵢ) / (sqrt(fold(v·v)) · |cᵢ|) with |cᵢ|
    the SAME plan-literal value (``float(np.sqrt(c @ c))``), and
    ``np.argmax`` = ``array_position(sims, array_max(sims))`` for the
    all-comparable and all-NaN cases alike (NaN rows only arise from a
    zero-norm vector, which NaNs every cell on both engines). A null
    vector row gets a null cell (HOF null fold), dropped by the
    downstream cell join."""
    import numpy as np
    import pyarrow as pa

    cen = np.asarray(cen, dtype=np.float64)
    W = np.ascontiguousarray(cen.T)
    cnorms = np.array([float(np.sqrt(c @ c)) for c in cen])
    vc_idx = frame.columns.index(vc)
    ddl = _ddl_of(frame, frame.columns) + ", cell int"
    names = frame.columns + ["cell"]

    def fn(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            X, mask = _np2d(batch.column(vc_idx))
            if X.shape[1] == W.shape[0]:
                with np.errstate(invalid="ignore", divide="ignore"):
                    nrm = np.sqrt(_fold_pair(X, X))
                    sims = _fold_mat(X, W) / (nrm[:, None] * cnorms[None, :])
                cell = (np.argmax(sims, axis=1) + 1).astype(np.int32)
                bad = mask
            else:  # dim mismatch → null sims → null cell
                cell = np.zeros(batch.num_rows, dtype=np.int32)
                bad = np.ones(batch.num_rows, dtype=bool)
            cols = list(batch.columns)
            cols.append(pa.array(cell, type=pa.int32(), mask=bad))
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return frame.mapInArrow(fn, ddl)


def _cent_frame(centroids: DataFrame, cell_col: str, cent_col: str) -> DataFrame:
    """Normalize a centroid table for the broadcast join: precomputed
    centroid norms + the non-foldable constant join key (a literal 0
    would be constant-folded into a BNLJ cross join)."""
    return (
        centroids.select(
            F.col(cell_col).cast("int").alias("_cell"),
            F.col(cent_col).alias("_cent"),
        )
        .withColumn("_cnorm", F.sqrt(_dot(F.col("_cent"), F.col("_cent"))))
        .withColumn("_one", F.pmod(F.xxhash64("_cell"), F.lit(1)))
    )


def _scored_cells(frame: DataFrame, cent: DataFrame, idc: str, vc: str, extra=()):
    """Explode a vector frame against every centroid (broadcast hash
    join on the constant key — same row expansion as a cross join, hash
    codegen instead of BNLJ) with the per-cell score. The score omits
    the ROW's own norm: a positive per-row constant cannot change the
    argmax / top-n_probe ordering, and dividing by it would cost one
    O(dim) fold per (row, cell)."""
    e = frame.withColumn("_one", F.pmod(F.xxhash64(F.col(idc)), F.lit(1))).join(
        F.broadcast(cent), on="_one"
    )
    sim = _dot(F.col(vc), F.col("_cent")) / F.col("_cnorm")
    return e.select(idc, vc, *extra, F.col("_cell"), sim.alias("_csim"))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    cent_col: str = "centroid",
    _cent: DataFrame | None = None,
) -> DataFrame:
    """Assign every corpus vector its nearest centroid cell:
    ``(id_col, vec_col, _norm, cell)``. The argmax is an AGGREGATE
    (max_by with ties to the LOWEST cell, matching the literal mode's
    array_position-of-first-max) — partial map-side combine, so the
    exploded corpus × n_cells rows never shuffle. The row norm is
    computed once here and carried along for downstream re-ranks.

    ``id_col`` is the assignment key and MUST be unique: duplicate ids
    collapse to one output row whose (cell, vector) pairing may mix the
    duplicates. ``write_ivf_index`` checks this by default."""
    cent = _cent_frame(centroids, cell_col, cent_col) if _cent is None else _cent
    c = _scored_cells(
        corpus.select(
            F.col(id_col), F.col(vec_col)
        ).withColumn("_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))),
        cent,
        id_col,
        vec_col,
        extra=("_norm",),
    )
    return c.groupBy(id_col).agg(
        F.max_by(
            F.col("_cell"), F.struct(F.col("_csim").alias("s"), (-F.col("_cell")).alias("t"))
        ).alias("cell"),
        F.first(vec_col).alias(vec_col),
        F.first("_norm").alias("_norm"),
    )


def _probe_cells(
    queries: DataFrame,
    cent: DataFrame,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Top n_probe cells per query (query side is small): window rank
    with the same (sim desc, cell asc) tie-break as the assignment."""
    qs = _scored_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        cent,
        "query_id",
        "_qv",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_csim").desc(), F.col("_cell").asc())
    return (
        qs.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", F.col("_cell").alias("cell"))
        .withColumn("_qn", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    )


def _rerank(probed: DataFrame, assigned: DataFrame, k: int,
            vec_col: str, id_col: str) -> DataFrame:
    cands = probed.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            F.col("_norm").alias("_cn"),
            "cell",
        ),
        on="cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    scored = cands.select("query_id", "neighbor_id", sim.alias("sim"))
    out = topk_per_key(
        scored,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "rank", "sim")


def _ivf_topk_table(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    cell_col: str = "cell",
    cent_col: str = "centroid",
) -> DataFrame:
    """Centroid-TABLE variant of ``ivf_topk`` (see its docstring): the
    centroid set rides a broadcast hash join instead of being inlined,
    so the plan size is independent of n_cells."""
    cent = _cent_frame(centroids, cell_col, cent_col)
    assigned = ivf_assign(
        corpus, centroids, id_col, vec_col, cell_col, cent_col, _cent=cent
    )
    probed = _probe_cells(queries, cent, n_probe, id_col, vec_col)
    return _rerank(probed, assigned, k, vec_col, id_col)


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    cent_col: str = "centroid",
    mode: str = "overwrite",
    check_unique: bool = True,
) -> None:
    """Materialize the IVF index: the cell-assigned corpus (with
    precomputed row norms) written PARTITIONED BY cell. This is the
    missing lifecycle step between training and querying at 100 TB —
    assignment is the expensive pass over the corpus, and persisting it
    partitioned means every later query batch reads ONLY its probed
    cells' directories (partition pruning at the parquet scan; with
    n_probe=2 of 10^4 cells that is ~0.02% of the index).

    ``check_unique`` (default on — an index build is a one-time heavy
    job, two counts are noise) refuses duplicate ids LOUDLY: the
    groupBy(id) assignment would otherwise silently drop rows and can
    pair one duplicate's cell with another's vector."""
    if check_unique:
        total = corpus.count()
        distinct = corpus.select(id_col).distinct().count()
        if distinct != total:
            raise ValueError(
                f"write_ivf_index: {id_col} not unique "
                f"({total} rows, {distinct} distinct) — duplicates would "
                "silently collapse in the index; dedup first or pass "
                "check_unique=False to accept collapse"
            )
    ivf_assign(corpus, centroids, id_col, vec_col, cell_col, cent_col).repartition(
        "cell"
    ).write.mode(mode).partitionBy("cell").parquet(path)


def indexed_ivf_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    cent_col: str = "centroid",
) -> DataFrame:
    """Query a persisted IVF index (``write_ivf_index``): probe cells
    per query, PRUNE the index scan to the union of probed cells (an
    explicit IN filter on the partition column — shows up as
    PartitionFilters, deterministic, no reliance on runtime DPP), then
    exact cosine re-rank. The probed-cell collect is O(|Q| × n_probe)
    scalars — the same driver-side bookkeeping class as the engine's
    other bound collects. The probed frame is eagerly
    ``localCheckpoint``-ed around that collect so the probing shuffle
    runs ONCE, not once for the collect and again inside the re-rank
    (the call is therefore eager: the probe executes now, the re-rank
    when the result is acted on). localCheckpoint, not persist: cached
    frames live in the CacheManager for the app's lifetime unless
    explicitly unpersisted (a leak across repeated query batches),
    while checkpoint blocks are released by the ContextCleaner as soon
    as the result frame is dropped. Same argmax/tie semantics as
    ``ivf_topk``: equality-tested against the direct path."""
    cent = _cent_frame(centroids, cell_col, cent_col)
    probed = _probe_cells(queries, cent, n_probe, id_col, vec_col).localCheckpoint(eager=True)
    cells = sorted({int(r["cell"]) for r in probed.select("cell").distinct().collect()})
    idx = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    return _rerank(probed, idx, k, vec_col, id_col)


def centroids_to_table(spark, centroids) -> DataFrame:
    """(n_cells, dim) array -> the (cell, centroid) DataFrame shape
    ``ivf_topk`` accepts (cell is 1-based like the literal mode)."""
    import numpy as np

    cen = np.asarray(centroids, dtype=np.float64)
    rows = [(i + 1, [float(x) for x in c]) for i, c in enumerate(cen)]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding width from the data (one-row peek). A plane/vector
    width mismatch is SILENT poison otherwise: ``zip_with`` null-pads
    the shorter side, every dot/signature goes null, and the bucket
    join matches nothing — zero results with no error."""
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if row is None:
        return 1  # no non-null vectors -> result is empty regardless
    return len(row[0])


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (sign sketch) into
    ``n_tables`` bucket tables; exact cosine re-rank within candidate
    buckets. Recall < 1 by construction; candidates shrink the join by
    ~2^n_planes per table.

    ``dim`` defaults to the corpus embedding width (one-row peek);
    pass it explicitly only to pin a deterministic plane set across
    runs (e.g. for an inlined-literal oracle) — a wrong value yields
    empty results (see ``_infer_dim``)."""
    import numpy as np

    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_tables, n_planes, dim))

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    qb = _with_lsh_buckets(q, "_qv", planes)
    cb = _with_lsh_buckets(c, "_cv", planes)
    cands = (
        qb.join(cb, on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .distinct()
    )
    qn = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    cn = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    sim = _dot(F.col("_qv"), F.col("_cv")) / (qn * cn)
    scored = cands.select("query_id", "neighbor_id", sim.alias("sim"))
    out = topk_per_key(
        scored,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    )
    return out.select("query_id", "neighbor_id", "rank", "sim")


# --------------------------------------------------- IVF centroid training

def kmeans_train(X, n_cells: int, seed: int = 0, n_iters: int = 20):
    """Pure-numpy spherical Lloyd's over an (n, dim) float64 matrix.

    Deterministic by construction — given the same matrix (same rows in
    the same order), every step is a fixed numpy reduction:

    - rows are L2-normalized (cosine argmax == L2 argmin on the unit
      sphere, matching ``ivf_topk``'s cosine cell assignment);
      zero-norm rows are dropped;
    - init = PCG64(seed) choice of ``n_cells`` distinct row indices;
    - assignment = argmax of X @ C.T with numpy's first-max tie-break
      (lowest cell index — the same tie rule ``ivf_topk`` uses);
    - update = mean of assigned rows, re-normalized; an emptied cell
      keeps its previous centroid;
    - fixed ``n_iters`` sweeps with early stop on an UNCHANGED
      assignment (a deterministic predicate, so stopping early never
      breaks reproducibility).

    Returns (n_cells, dim) float64 centroids (unit-norm rows).
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("kmeans_train needs a non-empty (n, dim) matrix")
    norms = np.sqrt((X * X).sum(axis=1))
    X = X[norms > 0] / norms[norms > 0, None]
    n = X.shape[0]
    if n < n_cells:
        raise ValueError(f"kmeans_train: {n} usable rows < n_cells={n_cells}")
    rng = np.random.Generator(np.random.PCG64(seed))
    cen = X[np.sort(rng.choice(n, size=n_cells, replace=False))].copy()
    prev = None
    for _ in range(n_iters):
        assign = np.argmax(X @ cen.T, axis=1)
        if prev is not None and np.array_equal(assign, prev):
            break
        prev = assign
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = float(np.sqrt(m @ m))
                if nrm > 0:
                    cen[c] = m / nrm
    return cen


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
    seed: int = 0,
    n_iters: int = 20,
    hash_seed: str = "ivf",
):
    """Sampled k-means centroid trainer for :func:`ivf_topk` — the
    missing producer half of the IVF scale path (train here, then
    ``centroids_to_table`` + ``ivf_topk`` for 10^4+ cells).

    The driver-side sample is DETERMINISTIC, not ``rand()``: rows are
    ranked by the portable 60-bit md5 hash of the id
    (``dedup.hash64(md5)``, bit-identical in DuckDB/Python) with the id
    itself as tie-break, and the first ``sample_cap`` survive. On a
    cluster that is a distributed TakeOrderedAndProject (top-k by hash),
    NOT a full sort — O(n) scan + O(cap) result; re-runs, retries, and
    repartitioning cannot change the sample. The collected matrix
    (≤ cap × dim float64) then runs :func:`kmeans_train` on the driver.

    An exact-oracle twin can reproduce the centroids outside Spark by
    applying the same rule: md5-rank the ids, take ``sample_cap``, sort
    the survivors by (hash, id), feed the float64 matrix to
    ``kmeans_train`` with the same seed.
    """
    import numpy as np

    from gmql_spark.operators.dedup import hash64

    sampled = (
        df.select(
            hash64(F.col(id_col), hash_seed, "md5").alias("_h"),
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
        )
        .orderBy("_h", "_id")
        .limit(int(sample_cap))
        .collect()
    )
    X = np.asarray([r["_v"] for r in sampled], dtype=np.float64)
    return kmeans_train(X, n_cells, seed=seed, n_iters=n_iters)
