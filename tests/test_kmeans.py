"""Distributed Lloyd's k-means vs an independent numpy implementation."""

from __future__ import annotations

import numpy as np

from ml_data_pipeline_spark.operators.similarity import kmeans_fit
from ml_data_pipeline_spark.sources.tables import load_table


def _numpy_lloyd(mat: np.ndarray, k: int, iters: int) -> tuple:
    """Same convention as kmeans_fit: the returned assignment/inertia
    come from the LAST in-loop assignment (pre-final-update distances);
    centroids are post-update."""
    cent = mat[:k].astype(np.float64).copy()
    assign = None
    inertia = None
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties → lowest index, same as Spark
        inertia = d2.min(axis=1).sum()
        for j in range(k):
            sel = mat[assign == j]
            if len(sel):
                cent[j] = sel.mean(axis=0)
    return cent, assign, inertia


def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    k, iters = 8, 5
    cent, assigned = kmeans_fit(spark, sf_dir, k=k, iters=iters)
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ncent, nassign, ninertia = _numpy_lloyd(mat, k, iters)

    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    ids = [r["vec_id"] for r in rows]
    mismatches = sum(1 for i, vid in enumerate(ids) if got[vid] != nassign[i])
    # float-sum ordering differs between engines; only boundary points
    # can flip — require near-total agreement
    assert mismatches <= max(1, len(ids) // 100), mismatches

    cent_arr = np.array(cent)
    assert np.allclose(cent_arr, ncent, rtol=1e-6, atol=1e-8)

    inertia = sum(r["dist2"] for r in assigned.collect())
    assert abs(inertia - ninertia) / ninertia < 1e-6

    # Lloyd's guarantee: inertia non-increasing across iterations
    prev = None
    for it in range(1, iters + 1):
        _, a = kmeans_fit(spark, sf_dir, k=k, iters=it)
        cur = sum(r["dist2"] for r in a.collect())
        if prev is not None:
            assert cur <= prev * (1 + 1e-9)
        prev = cur
