"""CSC + BSR batch layouts (round 5 — completes schema.rs:126-138's
COO/CSR/CSC/BSR set). Ground truth is numpy on the same dense matrix;
everything Spark-side is pure JVM higher-order expressions."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ml_data_pipeline_spark.functions.sparse import (
    blocks_to_bsr,
    bsr_spmv,
    bsr_to_blocks,
    csc_col,
    csc_to_cols,
    csc_vtm,
    cols_to_csc,
)

# a fixed 5x4 matrix with an empty column (2) and an empty row (3)
DENSE = np.array(
    [
        [1.0, 0.0, 0.0, 2.0],
        [0.0, 3.0, 0.0, 0.0],
        [4.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 5.0, 0.0, 6.0],
    ]
)
X5 = np.array([1.0, 2.0, 3.0, 4.0, 5.0])


def _csc_df(spark):
    """Build the CSC batch for DENSE from per-column COO structs."""
    cols = []
    for j in range(DENSE.shape[1]):
        rows = np.nonzero(DENSE[:, j])[0]
        cols.append(
            (int(DENSE.shape[0]), [int(r) for r in rows],
             [float(DENSE[r, j]) for r in rows])
        )
    df = spark.createDataFrame(
        [(cols,)],
        "cols: array<struct<size:int, indices:array<int>, "
        "values:array<double>>>",
    )
    return df.select(
        cols_to_csc(F.col("cols"), DENSE.shape[0]).alias("csc")
    )


def test_csc_roundtrip_and_col_locate(spark):
    df = _csc_df(spark)
    c = df.collect()[0]["csc"]
    assert (c["n_rows"], c["n_cols"]) == DENSE.shape
    assert c["indptr"] == [0, 2, 4, 4, 6]  # empty column 2 collapses
    # column locate: col 1 = rows 1,4 values 3,5; empty col 2
    got1 = df.select(csc_col(F.col("csc"), 1).alias("c")).collect()[0]["c"]
    assert got1["indices"] == [1, 4] and got1["values"] == [3.0, 5.0]
    got2 = df.select(csc_col(F.col("csc"), 2).alias("c")).collect()[0]["c"]
    assert got2["indices"] == [] and got2["values"] == []
    # full inverse
    back = df.select(csc_to_cols(F.col("csc")).alias("cols")).collect()[0][
        "cols"
    ]
    for j, col in enumerate(back):
        rows = list(np.nonzero(DENSE[:, j])[0])
        assert col["indices"] == rows
        assert col["values"] == [float(DENSE[r, j]) for r in rows]


def test_csc_vtm_matches_numpy(spark):
    out = (
        _csc_df(spark)
        .select(
            csc_vtm(
                F.col("csc"), F.lit(X5.tolist()).cast("array<double>")
            ).alias("y")
        )
        .collect()[0]["y"]
    )
    assert out == list(X5 @ DENSE)


def _bsr_df(spark, bh=2, bw=2):
    """Build the BSR batch for a 6x4 block matrix (DENSE padded by a
    zero row → clean 2x2 tiling), storing only nonzero tiles —
    deliberately OUT of canonical order to exercise the sort."""
    padded = np.vstack([DENSE, np.zeros((1, 4))])  # 6x4
    blocks = []
    for br in range(padded.shape[0] // bh):
        for bc in range(padded.shape[1] // bw):
            tile = padded[br * bh : (br + 1) * bh, bc * bw : (bc + 1) * bw]
            if np.any(tile):
                blocks.append((br, bc, [float(v) for v in tile.ravel()]))
    blocks.reverse()  # non-canonical input order
    df = spark.createDataFrame(
        [(blocks,)],
        "blocks: array<struct<brow:int, bcol:int, block:array<double>>>",
    )
    return (
        df.select(
            blocks_to_bsr(
                F.col("blocks"), padded.shape[0], padded.shape[1], bh, bw
            ).alias("bsr")
        ),
        padded,
        sorted((b, c) for b, c, _ in blocks),
    )


def test_bsr_roundtrip(spark):
    df, padded, want_slots = _bsr_df(spark)
    b = df.collect()[0]["bsr"]
    assert (b["n_rows"], b["n_cols"], b["bh"], b["bw"]) == (6, 4, 2, 2)
    assert len(b["indptr"]) == 6 // 2 + 1
    assert b["indptr"][-1] == len(want_slots)
    back = df.select(bsr_to_blocks(F.col("bsr")).alias("bl")).collect()[0][
        "bl"
    ]
    assert [(x["brow"], x["bcol"]) for x in back] == want_slots
    for x in back:
        tile = padded[
            x["brow"] * 2 : x["brow"] * 2 + 2,
            x["bcol"] * 2 : x["bcol"] * 2 + 2,
        ]
        assert x["block"] == [float(v) for v in tile.ravel()]


def test_bsr_spmv_matches_numpy(spark):
    df, padded, _ = _bsr_df(spark)
    x4 = np.array([1.0, -2.0, 0.5, 3.0])
    out = df.select(
        bsr_spmv(F.col("bsr"), F.lit(x4.tolist()).cast("array<double>")).alias(
            "y"
        )
    ).collect()[0]["y"]
    assert out == list(padded @ x4)


def test_bsr_all_empty_block_row(spark):
    # matrix whose middle block-row stores nothing: spmv yields zeros
    # there and the inverse yields no tiles for it
    df = spark.createDataFrame(
        [([(0, 0, [1.0, 0.0, 0.0, 1.0]), (2, 1, [2.0, 0.0, 0.0, 2.0])],)],
        "blocks: array<struct<brow:int, bcol:int, block:array<double>>>",
    ).select(blocks_to_bsr(F.col("blocks"), 6, 4, 2, 2).alias("bsr"))
    y = df.select(
        bsr_spmv(F.col("bsr"), F.lit([1.0, 1.0, 1.0, 1.0])).alias("y")
    ).collect()[0]["y"]
    assert y == [1.0, 1.0, 0.0, 0.0, 2.0, 2.0]
    back = df.select(bsr_to_blocks(F.col("bsr")).alias("b")).collect()[0]["b"]
    assert [(x["brow"], x["bcol"]) for x in back] == [(0, 0), (2, 1)]


def test_empty_batches_are_legal_values(spark):
    """Round-5 review fix: a 0-row/0-column batch must round-trip and
    multiply, not walk sequence(0,-1)=[0,-1] into an ANSI index error."""
    from ml_data_pipeline_spark.functions.sparse import (
        csr_spmv,
        csr_to_rows,
        rows_to_csr,
    )

    empty_cols = spark.createDataFrame(
        [([],)],
        "cols: array<struct<size:int, indices:array<int>, "
        "values:array<double>>>",
    ).select(cols_to_csc(F.col("cols"), 0).alias("csc"))
    r = empty_cols.select(
        csc_to_cols(F.col("csc")).alias("cols"),
        csc_vtm(F.col("csc"), F.lit([1.0])).alias("y"),
    ).collect()[0]
    assert r["cols"] == [] and r["y"] == []

    empty_rows = spark.createDataFrame(
        [([],)],
        "rows: array<struct<size:int, indices:array<int>, "
        "values:array<double>>>",
    ).select(rows_to_csr(F.col("rows"), 0).alias("csr"))
    r = empty_rows.select(
        csr_to_rows(F.col("csr")).alias("rows"),
        csr_spmv(F.col("csr"), F.lit([1.0])).alias("y"),
    ).collect()[0]
    assert r["rows"] == [] and r["y"] == []

    empty_bsr = spark.createDataFrame(
        [([],)],
        "blocks: array<struct<brow:int, bcol:int, block:array<double>>>",
    ).select(blocks_to_bsr(F.col("blocks"), 0, 0, 2, 2).alias("bsr"))
    r = empty_bsr.select(
        bsr_to_blocks(F.col("bsr")).alias("bl"),
        bsr_spmv(F.col("bsr"), F.lit([1.0])).alias("y"),
    ).collect()[0]
    assert r["bl"] == [] and r["y"] == []


def test_bsr_rejects_ragged_shapes():
    """n_rows/n_cols must tile exactly — a ragged edge would make
    bsr_spmv index the dense vector past n_cols (review-verified ANSI
    crash at multiply time); reject at construction instead."""
    import pytest

    with pytest.raises(ValueError, match="multiple of bh"):
        blocks_to_bsr(F.lit([]), 5, 4, 2, 2)
    with pytest.raises(ValueError, match="multiple of bw"):
        blocks_to_bsr(F.lit([]), 4, 3, 2, 2)
