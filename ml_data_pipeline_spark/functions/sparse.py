"""Sparse tensor mapping: COO vectors as (indices, values) structs.

The reference's tensor module carries COO/CSR sparse layouts
(/root/reference/ml-data/ml-data-core/src/tensor.rs:429-453); SURVEY
§1.3 maps them to a struct of parallel arrays. The 1-D (vector) case
is what the embedding pipeline needs: a mostly-zero feature vector
stored as ``struct(size:int, indices:array<int>, values:array<…>)``.

Everything here is built-in higher-order array expressions —
JVM-side, whole-stage-codegen'd, no UDF:

* ``to_sparse(col)`` — dense array → COO struct (drop zeros).
* ``from_sparse(col)`` — COO struct → dense array (exact inverse).
* ``sparse_dot(a, b)`` — dot of a sparse vector with a DENSE vector:
  fold over the nonzeros only, O(nnz) per row. This is the layout's
  payoff: scoring a sparse query against dense embeddings touches
  only the stored entries.
* ``sparse_nnz`` / ``sparse_density`` — bookkeeping expressions.

CSR (the 2-D row-compressed layout, reference schema.rs:126-138 /
tensor.rs:429-453) is carried as a per-DataFrame-row BATCH struct
``struct(n_rows, n_cols, indptr, indices, values)`` — one CSR matrix
per row, built from a group of COO row vectors (``rows_to_csr``) and
decomposed back (``csr_to_rows``), with O(nnz) ops (``csr_spmv``,
``csr_row``). A matrix that spans the whole DataFrame stays COO-per-
row (the distributed layout); CSR batches are the BATCH-LOCAL dense-
packed form the reference ships between operators.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_sparse(dense: Column) -> Column:
    """Dense ``array<numeric>`` → ``struct(size, indices, values)``
    keeping only nonzero entries (0-based indices, ascending).

    NULL elements are treated as zeros (dropped) — the COO contract
    is "missing = zero", so ``from_sparse(to_sparse(x))`` maps NULLs
    to 0, matching the reference's dense-fill semantics
    (tensor.rs: sparse slots materialize as the zero value)."""
    indexed = F.filter(
        F.transform(
            dense, lambda v, i: F.struct(i.alias("i"), v.alias("v"))
        ),
        lambda s: s["v"] != 0,
    )
    return F.struct(
        F.size(dense).alias("size"),
        F.transform(indexed, lambda s: s["i"]).alias("indices"),
        F.transform(indexed, lambda s: s["v"]).alias("values"),
    )


def from_sparse(sp: Column, zero=None) -> Column:
    """``struct(size, indices, values)`` → dense array (exact inverse
    of ``to_sparse``). ``zero`` overrides the fill literal (defaults
    to 0 cast to the value type)."""
    fill = F.lit(0) if zero is None else F.lit(zero)

    def _at(j):
        # element_at is 1-based; array_position returns 0 when absent
        # (and element_at(_, 0) is an ANSI error, so guard the branch)
        pos = F.array_position(sp["indices"], j).cast("int")
        return F.when(pos > 0, F.element_at(sp["values"], pos)).otherwise(
            fill  # Catalyst coerces the literal to the value type
        )

    # guard size=0: sequence(0, -1) infers step -1 and yields [0, -1]
    # — an empty vector must round-trip to an empty array, not [0, 0]
    return F.when(
        sp["size"] > 0,
        F.transform(F.sequence(F.lit(0), sp["size"] - 1), _at),
    ).otherwise(F.filter(sp["values"], lambda _: F.lit(False)))


def sparse_dot(sp: Column, dense: Column) -> Column:
    """Dot product of a COO sparse vector with a dense vector: fold
    over the nonzeros only — O(nnz), not O(size)."""
    pairs = F.zip_with(
        sp["indices"],
        sp["values"],
        lambda i, v: v.cast("double")
        * F.element_at(dense, (i + 1).cast("int")).cast("double"),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def sparse_nnz(sp: Column) -> Column:
    return F.size(sp["indices"])


def sparse_density(sp: Column) -> Column:
    return F.size(sp["indices"]) / sp["size"]


def _seq0(n: Column) -> Column:
    """Ascending ``[0, …, n-1]`` that is EMPTY for ``n <= 0``. Spark's
    ``sequence(0, -1)`` infers step -1 and yields the descending
    ``[0, -1]``, so an unguarded 0-length batch walks out-of-range
    indices (ANSI error) — every per-row/per-column iteration below
    goes through this guard."""
    return F.when(
        n > 0, F.sequence(F.lit(0), (n - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))


# --------------------------------------------------------------- CSR batch


def rows_to_csr(rows: Column, n_cols: Column | int) -> Column:
    """Array of COO row structs (in row order) → one CSR batch struct
    ``(n_rows, n_cols, indptr, indices, values)``.

    Typical use: ``groupBy(batch).agg(collect_list(struct(row_id,
    sp)))`` → ``array_sort`` → ``transform(…, x -> x.sp)`` →
    ``rows_to_csr`` — the batch is ONE DataFrame row, so construction
    cost is batch-local. ``indptr`` is
    the classic prefix-sum of row nnz (``indptr[i]``..``indptr[i+1]``
    brackets row i's entries); built with an array fold, O(rows²)
    element copies per batch — fine at the 10³-10⁴ rows a batch holds,
    and the DISTRIBUTED layout across batches stays COO-per-row.
    All JVM higher-order expressions; no UDF."""
    nc = F.lit(n_cols) if isinstance(n_cols, int) else n_cols
    nnzs = F.transform(rows, lambda r: F.size(r["indices"]))
    indptr = F.aggregate(
        nnzs,
        F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    return F.struct(
        F.size(rows).alias("n_rows"),
        nc.cast("int").alias("n_cols"),
        indptr.alias("indptr"),
        F.flatten(F.transform(rows, lambda r: r["indices"])).alias("indices"),
        F.flatten(F.transform(rows, lambda r: r["values"])).alias("values"),
    )


def csr_row(csr: Column, i: Column | int) -> Column:
    """Row ``i`` (0-based) of a CSR batch as a COO struct — O(nnz_row)
    via two indptr lookups + slice, the layout's O(1)-row-locate
    payoff."""
    ix = F.lit(i) if isinstance(i, int) else i
    start = F.element_at(csr["indptr"], (ix + 1).cast("int"))
    end = F.element_at(csr["indptr"], (ix + 2).cast("int"))
    n = (end - start).cast("int")
    return F.struct(
        csr["n_cols"].alias("size"),
        F.slice(csr["indices"], start + 1, n).alias("indices"),
        F.slice(csr["values"], start + 1, n).alias("values"),
    )


def csr_to_rows(csr: Column) -> Column:
    """CSR batch → array of COO row structs (inverse of
    ``rows_to_csr``); explode to recover the distributed layout."""
    return F.transform(
        _seq0(csr["n_rows"]),
        lambda i: csr_row(csr, i),
    )


def csr_spmv(csr: Column, dense: Column) -> Column:
    """CSR batch × dense vector → ``array<double>`` of length n_rows.
    One zip over (indices, values) scales every stored entry by its
    column's vector component, then each row folds its indptr-
    bracketed slice — O(nnz) multiplies total, never O(n_rows·n_cols).
    """
    scaled = F.zip_with(
        csr["indices"],
        csr["values"],
        lambda i, v: v.cast("double")
        * F.element_at(dense, (i + 1).cast("int")).cast("double"),
    )
    return F.transform(
        _seq0(csr["n_rows"]),
        lambda r: F.aggregate(
            F.slice(
                scaled,
                F.element_at(csr["indptr"], (r + 1).cast("int")) + 1,
                (
                    F.element_at(csr["indptr"], (r + 2).cast("int"))
                    - F.element_at(csr["indptr"], (r + 1).cast("int"))
                ).cast("int"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def csr_nnz(csr: Column) -> Column:
    return F.size(csr["indices"])


# --------------------------------------------------------------- CSC batch
# Column-compressed twin of the CSR batch (reference schema.rs:126-138
# lists COO/CSR/CSC/BSR; round 5 completes the set). Same parallel-array
# struct, compressed along columns: ``(n_rows, n_cols, indptr[n_cols+1],
# row_indices, values)`` with entries in column-major order. All pure
# JVM higher-order expressions, batch-local like CSR.


def cols_to_csc(cols: Column, n_rows: Column | int) -> Column:
    """Array of COO COLUMN structs (in column order, indices = row ids)
    → one CSC batch struct. Mirror of :func:`rows_to_csr`."""
    nr = F.lit(n_rows) if isinstance(n_rows, int) else n_rows
    nnzs = F.transform(cols, lambda c: F.size(c["indices"]))
    indptr = F.aggregate(
        nnzs,
        F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    return F.struct(
        nr.cast("int").alias("n_rows"),
        F.size(cols).alias("n_cols"),
        indptr.alias("indptr"),
        F.flatten(F.transform(cols, lambda c: c["indices"])).alias(
            "row_indices"
        ),
        F.flatten(F.transform(cols, lambda c: c["values"])).alias("values"),
    )


def csc_col(csc: Column, j: Column | int) -> Column:
    """Column ``j`` (0-based) of a CSC batch as a COO struct — two
    indptr lookups + slice, the column-locate payoff (CSR's weak
    axis)."""
    jx = F.lit(j) if isinstance(j, int) else j
    start = F.element_at(csc["indptr"], (jx + 1).cast("int"))
    end = F.element_at(csc["indptr"], (jx + 2).cast("int"))
    n = (end - start).cast("int")
    return F.struct(
        csc["n_rows"].alias("size"),
        F.slice(csc["row_indices"], start + 1, n).alias("indices"),
        F.slice(csc["values"], start + 1, n).alias("values"),
    )


def csc_to_cols(csc: Column) -> Column:
    """CSC batch → array of COO column structs (inverse of
    :func:`cols_to_csc`)."""
    return F.transform(
        _seq0(csc["n_cols"]),
        lambda j: csc_col(csc, j),
    )


def csc_vtm(csc: Column, dense: Column) -> Column:
    """Vector-transpose-matrix ``xᵀA`` for a CSC batch: out[j] =
    dot(column j, x) — each column folds its indptr-bracketed slice of
    entries scaled by the matching x component. O(nnz) multiplies
    total (CSC's natural product; the row-major ``csr_spmv`` is the
    CSR twin)."""
    scaled = F.zip_with(
        csc["row_indices"],
        csc["values"],
        lambda i, v: v.cast("double")
        * F.element_at(dense, (i + 1).cast("int")).cast("double"),
    )
    return F.transform(
        _seq0(csc["n_cols"]),
        lambda c: F.aggregate(
            F.slice(
                scaled,
                F.element_at(csc["indptr"], (c + 1).cast("int")) + 1,
                (
                    F.element_at(csc["indptr"], (c + 2).cast("int"))
                    - F.element_at(csc["indptr"], (c + 1).cast("int"))
                ).cast("int"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


# --------------------------------------------------------------- BSR batch
# Block-sparse-row batch: dense (bh × bw) tiles compressed row-of-blocks
# wise — ``(n_rows, n_cols, bh, bw, indptr[n_block_rows+1], bcols,
# values)`` where ``values`` concatenates each stored block's bh·bw
# row-major elements in slot order. The layout for block-structured
# sparsity (e.g. attention masks, blocked adjacency), where per-element
# COO/CSR index overhead is bh·bw× larger.


def blocks_to_bsr(
    blocks: Column,
    n_rows: Column | int,
    n_cols: Column | int,
    bh: int,
    bw: int,
) -> Column:
    """Array of ``struct(brow, bcol, block:array<double>)`` (bh·bw
    row-major elements each) → one BSR batch struct. Blocks are
    canonicalized by (brow, bcol) sort; (brow, bcol) must be unique.

    The matrix shape must tile exactly: ``n_rows % bh == 0`` and
    ``n_cols % bw == 0`` (pad the edge tiles with zeros otherwise) —
    a ragged edge would make ``bsr_spmv`` index the dense vector past
    ``n_cols``. Validated here when the dims are Python ints (the
    normal path); Column-typed dims carry the same contract."""
    if isinstance(n_rows, int) and n_rows % bh != 0:
        raise ValueError(
            f"n_rows={n_rows} is not a multiple of bh={bh}; pad the "
            "edge block rows with zeros"
        )
    if isinstance(n_cols, int) and n_cols % bw != 0:
        raise ValueError(
            f"n_cols={n_cols} is not a multiple of bw={bw}; pad the "
            "edge block columns with zeros"
        )
    nr = F.lit(n_rows) if isinstance(n_rows, int) else n_rows
    nc = F.lit(n_cols) if isinstance(n_cols, int) else n_cols
    srt = F.array_sort(blocks)  # struct order = field order = (brow, bcol)
    n_brows = F.floor((nr.cast("int") + (bh - 1)) / bh).cast("int")
    nnzs = F.transform(
        _seq0(n_brows),
        lambda br: F.size(F.filter(srt, lambda b: b["brow"] == br)),
    )
    indptr = F.aggregate(
        nnzs,
        F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    return F.struct(
        nr.cast("int").alias("n_rows"),
        nc.cast("int").alias("n_cols"),
        F.lit(bh).alias("bh"),
        F.lit(bw).alias("bw"),
        indptr.alias("indptr"),
        F.transform(srt, lambda b: b["bcol"]).alias("bcols"),
        F.flatten(F.transform(srt, lambda b: b["block"])).alias("values"),
    )


def bsr_to_blocks(bsr: Column) -> Column:
    """BSR batch → array of ``struct(brow, bcol, block)`` (inverse of
    :func:`blocks_to_bsr`, canonical order)."""
    bsz = bsr["bh"] * bsr["bw"]

    def row_blocks(br):
        start = F.element_at(bsr["indptr"], (br + 1).cast("int"))
        end = F.element_at(bsr["indptr"], (br + 2).cast("int"))
        # guard the empty block-row: sequence(s, s-1, 1) is an error
        return F.when(
            end > start,
            F.transform(
                F.sequence(start, end - 1, F.lit(1)),
                lambda p: F.struct(
                    br.cast("int").alias("brow"),
                    F.element_at(bsr["bcols"], (p + 1).cast("int")).alias(
                        "bcol"
                    ),
                    F.slice(
                        bsr["values"], p * bsz + 1, bsz.cast("int")
                    ).alias("block"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<brow:int,bcol:int,block:array<double>>>"
            )
        )

    n_brows = F.size(bsr["indptr"]) - 1
    return F.flatten(
        F.filter(
            F.transform(_seq0(n_brows), lambda br: row_blocks(br)),
            lambda arr: F.size(arr) > 0,
        )
    )


def bsr_spmv(bsr: Column, dense: Column) -> Column:
    """BSR batch × dense vector → ``array<double>`` of length n_rows.
    Each output row folds only its block-row's stored tiles (block
    slot → bw multiplies against the tile's row r); total multiplies =
    stored elements, i.e. O(nnz) in the BSR sense — never
    O(n_rows·n_cols)."""
    bsz = bsr["bh"] * bsr["bw"]

    def out_i(i):
        br = F.floor(i / bsr["bh"])
        r = i % bsr["bh"]
        start = F.element_at(bsr["indptr"], (br + 1).cast("int"))
        end = F.element_at(bsr["indptr"], (br + 2).cast("int"))
        # empty block-row → no stored tiles → 0.0 (guard the sequence)
        return F.when(end <= start, F.lit(0.0)).otherwise(F.aggregate(
            F.sequence(start, end - 1, F.lit(1)),
            F.lit(0.0),
            lambda acc, p: acc
            + F.aggregate(
                F.sequence(F.lit(0), bsr["bw"] - 1),
                F.lit(0.0),
                lambda a2, w: a2
                + F.element_at(
                    bsr["values"],
                    (p * bsz + r * bsr["bw"] + w + 1).cast("int"),
                ).cast("double")
                * F.element_at(
                    dense,
                    (
                        F.element_at(bsr["bcols"], (p + 1).cast("int"))
                        * bsr["bw"]
                        + w
                        + 1
                    ).cast("int"),
                ).cast("double"),
            ),
        ))

    return F.transform(_seq0(bsr["n_rows"]), out_i)
