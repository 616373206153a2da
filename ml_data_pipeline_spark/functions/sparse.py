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
        F.sequence(F.lit(0), csr["n_rows"] - 1),
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
        F.sequence(F.lit(0), csr["n_rows"] - 1),
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
