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

CSR (the 2-D row-compressed layout) degenerates to COO per row once a
matrix is a DataFrame of row vectors — which is exactly how tensors
are represented here, so COO is the complete mapping.
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
