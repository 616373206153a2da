"""Vectorized token-array transforms (`tokens:array<int32>` columns).

The input_hint mandates pandas/Arrow UDFs — never per-row Python — for
token work. Where a built-in expression exists we use it (JVM-side,
whole-stage codegen beats any UDF); the numpy paths handle what
built-ins can't express efficiently. Reference analog: tensor ops over
1-D buffers (/root/reference/ml-data/ml-data-core/src/tensor.rs:202-275
reshape/slice) and the `Transform` trait surface
(ml-data-core/src/transform.rs:9-54).

Arrow batch shape note: a `tokens` column arrives in a pandas UDF as a
Series of numpy arrays. We concatenate to one flat buffer + offsets to
do the math vectorized (one numpy op per batch, not per row) — the
same flat-buffer + offsets layout the reference's var-length columns
use (ml-data-core/src/column.rs:74-90).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------- built-ins


def n_tok(tokens: Column) -> Column:
    """Token count — built-in `size`, stays in codegen."""
    return F.size(tokens)


def truncate(tokens: Column, max_len: int) -> Column:
    """Head-truncate to max_len — built-in `slice`."""
    return F.slice(tokens, 1, max_len)


def pad_to(tokens: Column, length: int, pad_id: int = 0) -> Column:
    """Right-pad with pad_id to exactly `length` (truncating if longer)."""
    padded = F.concat(
        tokens, F.array_repeat(F.lit(pad_id), length)
    )
    return F.slice(padded, 1, length)


def clip_vocab(tokens: Column, vocab_size: int) -> Column:
    """Clamp token ids into [0, vocab_size) — built-in transform."""
    return F.transform(
        tokens,
        lambda t: F.least(F.greatest(t, F.lit(0)), F.lit(vocab_size - 1)),
    )


# ------------------------------------------------------- vectorized (numpy)


def _flat(series: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a Series of int arrays → (flat values, row offsets)."""
    lens = np.fromiter((0 if v is None else len(v) for v in series), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    if offsets[-1] == 0:
        return np.empty(0, dtype=np.int64), offsets
    flat = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in series if v is not None and len(v)]
    )
    return flat, offsets


_FP_PRIME = np.uint64(1099511628211)


@pandas_udf(T.LongType())
def token_fingerprint(tokens: pd.Series) -> pd.Series:
    """Order-sensitive 64-bit polynomial fingerprint of each token
    array (mod 2^64 via native uint64 wraparound) — the per-doc
    content identity used for dedup/lineage.

    Fully vectorized: rows are flattened to one buffer + offsets,
    position weights are prime powers, and the per-row hash is one
    segmented reduce — no per-element Python.
    """
    flat, offsets = _flat(tokens)
    n = len(tokens)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat):
        pos = np.arange(len(flat), dtype=np.int64)
        starts = np.repeat(offsets[:-1], np.diff(offsets))
        pos_in_row = (pos - starts).astype(np.int64)
        max_len = int(pos_in_row.max()) + 1
        pows = np.empty(max_len, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if max_len > 1:
            np.multiply.accumulate(
                np.full(max_len - 1, _FP_PRIME, dtype=np.uint64),
                out=pows[1:],
            )
        weighted = (flat.astype(np.uint64) + np.uint64(0x9E3779B9)) * pows[
            pos_in_row
        ]
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        sums = np.add.reduceat(weighted, offsets[:-1][nonempty])
        out[nonempty] = sums + np.diff(offsets)[nonempty].astype(np.uint64)
    return pd.Series(out.astype(np.int64))


@pandas_udf(T.DoubleType())
def token_entropy(tokens: pd.Series) -> pd.Series:
    """Shannon entropy (bits) of each row's token distribution —
    quality signal for filtering degenerate sequences."""
    out = np.zeros(len(tokens), dtype=np.float64)
    for i, v in enumerate(tokens):
        if v is None or len(v) == 0:
            continue
        _, counts = np.unique(np.asarray(v), return_counts=True)
        p = counts / counts.sum()
        out[i] = float(-(p * np.log2(p)).sum())
    return pd.Series(out)


@pandas_udf(T.ArrayType(T.IntegerType()))
def dedupe_consecutive(tokens: pd.Series) -> pd.Series:
    """Collapse consecutive repeated tokens (run-length dedup)."""
    def one(v):
        if v is None:
            return None
        a = np.asarray(v)
        if len(a) == 0:
            return a.astype(np.int32)
        keep = np.concatenate([[True], a[1:] != a[:-1]])
        return a[keep].astype(np.int32)

    return tokens.map(one)


def ngram_hashes(tokens: Column, n: int = 3) -> Column:
    """Rolling n-gram hashes of a token array — built-in expression
    (xxhash64 over sliding windows), the candidate-key generator for
    token-level near-dup detection. JVM-side: no Python boundary."""
    # guard arrays shorter than n: sequence(1, 0) is the DESCENDING
    # [1, 0], and slice(tokens, 0, n) is an ANSI error — a short array
    # has no n-grams, full stop
    idx = F.when(
        F.size(tokens) >= n,
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(",", F.slice(tokens, i, n)))
    )


def stats_columns(tokens: Column) -> list[Column]:
    """Cheap per-row token stats as built-in expressions."""
    return [
        F.size(tokens).alias("n_tok"),
        F.array_min(tokens).alias("tok_min"),
        F.array_max(tokens).alias("tok_max"),
        F.size(F.array_distinct(tokens)).alias("n_distinct_tok"),
    ]
