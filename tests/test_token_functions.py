"""Vectorized token-array transform tests (functions/tokens.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ml_data_pipeline_spark.functions import tokens as TK


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "id int, tokens array<int>"
    )


def test_builtin_transforms(spark):
    df = _df(spark, [[1, 2, 2, 3], [], [5]])
    out = df.select(
        TK.n_tok(F.col("tokens")).alias("n"),
        TK.truncate(F.col("tokens"), 2).alias("tr"),
        TK.pad_to(F.col("tokens"), 4, pad_id=-1).alias("pad"),
        TK.clip_vocab(F.col("tokens"), 3).alias("clip"),
    ).collect()
    assert [r["n"] for r in out] == [4, 0, 1]
    assert out[0]["tr"] == [1, 2]
    assert out[2]["pad"] == [5, -1, -1, -1]
    assert out[0]["clip"] == [1, 2, 2, 2]


def test_fingerprint_properties(spark):
    rows = [[1, 2, 3], [3, 2, 1], [1, 2, 3], [], None, [1], [1, 2, 3, 4]]
    df = _df(spark, rows)
    fps = [
        r["fp"]
        for r in df.select(TK.token_fingerprint("tokens").alias("fp"))
        .collect()
    ]
    assert fps[0] == fps[2]  # deterministic
    assert fps[0] != fps[1]  # order-sensitive
    assert fps[3] == fps[4] == 0  # empty/null → 0
    assert fps[0] != fps[6]  # prefix-extension changes hash
    # matches a straightforward per-row reference implementation
    def ref(v):
        if not v:
            return 0
        p = np.uint64(1099511628211)
        h = np.uint64(0)
        acc = np.uint64(1)
        for x in v:
            h += (np.uint64(x) + np.uint64(0x9E3779B9)) * acc
            acc *= p
        return int((h + np.uint64(len(v))).astype(np.int64))

    for v, fp in zip(rows, fps):
        assert fp == ref(v), v


def test_entropy_and_rle(spark):
    df = _df(spark, [[1, 1, 1, 1], [1, 2, 3, 4], [1, 1, 2, 2, 3]])
    out = df.select(
        TK.token_entropy("tokens").alias("ent"),
        TK.dedupe_consecutive("tokens").alias("rle"),
    ).collect()
    assert out[0]["ent"] == 0.0
    assert abs(out[1]["ent"] - 2.0) < 1e-9
    assert out[0]["rle"] == [1]
    assert out[2]["rle"] == [1, 2, 3]


def test_ngram_hashes_detect_shared_ngrams(spark):
    df = _df(spark, [[1, 2, 3, 4, 5], [9, 1, 2, 3, 8], [7, 7, 7]])
    out = df.select(TK.ngram_hashes(F.col("tokens"), 3).alias("h")).collect()
    a, b, c = (set(r["h"]) for r in out)
    assert a & b  # share the [1,2,3] trigram
    assert not (a & c)
    assert len(out[0]["h"]) == 3  # 5 tokens → 3 trigrams


def test_stats_columns(spark):
    df = _df(spark, [[4, 1, 4, 2]])
    row = df.select(*TK.stats_columns(F.col("tokens"))).collect()[0]
    assert (row["n_tok"], row["tok_min"], row["tok_max"], row["n_distinct_tok"]) == (
        4,
        1,
        4,
        3,
    )


def test_ngram_hashes_short_and_empty_arrays(spark):
    """Arrays shorter than n have NO n-grams — previously
    sequence(1,0)=[1,0] walked slice(tokens, 0, n) into an ANSI
    error (review-probe verified crash)."""
    df = spark.createDataFrame(
        [([1, 2],), ([],), ([1, 2, 3, 4],)], "tokens: array<int>"
    )
    out = df.select(TK.ngram_hashes(F.col("tokens"), 3).alias("h")).collect()
    assert [len(r["h"]) for r in out] == [0, 0, 2]
