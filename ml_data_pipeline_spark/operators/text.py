"""Text analysis operators over the documents table.

The training-data text suite: token counting, quality scoring,
language-ID heuristic, document fingerprinting. Reference analog: the
text reader's line processing (trim/skip/intern,
/root/reference/ml-data/ml-data-readers/src/text.rs:321-513) and rope
string ops (text.rs:75-318) — here as declarative string/array
expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ml_data_pipeline_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to")


def _words(col="text"):
    return F.split(F.col(col), " ")


def token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts per language: docs, tokens, avg.

    ``avg_tokens`` is computed with exact integer arithmetic —
    round-half-up(total/n, 4 digits) as ``(2·total·10⁴ + n) div (2n)``
    over bigints, then one double division by 10⁴. Double-division
    rounding differs between engines at full precision (the round-1
    hash mismatch); integer math is bit-identical everywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_words())
    agg = (
        d.select("lang", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )
    q = F.expr("(2 * total_tokens * 10000 + n_docs) div (2 * n_docs)")
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        (q / F.lit(10000.0)).alias("avg_tokens"),
    ).orderBy("lang")


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, stopword ratio,
    mean word length, and a keep/drop flag (all integer-exact or
    per-row double math — deterministic across engines)."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    n_tok = F.size(w)
    stops = ",".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), t -> t in ({stops})))")
    n_alpha = F.length(F.regexp_replace(F.col("text"), " ", ""))
    out = d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(n_stop / n_tok, 4).alias("stop_ratio"),
        F.round(n_alpha / n_tok, 4).alias("mean_word_len"),
        ((n_tok >= 20) & (n_stop > 0)).alias("keep"),
    )
    return out.orderBy("doc_id")


def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (n-gram heuristic): accuracy vs label.

    A deterministic CASE over marker-word hits; evaluated per language
    with hit counts so the oracle compares exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(t.like("% der %") | t.like("% und %"), "de")
        .when(t.like("% le %") | t.like("% et %"), "fr")
        .when(t.like("% el %") | t.like("% y %"), "es")
        .when(t.like("% zh %"), "zh")
        .otherwise("en")
    )
    return (
        d.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred")
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprints (md5 over lowercased
    alphanumerics) — the document-identity primitive used by exact
    dedup and lineage."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    return d.select(
        "doc_id",
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
    ).orderBy("doc_id")
