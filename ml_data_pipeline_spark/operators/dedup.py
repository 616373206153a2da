"""Deduplication operators over the documents table.

The large-scale-training-pipeline dedup suite: exact (hash-groupBy),
n-gram Jaccard similarity join, and MinHash+LSH banding. Reference
analog: string interning / dictionary dedup
(/root/reference/ml-data/ml-data-readers/src/string_cache.rs:13-152)
— generalized from identical-string dedup to near-duplicate detection.

Everything stays JVM-side (built-in array/string functions, no Python
UDFs). Hashes are md5-based so the DuckDB oracles can reproduce them
bit-for-bit; MinHash uses *lexicographic* min over per-function md5
strings — a valid min-wise hash family that both engines order
identically (ASCII hex).

Scale notes: the shingle self-join is the textbook candidate
generator; its shuffle is bounded by dropping ultra-common shingles
(stop-shingles) — at 100 TB you must, or the hottest shingle key
dominates the join. MinHash+LSH replaces the shingle join's
O(sum-of-squares-per-shingle) blowup with fixed-width band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ml_data_pipeline_spark.sources.tables import load_table

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 → catches pairs with J ≳ 0.5 w.h.p.


def _words(col="text"):
    return F.split(F.col(col), " ")


def _shingles(col="text", k: int = 3):
    """Distinct k-word shingles as strings."""
    w = _words(col)
    n = F.size(w)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(w, i, k), " "),
        )
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, min-doc_id survivor policy.

    The testdata has no duplicate texts, so the corpus is doubled
    (UNION ALL with itself) to make the dedup observable: every text
    then has exactly two copies and one survivor.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionAll(d)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("survivor_doc_id")
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.2
) -> DataFrame:
    """Near-duplicate pairs by exact 3-shingle Jaccard similarity.

    Candidate generation: explode distinct shingles, self-join on the
    shingle, count overlap per pair; J = |A∩B| / (|A|+|B|-|A∩B|).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _shingles().alias("sh")
    )
    sizes = d.select("doc_id", F.size("sh").alias("n_sh"))
    ex = d.select("doc_id", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    overlap = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    j = (
        overlap.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "n_common", "jaccard").orderBy(
        "doc_a", "doc_b"
    )


def _minhash_cols():
    """N_HASHES lexicographic-min md5 columns over exploded shingles."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"mh{i}")
        for i in range(N_HASHES)
    ]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (8 min-wise md5 hashes)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_shingles()).alias("s")
    )
    return d.groupBy("doc_id").agg(*_minhash_cols()).orderBy("doc_id")


def minhash_lsh_candidates(
    spark: SparkSession, sf_dir: str, threshold: float = 0.2
) -> DataFrame:
    """MinHash+LSH near-dup detection: band signatures into buckets,
    take same-bucket pairs as candidates, verify with exact Jaccard.

    Scale path vs ngram_jaccard_pairs: the join key is a fixed-width
    band value instead of raw shingles, so the shuffle is O(docs·bands)
    not O(total shingle occurrences), and hot shingles cannot skew it.
    """
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    n_bands = N_HASHES // BAND_SIZE
    for bnd in range(n_bands):
        cols = [F.col(f"mh{bnd * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bnd).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionAll(x)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Exact verification of candidates only.
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _shingles().alias("sh")
    )
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    ver = (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return ver.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


_HEX = "0123456789abcdef"
SIMHASH_BITS = 8


def _hex_byte(col):
    """First md5 byte as int 0..255 via hex-digit arithmetic — avoids
    engine-specific hex-parse functions so the DuckDB oracle can
    reproduce it exactly (instr-based digit lookup works in both)."""
    h = F.md5(col)
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return d1 * 16 + d2


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over distinct words (8 hyperplanes from md5 bits).

    Classic near-dup sketch: per bit plane j, sum ±1 votes from each
    word's hash bit; the sign becomes signature bit j. Documents with
    small Hamming distance share most words. All integer arithmetic —
    bit-identical across engines; at scale this is a single
    explode+groupBy (no pairwise work).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array_distinct(_words())).alias("w")
    )
    v = _hex_byte(F.col("w"))
    d = d.withColumn("v", v)
    votes = [
        F.sum(
            (F.floor(F.col("v") / F.lit(2**j)) % 2) * 2 - 1
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = d.groupBy("doc_id").agg(*votes)
    sig = None
    for j in range(SIMHASH_BITS):
        bit = (F.col(f"s{j}") > 0).cast("int") * (2**j)
        sig = bit if sig is None else sig + bit
    return agg.select(
        "doc_id", sig.cast("int").alias("simhash")
    ).orderBy("doc_id")


def simhash_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: identical simhash (bucket join) —
    the O(n) candidate generator; verify with exact Jaccard downstream."""
    sig = simhash_signatures(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.simhash") == F.col("b.simhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash"),
        )
        .orderBy("doc_a", "doc_b")
    )
