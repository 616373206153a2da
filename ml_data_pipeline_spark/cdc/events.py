"""Change-event model + deterministic synthetic change-stream generator.

The change log is the engine's source: insert/update/delete events for
pre-tokenized training sequences (input_hint shape: ``doc_id:string,
tokens:array<int32>, n_tok:int32, source:string``), each carrying a
globally unique, strictly increasing LSN ``seq``.

Reference analog: the record-framing + offset-tracking source contract
(/root/reference/ml-data/ml-data-readers/src/binary.rs:92-107,212-217 —
TFRecord offset/length per record) maps to ``seq`` as the logical
offset; corrupt-frame detection maps to Parquet checksums.

Generation is **fully distributed and deterministic**: every column is
a pure expression of ``seq`` and the seed via ``xxhash64`` — no
driver-side materialization, no RNG state. At 10^10 events this is a
``spark.range`` scan, embarrassingly parallel, with nothing to ship
from the driver. The pytest oracle never re-derives this math; it
reduces the *written* event files, so generator and oracle cannot
share a bug.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

VOCAB = 50257
MAX_TOKENS_DEFAULT = 64

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_SOURCES = ["web", "books", "code", "wiki"]


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic 64-bit hash column: mix(seed, tag, cols...)."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _pm(col: F.Column, n: int) -> F.Column:
    return F.pmod(col, F.lit(n))


def change_events_df(
    spark: SparkSession,
    n_docs: int,
    n_events: int,
    *,
    seed: int = 42,
    hot_key_fraction: float = 0.0,
    delete_fraction: float = 0.05,
    max_tokens: int = MAX_TOKENS_DEFAULT,
    extra_cols: bool = False,
    seq_start: int = 0,
) -> DataFrame:
    """Deterministic change stream as a DataFrame of CHANGE_SCHEMA rows.

    ``hot_key_fraction``: fraction of events routed to doc_id 0 (the
    skew fixture). ``extra_cols`` adds a ``lang`` column (schema-
    evolution fixture, FIXTURES.md A3). ``seq_start`` offsets the LSN
    range so multiple epochs share one LSN space.
    """
    df = spark.range(seq_start, seq_start + n_events, 1).withColumnRenamed(
        "id", "seq"
    )
    s = F.col("seq")

    hot = _pm(_h(seed, "hot", s), 10_000) < int(hot_key_fraction * 10_000)
    doc_idx = F.when(hot, F.lit(0)).otherwise(_pm(_h(seed, "doc", s), n_docs))
    df = df.withColumn("doc_id", F.format_string("doc-%08d", doc_idx))

    # op: first-ever touch of a doc is modeled as I; later U; a slice D.
    del_roll = _pm(_h(seed, "del", s), 10_000) < int(delete_fraction * 10_000)
    df = df.withColumn(
        "op",
        F.when(del_roll, F.lit("D")).otherwise(
            F.when(s < n_docs, F.lit("I")).otherwise(F.lit("U"))
        ),
    )

    ln = (_pm(_h(seed, "len", s), max_tokens) + F.lit(1)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: _pm(_h(seed, "tok", s, i), VOCAB).cast("int"),
    )
    df = df.withColumn(
        "tokens", F.when(F.col("op") == "D", F.lit(None)).otherwise(tokens)
    )
    df = df.withColumn(
        "n_tok",
        F.when(F.col("op") == "D", F.lit(None)).otherwise(F.size("tokens")).cast(
            "int"
        ),
    )
    src = F.element_at(
        F.array(*[F.lit(x) for x in _SOURCES]), (_pm(_h(seed, "src", s), 4) + 1).cast("int")
    )
    df = df.withColumn(
        "source", F.when(F.col("op") == "D", F.lit(None)).otherwise(src)
    )
    jitter = _pm(_h(seed, "ts", s), 120) - F.lit(60)  # late-data jitter, ±60s
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=(s + jitter).cast("double")),
    )
    if extra_cols:
        lang = F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (_pm(_h(seed, "lang", s), 3) + 1).cast("int"),
        )
        df = df.withColumn(
            "lang", F.when(F.col("op") == "D", F.lit(None)).otherwise(lang)
        )
    return df


def generate_change_stream(
    spark: SparkSession,
    out_dir: str,
    n_docs: int,
    n_events: int,
    *,
    n_chunks: int = 8,
    seed: int = 42,
    hot_key_fraction: float = 0.0,
    delete_fraction: float = 0.05,
    dup_fraction: float = 0.0,
    shuffle_window: int = 0,
    max_tokens: int = MAX_TOKENS_DEFAULT,
    extra_cols: bool = False,
    seq_start: int = 0,
) -> list[str]:
    """Write the change stream as ``n_chunks`` Parquet delivery chunks.

    Chunks model binlog segments (directories ``chunk=K/``): each is
    one ingest unit for the streaming file source. ``shuffle_window``
    displaces events across chunk boundaries (out-of-order delivery);
    ``dup_fraction`` re-delivers a slice of events in a *later* chunk
    (at-least-once delivery). Both must be absorbed by the engine's
    max-seq semantics — which also makes file-arrival ordering across
    chunks irrelevant, so the whole stream is written in ONE
    partitioned job (a per-chunk loop would re-evaluate the generator
    n_chunks times). Returns the chunk directories in delivery order.
    """
    df = change_events_df(
        spark,
        n_docs,
        n_events,
        seed=seed,
        hot_key_fraction=hot_key_fraction,
        delete_fraction=delete_fraction,
        max_tokens=max_tokens,
        extra_cols=extra_cols,
        seq_start=seq_start,
    )
    per = max(1, n_events // n_chunks)
    s = F.col("seq") - F.lit(seq_start)
    disp = s
    if shuffle_window > 0:
        disp = s + _pm(_h(seed, "ooo", s), 2 * shuffle_window + 1) - F.lit(
            shuffle_window
        )
    chunk = F.least(
        F.greatest((disp / per).cast("int"), F.lit(0)), F.lit(n_chunks - 1)
    )
    df = df.withColumn("chunk", chunk)
    if dup_fraction > 0:
        dup = df.where(
            _pm(_h(seed, "dup", s), 10_000) < int(dup_fraction * 10_000)
        ).withColumn(
            "chunk",
            F.least(F.col("chunk") + F.lit(1), F.lit(n_chunks - 1)),
        )
        df = df.unionByName(dup)

    os.makedirs(out_dir, exist_ok=True)
    # Several files per core per chunk: micro-batch scan parallelism is
    # bounded by file count (a one-row-group parquet file is
    # unsplittable), so binlog segments must be written fine-grained
    # enough for the consumers' cluster.
    files_per_chunk = max(2, spark.sparkContext.defaultParallelism)
    df = df.withColumn("_file", _pm(_h(seed, "file", F.col("seq")), files_per_chunk))
    (
        df.repartition(n_chunks * files_per_chunk, "chunk", "_file")
        .drop("_file")
        .write.mode("append")
        .partitionBy("chunk")
        .parquet(out_dir)
    )
    return [os.path.join(out_dir, f"chunk={i}") for i in range(n_chunks)]
