"""Source/sink + encoding parity operators (reference S1/S3/S7, K2,
T5/T6/T7).

These demonstrate the reference's reader/writer/encoding surface as
Spark-native round trips whose results are oracle-checkable against
the original parquet tables (a lossless roundtrip must agree).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ml_data_pipeline_spark.sources.tables import load_table


def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV writer + typed reader roundtrip (reference S1 CSV scan with
    options, csv/reader.rs:22-46; K2 writer, csv/writer.rs:14-221):
    write events to CSV with header/quoting, read back with an explicit
    schema, aggregate. Lossless roundtrip ⇒ equals the parquet oracle.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"csv-roundtrip-{os.path.basename(sf_dir)}"
    )
    e.write.mode("overwrite").option("header", True).csv(out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.option("header", True).schema(schema).csv(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .orderBy("event_type")
    )


def text_line_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text/line reader with line numbers (reference S7,
    text.rs:321-513 emits (line_number, text)): write the documents as
    one ordered text file, read with spark.read.text, number lines.
    """
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(), f"text-lines-{os.path.basename(sf_dir)}"
    )
    (
        d.orderBy("doc_id")
        .select("text")
        .coalesce(1)  # single ordered file so line numbers == doc order
        .write.mode("overwrite")
        .text(out)
    )
    lines = spark.read.text(out)
    w = Window.orderBy(F.monotonically_increasing_id())
    numbered = lines.select(
        (F.row_number().over(w) - 1).alias("line_number"),
        F.length("value").alias("line_len"),
    )
    return numbered.orderBy("line_number")


def dictionary_encode_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit dictionary encoding (reference T5, string_cache.rs:
    155-341: string→dense index, encode, decode): build a dense id per
    distinct source string (ordered), encode each doc, verify decode.
    """
    d = load_table(spark, sf_dir, "documents")
    dict_df = (
        d.select("source")
        .distinct()
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
    )
    enc = d.join(F.broadcast(dict_df), "source")
    return (
        enc.groupBy("source", "code")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("code")
    )


def string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rope-style string editing ops (reference T7, text.rs:75-318:
    concat/insert/delete-at-position/substring) as scalar expressions.

    ``ins10`` inserts a marker at char position 10; ``del5_3`` deletes
    3 chars at position 5 — the rope's positional edits, expressed as
    substring splicing (O(n) per row here; the reference's rope makes
    them O(log n) in-place, which Spark's immutable columns don't need).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 20).alias("head20"),
        F.concat(F.lit("["), F.col("lang"), F.lit("] "), F.substring("text", 1, 10)).alias(
            "tagged"
        ),
        F.length(F.regexp_replace("text", "data", "")).alias("len_without_data"),
        F.reverse(F.substring("text", 1, 12)).alias("rev12"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("<INS>"),
            F.expr("substring(text, 11)"),
        ).alias("ins10"),
        F.concat(
            F.substring("text", 1, 4), F.expr("substring(text, 8)")
        ).alias("del5_3"),
    ).orderBy("doc_id")
