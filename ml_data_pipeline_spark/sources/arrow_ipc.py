"""Arrow IPC file reader/writer (reference S6/K4 parity).

The reference ships a full Arrow IPC (Feather v2) file reader/writer
(/root/reference/ml-data/ml-data-readers/src/arrow/reader.rs:41-239,
arrow/writer.rs:1-135). Spark uses Arrow internally as the pandas-UDF
wire format but has no IPC *file* datasource; this module adds one
with the same distributed shape as the TFRecord source:

* **Writer** — ``write_ipc``: each Spark partition serializes its rows
  to one ``.arrow`` file via ``mapInPandas`` (executor-side pyarrow,
  zero driver involvement, one file per non-empty partition — the
  many-files sharding a 100 TB corpus needs).
* **Reader** — ``read_ipc``: ``binaryFile`` datasource → ``mapInPandas``
  pyarrow IPC parse. IPC files are not block-splittable (the footer
  holds the record-batch index), so parallelism is per-file — same as
  the reference's one-reader-per-file model; shard into many files.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("rows", T.LongType()),
    ]
)


def write_ipc(df: DataFrame, out_dir: str) -> list[tuple[str, int]]:
    """Write ``df`` as Arrow IPC files, one per non-empty partition.

    Returns the manifest [(path, rows)]. The write itself happens on
    executors; only the tiny manifest is collected.
    """
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        from pyspark import TaskContext

        tables = [
            pa.Table.from_pandas(pdf, preserve_index=False)
            for pdf in batches
            if len(pdf)
        ]
        if not tables:
            return
        t = pa.concat_tables(tables)
        # Task-commit protocol: the FINAL name is deterministic in the
        # partition id, the write goes to a uuid temp name, and the
        # atomic rename publishes it — a retried or speculative task
        # attempt republishes identical content over the same name
        # instead of leaving a second file for readers to double-count.
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.arrow")
        tmp = os.path.join(out_dir, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        os.replace(tmp, path)
        yield pd.DataFrame({"path": [path], "rows": [t.num_rows]})

    manifest = df.mapInPandas(_write, MANIFEST_SCHEMA).collect()
    return [(r["path"], r["rows"]) for r in manifest]


def read_ipc(
    spark: SparkSession, path_glob: str, schema: T.StructType
) -> DataFrame:
    """Distributed Arrow IPC scan: binaryFile source + pyarrow parse."""
    files = spark.read.format("binaryFile").load(path_glob)
    names = [f.name for f in schema.fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            for content in pdf["content"]:
                reader = pa.ipc.open_file(pa.BufferReader(bytes(content)))
                yield reader.read_all().to_pandas()[names]

    return files.select("content").mapInPandas(_parse, schema)


def arrow_ipc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: documents → distributed IPC write →
    distributed IPC read → aggregate. Lossless roundtrip ⇒ the DuckDB
    oracle aggregates the original parquet table."""
    import tempfile

    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = os.path.join(
        tempfile.gettempdir(), f"arrow-ipc-{os.path.basename(sf_dir)}"
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_ipc(d, out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = read_ipc(spark, os.path.join(out, "*.arrow"), schema)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )
