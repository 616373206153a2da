"""HTTP source demo (file:// URLs — no network in the sandbox) and
COO sparse-vector mapping (reference tensor.rs:429-453 parity)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ml_data_pipeline_spark.functions.sparse import (
    from_sparse,
    sparse_density,
    sparse_dot,
    sparse_nnz,
    to_sparse,
)
from ml_data_pipeline_spark.sources.http import read_http


def test_http_source_fetches_files_and_reports_errors(spark, sf_dir):
    files = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))[:3]
    urls = [f"file://{p}" for p in files] + [
        "file:///nonexistent/definitely-missing.bin"
    ]
    got = {
        r["url"]: r
        for r in read_http(spark, urls, partitions=2).collect()
    }
    for p in files:
        r = got[f"file://{p}"]
        assert r["error"] is None
        assert r["length"] == os.path.getsize(p)
        assert bytes(r["content"])[:4] == b"PAR1"  # parquet magic
    bad = got["file:///nonexistent/definitely-missing.bin"]
    assert bad["error"] is not None and bad["content"] is None

    # feeds the existing sniff/decode path: binary column in, no UDF
    # other than the Arrow-batched fetch itself
    plan = (
        read_http(spark, urls)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # Arrow mapInPandas only


def test_http_source_truncates_oversized(spark, sf_dir):
    p = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))[0]
    r = read_http(spark, [f"file://{p}"], max_bytes=100).collect()[0]
    assert r["error"] == "truncated" and r["length"] == 100


def test_sparse_roundtrip_and_dot(spark):
    rows = [
        ([0.0, 1.5, 0.0, -2.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        ([0.0, 0.0, 0.0, 0.0, 0.0, 0.0], [9.0, 9.0, 9.0, 9.0, 9.0, 9.0]),
        ([3.0, 0.0, 0.0, 0.0, 0.0, 0.5], [1.0, 0.0, 0.0, 0.0, 0.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "dense array<double>, other array<double>"
    ).withColumn("sp", to_sparse(F.col("dense")))
    got = df.select(
        "dense",
        from_sparse(F.col("sp")).alias("back"),
        sparse_dot(F.col("sp"), F.col("other")).alias("dot"),
        sparse_nnz(F.col("sp")).alias("nnz"),
        sparse_density(F.col("sp")).alias("density"),
    ).collect()
    import numpy as np

    for r, (dense, other) in zip(got, rows):
        assert r["back"] == dense  # exact roundtrip
        assert abs(r["dot"] - float(np.dot(dense, other))) < 1e-12
        assert r["nnz"] == sum(1 for v in dense if v != 0)
        assert abs(r["density"] - r["nnz"] / len(dense)) < 1e-12

    # stays JVM-side: pure expressions, no Python nodes at all
    plan = df.select(from_sparse(F.col("sp")))._jdf.queryExecution()
    assert "Python" not in plan.executedPlan().toString()


def test_csr_batch_roundtrip_spmv(spark):
    """CSR batch layout (reference schema.rs:126-138): group COO rows
    into one CSR struct, verify indptr/indices/values against scipy-
    style hand math, spmv against numpy, and the row-slice/decompose
    inverses — all pure JVM expressions."""
    import numpy as np

    from ml_data_pipeline_spark.functions.sparse import (
        csr_nnz,
        csr_row,
        csr_spmv,
        csr_to_rows,
        rows_to_csr,
    )

    dense = [
        [0.0, 2.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, 0.0],  # empty row must survive the layout
        [5.0, 0.0, 3.0, 0.0],
    ]
    vec = [1.0, 10.0, 100.0, 1000.0]
    df = spark.createDataFrame(
        [(0, "b", dense[0]), (1, "b", dense[1]), (2, "b", dense[2])],
        "row_id int, batch string, dense array<double>",
    ).withColumn("sp", to_sparse(F.col("dense")))
    csr_df = (
        df.groupBy("batch")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("row_id", "sp"))
            ).alias("rows")
        )
        .select(
            "batch",
            rows_to_csr(
                F.transform(F.col("rows"), lambda r: r["sp"]), 4
            ).alias("csr"),
        )
    )
    r = csr_df.collect()[0]["csr"]
    assert r["n_rows"] == 3 and r["n_cols"] == 4
    assert r["indptr"] == [0, 2, 2, 4]
    assert r["indices"] == [1, 3, 0, 2]
    assert r["values"] == [2.0, 1.0, 5.0, 3.0]

    out = csr_df.select(
        csr_spmv(F.col("csr"), F.array(*[F.lit(v) for v in vec])).alias("y"),
        csr_nnz(F.col("csr")).alias("nnz"),
        csr_row(F.col("csr"), 2).alias("r2"),
        F.transform(
            csr_to_rows(F.col("csr")), lambda sp: from_sparse(sp)
        ).alias("back"),
    ).collect()[0]
    want_y = np.array(dense) @ np.array(vec)
    assert np.allclose(out["y"], want_y)
    assert out["nnz"] == 4
    assert out["r2"]["indices"] == [0, 2] and out["r2"]["values"] == [5.0, 3.0]
    assert [list(b) for b in out["back"]] == dense  # exact inverse

    # pure JVM: no Python nodes anywhere in the CSR plan
    plan = (
        csr_df.select(csr_spmv(F.col("csr"), F.array(F.lit(1.0))))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_sparse_on_embeddings_table(spark, sf_dir):
    """Sparsify real embeddings thresholded to mostly-zero, dot
    against the dense original: sparse_dot(sp(x'), x) must equal the
    dense dot of the thresholded vector — on every row."""
    from ml_data_pipeline_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    thr = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("x"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda v: F.when(F.abs(v) > 0.1, v).otherwise(F.lit(0.0)),
        ).alias("xt"),
    )
    out = thr.select(
        "vec_id",
        sparse_dot(to_sparse(F.col("xt")), F.col("x")).alias("s_dot"),
        F.aggregate(
            F.zip_with(F.col("xt"), F.col("x"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d_dot"),
        sparse_density(to_sparse(F.col("xt"))).alias("density"),
    ).collect()
    assert out
    for r in out:
        assert abs(r["s_dot"] - r["d_dot"]) < 1e-9
        assert r["density"] < 1.0


def test_distributed_writers_are_retry_idempotent(spark, tmp_path):
    """Deterministic per-partition filenames + atomic rename: writing
    the SAME DataFrame into the same directory twice (the observable
    effect of a retried/speculative task attempt) must republish the
    same files — never add duplicates for readers to double-count."""
    import glob as _glob

    from ml_data_pipeline_spark.sources.arrow_ipc import read_ipc, write_ipc

    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"
    ).repartition(4)
    out = str(tmp_path / "ipc")
    write_ipc(df, out)
    first = sorted(_glob.glob(os.path.join(out, "*.arrow")))
    write_ipc(df, out)  # the "retry"
    second = sorted(_glob.glob(os.path.join(out, "*.arrow")))
    assert first == second and 0 < len(first) <= 4
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = read_ipc(spark, os.path.join(out, "*.arrow"), schema)
    assert back.count() == 100  # no duplicated rows
    # no leftover temp files
    assert not _glob.glob(os.path.join(out, ".part-*"))


def test_one_hot_encode(spark):
    from ml_data_pipeline_spark.operators.encoding import one_hot_encode

    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("b",), (None,), ("zz",)], "cat string"
    )
    out = one_hot_encode(df, "cat", categories=["a", "b", "c"]).collect()
    got = {(r["cat"], r["cat_code"], tuple(r["cat_onehot"])) for r in out}
    assert ("a", 0, (1, 0, 0)) in got
    assert ("b", 1, (0, 1, 0)) in got
    assert ("c", 2, (0, 0, 1)) in got
    assert (None, -1, (0, 0, 0)) in got
    assert ("zz", -1, (0, 0, 0)) in got

    # vocabulary auto-collected when not supplied
    auto = one_hot_encode(df, "cat")
    row = {r["cat"]: r["cat_code"] for r in auto.collect()}
    assert row["a"] == 0 and row["zz"] == 3  # sorted: a,b,c,zz

    # pure projection: no join/shuffle in the encode plan
    plan = (
        one_hot_encode(df, "cat", categories=["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan

    # the auto-collected vocabulary is BOUNDED: a high-cardinality
    # column must raise instead of collecting unbounded driver state
    import pytest

    wide = spark.range(50).select(
        F.concat(F.lit("id-"), F.col("id")).alias("cat")
    )
    with pytest.raises(ValueError, match="not categorical"):
        one_hot_encode(wide, "cat", max_categories=10)
    # at exactly the cap it still works
    ok = one_hot_encode(wide, "cat", max_categories=50)
    assert len(ok.collect()[0]["cat_onehot"]) == 50


def test_sparse_empty_and_null_elements(spark):
    """Review regressions: size=0 must round-trip to [] (sequence(0,-1)
    yields [0,-1] unguarded) and NULL elements map to zero (documented
    missing=zero COO contract)."""
    df = spark.createDataFrame(
        [([],), ([0.0, 0.0],)], "dense array<double>"
    ).withColumn("sp", to_sparse(F.col("dense")))
    got = df.select(
        F.size(from_sparse(F.col("sp"))).alias("n"),
        from_sparse(F.col("sp")).alias("back"),
    ).collect()
    assert got[0]["n"] == 0 and got[0]["back"] == []
    assert got[1]["back"] == [0.0, 0.0]

    nulls = spark.createDataFrame(
        [([1.0, None, 2.0],)], "dense array<double>"
    ).withColumn("sp", to_sparse(F.col("dense")))
    r = nulls.select(from_sparse(F.col("sp")).alias("back")).collect()[0]
    assert r["back"] == [1.0, 0.0, 2.0]
