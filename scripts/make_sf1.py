"""Synthesize a deterministic sf1 dataset (10x sf0.1) for scale
validation — VERDICT r3 item 7.

No external data: each fact table is 10 shifted replicas of the
driver-generated sf0.1 tables (read-only inputs), with all PK/FK
columns offset consistently per replica so joins stay exactly as
selective as at sf0.1 and per-key row counts don't balloon. The two
genuine dimension tables (region, nation) keep their real-world
cardinality. Text/embedding payloads are perturbed per replica
(unique prefix token / deterministic component jitter) so the dedup
and near-dup suites scale linearly instead of degenerating into a
10-identical-copies pair explosion the real corpus wouldn't have.

Usage:
    python scripts/make_sf1.py [--src /root/testdata/sf0.1] \
        [--out /tmp/testdata/sf1] [--copies 10]
Then:
    SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 BENCH_SKIP_CDC=1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ml_data_pipeline_spark.session import build_session  # noqa: E402

# key column -> offset symbol; every table shifts each of its key
# columns by replica_index * offset[symbol], so cross-table FKs stay
# aligned within a replica and disjoint across replicas.
KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMS = ("region", "nation")


def _offsets(spark, src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    probes = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    for sym, (tbl, col) in probes.items():
        mx = (
            spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
            .agg(F.max(col))
            .collect()[0][0]
        )
        out[sym] = int(mx) + 1
    return out


def _replica(df: DataFrame, table: str, i: int, offs: dict[str, int]) -> DataFrame:
    cols = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        sym = KEYS.get(table, {}).get(f_.name)
        if sym:
            c = (c + F.lit(i * offs[sym])).cast(f_.dataType)
        elif table == "documents" and f_.name == "text":
            # unique per-replica prefix token: shingle/minhash/simhash
            # signatures diverge across replicas (linear, not N² dup)
            c = F.concat(F.lit(f"r{i} "), c)
        elif table == "documents" and f_.name == "n_chars":
            c = (c + F.lit(len(f"r{i} "))).cast(f_.dataType)
        elif table == "embeddings" and f_.name == "embedding":
            # deterministic per-replica jitter breaks exact duplicates
            # without moving vectors between IVF cells materially
            c = F.transform(
                F.col(f_.name),
                lambda v, j: (
                    v + (((F.lit(i) * 31 + j) % 7) - 3).cast("float") * 0.003
                ).cast("float"),
            )
        cols.append(c.alias(f_.name))
    return df.select(*cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = build_session(app_name="make-sf1", cores=args.cores)
    os.makedirs(args.out, exist_ok=True)
    offs = _offsets(spark, args.src)
    for table in list(KEYS) + list(DIMS):
        src_path = os.path.join(args.src, f"{table}.parquet")
        dst = os.path.join(args.out, f"{table}.parquet")
        df = spark.read.parquet(src_path)
        if table in DIMS:
            out = df  # true dimensions keep their cardinality
        else:
            parts = [
                _replica(df, table, i, offs) for i in range(args.copies)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{table}: {n} rows -> {dst}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
