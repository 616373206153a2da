"""Time-series operators: as-of join, pivot.

Reference analog: the time-series source's frequency/regularity model
(/root/reference/ml-data/ml-data-readers/src/timeseries.rs:19-122) and
fill methods (:173-184) — here the join/reshape operators a
time-series workload needs that the reference never implemented
(§2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ml_data_pipeline_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` within the same ``by`` group.

    Implemented as union + single window pass (sort key puts right
    rows before left rows at equal timestamps): ONE shuffle by the key
    and a per-partition sort — the scalable shape. A range-condition
    join (`l.t >= r.t`) would explode to O(|L|·|R|) per key before
    filtering; this is O(|L|+|R|) — the difference between feasible
    and not at 100 TB.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(by).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(by).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_k",
        "_t",
        "_is_right",
        "_l",
        *[
            F.last(
                F.when(F.col("_is_right") == 1, F.col(f"_r_{c}")),
                ignorenulls=True,
            )
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
    ).where(F.col("_is_right") == 0)
    out_cols: list[Column] = [
        F.col(f"_l.{c}").alias(c) for c in lcols
    ] + [F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols]
    return filled.select(*out_cols)


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the value of that user's most recent purchase
    at-or-before the event time (DuckDB oracle: native ASOF JOIN)."""
    e = load_table(spark, sf_dir, "events")
    # Deduplicate the right side per (user_id, ts) — if a user ever had
    # two purchases at the same timestamp, both this window pass and
    # DuckDB's ASOF would pick an arbitrary one; max(value) makes the
    # tie-break identical (and deterministic) in both engines.
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        e.select("user_id", "event_id", "ts"),
        purchases,
        by="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "user_id", "event_id", "asof_purchase_value"
    ).orderBy("user_id", "event_id")


def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape): per-user event counts by type.

    Explicit pivot values keep the plan single-pass (no extra distinct
    job) and the output schema static — required at scale.
    """
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )
