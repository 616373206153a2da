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


# Named frequencies, matched by EXACT period like the reference's
# period_ns table (timeseries.rs:47-63 — note Quarterly is the Rust
# integer division 365/4 = 91 days, reproduced here).
_NAMED_FREQS_US = [
    ("yearly", 365 * 24 * 60 * 60 * 1_000_000),
    ("quarterly", (365 // 4) * 24 * 60 * 60 * 1_000_000),
    ("monthly", 30 * 24 * 60 * 60 * 1_000_000),
    ("weekly", 7 * 24 * 60 * 60 * 1_000_000),
    ("daily", 24 * 60 * 60 * 1_000_000),
    ("hourly", 60 * 60 * 1_000_000),
]


def infer_frequency(
    df: DataFrame,
    time_col: str,
    by: str | None = None,
    regular_tolerance: float = 0.05,
) -> DataFrame:
    """Infer each series' dominant sampling frequency + regularity —
    the reference's declared-but-stubbed detection (its
    ``TimeSeriesMetadata`` carries frequency/is_regular,
    timeseries.rs:205-232, but ``infer_schema_and_metadata`` hardcodes
    ``is_regular: true``, :331; this implements the real thing).

    Per series (``by`` key, or the whole frame): the mode of the
    consecutive-timestamp deltas is the period; the frequency label
    follows the reference's ``TimeSeriesFrequency`` model
    (timeseries.rs:19-63) — named calendar periods on exact match,
    else ``<n>min``/``<n>s``/``<n>ms``/``<n>us`` at the coarsest unit
    that divides the period; ``variable`` when no delta repeats
    enough. ``regularity_ratio`` = fraction of deltas equal to the
    mode; ``is_regular`` ⇔ ratio ≥ 1 − tolerance.

    Spark shape: one shuffle by the series key (lag window), then a
    partially-aggregable groupBy(series, delta) count + one max-struct
    reduce per series — no collect, no UDF; mode ties break to the
    SMALLEST delta (deterministic).
    """
    key = by or "_all"
    base = df if by else df.withColumn("_all", F.lit(1))
    w = Window.partitionBy(key).orderBy(F.col(time_col).asc())
    deltas = (
        base.select(
            key,
            F.timestamp_diff(
                "MICROSECOND",
                F.lag(F.col(time_col)).over(w),
                F.col(time_col),
            ).alias("_d"),
        )
        .where(F.col("_d").isNotNull())
    )
    # mode per series: count per delta (map-side combinable), then a
    # single max(struct(cnt, -delta)) reduce — skew-proof, no window
    per_delta = deltas.groupBy(key, "_d").agg(F.count(F.lit(1)).alias("_n"))
    mode = (
        per_delta.groupBy(key)
        .agg(
            F.max(F.struct(F.col("_n"), (-F.col("_d")).alias("_nd"))).alias(
                "_m"
            ),
            F.sum("_n").alias("n_deltas"),
        )
        .select(
            key,
            (-F.col("_m._nd")).alias("period_us"),
            F.col("_m._n").alias("_mode_n"),
            "n_deltas",
        )
    )
    ratio = F.col("_mode_n") / F.col("n_deltas")
    label = F.lit("variable")
    # build the unit ladder from finest to coarsest so coarser wins
    p = F.col("period_us")
    for unit, per in (
        ("us", 1),
        ("ms", 1_000),
        ("s", 1_000_000),
        ("min", 60_000_000),
    ):
        label = F.when(
            (p > 0) & (p % per == 0),
            F.concat((p / per).cast("bigint").cast("string"), F.lit(unit)),
        ).otherwise(label)
    for name, per in _NAMED_FREQS_US:
        label = F.when(p == per, F.lit(name)).otherwise(label)
    out = mode.select(
        key,
        F.when(ratio >= 1 - regular_tolerance, label)
        .otherwise(F.lit("variable"))
        .alias("frequency"),
        "period_us",
        (ratio >= 1 - regular_tolerance).alias("is_regular"),
        F.round(ratio, 4).alias("regularity_ratio"),
        "n_deltas",
    )
    return out if by else out.drop("_all")


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
