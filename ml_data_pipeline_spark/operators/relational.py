"""Relational operators over the shared testdata (SURVEY.md §2).

Each function is a `queries()` entry: ``(spark, sf_dir) -> DataFrame``
with a DuckDB oracle in ``ml_data_pipeline_spark.queries``. The
reference implements scan/project/filter/slice only (§2.10 — no
joins/aggs/windows); these operators are the §2.11 capability set the
north rule adds, built on Catalyst so pushdown/pruning/reordering are
automatic.

Cross-engine determinism rule: never SUM/AVG raw doubles across rows
(summation order is engine-defined). Money-like columns are cast to
DECIMAL before aggregation — exact, order-free — and cast back to
double for output. Every output column is aliased identically in the
SQL oracle.

Scale notes per operator are in the docstrings; the common themes:
dimension joins are broadcast (no shuffle of the fact table),
aggregations are partial-aggregable (map-side combine), windows that
can be expressed as `max_by`-style reductions are, because a groupBy
reduction shuffles one row per key while `row_number` ships every row
to the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ml_data_pipeline_spark.sources.tables import load_table


def _dec(col, scale: int = 2):
    """Exact decimal view of a money-like double column."""
    return F.col(col).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------- scans


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary.

    Scale: single scan + partial agg on 4-ish groups; the filter is
    pushed to Parquet row-group stats (reference analog: zone-map
    skipping, ml-data-readers/src/parquet/predicates.rs:336-375).
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def filter_pushdown_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown demo (reference F1-F8, P1-P4).

    The physical plan must show PushedFilters on l_shipdate/l_quantity
    and a 3-column ReadSchema — verified in tests via explain().
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") < 25)
        )
        .select("l_quantity", "l_extendedprice")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------- joins


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 open orders by revenue for one segment.

    Scale: customer is the small side → broadcast; lineitem↔orders is
    the only shuffle, on the join key. Top-k via orderBy+limit is a
    distributed partial top-k (TakeOrderedAndProject), not a full sort.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def join_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two dims, both broadcast — zero fact shuffles
    until the final small aggregation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
        )
        .orderBy("r_name")
    )


def anti_join_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Left-anti join (reference has no joins at all — §2.10; NOT IN
    pushdown analog is predicates.rs:487-489). Anti joins broadcast the
    built side's keys only. Restricted to big-ticket orders so the
    result is non-empty at small SF."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def semi_join_parts_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: parts that appear in any lineitem."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("p_brand")
    )


# ------------------------------------------------------------------- windows


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (rank window).

    Scale: the window shuffles by o_custkey once; ties broken by
    orderkey for determinism. A per-key top-k at 100 TB would prefer
    a partial top-k aggregator, but rank-3-of-10 rows/key is fine.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins per key — the CDC max-seq primitive (§2.11) on
    the events table, expressed as a partially-aggregable max(struct)
    reduction instead of a row_number window: map-side combine makes
    hot users collapse before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    packed = e.groupBy("user_id").agg(
        F.max(F.struct("event_id", "event_type", "value")).alias("p")
    )
    return packed.select(
        "user_id",
        F.col("p.event_id").alias("last_event_id"),
        F.col("p.event_type").alias("last_event_type"),
        F.col("p.value").alias("last_value"),
    ).orderBy("user_id")


def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum window (frame = unbounded preceding..current).

    Decimal arithmetic keeps the running total exact so the prefix-sum
    is order-independent across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def lag_prev_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — previous event's value per user (the reference's
    time-series prev/next fill building block, timeseries.rs:173-184)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
    )


def fill_forward_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward- AND backward-fill over a gapped series (reference
    FillMethod::Forward/Backward, ml-data-readers/src/timeseries.rs:
    173-184): value is observed only on 'purchase' events; carry the
    last observation forward and the next observation backward per
    user. One window spec, two frames — a single shuffle serves both
    directions."""
    e = load_table(spark, sf_dir, "events")
    gapped = e.withColumn(
        "v", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return gapped.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(wf).alias("filled_value"),
        F.first("v", ignorenulls=True).over(wb).alias("bfilled_value"),
    )


# -------------------------------------------------------------- aggregations


def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from the reference, §2.10)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation (streaming windowed-agg
    shape, run in batch): per-day event counts + exact value sums."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def percentile_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per event type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 2).alias("p50_value"),
            F.round(F.percentile("value", F.lit(0.9)), 2).alias("p90_value"),
        )
        .orderBy("event_type")
    )


def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — exact; at 100 TB swap to approx_count_distinct
    (HLL) which the reference has no analog for."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


# ------------------------------------------------------------------- set ops


def setop_active_not_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set operation: customers with orders minus BUILDING
    segment customers; returns sorted keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("custkey")).distinct()
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return with_orders.exceptAll(building).distinct().orderBy("custkey")


def union_intersect_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT cardinalities over customer key sets.

    One lazy DataFrame (crossJoin of two single-row aggregates): no
    driver-side ``.count()`` actions inside a ``queries()`` callable —
    the whole thing executes as a single job when the caller acts.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big_bal = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k")
    )
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    un = (
        big_bal.union(buyers)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_union"))
    )
    inter = big_bal.intersect(buyers).agg(
        F.count(F.lit(1)).alias("n_intersect")
    )
    return un.crossJoin(inter)


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over status × priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination (reference L1/L2 slicing semantics,
    record_batch.rs:186-204, sink.rs:148-161): ORDER BY + OFFSET/LIMIT."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(100)
        .limit(25)
    )


def hash_sample_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (reference L3 sampling — but
    hash-based instead of RNG so it is reproducible across engines and
    cluster sizes; at 100 TB, rand() sampling is not replayable)."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
    return (
        c.where(bucket.isin("0", "1"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
        .orderBy("c_mktsegment")
    )


def interpolate_linear_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps (reference FillMethod::Linear,
    timeseries.rs:173-184): value observed only on purchases; other
    events get prev + (next-prev)·(t-pt)/(nt-pt) on the epoch-seconds
    axis. Pure lag/lead window arithmetic — identical in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.withColumn(
        "v", F.when(F.col("event_type") == "purchase", F.col("value"))
    ).withColumn(
        # Integer microsecond axis, timezone-free: timestampdiff on the
        # naive timestamp itself, so the result is independent of the
        # session timezone (unix_micros would shift by the session tz).
        "t",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).cast("double"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    g = g.select(
        "user_id",
        "event_id",
        "t",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(g.v.isNotNull(), F.col("t")), ignorenulls=True)
        .over(wp)
        .alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(F.when(g.v.isNotNull(), F.col("t")), ignorenulls=True)
        .over(wn)
        .alias("nt"),
    )
    interp = F.when(g.v.isNotNull(), g.v).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t") - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
        ).otherwise(F.coalesce("pv", "nv"))
    )
    return g.select(
        "user_id", "event_id", F.round(interp, 4).alias("interp_value")
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier
    share the nation (exercises the full star: region → nation →
    {customer, supplier} → orders → lineitem).

    Scale: all dims broadcast; the only shuffles are lineitem↔orders
    on orderkey and the final small agg. The c_nationkey=s_nationkey
    constraint applies after broadcast joins — no extra shuffle.
    """
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
