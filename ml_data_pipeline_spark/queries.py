"""Query registry: name → (Spark callable, DuckDB oracle SQL).

The driver contract (`__spark_entry__.py`) exposes `queries()` and
`oracle_sql()` from this registry. Every oracle reproduces the Spark
result bit-for-bit: aggregates of money-like doubles go through exact
DECIMAL casts, per-row double math is rounded identically on both
sides, and hashes are md5-based (identical in both engines). Column
aliases match exactly (the driver sorts columns by name and hashes
values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_data_pipeline_spark.operators import (
    dedup,
    encoding as ENC,
    multimodal,
    relational as R,
    similarity,
    text as TX,
    timeseries as TS,
)
from ml_data_pipeline_spark.sources.arrow_ipc import arrow_ipc_roundtrip_agg
from ml_data_pipeline_spark.sources.avro import avro_roundtrip_agg

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {
    # relational
    "q1_pricing_summary": R.q1_pricing_summary,
    "filter_pushdown_agg": R.filter_pushdown_agg,
    "q3_shipping_priority": R.q3_shipping_priority,
    "join_dims_broadcast": R.join_dims_broadcast,
    "q5_local_supplier_volume": R.q5_local_supplier_volume,
    "anti_join_customers_without_orders": R.anti_join_customers_without_orders,
    "semi_join_parts_shipped": R.semi_join_parts_shipped,
    "topk_orders_per_customer": R.topk_orders_per_customer,
    "latest_event_per_user": R.latest_event_per_user,
    "running_total_per_customer": R.running_total_per_customer,
    "lag_prev_event": R.lag_prev_event,
    "fill_forward_values": R.fill_forward_values,
    "rollup_order_stats": R.rollup_order_stats,
    "tumbling_window_events": R.tumbling_window_events,
    "percentile_value_by_type": R.percentile_value_by_type,
    "distinct_users_per_type": R.distinct_users_per_type,
    "setop_active_not_building": R.setop_active_not_building,
    "union_intersect_counts": R.union_intersect_counts,
    "cube_order_stats": R.cube_order_stats,
    "limit_offset_page": R.limit_offset_page,
    "hash_sample_customers": R.hash_sample_customers,
    "interpolate_linear_values": R.interpolate_linear_values,
    # source/sink/encoding parity
    "asof_last_purchase": TS.asof_last_purchase,
    "pivot_event_type_counts": TS.pivot_event_type_counts,
    # source/sink/encoding parity
    "csv_roundtrip_agg": ENC.csv_roundtrip_agg,
    "json_roundtrip_agg": ENC.json_roundtrip_agg,
    "csv_infer_roundtrip": ENC.csv_infer_roundtrip,
    "arrow_ipc_roundtrip_agg": arrow_ipc_roundtrip_agg,
    "avro_roundtrip_agg": avro_roundtrip_agg,
    "jdbc_roundtrip_agg": ENC.jdbc_roundtrip_agg,
    "text_line_scan": ENC.text_line_scan,
    "dictionary_encode_sources": ENC.dictionary_encode_sources,
    "string_ops": ENC.string_ops,
    # dedup
    "dedup_exact": dedup.dedup_exact,
    "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
    "minhash_signatures": dedup.minhash_signatures,
    "minhash_lsh_candidates": dedup.minhash_lsh_candidates,
    "simhash_signatures": dedup.simhash_signatures,
    "simhash_bucket_pairs": dedup.simhash_bucket_pairs,
    # similarity
    "ann_topk_cosine": similarity.ann_topk_cosine,
    "ivf_ann_topk": similarity.ivf_ann_topk,
    "cosine_neardup_pairs": similarity.cosine_neardup_pairs,
    "knn_classify": similarity.knn_classify,
    "vector_norm_stats": similarity.vector_norm_stats,
    # iterative algorithm, oracle-exact since round 3: fixed-point
    # integer Lloyd unrolled as a 5-iteration DuckDB CTE (also
    # pytest-pinned against an independent numpy Lloyd)
    "kmeans_clusters": similarity.kmeans_clusters,
    # text
    "token_count_stats": TX.token_count_stats,
    "quality_scores": TX.quality_scores,
    "langid_heuristic": TX.langid_heuristic,
    "doc_fingerprints": TX.doc_fingerprints,
    # multimodal
    "binary_payload_features": multimodal.binary_payload_features,
}

# DuckDB shingle helper (matches operators.dedup._shingles: 3-word
# shingles, distinct, over single-space word split).
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(string_split(text,' '))-2, 1)),"
    " i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))"
)

_MINHASH_COLS = ", ".join(
    f"min(md5('{i}:' || s)) AS mh{i}" for i in range(dedup.N_HASHES)
)

# SimHash SQL fragments (match operators.dedup exactly: distinct
# words, 64-bit hash from the first 16 md5 hex digits via instr digit
# arithmetic, ±1 votes, 4 × 16-bit band values).
_SH_DIGITS = ", ".join(
    f"(instr('0123456789abcdef', substr(md5(w), {k + 1}, 1))-1) AS d{k}"
    for k in range(16)
)
_SH_VOTES = ", ".join(
    f"SUM((FLOOR(d{j // 4}/{2 ** (j % 4)})::BIGINT % 2)*2 - 1) AS s{j}"
    for j in range(dedup.SIMHASH_BITS)
)
_SH_BANDS = ", ".join(
    "CAST("
    + " + ".join(
        f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END)*{2 ** (j - m * dedup.BAND_BITS)}"
        for j in range(m * dedup.BAND_BITS, (m + 1) * dedup.BAND_BITS)
    )
    + f" AS INTEGER) AS band{m}"
    for m in range(dedup.SIMHASH_BANDS)
)
_SH_CTE = f"""
        WITH words AS (
            SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS w
            FROM documents),
        digs AS (SELECT doc_id, {_SH_DIGITS} FROM words),
        votes AS (SELECT doc_id, {_SH_VOTES} FROM digs GROUP BY doc_id),
        sig AS (SELECT doc_id, {_SH_BANDS} FROM votes)
"""

def _kmeans_sql(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs, bit-for-bit equal to
    `similarity.kmeans_fit`: embeddings quantized to bigints (×10^6,
    round-half-away), dist² exact integer sums, argmin ties to the
    lowest cluster, centroid update = round-half-away integer mean
    via `(2s+n) // 2n` with explicit sign handling, empty clusters
    keep their previous centroid. Only the final inertia touches
    doubles (exact-int → nearest-double → one IEEE division → ROUND,
    identical in both engines)."""
    quant = (
        "list_transform(embedding, x -> "
        "CAST(round(CAST(x AS DOUBLE)*1000000.0, 0) AS BIGINT))"
    )
    sql = f"""
        WITH eq AS (
            SELECT vec_id, {quant} AS ev FROM embeddings),
        c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cluster,
                   ev AS cv
            FROM (SELECT vec_id, ev FROM eq ORDER BY vec_id LIMIT {k}))"""
    for i in range(1, iters + 1):
        sql += f""",
        a{i} AS (
            SELECT vec_id, ev, cluster, dist2 FROM (
                SELECT vec_id, ev, cluster, dist2,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist2, cluster) AS rk
                FROM (
                    SELECT q.vec_id, q.ev, c.cluster,
                           list_sum(list_transform(
                               generate_series(1, len(q.ev)),
                               j -> (q.ev[j]-c.cv[j])*(q.ev[j]-c.cv[j])
                           )) AS dist2
                    FROM eq q CROSS JOIN c{i - 1} c))
            WHERE rk = 1)"""
        if i < iters:
            sql += f""",
        c{i} AS (
            SELECT p.cluster, COALESCE(u.cv, p.cv) AS cv
            FROM c{i - 1} p LEFT JOIN (
                SELECT cluster, list(m ORDER BY dim) AS cv FROM (
                    SELECT cluster, dim,
                           CAST(CASE WHEN s >= 0 THEN (2*s+n)//(2*n)
                                ELSE -((-2*s+n)//(2*n)) END AS BIGINT) AS m
                    FROM (
                        SELECT cluster, j AS dim,
                               SUM(ev[j]) AS s, COUNT(*) AS n
                        FROM (SELECT cluster, ev,
                                     unnest(generate_series(1, len(ev))) AS j
                              FROM a{i})
                        GROUP BY cluster, j))
                GROUP BY cluster) u ON p.cluster = u.cluster)"""
    sql += f"""
        SELECT cluster, COUNT(*) AS n_vecs,
               round(CAST(SUM(dist2) AS DOUBLE)/1000000000000.0, 2)
                   AS inertia
        FROM a{iters} GROUP BY cluster ORDER BY cluster
    """
    return sql


_ORACLES: dict[str, str] = {
    "kmeans_clusters": _kmeans_sql(k=8, iters=5),
    "cube_order_stats": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "limit_offset_page": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 100
    """,
    "hash_sample_customers": """
        SELECT c_mktsegment,
               COUNT(*) AS n_sampled,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "interpolate_linear_values": """
        WITH g AS (
            SELECT user_id, event_id,
                   CAST(date_diff('microsecond', TIMESTAMP '2024-01-01', ts) AS DOUBLE) AS t,
                   CASE WHEN event_type = 'purchase' THEN value END AS v
            FROM events),
        w AS (
            SELECT user_id, event_id, t, v,
                   LAST_VALUE(v IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                   LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
                   FIRST_VALUE(v IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
            FROM g)
        SELECT user_id, event_id,
               ROUND(CASE WHEN v IS NOT NULL THEN v
                          WHEN pv IS NOT NULL AND nv IS NOT NULL
                            THEN pv + (nv - pv) * (t - pt) / (nt - pt)
                          ELSE COALESCE(pv, nv) END, 4) AS interp_value
        FROM w
    """,
    "asof_last_purchase": """
        SELECT e.user_id, e.event_id, p.purchase_value AS asof_purchase_value
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts) p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.user_id, e.event_id
    """,
    "pivot_event_type_counts": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "csv_roundtrip_agg": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "json_roundtrip_agg": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(0 AS BIGINT) AS n_corrupt
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "csv_infer_roundtrip": """
        SELECT event_type IN ('purchase', 'signup', 'error') AS converted,
               COUNT(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS sum_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY converted
    """,
    "avro_roundtrip_agg": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS sum_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "jdbc_roundtrip_agg": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS sum_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "arrow_ipc_roundtrip_agg": """
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "text_line_scan": """
        WITH b AS (
            SELECT CAST((instr('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 4
                   AS INTEGER) AS bucket,
                   doc_id, text
            FROM documents)
        SELECT bucket,
               CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1
                    AS INTEGER) AS line_number,
               CAST(length(text) AS INTEGER) AS line_len
        FROM b
        ORDER BY bucket, line_number
    """,
    "dictionary_encode_sources": """
        WITH dict AS (
            SELECT source,
                   ROW_NUMBER() OVER (ORDER BY source) - 1 AS code
            FROM (SELECT DISTINCT source FROM documents))
        SELECT d.source, dict.code, COUNT(*) AS n_docs
        FROM documents d JOIN dict ON d.source = dict.source
        GROUP BY d.source, dict.code
        ORDER BY dict.code
    """,
    "string_ops": """
        SELECT doc_id,
               substr(text, 1, 20) AS head20,
               '[' || lang || '] ' || substr(text, 1, 10) AS tagged,
               CAST(length(regexp_replace(text, 'data', '', 'g')) AS INTEGER)
                   AS len_without_data,
               reverse(substr(text, 1, 12)) AS rev12,
               substr(text, 1, 10) || '<INS>' || substr(text, 11) AS ins10,
               substr(text, 1, 4) || substr(text, 8) AS del5_3
        FROM documents
        ORDER BY doc_id
    """,
    "simhash_signatures": _SH_CTE
    + """
        SELECT doc_id, band0, band1, band2, band3 FROM sig ORDER BY doc_id
    """,
    "simhash_bucket_pairs": _SH_CTE
    + """
        , banded AS (
            SELECT doc_id, 0 AS band, band0 AS bucket FROM sig
            UNION ALL SELECT doc_id, 1, band1 FROM sig
            UNION ALL SELECT doc_id, 2, band2 FROM sig
            UNION ALL SELECT doc_id, 3, band3 FROM sig),
        -- degenerate-bucket cutoff: see operators/dedup.py
        -- SIMHASH_MAX_BUCKET (2..64 occupancy survives)
        counts AS (
            SELECT band, bucket, COUNT(*) AS n
            FROM banded GROUP BY 1, 2),
        live AS (
            SELECT banded.doc_id, banded.band, banded.bucket
            FROM banded JOIN counts
              ON banded.band = counts.band
             AND banded.bucket = counts.bucket
            WHERE counts.n BETWEEN 2 AND 64)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
        FROM live a JOIN live b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY doc_a, doc_b
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_pushdown_agg": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_quantity < 25
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "join_dims_broadcast": """
        SELECT r_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "anti_join_customers_without_orders": """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "semi_join_parts_shipped": """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, rk FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders)
        WHERE rk <= 3
    """,
    "latest_event_per_user": """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               value AS last_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
        ORDER BY user_id
    """,
    "running_total_per_customer": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_total
        FROM orders
    """,
    "lag_prev_event": """
        SELECT user_id, event_id,
               LAG(value, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_value
        FROM events
    """,
    "fill_forward_values": """
        SELECT user_id, event_id,
               LAST_VALUE(v IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_value,
               FIRST_VALUE(v IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS bfilled_value
        FROM (SELECT user_id, event_id, ts,
                     CASE WHEN event_type = 'purchase' THEN value END AS v
              FROM events)
    """,
    "rollup_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "tumbling_window_events": """
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
    "percentile_value_by_type": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 2) AS p50_value,
               ROUND(quantile_cont(value, 0.9), 2) AS p90_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "distinct_users_per_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "setop_active_not_building": """
        SELECT custkey FROM (
            SELECT DISTINCT o_custkey AS custkey FROM orders
            EXCEPT
            SELECT c_custkey AS custkey FROM customer
            WHERE c_mktsegment = 'BUILDING')
        ORDER BY custkey
    """,
    "union_intersect_counts": """
        SELECT
          (SELECT COUNT(*) FROM (
              SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
              UNION
              SELECT o_custkey AS k FROM orders)) AS n_union,
          (SELECT COUNT(*) FROM (
              SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
              INTERSECT
              SELECT DISTINCT o_custkey AS k FROM orders)) AS n_intersect
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS survivor_doc_id,
               COUNT(*) AS n_copies
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id, text FROM documents)
        GROUP BY md5(text)
        ORDER BY survivor_doc_id
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS (
            SELECT doc_id, {_SHINGLES} AS shingles FROM documents),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        bounded AS (
            SELECT s FROM ex GROUP BY s
            HAVING COUNT(*) BETWEEN 2 AND {dedup.MAX_SHINGLE_DF}),
        exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN bounded USING (s)),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM exf GROUP BY doc_id),
        overlap AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_common,
               ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
        FROM overlap
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.2
        ORDER BY doc_a, doc_b
    """,
    "minhash_signatures": f"""
        WITH ex AS (
            SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents)
        SELECT doc_id, {_MINHASH_COLS}
        FROM ex GROUP BY doc_id ORDER BY doc_id
    """,
    "minhash_lsh_candidates": f"""
        WITH ex AS (
            SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
        sig AS (SELECT doc_id, {_MINHASH_COLS} FROM ex GROUP BY doc_id),
        banded AS (
            SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bucket FROM sig
            UNION ALL
            SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
            UNION ALL
            SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
            UNION ALL
            SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id),
        sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM documents)
        SELECT doc_a, doc_b,
               ROUND(len(list_intersect(sa.shingles, sb.shingles)) /
                     len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4)
                   AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = doc_a
        JOIN sh sb ON sb.doc_id = doc_b
        WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles)) /
                    len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.2
        ORDER BY doc_a, doc_b
    """,
    "ann_topk_cosine": """
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        SELECT vec_id AS neighbor_id,
               ROUND(
                 list_sum(list_transform(list_zip(embedding, q_emb),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                 (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                  sqrt(list_sum(list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS cosine
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY cosine DESC, neighbor_id ASC
        LIMIT 10
    """,
    "ivf_ann_topk": """
        WITH cells AS (
            SELECT vec_id, embedding,
                   (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                 + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                 + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
            FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(
                     list_sum(list_transform(list_zip(c.embedding, q.embedding),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                     (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                      sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine
            FROM cells q JOIN cells c
              ON q.cell = c.cell AND c.vec_id != q.vec_id
            WHERE q.vec_id IN (0, 1, 2, 3, 4)),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id ASC)
                          AS rank
            FROM scored)
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
    "cosine_neardup_pairs": """
        WITH cells AS (
            SELECT vec_id, embedding,
                   (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                 + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                 + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
            FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(
                 list_sum(list_transform(list_zip(a.embedding, b.embedding),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                 (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                  sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) AS cosine
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(
                 list_sum(list_transform(list_zip(a.embedding, b.embedding),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                 (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                  sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                 4) >= 0.5
        ORDER BY id_a, id_b
    """,
    "knn_classify": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
        scored AS (
            SELECT q.query_id, e.label, e.vec_id AS neighbor_id,
                   ROUND(
                     list_sum(list_transform(list_zip(e.embedding, q.q_emb),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
                     (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                      sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     4) AS cosine
            FROM embeddings e, q
            WHERE e.vec_id != q.query_id),
        topk AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rk
                FROM scored)
            WHERE rk <= 5),
        votes AS (
            SELECT query_id, label, COUNT(*) AS n_votes
            FROM topk GROUP BY query_id, label)
        SELECT query_id, label AS pred_label, n_votes FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY n_votes DESC, label ASC) AS vr
            FROM votes)
        WHERE vr = 1
        ORDER BY query_id
    """,
    "vector_norm_stats": """
        SELECT label,
               COUNT(*) AS n_vecs,
               CAST(SUM(CAST(ROUND(sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS sum_norm
        FROM embeddings
        GROUP BY label
        ORDER BY label
    """,
    "token_count_stats": """
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               ((2 * CAST(SUM(len(string_split(text, ' '))) AS BIGINT) * 10000
                 + COUNT(*)) // (2 * COUNT(*))) / 10000.0 AS avg_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "quality_scores": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                         t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                     / len(string_split(text, ' ')), 4) AS stop_ratio,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')), 4) AS mean_word_len,
               (len(string_split(text, ' ')) >= 20 AND
                len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','of','and','to'))) > 0) AS keep
        FROM documents
        ORDER BY doc_id
    """,
    "langid_heuristic": """
        SELECT lang,
               CASE WHEN (' '||text||' ') LIKE '% der %'
                      OR (' '||text||' ') LIKE '% und %' THEN 'de'
                    WHEN (' '||text||' ') LIKE '% le %'
                      OR (' '||text||' ') LIKE '% et %' THEN 'fr'
                    WHEN (' '||text||' ') LIKE '% el %'
                      OR (' '||text||' ') LIKE '% y %' THEN 'es'
                    WHEN (' '||text||' ') LIKE '% zh %' THEN 'zh'
                    ELSE 'en' END AS pred,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY lang, pred
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 16)
                   AS fingerprint
        FROM documents
        ORDER BY doc_id
    """,
    "binary_payload_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS digest,
               'raw' AS sniffed_format
        FROM documents
        ORDER BY doc_id
    """,
}


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
