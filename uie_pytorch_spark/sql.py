"""ANSI-SQL front door for the analytics engine (VERDICT r3 item 9).

The engine's operators are DataFrame-first; this module exposes the
relational tier through ``spark.sql`` over registered temp views, so a
SQL-only consumer can run the same queries the DataFrame API serves —
and so each query's semantics are pinned three ways: DataFrame plan,
Spark SQL text, and the DuckDB oracle (queries.py), all hash-equal.

The SQL here is Spark dialect. It intentionally mirrors the DuckDB
oracle text (queries.py) with only the dialect-forced differences:
  * ``len(regexp_extract_all(s, p))``  -> ``size(regexp_extract_all(s, p, 0))``
  * ``regexp_replace(s, p, r, 'g')``   -> 3-arg (Spark is global)
  * ``unnest(...)``                    -> ``explode(...)`` / LATERAL VIEW
  * ``epoch(ts)``                      -> double-cast via TIMESTAMP (LTZ;
                                          Spark 4 ANSI forbids NTZ->DOUBLE)
  * ``ASOF LEFT JOIN``                 -> union-tag + running
                                          last(ignorenulls) window (the
                                          same shape operators.temporal
                                          uses — Spark has no ASOF syntax)
  * regex literals double their backslashes (Spark string literals
    treat ``\\`` as an escape; DuckDB's do not)
Both are plain ANSI aggregations/joins/windows, so Catalyst produces
the same physical plans it gives the DataFrame versions (broadcast
dims, partial aggs, single window sort per spec).

Coverage spans every SQL-expressible query family: aggregation, join,
window, dedup (exact/minhash/LSH), textstats, and temporal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.hashing import MINHASH_COEFFS, MINHASH_PRIME

_H60 = "CAST(conv(substring(md5({0}), 1, 15), 16, 10) AS BIGINT)"
_PERMS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_COEFFS[:12])
)
# fractional epoch seconds, NTZ-safe (see operators.temporal._epoch_seconds)
_EPOCH = "CAST(CAST({0} AS TIMESTAMP) AS DOUBLE)"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, tables=None
) -> None:
    """Register the benchmark tables as temp views over their parquet
    files. Views are lazy — registration costs nothing; scans prune
    columns/partitions exactly as the DataFrame reads do."""
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# Spark-dialect SQL, column-for-column aliased like the DataFrame
# queries (queries.py) so results hash-compare equal.
SQL_QUERIES = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base_price,
               CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE)
                   AS sum_disc_price,
               CAST(avg(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_broadcast_dims": """
        SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(o.o_totalprice) AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                      JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
    """,
    "topk_per_group": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                     AS rnk
          FROM orders) ranked
        WHERE rnk <= 3
    """,
    "semi_join_exists": """
        SELECT c.c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
    """,
    "event_lag_gaps": """
        WITH e AS (SELECT *, unix_timestamp(ts) AS ts_sec FROM events)
        SELECT user_id, event_id,
               ts_sec - lag(ts_sec) OVER w AS gap_sec,
               CASE WHEN lag(ts_sec) OVER w IS NULL
                      OR ts_sec - lag(ts_sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS session_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "rollup_order_stats": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o_totalprice) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    # ---- window family ------------------------------------------------
    "window_cumulative_offset": """
        SELECT o_custkey, o_orderkey,
               CAST(COALESCE(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS DOUBLE) AS cum_before
        FROM orders
    """,
    "vote_max_by": """
        WITH per_option AS (
          SELECT user_id, event_type,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(value) AS DOUBLE) AS sum_value
          FROM events GROUP BY user_id, event_type
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY cnt DESC, sum_value DESC, event_type DESC) AS rn
          FROM per_option
        )
        SELECT user_id, event_type AS winner, cnt,
               sum_value / cnt AS mean_value
        FROM ranked WHERE rn = 1
    """,
    # ---- join family ---------------------------------------------------
    "anti_join_negatives": """
        SELECT c.c_custkey, c.c_name
        FROM customer c LEFT ANTI JOIN
             (SELECT * FROM orders WHERE o_totalprice > 300000) o
          ON c.c_custkey = o.o_custkey
    """,
    "prompt_expansion_join": """
        SELECT p.p_partkey, r.r_name,
               p.p_type || '的' || r.r_name AS prompt
        FROM part p CROSS JOIN region r
        WHERE p.p_size > 40
    """,
    "double_dim_join": """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(sum(l.l_extendedprice) AS DOUBLE) AS volume
        FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
          JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        GROUP BY ns.n_name, nc.n_name
    """,
    "cross_join_negatives": """
        WITH subjects AS (SELECT DISTINCT p_brand FROM part),
             predicates AS (SELECT DISTINCT p_size FROM part),
             positives AS (SELECT DISTINCT p_brand, p_size FROM part)
        SELECT s.p_brand, p.p_size
        FROM (subjects s CROSS JOIN predicates p) LEFT ANTI JOIN positives pos
          ON s.p_brand = pos.p_brand AND p.p_size = pos.p_size
    """,
    "span_metric_prf": """
        WITH pred AS (SELECT event_id FROM events WHERE value > 150),
             gold AS (SELECT event_id FROM events WHERE event_type = 'error'),
             correct AS (SELECT CAST(count(*) AS BIGINT) c
                         FROM pred JOIN gold USING (event_id))
        SELECT (SELECT c FROM correct) AS num_correct,
               (SELECT CAST(count(*) AS BIGINT) FROM pred) AS num_infer,
               (SELECT CAST(count(*) AS BIGINT) FROM gold) AS num_label,
               (SELECT c FROM correct) * 1.0d
                 / (SELECT count(*) FROM pred) AS precision_,
               (SELECT c FROM correct) * 1.0d
                 / (SELECT count(*) FROM gold) AS recall_
    """,
    # ---- aggregation family ---------------------------------------------
    "distinct_labels": "SELECT DISTINCT event_type AS label FROM events",
    "hourly_event_rollup": """
        SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(value) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "unify_prompt_name": """
        SELECT p_partkey,
               p_brand || '[' ||
               array_join(array_sort(array_distinct(
                   split(p_type || ',' || p_brand, ','))), ',')
               || ']' AS unified
        FROM part
    """,
    # ---- dedup family ---------------------------------------------------
    "dedup_exact": """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text
          FROM documents WHERE doc_id % 25 = 0
        )
        SELECT md5(text) AS content_hash,
               CAST(count(*) AS BIGINT) AS n_dups,
               CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
        FROM corpus GROUP BY md5(text) HAVING count(*) > 1
    """,
    "minhash_signature": f"""
        WITH msh AS (
          SELECT DISTINCT doc_id, substring(text, i, 5) AS shingle
          FROM documents
          LATERAL VIEW explode(
            sequence(1, greatest(length(text) - 4, 1))) g AS i
        ),
        mh32 AS (
          SELECT doc_id, ({_H60.format("shingle")} & 4294967295) AS h32
          FROM msh
        ),
        mperm AS (SELECT * FROM VALUES {_PERMS} AS t(perm, a, b))
        SELECT doc_id, CAST(p.perm AS INT) AS perm,
               CAST(min((p.a * h32 + p.b) % {MINHASH_PRIME}) AS BIGINT)
                 AS minhash
        FROM mh32 CROSS JOIN mperm p GROUP BY doc_id, p.perm
    """,
    "lsh_candidate_pairs": f"""
        WITH msh AS (
          SELECT DISTINCT doc_id, substring(text, i, 5) AS shingle
          FROM documents
          LATERAL VIEW explode(
            sequence(1, greatest(length(text) - 4, 1))) g AS i
        ),
        mh32 AS (
          SELECT doc_id, ({_H60.format("shingle")} & 4294967295) AS h32
          FROM msh
        ),
        mperm AS (SELECT * FROM VALUES {_PERMS} AS t(perm, a, b)),
        sig AS (
          SELECT doc_id, p.perm,
                 CAST(min((p.a * h32 + p.b) % {MINHASH_PRIME}) AS BIGINT)
                   AS minhash
          FROM mh32 CROSS JOIN mperm p GROUP BY doc_id, p.perm
        ),
        banded AS (
          SELECT doc_id, CAST(perm DIV 3 AS INT) AS band,
                 md5(listagg(CAST(minhash AS STRING), ',')
                     WITHIN GROUP (ORDER BY perm)) AS band_hash
          FROM sig GROUP BY doc_id, CAST(perm DIV 3 AS INT)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    """,
    "doc_fingerprint": f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, tok
          FROM (SELECT doc_id,
                       explode(regexp_extract_all(text, '[\\\\S]+', 0)) AS tok
                FROM documents)
        )
        SELECT doc_id,
               CAST(bit_xor({_H60.format("tok")}) AS BIGINT) AS fingerprint,
               CAST(count(*) AS BIGINT) AS n_distinct_tokens
        FROM toks GROUP BY doc_id
    """,
    # ---- textstats family -----------------------------------------------
    "sentence_stats": """
        SELECT doc_id,
               CAST(size(regexp_extract_all(text, '[.!?。！？]', 0))
                 AS BIGINT) AS n_sent_marks,
               CAST(size(regexp_extract_all(text, '[\\\\S]+', 0))
                 AS BIGINT) AS n_tokens
        FROM documents
    """,
    "lang_id_heuristic": """
        SELECT doc_id,
               (length(text) - length(regexp_replace(text, '[一-鿿]', '')))
                 * 1.0d / greatest(length(text), 1) AS cjk_ratio,
               (length(text) - length(regexp_replace(text, '[A-Za-z]', '')))
                 * 1.0d / greatest(length(text), 1) AS latin_ratio,
               CASE WHEN length(text) = 0 THEN 'other'
                    WHEN (length(text)
                          - length(regexp_replace(text, '[一-鿿]', '')))
                         * 1.0d / length(text) > 0.3 THEN 'zh'
                    WHEN (length(text)
                          - length(regexp_replace(text, '[A-Za-z]', '')))
                         * 1.0d / length(text) > 0.3 THEN 'en'
                    ELSE 'other' END AS pred_lang
        FROM documents
    """,
    "token_counts": """
        SELECT doc_id,
               CAST(size(regexp_extract_all(text, '[\\\\S]+', 0)) AS INT)
                 AS ws_tokens,
               CAST(size(regexp_extract_all(text,
                    ' ?[A-Za-z]+| ?[0-9]+|[一-鿿]| ?[^\\\\sA-Za-z0-9一-鿿]+',
                    0)) AS INT) AS bpe_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS subword_est,
               CAST(length(text) AS INT) AS n_chars_computed
        FROM documents
    """,
    "quality_features": """
        SELECT doc_id,
               (length(text) - length(regexp_replace(
                  text, '[\\\\.,;:!\\\\?。！？，；：]', '')))
                 * 1.0d / greatest(length(text), 1) AS punct_ratio,
               CAST(CASE WHEN length(text) BETWEEN 50 AND 2000
                         THEN 0.4 ELSE 0.0 END
               + CASE WHEN (length(text) - length(regexp_replace(
                              text, '[\\\\.,;:!\\\\?。！？，；：]', '')))
                           * 1.0d / greatest(length(text), 1) > 0.005
                       AND (length(text) - length(regexp_replace(
                              text, '[\\\\.,;:!\\\\?。！？，；：]', '')))
                           * 1.0d / greatest(length(text), 1) < 0.2
                      THEN 0.3 ELSE 0.0 END AS DOUBLE) AS partial_quality
        FROM documents
    """,
    "url_canonicalize": """
        WITH raw AS (
          SELECT doc_id,
                 'HTTPS://WWW.' || source || '.Example.COM/Path/'
                   || CAST(doc_id AS STRING)
                   || CASE WHEN doc_id % 3 = 0
                           THEN '/?utm_source=feed&utm_campaign=x&id='
                           ELSE '?id=' END
                   || CAST(doc_id AS STRING)
                   || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END
                   AS url
          FROM documents
        ),
        s1 AS (
          SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u
          FROM raw
        ),
        parts AS (
          SELECT doc_id, url,
                 lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
                 regexp_replace(
                   lower(regexp_extract(
                     u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                   '^www\\\\.', '') AS host,
                 regexp_extract(
                   u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1) AS rest
          FROM s1
        )
        SELECT doc_id, url,
               scheme || '://' || host ||
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       rest, '(utm_[A-Za-z]+|fbclid|gclid|ref)=[^&]*&?', ''),
                     '[?&]+$', ''),
                   '/+\\\\?', '?'),
                 '/+$', '') AS canonical_url
        FROM parts
    """,
    "pii_redaction": """
        WITH seeded AS (
          SELECT doc_id,
                 text
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' contact user' || CAST(doc_id % 100 AS STRING)
                                || '@mail.example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' call +1 555 01'
                                || CAST(doc_id % 90 + 10 AS STRING)
                           ELSE '' END
                   AS text
          FROM documents
        ),
        no_email AS (
          SELECT doc_id,
                 CAST(size(regexp_extract_all(
                   text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}',
                   0)) AS INT) AS n_emails,
                 regexp_replace(
                   text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}',
                   '<EMAIL>') AS t
          FROM seeded
        )
        SELECT doc_id, n_emails,
               CAST(size(regexp_extract_all(
                 t, '\\\\+?[0-9][0-9 -]{6,}[0-9]', 0)) AS INT) AS n_phones,
               regexp_replace(t, '\\\\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>')
                 AS text_redacted
        FROM no_email
    """,
    "repetition_stats": """
        WITH toks AS (
          SELECT doc_id,
                 explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                   AS tok
          FROM documents
        ),
        tf AS (SELECT doc_id, tok, count(*) AS tf
               FROM toks GROUP BY doc_id, tok),
        agg AS (
          SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_distinct
          FROM tf GROUP BY doc_id
        ),
        top AS (
          SELECT doc_id, tok AS top_token, tf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf DESC, tok) AS rn
          FROM tf
        )
        SELECT a.doc_id, a.n_tokens, a.n_distinct,
               1.0d - a.n_distinct * 1.0d / a.n_tokens AS dup_token_ratio,
               t.top_token, t.tf * 1.0d / a.n_tokens AS top_token_frac
        FROM agg a JOIN top t ON a.doc_id = t.doc_id AND t.rn = 1
    """,
    "unigram_logprob": """
        WITH toks AS (
          SELECT doc_id,
                 explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                   AS tok
          FROM documents
        ),
        freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
        tot AS (SELECT sum(tf) AS n FROM freq)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               avg(ln(f.tf)) - ln((SELECT n FROM tot)) AS avg_logprob
        FROM toks t JOIN freq f ON t.tok = f.tok
        GROUP BY t.doc_id
    """,
    # ---- temporal family -------------------------------------------------
    "sessionize_events": f"""
        WITH lagd AS (
          SELECT event_id, user_id, ts,
                 CAST(floor({_EPOCH.format("ts")}) AS BIGINT) AS ts_sec,
                 CAST(CASE WHEN lag({_EPOCH.format("ts")}) OVER w IS NULL
                             OR {_EPOCH.format("ts")}
                                - lag({_EPOCH.format("ts")}) OVER w > 1800
                           THEN 1 ELSE 0 END AS INT) AS session_start
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ts_sec, session_start,
               CAST(sum(session_start)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM lagd
    """,
    "asof_join_events": f"""
        WITH r AS (
          SELECT user_id, ts, max(value) AS state
          FROM events WHERE event_id % 10 = 0
          GROUP BY user_id, ts
        ),
        l AS (
          SELECT event_id, user_id, ts FROM events WHERE event_id % 10 <> 0
        ),
        u AS (
          -- typed NULL struct without naming ts's timestamp flavor:
          -- the never-true branch pins the struct type to the data
          SELECT user_id, ts, 1 AS tag, event_id,
                 CASE WHEN 1 = 0
                      THEN named_struct('ts', ts, 'state',
                                        CAST(0.0 AS DOUBLE)) END AS rp
          FROM l
          UNION ALL
          SELECT user_id, ts, 0 AS tag, CAST(NULL AS BIGINT) AS event_id,
                 named_struct('ts', ts, 'state', state) AS rp
          FROM r
        ),
        m AS (
          SELECT *, last(rp, true) OVER (
                   PARTITION BY user_id ORDER BY ts, tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mr
          FROM u
        )
        SELECT event_id, user_id,
               CAST(floor({_EPOCH.format("ts")}) AS BIGINT) AS ts_sec,
               CAST(floor({_EPOCH.format("mr.ts")}) AS BIGINT) AS state_ts_sec,
               mr.state AS state
        FROM m WHERE tag = 1
    """,
}


def sql_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run a named query through the SQL front door. Same result (and
    value hash) as ``queries.QUERIES[name](spark, sf_dir)``."""
    try:
        sql = SQL_QUERIES[name]
    except KeyError:
        raise KeyError(
            f"no SQL surface for {name!r}; available: "
            f"{sorted(SQL_QUERIES)}"
        ) from None
    register_views(spark, sf_dir)
    return spark.sql(sql)
