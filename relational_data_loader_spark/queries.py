"""Paired (Spark DataFrame, DuckDB oracle SQL) query catalog.

One entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis).
The driver runs each Spark callable and its oracle SQL side-by-side at
sf=0.01 and compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- raw double columns pass through UNTOUCHED (bit-identical in both engines);
- derived sums go through exact DECIMAL(18,6) arithmetic (associative, so
  Spark's partial aggregation order cannot change the result), then round
  to 2dp and cast back to double;
- ratios/averages round at 4dp (FP noise ≪ quantum), similarities at 3dp;
- rankings rank on the *rounded* value with an id tie-break;
- all content hashing is md5 (identical in both engines).

The CDC-family queries express the engine's own operators over the driver's
``events`` table as the change log (FIXTURES.md F5): event_id≈lsn,
user_id≈key, event_type≈op with 'error' playing the delete op.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from relational_data_loader_spark.operators.dedup import (
    dedup_clusters,
    edit_distance_near_dup,
    exact_dedup,
    incremental_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    simhash_signatures,
    token_jaccard_pairs,
)
from relational_data_loader_spark.operators.events import (
    cohort_retention,
    group_quantiles,
    rolling_event_stats,
)
from relational_data_loader_spark.operators.lww import net_changes
from relational_data_loader_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
    sq8_cosine_topk,
    sq8_recall_audit,
)
from relational_data_loader_spark.operators.vocab import (
    bpe_merge_candidates,
    vocab_coverage,
)
from relational_data_loader_spark.operators.layout import (
    zorder_file_stats,
    zorder_skipping_gain,
)
from relational_data_loader_spark.operators.sketch import cms_frequency_audit
from relational_data_loader_spark.functions import text as TXT
from relational_data_loader_spark.functions.registry import get_transform
from relational_data_loader_spark.spec import AUDIT_EXEC_ID, AUDIT_LOADED_AT

# events-as-change-log convention
DELETE_OP = "error"
WATERMARK_LSN = 5000  # fixed demo watermark for the change-scan query
STOPWORDS = ["data", "table", "row", "join", "value", "key", "fast", "slow"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, alias, dp=2):
    """Exact associative sum: double → decimal(18,6) → sum → round → double."""
    return (
        F.round(F.sum(col.cast("decimal(18,6)")), dp).cast("double").alias(alias)
    )


# --------------------------------------------------------------------------
# CDC operator family (SURVEY.md §2.1 over the events log)


def q_cdc_lww_net(spark, sf):
    """LWW netting (engine op net_changes): final event per key."""
    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id", "value", "ts")
    net = net_changes(ev, ["user_id"], lsn_col="event_id", op_col="event_type")
    return net.select(
        "user_id",
        F.col("event_id").alias("last_lsn"),
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


SQL_LWW_NET = f"""
SELECT user_id, event_id AS last_lsn, event_type AS last_op,
       value AS last_value, ts AS last_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
      FROM events) t
WHERE rn = 1
"""


def q_cdc_apply_final_state(spark, sf):
    """Full replay → final table state (net + drop deletes) — the W1/W2 fuse."""
    return q_cdc_lww_net(spark, sf).filter(F.col("last_op") != DELETE_OP)


SQL_APPLY_FINAL = f"""
SELECT user_id, event_id AS last_lsn, event_type AS last_op,
       value AS last_value, ts AS last_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
      FROM events) t
WHERE rn = 1 AND event_type <> '{DELETE_OP}'
"""


def q_cdc_watermarks(spark, sf):
    """Per-partition watermark vector (S3/C3): max lsn + op counts per bucket."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.pmod(F.col("user_id"), F.lit(16)).cast("int").alias("partition_id"))
        .agg(
            F.max("event_id").alias("max_applied_lsn"),
            F.count(F.when(F.col("event_type") != DELETE_OP, 1)).alias("rows_upserted"),
            F.count(F.when(F.col("event_type") == DELETE_OP, 1)).alias("rows_deleted"),
        )
    )


SQL_WATERMARKS = f"""
SELECT CAST(user_id % 16 AS INT) AS partition_id,
       max(event_id) AS max_applied_lsn,
       count(*) FILTER (WHERE event_type <> '{DELETE_OP}') AS rows_upserted,
       count(*) FILTER (WHERE event_type = '{DELETE_OP}') AS rows_deleted
FROM events GROUP BY 1
"""


def q_cdc_op_split(spark, sf):
    """Op-code split (F2): upsert vs delete classes with counts."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.when(F.col("event_type") == DELETE_OP, "D").otherwise("U").alias("op")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("event_id").alias("max_lsn"))
    )


SQL_OP_SPLIT = f"""
SELECT CASE WHEN event_type = '{DELETE_OP}' THEN 'D' ELSE 'U' END AS op,
       count(*) AS n_events, max(event_id) AS max_lsn
FROM events GROUP BY 1
"""


def q_cdc_change_scan(spark, sf):
    """Version-predicate scan (S2/F1): only events past the watermark,
    projected to the envelope. Filter + projection push into the scan."""
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_id") > WATERMARK_LSN)
        .select(
            F.col("event_id").alias("lsn"),
            F.col("event_type").alias("op"),
            "user_id",
            "value",
            "ts",
        )
    )


SQL_CHANGE_SCAN = f"""
SELECT event_id AS lsn, event_type AS op, user_id, value, ts
FROM events WHERE event_id > {WATERMARK_LSN}
"""


def q_cdc_projection_cast(spark, sf):
    """Column mapping (P1/P2): rename + type casts, audit day column."""
    ev = _t(spark, sf, "events")
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").cast("string").alias("user_key"),
        F.col("event_type").alias("op"),
        F.col("value").alias("amount"),
        F.date_trunc("day", F.col("ts")).alias("event_day"),
    )


SQL_PROJECTION_CAST = """
SELECT event_id AS lsn, CAST(user_id AS VARCHAR) AS user_key,
       event_type AS op, value AS amount, date_trunc('day', ts) AS event_day
FROM events
"""


def q_cdc_delete_keys(spark, sf):
    """Delete propagation (W2): keys whose final netted op is a delete."""
    return q_cdc_lww_net(spark, sf).filter(
        F.col("last_op") == DELETE_OP
    ).select("user_id")


SQL_DELETE_KEYS = f"""
SELECT user_id
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
      FROM events) t
WHERE rn = 1 AND event_type = '{DELETE_OP}'
"""


def q_cdc_ct_probe(spark, sf):
    """Change-tracking probe (S3): current + min-valid version, footer-only."""
    ev = _t(spark, sf, "events")
    return ev.agg(
        F.min("event_id").alias("min_valid_lsn"),
        F.max("event_id").alias("current_lsn"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_CT_PROBE = """
SELECT min(event_id) AS min_valid_lsn, max(event_id) AS current_lsn,
       count(*) AS n_events
FROM events
"""


def q_merge_full_outer(spark, sf):
    """MERGE INTO decomposed as a PK full-outer join (W1+W2 semantics):
    matched+upsert → new value, matched+delete → drop, unmatched batch →
    insert, unmatched target → keep."""
    target = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("old_value")
    )
    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id", "value")
    batch = net_changes(ev, ["user_id"], "event_id", "event_type").select(
        F.col("user_id").alias("bkey"),
        F.col("event_type").alias("op"),
        F.col("value").alias("new_value"),
    )
    j = target.join(batch, target["key"] == batch["bkey"], "full_outer")
    return (
        j.filter(F.col("op").isNull() | (F.col("op") != DELETE_OP))
        .select(
            F.coalesce(F.col("key"), F.col("bkey")).alias("key"),
            F.when(F.col("bkey").isNotNull(), F.col("new_value"))
            .otherwise(F.col("old_value"))
            .alias("value"),
        )
    )


SQL_MERGE_FULL_OUTER = f"""
WITH batch AS (
  SELECT user_id AS bkey, event_type AS op, value AS new_value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
        FROM events) t WHERE rn = 1)
SELECT COALESCE(c.c_custkey, b.bkey) AS key,
       CASE WHEN b.bkey IS NOT NULL THEN b.new_value ELSE c.c_acctbal END AS value
FROM customer c FULL OUTER JOIN batch b ON c.c_custkey = b.bkey
WHERE b.op IS NULL OR b.op <> '{DELETE_OP}'
"""


def q_salted_hot_key_agg(spark, sf):
    """Skew-safe two-phase aggregation: salt → partial agg → final agg.
    Exact DECIMAL sums make the two-phase result equal the plain GROUP BY
    (the oracle) regardless of combination order."""
    ev = _t(spark, sf, "events")
    salted = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(8)))
    partial = salted.groupBy("user_id", "_salt").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        F.count(F.lit(1)).alias("pc"),
    )
    return partial.groupBy("user_id").agg(
        F.round(F.sum("pv"), 2).cast("double").alias("total_value"),
        F.sum("pc").alias("n_events"),
    )


SQL_SALTED_AGG = """
SELECT user_id,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


def q_hot_key_probe(spark, sf):
    """Skew observability probe (operators/skew.py detect_hot_keys): keys
    owning >0.7% of the events log (the top tail of its near-uniform
    key distribution — real hot keys would clear this by an order of
    magnitude), with absolute-count semantics (``n``).
    sample_fraction=1.0 pins the deterministic full-scan path — the sampled
    path is the 10^10-row variant, probabilistic by design and covered by
    tests/test_skew_operator.py instead."""
    from relational_data_loader_spark.operators.skew import detect_hot_keys

    ev = _t(spark, sf, "events")
    return detect_hot_keys(ev, ["user_id"], threshold_frac=0.007, sample_fraction=1.0)


SQL_HOT_KEY_PROBE = """
WITH tot AS (SELECT count(*) AS t FROM events)
SELECT user_id,
       count(*) AS n,
       round(count(*) * 1.0 / t, 4) AS frac
FROM events, tot
GROUP BY user_id, t
HAVING count(*) > t * 0.007
"""


# --------------------------------------------------------------------------
# Relational coverage (the joins/aggs/windows MERGE decomposes into)


def q_pricing_summary(spark, sf):
    """TPC-H Q1-style aggregate over lineitem (bench headline)."""
    li = _t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(disc, "sum_disc_price"),
            _dec_sum(charge, "sum_charge"),
            F.round(F.avg("l_quantity"), 4).cast("double").alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).cast("double").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
  CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
  CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf):
    """orders ⋈ customer ⋈ nation with explicit broadcast of the dims."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            _dec_sum(F.col("o_totalprice"), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_topk_orders_per_customer(spark, sf):
    """Window top-k (the LWW-netting pattern generalized): top 3 orders."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


SQL_TOPK_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
WHERE rk <= 3
"""


def q_sessionize(spark, sf):
    """Sessionization: lag + gap>30min cumulative counting per user."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts arrives as TIMESTAMP_NTZ; session TZ is pinned UTC so the
    # LTZ cast is the identity on the underlying micros
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = us(F.col("ts")) - us(F.lag("ts").over(w))
    new_s = F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
    return (
        ev.withColumn("_n", new_s)
        .groupBy("user_id")
        .agg((F.sum("_n") + 1).alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(sum(new_s) + 1 AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)


def q_dedup_exact(spark, sf):
    return exact_dedup(_t(spark, sf, "documents"), "text", "doc_id")


SQL_DEDUP_EXACT = """
SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_minhash_signatures(spark, sf):
    return minhash_signatures(_t(spark, sf, "documents"), "text", "doc_id")


SQL_MINHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents)
SELECT doc_id,
  min(md5('a' || tok)) AS h_a, min(md5('b' || tok)) AS h_b,
  min(md5('c' || tok)) AS h_c, min(md5('d' || tok)) AS h_d,
  min(md5('e' || tok)) AS h_e, min(md5('f' || tok)) AS h_f,
  min(md5('g' || tok)) AS h_g, min(md5('h' || tok)) AS h_h
FROM toks GROUP BY doc_id
"""


def q_minhash_lsh_pairs(spark, sf):
    sigs = minhash_signatures(_t(spark, sf, "documents"), "text", "doc_id")
    return lsh_candidate_pairs(sigs)


SQL_LSH_PAIRS = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents),
sigs AS (
  SELECT doc_id,
    min(md5('a' || tok)) AS h_a, min(md5('b' || tok)) AS h_b,
    min(md5('c' || tok)) AS h_c, min(md5('d' || tok)) AS h_d,
    min(md5('e' || tok)) AS h_e, min(md5('f' || tok)) AS h_f,
    min(md5('g' || tok)) AS h_g, min(md5('h' || tok)) AS h_h
  FROM toks GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h_a || h_b) AS band1, md5(h_c || h_d) AS band2,
         md5(h_e || h_f) AS band3, md5(h_g || h_h) AS band4
  FROM sigs)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'band1' AS band
  FROM bands a JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
UNION ALL
SELECT a.doc_id, b.doc_id, 'band2'
  FROM bands a JOIN bands b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
UNION ALL
SELECT a.doc_id, b.doc_id, 'band3'
  FROM bands a JOIN bands b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
UNION ALL
SELECT a.doc_id, b.doc_id, 'band4'
  FROM bands a JOIN bands b ON a.band4 = b.band4 AND a.doc_id < b.doc_id
"""


def q_near_dup_pairs(spark, sf):
    """End-to-end near-dup pipeline: MinHash → LSH candidates → exact
    Jaccard verification restricted to candidates (operators/dedup.py
    near_dup_pairs — the composition a 100 TB corpus requires; the
    standalone quadratic verifier is token_jaccard_pairs). doc_id < 500 is
    a visible cap in BOTH engines: it keeps the full sf0.01 correctness
    corpus (500 docs) while bounding the bench-time candidate set at
    sf≥0.1 — this synthetic corpus is near-dup-SATURATED (~78% of all
    pairs collide in some band), so candidates grow ~quadratically with
    the cap, unlike a real corpus."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return near_dup_pairs(docs, "text", "doc_id", threshold=0.5)


SQL_NEAR_DUP = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 500),
sigs AS (
  SELECT doc_id,
    min(md5('a' || tok)) AS h_a, min(md5('b' || tok)) AS h_b,
    min(md5('c' || tok)) AS h_c, min(md5('d' || tok)) AS h_d,
    min(md5('e' || tok)) AS h_e, min(md5('f' || tok)) AS h_f,
    min(md5('g' || tok)) AS h_g, min(md5('h' || tok)) AS h_h
  FROM toks GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h_a || h_b) AS band1, md5(h_c || h_d) AS band2,
         md5(h_e || h_f) AS band3, md5(h_g || h_h) AS band4
  FROM sigs),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band4 = b.band4 AND a.doc_id < b.doc_id
  )),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
"""


def q_incremental_near_dup(spark, sf):
    """IVM near-dedup (operators/dedup.py incremental_near_dup_pairs): the
    corpus's near-dup pairs TOUCHING a CDC delta, computed from the
    maintained base signature table + the delta's text only — the marriage
    of the engine's change feed with the dedup stack (change a doc, learn
    exactly which dup pairs that creates). Delta = every 7th doc id (a
    deterministic ~14% churn); base = the rest; same doc_id < 500 cap and
    threshold as near_dup_pairs. Oracle: the FULL pair pipeline filtered
    to delta-touching pairs — the defining equation of the incremental
    step."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    delta = docs.filter(F.col("doc_id") % 7 == 0)
    base = docs.filter(F.col("doc_id") % 7 != 0)
    base_sigs = minhash_signatures(base, "text", "doc_id")
    return incremental_near_dup_pairs(
        base, delta, "text", "doc_id", base_sigs=base_sigs, threshold=0.5
    )


SQL_INCR_NEAR_DUP = SQL_NEAR_DUP + " AND (doc_a % 7 = 0 OR doc_b % 7 = 0)"


def q_simhash_signatures(spark, sf):
    return simhash_signatures(_t(spark, sf, "documents"), "text", "doc_id")


def _simhash_sql() -> str:
    sums = ",\n    ".join(
        "sum(CASE WHEN strpos('89abcdef', substr(md5(tok), %d, 1)) > 0 THEN 1 ELSE -1 END) AS s%d"
        % (i + 1, i)
        for i in range(16)
    )
    bits = " || ".join(
        f"CASE WHEN s{i} >= 0 THEN '1' ELSE '0' END" for i in range(16)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents),
sums AS (
  SELECT doc_id, {sums}
  FROM toks GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM sums
"""


def q_token_jaccard_pairs(spark, sf):
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return token_jaccard_pairs(docs, "text", "doc_id", threshold=0.2)


SQL_JACCARD = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 100),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
"""


def q_ngram_containment_pairs(spark, sf):
    """Subset-duplication sweep (operators/dedup.py ngram_containment_pairs):
    trigram containment of the smaller doc >= 0.8. The corpus slice is
    augmented with a deterministic 200-char EXCERPT of each doc (id +
    100000) — the aggregator/quote shape this operator exists for, which
    the fixture corpus doesn't naturally contain at every SF — and the
    operator must recover every (original, excerpt) pair while Jaccard
    scores them near zero (the excerpt's n-grams are a tiny fraction of
    the union)."""
    from relational_data_loader_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    excerpts = docs.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    return ngram_containment_pairs(
        docs.unionByName(excerpts), "text", "doc_id", n=3, threshold=0.8
    )


SQL_NGRAM_CONTAINMENT = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 1, 200) AS text
  FROM documents WHERE doc_id < 100),
toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM corpus),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        FROM toks)),
sizes AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM ng a JOIN ng b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(round(i * 1.0 / least(sa.sz, sb.sz), 4) AS DOUBLE) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE i * 1.0 / least(sa.sz, sb.sz) >= 0.8
"""


def q_text_quality(spark, sf):
    d = _t(spark, sf, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("n_tokens"),
        TXT.alpha_ratio(F.col("text")).alias("alpha_ratio"),
    )


SQL_TEXT_QUALITY = """
SELECT doc_id,
  len(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS n_tokens,
  CAST(round(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0 / length(text), 4) AS DOUBLE) AS alpha_ratio
FROM documents WHERE length(text) > 0
"""


def q_text_fingerprints(spark, sf):
    """Tokenizer + fingerprint family (functions/text.py): BPE-ish regex
    pre-token count and the order-sensitive rolling-hash fingerprint,
    alongside the md5 content fingerprint — the three primitives a 100 TB
    text pipeline dedups/shards on."""
    d = _t(spark, sf, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        TXT.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        TXT.rolling_fingerprint(F.col("text")).alias("rolling_fp"),
        TXT.fingerprint(F.col("text")).alias("md5_fp"),
    )


SQL_TEXT_FINGERPRINTS = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       list_reduce(
         list_transform(
           string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '),
           t -> CAST(ascii(t[1]) * 256 + length(t) AS BIGINT)),
         (acc, v) -> (acc * 131 + v) % 1000000007
       ) AS rolling_fp,
       md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS md5_fp
FROM documents WHERE length(text) > 0
"""


def q_lang_stopword_ratio(spark, sf):
    """Language-ID heuristic: domain-stopword hit ratio per document."""
    d = _t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(TXT.tokens(F.col("text"))).alias("tok")
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("tok").isin(STOPWORDS), 1)).alias("n_stopwords"),
        F.round(
            F.count(F.when(F.col("tok").isin(STOPWORDS), 1)) / F.count(F.lit(1)), 4
        )
        .cast("double")
        .alias("stopword_ratio"),
    )


SQL_STOPWORD_RATIO = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents)
SELECT doc_id, count(*) AS n_tokens,
  count(*) FILTER (WHERE tok IN ({",".join(repr(s) for s in STOPWORDS)})) AS n_stopwords,
  CAST(round(count(*) FILTER (WHERE tok IN ({",".join(repr(s) for s in STOPWORDS)})) * 1.0
             / count(*), 4) AS DOUBLE) AS stopword_ratio
FROM toks GROUP BY doc_id
"""


def q_embedding_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return cosine_topk(
        emb.filter(F.col("vec_id") < 5), emb, k=5
    )


SQL_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
sims AS (
  SELECT q_id, c_id,
         CAST(round(list_cosine_similarity(q_emb::DOUBLE[], c_emb::DOUBLE[]), 3) AS DOUBLE) AS sim
  FROM q CROSS JOIN c WHERE q_id <> c_id)
SELECT q_id, c_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) rk FROM sims)
WHERE rk <= 5
"""


def q_set_ops_inactive_customers(spark, sf):
    """Set ops (absent in the reference): customers EXCEPT order-placers,
    and the intersection count as a cross-check."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    inactive = c.exceptAll(o.distinct())
    return inactive.select(F.col("c_custkey").alias("inactive_custkey"))


SQL_SET_OPS = """
SELECT c_custkey AS inactive_custkey FROM customer
EXCEPT
SELECT DISTINCT o_custkey FROM orders
"""


def q_top_orders_global(spark, sf):
    """Sort + limit with deterministic tie-break (transport-level ORDER BY /
    TOP(n) of the reference's keyset pagination, as a user-facing op)."""
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_asof_last_click_before_error(spark, sf):
    """As-of join pattern (Spark lacks a native one): for each error event,
    the most recent prior click by the same user — running-max window with
    an explicit frame."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_click = F.max(
        F.when(F.col("event_type") == "click", F.col("event_id"))
    ).over(w)
    return (
        ev.withColumn("prev_click_lsn", prev_click)
        .filter(F.col("event_type") == "error")
        .select("user_id", F.col("event_id").alias("err_lsn"), "prev_click_lsn")
    )


SQL_ASOF = """
SELECT user_id, event_id AS err_lsn, prev_click_lsn
FROM (
  SELECT user_id, event_id, event_type,
         max(CASE WHEN event_type = 'click' THEN event_id END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_lsn
  FROM events) t
WHERE event_type = 'error'
"""


def q_cdc_audit_columns(spark, sf):
    """Per-row audit columns (P3 — sinks append _rdl_exec_id/_rdl_loaded_at):
    final state stamped with the epoch that wrote it. One full-refresh epoch
    (the log's max lsn) stamps every row; the timestamp is epoch-DERIVED so
    replays are byte-stable (never current_timestamp())."""
    final = q_cdc_apply_final_state(spark, sf)
    mx = _t(spark, sf, "events").agg(F.max("event_id").alias(AUDIT_EXEC_ID))
    return final.crossJoin(F.broadcast(mx)).withColumn(
        AUDIT_LOADED_AT,
        F.timestamp_seconds(F.col(AUDIT_EXEC_ID)).cast("timestamp_ntz"),
    )


SQL_AUDIT_COLUMNS = f"""
SELECT t.user_id, t.last_lsn, t.last_op, t.last_value, t.last_ts,
       m.{AUDIT_EXEC_ID},
       make_timestamp(CAST(m.{AUDIT_EXEC_ID} AS BIGINT) * 1000000) AS {AUDIT_LOADED_AT}
FROM (
  SELECT user_id, event_id AS last_lsn, event_type AS last_op,
         value AS last_value, ts AS last_ts
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
        FROM events) r
  WHERE rn = 1 AND event_type <> '{DELETE_OP}') t
CROSS JOIN (SELECT max(event_id) AS {AUDIT_EXEC_ID} FROM events) m
"""


def q_normalize_text_nfc(spark, sf):
    """The north_star's mandated text normalization (Unicode NFC + whitespace
    collapse + trim) — the engine's one Arrow-batched Python crossing
    (functions/registry.py normalize_text). md5 output so the value hash is
    encoding-robust across engines."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.md5(get_transform("normalize_text")(F.col("text"))).alias("norm_md5"),
    )


SQL_NORMALIZE_NFC = r"""
SELECT doc_id,
       md5(trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g'))) AS norm_md5
FROM documents
"""


def _lsh_planes(n_planes: int, dim: int, seed: int = 42):
    """The SAME seeded hyperplanes operators/similarity.py embeds as literals."""
    import numpy as np

    return np.random.default_rng(seed).standard_normal((n_planes, dim))


_LSH_PLANES_N = 6
_LSH_DIM = 64  # embeddings.embedding is float[64] at every sf (TESTDATA.md)


def q_lsh_cosine_topk(spark, sf):
    """ANN scale path: hyperplane-LSH bucketed cosine top-k — the bucket
    equi-join replaces embedding_cosine_topk's cross join (operators/
    similarity.py lsh_cosine_topk). Oracle = brute-force top-k restricted to
    the same seeded buckets."""
    emb = _t(spark, sf, "embeddings")
    return lsh_cosine_topk(
        emb.filter(F.col("vec_id") < 5), emb, dim=_LSH_DIM, k=5,
        n_planes=_LSH_PLANES_N,
    )


def _lsh_sql() -> str:
    """DuckDB twin: identical seeded planes as literals; the dot product is
    an explicit left-to-right term chain so FP accumulation order matches
    Spark's aggregate fold exactly (sign flips would move bucket ids)."""
    planes = _lsh_planes(_LSH_PLANES_N, _LSH_DIM)
    cases = []
    for i in range(_LSH_PLANES_N):
        dot = " + ".join(
            f"emb[{j + 1}]*{float(v)!r}" for j, v in enumerate(planes[i])
        )
        weight = 2 ** (_LSH_PLANES_N - 1 - i)
        cases.append(f"(CASE WHEN ({dot}) >= 0 THEN {weight} ELSE 0 END)")
    bucket = " + ".join(cases)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
b AS (SELECT vec_id, emb, CAST({bucket} AS BIGINT) AS bucket FROM e),
q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket FROM b WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, emb AS c_emb, bucket FROM b),
sims AS (
  SELECT q_id, c_id,
         CAST(round(list_cosine_similarity(q_emb, c_emb), 3) AS DOUBLE) AS sim
  FROM q JOIN c USING (bucket) WHERE q_id <> c_id)
SELECT q_id, c_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) rk
      FROM sims)
WHERE rk <= 5
"""


def q_doc_repetition_stats(spark, sf):
    """Within-document repetition (the Gopher/MassiveText quality rule,
    functions/text.py duplicate_ngram_fraction): fraction of word 2-gram /
    3-gram occurrences that repeat an earlier occurrence in the same doc.
    High values flag boilerplate and degenerate text — a core
    training-data filter. Pure array expressions, no shuffle beyond the
    scan."""
    docs = _t(spark, sf, "documents")
    # tokenize ONCE into a materialized column — inlining tokens() into the
    # n-gram lambdas re-splits the doc per element (functions/text.py note)
    toked = docs.select("doc_id", TXT.tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        F.round(TXT.duplicate_ngram_fraction_from_tokens(F.col("toks"), 2), 4)
        .alias("dup_2gram_frac"),
        F.round(TXT.duplicate_ngram_fraction_from_tokens(F.col("toks"), 3), 4)
        .alias("dup_3gram_frac"),
    )


def _repetition_sql() -> str:
    def gram_cte(n, name):
        cat = " || ' ' || ".join(f"t.toks[i.i + {j}]" for j in range(n))
        return f"""
{name} AS (
  SELECT doc_id, count(*) AS tot, count(DISTINCT gram) AS dst
  FROM (SELECT t.doc_id, {cat} AS gram
        FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(t.toks) - {n - 1}, 0))) AS i) i)
  GROUP BY doc_id)"""

    return f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
{gram_cte(2, 'g2')},
{gram_cte(3, 'g3')}
SELECT t.doc_id,
       CAST(round(1.0 - CAST(g2.dst AS DOUBLE) / CAST(g2.tot AS DOUBLE), 4)
            AS DOUBLE) AS dup_2gram_frac,
       CAST(round(1.0 - CAST(g3.dst AS DOUBLE) / CAST(g3.tot AS DOUBLE), 4)
            AS DOUBLE) AS dup_3gram_frac
FROM t
LEFT JOIN g2 USING (doc_id)
LEFT JOIN g3 USING (doc_id)
"""


def q_lang_id_ngram(spark, sf):
    """Character-n-gram language ID (the Cavnar–Trenkle heuristic with
    fixed literal trigram profiles, functions/text.py): explode each doc's
    trigrams, join the broadcast profile table, sum integer weights per
    language, argmax with lexicographic tie-break. Complements the
    stopword-ratio heuristic (lang_stopword_ratio) — this is the n-gram
    variant the training-pipeline spec names. Docs with no profile hits
    (e.g. too short) have no language evidence and are excluded."""
    return TXT.lang_id(_t(spark, sf, "documents"))


def _lang_id_sql() -> str:
    """DuckDB twin: identical profiles as a VALUES table, identical trigram
    extraction (generate_series over the normalized text), integer scores
    so parity is exact."""
    values = ", ".join(
        f"('{lang}', '{tri}', {w})"
        for lang, prof in TXT.LANG_TRIGRAM_PROFILES.items()
        for tri, w in prof.items()
    )
    return f"""
WITH prof(lang, tri, w) AS (VALUES {values}),
norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z]+', ' ', 'g') AS t
  FROM documents),
tris AS (
  SELECT n.doc_id, substr(n.t, i.i, 3) AS tri
  FROM norm n, LATERAL (
    SELECT unnest(generate_series(1, greatest(length(n.t) - 2, 0))) AS i) i),
scores AS (
  SELECT t.doc_id, p.lang, CAST(sum(p.w) AS BIGINT) AS score
  FROM tris t JOIN prof p ON t.tri = p.tri
  GROUP BY t.doc_id, p.lang)
SELECT doc_id, lang, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang) rn
      FROM scores)
WHERE rn = 1
"""


def q_multimodal_features(spark, sf):
    """Multimodal feature extraction (operators/multimodal.py
    extract_features): binary payloads → fixed-dim vectors via Arrow
    mapInPandas — THE engine surface where a real deployment injects
    PIL/torchaudio kernels (register_decoder). The sandbox kernel is the
    documented deterministic fake (md5-derived bytes/255), which is what
    makes this path ORACLE-PAIRABLE: the oracle recomputes the same
    md5-byte features in SQL, so the whole Arrow plumbing (schema, batch
    shape, byte counts) is value-checked end to end for non-null payloads
    (the pairing filters NULL text on both sides — posexplode and the
    oracle's cross join disagree on how many rows a NULL feature yields;
    the null-payload path is pinned by tests/test_multimodal.py).
    Features are exploded to (item_id, feature_idx, val) rows because
    float-array stringification differs across engines."""
    from relational_data_loader_spark.operators.multimodal import extract_features

    docs = (
        _t(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("item_id"),
            F.lit("image").alias("media_type"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )
    feats = extract_features(docs)
    return feats.select(
        "item_id",
        "n_bytes",
        F.posexplode("feature").alias("feature_idx", "v"),
    ).select(
        "item_id",
        "n_bytes",
        "feature_idx",
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


# hex-nibble lookup: DuckDB's blob→int path is unhex+ord, which breaks on
# non-UTF-8 bytes — instr over the hex alphabet is bytes-exact instead
_SQL_NIBBLE = "(instr('0123456789abcdef', substr(d.h, {pos}, 1)) - 1)"
SQL_MULTIMODAL_FEATURES = f"""
WITH d AS (
  SELECT doc_id AS item_id,
         md5(text) AS h,
         octet_length(encode(text)) AS n_bytes
  FROM documents WHERE text IS NOT NULL
), i AS (SELECT unnest(generate_series(0, 15)) AS feature_idx)
SELECT d.item_id, d.n_bytes, i.feature_idx,
       CAST(round((
         {_SQL_NIBBLE.format(pos='2*i.feature_idx + 1')} * 16
         + {_SQL_NIBBLE.format(pos='2*i.feature_idx + 2')}
       ) / 255.0, 4) AS DOUBLE) AS val
FROM d CROSS JOIN i
"""


def q_windowed_rollup(spark, sf):
    """Event-time windowed rollup (streaming/windowed.py windowed_turn_stats
    run in batch mode, where the watermark is a no-op): per (5-minute
    window, event_type) upsert/delete counts over the events log. The
    approx_count_distinct column is dropped from the pairing — HLL sketches
    are engine-specific and no SQL oracle can reproduce Spark's — so the
    deterministic columns carry the parity check; the streaming-only
    semantics (watermark late-drop, append finalization) are pinned by
    tests/test_windowed_stream.py."""
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec
    from relational_data_loader_spark.streaming.windowed import windowed_turn_stats

    ev = _t(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("event_type").alias("op"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    spec = IngestSpec(
        name="events_rollup",
        source="parquet://",
        columns=[ColumnSpec("user_id", "user_id", "bigint", primary_key=True,
                            nullable=False)],
        delete_op=DELETE_OP,
    )
    return windowed_turn_stats(
        ev, spec, window_size="5 minutes", role_col="event_type"
    ).select("window_start", "window_end", "role", "n_upserts", "n_deletes")


SQL_WINDOWED_ROLLUP = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
       event_type AS role,
       CAST(sum(CASE WHEN event_type <> '{DELETE_OP}' THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
       CAST(sum(CASE WHEN event_type = '{DELETE_OP}' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
FROM events
GROUP BY 1, 2, 3
"""


_NDV_PLANES = 4     # fewer planes than the top-k query: near-dup recall at
_NDV_THRESHOLD = 0.4  # the fixture's similarity range (max pair cos ≈ 0.51)


def q_embedding_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs (operators/similarity.py
    embedding_near_dup_pairs): hyperplane-LSH bucket self-join → exact
    cosine ≥ threshold. The dedup-by-embedding twin of near_dup_pairs."""
    from relational_data_loader_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf, "embeddings")
    return embedding_near_dup_pairs(
        emb, dim=_LSH_DIM, threshold=_NDV_THRESHOLD, n_planes=_NDV_PLANES
    )


def _embedding_near_dup_sql() -> str:
    """DuckDB twin: same seeded planes as codegen literals (sign flips move
    bucket ids, so the dot is the exact left-to-right chain), pairs joined
    on bucket, exact cosine at 3dp."""
    planes = _lsh_planes(_NDV_PLANES, _LSH_DIM)
    cases = []
    for i in range(_NDV_PLANES):
        dot = " + ".join(
            f"emb[{j + 1}]*{float(v)!r}" for j, v in enumerate(planes[i])
        )
        weight = 2 ** (_NDV_PLANES - 1 - i)
        cases.append(f"(CASE WHEN ({dot}) >= 0 THEN {weight} ELSE 0 END)")
    bucket = " + ".join(cases)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
b AS (SELECT vec_id, emb, CAST({bucket} AS BIGINT) AS bucket FROM e)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       CAST(round(list_cosine_similarity(x.emb, y.emb), 3) AS DOUBLE) AS sim
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.emb, y.emb), 3) >= {_NDV_THRESHOLD}
"""


_IVF_CENTROIDS = 8
_IVF_NPROBE = 2
_IVF_K = 5
_IVF_QUERIES = 5  # vec_id < 5


def q_ivf_cosine_topk(spark, sf):
    """IVF ANN (operators/similarity.py ivf_cosine_topk): data-sampled
    coarse quantizer (embeddings of the 8 lowest vec_ids), candidates
    restricted to the query's 2 nearest cells, exact rerank inside. The
    density-adaptive twin of lsh_cosine_topk."""
    from relational_data_loader_spark.operators.similarity import (
        ivf_cosine_topk,
        sample_centroids,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = sample_centroids(emb, _IVF_CENTROIDS)
    return ivf_cosine_topk(
        emb.filter(F.col("vec_id") < _IVF_QUERIES), emb, centroids,
        k=_IVF_K, nprobe=_IVF_NPROBE,
    )


def _ivf_sql(dim: int = 64) -> str:
    """DuckDB twin of ivf_cosine_topk. Every dot/norm is an explicit
    left-to-right term chain so the doubles are bit-identical to Spark's
    aggregate folds; assignment ties break LOW cell, probe ties HIGH cell
    (mirroring the operator's strict-> when-chain and desc struct sort)."""

    def dot(a, b):
        return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))

    def norm(a):
        return "sqrt(" + " + ".join(f"{a}[{i}]*{a}[{i}]" for i in range(1, dim + 1)) + ")"

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
        FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {_IVF_CENTROIDS})),
sims AS (
  SELECT e.vec_id, cen.cell,
         round(({dot('e.emb', 'cen.cemb')}) /
               ({norm('e.emb')} * {norm('cen.cemb')}), 6) AS csim
  FROM e CROSS JOIN cen),
assign AS (
  SELECT vec_id, cell
  FROM (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell ASC) rn
        FROM sims)
  WHERE rn = 1),
probe AS (
  SELECT vec_id AS q_id, cell
  FROM (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell DESC) rn
        FROM sims WHERE vec_id < {_IVF_QUERIES})
  WHERE rn <= {_IVF_NPROBE}),
pairs AS (
  SELECT p.q_id, a.vec_id AS c_id
  FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.q_id),
scored AS (
  SELECT pr.q_id, pr.c_id,
         CAST(round(({dot('qe.emb', 'ce.emb')}) /
                    ({norm('qe.emb')} * {norm('ce.emb')}), 3) AS DOUBLE) AS sim
  FROM pairs pr
  JOIN e qe ON qe.vec_id = pr.q_id
  JOIN e ce ON ce.vec_id = pr.c_id)
SELECT q_id, c_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY sim DESC, c_id) rk
      FROM scored)
WHERE rk <= {_IVF_K}
"""


def q_ivf_cell_ivm(spark, sf):
    """IVM for the IVF ASSIGNMENT view (operators/similarity.py
    apply_delta_cells): a delta of re-embedded vectors (every 9th vec_id,
    op=U) updates the maintained (vec_id, cell) table under the FIXED
    coarse quantizer — anti-join out changed ids, re-derive cells from the
    delta's embeddings only. Result must equal the full rebuild over the
    whole corpus, which is what the oracle states directly (the same
    argmax-cosine assignment the ivf_cosine_topk oracle uses)."""
    from relational_data_loader_spark.operators.similarity import (
        apply_delta_cells,
        ivf_cell_assignments,
        sample_centroids,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = sample_centroids(emb, _IVF_CENTROIDS)
    delta = emb.filter(F.col("vec_id") % 9 == 0).withColumn("op", F.lit("U"))
    base = emb.filter(F.col("vec_id") % 9 != 0)
    prev = ivf_cell_assignments(base, centroids)
    return apply_delta_cells(prev, delta, centroids)


def _ivf_cells_sql(dim: int = 64) -> str:
    """DuckDB twin of the maintained assignment view: the full-corpus
    argmax-cosine assignment (IVM result == rebuild is the equation being
    checked). Same 6dp rounding and low-cell tie as _ivf_sql's assign."""

    def dot(a, b):
        return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))

    def norm(a):
        return "sqrt(" + " + ".join(f"{a}[{i}]*{a}[{i}]" for i in range(1, dim + 1)) + ")"

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
        FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {_IVF_CENTROIDS})),
sims AS (
  SELECT e.vec_id, cen.cell,
         round(({dot('e.emb', 'cen.cemb')}) /
               ({norm('e.emb')} * {norm('cen.cemb')}), 6) AS csim
  FROM e CROSS JOIN cen)
SELECT vec_id, CAST(cell AS INTEGER) AS cell
FROM (SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cell ASC) rn
      FROM sims)
WHERE rn = 1
"""


_IVF_KMEANS_ITERS = 2


def q_ivf_cosine_topk_refined(spark, sf):
    """IVF ANN with the spherical-k-means-refined coarse quantizer
    (operators/similarity.py kmeans_refine_centroids), end to end: same
    data-sampled init as ivf_cosine_topk, then 2 deterministic Lloyd
    iterations with ``round_decimals=6`` — each iteration's renormalized
    mean-direction centroids land on a fixed decimal grid, so the oracle
    can re-derive them with unrolled SQL iterations instead of needing
    data-dependent literals (which would pin the oracle to one SF). The
    refinement itself is DataFrame aggregation: assignment is the same
    shuffle-free codegen argmax, re-centering is one map-side-partial
    groupBy of n_centroids x dim doubles per iteration; only n_centroids
    rows ever reach the driver."""
    from relational_data_loader_spark.operators.similarity import (
        ivf_cosine_topk,
        kmeans_refine_centroids,
        sample_centroids,
    )

    emb = _t(spark, sf, "embeddings")
    init = sample_centroids(emb, _IVF_CENTROIDS)
    cents = kmeans_refine_centroids(
        emb, init, n_iters=_IVF_KMEANS_ITERS, round_decimals=6
    )
    return ivf_cosine_topk(
        emb.filter(F.col("vec_id") < _IVF_QUERIES), emb, cents,
        k=_IVF_K, nprobe=_IVF_NPROBE,
    )


def _ivf_refined_sql(iters: int = _IVF_KMEANS_ITERS, dim: int = 64) -> str:
    """DuckDB twin of q_ivf_cosine_topk_refined: the Lloyd iterations are
    UNROLLED as CTE pairs (assign -> per-cell mean -> renormalize+round),
    so the same SQL string is correct at every SF. Float discipline, per
    term: csim rounds to 6dp before every argmax (both engines); cell
    means carry ~1e-16 summation-order noise (Spark partial aggs vs
    DuckDB sequential) which the 6dp rounding of the unit vector absorbs;
    dot/norm chains are explicit left-to-right so the final reranked
    doubles are bit-identical. Empty cells and ~zero-norm means keep the
    previous centroid (LEFT JOIN + CASE), mirroring the operator."""

    def dot(a, b):
        return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))

    def norm(a):
        return "sqrt(" + " + ".join(f"{a}[{i}]*{a}[{i}]" for i in range(1, dim + 1)) + ")"

    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb"
        f" FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {_IVF_CENTROIDS}))",
    ]
    for j in range(1, iters + 1):
        p = j - 1
        means = ", ".join(f"avg(e.emb[{i}]) AS m{i}" for i in range(1, dim + 1))
        mnorm = "sqrt(" + " + ".join(
            f"m{i}*m{i}" for i in range(1, dim + 1)
        ) + ")"
        unit = ", ".join(
            f"round(n.m{i} / n.nrm, 6)" for i in range(1, dim + 1)
        )
        ctes += [
            f"s{j} AS (SELECT e.vec_id, c.cell,"
            f" round(({dot('e.emb', 'c.cemb')}) /"
            f" ({norm('e.emb')} * {norm('c.cemb')}), 6) AS csim"
            f" FROM e CROSS JOIN c{p} c)",
            f"a{j} AS (SELECT vec_id, cell FROM"
            f" (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY csim DESC, cell ASC) rn FROM s{j}) WHERE rn = 1)",
            f"m{j} AS (SELECT a.cell, {means}"
            f" FROM a{j} a JOIN e ON e.vec_id = a.vec_id GROUP BY a.cell)",
            f"n{j} AS (SELECT *, {mnorm} AS nrm FROM m{j})",
            f"c{j} AS (SELECT c.cell, CASE WHEN n.cell IS NULL OR"
            f" n.nrm <= 1e-12 THEN c.cemb ELSE [{unit}] END AS cemb"
            f" FROM c{p} c LEFT JOIN n{j} n ON c.cell = n.cell)",
        ]
    body = ",\n".join(ctes)
    return f"""
WITH {body},
sims AS (
  SELECT e.vec_id, cen.cell,
         round(({dot('e.emb', 'cen.cemb')}) /
               ({norm('e.emb')} * {norm('cen.cemb')}), 6) AS csim
  FROM e CROSS JOIN c{iters} cen),
assign AS (
  SELECT vec_id, cell
  FROM (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell ASC) rn
        FROM sims)
  WHERE rn = 1),
probe AS (
  SELECT vec_id AS q_id, cell
  FROM (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell DESC) rn
        FROM sims WHERE vec_id < {_IVF_QUERIES})
  WHERE rn <= {_IVF_NPROBE}),
pairs AS (
  SELECT p.q_id, a.vec_id AS c_id
  FROM probe p JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.q_id),
scored AS (
  SELECT pr.q_id, pr.c_id,
         CAST(round(({dot('qe.emb', 'ce.emb')}) /
                    ({norm('qe.emb')} * {norm('ce.emb')}), 3) AS DOUBLE) AS sim
  FROM pairs pr
  JOIN e qe ON qe.vec_id = pr.q_id
  JOIN e ce ON ce.vec_id = pr.c_id)
SELECT q_id, c_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY sim DESC, c_id) rk
      FROM scored)
WHERE rk <= {_IVF_K}
"""


def q_cdc_debezium_parse(spark, sf):
    """Debezium envelope round-trip (sources/debezium.py): each event is
    serialized into a real Debezium JSON document (op c/r/u/d, before/after
    images, source.lsn) with whole-stage-codegen format_string, then parsed
    back through the engine's from_json path. The oracle states the expected
    envelope SEMANTICS directly (no JSON), so it independently checks the
    parser: op mapping c/r→I u→U d→D, delete keys from the before image,
    payload NULL on delete."""
    from relational_data_loader_spark.sources.debezium import parse_debezium
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec

    ev = _t(spark, sf, "events")
    # integer-only payload so the JSON text is bit-identical to what any
    # engine would build (no float formatting ambiguity)
    img = F.format_string(
        '{"user_id":%d,"value_cents":%d}',
        F.col("user_id"),
        F.floor(F.col("value") * 100).cast("long"),
    )
    is_del = F.col("event_type") == "error"
    dbz_op = (
        F.when(is_del, F.lit("d"))
        .when(F.col("event_type") == "click", F.lit("c"))
        .when(F.col("event_type") == "signup", F.lit("r"))
        .otherwise(F.lit("u"))
    )
    doc = F.format_string(
        '{"op":"%s","ts_ms":%d,"before":%s,"after":%s,"source":{"lsn":%d}}',
        dbz_op,
        # parquet reads as TIMESTAMP_NTZ; session TZ is pinned UTC (_t)
        F.unix_millis(F.col("ts").cast("timestamp")),
        F.when(is_del, img).otherwise(F.lit("null")),
        F.when(is_del, F.lit("null")).otherwise(img),
        F.col("event_id"),
    )
    spec = IngestSpec(
        name="dbz_events",
        source="debezium://",
        columns=[
            ColumnSpec("user_id", "user_id", "bigint", primary_key=True,
                       nullable=False),
            ColumnSpec("value_cents", "value_cents", "bigint"),
        ],
    )
    return parse_debezium(ev.select(doc.alias("value")), spec)


SQL_DEBEZIUM_PARSE = """
SELECT event_id AS lsn,
       CASE WHEN event_type = 'error' THEN 'D'
            WHEN event_type IN ('click', 'signup') THEN 'I'
            ELSE 'U' END AS op,
       user_id,
       CASE WHEN event_type = 'error' THEN NULL
            ELSE CAST(floor(value * 100) AS BIGINT) END AS value_cents
FROM events
"""


# --------------------------------------------------------------------------
# round-4 additions: history, time travel, corpus stats, deterministic
# sampling


def q_cdc_scd2_history(spark, sf):
    """SCD2 validity intervals from the change log (operators/lww.py
    scd2_history — the LWW dual): every change version becomes a row valid
    [its lsn, next change's lsn); NULL valid_to = current unless a delete
    closed the key. One window shuffle on the full key, no self-join."""
    from relational_data_loader_spark.operators.lww import scd2_history

    ev = _t(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    h = scd2_history(
        ev, ["user_id"], lsn_col="event_id", op_col="event_type",
        delete_op=DELETE_OP,
    )
    return h.select(
        "user_id",
        F.col("event_id").alias("lsn"),
        F.col("event_type").alias("op"),
        F.col("value").alias("val"),
        "valid_to_lsn",
        "is_current",
    )


SQL_SCD2_HISTORY = f"""
SELECT user_id, event_id AS lsn, event_type AS op, value AS val,
       lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
         AS valid_to_lsn,
       (lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
        AND event_type <> '{DELETE_OP}') AS is_current
FROM events
"""


def q_cdc_snapshot_asof(spark, sf):
    """Time travel over the raw log: table state AS OF the log's midpoint
    LSN — replay filtered to lsn ≤ cut, then the same LWW net + delete
    drop as final state. The cut is derived from the data (floor(max/2))
    so the query is scale-free; it reaches Spark as a 1-row broadcast
    (control-plane aggregate, no second scan of payload columns)."""
    ev = _t(spark, sf, "events").select(
        "event_id", "event_type", "user_id", "value", "ts"
    )
    thr = ev.agg(
        F.floor(F.max("event_id") / 2).cast("bigint").alias("_cut")
    )
    upto = ev.join(F.broadcast(thr)).filter(F.col("event_id") <= F.col("_cut"))
    net = net_changes(upto, ["user_id"], lsn_col="event_id", op_col="event_type")
    return net.filter(F.col("event_type") != DELETE_OP).select(
        "user_id",
        F.col("event_id").alias("last_lsn"),
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
    )


SQL_SNAPSHOT_ASOF = f"""
WITH thr AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS cut FROM events)
SELECT user_id, event_id AS last_lsn, event_type AS last_op,
       value AS last_value
FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                                     ORDER BY event_id DESC) rn
      FROM events e, thr WHERE e.event_id <= thr.cut) t
WHERE rn = 1 AND event_type <> '{DELETE_OP}'
"""


def q_doc_frequency_topk(spark, sf):
    """Corpus document-frequency top-k (operators/dedup.py
    doc_frequency_topk): the DF of TF-IDF / stopword-list induction.
    Deterministic cut via (doc_freq DESC, tok ASC) total order."""
    from relational_data_loader_spark.operators.dedup import doc_frequency_topk

    return doc_frequency_topk(_t(spark, sf, "documents"), "text", "doc_id", k=50)


SQL_DOC_FREQUENCY = """
SELECT tok, count(*) AS doc_freq
FROM (SELECT DISTINCT doc_id, unnest(string_split(
        regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY doc_freq DESC, tok
LIMIT 50
"""


# stratified sampling: downsample dominant 'en' to 20%, keep 80% elsewhere
_SAMPLE_RATES = {"en": 0.2}
_SAMPLE_DEFAULT = 0.8


def q_stratified_sample(spark, sf):
    """Deterministic per-stratum downsampling (operators/sampling.py):
    keep-decision from the row's own md5-derived uniform, so the sample is
    identical across retries, partitionings and engines — a filter-only
    plan with no shuffle."""
    from relational_data_loader_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    return stratified_sample(
        docs, "lang", _SAMPLE_RATES, _SAMPLE_DEFAULT, key_col="doc_id"
    )


def _stratified_sample_sql() -> str:
    """DuckDB twin of hash_uniform: first 8 md5 hex chars → u32 via the
    nibble-instr fold (bytes-exact, no blob casts), compared against the
    same per-stratum rate CASE."""
    h = "md5(CAST(doc_id AS VARCHAR))"
    u32 = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )
    rate_cases = " ".join(
        f"WHEN lang = '{s}' THEN {r!r}" for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE ({u32}) / {float(2**32)!r}
      < (CASE {rate_cases} ELSE {_SAMPLE_DEFAULT!r} END)
"""


def q_temperature_mix(spark, sf):
    """p^α temperature mix (operators/sampling.py temperature_mix): rates
    DERIVED from the corpus's own per-language counts (α=0.3 flattens the
    'en' head, budget 0.5), then the usual content-hash keep decision.
    The oracle recomputes the rate arithmetic independently, so a green
    row checks the derivation, not just the filter."""
    from relational_data_loader_spark.operators.sampling import (
        temperature_mix,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    return temperature_mix(
        docs, "lang", key_col="doc_id", alpha=0.3, budget_frac=0.5
    )


def _temperature_mix_sql(alpha: float = 0.3, budget: float = 0.5) -> str:
    h = "md5(CAST(doc_id AS VARCHAR))"
    u32 = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH counts AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
tot AS (SELECT sum(n_s) AS n, sum(pow(n_s, {alpha!r})) AS z FROM counts),
rates AS (
  SELECT lang,
         round(least(1.0,
                     {budget!r} * pow(n_s, {alpha!r}) / z * n / n_s),
               6) AS rate
  FROM counts, tot)
SELECT d.doc_id, d.lang, d.source, r.rate
FROM documents d JOIN rates r USING (lang)
WHERE ({u32}) / {float(2**32)!r} < r.rate
"""


SQL_TEMPERATURE_MIX = _temperature_mix_sql()


# --------------------------------------------------------------------------
# round-4 additions: transcript-native ops, snapshot diff / incremental
# rollup (IVM), range join, contamination, PII scrub, corpus histograms


def q_transcript_assembly(spark, sf):
    """Conversation assembly (operators/transcript.py): the per-turn
    text-equality-under-stable-ordering invariant reduced to one md5
    fingerprint per conversation. events as the transcript: user_id plays
    conv_id, event_id the turn order, event_type the turn text."""
    from relational_data_loader_spark.operators.transcript import (
        assemble_conversations,
    )

    ev = _t(spark, sf, "events").select("user_id", "event_id", "event_type")
    return assemble_conversations(ev, "user_id", "event_id", "event_type")


SQL_TRANSCRIPT_ASSEMBLY = """
SELECT user_id,
       count(*) AS n_turns,
       min(event_id) AS first_turn,
       max(event_id) AS last_turn,
       md5(string_agg(event_type, chr(31) ORDER BY event_id)) AS conv_fingerprint,
       CAST(sum(length(event_type)) AS BIGINT) AS total_chars
FROM events GROUP BY user_id
"""


def q_context_window_assembly(spark, sf):
    """SFT example construction (operators/transcript.py context_windows):
    one training example per turn = the previous 3 turns + the turn
    itself, fingerprinted. events as the transcript: user_id=conv_id,
    event_id=turn order, event_type=turn text."""
    from relational_data_loader_spark.operators.transcript import context_windows

    ev = _t(spark, sf, "events").select("user_id", "event_id", "event_type")
    return context_windows(ev, "user_id", "event_id", "event_type", k_prev=3)


SQL_CONTEXT_WINDOWS = """
SELECT user_id, event_id,
       count(*) OVER w AS n_ctx,
       md5(array_to_string(list(event_type) OVER w, chr(31))) AS ctx_fingerprint,
       CAST(length(array_to_string(list(event_type) OVER w, chr(31))) AS BIGINT)
         AS ctx_chars
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_conversation_dedup(spark, sf):
    """Conversation-granular exact dedup (operators/transcript.py
    dedup_conversations): assembled-fingerprint grouping with keeper
    election. A synthetic mirror (user_id + 1e9, same turns) is unioned in
    so duplicate conversations actually exist; every fingerprint must then
    have exactly 2 members with the original as keeper."""
    from relational_data_loader_spark.operators.transcript import (
        dedup_conversations,
    )

    ev = _t(spark, sf, "events").select("user_id", "event_id", "event_type")
    mirror = ev.select(
        (F.col("user_id") + F.lit(1_000_000_000)).alias("user_id"),
        "event_id",
        "event_type",
    )
    return dedup_conversations(
        ev.unionByName(mirror), "user_id", "event_id", "event_type"
    )


SQL_CONVERSATION_DEDUP = """
WITH turns AS (
  SELECT user_id, event_id, event_type FROM events
  UNION ALL
  SELECT user_id + 1000000000 AS user_id, event_id, event_type FROM events),
asm AS (
  SELECT user_id,
         count(*) AS n_turns,
         md5(string_agg(event_type, chr(31) ORDER BY event_id))
           AS conv_fingerprint
  FROM turns GROUP BY user_id)
SELECT conv_fingerprint,
       count(*) AS n_convs,
       min(user_id) AS keeper,
       min(n_turns) AS n_turns
FROM asm GROUP BY conv_fingerprint
"""


def q_transcript_integrity(spark, sf):
    """Turn-sequence audit (operators/transcript.py turn_integrity):
    duplicate and missing turn keys per conversation. Epoch-second of ts
    plays the turn key so collisions (duplicates) actually occur."""
    from relational_data_loader_spark.operators.transcript import turn_integrity

    ev = _t(spark, sf, "events").select(
        "user_id", F.unix_seconds(F.col("ts").cast("timestamp")).alias("turn_s")
    )
    return turn_integrity(ev, "user_id", "turn_s")


SQL_TRANSCRIPT_INTEGRITY = """
SELECT user_id,
       count(*) AS n_rows,
       count(DISTINCT epoch_us(ts) // 1000000) AS n_turns,
       min(epoch_us(ts) // 1000000) AS min_turn,
       max(epoch_us(ts) // 1000000) AS max_turn,
       count(*) - count(DISTINCT epoch_us(ts) // 1000000) AS n_dup_turns,
       (max(epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000) + 1)
         - count(DISTINCT epoch_us(ts) // 1000000) AS n_gaps,
       (count(*) = count(DISTINCT epoch_us(ts) // 1000000)
        AND (max(epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000) + 1)
            = count(DISTINCT epoch_us(ts) // 1000000)) AS is_clean
FROM events GROUP BY user_id
"""


def _final_state(ev, upto_cut: bool):
    """Keyed final state (user_id → value) via LWW net + delete drop,
    optionally restricted to lsn ≤ the log midpoint cut (1-row broadcast)."""
    if upto_cut:
        thr = ev.agg(F.floor(F.max("event_id") / 2).cast("bigint").alias("_cut"))
        ev = ev.join(F.broadcast(thr)).filter(F.col("event_id") <= F.col("_cut"))
    net = net_changes(ev, ["user_id"], lsn_col="event_id", op_col="event_type")
    return net.filter(F.col("event_type") != DELETE_OP).select("user_id", "value")


_SQL_STATE = """
  SELECT user_id, value
  FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) rn
        FROM events e{cut_join}{cut_where})
  WHERE rn = 1 AND event_type <> '{delete_op}'
"""


def _state_sql(upto_cut: bool) -> str:
    return _SQL_STATE.format(
        cut_join=", thr" if upto_cut else "",
        cut_where=" WHERE e.event_id <= thr.cut" if upto_cut else "",
        delete_op=DELETE_OP,
    )


def q_cdc_snapshot_diff(spark, sf):
    """Change-feed EMISSION (operators/diff.py): diff the as-of-midpoint
    state against the final state → the I/U/D changelog that transforms one
    into the other — the reverse of the apply path, one full-outer join on
    the PK, output proportional to drift."""
    from relational_data_loader_spark.operators.diff import snapshot_diff

    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id", "value")
    old = _final_state(ev, upto_cut=True)
    new = _final_state(ev, upto_cut=False)
    return snapshot_diff(old, new, ["user_id"], ["value"])


SQL_SNAPSHOT_DIFF = f"""
WITH thr AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS cut FROM events),
old AS ({_state_sql(True)}),
new AS ({_state_sql(False)})
SELECT op, user_id, value FROM (
  SELECT CASE WHEN o.user_id IS NULL THEN 'I'
              WHEN n.user_id IS NULL THEN 'D'
              WHEN o.value IS DISTINCT FROM n.value THEN 'U' END AS op,
         coalesce(n.user_id, o.user_id) AS user_id,
         n.value AS value
  FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id)
WHERE op IS NOT NULL
"""


def q_cdc_incremental_rollup(spark, sf):
    """Algebraic incremental view maintenance (operators/incremental.py):
    the midpoint rollup plus the +new−old delta from the change feed must
    equal a full recompute — the oracle IS the full recompute, so the
    incremental path is verified end to end. Nothing here rescans the base
    table after the bootstrap: the delta aggregation is over the change
    feed only."""
    from relational_data_loader_spark.operators.diff import snapshot_diff
    from relational_data_loader_spark.operators.incremental import (
        apply_delta_rollup,
        finalize_rollup,
        group_rollup,
    )

    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id", "value")
    old = _final_state(ev, upto_cut=True)
    new = _final_state(ev, upto_cut=False)
    grp = F.pmod(F.col("user_id"), F.lit(50)).cast("bigint")
    prev = group_rollup(old, grp, "value")
    changes = snapshot_diff(old, new, ["user_id"], ["value"], include_old=True)
    roll = apply_delta_rollup(prev, changes, grp, "value", "value_old")
    return finalize_rollup(roll).select(
        F.col("grp").alias("bucket"), "sum_value", "n_rows"
    )


SQL_INCREMENTAL_ROLLUP = f"""
WITH new AS ({_state_sql(False)})
SELECT user_id % 50 AS bucket,
       CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_value,
       count(*) AS n_rows
FROM new GROUP BY 1
"""


def q_interval_event_rollup(spark, sf):
    """Point-in-interval range join (operators/range_join.py): 20
    overlapping non-aligned time windows over the event stream, each
    counting/summing the events it covers. The bucketed equi-join replaces
    the BroadcastNestedLoopJoin a bare BETWEEN predicate compiles to.
    Window bounds derive from the data's min/max ts (1-row control-plane
    collect), so the query is scale-free."""
    from relational_data_loader_spark.operators.range_join import (
        point_in_interval_join,
    )

    ev = _t(spark, sf, "events").select("event_id", "ts", "value")
    t0, t1 = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).first()
    span = t1 - t0 + 1
    width = max(span // 40, 1)
    # intervals built JVM-side (spark.range + literal arithmetic): a
    # createDataFrame(20 rows) plans as a Python-RDD scan that restarts
    # Python workers on EVERY evaluation of the broadcast side — measured
    # as the dominant cost of this otherwise all-JVM query
    iv = spark.range(20).selectExpr(
        "id AS interval_id",
        f"{t0}L + id * {span}L div 20 AS start_us",
        f"{t0}L + id * {span}L div 20 + {span // 8}L AS end_us",
    )
    pt = ev.withColumn(
        "p_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    joined = point_in_interval_join(
        pt, F.broadcast(iv), "p_us", "start_us", "end_us", width
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dec_sum(F.col("value"), "sum_value"),
    )


SQL_INTERVAL_ROLLUP = """
WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events),
iv AS (SELECT i AS interval_id,
              t0 + i * (t1 - t0 + 1) // 20 AS s,
              t0 + i * (t1 - t0 + 1) // 20 + (t1 - t0 + 1) // 8 AS e
       FROM b, range(20) r(i))
SELECT interval_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM iv JOIN events ev ON epoch_us(ev.ts) >= iv.s AND epoch_us(ev.ts) < iv.e
GROUP BY 1
"""


def q_ngram_contamination(spark, sf):
    """Benchmark decontamination (operators/contamination.py): 3-gram
    overlap of every corpus document against the benchmark slice
    (doc_id % 97 = 0 plays the eval set). Benchmark n-grams broadcast;
    corpus side shuffles only on its own per-doc aggregation."""
    from relational_data_loader_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_contamination(corpus, bench, "text", "doc_id", n=3)


SQL_NGRAM_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        FROM toks)),
bng AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 97 = 0),
corpus AS (SELECT * FROM ng WHERE doc_id % 97 <> 0),
sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM corpus GROUP BY 1),
hits AS (SELECT c.doc_id, count(*) AS n_contaminated
         FROM corpus c JOIN bng USING (ngram) GROUP BY 1)
SELECT s.doc_id, s.n_ngrams,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       CAST(round(coalesce(h.n_contaminated, 0) / CAST(s.n_ngrams AS DOUBLE), 4)
            AS DOUBLE) AS contaminated_frac
FROM sizes s LEFT JOIN hits h USING (doc_id)
"""


def q_repeated_ngrams(spark, sf):
    """Cross-document repeated spans (operators/contamination.py
    repeated_ngrams): every 6-gram appearing in >= 2 distinct documents,
    with its distinct-doc count and total occurrence count — the
    memorization-risk sweep a training-data pipeline runs alongside
    decontamination."""
    from relational_data_loader_spark.operators.contamination import repeated_ngrams

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return repeated_ngrams(docs, "text", "doc_id", n=6, min_docs=2)


SQL_REPEATED_NGRAMS = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
ng AS (
  SELECT doc_id, array_to_string(ts[i:i+5], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 5)) AS i
        FROM toks)),
per_doc AS (SELECT doc_id, ngram, count(*) AS cnt FROM ng GROUP BY 1, 2)
SELECT ngram, count(*) AS n_docs, CAST(sum(cnt) AS BIGINT) AS n_occurrences
FROM per_doc GROUP BY 1 HAVING count(*) >= 2
"""


def q_duplicated_spans(spark, sf):
    """Span-level exact-substring dedup (operators/contamination.py
    duplicated_spans): maximal token-offset spans whose every 6-gram
    window occurs in >= 2 distinct documents — the Lee-et-al suffix-array
    output re-derived with one posexplode, a two-level doc-frequency agg,
    a shuffled ngram join, and a per-doc lag-merge window."""
    from relational_data_loader_spark.operators.contamination import (
        duplicated_spans,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return duplicated_spans(docs, "text", "doc_id", k=6, min_docs=2)


# Shared CTE chain for the span queries: 0-based positions, df>=2 6-grams,
# lag-merge islands (windows at p<q merge while q <= p+6, end exclusive).
_SQL_SPAN_CTE = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
pos AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(ts[i:i+5], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 5)) AS i
        FROM toks)),
dup AS (
  SELECT ngram FROM (SELECT DISTINCT doc_id, ngram FROM pos)
  GROUP BY 1 HAVING count(*) >= 2),
hit AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (ngram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + 6 THEN 1 ELSE 0 END AS is_new
  FROM hit
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
islands AS (
  SELECT doc_id, pos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + 6 AS span_end
  FROM islands GROUP BY doc_id, island)
"""

SQL_DUPLICATED_SPANS = (
    _SQL_SPAN_CTE
    + """
SELECT doc_id, span_start, span_end, span_end - span_start AS span_tokens
FROM spans
"""
)


def q_span_cut_corpus(spark, sf):
    """Remove-all-but-one span cutting (operators/contamination.py
    cut_duplicated_spans): rebuild every document with cross-doc
    duplicated 6-gram windows cut, keeping the min-doc_id owner's copy —
    the cleaning step that consumes duplicated_spans. Per-doc clean text
    is hash-compared against the oracle's anti-join reconstruction."""
    from relational_data_loader_spark.operators.contamination import (
        cut_duplicated_spans,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return cut_duplicated_spans(docs, "text", "doc_id", k=6, min_docs=2)


SQL_SPAN_CUT_CORPUS = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
pos AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(ts[i:i+5], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 5)) AS i
        FROM toks)),
stats AS (
  SELECT ngram, min(doc_id) AS owner
  FROM (SELECT DISTINCT doc_id, ngram FROM pos)
  GROUP BY 1 HAVING count(*) >= 2),
cutpos AS (
  SELECT DISTINCT p.doc_id, p.pos + j AS tp
  FROM pos p JOIN stats s USING (ngram), generate_series(0, 5) g(j)
  WHERE p.doc_id <> s.owner),
tokpos AS (
  SELECT doc_id, ts[i] AS tok, CAST(i - 1 AS INT) AS tp,
         CAST(len(ts) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
        FROM toks)),
cuts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut
         FROM cutpos GROUP BY 1)
SELECT t.doc_id,
       coalesce(string_agg(CASE WHEN c.tp IS NULL THEN t.tok END, ' '
                           ORDER BY t.tp), '') AS clean_text,
       any_value(t.n_tokens) AS n_tokens,
       coalesce(any_value(cu.n_cut), 0) AS n_cut
FROM tokpos t
LEFT JOIN cutpos c USING (doc_id, tp)
LEFT JOIN cuts cu ON cu.doc_id = t.doc_id
GROUP BY t.doc_id
"""


def q_dup_span_stats(spark, sf):
    """Per-document duplicated-span coverage (operators/contamination.py
    dup_span_stats): token count, span count, duplicated-token count and
    fraction for every document (zero-filled) — the threshold signal for
    span-cut vs doc-drop policy."""
    from relational_data_loader_spark.operators.contamination import (
        dup_span_stats,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return dup_span_stats(docs, "text", "doc_id", k=6, min_docs=2)


SQL_DUP_SPAN_STATS = (
    _SQL_SPAN_CTE
    + r"""
, rollup_ AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1),
sizes AS (
  SELECT doc_id,
         CAST(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
                               ' ')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT s.doc_id, s.n_tokens,
       coalesce(r.n_spans, 0) AS n_spans,
       coalesce(r.dup_tokens, 0) AS dup_tokens,
       CAST(round(coalesce(r.dup_tokens, 0) / CAST(s.n_tokens AS DOUBLE), 4)
            AS DOUBLE) AS dup_frac
FROM sizes s LEFT JOIN rollup_ r USING (doc_id)
"""
)


def q_interval_overlap_join(spark, sf):
    """Interval×interval overlap join (operators/range_join.py
    interval_overlap_join): deterministic synthetic intervals over events
    (duration keyed on event_id so overlaps actually occur), even-user
    intervals vs odd-user intervals, emitting each overlapping pair
    exactly once with its overlap length. The bucket rewrite of a join
    that would otherwise compile to BroadcastNestedLoopJoin."""
    from relational_data_loader_spark.operators.range_join import (
        interval_overlap_join,
    )

    ev = _t(spark, sf, "events").filter(F.col("user_id") < 60)
    s = F.unix_seconds(F.col("ts").cast("timestamp"))
    li = ev.filter(F.col("user_id") % 2 == 0).select(
        F.col("event_id").alias("l_id"),
        s.alias("ls"),
        (s + (F.col("event_id") % 7 + 1) * 60).alias("le"),
    )
    ri = ev.filter(F.col("user_id") % 2 == 1).select(
        F.col("event_id").alias("r_id"),
        s.alias("rs"),
        (s + (F.col("event_id") % 5 + 1) * 90).alias("re"),
    )
    out = interval_overlap_join(li, ri, "ls", "le", "rs", "re", bucket_width=300)
    return out.select(
        "l_id",
        "r_id",
        (
            F.least(F.col("le"), F.col("re"))
            - F.greatest(F.col("ls"), F.col("rs"))
        ).alias("overlap_s"),
    )


SQL_INTERVAL_OVERLAP = """
WITH li AS (
  SELECT event_id AS l_id,
         epoch_us(ts) // 1000000 AS ls,
         epoch_us(ts) // 1000000 + (event_id % 7 + 1) * 60 AS le
  FROM events WHERE user_id % 2 = 0 AND user_id < 60),
ri AS (
  SELECT event_id AS r_id,
         epoch_us(ts) // 1000000 AS rs,
         epoch_us(ts) // 1000000 + (event_id % 5 + 1) * 90 AS re
  FROM events WHERE user_id % 2 = 1 AND user_id < 60)
SELECT l_id, r_id,
       least(le, re) - greatest(ls, rs) AS overlap_s
FROM li JOIN ri ON ls < re AND rs < le
"""


_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def q_leakage_safe_split(spark, sf):
    """Group-granular train/val/test split (operators/sampling.py
    group_split): every conversation lands wholly in one split by its own
    content hash — the leakage guard a row-level random split lacks.
    Output is the per-split audit (conversation and row counts); the
    group-granularity invariant is structural (split is a pure function
    of user_id), so distinct-conv counts summing to the corpus total IS
    the no-leak proof."""
    from relational_data_loader_spark.operators.sampling import group_split

    ev = _t(spark, sf, "events").select("user_id", "event_id")
    return (
        group_split(ev, "user_id", _SPLITS)
        .groupBy("split")
        .agg(
            F.count_distinct("user_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _leakage_split_sql() -> str:
    """DuckDB twin: the same md5 nibble-fold uniform as the sampling
    oracle, on user_id, against the cumulative split bounds."""
    h = "md5(CAST(user_id AS VARCHAR))"
    u32 = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )
    u = f"(({u32}) / {float(2**32)!r})"
    cum, cases = 0.0, []
    for name, frac in _SPLITS[:-1]:
        cum += frac
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    case = " ".join(cases)
    return f"""
SELECT CASE {case} ELSE '{_SPLITS[-1][0]}' END AS split,
       count(DISTINCT user_id) AS n_convs,
       count(*) AS n_rows
FROM events
GROUP BY 1
"""


_BM25_TERMS = ("merge", "window", "stream")


def q_bm25_topk(spark, sf):
    """Ranked retrieval (operators/index.py bm25_topk): BM25 top-10 for a
    3-term query, completing the posting-index search path (maintain →
    serve → rank). Scores round to 4dp before the deterministic
    (score desc, doc_id) cut."""
    from relational_data_loader_spark.operators.index import bm25_topk

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return bm25_topk(docs, "text", "doc_id", list(_BM25_TERMS), k=10)


SQL_BM25_TOPK = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
stats AS (SELECT count(*) AS n_docs, round(avg(len(ts)), 6) AS avgdl FROM toks),
tf AS (
  SELECT doc_id, len(ts) AS dl, t AS tok, count(*) AS tf
  FROM (SELECT doc_id, ts, unnest(ts) AS t FROM toks)
  WHERE t IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
  GROUP BY 1, 2, 3),
dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS raw
  FROM tf JOIN dfs d USING (tok) CROSS JOIN stats s
  GROUP BY 1)
SELECT doc_id, CAST(round(raw, 4) AS DOUBLE) AS score
FROM scored ORDER BY round(raw, 4) DESC, doc_id LIMIT 10
"""


def q_hybrid_search_rrf(spark, sf):
    """Hybrid retrieval (operators/index.py rrf_fuse): BM25 top-10 for
    the 3-term query fused with embedding-cosine top-10 for query vector
    0 by reciprocal-rank fusion (k0=60) — the standard sparse+dense
    serving combiner, rank-based so the two score scales never need
    calibration. The fixture's vec_id indexes the same corpus id space
    as doc_id, so the fused id column is a doc key for both lists."""
    from relational_data_loader_spark.operators.index import bm25_topk, rrf_fuse
    from relational_data_loader_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    sparse = bm25_topk(docs, "text", "doc_id", list(_BM25_TERMS), k=10)
    emb = _t(spark, sf, "embeddings")
    dense = cosine_topk(emb.filter(F.col("vec_id") == 0), emb, k=10).select(
        F.col("c_id").alias("doc_id"), "sim"
    )
    return rrf_fuse([(sparse, "score"), (dense, "sim")], id_col="doc_id")


SQL_HYBRID_RRF = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
stats AS (SELECT count(*) AS n_docs, round(avg(len(ts)), 6) AS avgdl FROM toks),
tf AS (
  SELECT doc_id, len(ts) AS dl, t AS tok, count(*) AS tf
  FROM (SELECT doc_id, ts, unnest(ts) AS t FROM toks)
  WHERE t IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
  GROUP BY 1, 2, 3),
dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / s.avgdl))) AS raw
  FROM tf JOIN dfs d USING (tok) CROSS JOIN stats s
  GROUP BY 1),
bm AS (
  SELECT doc_id, CAST(round(raw, 4) AS DOUBLE) AS score
  FROM scored ORDER BY round(raw, 4) DESC, doc_id LIMIT 10),
bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT c.vec_id AS doc_id,
         CAST(round(list_cosine_similarity(q.q_emb::DOUBLE[], c.embedding::DOUBLE[]), 3) AS DOUBLE) AS sim
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> 0),
dn AS (
  SELECT doc_id, sim
  FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, doc_id) rk FROM sims)
  WHERE rk <= 10),
dnr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r FROM dn)
SELECT COALESCE(bmr.doc_id, dnr.doc_id) AS doc_id,
       CAST(round(COALESCE(1.0 / (60 + bmr.r), 0)
                + COALESCE(1.0 / (60 + dnr.r), 0), 6) AS DOUBLE) AS rrf
FROM bmr FULL OUTER JOIN dnr ON bmr.doc_id = dnr.doc_id
"""


def q_embedding_decontam(spark, sf):
    """Semantic decontamination
    (operators/contamination.py embedding_decontamination): every corpus
    vector audited for max cosine against the benchmark slice
    (vec_id % 97 = 0 plays the eval suite, broadcast); contaminated =
    rounded max-sim >= 0.3 (the fixture's embeddings top out at ~0.47
    cross-slice, so the flag genuinely splits). Paraphrase-leakage
    companion to the surface n-gram overlap of ngram_contamination."""
    from relational_data_loader_spark.operators.contamination import (
        embedding_decontamination,
    )

    emb = _t(spark, sf, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 0)
    corpus = emb.filter(F.col("vec_id") % 97 != 0)
    return embedding_decontamination(corpus, bench, threshold=0.3)


SQL_EMBEDDING_DECONTAM = """
WITH b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
m AS (
  SELECT c.vec_id,
         max(CAST(round(list_cosine_similarity(
             c.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS DOUBLE)) AS max_sim
  FROM c CROSS JOIN b GROUP BY 1)
SELECT vec_id, max_sim, max_sim >= 0.3 AS contaminated FROM m
"""


def q_pii_redact(spark, sf):
    """PII scrub (functions/text.py redact_pii/pii_counts): every document
    is augmented with a deterministic synthetic email + phone derived from
    its own doc_id (the corpus carries none), then scrubbed; output is the
    audit row (counts + redacted-text md5) a production scrub stage emits."""
    from relational_data_loader_spark.functions.text import pii_counts, redact_pii

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    email = F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com"))
    phone = F.concat(
        (F.col("doc_id") % 900 + 100).cast("string"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = F.concat_ws(" ", F.col("text"), email, phone)
    n_emails, n_phones = pii_counts(aug)
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redact_pii(aug)).alias("redacted_md5"),
    )


_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
_PII_PHONE_SQL = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

SQL_PII_REDACT = f"""
WITH aug AS (
  SELECT doc_id,
         concat_ws(' ', text,
                   'user' || CAST(doc_id AS VARCHAR) || '@example.com',
                   CAST(doc_id % 900 + 100 AS VARCHAR) || '-555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL_SQL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(
              regexp_replace(t, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
              '{_PII_PHONE_SQL}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(t, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
             '{_PII_PHONE_SQL}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
"""


def q_token_length_histogram(spark, sf):
    """Corpus token-length histogram per language (functions/text.py
    token_count): the length-mix dashboard every corpus build watches.
    One partial-aggregated groupBy on (lang, bucket)."""
    tc = TXT.token_count(F.col("text"))
    return (
        _t(spark, sf, "documents")
        .groupBy(
            F.col("lang"), F.floor(tc / 32).cast("bigint").alias("tok_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(tc) / F.count(F.lit(1)), 4).alias("avg_tokens"),
        )
    )


SQL_TOKEN_HISTOGRAM = r"""
SELECT lang,
       CAST(floor(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
                                   ' ')) / 32) AS BIGINT) AS tok_bucket,
       count(*) AS n_docs,
       round(CAST(sum(len(string_split(regexp_replace(lower(text), '\s+', ' ',
                                                      'g'), ' '))) AS DOUBLE)
             / count(*), 4) AS avg_tokens
FROM documents
GROUP BY 1, 2
"""


_FUNNEL_STAGES = ["signup", "click", "purchase"]


def q_event_funnel(spark, sf):
    """Ordered-sequence funnel (operators/funnel.py): users completing
    signup → click → purchase in timestamp order, counted per stage. ONE
    shuffle (per-user sorted-array codegen fold) versus the naive
    stage-chained self-joins the oracle states."""
    from relational_data_loader_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf, "events").select("user_id", "ts", "event_type")
    return funnel_counts(ev, "user_id", "ts", "event_type", _FUNNEL_STAGES)


SQL_EVENT_FUNNEL = """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT 'signup' AS stage, CAST(0 AS BIGINT) AS stage_idx,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT 'click', 1, (SELECT count(*) FROM s2)
UNION ALL
SELECT 'purchase', 2, (SELECT count(*) FROM s3)
"""


def q_dedup_clusters(spark, sf):
    """Near-dup pairs → connected components → keep/drop verdict per doc
    (operators/dedup.py dedup_clusters). The stage that turns pairwise
    similarity into an actionable dedup decision; oracle is a recursive
    transitive-closure CTE over the SAME pair query."""
    from relational_data_loader_spark.operators.dedup import (
        near_dup_pairs_with_handle,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    pairs, release = near_dup_pairs_with_handle(
        docs, "text", "doc_id", threshold=0.5
    )
    # dedup_clusters is EAGER (it iterates to fixpoint and checkpoints the
    # labels), so the posting-list cache is releasable the moment it
    # returns — repeated invocations (bench trials, long sessions) must
    # not accumulate caches: measured 19 s -> 257 s across two uncached
    # back-to-back runs before these releases.
    out = dedup_clusters(docs, pairs, "doc_id")
    release()
    return out


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_NEAR_DUP}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s WHERE e.d <> r.n),
labels AS (
  SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM reach GROUP BY n)
SELECT d.doc_id,
       coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       coalesce(l.cluster_id, d.doc_id) = d.doc_id AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
LEFT JOIN labels l ON l.doc_id = d.doc_id
"""

# 0.4, not lower: the propagation-round count of the downstream
# connected components is the pair graph's DIAMETER, and dropping the
# threshold to 0.35 on this corpus quadrupled it (16 rounds vs 4,
# 12.4 s vs 6.9 s at sf0.1, measured) by admitting long weak-similarity
# chains — semantic dedup wants tight families, not chains
_SEMDEDUP_TH = 0.4


def q_semantic_dedup(spark, sf):
    """SemDeDup (operators/similarity.py semantic_dedup_pairs +
    operators/dedup.py dedup_clusters): embeddings quantized to the IVF
    coarse cells, exact within-cell cosine at the threshold, components
    collapsed to a keep/drop verdict per vector. The semantic twin of
    dedup_clusters (which dedups on TEXT shingles) — same centroids and
    tie rules as ivf_cosine_topk, so the oracle reuses that entry's
    assignment CTEs verbatim."""
    from relational_data_loader_spark.operators.dedup import dedup_clusters
    from relational_data_loader_spark.operators.similarity import (
        sample_centroids,
        semantic_dedup_pairs,
    )

    emb = _t(spark, sf, "embeddings")
    centroids = sample_centroids(emb, _IVF_CENTROIDS)
    pairs = semantic_dedup_pairs(emb, centroids, threshold=_SEMDEDUP_TH)
    # dedup_clusters is EAGER (fixpoint loop over checkpointed labels), so
    # the pair pipeline's assignment cache is releasable the moment it
    # returns — same discipline as q_dedup_clusters (r6)
    out = dedup_clusters(
        emb.select("vec_id"), pairs, "vec_id", a_col="id_a", b_col="id_b"
    )
    pairs.unpersist_postings()
    return out


def _semdedup_sql(dim: int = 64) -> str:
    """DuckDB twin: same cen/assign CTEs as the IVF oracle (explicit
    left-to-right term chains ⇒ bit-identical doubles; assignment ties
    break LOW cell), within-cell pairs at the rounded threshold, then the
    recursive transitive-closure labeling of SQL_DEDUP_CLUSTERS."""

    def dot(a, b):
        return " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1))

    def norm(a):
        return (
            "sqrt("
            + " + ".join(f"{a}[{i}]*{a}[{i}]" for i in range(1, dim + 1))
            + ")"
        )

    return f"""
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS cemb
        FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {_IVF_CENTROIDS})),
sims AS (
  SELECT e.vec_id, cen.cell,
         round(({dot('e.emb', 'cen.cemb')}) /
               ({norm('e.emb')} * {norm('cen.cemb')}), 6) AS csim
  FROM e CROSS JOIN cen),
assign AS (
  SELECT vec_id, cell
  FROM (SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell ASC) rn
        FROM sims)
  WHERE rn = 1),
scored AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         round(({dot('xe.emb', 'ye.emb')}) /
               ({norm('xe.emb')} * {norm('ye.emb')}), 3) AS sim
  FROM assign x
  JOIN assign y ON x.cell = y.cell AND x.vec_id < y.vec_id
  JOIN e xe ON xe.vec_id = x.vec_id
  JOIN e ye ON ye.vec_id = y.vec_id),
edges AS (
  SELECT a AS s, b AS d FROM scored WHERE sim >= {_SEMDEDUP_TH}
  UNION
  SELECT b, a FROM scored WHERE sim >= {_SEMDEDUP_TH}),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e2.d FROM reach r JOIN edges e2 ON r.m = e2.s WHERE e2.d <> r.n),
labels AS (
  SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM reach GROUP BY n)
SELECT d.vec_id AS doc_id,
       coalesce(l.cluster_id, d.vec_id) AS cluster_id,
       coalesce(l.cluster_id, d.vec_id) = d.vec_id AS keep
FROM (SELECT vec_id FROM e) d
LEFT JOIN labels l ON l.doc_id = d.vec_id
"""


SQL_SEMANTIC_DEDUP = _semdedup_sql()


def q_cohort_retention(spark, sf):
    """Weekly cohort retention over the events stream
    (operators/events.py cohort_retention)."""
    return cohort_retention(_t(spark, sf, "events"))


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id AS u,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS w FROM events),
c AS (SELECT u, w, min(w) OVER (PARTITION BY u) AS cohort_week FROM uw)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, w) / 7 AS INT) AS week_offset,
       count(*) AS n_users
FROM c GROUP BY 1, 2
"""


def q_rolling_event_stats(spark, sf):
    """Per-user trailing-3-event rolling sum/avg + running count
    (operators/events.py rolling_event_stats)."""
    return rolling_event_stats(_t(spark, sf, "events"), n=3)


SQL_ROLLING_EVENT_STATS = """
SELECT user_id, event_id,
       CAST(round(sum(value) OVER w3, 4) AS DOUBLE) AS roll_sum,
       CAST(round(avg(value) OVER w3, 4) AS DOUBLE) AS roll_avg,
       CAST(row_number() OVER wo AS INT) AS cum_events
FROM events
WINDOW
  w3 AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wo AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_group_quantiles(spark, sf):
    """Exact interpolated p50/p90/p99 of event value per event type
    (operators/events.py group_quantiles)."""
    return group_quantiles(_t(spark, sf, "events"))


SQL_GROUP_QUANTILES = """
SELECT event_type,
       CAST(round(quantile_cont(value, 0.5), 4) AS DOUBLE) AS p50,
       CAST(round(quantile_cont(value, 0.9), 4) AS DOUBLE) AS p90,
       CAST(round(quantile_cont(value, 0.99), 4) AS DOUBLE) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_corpus_build(spark, sf):
    """Flagship composed pipeline (operators/corpus.py build_corpus):
    exact dedup -> quality gate -> benchmark decontamination -> stratified
    sample, constants pinned here; the oracle re-derives the whole chain
    in SQL. Benchmark = the doc_id % 97 slice, same as
    ngram_contamination."""
    from relational_data_loader_spark.operators.corpus import build_corpus

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return build_corpus(
        corpus,
        bench,
        min_tokens=5,
        min_alpha=0.3,
        max_contamination=0.5,
        rates={"en": 0.5},
        default_rate=1.0,
    )


def _corpus_build_sql() -> str:
    h = "md5(CAST(doc_id AS VARCHAR))"
    u32 = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8)
    )
    return rf"""
WITH base AS (
  SELECT doc_id, lang, text FROM documents
  WHERE length(text) > 0 AND doc_id % 97 <> 0),
keep AS (
  SELECT *, min(doc_id) OVER (
      PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS k
  FROM base),
quality AS (
  SELECT doc_id, lang, text,
         len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS n_tokens,
         CAST(round(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) * 1.0
                    / length(text), 4) AS DOUBLE) AS alpha_ratio
  FROM keep WHERE doc_id = k),
q2 AS (SELECT * FROM quality WHERE n_tokens >= 5 AND alpha_ratio >= 0.3),
toksq AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM q2),
ngq AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        FROM toksq)),
toksb AS (
  SELECT string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents WHERE doc_id % 97 = 0),
bng AS (
  SELECT DISTINCT array_to_string(ts[i:i+2], ' ') AS ngram
  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 2)) AS i FROM toksb)),
sizes AS (SELECT doc_id, count(*) AS n FROM ngq GROUP BY 1),
hits AS (SELECT n.doc_id, count(*) AS h FROM ngq n JOIN bng USING (ngram) GROUP BY 1),
cont AS (
  SELECT s.doc_id,
         CAST(round(coalesce(h.h, 0) / CAST(s.n AS DOUBLE), 4) AS DOUBLE)
           AS contaminated_frac
  FROM sizes s LEFT JOIN hits h USING (doc_id))
SELECT q.doc_id, q.lang, q.n_tokens, q.alpha_ratio,
       coalesce(c.contaminated_frac, CAST(0.0 AS DOUBLE)) AS contaminated_frac
FROM q2 q LEFT JOIN cont c USING (doc_id)
WHERE coalesce(c.contaminated_frac, 0.0) <= 0.5
  AND ({u32}) / {float(2**32)!r}
      < (CASE WHEN lang = 'en' THEN 0.5 ELSE 1.0 END)
"""


def q_cdc_quarantine_split(spark, sf):
    """Dead-letter split (operators/project.py project_cast_quarantine):
    a dirty feed where every 7th row carries an uncastable value; the
    query returns the QUARANTINED rows (raw payload + failing columns).
    try_cast semantics pair exactly with DuckDB's TRY_CAST."""
    from relational_data_loader_spark.operators.project import (
        project_cast_quarantine,
    )
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec

    dirty = _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.col("event_type"))
        .otherwise(F.regexp_extract("props", r"[0-9]+", 0))
        .alias("mixed"),
    )
    spec = IngestSpec(
        name="dirty_feed",
        source="",
        columns=[
            ColumnSpec("event_id", "event_id", "bigint", primary_key=True),
            ColumnSpec("mixed", "k_int", "int"),
        ],
    )
    _good, bad = project_cast_quarantine(dirty, spec, include_envelope=False)
    return bad.select(
        "event_id", "mixed", F.array_join("_rdl_errors", ",").alias("err")
    )


SQL_QUARANTINE_SPLIT = """
WITH dirty AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN event_type
              ELSE regexp_extract(props, '[0-9]+', 0) END AS mixed
  FROM events)
SELECT event_id, mixed, 'k_int' AS err
FROM dirty
WHERE mixed IS NOT NULL AND TRY_CAST(mixed AS INT) IS NULL
"""


def q_posting_index_ivm(spark, sf):
    """Incremental inverted-index maintenance (operators/index.py): build
    the posting index at v1, apply a synthetic I/U/D feed (deletes every
    11th doc, reverses the text of every remaining 7th, inserts a clone of
    every 13th under a new id). The IVM contract is what the oracle
    checks: the incrementally-maintained index equals a full rebuild over
    the v2 state — the oracle derives v2 directly, never the delta
    algebra."""
    from relational_data_loader_spark.operators.index import (
        apply_delta_postings,
        posting_index,
    )

    v1 = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    prev = posting_index(v1, "text", "doc_id")
    d = v1.filter(F.col("doc_id") % 11 == 0).select(
        F.lit("D").alias("op"),
        "doc_id",
        F.lit(None).cast("string").alias("text"),
    )
    u = v1.filter(
        (F.col("doc_id") % 11 != 0) & (F.col("doc_id") % 7 == 0)
    ).select(F.lit("U").alias("op"), "doc_id", F.reverse("text").alias("text"))
    i = v1.filter(F.col("doc_id") % 13 == 0).select(
        F.lit("I").alias("op"),
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" zzzz9")).alias("text"),
    )
    feed = d.union(u).union(i)
    return apply_delta_postings(prev, feed, "text", "doc_id")


SQL_POSTING_INDEX_IVM = r"""
WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN reverse(text) ELSE text END AS text
  FROM v1 WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzzz9' FROM v1 WHERE doc_id % 13 = 0)
SELECT DISTINCT tok, doc_id FROM (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM v2)
WHERE tok <> ''
"""


_LOOKUP_TOKENS = ["data", "table", "qq_absent_token"]


def q_posting_lookup(spark, sf):
    """Serving-side point lookup (operators/index.py write_serving_postings
    + lookup_postings): materialize the token-bucketed serving copy of the
    posting index, then read back three probe tokens (one absent) touching
    only their hash buckets. The oracle re-derives the same postings in
    SQL — so the driver checks the whole write-projection + pruned-read
    path, not just the tokenization."""
    import shutil

    from relational_data_loader_spark.operators.index import (
        lookup_postings,
        posting_index,
        write_serving_postings,
    )

    docs = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    base = _state_workdir(sf, "postings")
    shutil.rmtree(base, ignore_errors=True)
    write_serving_postings(posting_index(docs, "text", "doc_id"), base, n_buckets=16)
    return lookup_postings(spark, base, _LOOKUP_TOKENS)


SQL_POSTING_LOOKUP = r"""
SELECT DISTINCT tok, doc_id FROM (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 2000)
WHERE tok IN ('data', 'table', 'qq_absent_token')
"""


_PACK_BUDGET = 1024
_PACK_SHARDS = 8


def q_sequence_packing(spark, sf):
    """Training-sequence packing assignment (operators/packing.py): lay
    documents end-to-end per shard in doc_id order, chunk the token stream
    at a 1024-token budget, roll up per-sequence fill stats. Single
    shuffle: the per-shard running sum's exchange also serves the
    (shard, seq) rollup (plan-gated)."""
    from relational_data_loader_spark.operators.packing import (
        pack_sequences,
        packed_sequence_stats,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    asg = pack_sequences(docs, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)
    return packed_sequence_stats(asg, budget=_PACK_BUDGET)


SQL_SEQUENCE_PACKING = rf"""
WITH t AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
                               ' ')) AS BIGINT) AS toks
  FROM documents),
c AS (
  SELECT shard, doc_id, toks,
         sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT shard, CAST((cum - toks) // {_PACK_BUDGET} AS BIGINT) AS seq_idx,
       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       round(CAST(sum(toks) AS DOUBLE) / {_PACK_BUDGET}, 4) AS fill_ratio
FROM c GROUP BY 1, 2
"""


def q_session_window_rollup(spark, sf):
    """Gap-based session windows via Spark's native session_window
    (streaming/sessions.py) run in batch mode: per (user, session) start,
    exclusive end (= last event + 30 min), event count, value sum. The
    streaming twin with watermark finalization is pinned by
    tests/test_session_window.py; the oracle reproduces the merge rule as
    gaps-and-islands with a STRICT > boundary — Spark's session merge is
    inclusive (an event at exactly prev_ts + gap EXTENDS the session;
    pinned empirically in tests/test_session_window.py)."""
    from relational_data_loader_spark.streaming.sessions import (
        session_window_stats,
    )

    ev = _t(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value",
        "event_id",
    )
    return session_window_stats(ev, gap="30 minutes")


SQL_SESSION_WINDOW = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events),
i AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM i GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Engine end-to-end final-state entries (VERDICT r4 task #4): the benched
# cdc_full_refresh / cdc_incremental_merge paths have been pytest-pinned but
# never driver-oracled. These twins run the ACTUAL engine (DataLoadManager →
# SnapshotTable merge/tombstone machinery) over a change log derived
# deterministically from the `events` table, then return the visible final
# table — so the DuckDB oracle (pure SQL LWW + delete-drop over the same
# derivation) checks the whole write path, not just the netting expression.


def _derived_changelog(spark, sf, with_model: bool = False):
    """events → transcripts change-log envelopes, deterministically.

    PK = (conv_id=user_id, turn_idx=event_id%37) so each key sees several
    I/U/D events; 'error' events are deletes; payload columns are NULLed on
    D, mirroring a CT/CDC delete envelope (SURVEY §2 S2).

    ``with_model=True`` appends the v2 source column (``model``) that the
    schema-evolution replay introduces mid-stream.
    """
    ev = _t(spark, sf, "events")
    is_del = F.col("event_type") == DELETE_OP
    cols = [
        F.col("event_id").alias("lsn"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("event_id") % 37).cast("int").alias("turn_idx"),
        F.when(is_del, F.lit(None)).otherwise(F.col("event_type")).alias("role"),
        F.when(is_del, F.lit(None))
        .otherwise(F.concat_ws(":", F.col("event_type"), F.col("props")))
        .alias("text"),
        F.when(is_del, F.lit(None)).otherwise(F.substring("props", 1, 8)).alias("tool"),
        F.when(is_del, F.lit(None)).otherwise(F.col("ts")).alias("ts"),
    ]
    if with_model:
        cols.append(
            F.when(is_del, F.lit(None))
            .otherwise(F.concat(F.lit("m-"), F.substring("props", 1, 4)))
            .alias("model")
        )
    return ev.select(*cols)


def _state_workdir(sf: str, tag: str) -> str:
    import re
    import tempfile

    safe = re.sub(r"\W+", "_", sf.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), f"rdl_qstate_{tag}_{safe}")


def _run_engine_replay(
    spark,
    sf,
    tag: str,
    split: bool,
    maintain: bool = False,
    merge_mode: str = "cow",
    mor_compact_files: int = 0,
    chunks: int = 0,
    compact: bool = False,
    read_optimized: bool = False,
):
    """Write the derived log, replay it through DataLoadManager, return the
    visible table. ``split=True`` loads the head as a full refresh then the
    tail incrementally (watermark skips the head) — the engine invariant is
    that both routes land on the SAME final state, so both entries share one
    oracle shape. ``maintain=True`` additionally runs BOTH table services
    (tombstone expiry past the log's max lsn, then sort-compaction) before
    reading — maintenance must change layout, never content.

    ``merge_mode``/``mor_compact_files`` flow into the spec (merge-on-read
    replays); ``chunks`` sizes batch_size so the incremental tail splits
    into ~that many lsn-bounded epochs at ANY sf; ``compact=True`` runs
    ``compact_deltas()`` before the read (content-neutral by contract)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, tag)
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    kw = dict(
        source=f"parquet://{log_dir}",
        target_buckets=8,
        merge_mode=merge_mode,
        mor_compact_files=mor_compact_files,
    )
    hi = log.agg(F.max("lsn")).first()[0] if (split or chunks) else None
    if chunks:
        # the incremental tail spans ~half the lsn range
        kw["batch_size"] = max(int(hi) // (2 * chunks), 1)
    spec = transcripts_spec(**kw)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    if split:
        cut = int(hi) // 2
        log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
        mgr.run(spec)
        # tail APPEND, not a full rewrite: head files + tail files is the
        # same directory content as rewriting the whole log, for half the
        # write (r6; applied to every head-then-tail state entry)
        log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
        mgr.run(spec)
    else:
        log.write.mode("overwrite").parquet(log_dir)
        mgr.run(spec)
    if maintain:
        tbl = mgr.table(spec)
        hi = log.agg(F.max("lsn")).first()[0]
        tbl.expire_tombstones(below_lsn=hi)
        tbl.optimize()
    if compact:
        mgr.table(spec).compact_deltas()
    return mgr.table(spec).read(read_optimized=read_optimized)


def q_cdc_log_compaction_state(spark, sf):
    """CHANGE-LOG compaction replay (sources/compaction.py — the Kafka
    log-compaction analog): the derived log lands as lsn-range segments,
    the prefix below mid-lsn is compacted to its netted winners (DELETE
    tombstones kept, original lsns preserved, whole segments only,
    write-first crash ordering), and a FRESH engine bootstrap from the
    compacted log must land on the SAME LWW final state the oracle
    derives from the FULL original log — the replay-equivalence contract
    that makes compaction safe to run on a live tail."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.sources.compaction import (
        compact_change_log,
    )
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "logcompact")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    hi = int(log.agg(F.max("lsn")).first()[0])
    # lsn-RANGE segments (not hash parts): compaction consumes whole
    # segments by footer max-lsn, so segments must partition the lsn axis
    log.repartitionByRange(8, "lsn").write.mode("overwrite").parquet(log_dir)
    stats = compact_change_log(
        spark, log_dir, hi // 2, ["conv_id", "turn_idx"]
    )
    if stats["skipped"] or stats["rows_out"] >= stats["rows_in"]:
        raise AssertionError(f"compaction did not shrink the prefix: {stats}")
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    return mgr.table(spec).read()


def q_cdc_full_refresh_state(spark, sf):
    """Engine full-refresh replay → visible final table (W1-W4 end to end:
    stage write, atomic swap, tombstone filter, manifest read)."""
    return _run_engine_replay(spark, sf, "full", split=False)


def q_cdc_incremental_merge_state(spark, sf):
    """Engine head-refresh + tail-incremental replay → visible final table
    (C1/C2 decision + watermark + MERGE/delete apply end to end). Must equal
    the full-refresh oracle state exactly — replay-route invariance."""
    return _run_engine_replay(spark, sf, "incr", split=True)


def q_cdc_mor_merge_state(spark, sf):
    """MERGE-ON-READ engine replay: head full refresh, then the tail applied
    as ~3 lsn-chunked epochs of O(batch) delta appends (no base read — the
    write cost argument in sinks/snapshot.py's module docstring), and the
    final read assembles state by folding base ∪ pending deltas with the
    same LWW window the CoW merge uses. Must hash-equal the CoW replay's
    oracle exactly — the merge STRATEGY must be invisible to readers, out
    of order, tombstones and all."""
    return _run_engine_replay(
        spark, sf, "mor", split=True, merge_mode="mor", chunks=3
    )


def q_cdc_mor_compaction_state(spark, sf):
    """MoR replay under the FULL production cadence: ~4 delta epochs with an
    auto-compaction threshold (mor_compact_files=2) firing mid-backlog, then
    a manual ``compact_deltas()`` folding the remaining debt before the
    read. Compaction is content-neutral by contract — the folded table must
    still hash-equal the same LWW oracle, tombstone guards and audit
    semantics intact, while the read path now takes the zero-fold fast
    path (no delta-bearing buckets left)."""
    return _run_engine_replay(
        spark,
        sf,
        "mor_c",
        split=True,
        merge_mode="mor",
        mor_compact_files=2,
        chunks=4,
        compact=True,
    )


def q_cdc_streaming_state(spark, sf):
    """Engine STREAMING replay → visible final table: the same derived
    change log tailed as a Structured Streaming file source and applied
    through the foreachBatch MERGE path (streaming/runner.py) with the
    opt-in cross-batch stateful dedup enabled, drained to caught-up. Must
    hash-equal the BATCH replay's LWW oracle — the batch/stream
    equivalence the north rule demands, previously pinned only in pytest,
    now on the driver's hard signal."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec
    from relational_data_loader_spark.streaming.runner import StreamingIngest

    base = _state_workdir(sf, "stream")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    _derived_changelog(spark, sf).write.mode("overwrite").parquet(log_dir)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    ing = StreamingIngest(
        mgr, spec, os.path.join(base, "ckpt"), stateful_dedup=True
    )
    # state-store sizing (r6): the stateful dedup commits one delta file +
    # fsync PER shuffle partition PER micro-batch, and at this fixture's
    # volume the fsyncs ARE the query — recentProgress read
    # stateCommitMs ≈ 8-9.5 s summed over 32 stores vs ~100 k input rows.
    # 8 partitions cuts the commit count 4× (same knob, same rationale and
    # restore discipline as q_stream_interval_join; production volume
    # turns it UP, not down). Partitioning cannot change the LWW result.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ing.run_until_caught_up()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return mgr.table(spec).read()


def q_cdc_streaming_debezium_state(spark, sf):
    """Engine streaming replay over the WIRE format: the derived log
    serialized to Debezium JSON-lines envelopes (to_json with a µs
    timestamp format — the image must round-trip the fixture's
    microsecond timestamps), tailed via the debezium:// streaming source
    (text stream → the same from_json parser the batch path uses) and
    applied through foreachBatch MERGE. Must hash-equal the batch LWW
    oracle — binlog/WAL-wire-to-final-state, end to end, on the driver's
    hard signal."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec
    from relational_data_loader_spark.streaming.runner import StreamingIngest

    base = _state_workdir(sf, "dbz_stream")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    is_del = F.col("op") == "D"
    image = F.struct("conv_id", "turn_idx", "role", "text", "tool", "ts")
    doc = F.to_json(
        F.struct(
            F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
            # delete envelopes carry keys in `before` only; to_json omits
            # null structs, which the parser reads as an absent image
            F.when(is_del, F.struct("conv_id", "turn_idx")).alias("before"),
            F.when(~is_del, image).alias("after"),
            F.struct(F.col("lsn").alias("lsn")).alias("source"),
        ),
        {
            # the parquet-derived log's ts is TIMESTAMP_NTZ, which to_json
            # formats via its OWN option — without it the NTZ default
            # truncates to millis and the round-trip loses 3 digits
            "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
            "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        },
    )
    log.orderBy("lsn").select(doc.alias("value")).coalesce(4).write.mode(
        "overwrite"
    ).text(log_dir)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    spec = transcripts_spec(source=f"debezium://{log_dir}", target_buckets=8)
    StreamingIngest(mgr, spec, os.path.join(base, "ckpt")).run_until_caught_up()
    return mgr.table(spec).read()


def q_cdc_compaction_state(spark, sf):
    """Maintenance invariance, driver-checked: full replay, then the two
    table services — tombstone expiry past the log's max lsn and the
    PK-sorted compaction rewrite (SnapshotTable.optimize) — and the
    visible table must still hash-equal the plain replay's LWW oracle.
    Maintenance changes LAYOUT (files, row order, prunable stats), never
    CONTENT; this entry pins that on the driver's hard signal."""
    return _run_engine_replay(spark, sf, "compact", split=False, maintain=True)


def q_cdc_zone_pruned_read(spark, sf):
    """Zone-map file skipping, driver-checked end to end
    (sinks/snapshot.py read_range): full replay, range-split sort
    compaction on ``turn_idx`` (files_per_bucket=4, so each bucket's files
    hold disjoint sort-key windows), then a manifest-pruned range read of
    ``turn_idx IN [5, 12]``. The entry HARD-FAILS if the zone maps pruned
    nothing — a silent no-skip regression breaks correctness reporting,
    not just a benchmark — and the returned rows must hash-equal the LWW
    oracle filtered to the same range (pruning may never drop a matching
    row, however loose or tight the per-file stats are)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "zone")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    _derived_changelog(spark, sf).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)
    tbl.optimize(sort_cols=["turn_idx"], files_per_bucket=4)
    rep = tbl.prune_report("turn_idx", lo=5, hi=12)
    if not rep["files_skipped"]:
        raise AssertionError(f"zone maps pruned no files: {rep}")
    return tbl.read_range("turn_idx", lo=5, hi=12)


def q_cdc_wap_publish_state(spark, sf):
    """Write-audit-publish round trip on the driver's hard signal
    (sinks/snapshot.py branch/publish_branch): head of the log loads to
    MAIN, the tail stages onto a WAP branch (main must stay pinned at the
    head state — asserted, not assumed), the staged state is audited
    (fsck on the branch view) and then fast-forward published. The
    returned MAIN table must hash-equal the plain full-replay LWW oracle:
    the staging detour may change WHEN changes become visible, never
    WHAT. Exactly-once carry-over is asserted too — replaying the tail
    straight at main after publish must skip."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "wap")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    main = mgr.table(spec)
    head_version = main.current_manifest()["version"]

    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    mgr.run(spec, branch="audit")
    if main.current_manifest()["version"] != head_version:
        raise AssertionError("staged WAP load moved the main pointer")
    if not main.branch("audit").fsck()["ok"]:
        raise AssertionError("staged WAP state failed fsck audit")
    main.publish_branch("audit")
    if not mgr.run(spec).skipped:
        raise AssertionError("published epochs replayed instead of skipping")
    return main.read()


def q_cdc_chunked_backlog_state(spark, sf):
    """C2's batch loop on the driver's hard signal: the tail backlog is
    applied in lsn-range chunks (spec.batch_size sized so the tail splits
    into >= 3 chunks, each netted and manifest-committed separately), and
    the final state must still equal the whole-log LWW oracle — chunk
    boundaries are invisible in the result, only in the commit count.
    Hard-fails if the backlog did NOT actually chunk (a silently
    one-chunk run would make this entry vacuous)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "chunked")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    hi = log.agg(F.max("lsn")).first()[0]
    cut = hi // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    chunked = transcripts_spec(
        source=f"parquet://{log_dir}",
        target_buckets=8,
        batch_size=max((hi - cut) // 4, 1),
    )
    r = mgr.run(chunked)
    if r.n_chunks < 3:
        raise AssertionError(f"backlog did not chunk: n_chunks={r.n_chunks}")
    return mgr.table(spec).read()


def q_cdc_salted_merge_state(spark, sf):
    """The spec-pinned salted pre-net (operators/lww.py, SURVEY skew
    handling) end to end on the driver signal: the tail merge runs with
    salt_buckets=8 — every PK's events spread over 8 salt reducers and
    net locally before the final per-PK window — and the final state
    must be indistinguishable from the unsalted route's oracle. Pins
    that salting changes the SHUFFLE SHAPE only, never the result."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "salted")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(
        source=f"parquet://{log_dir}", target_buckets=8, salt_buckets=8
    )
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    r = mgr.run(spec)
    if r.salt_buckets != 8:
        raise AssertionError("salted path not taken")
    return mgr.table(spec).read()


def q_cdc_dq_audit_counts(spark, sf):
    """The data-quality admission gate in AUDIT mode on the driver
    signal: a short-text expectation counts its violations over the
    epoch's projected upsert rows (deletes exempt by envelope contract)
    while the load still commits; the count the engine reports must
    equal the oracle's own count over the same derivation. One row:
    (check, n_violations)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "dqaudit")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    _derived_changelog(spark, sf).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(
        source=f"parquet://{log_dir}",
        target_buckets=8,
        expectations={"short_text": "length(text) < 30"},
        expectations_mode="audit",
    )
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    r = mgr.run(spec)
    rows = [("short_text", int((r.dq_violations or {}).get("short_text", 0)))]
    return spark.createDataFrame(rows, "check string, n_violations bigint")


def q_cdc_rollback_state(spark, sf):
    """Version rollback on the driver signal: head load commits v1, tail
    merge commits v2, rollback(1) commits an append-only restore — and
    the visible table must equal the LWW oracle over the HEAD HALF of
    the log alone. Watermark reverts with it (asserted: a fresh run
    re-applies the tail as incremental, not skipped), which is the
    exactly-once re-ingest contract the CLI --rollback-to documents."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "rollb")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    mgr.run(spec)
    tbl = mgr.table(spec)
    tbl.rollback(1)
    if tbl.watermark() != cut:
        raise AssertionError("rollback did not revert the watermark")
    return tbl.read()


SQL_DQ_AUDIT_COUNTS = f"""
SELECT 'short_text' AS check,
       count(*) FILTER (length(event_type || ':' || props) < 30) AS n_violations
FROM events WHERE event_type <> '{DELETE_OP}'
"""


def q_cdc_shadow_rebuild_diff(spark, sf):
    """Shadow-rebuild audit — the WAP branch's ops use case beyond
    staged ingest: main is built INCREMENTALLY (head refresh + tail
    merge), then a FULL rebuild of the same log is staged on a branch
    (never visible) and diffed against main PK-by-PK
    (operators/diff.py snapshot_diff). Replay-route invariance says the
    drift must be empty; this entry makes that a runnable production
    audit instead of a test assertion, and returns the one-row summary
    (n_drift must hash to 0 against the oracle, row counts equal). The
    shadow branch is dropped afterwards, so repeated audits don't
    accumulate staging."""
    from relational_data_loader_spark.operators.diff import snapshot_diff
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    import shutil

    base = _state_workdir(sf, "shadow")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    mgr.run(spec)  # main: incremental route

    main = mgr.table(spec)
    mgr.run(spec, force_full=True, branch="shadow")  # shadow: full rebuild
    drift = snapshot_diff(
        main.read(),
        main.branch("shadow").read(),
        primary_keys=["conv_id", "turn_idx"],
    )
    n_main = main.read().count()
    n_shadow = main.branch("shadow").read().count()
    out = drift.agg(
        F.count(F.lit(1)).alias("n_drift"),
        F.lit(n_main).cast("bigint").alias("n_main"),
        F.lit(n_shadow).cast("bigint").alias("n_shadow"),
    )
    result = out.collect()  # materialize before dropping the branch
    main.drop_branch("shadow")
    return spark.createDataFrame(result, out.schema)


def q_cdc_schema_evolution_state(spark, sf):
    """Engine replay across a MID-STREAM schema change (reference C1/W5:
    the model-JSON edit between loads — SURVEY §2.1 W5/C1): the head of the
    log loads under the v1 spec (full refresh), then the spec gains an
    additive ``model`` column AND a ``tool``→``tool_name`` rename, and the
    tail applies INCREMENTALLY against the evolved table. The visible final
    state must show the renamed column for every row (metadata rename, no
    rewrite), ``model`` values only where the winning writer arrived after
    the evolution point, and NULL ``model`` on head-era winners — which is
    exactly what the oracle states in one SQL pass. Exercises
    plans/decision.py classify (additive + rename, no full refresh),
    sinks' in-place evolve, and the watermark-driven tail merge in one
    driver-checked entry."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec, transcripts_spec

    base = _state_workdir(sf, "evolve")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf, with_model=True)
    cut = log.agg(F.max("lsn")).first()[0] // 2

    # head arrives under the v1 source schema (no `model` column on disk)
    log.filter(F.col("lsn") <= cut).drop("model").write.mode(
        "overwrite"
    ).parquet(log_dir)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    spec1 = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr.run(spec1)

    # v2 spec: rename tool→tool_name + additive model; tail incrementally
    # (the rewritten log carries `model` everywhere, but the watermark skips
    # head lsns, so head-era winners keep their v1-loaded NULL model)
    log.write.mode("overwrite").parquet(log_dir)
    cols = [
        c if c.source != "tool" else ColumnSpec("tool", "tool_name", "string")
        for c in spec1.columns
    ] + [ColumnSpec("model", "model", "string")]
    spec2 = IngestSpec(
        name="transcripts", source=f"parquet://{log_dir}", columns=cols,
        target_buckets=8,
    )
    res = mgr.run(spec2)
    assert res.decision.kind == "incremental", res.decision.reasons
    return mgr.table(spec2).read()


SQL_SCHEMA_EVOLUTION_STATE = f"""
SELECT conv_id, turn_idx, role, text, tool_name, model, ts
FROM (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         event_type AS role,
         event_type || ':' || props AS text,
         substr(props, 1, 8) AS tool_name,
         CASE WHEN event_id > (SELECT max(event_id) // 2 FROM events)
              THEN 'm-' || substr(props, 1, 4) END AS model,
         ts,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY user_id, event_id % 37
                            ORDER BY event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND NOT is_del
"""


SQL_ENGINE_FINAL_STATE = f"""
SELECT conv_id, turn_idx, role, text, tool, ts
FROM (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         event_type AS role,
         event_type || ':' || props AS text,
         substr(props, 1, 8) AS tool,
         ts,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY user_id, event_id % 37
                            ORDER BY event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND NOT is_del
"""

# zone-pruned range read: identical LWW state, restricted to the turn_idx
# window q_cdc_zone_pruned_read scans through the manifest zone maps
SQL_ZONE_PRUNED_READ = f"""
SELECT * FROM ({SQL_ENGINE_FINAL_STATE}) s
WHERE turn_idx BETWEEN 5 AND 12
"""

# rollback restores the head-half state: the same LWW derivation with the
# source truncated at the head/tail cut (max lsn // 2) the entry loads to v1
SQL_ROLLBACK_STATE = f"""
SELECT conv_id, turn_idx, role, text, tool, ts
FROM (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         event_type AS role,
         event_type || ':' || props AS text,
         substr(props, 1, 8) AS tool,
         ts,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY user_id, event_id % 37
                            ORDER BY event_id DESC) AS rn
  FROM events
  WHERE event_id <= (SELECT max(event_id) // 2 FROM events)) t
WHERE rn = 1 AND NOT is_del
"""

# shadow-rebuild audit: drift is zero by the engine's replay-route
# invariance, and both states carry the LWW final row count
SQL_SHADOW_REBUILD_DIFF = f"""
WITH final AS ({SQL_ENGINE_FINAL_STATE})
SELECT CAST(0 AS BIGINT) AS n_drift,
       count(*) AS n_main,
       count(*) AS n_shadow
FROM final
"""


# --------------------------------------------------------------------------
# catalog


# --------------------------------------------------------------------------
# Round-5 session-2 additions: erasure cascade, bitemporal / consistent-cut
# reads, anomaly + staleness monitoring, window-rank stats, label-centroid
# cohesion, at-least-once redelivery invariance.


def q_gdpr_erasure_cascade(spark, sf):
    """Right-to-erasure audit (operators/erasure.py): the CDC delete keys
    (users whose final netted op is a delete) cascaded through the
    customer → orders → lineitem FK chain; per table, rows the cascade
    erases vs keeps. Every hop is a broadcast of the (small) key frame —
    no fact-table shuffle anywhere."""
    from relational_data_loader_spark.operators.erasure import (
        cascade_keys,
        erasure_report,
    )

    erased = q_cdc_delete_keys(spark, sf)
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    root = erasure_report(
        erased, [("customer", cust, "c_custkey"), ("orders", orders, "o_custkey")]
    )
    okeys = cascade_keys(erased, orders, "o_custkey", "o_orderkey")
    leaf = erasure_report(okeys, [("lineitem", li, "l_orderkey")])
    return root.unionByName(leaf)


SQL_GDPR_ERASURE = f"""
WITH erased AS ({SQL_DELETE_KEYS}),
okeys AS (SELECT DISTINCT o_orderkey FROM orders
          JOIN erased ON o_custkey = user_id)
SELECT 'customer' AS table_name,
       count(CASE WHEN e.user_id IS NOT NULL THEN 1 END) AS rows_erased,
       count(CASE WHEN e.user_id IS NULL THEN 1 END) AS rows_kept
FROM customer LEFT JOIN erased e ON c_custkey = e.user_id
UNION ALL
SELECT 'orders',
       count(CASE WHEN e.user_id IS NOT NULL THEN 1 END),
       count(CASE WHEN e.user_id IS NULL THEN 1 END)
FROM orders LEFT JOIN erased e ON o_custkey = e.user_id
UNION ALL
SELECT 'lineitem',
       count(CASE WHEN k.o_orderkey IS NOT NULL THEN 1 END),
       count(CASE WHEN k.o_orderkey IS NULL THEN 1 END)
FROM lineitem LEFT JOIN okeys k ON l_orderkey = k.o_orderkey
"""


def q_cdc_consistent_cut(spark, sf):
    """Multi-source consistent snapshot (operators/bitemporal.py): the log
    models 4 independently-syncing source shards (user_id % 4); the only
    transactionally consistent LWW snapshot is the one cut at the SLOWEST
    shard's high-watermark (min over shards of max lsn). The cut is a
    1-row broadcast; the snapshot costs exactly one per-key window."""
    from relational_data_loader_spark.operators.bitemporal import (
        consistent_cut,
        cut_snapshot,
    )

    ev = _t(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("event_type").alias("op"),
        "user_id",
        "value",
        "ts",
        F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("src"),
    )
    cut = consistent_cut(ev, "src", lsn_col="lsn")
    snap = cut_snapshot(ev, cut, ["user_id"], lsn_col="lsn", op_col="op", delete_op=DELETE_OP)
    return snap.select(
        "user_id",
        F.col("lsn").alias("last_lsn"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


SQL_CONSISTENT_CUT = f"""
WITH cut AS (
  SELECT min(hwm) AS cut_lsn
  FROM (SELECT user_id % 4 AS src, max(event_id) AS hwm FROM events GROUP BY 1)),
below AS (
  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
  FROM events e, cut WHERE e.event_id <= cut.cut_lsn)
SELECT user_id, event_id AS last_lsn, value AS last_value, ts AS last_ts
FROM below WHERE rn = 1 AND event_type <> '{DELETE_OP}'
"""


def q_bitemporal_asof(spark, sf):
    """Bitemporal point read (operators/bitemporal.py): per key, the state
    valid at business time T (= max ts − 7 days) as KNOWN at system lsn
    L (= floor(0.7·max lsn)) — the audit question plain time travel can't
    answer. Cuts derive from a 1-row agg broadcast into the filter; the
    as-of itself is one per-key window."""
    from relational_data_loader_spark.operators.bitemporal import bitemporal_asof

    ev = _t(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("event_type").alias("op"),
        "user_id",
        "value",
        "ts",
    )
    cuts = ev.agg(
        F.floor(F.max("lsn") * 0.7).cast("bigint").alias("sys_l"),
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("valid_t"),
    )
    log = ev.join(F.broadcast(cuts), F.lit(True), "inner")
    out = bitemporal_asof(
        log,
        ["user_id"],
        system_cut=F.col("sys_l"),
        valid_cut=F.col("valid_t"),
        lsn_col="lsn",
        valid_col="ts",
        op_col="op",
        delete_op=DELETE_OP,
    )
    return out.select("user_id", "lsn", "ts", "value")


SQL_BITEMPORAL_ASOF = f"""
WITH cuts AS (
  SELECT CAST(floor(max(event_id) * 0.7) AS BIGINT) AS sys_l,
         max(ts) - INTERVAL 7 DAY AS valid_t
  FROM events),
vis AS (
  SELECT e.*, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events e, cuts
  WHERE e.event_id <= cuts.sys_l AND e.ts <= cuts.valid_t)
SELECT user_id, event_id AS lsn, ts, value
FROM vis WHERE rn = 1 AND event_type <> '{DELETE_OP}'
"""


def q_anomaly_zscore(spark, sf):
    """Per-group z-score anomaly flags (operators/events.flag_anomalies):
    events > 2.5 population σ from their event_type's mean. Group stats
    are a tiny partial-agged groupBy broadcast back onto the scan; both
    engines compare the ROUNDED z so boundary rows can't flip on
    accumulation-order noise."""
    from relational_data_loader_spark.operators.events import flag_anomalies

    ev = _t(spark, sf, "events")
    return flag_anomalies(
        ev, group_col="event_type", value_col="value", id_col="event_id"
    )


SQL_ANOMALY_Z = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY 1)
SELECT event_id, event_type, value,
       CAST(round((value - mu) / sigma, 3) AS DOUBLE) AS z
FROM events JOIN stats USING (event_type)
WHERE sigma > 0 AND abs(round((value - mu) / sigma, 3)) > 2.5
"""


def q_cdc_staleness_report(spark, sf):
    """Per-key freshness vs the stream watermark (operators/events.
    staleness_report): last lsn/ts, lag in days, stale verdict — the
    tracker dashboard (SURVEY §2.1 C3) generalized per key. One groupBy
    + a 1-row broadcast; lag arithmetic is integer-exact."""
    from relational_data_loader_spark.operators.events import staleness_report

    ev = _t(spark, sf, "events")
    return staleness_report(ev, stale_after_days=30)


SQL_STALENESS = """
WITH per_key AS (
  SELECT user_id, max(event_id) AS last_lsn, max(ts) AS last_ts
  FROM events GROUP BY 1),
wm AS (SELECT max(ts) AS wm_ts FROM events)
SELECT user_id, last_lsn, last_ts,
       CAST(date_diff('day', CAST(last_ts AS DATE), CAST(wm_ts AS DATE)) AS INT)
         AS lag_days,
       date_diff('day', CAST(last_ts AS DATE), CAST(wm_ts AS DATE)) >= 30
         AS is_stale
FROM per_key, wm
"""


def q_window_rank_stats(spark, sf):
    """Distribution-rank windows over each event_type: percent_rank,
    cume_dist, decile (ntile) on a (value, event_id)-pinned total order —
    deterministic under value ties by construction. One exchange; the
    rank math is exact rational arithmetic identical in both engines."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pr"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )


SQL_WINDOW_RANK = """
SELECT event_id, event_type,
       CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
       CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd,
       CAST(ntile(10) OVER w AS INT) AS decile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


def q_label_centroid_cohesion(spark, sf):
    """Per-label centroid cohesion (operators/similarity.
    label_centroid_cohesion): element-wise mean embedding per label and
    the average cosine of members to it — cluster-quality audit before
    trusting a label column for stratification. The explode collapses
    map-side to labels × dim running sums; centroids broadcast back; the
    cosine stays in codegen."""
    from relational_data_loader_spark.operators.similarity import (
        label_centroid_cohesion,
    )

    embs = _t(spark, sf, "embeddings")
    return label_centroid_cohesion(embs)


SQL_CENTROID_COHESION = """
WITH comp AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS val
  FROM embeddings),
cent AS (
  SELECT label, pos, avg(CAST(val AS DOUBLE)) AS c
  FROM comp GROUP BY 1, 2),
nc AS (SELECT label, sqrt(sum(c * c)) AS n FROM cent GROUP BY 1),
per_vec AS (
  SELECT e.vec_id, e.label,
         sum(CAST(e.val AS DOUBLE) * cent.c) AS dot,
         sqrt(sum(CAST(e.val AS DOUBLE) * CAST(e.val AS DOUBLE))) AS nv
  FROM (SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS val FROM embeddings) e
  JOIN cent ON cent.label = e.label AND cent.pos = e.pos
  GROUP BY 1, 2)
SELECT p.label, count(*) AS n_vecs,
       CAST(round(avg(dot / (nv * nc.n)), 3) AS DOUBLE) AS cohesion
FROM per_vec p JOIN nc ON nc.label = p.label
GROUP BY 1
"""


def q_cdc_redelivery_state(spark, sf):
    """At-least-once delivery invariance on the engine path: the derived
    change log with its ENTIRE TAIL HALF DUPLICATED (same lsns, same
    payloads — a redelivered CDC window) replayed through the engine must
    land on the byte-identical LWW state the exactly-once log produces.
    The netting layer collapses same-(key,lsn) duplicates before MERGE,
    so redelivery is absorbed without a dedup pre-pass."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "redeliver")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    cut = log.agg(F.max("lsn")).first()[0] // 2
    dup = log.unionByName(log.filter(F.col("lsn") > cut))
    dup.write.mode("overwrite").parquet(log_dir)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr.run(spec)
    return mgr.table(spec).read()


def q_cdc_reconciliation_state(spark, sf):
    """Destination validation (operators/reconcile.py): replay the log
    through the engine, then summarize the VISIBLE table into 16 bucketed
    (count, order-independent 56-bit-md5-sum) checksums. The oracle
    derives the same summary from the raw events in SQL — so a green row
    proves the engine's materialized state is content-identical to the
    source expectation bucket by bucket, the audit a destination-of-record
    runs after every load. Timestamps enter the hash as epoch micros
    (no formatter in the hash path); checksums travel as strings (a
    56-bit × N sum overflows doubles)."""
    from relational_data_loader_spark.operators.reconcile import bucket_checksums

    tbl = _run_engine_replay(spark, sf, "recon", split=True)
    canon = tbl.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_micros("ts").alias("ts_us"),
    )
    out = bucket_checksums(
        canon,
        ["conv_id", "turn_idx"],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts_us"],
        n_buckets=16,
    )
    return out.select("bucket", "n_rows", F.col("checksum").cast("string").alias("checksum"))


SQL_RECONCILIATION = f"""
WITH final AS ({SQL_ENGINE_FINAL_STATE}),
canon AS (
  SELECT CAST(
           CAST(concat('0x', substr(md5(
             concat_ws('|', coalesce(CAST(conv_id AS VARCHAR), '␀'),
                            coalesce(CAST(turn_idx AS VARCHAR), '␀'))
           ), 1, 14)) AS BIGINT) % 16 AS INT) AS bucket,
         CAST(concat('0x', substr(md5(
           concat_ws('|', coalesce(CAST(conv_id AS VARCHAR), '␀'),
                          coalesce(CAST(turn_idx AS VARCHAR), '␀'),
                          coalesce(CAST(role AS VARCHAR), '␀'),
                          coalesce(CAST(text AS VARCHAR), '␀'),
                          coalesce(CAST(tool AS VARCHAR), '␀'),
                          coalesce(CAST(epoch_us(ts) AS VARCHAR), '␀'))
         ), 1, 14)) AS BIGINT) AS h
  FROM final)
SELECT bucket, count(*) AS n_rows,
       CAST(sum(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS checksum
FROM canon GROUP BY 1
"""


def q_reconcile_drilldown(spark, sf):
    """Merkle-descent reconciliation (operators/reconcile.py
    reconcile_drilldown): source = documents; dest = the same table with
    deterministic injected drift (every 101st key dropped, every 103rd
    text altered, every 107th re-keyed out of range = a spurious extra).
    The operator digests both sides, finds the mismatched buckets, and
    row-diffs ONLY those — the oracle states the ground truth directly
    (the full row diff), which the pruned path must reproduce exactly:
    a bucket the digests cleared is provably drift-free, so skipping it
    can never lose a repair row."""
    from relational_data_loader_spark.operators.reconcile import (
        reconcile_drilldown,
    )

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    docs = _t(spark, sf, "documents").select(*cols)
    did = F.col("doc_id")
    dest = (
        docs.filter(did % 101 != 0)
        .withColumn(
            "text",
            F.when(did % 103 == 0, F.concat(F.col("text"), F.lit("!")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(did % 107 == 0).withColumn(
                "doc_id", did + F.lit(1_000_000)
            )
        )
    )
    return reconcile_drilldown(docs, dest, ["doc_id"], cols, n_buckets=16)


SQL_RECONCILE_DRILLDOWN = """
WITH src AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
dst AS (
  SELECT doc_id,
         CASE WHEN doc_id % 103 = 0 THEN text || '!' ELSE text END AS text,
         lang, source, n_chars
  FROM src WHERE doc_id % 101 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source, n_chars
  FROM src WHERE doc_id % 107 = 0)
SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
       CASE WHEN d.doc_id IS NULL THEN 'missing_in_dest'
            WHEN s.doc_id IS NULL THEN 'missing_in_source'
            WHEN s.text IS DISTINCT FROM d.text
              OR s.lang IS DISTINCT FROM d.lang
              OR s.source IS DISTINCT FROM d.source
              OR s.n_chars IS DISTINCT FROM d.n_chars THEN 'value_drift'
       END AS status
FROM src s FULL OUTER JOIN dst d ON s.doc_id = d.doc_id
WHERE (d.doc_id IS NULL OR s.doc_id IS NULL
       OR s.text IS DISTINCT FROM d.text
       OR s.lang IS DISTINCT FROM d.lang
       OR s.source IS DISTINCT FROM d.source
       OR s.n_chars IS DISTINCT FROM d.n_chars)
"""


def q_cdc_txn_publish_state(spark, sf):
    """CROSS-TABLE transactional publish replay (plans/txn.py): transcripts
    + a conv_registry dimension loaded from the same derived change log onto
    WAP branches, group-published with an INJECTED CRASH between the two
    fast-forwards, recovered through the fsync'd group journal (roll
    forward — the first participant's publish landed), then read
    FK-consistently through the pinned consistent-cut record. The proof
    row carries both tables' cardinalities, the orphan count (turns whose
    conv_id is missing from the registry — 0 iff the cut is consistent),
    and the transcripts content checksum, all of which the oracle derives
    independently from the raw events."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.plans.txn import (
        publish_group,
        read_cut,
        recover_groups,
    )
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec, transcripts_spec

    base = _state_workdir(sf, "txn")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    reg_dir = os.path.join(base, "reg")
    log = _derived_changelog(spark, sf)
    log.write.parquet(log_dir)
    # registry envelope stream: one upsert per EVENT (never deletes — a
    # conversation that ever existed keeps its registry row), LWW keeps
    # the latest event's role per conv
    log.select(
        "lsn",
        F.lit("U").alias("op"),
        "conv_id",
        F.coalesce(F.col("role"), F.lit("tombstone")).alias("last_role"),
    ).write.parquet(reg_dir)

    spec_a = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    spec_b = IngestSpec(
        name="conv_registry",
        source=f"parquet://{reg_dir}",
        columns=[
            ColumnSpec("conv_id", "conv_id", "string", primary_key=True, nullable=False),
            ColumnSpec("last_role", "last_role", "string"),
        ],
        target_buckets=8,
    )
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec_a, branch="wap")
    mgr.run(spec_b, branch="wap")
    try:
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")], _fail_after=1)
        raise AssertionError("fault injection did not fire")
    except RuntimeError as e:
        if "injected crash" not in str(e):
            raise
    (journal,) = recover_groups(mgr, [spec_a, spec_b])
    views = read_cut(mgr, [spec_a, spec_b], journal["txid"])
    turns, reg = views["transcripts"], views["conv_registry"]

    from relational_data_loader_spark.operators.reconcile import _canonical, _md5_56

    a_agg = turns.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            _md5_56(_canonical(["conv_id", "turn_idx", "text"])).cast(
                "decimal(38,0)"
            )
        ).alias("_chk"),
    )
    b_agg = reg.agg(F.count(F.lit(1)).alias("n_convs"))
    o_agg = turns.join(reg, "conv_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_orphan_turns")
    )
    # three 1-row frames → one proof row (broadcast-trivial crossJoins)
    return (
        a_agg.crossJoin(b_agg)
        .crossJoin(o_agg)
        .select(
            "n_turns",
            "n_convs",
            "n_orphan_turns",
            F.col("_chk").cast("string").alias("turns_chk"),
        )
    )


SQL_TXN_PUBLISH = f"""
WITH final AS ({SQL_ENGINE_FINAL_STATE}),
reg AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS conv_id FROM events),
chk AS (
  SELECT CAST(concat('0x', substr(md5(
           concat_ws('|', coalesce(CAST(conv_id AS VARCHAR), '␀'),
                          coalesce(CAST(turn_idx AS VARCHAR), '␀'),
                          coalesce(CAST(text AS VARCHAR), '␀'))
         ), 1, 14)) AS BIGINT) AS h
  FROM final)
SELECT (SELECT count(*) FROM final) AS n_turns,
       (SELECT count(*) FROM reg) AS n_convs,
       CAST(0 AS BIGINT) AS n_orphan_turns,
       CAST((SELECT sum(CAST(h AS DECIMAL(38,0))) FROM chk) AS VARCHAR)
         AS turns_chk
"""


def q_cdc_mor_read_optimized(spark, sf):
    """Hudi's read-optimized (_ro) query on an UNCOMPACTED MoR table: the
    head half loads as the base (full refresh), the tail accumulates as
    pending delta epochs, and ``read(read_optimized=True)`` serves BASE
    FILES ONLY — so the visible state is exactly the head-refresh state,
    which is the same oracle the rollback entry pins (lsn ≤ max//2 LWW).
    The staleness contract made checkable: _ro sees precisely what
    compaction has folded, nothing newer."""
    return _run_engine_replay(
        spark,
        sf,
        "mor_ro",
        split=True,
        merge_mode="mor",
        chunks=3,
        read_optimized=True,
    )


def q_cdc_clone_state(spark, sf):
    """Zero-copy clone replay (SnapshotTable.clone_to — the Delta CLONE
    analog): production loads the HEAD half of the log, a shallow clone
    (metadata-only, absolute-path file references) is taken into a second
    warehouse, and the TAIL is ingested on the CLONE — the carried
    watermark/epochs make it apply exactly what production had not. The
    clone's final read must equal the full LWW oracle while production is
    pinned at the head (pytest asserts that half; the driver hashes the
    clone's state). Dev-replay-from-production at 10^10 rows without
    copying a byte."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "clone")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    hi = log.agg(F.max("lsn")).first()[0]
    cut = int(hi) // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    prod = DataLoadManager(spark, os.path.join(base, "prod"))
    prod.run(spec)
    prod.table(spec).clone_to(os.path.join(base, "dev", spec.name))
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    dev = DataLoadManager(spark, os.path.join(base, "dev"))
    dev.run(spec)
    return dev.table(spec).read()


def q_tfidf_top_terms(spark, sf):
    """Keyword extraction (operators/index.tfidf_top_terms): top-3 terms
    per document by tf·ln(N/df). tf/df both aggregate REDUCED tables (the
    raw token stream shuffles once); N broadcasts; ranking cuts on the
    rounded score with a term tie-break."""
    from relational_data_loader_spark.operators.index import tfidf_top_terms

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return tfidf_top_terms(docs, "text", "doc_id", k=3)


SQL_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 500),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
scored AS (
  SELECT doc_id, tok,
         CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS DOUBLE) AS tfidf
  FROM tf JOIN dfs USING (tok), n)
SELECT doc_id, tok, tfidf, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) rk
      FROM scored)
WHERE rk <= 3
"""


def q_rollup_pricing(spark, sf):
    """Multi-granularity aggregation (ROLLUP) at (returnflag, linestatus),
    per returnflag, and grand-total levels. Deliberately NOT
    ``DataFrame.rollup`` on the fact table: that compiles to an Expand
    that replicates EVERY fact row once per grouping set (3× the scan's
    output, measured 2.7 s vs 1.1 s here) — instead aggregate once at the
    finest level, then roll the 6-row leaf result up. Decimal sums are
    associative, so re-aggregating partials is bit-exact; rounding
    happens once, after the final sum."""
    li = _t(spark, sf, "lineitem")
    leaf = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_qty"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("_rev"),
        F.count(F.lit(1)).alias("_n"),
    )
    return leaf.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("_qty"), 2).cast("double").alias("sum_qty"),
        F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
        F.sum("_n").alias("n_rows"),
    )


SQL_ROLLUP_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_user_event_matrix(spark, sf):
    """Pivot (long → wide): per-user event counts, one column per event
    type. The value list is PINNED (never inferred) — inferred pivot
    values cost an extra distinct pass AND make the output schema
    data-dependent, which breaks downstream DDL at scale. Deliberately
    NOT ``DataFrame.pivot``: with a pinned list that API still compiles
    to TWO exchanges (pre-agg on (user, type), then pivotfirst on user —
    measured on this plan), where conditional counters are one exchange
    with 5 map-side partial counts. Same result, half the shuffles."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ]
    )


SQL_PIVOT_MATRIX = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY 1
"""


def q_dq_expectations(spark, sf):
    """Data-quality gate (operators/quality.py): row predicates folded
    into ONE conditional-count scan, key uniqueness as one (key,count)
    groupBy, referential integrity as a keys-only anti join. The report
    is exact counts, so it doubles as a drift metric; the value-bound
    check is a deliberately tight SLA threshold so nonzero counting is
    exercised, not just all-green booleans."""
    from relational_data_loader_spark.operators.quality import (
        referential_expectation,
        row_expectations,
        unique_key_expectation,
    )

    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer")
    ev = _t(spark, sf, "events")
    rows = row_expectations(
        orders,
        [
            (
                "o_totalprice_positive",
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
            ),
            (
                "o_orderstatus_accepted",
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P"),
            ),
            ("o_orderdate_not_null", F.col("o_orderdate").isNull()),
        ],
    )
    ev_rows = row_expectations(
        ev, [("events_value_le_100", F.col("value").isNull() | (F.col("value") > 100))]
    )
    uniq = unique_key_expectation(orders, ["o_orderkey"])
    fk = referential_expectation(orders, "o_custkey", customer, "c_custkey")
    return rows.unionByName(ev_rows).unionByName(uniq).unionByName(fk)


SQL_DQ_EXPECTATIONS = """
SELECT 'o_totalprice_positive' AS check_name,
       CAST(count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 END) AS BIGINT) AS n_violations,
       count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 END) = 0 AS passed
FROM orders
UNION ALL
SELECT 'o_orderstatus_accepted',
       CAST(count(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT),
       count(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderdate_not_null',
       CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT),
       count(CASE WHEN o_orderdate IS NULL THEN 1 END) = 0
FROM orders
UNION ALL
SELECT 'events_value_le_100',
       CAST(count(CASE WHEN value IS NULL OR value > 100 THEN 1 END) AS BIGINT),
       count(CASE WHEN value IS NULL OR value > 100 THEN 1 END) = 0
FROM events
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(coalesce(sum(n - 1), 0) AS BIGINT),
       coalesce(sum(n - 1), 0) = 0
FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
UNION ALL
SELECT 'fk(o_custkey->c_custkey)',
       CAST(count(*) AS BIGINT),
       count(*) = 0
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
"""


def q_table_profile(spark, sf):
    """Column profiling (operators/quality.profile_columns): rows, nulls,
    exact distinct, min/max per column — one single-column pruned pass
    each (ReadSchema carries exactly one column per pass). Exact distinct
    is the oracle-pairable choice; the 100 TB swap is
    approx_count_distinct (documented in the operator)."""
    from relational_data_loader_spark.operators.quality import profile_columns

    orders = _t(spark, sf, "orders")
    return profile_columns(orders, ["o_orderstatus", "o_orderpriority", "o_custkey"])


SQL_TABLE_PROFILE = """
SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
       count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT o_orderstatus) AS n_distinct,
       CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
       CAST(max(o_orderstatus) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
       count(DISTINCT o_orderpriority),
       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       count(CASE WHEN o_custkey IS NULL THEN 1 END),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
"""


def q_out_of_order_stats(spark, sf):
    """Out-of-orderness measurement (operators/watermark.out_of_order_
    stats): per key, how often and how far business timestamps regress in
    lsn order — the datum that SIZES a streaming watermark allowance
    (guessing it drops data or bloats state). One per-key window; the
    running max is O(1) state. The fixture's log is perfectly ordered
    (ts monotone in event_id), which would exercise only the zero path —
    so the entry deliberately disorders delivery by XOR-ing the lsn's low
    3 bits (a deterministic 8-block shuffle both engines compute
    identically), the way a multi-threaded tailer interleaves commits."""
    from relational_data_loader_spark.operators.watermark import out_of_order_stats

    ev = _t(spark, sf, "events").select(
        "user_id", F.col("event_id").bitwiseXOR(F.lit(7)).alias("lsn"), "ts"
    )
    return out_of_order_stats(ev, "user_id", lsn_col="lsn", ts_col="ts")


SQL_OUT_OF_ORDER = """
WITH run AS (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY xor(event_id, 7)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events),
marked AS (
  SELECT user_id,
         CASE WHEN prev_max > ts
              THEN date_diff('second', ts, prev_max) ELSE 0 END AS regress_s,
         CASE WHEN prev_max > ts THEN 1 ELSE 0 END AS late
  FROM run)
SELECT user_id, count(*) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late,
       round(sum(late) / CAST(count(*) AS DOUBLE), 4) AS p_late,
       CAST(max(regress_s) AS BIGINT) AS max_regress_s
FROM marked GROUP BY 1
"""


def q_sliding_window_rollup(spark, sf):
    """Sliding (hopping) event-time windows via native ``F.window``:
    10-minute windows every 5 minutes, per event type — each event lands
    in exactly width/slide = 2 windows. The oracle states the same
    algebra explicitly (two grid-aligned candidate starts per event);
    Spark's window() is the same epoch-aligned arithmetic fused into the
    aggregation, one exchange."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value"), "sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_SLIDING_WINDOW = """
WITH assigned AS (
  SELECT e.event_type, e.value,
         CAST(to_timestamp(floor(epoch(e.ts) / 300) * 300 - o.off * 300)
              AS TIMESTAMP) AS win_start
  FROM events e, (VALUES (0), (1)) AS o(off)
  WHERE e.ts < CAST(to_timestamp(floor(epoch(e.ts) / 300) * 300 - o.off * 300)
                    AS TIMESTAMP) + INTERVAL 10 MINUTE)
SELECT win_start, event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM assigned GROUP BY 1, 2
"""


_WM_BATCH = 500
_WM_DELAY_S = 30


def q_cdc_watermark_drops(spark, sf):
    """Watermark-policy audit (operators/watermark.simulate_watermark_
    drops): Structured Streaming's exact semantics — watermark = prior
    micro-batches' max event time − delay, updated BETWEEN batches —
    replayed as a batch query, so a (batch size, delay) pair can be
    audited against a real log BEFORE the stream silently drops rows.
    Delivery order is the same low-bits XOR scramble as
    out_of_order_stats (the fixture log is perfectly ordered; a stream
    that in-order never drops anything exercises nothing)."""
    from relational_data_loader_spark.operators.watermark import (
        simulate_watermark_drops,
    )

    ev = _t(spark, sf, "events").select(
        F.col("event_id").bitwiseXOR(F.lit(255)).alias("lsn"), "ts"
    )
    return simulate_watermark_drops(
        ev, lsn_col="lsn", ts_col="ts", batch_size=_WM_BATCH, delay_seconds=_WM_DELAY_S
    )


SQL_WATERMARK_DROPS = f"""
WITH b AS (
  SELECT CAST(floor(xor(event_id, 255) / {_WM_BATCH}) AS BIGINT) AS batch, ts
  FROM events),
bmax AS (SELECT batch, max(ts) AS bmax FROM b GROUP BY 1),
wm AS (
  SELECT batch,
         max(bmax) OVER (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - INTERVAL {_WM_DELAY_S} SECOND AS wm_ts
  FROM bmax)
SELECT b.batch, count(*) AS n_events,
       count(CASE WHEN b.ts < wm.wm_ts THEN 1 END) AS n_dropped,
       max(wm.wm_ts) AS watermark_ts
FROM b JOIN wm USING (batch)
GROUP BY 1
"""


def q_json_props_extract(spark, sf):
    """Semi-structured payload handling: the events' ``props`` column is a
    JSON document; extract ``$.k`` JVM-side (``get_json_object`` —
    codegen, no Python) and aggregate it per event type. The everyday CDC
    reality of sources that stuff payloads into JSON columns; the scan
    reads only (event_type, props)."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(k.isNull(), 1)).alias("n_unparsed"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


SQL_JSON_PROPS = """
WITH x AS (
  SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events)
SELECT event_type, count(*) AS n,
       count(CASE WHEN k IS NULL THEN 1 END) AS n_unparsed,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 4) AS avg_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY 1
"""


_HIST_WIDTH = 25


def q_value_histogram(spark, sf):
    """Equi-width histogram of the value column per event type — the
    distribution sketch a quality monitor plots per ingest window. Bucket
    arithmetic is floor division (integer-exact both engines); one
    partial-agged groupBy on (type, bucket)."""
    ev = _t(spark, sf, "events")
    b = F.floor(F.col("value") / _HIST_WIDTH).cast("int")
    return ev.groupBy("event_type", b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("bucket_min"),
        F.round(F.max("value"), 4).alias("bucket_max"),
    )


SQL_VALUE_HISTOGRAM = f"""
SELECT event_type, CAST(floor(value / {_HIST_WIDTH}) AS INT) AS bucket,
       count(*) AS n,
       round(min(value), 4) AS bucket_min,
       round(max(value), 4) AS bucket_max
FROM events GROUP BY 1, 2
"""


def q_group_stats_suite(spark, sf):
    """Second-moment statistics per group: Pearson correlation, population
    covariance and stddev of (quantity, extendedprice) per returnflag —
    the aggregates a feature-engineering pass and a drift monitor share.
    All are single-pass mergeable sketches (sum/sumsq/cross-sum state),
    so partial aggregation keeps the shuffle at O(groups); results round
    at 4dp where both engines' accumulation orders agree."""
    li = _t(spark, sf, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr(q, p), 4).alias("corr_qty_price"),
        F.round(F.covar_pop(q, p), 4).alias("covar_qty_price"),
        F.round(F.stddev_pop(q), 4).alias("std_qty"),
        F.round(F.stddev_pop(p), 4).alias("std_price"),
    )


SQL_GROUP_STATS = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_pop(l_quantity), 4) AS std_qty,
       round(stddev_pop(l_extendedprice), 4) AS std_price
FROM lineitem GROUP BY 1
"""


def q_kmv_distinct_tokens(spark, sf):
    """Deterministic cardinality sketch (operators/sketch.kmv_distinct):
    per-language distinct-token estimate via k-minimum-values (k=64) next
    to the exact count and relative error. Unlike HLL, KMV's estimate is
    reproducible across engines (md5-derived uniforms), so the ORACLE
    verifies the sketch itself — the audit that justifies the swap from
    exact count-distinct at scale. Top-k per group rides a
    WindowGroupLimit (each map partition forwards ≤ k rows/group)."""
    from relational_data_loader_spark.functions.text import _one_to_one, tokens
    from relational_data_loader_spark.operators.sketch import kmv_distinct

    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "lang", _one_to_one(tokens(F.col("text")), "_toks")
    ).select("lang", F.explode("_toks").alias("tok"))
    return kmv_distinct(toks, "lang", "tok", k=64)


SQL_KMV_DISTINCT = r"""
WITH toks AS (
  SELECT lang,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents),
hashed AS (
  SELECT DISTINCT lang,
         CAST(concat('0x', substr(md5(tok), 1, 14)) AS BIGINT)
           / 72057594037927936.0 AS u
  FROM toks),
topk AS (
  SELECT lang, u, row_number() OVER (PARTITION BY lang ORDER BY u) AS rk
  FROM hashed QUALIFY rk <= 64),
est AS (
  SELECT lang,
         CASE WHEN max(rk) < 64 THEN CAST(max(rk) AS DOUBLE)
              ELSE round(63.0 / max(u), 4) END AS n_estimate
  FROM topk GROUP BY 1),
exact AS (SELECT lang, count(*) AS n_exact FROM hashed GROUP BY 1)
SELECT lang, n_exact, n_estimate,
       round((n_estimate - n_exact) / n_exact, 4) AS rel_error
FROM exact JOIN est USING (lang)
"""


def q_dedup_keep_best(spark, sf):
    """Quality-aware keeper election: near-dup clusters with the LONGEST
    member kept (n_chars, doc_id tie-break) instead of the min-id default
    — the policy real corpus dedup ships (the longest variant of a
    template family usually carries the most content). Reuses the
    clustering pipeline; the election is one window over the (tiny)
    cluster assignment."""
    from relational_data_loader_spark.operators.dedup import (
        near_dup_pairs_with_handle,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    pairs, release = near_dup_pairs_with_handle(
        docs, "text", "doc_id", threshold=0.5
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    release()
    joined = clusters.select("doc_id", "cluster_id").join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep_best"),
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE pairs AS ({SQL_NEAR_DUP}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s WHERE e.d <> r.n),
labels AS (
  SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM reach GROUP BY n),
cl AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id < 500) d
  LEFT JOIN labels l ON l.doc_id = d.doc_id)
SELECT doc_id, cluster_id, n_chars,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC, doc_id) = 1 AS keep_best
FROM cl
"""


def q_weighted_sample(spark, sf):
    """Deterministic weighted sampling without replacement (operators/
    sampling.weighted_sample_topk): top-5 docs per language, selection
    probability ∝ n_chars, reproducible on any engine/partitioning (the
    Efraimidis–Spirakis keys derive from md5 uniforms, not an RNG —
    which is also why an ORACLE can check a *sample*)."""
    from relational_data_loader_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = _t(spark, sf, "documents")
    return weighted_sample_topk(docs, "lang", "doc_id", "n_chars", k=5)


SQL_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         round(ln(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                       AS BIGINT) / 72057594037927936.0)
               / CAST(n_chars AS DOUBLE), 9) AS sample_key
  FROM documents)
SELECT lang, doc_id, n_chars, sample_key, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY sample_key DESC, doc_id) AS rk
      FROM keyed)
WHERE rk <= 5
"""


def q_cdc_gap_check(spark, sf):
    """Change-stream continuity audit: within each shard (user_id % 4,
    the consistent-cut sharding), lsns should be gap-free relative to the
    shard's own observed set — missing lsns mean LOST CHANGE EVENTS (the
    failure CT retention expiry causes, SURVEY §2.1 S3's min-valid rule).
    Shards interleave one global sequence here, so the audit counts gaps
    against each shard's (max−min+1) span MINUS what interleaving
    accounts for globally: the global stream must have zero gaps; per
    shard the span arithmetic is reported for the operator to baseline.
    Pure integer aggregates, one partial-agged groupBy + a 1-row global."""
    ev = _t(spark, sf, "events")
    per_shard = ev.groupBy(
        F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_lsn"),
        F.max("event_id").alias("max_lsn"),
    )
    glob = ev.agg(
        F.lit(-1).cast("int").alias("shard"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_lsn"),
        F.max("event_id").alias("max_lsn"),
    )
    both = per_shard.unionByName(glob)
    return both.select(
        "shard",
        "n_events",
        "min_lsn",
        "max_lsn",
        (F.col("max_lsn") - F.col("min_lsn") + 1 - F.col("n_events")).alias(
            "missing_lsns"
        ),
    )


SQL_GAP_CHECK = """
SELECT CAST(user_id % 4 AS INT) AS shard, count(*) AS n_events,
       min(event_id) AS min_lsn, max(event_id) AS max_lsn,
       max(event_id) - min(event_id) + 1 - count(*) AS missing_lsns
FROM events GROUP BY 1
UNION ALL
SELECT -1, count(*), min(event_id), max(event_id),
       max(event_id) - min(event_id) + 1 - count(*)
FROM events
"""


def q_live_key_timeline(spark, sf):
    """Daily table-size timeline (operators/lww.live_key_timeline): net
    liveness transitions per day + running live-key count, via the
    boundary-delta trick — each event contributes a ±1 only when its
    key's liveness FLIPS, so the cost is one per-key window plus a
    running sum over the (tiny) day dimension, never days × keys."""
    from relational_data_loader_spark.operators.lww import live_key_timeline

    ev = _t(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("event_type").alias("op"),
        "user_id",
        "ts",
    )
    return live_key_timeline(
        ev, ["user_id"], lsn_col="lsn", ts_col="ts", op_col="op",
        delete_op=DELETE_OP,
    )


SQL_LIVE_TIMELINE = f"""
WITH seq AS (
  SELECT user_id, ts,
         CAST(event_type <> '{DELETE_OP}' AS INT) AS live,
         lag(CAST(event_type <> '{DELETE_OP}' AS INT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
deltas AS (
  SELECT CAST(ts AS DATE) AS day, live - coalesce(prev, 0) AS d
  FROM seq WHERE live - coalesce(prev, 0) <> 0),
daily AS (SELECT day, sum(d) AS net_change FROM deltas GROUP BY 1)
SELECT day, CAST(net_change AS BIGINT) AS net_change,
       CAST(sum(net_change) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS live_keys
FROM daily
"""


def q_unigram_surprisal(spark, sf):
    """Language-model quality scoring without a model: per-document mean
    unigram surprisal −avg ln p(token), with p estimated from the corpus
    itself — the cheap proxy quality filters use before anything neural
    (gibberish and boilerplate both light up: rare-token soup scores
    high, repeated-token soup scores low). Same two-aggregate shape as
    TF-IDF: token frequencies reduce before the vocabulary join; the
    corpus total is a 1-row broadcast."""
    from relational_data_loader_spark.functions.text import _one_to_one, tokens

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    tok = docs.select(
        "doc_id", _one_to_one(tokens(F.col("text")), "_toks")
    ).select("doc_id", F.explode("_toks").alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    cf = tf.groupBy("tok").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("n_total"))
    scored = (
        tf.join(cf, "tok")
        .join(F.broadcast(total), F.lit(True), "inner")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                -F.sum(F.col("tf") * F.log(F.col("cf") / F.col("n_total")))
                / F.sum("tf"),
                4,
            ).alias("surprisal"),
        )
    )
    return scored


SQL_SURPRISAL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 1000),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
cf AS (SELECT tok, sum(tf) AS cf FROM tf GROUP BY 1),
tot AS (SELECT sum(cf) AS n_total FROM cf)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(-sum(tf * ln(cf / n_total)) / sum(tf), 4) AS surprisal
FROM tf JOIN cf USING (tok), tot
GROUP BY 1
"""


def q_dsir_selection(spark, sf):
    """DSIR importance resampling (operators/sampling.py
    dsir_logratio_topk): score the pool by target-vs-source smoothed
    unigram log-likelihood ratio (target = the English docs — the
    'looks like my high-quality set' distribution), keep the top-100.
    The principled upgrade of quality_curriculum_sample's heuristic
    gates: selection tracks an explicit target distribution."""
    from relational_data_loader_spark.operators.sampling import (
        dsir_logratio_topk,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    return dsir_logratio_topk(docs, F.col("lang") == "en", k=100)


SQL_DSIR = r"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 1000),
tf AS (SELECT doc_id, tok, count(*) AS tf, bool_or(tgt) AS tgt
       FROM tok GROUP BY 1, 2),
cs AS (SELECT tok, sum(tf) AS c_s FROM tf GROUP BY 1),
ct AS (SELECT tok, sum(tf) AS c_t FROM tf WHERE tgt GROUP BY 1),
tot AS (SELECT (SELECT sum(c_s) FROM cs) AS n_s,
               (SELECT count(*) FROM cs) AS v,
               (SELECT sum(c_t) FROM ct) AS n_t),
scored AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         round(sum(tf * (ln((coalesce(c_t, 0) + 1) / (n_t + v))
                       - ln((c_s + 1) / (n_s + v)))) / sum(tf), 4) AS logratio
  FROM tf JOIN cs USING (tok) LEFT JOIN ct USING (tok), tot
  GROUP BY 1)
SELECT doc_id, n_tokens, logratio, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY logratio DESC, doc_id) AS rk
      FROM scored)
WHERE rk <= 100
"""


def q_last_touch_attribution(spark, sf):
    """Last-touch attribution: every purchase attributed to the user's
    most recent preceding click/view within 3 days (else unattributed).
    One per-user window with IGNORE NULLS last_value over the ordered
    stream — no self-join, no as-of pass per touch type; the tolerance
    is a plain filter on the carried timestamp."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"),
        F.struct("ts", "event_id", "event_type"),
    )
    last_touch = F.last(touch, ignorenulls=True).over(w)
    purchases = (
        ev.withColumn("_lt", last_touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(
                F.col("_lt.ts") >= F.col("ts") - F.expr("INTERVAL 3 DAYS"),
                F.col("_lt.event_id"),
            ).alias("touch_id"),
            F.when(
                F.col("_lt.ts") >= F.col("ts") - F.expr("INTERVAL 3 DAYS"),
                F.col("_lt.event_type"),
            ).alias("touch_type"),
        )
    )
    return purchases


SQL_ATTRIBUTION = """
WITH marked AS (
  SELECT *,
         last_value(CASE WHEN event_type IN ('click','view')
                         THEN struct_pack(ts := ts, event_id := event_id,
                                          event_type := event_type) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE WHEN lt.ts >= ts - INTERVAL 3 DAY THEN lt.event_id END AS touch_id,
       CASE WHEN lt.ts >= ts - INTERVAL 3 DAY THEN lt.event_type END AS touch_type
FROM marked WHERE event_type = 'purchase'
"""


def q_shipping_priority(spark, sf):
    """TPC-H Q3 shape: 3-way join (dimension filter broadcast onto the
    fact chain) → per-order revenue → global top 10. The segment filter
    prunes customer BEFORE the join (broadcast), orders filters push to
    the scan, and the top-k is a sort-limit (TakeOrderedAndProject — no
    full sort materializes)."""
    cust = _t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_big_spenders(spark, sf):
    """Correlated-subquery shape, decorrelated: customers whose total
    spend exceeds 2× the average customer's total. The subquery becomes
    one aggregate reused twice — per-customer totals once, their 1-row
    average broadcast back — instead of re-evaluating a scalar subquery
    per row (which is what Catalyst does with the naive form anyway;
    stating the decorrelated plan makes the cost explicit)."""
    orders = _t(spark, sf, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        _dec_sum(F.col("o_totalprice"), "total_spend")
    )
    avg_spend = per_cust.agg(
        F.round(F.avg("total_spend"), 4).alias("avg_spend")
    )
    return (
        per_cust.join(F.broadcast(avg_spend), F.lit(True), "inner")
        .filter(F.col("total_spend") > 2 * F.col("avg_spend"))
        .select("o_custkey", "total_spend")
    )


SQL_BIG_SPENDERS = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_spend
  FROM orders GROUP BY 1),
a AS (SELECT round(avg(total_spend), 4) AS avg_spend FROM per_cust)
SELECT o_custkey, total_spend
FROM per_cust, a WHERE total_spend > 2 * avg_spend
"""


def q_scd2_temporal_join(spark, sf):
    """Fact-to-SCD2-dimension temporal enrichment
    (operators/temporal.py scd2_temporal_join): each 'click' fact picks
    up the user's dimension version (latest signup/purchase state) valid
    AT the click's log position, with delete-closed intervals — a click
    after the user's 'error' (delete) and before any rebirth gets NULL
    attributes, which a naive as-of join would wrongly backfill with the
    stale pre-delete version. Single union+window shuffle, no range join,
    no interval materialization."""
    from relational_data_loader_spark.operators.temporal import scd2_temporal_join

    ev = _t(spark, sf, "events")
    dim = ev.filter(F.col("event_type").isin("signup", "purchase", DELETE_OP)).select(
        "user_id", "event_id", "event_type", F.col("value").alias("dim_value")
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("fact_lsn")
    )
    return scd2_temporal_join(
        facts,
        dim,
        keys=["user_id"],
        fact_lsn_col="fact_lsn",
        dim_lsn_col="event_id",
        dim_attr_cols=["dim_value"],
        dim_op_col="event_type",
        delete_op=DELETE_OP,
    )


SQL_SCD2_TEMPORAL_JOIN = f"""
WITH dim AS (
  SELECT user_id, event_id AS dlsn, event_type AS op, value AS dval
  FROM events WHERE event_type IN ('signup', 'purchase', '{DELETE_OP}')),
facts AS (
  SELECT user_id, event_id AS fact_lsn FROM events WHERE event_type = 'click')
SELECT f.user_id, f.fact_lsn,
       CASE WHEN d.op IS NOT NULL AND d.op <> '{DELETE_OP}'
            THEN d.dlsn END AS dim_lsn,
       CASE WHEN d.op IS NOT NULL AND d.op <> '{DELETE_OP}'
            THEN d.dval END AS dim_value,
       coalesce(d.op IS NOT NULL AND d.op <> '{DELETE_OP}', FALSE) AS dim_live
FROM facts f
ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.fact_lsn >= d.dlsn
"""


def q_fk_orphan_audit(spark, sf):
    """Referential-integrity audit (operators/integrity.py
    fk_orphan_audit) over the replicated star schema: per FK edge, one
    left join + one aggregate classifies every child row (total / NULL-FK
    / orphan / distinct orphan keys / orphan ratio). The cross-table DQ
    check a multi-table CDC destination schedules, since child rows can
    land before parents without a consistent cut."""
    from relational_data_loader_spark.operators.integrity import (
        FkRelation,
        fk_orphan_audit,
    )

    rels = [
        FkRelation(
            "lineitem.l_orderkey->orders",
            _t(spark, sf, "lineitem"), "l_orderkey",
            _t(spark, sf, "orders"), "o_orderkey",
        ),
        FkRelation(
            "orders.o_custkey->customer",
            _t(spark, sf, "orders"), "o_custkey",
            _t(spark, sf, "customer"), "c_custkey",
        ),
        FkRelation(
            "customer.c_nationkey->nation",
            _t(spark, sf, "customer"), "c_nationkey",
            _t(spark, sf, "nation"), "n_nationkey",
        ),
        FkRelation(
            "lineitem.l_partkey->part",
            _t(spark, sf, "lineitem"), "l_partkey",
            _t(spark, sf, "part"), "p_partkey",
        ),
        FkRelation(
            "lineitem.l_suppkey->supplier",
            _t(spark, sf, "lineitem"), "l_suppkey",
            _t(spark, sf, "supplier"), "s_suppkey",
        ),
    ]
    return fk_orphan_audit(spark, rels)


def _fk_audit_sql_one(name, child, ck, parent, pk):
    return f"""
SELECT '{name}' AS relation,
       count(*) AS child_rows,
       count(*) FILTER (WHERE c.{ck} IS NULL) AS null_fk_rows,
       count(*) FILTER (WHERE c.{ck} IS NOT NULL AND p._hit IS NULL)
         AS orphan_rows,
       count(DISTINCT CASE WHEN c.{ck} IS NOT NULL AND p._hit IS NULL
                           THEN c.{ck} END) AS orphan_keys,
       round(count(*) FILTER (WHERE c.{ck} IS NOT NULL AND p._hit IS NULL)
             / greatest(count(*) FILTER (WHERE c.{ck} IS NOT NULL), 1), 4)
         AS orphan_ratio
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} AS k, 1 AS _hit FROM {parent}) p
  ON c.{ck} = p.k
"""


SQL_FK_ORPHAN_AUDIT = " UNION ALL ".join(
    _fk_audit_sql_one(*args)
    for args in [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
)


def q_event_transition_matrix(spark, sf):
    """First-order Markov transitions over per-user event sequences
    (operators/events.py event_transition_matrix): one lag window on the
    user key + one groupBy over the tiny (types x types) domain; row
    probabilities normalize over that control-plane-sized frame."""
    from relational_data_loader_spark.operators.events import (
        event_transition_matrix,
    )

    return event_transition_matrix(_t(spark, sf, "events"))


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
t AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n_transitions,
       round(n_transitions / sum(n_transitions)
               OVER (PARTITION BY prev_type), 4) AS prob
FROM t
"""


def q_timeseries_gapfill(spark, sf):
    """Calendar-spine densification (operators/temporal.py
    calendar_gapfill): one row per day between the data's min and max,
    event counts zero-filled and the daily average value forward-filled
    across silent days. Input collapses to one row per day first; the
    spine comes from a 1-row min/max aggregate via sequence (control
    plane); the ffill window runs over the calendar-sized single
    partition (safe by construction — row count is days, not events)."""
    from relational_data_loader_spark.operators.temporal import calendar_gapfill

    ev = _t(spark, sf, "events")
    filled = calendar_gapfill(
        ev,
        ts_col="ts",
        agg_exprs=[
            F.count(F.lit(1)).alias("n_raw"),
            F.round(F.avg("value"), 4).alias("day_avg"),
        ],
        carry_cols=["day_avg"],
        grain="day",
    )
    return filled.select(
        F.col("bucket").alias("day"),
        F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_events"),
        "day_avg",
        F.col("day_avg_ffill").alias("carried_avg"),
    )


SQL_TIMESERIES_GAPFILL = """
WITH b AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
  FROM events),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
d AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n,
         round(avg(value), 4) AS day_avg
  FROM events GROUP BY 1)
SELECT s.day, coalesce(d.n, 0) AS n_events, d.day_avg,
       last_value(d.day_avg IGNORE NULLS)
         OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS carried_avg
FROM spine s LEFT JOIN d ON s.day = d.day
"""


def q_late_shipment_priorities(spark, sf):
    """TPC-H Q4 shape: orders in a quarter having AT LEAST ONE lineitem
    shipped >60 days after the order date, counted per priority. The
    EXISTS becomes a LEFT SEMI join with the lateness predicate inside
    the join condition — each order emits at most once regardless of how
    many late lines it has (no post-join distinct), and the date filter
    prunes the orders scan."""
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = _t(spark, sf, "lineitem")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days"))
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_orders"))
    )


SQL_LATE_SHIPMENTS = """
SELECT o_orderpriority, count(*) AS late_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


def q_doc_chunking(spark, sf):
    """RAG/window chunking (operators/chunking.py chunk_documents):
    64-token windows, 16-token overlap, sliding-window starts while
    start < n_tokens. Narrow map, no shuffle; the md5 stands in for the
    chunk payload in the compare."""
    from relational_data_loader_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf, "documents"), chunk_tokens=64, overlap_tokens=16
    ).drop("chunk_text")


SQL_DOC_CHUNKING = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(text, '\s+', ' ', 'g'), ' ') AS tk
  FROM documents),
t2 AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
st AS (
  SELECT doc_id, tk, n,
         unnest(generate_series(0, CAST(floor((n - 1) / 48) AS BIGINT) * 48,
                                48)) AS start
  FROM t2)
SELECT doc_id,
       CAST(start / 48 AS INT) AS chunk_idx,
       CAST(start AS INT) AS start_tok,
       CAST(least(64, n - start) AS INT) AS n_tokens,
       md5(array_to_string(list_slice(tk, start + 1, start + 64), ' '))
         AS chunk_md5
FROM st
"""


def q_quality_curriculum_sample(spark, sf):
    """Quality-curriculum downsampling (operators/sampling.py
    curriculum_sample): score = distinct-token ratio (a lexical-diversity
    quality proxy, 4dp), equi-width decile bucket on [0,1], keep
    probability (bucket+1)/10 drawn from the doc's own content hash —
    high-quality docs survive, boilerplate-heavy ones are thinned.
    Filter-only plan, deterministic under retries/repartitioning."""
    from relational_data_loader_spark.operators.sampling import curriculum_sample

    docs = _t(spark, sf, "documents")
    toks = F.split(F.regexp_replace(F.col("text"), r"\s+", " "), " ")
    score = F.size(F.array_distinct(toks)) / F.size(toks)
    return curriculum_sample(
        docs.select("doc_id", "text"), score, key_col="doc_id"
    ).select("doc_id", "score", "bucket")


SQL_CURRICULUM_SAMPLE = r"""
WITH s AS (
  SELECT doc_id,
         round(len(list_distinct(string_split(
                 regexp_replace(text, '\s+', ' ', 'g'), ' ')))
               / len(string_split(
                 regexp_replace(text, '\s+', ' ', 'g'), ' ')), 4) AS score
  FROM documents),
b AS (
  SELECT doc_id, score,
         CAST(least(9, floor(score * 10)) AS INT) AS bucket
  FROM s)
SELECT doc_id, score, bucket
FROM b
WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0
      < (bucket + 1) / 10.0
"""


def q_minhash_estimate_audit(spark, sf):
    """Sketch-accuracy audit (operators/dedup.py minhash_estimate_audit):
    MinHash Jaccard estimate (8-component agreement) vs exact token-set
    Jaccard per LSH candidate pair, with absolute error — candidates
    only, posting list computed once. Same doc_id < 500 visible cap as
    near_dup_pairs (this synthetic corpus is near-dup-saturated;
    candidates grow ~quadratically with the cap)."""
    from relational_data_loader_spark.operators.dedup import (
        minhash_estimate_audit,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return minhash_estimate_audit(docs, "text", "doc_id")


SQL_MINHASH_AUDIT = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < 500),
sigs AS (
  SELECT doc_id,
    min(md5('a' || tok)) AS h_a, min(md5('b' || tok)) AS h_b,
    min(md5('c' || tok)) AS h_c, min(md5('d' || tok)) AS h_d,
    min(md5('e' || tok)) AS h_e, min(md5('f' || tok)) AS h_f,
    min(md5('g' || tok)) AS h_g, min(md5('h' || tok)) AS h_h
  FROM toks GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h_a || h_b) AS band1, md5(h_c || h_d) AS band2,
         md5(h_e || h_f) AS band3, md5(h_g || h_h) AS band4
  FROM sigs),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band4 = b.band4 AND a.doc_id < b.doc_id
  )),
est AS (
  SELECT c.doc_a, c.doc_b,
         ((sa.h_a = sb.h_a)::INT + (sa.h_b = sb.h_b)::INT
          + (sa.h_c = sb.h_c)::INT + (sa.h_d = sb.h_d)::INT
          + (sa.h_e = sb.h_e)::INT + (sa.h_f = sb.h_f)::INT
          + (sa.h_g = sb.h_g)::INT + (sa.h_h = sb.h_h)::INT) / 8.0 AS e
  FROM cand c
  JOIN sigs sa ON c.doc_a = sa.doc_id
  JOIN sigs sb ON c.doc_b = sb.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2),
exact AS (
  SELECT i.doc_a, i.doc_b, i.i / (sa.sz + sb.sz - i.i) AS x
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id)
SELECT e.doc_a, e.doc_b,
       round(e.e, 4) AS est_jaccard,
       round(coalesce(x.x, 0.0), 4) AS exact_jaccard,
       round(abs(e.e - coalesce(x.x, 0.0)), 4) AS abs_err
FROM est e
LEFT JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
"""


def q_winsorized_stats(spark, sf):
    """Robust per-group moments (operators/events.py winsorized_stats):
    values clipped to the group's exact [p05, p95] fences, then
    mean/stddev — two partial-agged shuffles, fences broadcast back."""
    from relational_data_loader_spark.operators.events import winsorized_stats

    return winsorized_stats(_t(spark, sf, "events"))


SQL_WINSORIZED = """
WITH fences AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY 1)
SELECT e.event_type, count(*) AS n,
       round(avg(least(greatest(e.value, f.lo), f.hi)), 4) AS wins_mean,
       round(stddev(least(greatest(e.value, f.lo), f.hi)), 4) AS wins_std,
       round(any_value(f.lo), 4) AS lo_fence,
       round(any_value(f.hi), 4) AS hi_fence
FROM events e JOIN fences f USING (event_type)
GROUP BY 1
"""


def q_period_over_period(spark, sf):
    """Month-over-month revenue growth: the reporting dual of
    calendar_gapfill — monthly totals (one partial-agged groupBy on the
    calendar-sized month domain), then lag + growth ratio over that tiny
    frame's single partition (safe by construction: rows = months)."""
    orders = _t(spark, sf, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(_dec_sum(F.col("o_totalprice"), "revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 4).alias("mom_growth"),
    )


SQL_PERIOD_OVER_PERIOD = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1)
SELECT month, revenue,
       lag(revenue) OVER (ORDER BY month) AS prev_revenue,
       round((revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 4) AS mom_growth
FROM m
"""


def q_customer_order_distribution(spark, sf):
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers (the left outer join is the point —
    an inner join silently drops the empty cohort). Double aggregation:
    per-customer counts (shuffle on the customer key), then the
    control-plane-sized histogram over counts."""
    cust = _t(spark, sf, "customer").select("c_custkey")
    orders = _t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQL_CUSTDIST = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
GROUP BY 1
"""


def q_doc_novelty(spark, sf):
    """Per-document corpus-contribution score (operators/contamination.py
    doc_novelty): fraction of the doc's distinct 3-grams no lower-id doc
    contains. Inverted-index shape: one groupBy(ngram) min, one
    posting-sized join, one groupBy(doc)."""
    from relational_data_loader_spark.operators.contamination import doc_novelty

    return doc_novelty(_t(spark, sf, "documents"), "text", "doc_id", n=3)


SQL_DOC_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS ngram
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        FROM toks)),
first AS (SELECT ngram, min(doc_id) AS first_doc FROM ng GROUP BY 1)
SELECT ng.doc_id, count(*) AS n_ngrams,
       count(*) FILTER (WHERE f.first_doc = ng.doc_id) AS novel_ngrams,
       round(count(*) FILTER (WHERE f.first_doc = ng.doc_id)
             / CAST(count(*) AS DOUBLE), 4) AS novelty
FROM ng JOIN first f USING (ngram)
GROUP BY 1
"""


def q_cross_source_overlap(spark, sf):
    """Exact-dup overlap between sources (operators/dedup.py
    cross_source_overlap): distinct (fingerprint, source) first, then a
    fingerprint self-join whose fan-out is bounded by the SOURCE domain
    per fingerprint, never by copy counts."""
    from relational_data_loader_spark.operators.dedup import cross_source_overlap

    return cross_source_overlap(
        _t(spark, sf, "documents"), "text", "doc_id", "source"
    )


SQL_CROSS_SOURCE_OVERLAP = r"""
WITH fs AS (
  SELECT DISTINCT
         md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
         source AS src
  FROM documents)
SELECT a.src AS source_a, b.src AS source_b,
       count(*) AS shared_fingerprints
FROM fs a JOIN fs b ON a.fp = b.fp AND a.src <= b.src
GROUP BY 1, 2
"""


def q_embedding_norm_audit(spark, sf):
    """Embedding-column DQ gate (operators/similarity.py
    embedding_norm_audit): nulls, zero vectors, dimension drift, L2-norm
    distribution — one codegen pass, 1-row reduce."""
    from relational_data_loader_spark.operators.similarity import (
        embedding_norm_audit,
    )

    return embedding_norm_audit(_t(spark, sf, "embeddings"))


SQL_EMBEDDING_NORM_AUDIT = """
WITH n AS (
  SELECT embedding,
         CASE WHEN embedding IS NOT NULL THEN
           sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         END AS norm,
         len(embedding) AS dim
  FROM embeddings)
SELECT count(*) AS n_rows,
       count(*) FILTER (WHERE embedding IS NULL) AS null_vectors,
       count(*) FILTER (WHERE norm = 0.0) AS zero_vectors,
       count(DISTINCT dim) AS distinct_dims,
       round(avg(norm), 4) AS mean_norm,
       round(min(norm), 4) AS min_norm,
       round(max(norm), 4) AS max_norm
FROM n
"""


def q_large_orders(spark, sf):
    """TPC-H Q18 shape (HAVING + join-back): orders whose total quantity
    crosses a threshold, enriched from both dimensions, top-100. The
    aggregate runs FIRST on the narrow (orderkey, quantity) projection;
    only the surviving ~1% of orders join back to their payload rows —
    never the reverse order. Quantity sums are exact (integral values,
    double-exact far below 2^53). Sort is a TakeOrderedAndProject."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


SQL_LARGE_ORDERS = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) b
JOIN orders ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_small_quantity_revenue(spark, sf):
    """TPC-H Q17 shape (correlated aggregate, decorrelated): average
    yearly revenue lost if small-quantity orders (below 20% of the
    part's own average quantity) moved to bulk. The per-row correlated
    subquery becomes ONE per-part aggregate joined back — each part's
    average is computed once, not once per lineitem. The avg comparison
    is FP-safe across engines: integral quantities make sum and count
    exact, so sum/count and the 0.2 scaling are bit-identical IEEE ops."""
    li = _t(spark, sf, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


SQL_SMALL_QTY_REVENUE = """
WITH pp AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
            FROM lineitem GROUP BY 1)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM lineitem JOIN pp USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
"""


def q_bigram_surprisal(spark, sf):
    """Conditional LM quality scoring: per-document mean bigram surprisal
    −avg ln p(cur|prev), with p(cur|prev) = corpus bigram count /
    corpus context count — the first-order upgrade of unigram_surprisal
    (a doc of common words in IMPOSSIBLE orders now scores high, where
    the unigram model is blind to order). Bigrams are extracted
    shuffle-free (array transform over token positions — no per-doc
    window); then two partial-agged counts and posting-sized joins.
    Hot context words skew the ctx join key; that is plain join skew —
    AQE's skew split handles it, no bucket cap needed. Same doc_id <
    1000 visible cap as unigram_surprisal, both engines."""
    from relational_data_loader_spark.functions.text import _one_to_one, tokens

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    bg = (
        docs.select("doc_id", _one_to_one(tokens(F.col("text")), "_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS prev, _toks[i] AS cur))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.prev", "bg.cur")
    )
    bgc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_ctx"))
    return (
        bg.join(bgc, ["prev", "cur"])
        .join(ctx, "prev")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(-F.log(F.col("c_bg") / F.col("c_ctx"))), 4
            ).alias("bigram_surprisal"),
        )
    )


SQL_BIGRAM_SURPRISAL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents WHERE doc_id < 1000),
bg AS (
  SELECT doc_id, ts[i-1] AS prev, ts[i] AS cur
  FROM (SELECT doc_id, ts, unnest(generate_series(2, len(ts))) AS i
        FROM toks)),
bgc AS (SELECT prev, cur, count(*) AS c_bg FROM bg GROUP BY 1, 2),
ctx AS (SELECT prev, count(*) AS c_ctx FROM bg GROUP BY 1)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(-ln(c_bg / c_ctx)), 4) AS bigram_surprisal
FROM bg JOIN bgc USING (prev, cur) JOIN ctx USING (prev)
GROUP BY 1
"""


def q_daily_rate_anomaly(spark, sf):
    """Change-feed volume monitor (operators/events.py
    daily_rate_anomaly): per (event_type, day) counts z-scored against
    the type's own daily history; z rounded before the threshold compare
    on both engines."""
    from relational_data_loader_spark.operators.events import daily_rate_anomaly

    return daily_rate_anomaly(_t(spark, sf, "events"))


SQL_DAILY_RATE_ANOMALY = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2),
z AS (
  SELECT event_type, day, n_events,
         avg(n_events) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(n_events) OVER (PARTITION BY event_type) AS sigma
  FROM d)
SELECT event_type, day, n_events,
       CAST(round((n_events - mu) / sigma, 3) AS DOUBLE) AS z,
       abs(round((n_events - mu) / sigma, 3)) > 2.0 AS is_anomaly
FROM z WHERE sigma > 0
"""


def q_funnel_latency(spark, sf):
    """Conversion-time SLA report (operators/events.py funnel_latency):
    first signup → first subsequent purchase per user, reduced to
    conversion counts + exact latency quantiles (integral seconds, so
    percentile interpolation is engine-exact)."""
    from relational_data_loader_spark.operators.events import funnel_latency

    return funnel_latency(_t(spark, sf, "events"), "signup", "purchase")


SQL_FUNNEL_LATENCY = """
WITH f AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1),
conv AS (
  SELECT f.user_id, date_diff('second', f.t0, min(e.ts)) AS latency_s
  FROM f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase'
   AND e.ts >= f.t0
  GROUP BY 1, f.t0),
s AS (SELECT count(*) AS n_started FROM f),
c AS (SELECT count(*) AS n_converted,
             round(quantile_cont(latency_s, 0.5), 4) AS p50_latency_s,
             round(quantile_cont(latency_s, 0.9), 4) AS p90_latency_s
      FROM conv)
SELECT s.n_started, c.n_converted,
       round(c.n_converted / CAST(s.n_started AS DOUBLE), 4)
         AS conversion_rate,
       c.p50_latency_s, c.p90_latency_s
FROM s, c
"""


def q_per_group_sample(spark, sf):
    """Fixed-size per-stratum panel (operators/sampling.py
    per_group_sample): 20 events per type, smallest content-hash
    uniforms win — stable under corpus growth, one top-k window
    (WindowGroupLimit bounds per-task state)."""
    from relational_data_loader_spark.operators.sampling import per_group_sample

    return per_group_sample(
        _t(spark, sf, "events"), group_col="event_type",
        key_col="event_id", k=20,
    )


SQL_PER_GROUP_SAMPLE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM (SELECT *,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(concat('0x', substring(
                          md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        / 4294967296.0,
                        event_id) AS rn
      FROM events)
WHERE rn <= 20
"""


# --------------------------------------------------------------------------
# vocabulary induction + character-level dedup + quantized ANN (session 4)

# the LSH candidate CTE chain shared by SQL_NEAR_DUP's family, factored for
# the new char-level verifier (SQL_NEAR_DUP itself is frozen — driver-green);
# {cap} is the doc_id slice bound
_LSH_CAND_CTES_TMPL = r"""
toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents WHERE doc_id < {cap}),
sigs AS (
  SELECT doc_id,
    min(md5('a' || tok)) AS h_a, min(md5('b' || tok)) AS h_b,
    min(md5('c' || tok)) AS h_c, min(md5('d' || tok)) AS h_d,
    min(md5('e' || tok)) AS h_e, min(md5('f' || tok)) AS h_f,
    min(md5('g' || tok)) AS h_g, min(md5('h' || tok)) AS h_h
  FROM toks GROUP BY doc_id),
bands AS (
  SELECT doc_id, md5(h_a || h_b) AS band1, md5(h_c || h_d) AS band2,
         md5(h_e || h_f) AS band3, md5(h_g || h_h) AS band4
  FROM sigs),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band2 = b.band2 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band3 = b.band3 AND a.doc_id < b.doc_id
    UNION ALL
    SELECT a.doc_id, b.doc_id
      FROM bands a JOIN bands b ON a.band4 = b.band4 AND a.doc_id < b.doc_id
  ))
"""


def q_edit_distance_near_dup(spark, sf):
    """Character-level near-dup verification over LSH candidates
    (operators/dedup.py edit_distance_near_dup): normalized Levenshtein
    similarity catches retokenized duplicates that token-set Jaccard
    misses. doc_id < 300 (tighter than the near_dup family's 500: this
    corpus is near-dup-saturated, so candidates grow ~quadratically with
    the slice, and Levenshtein's per-pair cost is ~50× a Jaccard verify);
    trunc_len=600 covers every doc in this corpus (max 553 chars) while
    keeping the banded cap at 120 instead of 400. The JVM side uses the
    threshold-banded levenshtein (exactness argument in the operator
    docstring), the oracle the unbounded one — identical output.
    """
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return edit_distance_near_dup(
        docs, "text", "doc_id", threshold=0.8, trunc_len=600
    )


SQL_EDIT_DISTANCE_NEAR_DUP = f"""
WITH {_LSH_CAND_CTES_TMPL.format(cap=300)},
texts AS (SELECT doc_id, substring(text, 1, 600) AS txt
          FROM documents WHERE doc_id < 300)
SELECT doc_a, doc_b,
       CAST(round(1.0 - levenshtein(ta.txt, tb.txt)
                  / CAST(greatest(length(ta.txt), length(tb.txt), 1) AS DOUBLE),
                  4) AS DOUBLE) AS edit_sim
FROM cand
JOIN texts ta ON doc_a = ta.doc_id
JOIN texts tb ON doc_b = tb.doc_id
WHERE 1.0 - levenshtein(ta.txt, tb.txt)
      / CAST(greatest(length(ta.txt), length(tb.txt), 1) AS DOUBLE) >= 0.8
"""


def q_bpe_merge_candidates(spark, sf):
    """BPE trainer's first-iteration argmax table (operators/vocab.py
    bpe_merge_candidates): word-frequency-weighted adjacent char-pair
    counts, aggregated at the distinct-word level (|vocab| rows, not
    |corpus|)."""
    return bpe_merge_candidates(_t(spark, sf, "documents"), "text", k=50)


SQL_BPE_MERGE = r"""
WITH words AS (
  SELECT unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS w
  FROM documents),
wf AS (SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w),
pairs AS (
  SELECT substring(w, CAST(i AS INT), 2) AS pair, f
  FROM (SELECT w, f, unnest(range(1, length(w))) AS i
        FROM wf WHERE length(w) >= 2)),
pc AS (SELECT pair, CAST(sum(f) AS BIGINT) AS pair_count FROM pairs GROUP BY pair)
SELECT pair, pair_count,
       CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rk
FROM pc
QUALIFY rk <= 50
"""


def q_vocab_coverage(spark, sf):
    """Token-occurrence coverage of the top-N word vocab for several N
    (operators/vocab.py vocab_coverage) — the curve that sizes a
    word-level vocabulary."""
    return vocab_coverage(
        _t(spark, sf, "documents"), "text", cutoffs=[10, 50, 100, 500]
    )


SQL_VOCAB_COVERAGE = r"""
WITH words AS (
  SELECT unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS w
  FROM documents),
wf AS (SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w),
ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk FROM wf)
SELECT CAST(v.n AS INT) AS vocab_size,
       CAST(sum(CASE WHEN rk <= v.n THEN f ELSE 0 END) AS BIGINT) AS covered_tokens,
       CAST(sum(f) AS BIGINT) AS total_tokens,
       CAST(round(sum(CASE WHEN rk <= v.n THEN f ELSE 0 END) * 1.0 / sum(f), 4)
            AS DOUBLE) AS coverage
FROM ranked CROSS JOIN (VALUES (10), (50), (100), (500)) v(n)
GROUP BY v.n
"""

# SQ8 dequantization in DuckDB list algebra — arithmetic mirrors
# operators/similarity.py sq8_dequantized_expr op-for-op (same evaluation
# order, all double), so codes agree bit-for-bit before the 3dp round
_SQ8_DEQ_CTES = """
c0 AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS e FROM embeddings),
cs AS (SELECT c_id, e,
              CASE WHEN m = 0.0 THEN 1.0 ELSE m END AS s
       FROM (SELECT c_id, e,
                    list_aggregate(list_transform(e, x -> abs(x)), 'max') AS m
             FROM c0)),
cq AS (SELECT c_id,
              list_transform(e, x -> floor(x * 127.0 / s + 0.5) * s / 127.0)
                AS c_emb
       FROM cs)
"""


def q_sq8_cosine_topk(spark, sf):
    """Asymmetric SQ8 search (operators/similarity.py sq8_cosine_topk):
    exact queries vs int8-quantized candidates — the 4×-compressed index's
    actual ranking."""
    emb = _t(spark, sf, "embeddings")
    return sq8_cosine_topk(emb.filter(F.col("vec_id") < 5), emb, k=5)


SQL_SQ8_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 5),
{_SQ8_DEQ_CTES},
sims AS (
  SELECT q_id, c_id,
         CAST(round(list_cosine_similarity(q_emb, c_emb), 3) AS DOUBLE) AS sim
  FROM q CROSS JOIN cq WHERE q_id <> c_id)
SELECT q_id, c_id, sim
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) rk
      FROM sims)
WHERE rk <= 5
"""


def q_sq8_recall_audit(spark, sf):
    """Recall@5 of SQ8 search vs the exact float index per query
    (operators/similarity.py sq8_recall_audit) — the compression-quality
    audit row."""
    emb = _t(spark, sf, "embeddings")
    return sq8_recall_audit(emb.filter(F.col("vec_id") < 5), emb, k=5)


SQL_SQ8_RECALL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 5),
{_SQ8_DEQ_CTES},
exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY CAST(round(list_cosine_similarity(q_emb, c0.e), 3)
                           AS DOUBLE) DESC, c_id) rk
    FROM q CROSS JOIN c0 WHERE q_id <> c_id)
  WHERE rk <= 5),
approx AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY CAST(round(list_cosine_similarity(q_emb, c_emb), 3)
                           AS DOUBLE) DESC, c_id) rk
    FROM q CROSS JOIN cq WHERE q_id <> c_id)
  WHERE rk <= 5)
SELECT e.q_id,
       CAST(round(count(a.c_id) * 1.0 / 5, 4) AS DOUBLE) AS recall_at_k
FROM exact e
LEFT JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
GROUP BY e.q_id
"""


def q_zorder_file_stats(spark, sf):
    """Z-order layout audit (operators/layout.py zorder_file_stats):
    deterministic Morton-code file assignment over (l_orderkey,
    l_suppkey) and the per-file min/max extents data-skipping reads —
    the stats table behind an OPTIMIZE ... ZORDER BY decision."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return zorder_file_stats(
        li, ["l_orderkey", "l_suppkey"], bits=8, n_files=64
    )


def _zorder_interleave_sql(nd: int, bits: int) -> str:
    """The Morton interleave as DuckDB bit algebra — term-for-term the
    same shifts zorder_code_expr unrolls (bit j of dim d → j·nd + d)."""
    return " | ".join(
        f"(((b{d} >> {j}) & 1) << {j * nd + d})"
        for d in range(nd)
        for j in range(bits)
    )


# bits=8, 2 dims → 16-bit z-code; 64 files → file_id = zcode >> 10
_SQL_ZORDER_STATS_BODY = f"""
r AS (SELECT min(l_orderkey) AS mn0, max(l_orderkey) AS mx0,
             min(l_suppkey) AS mn1, max(l_suppkey) AS mx1
      FROM lineitem),
b AS (SELECT l_orderkey, l_suppkey,
        greatest(0, least(255, ((l_orderkey - mn0) * 256) // (mx0 - mn0 + 1))) AS b0,
        greatest(0, least(255, ((l_suppkey - mn1) * 256) // (mx1 - mn1 + 1))) AS b1
      FROM lineitem, r),
z AS (SELECT l_orderkey, l_suppkey,
             ({_zorder_interleave_sql(2, 8)}) AS zcode
      FROM b)
"""

SQL_ZORDER_FILE_STATS = f"""
WITH {_SQL_ZORDER_STATS_BODY}
SELECT CAST(zcode >> 10 AS INT) AS file_id,
       count(*) AS n_rows,
       min(l_orderkey) AS min_l_orderkey, max(l_orderkey) AS max_l_orderkey,
       min(l_suppkey) AS min_l_suppkey, max(l_suppkey) AS max_l_suppkey
FROM z GROUP BY 1
"""


def q_zorder_skipping_gain(spark, sf):
    """The one-row-per-dimension justification for z-ordering
    (operators/layout.py zorder_skipping_gain): mean normalized per-file
    span of each column under the z-order assignment vs a linear sort on
    the leading column — span_ratio < 1 on the non-leading column is the
    multi-column data-skipping win."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    return zorder_skipping_gain(
        li, ["l_orderkey", "l_suppkey"], bits=8, n_files=64
    )


SQL_ZORDER_GAIN = f"""
WITH {_SQL_ZORDER_STATS_BODY},
zstats AS (
  SELECT CAST(zcode >> 10 AS INT) AS file_id,
         min(l_orderkey) AS min0, max(l_orderkey) AS max0,
         min(l_suppkey) AS min1, max(l_suppkey) AS max1
  FROM z GROUP BY 1),
lstats AS (
  SELECT CAST(b0 >> 2 AS INT) AS file_id,
         min(l_orderkey) AS min0, max(l_orderkey) AS max0,
         min(l_suppkey) AS min1, max(l_suppkey) AS max1
  FROM b GROUP BY 1),
doms AS (SELECT (mx0 - mn0 + 1) * 1.0 AS dom0, (mx1 - mn1 + 1) * 1.0 AS dom1 FROM r),
zm AS (SELECT avg((max0 - min0 + 1) / dom0) AS s0, avg((max1 - min1 + 1) / dom1) AS s1
       FROM zstats, doms),
lm AS (SELECT avg((max0 - min0 + 1) / dom0) AS s0, avg((max1 - min1 + 1) / dom1) AS s1
       FROM lstats, doms)
SELECT 'l_orderkey' AS col_name,
       CAST(round(zm.s0, 4) AS DOUBLE) AS zorder_span,
       CAST(round(lm.s0, 4) AS DOUBLE) AS linear_span,
       CAST(round(zm.s0 / lm.s0, 4) AS DOUBLE) AS span_ratio
FROM zm, lm
UNION ALL
SELECT 'l_suppkey',
       CAST(round(zm.s1, 4) AS DOUBLE),
       CAST(round(lm.s1, 4) AS DOUBLE),
       CAST(round(zm.s1 / lm.s1, 4) AS DOUBLE)
FROM zm, lm
"""


def q_cms_frequency_audit(spark, sf):
    """Count-min sketch audit (operators/sketch.py cms_frequency_audit):
    top-30 corpus tokens by exact count next to their d=4/w=256 CM
    estimates — the bounded-state (d·w cells), mergeable heavy-hitter
    counter and the overestimate it costs."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "), " ")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    return cms_frequency_audit(toks, "tok", k=30, d=4, w=256)


def _cms_cell_sql(salt: str) -> str:
    return (
        f"CAST(CAST(concat('0x', substring(md5('{salt}' || tok), 1, 8)) "
        f"AS BIGINT) % 256 AS INT)"
    )


SQL_CMS_AUDIT = f"""
WITH tk AS (
  SELECT tok FROM (
    SELECT unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents)
  WHERE tok <> ''),
exact AS (SELECT tok, count(*) AS exact_count FROM tk GROUP BY tok),
topk AS (
  SELECT tok, exact_count FROM (
    SELECT *, row_number() OVER (ORDER BY exact_count DESC, tok) AS rk
    FROM exact)
  WHERE rk <= 30),
cells AS (
  SELECT hash_row, cell, count(*) AS n FROM (
    SELECT 0 AS hash_row, {_cms_cell_sql('p')} AS cell FROM tk
    UNION ALL SELECT 1, {_cms_cell_sql('q')} FROM tk
    UNION ALL SELECT 2, {_cms_cell_sql('r')} FROM tk
    UNION ALL SELECT 3, {_cms_cell_sql('s')} FROM tk)
  GROUP BY 1, 2),
est AS (
  SELECT t.tok, least(
    coalesce((SELECT n FROM cells c WHERE c.hash_row = 0
              AND c.cell = {_cms_cell_sql('p').replace('tok', 't.tok')}), 0),
    coalesce((SELECT n FROM cells c WHERE c.hash_row = 1
              AND c.cell = {_cms_cell_sql('q').replace('tok', 't.tok')}), 0),
    coalesce((SELECT n FROM cells c WHERE c.hash_row = 2
              AND c.cell = {_cms_cell_sql('r').replace('tok', 't.tok')}), 0),
    coalesce((SELECT n FROM cells c WHERE c.hash_row = 3
              AND c.cell = {_cms_cell_sql('s').replace('tok', 't.tok')}), 0)
  ) AS cms_estimate
  FROM topk t)
SELECT t.tok, t.exact_count, e.cms_estimate,
       e.cms_estimate - t.exact_count AS overestimate
FROM topk t JOIN est e ON t.tok = e.tok
"""


def q_kmv_merge_rollup(spark, sf):
    """Sketch-rollup query (operators/sketch.py kmv_merge_rollup):
    per-day KMV sketches of distinct users per event type, merged to the
    period estimate WITHOUT rescanning raw rows — the merge is lossless
    (top-k of unioned top-k sets == top-k of the union), so the rolled-up
    estimate is exactly what a from-scratch period sketch would give."""
    from relational_data_loader_spark.operators.sketch import kmv_merge_rollup

    ev = _t(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("uid"),
    )
    return kmv_merge_rollup(ev, "event_type", "day", "uid", k=64)


SQL_KMV_MERGE_ROLLUP = r"""
WITH hashed AS (
  SELECT DISTINCT event_type AS g, CAST(ts AS DATE) AS unit,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 14))
              AS BIGINT) / 72057594037927936.0 AS u
  FROM events),
unit_sk AS (
  SELECT g, unit, u FROM (
    SELECT g, unit, u,
           row_number() OVER (PARTITION BY g, unit ORDER BY u) AS rk
    FROM hashed)
  WHERE rk <= 64),
units AS (SELECT g, count(DISTINCT unit) AS n_units FROM unit_sk GROUP BY g),
merged AS (
  SELECT g, u,
         row_number() OVER (PARTITION BY g ORDER BY u) AS rk
  FROM (SELECT DISTINCT g, u FROM unit_sk)
  QUALIFY rk <= 64),
est AS (
  SELECT g,
         CASE WHEN max(rk) < 64 THEN CAST(max(rk) AS DOUBLE)
              ELSE round(63.0 / max(u), 4) END AS n_estimate
  FROM merged GROUP BY g),
exact AS (
  SELECT g, count(*) AS n_exact
  FROM (SELECT DISTINCT g, u FROM hashed) GROUP BY g)
SELECT g AS event_type, n_units, n_exact, n_estimate,
       round((n_estimate - n_exact) / n_exact, 4) AS rel_error
FROM exact JOIN est USING (g) JOIN units USING (g)
"""


def q_salted_join_rollup(spark, sf):
    """Skew-safe fact-to-dim join (operators/skew.py salted_join): events
    enriched with the customer dim via targeted hot-key salting — hot
    fact keys spread over 8 salt reducers, ONLY their dim rows replicated
    to meet them — then revenue by market segment. The oracle is the
    PLAIN join+rollup, so the driver compare IS the proof that salting
    changes the plan, never the result. Hot keys come from the engine's
    own probe (full-scan deterministic path at this size)."""
    from relational_data_loader_spark.operators.skew import (
        detect_hot_keys,
        salted_join,
    )

    ev = _t(spark, sf, "events")
    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot = [
        r["user_id"]
        for r in detect_hot_keys(
            ev, ["user_id"], threshold_frac=0.007, sample_fraction=1.0
        ).collect()
    ]
    joined = salted_join(
        ev, cust, "user_id", salt_buckets=8, hot_keys=hot,
        salt_source="event_id",
    )
    return joined.groupBy("c_mktsegment").agg(
        _dec_sum(F.col("value"), "total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SALTED_JOIN = """
SELECT c_mktsegment,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
"""


def q_pmi_collocations(spark, sf):
    """Collocation mining (operators/vocab.py pmi_collocations): top-40
    adjacent-word pairs by PMI over the bigram contingency table —
    phrase-vocabulary candidates. Same doc_id < 1000 cap as the bigram
    family."""
    from relational_data_loader_spark.operators.vocab import pmi_collocations

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    return pmi_collocations(docs, "text", min_count=5, k=40)


SQL_PMI_COLLOCATIONS = r"""
WITH toks AS (
  SELECT string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS ts
  FROM documents WHERE doc_id < 1000),
bg AS (
  SELECT ts[i-1] AS prev, ts[i] AS cur
  FROM (SELECT ts, unnest(generate_series(2, len(ts))) AS i FROM toks)),
bgc AS (SELECT prev, cur, count(*) AS c_bg FROM bg GROUP BY 1, 2),
lft AS (SELECT prev, count(*) AS c_prev FROM bg GROUP BY 1),
rgt AS (SELECT cur, count(*) AS c_cur FROM bg GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM bg),
scored AS (
  SELECT prev, cur, c_bg,
         CAST(round(ln((c_bg * n_total) / (c_prev * c_cur * 1.0)), 4)
              AS DOUBLE) AS pmi
  FROM bgc JOIN lft USING (prev) JOIN rgt USING (cur) CROSS JOIN tot
  WHERE c_bg >= 5)
SELECT prev, cur, c_bg, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, prev, cur) AS INT) AS rk
FROM scored
QUALIFY rk <= 40
"""


def q_volume_trend(spark, sf):
    """Volume-drift monitor: per event type, the least-squares slope and
    R² of daily event counts over the day index — the one-row-per-key
    answer to "is this feed growing, shrinking, or noisy?" that a
    staleness check (point-in-time) can't give. Exact arithmetic from
    the five classic sums (n, Σx, Σy, Σxx, Σxy) instead of engine
    regr_* built-ins, so both engines compute identical doubles before
    the 4dp round; day index is days since the type's own first day."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    x = F.datediff(
        F.col("day"), F.min("day").over(Window.partitionBy("event_type"))
    ).cast("double")
    d = daily.withColumn("x", x).withColumn("y", F.col("n").cast("double"))
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    # nullif guards the degenerate series (one day -> varx 0; constant
    # counts -> vary 0, where r2 is undefined): NULL, never a crash or an
    # ANSI divide-by-zero (caught by the constant-'flat' unit test)
    slope = cov / F.nullif(varx, F.lit(0.0))
    r2 = (cov * cov) / F.nullif(varx * vary, F.lit(0.0))
    return agg.select(
        "event_type",
        "n_days",
        F.round(slope, 4).cast("double").alias("slope_per_day"),
        F.round(r2, 4).cast("double").alias("r2"),
    )


SQL_VOLUME_TREND = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT event_type,
         CAST(date_diff('day', min(day) OVER (PARTITION BY event_type), day)
              AS DOUBLE) AS x,
         CAST(n AS DOUBLE) AS y
  FROM daily),
agg AS (
  SELECT event_type, count(*) AS n_days,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM idx GROUP BY 1)
SELECT event_type, n_days,
       CAST(round((sxy - sx * sy / n_days)
                  / nullif(sxx - sx * sx / n_days, 0), 4)
            AS DOUBLE) AS slope_per_day,
       CAST(round(((sxy - sx * sy / n_days) * (sxy - sx * sy / n_days))
                  / nullif((sxx - sx * sx / n_days)
                           * (syy - sy * sy / n_days), 0), 4)
            AS DOUBLE) AS r2
FROM agg
"""


def q_pagerank_docs(spark, sf):
    """Link-authority quality signal (operators/graph.py): PageRank over a
    deterministic hash-derived citation graph on the documents table —
    the corpus-curation weighting web-scale pipelines apply before
    sampling (CommonCrawl-lineage authority ranking). Five fixed power
    iterations, each one equi-join + one groupBy over the edge frame;
    dangling mass redistributed uniformly; authority scaled so 1.0 means
    "uniform / no signal"."""
    from relational_data_loader_spark.operators.graph import doc_authority

    docs = _t(spark, sf, "documents").select("doc_id")
    n = docs.count()
    return doc_authority(docs, n, out_degree=3, iterations=5, damping=0.85)


def _pagerank_sql(iterations: int = 5, damping: float = 0.85, k: int = 3) -> str:
    """DuckDB twin: the same k rounds unrolled as CTEs (fixed iteration
    count is what keeps the operator oracle-able)."""
    d = repr(damping)
    head = f"""
WITH nodes AS (SELECT doc_id AS id FROM documents),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT dd.doc_id AS src,
           CAST(concat('0x', substr(md5(concat(dd.doc_id, ':', j.j, ':link')),
                1, 14)) AS BIGINT) % (SELECT count(*) FROM nodes) AS dst
    FROM documents dd, (SELECT unnest(range({k})) AS j) j)
  WHERE src <> dst),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes)"""
    rounds = []
    for i in range(1, iterations + 1):
        p = i - 1
        rounds.append(f"""
dang{i} AS (
  SELECT coalesce(sum(pr), CAST(0 AS DOUBLE)) AS dm
  FROM r{p} LEFT JOIN deg ON r{p}.id = deg.src WHERE deg.src IS NULL),
r{i} AS (
  SELECT nodes.id,
         CAST(1.0 - {d} AS DOUBLE) / (SELECT n FROM nn)
         + CAST({d} AS DOUBLE) * (
             coalesce(c.contrib, CAST(0 AS DOUBLE))
             + (SELECT dm FROM dang{i}) / (SELECT n FROM nn)) AS pr
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, sum(r.pr / deg.deg) AS contrib
    FROM edges e JOIN r{p} r ON e.src = r.id JOIN deg ON deg.src = e.src
    GROUP BY e.dst) c ON nodes.id = c.id)""")
    return (
        head
        + ","
        + ",".join(rounds)
        + f"""
SELECT id AS doc_id,
       CAST(round(pr * (SELECT n FROM nn), 6) AS DOUBLE) AS authority
FROM r{iterations}
"""
    )


def q_hist_quantile_rollup(spark, sf):
    """Mergeable-quantile rollup (operators/sketch.py hist_quantile_rollup):
    per-day fixed-bin histograms of event value per type, merged to period
    p50/p95/p99 by elementwise addition — no rescan of raw rows — with an
    exact-percentile audit column bounding the sketch error. The
    deterministic, oracle-able stand-in for percentile_approx's t-digest
    at 100 TB."""
    from relational_data_loader_spark.operators.sketch import (
        hist_quantile_rollup,
    )

    ev = _t(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return hist_quantile_rollup(
        ev, "event_type", "day", "value", lo=0.0, hi=512.0, n_bins=128
    )


SQL_HIST_QUANTILE_ROLLUP = """
WITH base AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS unit, value AS v FROM events),
sk AS (
  SELECT g, unit,
         least(greatest(CAST(floor((v - CAST(0.0 AS DOUBLE)) / CAST(4.0 AS DOUBLE))
               AS BIGINT), 0), 127) AS bin,
         count(*) AS cnt
  FROM base GROUP BY 1, 2, 3),
units AS (SELECT g, count(DISTINCT unit) AS n_units FROM sk GROUP BY g),
merged AS (SELECT g, bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM sk GROUP BY 1, 2),
cum AS (
  SELECT g, bin, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY g) AS tot
  FROM merged),
est AS (
  SELECT g, CAST(max(tot) AS BIGINT) AS n_rows,
    CAST(round(max(CASE WHEN cum - cnt < ceil(CAST(0.5 AS DOUBLE) * tot)
                         AND cum >= ceil(CAST(0.5 AS DOUBLE) * tot)
      THEN CAST(0.0 AS DOUBLE) + CAST(4.0 AS DOUBLE) * (bin
           + CAST(ceil(CAST(0.5 AS DOUBLE) * tot) - (cum - cnt) AS DOUBLE) / cnt)
      END), 4) AS DOUBLE) AS p50_est,
    CAST(round(max(CASE WHEN cum - cnt < ceil(CAST(0.95 AS DOUBLE) * tot)
                         AND cum >= ceil(CAST(0.95 AS DOUBLE) * tot)
      THEN CAST(0.0 AS DOUBLE) + CAST(4.0 AS DOUBLE) * (bin
           + CAST(ceil(CAST(0.95 AS DOUBLE) * tot) - (cum - cnt) AS DOUBLE) / cnt)
      END), 4) AS DOUBLE) AS p95_est,
    CAST(round(max(CASE WHEN cum - cnt < ceil(CAST(0.99 AS DOUBLE) * tot)
                         AND cum >= ceil(CAST(0.99 AS DOUBLE) * tot)
      THEN CAST(0.0 AS DOUBLE) + CAST(4.0 AS DOUBLE) * (bin
           + CAST(ceil(CAST(0.99 AS DOUBLE) * tot) - (cum - cnt) AS DOUBLE) / cnt)
      END), 4) AS DOUBLE) AS p99_est
  FROM cum GROUP BY g),
exact AS (
  SELECT g, CAST(round(quantile_cont(v, 0.95), 4) AS DOUBLE) AS p95_exact
  FROM base GROUP BY g)
SELECT g AS event_type, n_units, n_rows, p50_est, p95_est, p99_est, p95_exact,
       CAST(round(abs(p95_est - p95_exact), 4) AS DOUBLE) AS p95_abs_err
FROM est JOIN units USING (g) JOIN exact USING (g)
"""


def q_contrastive_negatives(spark, sf):
    """Contrastive-training negative mining (operators/sampling.py
    contrastive_negative_pairs): k deterministic hash-drawn negatives per
    anchor vector, with accidental positives (cosine ≥ 0.9) filtered and
    the cosine kept as the hardness feature. One equi-join, no cross
    join — the sample a 100 TB embedding-training pipeline draws nightly."""
    from relational_data_loader_spark.operators.sampling import (
        contrastive_negative_pairs,
    )

    emb = _t(spark, sf, "embeddings")
    n = emb.count()
    return contrastive_negative_pairs(emb, n, k=4)


SQL_CONTRASTIVE_NEGATIVES = """
WITH v AS (SELECT vec_id, embedding FROM embeddings),
cand AS (
  SELECT a.vec_id AS a_id, j.j AS j,
         CAST(concat('0x', substr(md5(concat(a.vec_id, ':', j.j, ':neg')),
              1, 14)) AS BIGINT) % (SELECT count(*) FROM v) AS n_id,
         a.embedding AS a_emb
  FROM v a, (SELECT unnest(range(4)) AS j) j),
pairs AS (
  SELECT a_id, j, n_id,
         CAST(round(list_cosine_similarity(a_emb::DOUBLE[],
              n.embedding::DOUBLE[]), 3) AS DOUBLE) AS sim
  FROM cand JOIN v n ON n.vec_id = cand.n_id
  WHERE a_id <> n_id)
SELECT a_id, j, n_id, sim FROM pairs WHERE sim < 0.9
"""


def q_source_length_ks(spark, sf):
    """Distribution-drift monitor (operators/quality.py ks_drift):
    two-sample KS statistic of each source's doc-length distribution vs
    the rest of the corpus — catches truncation/boilerplate drift that
    volume monitors miss. Integer-exact cumulation; grid = sources ×
    distinct lengths via broadcast."""
    from relational_data_loader_spark.operators.quality import ks_drift

    docs = _t(spark, sf, "documents").select("source", "n_chars")
    return ks_drift(docs, "source", "n_chars")


SQL_SOURCE_LENGTH_KS = """
WITH vals AS (SELECT source AS g, n_chars AS v FROM documents),
gv AS (SELECT g, v, count(*) AS cnt FROM vals GROUP BY 1, 2),
vt AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM gv GROUP BY v),
gt AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM gv GROUP BY g),
tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_total FROM gt),
grid AS (
  SELECT gt.g, gt.n_g, vt.v, vt.cnt_all, coalesce(gv.cnt, 0) AS cnt
  FROM gt CROSS JOIN vt
  LEFT JOIN gv ON gv.g = gt.g AND gv.v = vt.v),
c AS (
  SELECT g, n_g, v,
         sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum_g,
         sum(cnt_all) OVER (PARTITION BY g ORDER BY v) AS cum_all
  FROM grid)
SELECT g AS source, n_g AS n,
       CAST(round(max(abs(CAST(cum_g AS DOUBLE) / n_g
            - CAST(cum_all - cum_g AS DOUBLE)
              / nullif(CAST(n_total - n_g AS DOUBLE), 0.0))), 4) AS DOUBLE)
         AS ks
FROM c CROSS JOIN tot
GROUP BY g, n_g
"""


def q_cdc_join_view_ivm(spark, sf):
    """Incrementally maintained enrichment view (operators/incremental.py
    apply_delta_join_view): a materialized ``orders LEFT JOIN customer``
    view carried across one CDC epoch with churn on BOTH sides — fact
    inserts (o_orderkey%13=0), fact updates that MOVE the foreign key
    (%13=1) or rewrite a measure (%13=2), fact deletes (synthetic
    o_orderkey+1e9 rows), dim inserts (c_custkey%11=0), dim attribute
    updates (%11=1, 'OLD-' prefix stripped), and dim deletes (%11=5,
    attrs must null out while the fact rows survive). The oracle is the
    full recompute against the NEW base states — so the two-pass delta
    algebra (anti-join + dim_old re-enrich, then Δdim patch join) is
    verified end to end, never rescanning the fact base."""
    from relational_data_loader_spark.operators.incremental import (
        apply_delta_join_view,
        join_view,
    )

    attrs = ["c_name", "c_mktsegment"]
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    cust = _t(spark, sf, "customer").select("c_custkey", *attrs)
    m13 = F.pmod(F.col("o_orderkey"), F.lit(13))
    m11 = F.pmod(F.col("c_custkey"), F.lit(11))

    dim_old = cust.filter(m11 != 0).withColumn(
        "c_mktsegment",
        F.when(
            m11 == 1, F.concat(F.lit("OLD-"), F.col("c_mktsegment"))
        ).otherwise(F.col("c_mktsegment")),
    )
    fact_old = (
        orders.filter(m13 != 0)
        .select(
            "o_orderkey",
            F.when(m13 == 1, F.col("o_custkey") + 17)
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            "o_orderstatus",
            F.when(m13 == 2, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            orders.filter(m13 == 3).select(
                (F.col("o_orderkey") + F.lit(1_000_000_000)).alias(
                    "o_orderkey"
                ),
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    prev = join_view(fact_old, dim_old, "o_custkey", "c_custkey", attrs)

    fact_changes = orders.filter(m13.isin(0, 1, 2)).withColumn(
        "op", F.when(m13 == 0, F.lit("I")).otherwise(F.lit("U"))
    ).unionByName(
        orders.filter(m13 == 3).select(
            (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit("D").alias("op"),
        )
    )
    dim_changes = cust.filter(m11.isin(0, 1)).withColumn(
        "op", F.when(m11 == 0, F.lit("I")).otherwise(F.lit("U"))
    ).unionByName(cust.filter(m11 == 5).withColumn("op", F.lit("D")))

    return apply_delta_join_view(
        prev,
        fact_changes,
        dim_changes,
        dim_old,
        ["o_orderkey"],
        "o_custkey",
        "c_custkey",
        attrs,
    )


SQL_JOIN_VIEW_IVM = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       c.c_name, c.c_mktsegment
FROM orders o
LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 11 <> 5) c
  ON o.o_custkey = c.c_custkey
"""


def q_ivm_cascade_rollup(spark, sf):
    """IVM CASCADE (operators/incremental.py join_view_change_feed →
    apply_delta_rollup): base-table change feeds are composed into the
    enrichment VIEW's own I/U/D feed, which then drives the algebraic
    rollup delta — two IVM stages chained, neither rescanning its input's
    base, the DBSP-style composition a materialized-view hierarchy needs.
    Same deterministic churn as cdc_join_view_ivm (fact I/U-with-fk-move/
    U-measure/D on orders keyed by %13; dim I/U/D on customer keyed by
    %11), so the post-epoch base states are exactly ``orders`` and
    ``customer WHERE c_custkey%11<>5``. The rollup groups by a DIM
    attribute (c_mktsegment), so every drift mode is exercised: fk moves
    change the group, dim rewrites change the group of untouched facts,
    and dim deletes flip surviving facts into the NULL group (which the
    null-safe group merge must keep as ONE group). The oracle is the full
    recompute over the new base states — "cascade equals recompute" is
    the whole contract."""
    from relational_data_loader_spark.operators.incremental import (
        apply_delta_rollup,
        finalize_rollup,
        group_rollup,
        join_view,
        join_view_change_feed,
    )

    attrs = ["c_name", "c_mktsegment"]
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    cust = _t(spark, sf, "customer").select("c_custkey", *attrs)
    m13 = F.pmod(F.col("o_orderkey"), F.lit(13))
    m11 = F.pmod(F.col("c_custkey"), F.lit(11))

    dim_old = cust.filter(m11 != 0).withColumn(
        "c_mktsegment",
        F.when(
            m11 == 1, F.concat(F.lit("OLD-"), F.col("c_mktsegment"))
        ).otherwise(F.col("c_mktsegment")),
    )
    fact_old = (
        orders.filter(m13 != 0)
        .select(
            "o_orderkey",
            F.when(m13 == 1, F.col("o_custkey") + 17)
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            "o_orderstatus",
            F.when(m13 == 2, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            orders.filter(m13 == 3).select(
                (F.col("o_orderkey") + F.lit(1_000_000_000)).alias(
                    "o_orderkey"
                ),
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    fact_changes = orders.filter(m13.isin(0, 1, 2)).withColumn(
        "op", F.when(m13 == 0, F.lit("I")).otherwise(F.lit("U"))
    ).unionByName(
        orders.filter(m13 == 3).select(
            (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit("D").alias("op"),
        )
    )
    dim_changes = cust.filter(m11.isin(0, 1)).withColumn(
        "op", F.when(m11 == 0, F.lit("I")).otherwise(F.lit("U"))
    ).unionByName(cust.filter(m11 == 5).withColumn("op", F.lit("D")))

    # the maintained view is MATERIALIZED by definition in an IVM
    # hierarchy; synthesizing it lazily here made its join re-run for each
    # of its three consumers (old-row lookup + dim-driven pass inside the
    # feed, plus the previous rollup) — persist models the stored view
    # and computes the join once (r6)
    prev = join_view(fact_old, dim_old, "o_custkey", "c_custkey", attrs).persist()
    feed = join_view_change_feed(
        prev,
        fact_changes,
        dim_changes,
        dim_old,
        ["o_orderkey"],
        "o_custkey",
        "c_custkey",
        attrs,
    )
    prev_rollup = group_rollup(prev, F.col("c_mktsegment"), "o_totalprice")
    return finalize_rollup(
        apply_delta_rollup(
            prev_rollup,
            feed,
            F.col("c_mktsegment"),
            "o_totalprice",
            "o_totalprice_old",
            old_group=F.col("c_mktsegment_old"),
        )
    )


SQL_IVM_CASCADE_ROLLUP = """
WITH v AS (
  SELECT o.o_totalprice, c.c_mktsegment
  FROM orders o
  LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 11 <> 5) c
    ON o.o_custkey = c.c_custkey)
SELECT c_mktsegment AS grp,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS sum_value,
       CAST(count(*) AS BIGINT) AS n_rows
FROM v GROUP BY 1
"""


def _branching_turns(spark, sf):
    """Deterministic branching forest over events: conv = user_id, node =
    per-conv turn index (row_number by event_id), parent = previous turn
    except every 3rd turn branches from its grandparent (a regeneration
    sibling) — both engines derive the identical forest."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = ev.select(
        F.col("user_id").alias("conv"),
        F.row_number().over(w).alias("node"),
    )
    return t.withColumn(
        "parent",
        F.when(F.col("node") == 1, F.lit(None).cast("int"))
        .when(F.pmod(F.col("node"), F.lit(3)) == 0, F.col("node") - 2)
        .otherwise(F.col("node") - 1),
    )


def q_conversation_tree_paths(spark, sf):
    """Branching-transcript linearization (operators/tree.py tree_paths):
    every root→leaf path of the per-conversation turn forest, extracted by
    pointer-doubling list ranking — O(log depth) self-joins instead of a
    depth-sequential walk, the shape that holds when one pathological
    conversation is 10^4 regenerated turns deep. The oracle is DuckDB's
    recursive CTE over the identical forest."""
    from relational_data_loader_spark.operators.tree import tree_paths

    t = _branching_turns(spark, sf)
    p = tree_paths(t, "conv", "node", "parent")
    return p.select(
        F.col("conv").alias("conv_id"),
        F.col("node").alias("leaf"),
        "depth",
        F.concat_ws(">", F.col("path").cast("array<string>")).alias("path"),
    )


def q_tree_canonical_path(spark, sf):
    """Per-conversation canonical path (operators/tree.py canonical_paths):
    the deepest leaf's root→leaf path, ties to the largest leaf id — the
    'what the chat UI shows' convention for a branching transcript."""
    from relational_data_loader_spark.operators.tree import canonical_paths

    t = _branching_turns(spark, sf)
    p = canonical_paths(t, "conv", "node", "parent")
    return p.select(
        F.col("conv").alias("conv_id"),
        F.col("node").alias("leaf"),
        "depth",
        F.concat_ws(">", F.col("path").cast("array<string>")).alias("path"),
    )


_SQL_TREE_BASE = """
WITH RECURSIVE t AS (
  SELECT user_id AS conv,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
              AS INTEGER) AS node
  FROM events),
tt AS (
  SELECT conv, node,
         CASE WHEN node = 1 THEN NULL
              WHEN node % 3 = 0 THEN node - 2
              ELSE node - 1 END AS parent
  FROM t),
paths AS (
  SELECT conv, node, CAST(node AS VARCHAR) AS path, 1 AS depth
  FROM tt WHERE parent IS NULL
  UNION ALL
  SELECT tt.conv, tt.node, p.path || '>' || CAST(tt.node AS VARCHAR),
         p.depth + 1
  FROM tt JOIN paths p ON tt.conv = p.conv AND tt.parent = p.node),
leaf_paths AS (
  SELECT p.conv, p.node, p.depth, p.path
  FROM paths p
  LEFT JOIN (SELECT DISTINCT conv, parent FROM tt
             WHERE parent IS NOT NULL) x
    ON p.conv = x.conv AND p.node = x.parent
  WHERE x.parent IS NULL)
"""

SQL_TREE_PATHS = _SQL_TREE_BASE + """
SELECT conv AS conv_id, node AS leaf, depth, path FROM leaf_paths
"""

SQL_TREE_CANONICAL = _SQL_TREE_BASE + """
SELECT conv AS conv_id, node AS leaf, depth, path
FROM (SELECT conv, node, depth, path,
             row_number() OVER (PARTITION BY conv
                                ORDER BY depth DESC, node DESC) AS rk
      FROM leaf_paths)
WHERE rk = 1
"""


def q_boilerplate_turn_scrub(spark, sf):
    """Turn-granular boilerplate removal (operators/transcript.py
    drop_boilerplate_turns): drop every turn whose exact text occurs in
    >=3 distinct conversations, then re-fingerprint what survives. events
    as the transcript (user_id=conv, event_id=turn order); the text mixes
    a canned 'greet:<type>' phrase (every 5th turn — true boilerplate,
    shared corpus-wide) with per-turn-unique bodies, so conversations keep
    most turns but shed the template."""
    from relational_data_loader_spark.operators.transcript import (
        drop_boilerplate_turns,
    )

    ev = _t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.when(
            F.pmod(F.col("event_id"), F.lit(5)) == 0,
            F.concat(F.lit("greet:"), F.col("event_type")),
        )
        .otherwise(
            F.concat(F.col("event_type"), F.lit(":"), F.col("event_id"))
        )
        .alias("txt"),
    )
    return drop_boilerplate_turns(
        ev, "user_id", "event_id", "txt", min_convs=3
    )


SQL_BOILERPLATE_SCRUB = """
WITH turns AS (
  SELECT user_id AS conv, event_id AS turn,
         CASE WHEN event_id % 5 = 0 THEN 'greet:' || event_type
              ELSE event_type || ':' || CAST(event_id AS VARCHAR) END AS txt
  FROM events),
bp AS (
  SELECT txt FROM turns GROUP BY txt
  HAVING count(DISTINCT conv) >= 3),
marked AS (
  SELECT t.conv, t.turn, t.txt, (b.txt IS NOT NULL) AS is_bp
  FROM turns t LEFT JOIN bp b ON t.txt = b.txt)
SELECT conv AS user_id,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN is_bp THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(coalesce(
         string_agg(CASE WHEN NOT is_bp THEN txt END, chr(31) ORDER BY turn),
         '')) AS kept_fingerprint,
       CAST(coalesce(sum(CASE WHEN NOT is_bp THEN length(txt) END), 0)
            AS BIGINT) AS kept_chars
FROM marked GROUP BY conv
"""


# shared turn-table derivation for the transcript-protocol entries: events
# as the transcript (user_id=conv, event_id=turn order), role derived
# deterministically from the turn id (system sprinkled at %17, tool at %13,
# the rest alternating-ish user/assistant), text = event_type + props (3
# whitespace tokens per turn). Both engines compute the identical mapping.
def _turns_with_roles(spark, sf):
    ev = _t(spark, sf, "events")
    role = (
        F.when(F.pmod(F.col("event_id"), F.lit(17)) == 0, F.lit("system"))
        .when(F.pmod(F.col("event_id"), F.lit(13)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return ev.select(
        "user_id",
        "event_id",
        role.alias("role"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("txt"),
    )


_SQL_TURNS_WITH_ROLES = """
  SELECT user_id, event_id,
         CASE WHEN event_id % 17 = 0 THEN 'system'
              WHEN event_id % 13 = 0 THEN 'tool'
              WHEN event_id % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         event_type || ' ' || props AS txt
  FROM events
"""


def q_transcript_role_audit(spark, sf):
    """Role-protocol audit (operators/transcript.py
    role_alternation_audit): per conversation, same-role back-to-back
    violations (tool and system exempt), mid-conversation system
    injections, and the
    opening role — the transcript-grammar DQ check a CDC replica runs
    before the corpus is assembled."""
    from relational_data_loader_spark.operators.transcript import (
        role_alternation_audit,
    )

    return role_alternation_audit(
        _turns_with_roles(spark, sf), "user_id", "event_id", "role"
    )


def q_transcript_role_repair(spark, sf):
    """Role-run coalescing (operators/transcript.py coalesce_role_runs):
    the REPAIR dual of the role audit — every maximal same-role run merges
    to one turn (texts concatenated in order), survivors renumbered
    densely from 0, the strictly-alternating shape chat templates need.
    Gaps-and-islands via the rn−rn trick, no self-joins; the oracle states
    the same islands with string_agg(ORDER BY)."""
    from relational_data_loader_spark.operators.transcript import (
        coalesce_role_runs,
    )

    return coalesce_role_runs(
        _turns_with_roles(spark, sf), "user_id", "event_id", "role", "txt",
        sep=" | ",
    )


SQL_TRANSCRIPT_ROLE_REPAIR = f"""
WITH t AS ({_SQL_TURNS_WITH_ROLES}),
isl AS (
  SELECT user_id, event_id, role, txt,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id)
         - row_number() OVER (PARTITION BY user_id, role ORDER BY event_id)
           AS island
  FROM t),
runs AS (
  SELECT user_id, role, island,
         min(event_id) AS first_turn,
         CAST(count(*) AS INT) AS n_merged,
         string_agg(txt, ' | ' ORDER BY event_id) AS txt
  FROM isl GROUP BY 1, 2, 3)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY first_turn) - 1
            AS INT) AS turn_idx,
       role, txt, n_merged, first_turn
FROM runs
"""


SQL_TRANSCRIPT_ROLE_AUDIT = f"""
WITH t AS ({_SQL_TURNS_WITH_ROLES}),
l AS (SELECT user_id, event_id, role,
             lag(role) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      FROM t),
a AS (
  SELECT user_id,
         count(*) AS n_turns,
         CAST(sum(CASE WHEN role = prev AND role <> 'tool'
                        AND role <> 'system'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats,
         CAST(sum(CASE WHEN role = 'system' AND prev IS NOT NULL
                        AND prev <> 'system'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_system_mid,
         arg_min(role, event_id) AS first_role
  FROM l GROUP BY user_id)
SELECT user_id, n_turns, n_role_repeats, n_system_mid, first_role,
       (n_role_repeats = 0 AND n_system_mid = 0
        AND first_role IN ('system', 'user')) AS is_clean
FROM a
"""


def q_transcript_token_trim(spark, sf):
    """Context-budget trimming (operators/transcript.py
    trim_to_token_budget): keep the longest suffix of turns fitting 12
    whitespace tokens (the final turn unconditionally), fingerprint what
    survives — the drop-oldest-turns truncation every SFT/inference
    pipeline applies before packing."""
    from relational_data_loader_spark.operators.transcript import (
        trim_to_token_budget,
    )

    return trim_to_token_budget(
        _turns_with_roles(spark, sf), "user_id", "event_id", "txt", budget=12
    )


SQL_TRANSCRIPT_TOKEN_TRIM = f"""
WITH t AS ({_SQL_TURNS_WITH_ROLES}),
k AS (SELECT user_id, event_id, txt,
             len(string_split(regexp_replace(lower(txt), '\\s+', ' ', 'g'),
                 ' ')) AS ntok,
             sum(len(string_split(regexp_replace(lower(txt), '\\s+', ' ',
                 'g'), ' ')))
               OVER (PARTITION BY user_id ORDER BY event_id DESC
                     ROWS UNBOUNDED PRECEDING) AS rev_cum,
             row_number()
               OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM t),
m AS (SELECT *, (rev_cum <= 12 OR rn = 1) AS keep FROM k)
SELECT user_id,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN ntok ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       min(CASE WHEN keep THEN event_id END) AS first_kept_turn,
       md5(string_agg(CASE WHEN keep THEN txt END, chr(31)
                      ORDER BY event_id)) AS kept_fingerprint
FROM m GROUP BY user_id
"""


def q_sft_mask_ratio(spark, sf):
    """Loss-mask accounting (operators/transcript.py sft_loss_mask_stats):
    trainable (assistant-turn) tokens vs total per conversation + the 4dp
    mask ratio — the monitor that catches a corpus degenerating into
    context-only padding."""
    from relational_data_loader_spark.operators.transcript import (
        sft_loss_mask_stats,
    )

    return sft_loss_mask_stats(
        _turns_with_roles(spark, sf), "user_id", "role", "txt"
    )


SQL_SFT_MASK_RATIO = f"""
WITH t AS ({_SQL_TURNS_WITH_ROLES}),
k AS (SELECT user_id, role,
             len(string_split(regexp_replace(lower(txt), '\\s+', ' ', 'g'),
                 ' ')) AS ntok
      FROM t)
SELECT user_id,
       CAST(sum(ntok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)
            AS BIGINT) AS trainable_tokens,
       count(CASE WHEN role = 'assistant' THEN 1 END) AS n_examples,
       CAST(round(sum(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)
             / nullif(CAST(sum(ntok) AS DOUBLE), 0.0), 4) AS DOUBLE)
         AS mask_ratio
FROM k GROUP BY user_id
"""


def q_stream_interval_join(spark, sf):
    """Watermarked stream-stream interval join (streaming/joins.py): the
    click and purchase tails of the event stream joined live — a purchase
    attributes to every click by the same user in the preceding 24 h. A
    REAL streaming query runs (two file-source streams, availableNow,
    memory sink); the emitted pairs are then aggregated per user in batch.
    Watermark delays are set far beyond the fixture's span so no pair is
    dropped — the inner-join emission then equals the batch join exactly,
    which is what the DuckDB oracle recomputes."""
    import hashlib

    from relational_data_loader_spark.streaming.joins import (
        interval_join_streams,
    )

    # the file-stream source needs a DIRECTORY; expose the fixture file
    # through a scratch dir via symlink (no copy)
    src = os.path.abspath(f"{sf}/events.parquet")
    stream_dir = _state_workdir(sf, "sjoin")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    # lexists, not exists: a dangling link reads as absent to exists() but
    # still blocks os.symlink; and a live link from an earlier run may
    # point at a MOVED fixture — always relink to the current target
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(src):
            os.remove(link)
            os.symlink(src, link)
    else:
        os.symlink(src, link)
    path = stream_dir
    sch = spark.read.parquet(path).schema

    def _side(etype, ts_alias, *extra):
        return (
            spark.readStream.schema(sch)
            .parquet(path)
            .filter(F.col("event_type") == etype)
            # watermarks require TIMESTAMP (tz-aware); the fixture's ts is
            # NTZ and the session TZ is pinned UTC, so the cast is exact
            .select(
                "user_id", F.col("ts").cast("timestamp").alias(ts_alias), *extra
            )
        )

    joined = interval_join_streams(
        _side("click", "click_ts"),
        _side("purchase", "buy_ts", "value"),
        key="user_id",
        left_ts="click_ts",
        right_ts="buy_ts",
        window="24 hours",
        left_delay="3650 days",
        right_delay="3650 days",
    )
    # deterministic sink name per sf: repeated invocations in one session
    # (bench trials, parity runs) REPLACE the memory table instead of
    # accumulating one driver-resident copy of the join output per call
    name = "attr_" + hashlib.md5(sf.encode()).hexdigest()[:10]
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    # state-store sizing: each shuffle partition commits one delta file +
    # fsync PER STORE PER MICRO-BATCH regardless of row count, and a
    # stream-stream join keeps four stores per partition — at this
    # fixture's ~20k rows/side the fsyncs ARE the query (measured 12.0 s
    # at 64 partitions → 8 partitions cuts the commit count 8×). This is
    # the streaming analog of sizing shuffle.partitions to data volume;
    # at production volume the same knob goes UP, not down.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            _dec_sum(F.col("value"), "attributed_value"),
        )
    )


SQL_STREAM_INTERVAL_JOIN = """
SELECT c.user_id,
       count(*) AS n_attributed,
       CAST(round(sum(CAST(p.value AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS attributed_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY c.user_id
"""


def q_posting_serving_refresh(spark, sf):
    """Serving-index incremental refresh, end to end (operators/index.py
    refresh_serving_postings): bootstrap the token-bucketed serving copy
    from a synthetic OLD corpus state (inserts missing, one slice carrying
    stale extra tokens, synthetic to-be-deleted docs), apply one epoch of
    I/U/D through the posting IVM, rewrite ONLY the affected bucket
    partitions, then answer a real query (doc-frequency top 50) from the
    refreshed serving FILES. The oracle recomputes the answer from the NEW
    corpus state directly — so stale-posting leaks, missed buckets, and
    the emptied-bucket edge all surface as a hash mismatch."""
    import shutil

    from relational_data_loader_spark.operators.index import (
        apply_delta_postings,
        posting_index,
        refresh_serving_postings,
        write_serving_postings,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    m17 = F.pmod(F.col("doc_id"), F.lit(17))
    old_docs = docs.filter(m17 != 0).select(
        "doc_id",
        F.when(
            m17 == 1, F.concat(F.col("text"), F.lit(" zzstaletok"))
        ).otherwise(F.col("text")).alias("text"),
    ).unionByName(
        docs.filter(m17 == 2).select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"), "text"
        )
    )
    changes = docs.filter(m17.isin(0, 1)).withColumn(
        "op", F.when(m17 == 0, F.lit("I")).otherwise(F.lit("U"))
    ).unionByName(
        docs.filter(m17 == 2).select(
            (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
            "text",
            F.lit("D").alias("op"),
        )
    )

    serving = _state_workdir(sf, "serving")
    shutil.rmtree(serving, ignore_errors=True)
    # the OLD index feeds three consumers (bootstrap serving write, the
    # IVM anti-join inside apply_delta_postings, and the removed-posting
    # probe inside refresh) — persist it so the synthetic-corpus explode
    # runs once, not three times (r6); released before returning.
    old_index = posting_index(old_docs, "text", "doc_id").persist()
    write_serving_postings(old_index, serving, n_buckets=64)
    new_index = apply_delta_postings(old_index, changes, "text", "doc_id")
    refresh_serving_postings(
        spark, new_index, old_index, changes, "text", "doc_id", serving
    )
    old_index.unpersist(blocking=False)
    return (
        spark.read.parquet(serving)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("tok"))
        .limit(50)
    )


SQL_POSTING_SERVING_REFRESH = r"""
SELECT tok, count(*) AS doc_freq
FROM (SELECT DISTINCT doc_id, unnest(string_split(
        regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS tok
      FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY doc_freq DESC, tok
LIMIT 50
"""


def q_cdc_commit_retry_state(spark, sf):
    """Engine replay where the tail incremental LOSES the manifest-commit
    race (plans/manager.py run_with_retry): a rival manager lands the
    identical load inside the loser's commit window (between manifest
    listing and link(2) — injected by wrapping os.link, the race's real
    location), the loser gets ConcurrentCommitError, and the retry
    re-plans against the rival's committed watermark. The visible state
    must equal the straight replay oracle — optimistic concurrency on the
    driver's hard signal."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "race")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    rival = DataLoadManager(spark, os.path.join(base, "wh"))
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)

    real_link = os.link
    fired = [False]

    def racing_link(src, dst, *a, **kw):
        if "_manifests" in str(dst) and not fired[0]:
            fired[0] = True
            os.link = real_link
            rival.run(spec)  # the rival commits the same backlog for real
            os.link = racing_link
        return real_link(src, dst, *a, **kw)

    os.link = racing_link
    try:
        mgr.run_with_retry(spec, max_attempts=3)
    finally:
        os.link = real_link
    return mgr.table(spec).read()


def q_cdc_dlq_replay_state(spark, sf):
    """Engine replay through the DEAD-LETTER lifecycle (plans/manager.py
    _quarantine_split / replay_dlq): the change log carries poison values
    (every event_id%11==0 upsert writes 9999999999, which overflows the
    v1 spec's int column), on_cast_error='quarantine' detours them to the
    DLQ while the batch commits and the watermark advances past them; the
    spec is then FIXED by widening val int→bigint (evolve_widened, not a
    refresh) and replay_dlq re-admits the dead letters through the
    version-guarded merge. The visible state must equal the straight
    full-replay-under-fixed-spec oracle — including keys whose LAST event
    was quarantined (the replayed lsn must win), keys with a newer clean
    event (the replayed lsn must lose), and quarantined inserts for keys
    deleted later (the tombstone kept by the quarantine-mode full refresh
    must block resurrection)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec

    base = _state_workdir(sf, "dlq")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    ev = _t(spark, sf, "events")
    is_del = F.col("event_type") == DELETE_OP
    log = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("id"),
        F.when(is_del, F.lit(None))
        .otherwise(
            F.when(
                F.pmod(F.col("event_id"), F.lit(11)) == 0,
                F.lit("9999999999"),
            ).otherwise(F.pmod(F.col("event_id"), F.lit(1000)).cast("string"))
        )
        .alias("val"),
    )
    log.write.mode("overwrite").parquet(log_dir)

    def mkspec(val_type):
        return IngestSpec(
            name="dlqfacts",
            source=f"parquet://{log_dir}",
            columns=[
                ColumnSpec("id", "id", "bigint", primary_key=True),
                ColumnSpec("val", "val", val_type),
            ],
            target_buckets=8,
            on_cast_error="quarantine",
        )

    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(mkspec("int"))  # poison rows detour to the DLQ, load commits
    fixed = mkspec("bigint")
    mgr.run(fixed)  # evolve_widened, no refresh
    mgr.replay_dlq(fixed)
    return mgr.table(fixed).read().select("id", "val")


SQL_DLQ_REPLAY_STATE = f"""
SELECT id, val FROM (
  SELECT CAST(user_id AS BIGINT) AS id,
         CAST(CASE WHEN event_id % 11 = 0 THEN 9999999999
                   ELSE event_id % 1000 END AS BIGINT) AS val,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND NOT is_del
"""


def q_cdc_vacuum_state(spark, sf):
    """Engine replay in two slices, then snapshot expiry + orphan GC
    (sinks/snapshot.py vacuum, keep_manifests=1, orphan gate 0): the sweep
    must drop only superseded/never-referenced files — the visible state
    after GC must still equal the replay oracle, pinned on the driver's
    hard signal."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "vac")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    cut = log.agg(F.max("lsn")).first()[0] // 2
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    mgr.run(spec)
    tbl = mgr.table(spec)
    tbl.vacuum(keep_manifests=1, orphan_min_age_seconds=0)
    return tbl.read()


# column-sparse changelog derivation (events → partial-update envelopes,
# deterministic in both engines): op D on 'error' events, I every 7th id
# (full image), else U patches that set role/text/tool only when the id
# hits the column's modulus — the MongoDB/Cassandra-CDC wire shape.
_NEG_INF = -(2**62)


def _derived_sparse_changelog(spark, sf, lsn_from: int | None = None):
    ev = _t(spark, sf, "events")
    if lsn_from is not None:
        ev = ev.filter(F.col("event_id") > F.lit(int(lsn_from)))
    is_del = F.col("event_type") == DELETE_OP
    is_ins = ~is_del & (F.col("event_id") % 7 == 0)
    eid = F.col("event_id")

    def _set(modulus, value):
        return F.when(~is_del & (is_ins | (eid % modulus == 0)), value)

    return ev.select(
        eid.alias("lsn"),
        F.when(is_del, F.lit("D"))
        .when(is_ins, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        (eid % 37).cast("int").alias("turn_idx"),
        _set(3, F.col("event_type")).alias("role"),
        _set(2, F.concat_ws(":", F.col("event_type"), F.col("props"))).alias(
            "text"
        ),
        _set(5, F.substring("props", 1, 8)).alias("tool"),
        F.when(~is_del, F.col("ts")).alias("ts"),
    )


_SQL_SPARSE_LOG_BODY = f"""
  SELECT event_id AS lsn,
         CASE WHEN event_type = '{DELETE_OP}' THEN 'D'
              WHEN event_id % 7 = 0 THEN 'I'
              ELSE 'U' END AS op,
         CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0 OR event_id % 3 = 0)
              THEN event_type END AS role,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0 OR event_id % 2 = 0)
              THEN event_type || ':' || props END AS text,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0 OR event_id % 5 = 0)
              THEN substr(props, 1, 8) END AS tool,
         CASE WHEN event_type <> '{DELETE_OP}' THEN ts END AS ts
  FROM events
"""

# column-level LWW fold over an envelope stream `env(lsn, op, conv_id,
# turn_idx, role, text, tool, ts)`: a full image (I) anchors the key —
# patches below it are superseded; the latest D kills the key unless a
# later I resurrects it; each column takes its highest-lsn setter at or
# above the anchor. Mirrors operators/sparse.py:fold_sparse_envelopes.
def _sparse_fold_sql(env_cte: str) -> str:
    col = (
        "arg_max({c}, lsn) FILTER (WHERE op <> 'D' AND {c} IS NOT NULL "
        f"AND lsn >= coalesce(anchor, {_NEG_INF})) AS {{c}}"
    )
    cols = ",\n       ".join(col.format(c=c) for c in ["role", "text", "tool", "ts"])
    return f"""
WITH env AS ({env_cte}),
a AS (SELECT conv_id, turn_idx,
             max(CASE WHEN op = 'I' THEN lsn END) AS anchor,
             max(CASE WHEN op = 'D' THEN lsn END) AS dead
      FROM env GROUP BY conv_id, turn_idx),
j AS (SELECT e.*, a.anchor, a.dead
      FROM env e JOIN a USING (conv_id, turn_idx))
SELECT conv_id, turn_idx,
       {cols},
       max(lsn) AS lsn
FROM j
GROUP BY conv_id, turn_idx, anchor, dead
HAVING dead IS NULL OR coalesce(anchor, {_NEG_INF}) > dead
"""


def q_sparse_envelope_fold(spark, sf):
    """Column-sparse envelope fold (operators/sparse.py
    fold_sparse_envelopes): MongoDB/Cassandra-CDC-style partial-update
    feeds folded to final state with column-granular LWW — full images
    reset, tombstones kill unless a later insert resurrects, each column
    takes its highest-lsn setter. One window + one groupBy on the PK,
    single exchange."""
    from relational_data_loader_spark.operators.sparse import (
        fold_sparse_envelopes,
    )

    return fold_sparse_envelopes(
        _derived_sparse_changelog(spark, sf),
        ["conv_id", "turn_idx"],
        "lsn",
        "op",
        ["role", "text", "tool", "ts"],
    )


SQL_SPARSE_FOLD = _sparse_fold_sql(_SQL_SPARSE_LOG_BODY)


def q_cdc_sparse_merge_state(spark, sf):
    """Engine replay with a column-sparse tail (operators/sparse.py
    densify_sparse_batch): full refresh from the dense head of the log,
    then ONE sparse patch epoch densified against the committed table
    (bucket-pruned stored-row read, per-column coalesce) and applied
    through the standard full-row merge. Final state must equal the
    column-level fold oracle — proving the densify bridge composes with
    the sink's LWW/tombstone semantics."""
    import shutil

    from relational_data_loader_spark.operators.sparse import (
        densify_sparse_batch,
    )
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "sparse")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    dense = _derived_changelog(spark, sf)
    hi = dense.agg(F.max("lsn")).first()[0]
    cut = hi // 2
    dense.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)
    patch = densify_sparse_batch(
        tbl,
        _derived_sparse_changelog(spark, sf, lsn_from=cut),
        ["conv_id", "turn_idx"],
        "lsn",
        "op",
        ["role", "text", "tool", "ts"],
    )
    tbl.merge(patch, epoch_id=hi)
    return tbl.read()


# oracle: the dense head folds to full rows (standard LWW), which re-enter
# the envelope algebra as I rows at their winning lsn; the sparse tail
# stacks on top under the same column-level fold the operator implements.
# The outer projection drops the fold's lsn — table.read() exposes the
# destination schema only (watermarks live in manifests, not rows).
_SQL_SPARSE_MERGE_FOLD = _sparse_fold_sql(
    f"""
  SELECT lsn, 'I' AS op, conv_id, turn_idx, role, text, tool, ts FROM (
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 37 AS INT) AS turn_idx,
           event_type AS role,
           event_type || ':' || props AS text,
           substr(props, 1, 8) AS tool,
           ts,
           event_id AS lsn,
           event_type = '{DELETE_OP}' AS is_del,
           row_number() OVER (PARTITION BY user_id, event_id % 37
                              ORDER BY event_id DESC) AS rn
    FROM events
    WHERE event_id <= (SELECT max(event_id) // 2 FROM events)) h
  WHERE rn = 1 AND NOT is_del
  UNION ALL
  SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts FROM (
{_SQL_SPARSE_LOG_BODY.replace("FROM events", "FROM events WHERE event_id > (SELECT max(event_id) // 2 FROM events)")}
  ) s
"""
)

SQL_SPARSE_MERGE_STATE = f"""
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ({_SQL_SPARSE_MERGE_FOLD})
"""


def q_sparse_mask_fold(spark, sf):
    """Mask-convention sparse fold (operators/sparse.py, mask_col): the
    lossless patch shape — each U row carries an array<string> of the
    columns it sets, so an explicit set-to-NULL round-trips (every 11th
    event unsets ``tool`` here). The oracle wraps arg_max in a struct
    because DuckDB's arg_max SKIPS null args while Spark's max_by keeps
    them — exactly the difference the mask convention exists to express."""
    from relational_data_loader_spark.operators.sparse import (
        fold_sparse_envelopes,
    )

    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    is_del = F.col("event_type") == DELETE_OP
    is_ins = ~is_del & (eid % 7 == 0)
    role_set = eid % 3 == 0
    text_set = eid % 2 == 0
    unset_tool = eid % 11 == 0  # the explicit tool := NULL patch
    tool_set = (eid % 5 == 0) | unset_tool
    mask = F.when(
        ~is_del & ~is_ins,
        F.filter(
            F.array(F.lit("role"), F.lit("text"), F.lit("tool"), F.lit("ts")),
            lambda x: ((x == "role") & role_set)
            | ((x == "text") & text_set)
            | ((x == "tool") & tool_set)
            | (x == "ts"),
        ),
    )
    log = ev.select(
        eid.alias("lsn"),
        F.when(is_del, F.lit("D"))
        .when(is_ins, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("user_id").cast("string").alias("conv_id"),
        (eid % 37).cast("int").alias("turn_idx"),
        F.when(~is_del & (is_ins | role_set), F.col("event_type")).alias(
            "role"
        ),
        F.when(
            ~is_del & (is_ins | text_set),
            F.concat_ws(":", F.col("event_type"), F.col("props")),
        ).alias("text"),
        F.when(
            ~is_del & (is_ins | (tool_set & ~unset_tool)),
            F.substring("props", 1, 8),
        ).alias("tool"),
        F.when(~is_del, F.col("ts")).alias("ts"),
        mask.alias("changed"),
    )
    return fold_sparse_envelopes(
        log,
        ["conv_id", "turn_idx"],
        "lsn",
        "op",
        ["role", "text", "tool", "ts"],
        mask_col="changed",
    )


def _sparse_mask_col_sql(c: str) -> str:
    # struct-wrapped arg_max: DuckDB's bare arg_max skips NULL args, which
    # would resurrect a pre-unset value — the struct is never NULL, so the
    # explicit set-to-NULL survives extraction (judge-reproducible:
    # SELECT arg_max(x, y) FROM (VALUES (NULL, 2), ('a', 1)) t(x, y) → 'a')
    return (
        f"(arg_max({{'v': {c}}}, lsn) FILTER (WHERE op <> 'D' "
        f"AND (op = 'I' OR list_contains(changed, '{c}')) "
        f"AND lsn >= coalesce(anchor, {_NEG_INF}))).v AS {c}"
    )


SQL_SPARSE_MASK_FOLD = f"""
WITH env AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = '{DELETE_OP}' THEN 'D'
              WHEN event_id % 7 = 0 THEN 'I'
              ELSE 'U' END AS op,
         CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0 OR event_id % 3 = 0)
              THEN event_type END AS role,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0 OR event_id % 2 = 0)
              THEN event_type || ':' || props END AS text,
         CASE WHEN event_type <> '{DELETE_OP}'
               AND (event_id % 7 = 0
                    OR (event_id % 5 = 0 AND event_id % 11 <> 0))
              THEN substr(props, 1, 8) END AS tool,
         CASE WHEN event_type <> '{DELETE_OP}' THEN ts END AS ts,
         CASE WHEN event_type <> '{DELETE_OP}' AND event_id % 7 <> 0 THEN
           list_filter(['role', 'text', 'tool', 'ts'], x ->
             (x = 'role' AND event_id % 3 = 0)
             OR (x = 'text' AND event_id % 2 = 0)
             OR (x = 'tool' AND (event_id % 5 = 0 OR event_id % 11 = 0))
             OR x = 'ts')
         END AS changed
  FROM events),
a AS (SELECT conv_id, turn_idx,
             max(CASE WHEN op = 'I' THEN lsn END) AS anchor,
             max(CASE WHEN op = 'D' THEN lsn END) AS dead
      FROM env GROUP BY conv_id, turn_idx),
j AS (SELECT e.*, a.anchor, a.dead
      FROM env e JOIN a USING (conv_id, turn_idx))
SELECT conv_id, turn_idx,
       {_sparse_mask_col_sql("role")},
       {_sparse_mask_col_sql("text")},
       {_sparse_mask_col_sql("tool")},
       {_sparse_mask_col_sql("ts")},
       max(lsn) AS lsn
FROM j
GROUP BY conv_id, turn_idx, anchor, dead
HAVING dead IS NULL OR coalesce(anchor, {_NEG_INF}) > dead
"""


# agent-trajectory turn table: _turns_with_roles plus the ts and tool
# columns the input_hint schema carries (tool = the event type, but only on
# tool-role turns; %17 wins over %13 so the tool predicate must repeat both)
def _agent_turns(spark, sf):
    ev = _t(spark, sf, "events")
    role = (
        F.when(F.pmod(F.col("event_id"), F.lit(17)) == 0, F.lit("system"))
        .when(F.pmod(F.col("event_id"), F.lit(13)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return ev.select(
        "user_id",
        "event_id",
        role.alias("role"),
        F.col("event_type").alias("etype"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("txt"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(role == "tool", F.col("event_type")).alias("tool"),
    )


_SQL_AGENT_TURNS = """
  SELECT user_id, event_id,
         CASE WHEN event_id % 17 = 0 THEN 'system'
              WHEN event_id % 13 = 0 THEN 'tool'
              WHEN event_id % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         event_type AS etype,
         event_type || ' ' || props AS txt,
         ts,
         CASE WHEN event_id % 17 <> 0 AND event_id % 13 = 0
              THEN event_type END AS tool
  FROM events
"""


def q_tool_call_stats(spark, sf):
    """Per-tool usage accounting (operators/agent.py tool_call_stats):
    call volume, conversation reach, un-responded trailing calls, and the
    exact summed + mean wall-clock gap to the next turn — the first
    dashboard over an agent-transcript corpus."""
    from relational_data_loader_spark.operators.agent import tool_call_stats

    return tool_call_stats(
        _agent_turns(spark, sf), "user_id", "event_id", "role", "tool", "ts"
    )


SQL_TOOL_CALL_STATS = f"""
WITH t AS ({_SQL_AGENT_TURNS}),
l AS (SELECT user_id, role, tool, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY event_id)
               AS next_ts
      FROM t),
c AS (SELECT * FROM l WHERE role = 'tool' AND tool IS NOT NULL)
SELECT tool,
       count(*) AS n_calls,
       count(DISTINCT user_id) AS n_convs,
       CAST(sum(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_trailing,
       CAST(sum(CASE WHEN next_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_answered,
       CAST(coalesce(sum(CASE WHEN next_ts IS NOT NULL
                              THEN epoch_us(next_ts) - epoch_us(ts) END), 0)
            AS BIGINT) AS total_gap_us,
       CASE WHEN sum(CASE WHEN next_ts IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN CAST(coalesce(sum(CASE WHEN next_ts IS NOT NULL
                                        THEN epoch_us(next_ts) - epoch_us(ts)
                                   END), 0) AS DOUBLE)
                 / CAST(sum(CASE WHEN next_ts IS NOT NULL THEN 1 ELSE 0 END)
                        AS DOUBLE)
       END AS avg_gap_us
FROM c GROUP BY tool
"""


def q_agent_loop_audit(spark, sf):
    """Degenerate-loop detection (operators/agent.py agent_loop_audit):
    conversations with runs of >= 2 consecutive same-tool calls among
    their tool turns — the stuck-agent signature a curriculum filter
    drops before SFT assembly."""
    from relational_data_loader_spark.operators.agent import agent_loop_audit

    return agent_loop_audit(
        _agent_turns(spark, sf), "user_id", "event_id", "role", ["tool"],
        min_run=2,
    )


SQL_AGENT_LOOP_AUDIT = f"""
WITH t AS ({_SQL_AGENT_TURNS}),
c AS (SELECT user_id, event_id, tool FROM t WHERE role = 'tool'),
l AS (SELECT user_id, event_id, tool,
             CASE WHEN tool IS DISTINCT FROM
                       lag(tool) OVER (PARTITION BY user_id ORDER BY event_id)
                  THEN 1 ELSE 0 END AS new_run
      FROM c),
r AS (SELECT user_id, tool,
             sum(new_run) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM l),
g AS (SELECT user_id, run_id, count(*) AS run_len
      FROM r GROUP BY user_id, run_id HAVING count(*) >= 2)
SELECT user_id,
       count(*) AS n_loop_runs,
       max(run_len) AS max_run_len,
       CAST(sum(run_len) AS BIGINT) AS n_looped_turns
FROM g GROUP BY user_id
"""


def q_preference_pairs(spark, sf):
    """Preference-pair mining (operators/agent.py preference_pairs):
    conversations sharing the first turn's normalized text (event type)
    but diverging at the second turn yield chosen/rejected pairs at
    distinct-response granularity; winner = longest response, lexical
    tie-break — the deterministic stand-in for a reward-model score."""
    from relational_data_loader_spark.operators.agent import preference_pairs

    return preference_pairs(
        _agent_turns(spark, sf), "user_id", "event_id", "etype", "txt",
        prefix_k=1,
    )


SQL_PREFERENCE_PAIRS = f"""
WITH t AS ({_SQL_AGENT_TURNS}),
rk AS (SELECT user_id, etype, txt,
              row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                AS rn
       FROM t QUALIFY rn <= 2),
pc AS (SELECT user_id,
              md5(string_agg(CASE WHEN rn <= 1 THEN etype END, chr(31)
                             ORDER BY rn)) AS prefix_fp,
              max(CASE WHEN rn = 2 THEN txt END) AS resp
       FROM rk GROUP BY user_id
       HAVING sum(CASE WHEN rn <= 1 THEN 1 ELSE 0 END) = 1
          AND max(CASE WHEN rn = 2 THEN txt END) IS NOT NULL),
br AS (SELECT prefix_fp, resp, min(user_id) AS rep_conv, count(*) AS n
       FROM pc GROUP BY prefix_fp, resp),
sc AS (SELECT prefix_fp, resp, rep_conv,
              CAST(sum(n) OVER (PARTITION BY prefix_fp) AS BIGINT)
                AS n_convs,
              row_number() OVER (PARTITION BY prefix_fp
                                 ORDER BY length(resp) DESC, resp DESC)
                AS w
       FROM br),
ch AS (SELECT prefix_fp, resp AS chosen_resp, rep_conv AS chosen_conv
       FROM sc WHERE w = 1)
SELECT sc.prefix_fp,
       sc.n_convs,
       ch.chosen_conv,
       sc.rep_conv AS rejected_conv,
       md5(ch.chosen_resp) AS chosen_fp,
       md5(sc.resp) AS rejected_fp,
       CAST(length(ch.chosen_resp) AS BIGINT) AS chosen_len,
       CAST(length(sc.resp) AS BIGINT) AS rejected_len
FROM sc JOIN ch USING (prefix_fp)
WHERE sc.resp <> ch.chosen_resp
"""


def q_epoch_shuffle(spark, sf):
    """Deterministic per-epoch training-order shuffle (operators/
    sampling.py epoch_shuffle): documents ranked by a content-derived
    60-bit hash of (seed : doc_id), sharded by hash modulo — one exchange
    + per-shard local sorts, never a global range sort; the order is a
    pure function of (seed, key), so retries and engines agree
    bit-for-bit, which is exactly what the SQL twin checks."""
    from relational_data_loader_spark.operators.sampling import epoch_shuffle

    docs = _t(spark, sf, "documents").select("doc_id")
    return epoch_shuffle(docs, "doc_id", seed=42, n_shards=8)


SQL_EPOCH_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hkey
  FROM documents)
SELECT doc_id,
       CAST(hkey % 8 AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hkey % 8 ORDER BY hkey, doc_id)
            AS INT) AS pos
FROM h
"""


def q_cdc_dedup_erasure_state(spark, sf):
    """Corpus dedup as a CDC WRITER (operators/transcript.py
    dedup_drop_list): the change log is replayed with a mirrored twin of
    every conversation unioned in (so conversation-level duplicates
    actually exist), exact conversation dedup elects keepers over the
    LIVE table, and the drop set is applied as ordinary DELETE envelopes
    at a fresh lsn through the incremental merge — never a table rewrite.
    The payoff over a rewrite is lineage: the drop is an auditable,
    replayable change event (CDF consumers see D rows; time travel still
    serves the pre-dedup state; a kill mid-apply resumes exactly-once).
    The final visible table must hash-equal the oracle's
    keeper-filtered LWW state; the entry HARD-FAILS if the delete epoch
    didn't actually apply as an incremental merge with deletions."""
    import shutil

    from relational_data_loader_spark.operators.transcript import (
        dedup_drop_list,
    )
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "dedup_erase")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    mirror = log.withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_m"))
    )
    log.unionByName(mirror).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)
    state = tbl.read()
    drops = dedup_drop_list(state, "conv_id", "turn_idx", "text")
    max_lsn = int(tbl.watermark())
    # one D envelope per surviving turn of each dropped conversation, at
    # a fresh lsn; payload columns NULL per the delete-envelope contract
    payload_types = {f.name: f.dataType for f in log.schema.fields}
    dels = state.join(drops, "conv_id").select(
        F.lit(max_lsn + 1).cast("long").alias("lsn"),
        F.lit("D").alias("op"),
        "conv_id",
        "turn_idx",
        *[
            F.lit(None).cast(payload_types[c]).alias(c)
            for c in ("role", "text", "tool", "ts")
        ],
    )
    dels.write.mode("append").parquet(log_dir)
    r = mgr.run(spec)
    if r.decision.kind != "incremental" or r.rows_deleted == 0:
        raise AssertionError(
            f"dedup deletes did not apply incrementally: "
            f"{r.decision.kind}, dels={r.rows_deleted}"
        )
    return tbl.read()


# keeper-filtered LWW state over the mirrored log: group conversations by
# their ordered text sequence (the same partition assemble_conversations'
# 0x1F-joined md5 induces — any injective signature yields identical
# groups), keep min(conv_id) per group ('5' < '5_m', so originals win)
SQL_DEDUP_ERASURE_STATE = f"""
WITH src AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id, event_id, event_type, props, ts
  FROM events
  UNION ALL
  SELECT CAST(user_id AS VARCHAR) || '_m', event_id, event_type, props, ts
  FROM events),
ranked AS (
  SELECT conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         event_type AS role,
         event_type || ':' || props AS text,
         substr(props, 1, 8) AS tool,
         ts,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY conv_id, event_id % 37
                            ORDER BY event_id DESC) AS rn
  FROM src),
final AS (
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM ranked WHERE rn = 1 AND NOT is_del),
asm AS (
  SELECT conv_id,
         string_agg(text, chr(31) ORDER BY turn_idx) AS sig
  FROM final GROUP BY conv_id),
keep AS (SELECT sig, min(conv_id) AS keeper FROM asm GROUP BY sig)
SELECT f.conv_id, f.turn_idx, f.role, f.text, f.tool, f.ts
FROM final f
JOIN asm a USING (conv_id)
JOIN keep k ON a.sig = k.sig AND f.conv_id = k.keeper
"""


def q_asof_enrich(spark, sf):
    """Generic merge_asof (operators/asof.py): each error event enriched
    with the latest prior click (backward, tolerance 500 event-ids) AND
    the next following view (forward, same tolerance) per user — the
    union-window as-of join, one |L|+|R| shuffle per direction, never a
    range-predicate join. The oracle is DuckDB's native ASOF JOIN with
    the tolerance applied as a post-join mask."""
    from relational_data_loader_spark.operators.asof import merge_asof

    ev = _t(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "props"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "props"
    )
    back = merge_asof(
        errors, clicks, by="user_id", on="event_id",
        value_cols=["props"], direction="backward", tolerance=500,
        suffix="_prev",
    )
    both = merge_asof(
        back, views, by="user_id", on="event_id",
        value_cols=["props"], direction="forward", tolerance=500,
        suffix="_next",
    )
    return both.select(
        "user_id",
        "event_id",
        "props_prev",
        F.col("_asof_on_prev").alias("prev_click_id"),
        "props_next",
        F.col("_asof_on_next").alias("next_view_id"),
    )


SQL_ASOF_ENRICH = """
WITH l AS (SELECT user_id, event_id FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, event_id, props FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, event_id, props FROM events WHERE event_type = 'view'),
b AS (
  SELECT l.user_id, l.event_id,
         CASE WHEN c.event_id IS NOT NULL
                AND l.event_id - c.event_id <= 500
              THEN c.props END AS props_prev,
         CASE WHEN c.event_id IS NOT NULL
                AND l.event_id - c.event_id <= 500
              THEN CAST(c.event_id AS DOUBLE) END AS prev_click_id
  FROM l ASOF LEFT JOIN c
    ON l.user_id = c.user_id AND l.event_id >= c.event_id)
SELECT b.user_id, b.event_id, b.props_prev, b.prev_click_id,
       CASE WHEN v.event_id IS NOT NULL
              AND v.event_id - b.event_id <= 500
            THEN v.props END AS props_next,
       CASE WHEN v.event_id IS NOT NULL
              AND v.event_id - b.event_id <= 500
            THEN CAST(v.event_id AS DOUBLE) END AS next_view_id
FROM b ASOF LEFT JOIN v
  ON b.user_id = v.user_id AND b.event_id <= v.event_id
"""


def q_json_schema_drift(spark, sf):
    """Semi-structured schema drift (operators/quality.py
    json_schema_drift): keys added/removed per 250-event epoch over a
    deterministically-evolving JSON payload (a rotating u0/u1 key every
    epoch, 'extra' on every third, 'sess' from epoch 2) — the
    schema-on-read monitor for CDC sources whose JSON producers evolve
    without a registry. The per-row key explode collapses straight into
    a distinct (epoch, key) frame; drift is two anti-joins of that tiny
    frame against its epoch-shifted self."""
    from relational_data_loader_spark.operators.quality import (
        json_schema_drift,
    )

    ev = _t(spark, sf, "events")
    epoch = F.floor(F.col("event_id") / 250)
    j = F.concat(
        F.lit('{"k":'),
        (F.col("event_id") % 100).cast("string"),
        F.when(epoch % 3 == 0, F.lit(',"extra":1')).otherwise(F.lit("")),
        F.when(epoch >= 2, F.lit(',"sess":"x"')).otherwise(F.lit("")),
        F.lit(',"u'),
        (epoch % 2).cast("string"),
        F.lit('":true}'),
    )
    src = ev.select(epoch.cast("long").alias("rel_epoch"), j.alias("payload"))
    return json_schema_drift(src, "payload", "rel_epoch")


SQL_JSON_SCHEMA_DRIFT = """
WITH src AS (
  SELECT CAST(event_id // 250 AS BIGINT) AS epoch,
         '{"k":' || CAST(event_id % 100 AS VARCHAR)
         || CASE WHEN (event_id // 250) % 3 = 0 THEN ',"extra":1' ELSE '' END
         || CASE WHEN event_id // 250 >= 2 THEN ',"sess":"x"' ELSE '' END
         || ',"u' || CAST((event_id // 250) % 2 AS VARCHAR) || '":true}' AS j
  FROM events),
keys AS (SELECT DISTINCT epoch, unnest(json_keys(j)) AS key FROM src),
epochs AS (SELECT DISTINCT epoch FROM keys),
prev AS (SELECT epoch + 1 AS epoch, key FROM keys)
SELECT k.epoch, k.key, 'added' AS status
FROM keys k
WHERE EXISTS (SELECT 1 FROM epochs e WHERE e.epoch = k.epoch - 1)
  AND NOT EXISTS (SELECT 1 FROM prev p
                  WHERE p.epoch = k.epoch AND p.key = k.key)
UNION ALL
SELECT p.epoch, p.key, 'removed' AS status
FROM prev p
WHERE EXISTS (SELECT 1 FROM epochs e WHERE e.epoch = p.epoch)
  AND NOT EXISTS (SELECT 1 FROM keys k2
                  WHERE k2.epoch = p.epoch AND k2.key = p.key)
"""


def q_asof_nearest(spark, sf):
    """merge_asof direction='nearest' (operators/asof.py): each error
    event snapped to the CLOSEST click by the same user in either
    direction (tie → backward, pinned), tolerance 300 event-ids. The
    oracle re-derives nearest from DuckDB's two directional ASOF joins
    with the same closest-pick/tie rule — proving the two-pass
    composition equals the declarative spec."""
    from relational_data_loader_spark.operators.asof import merge_asof

    ev = _t(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "props"
    )
    out = merge_asof(
        errors, clicks, by="user_id", on="event_id",
        value_cols=["props"], direction="nearest", tolerance=300,
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("props_r").alias("near_props"),
        F.col("_asof_on_r").alias("near_click_id"),
    )


SQL_ASOF_NEAREST = """
WITH l AS (SELECT user_id, event_id FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, event_id, props FROM events WHERE event_type = 'click'),
b AS (
  SELECT l.user_id, l.event_id,
         c.event_id AS b_id, c.props AS b_props
  FROM l ASOF LEFT JOIN c
    ON l.user_id = c.user_id AND l.event_id >= c.event_id),
f AS (
  SELECT l.user_id, l.event_id,
         c.event_id AS f_id, c.props AS f_props
  FROM l ASOF LEFT JOIN c
    ON l.user_id = c.user_id AND l.event_id <= c.event_id),
chosen AS (
  SELECT b.user_id, b.event_id,
         CASE WHEN b.b_id IS NOT NULL
                AND (f.f_id IS NULL
                     OR b.event_id - b.b_id <= f.f_id - b.event_id)
              THEN b.b_id ELSE f.f_id END AS near_id,
         CASE WHEN b.b_id IS NOT NULL
                AND (f.f_id IS NULL
                     OR b.event_id - b.b_id <= f.f_id - b.event_id)
              THEN b.b_props ELSE f.f_props END AS near_props
  FROM b JOIN f USING (user_id, event_id))
SELECT user_id, event_id,
       CASE WHEN near_id IS NOT NULL AND abs(event_id - near_id) <= 300
            THEN near_props END AS near_props,
       CASE WHEN near_id IS NOT NULL AND abs(event_id - near_id) <= 300
            THEN CAST(near_id AS DOUBLE) END AS near_click_id
FROM chosen
"""


def q_cdc_pii_scrub_state(spark, sf):
    """PII scrub as a CDC WRITER (functions/text.py redact_pii + the
    incremental merge): the change log is replayed with emails planted on
    a deterministic slice of U rows (lsn % 7 = 0), the live table is
    swept for PII, and the dirty turns are re-emitted as ordinary UPDATE
    envelopes at a fresh lsn — in-place legal scrubbing as an auditable,
    replayable change event instead of a table rewrite. Same payoff as
    dedup-as-CDC (cdc_dedup_erasure_state) on the update side: CDF
    consumers see U rows, time travel still serves the pre-scrub state,
    kill mid-apply resumes exactly-once, and at 10^10 rows the scrub
    epoch costs one merge over the dirty keys, not a full rewrite. The
    entry HARD-FAILS if the scrub didn't apply as an incremental merge
    with upserts and zero deletes, or if any PII survives the merge."""
    import shutil

    from relational_data_loader_spark.functions.text import (
        PII_EMAIL_PATTERN,
        redact_pii,
    )
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "pii_scrub")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    planted = log.withColumn(
        "text",
        F.when(
            (F.col("op") == "U") & (F.col("lsn") % 7 == 0),
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                F.col("conv_id"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.col("text")),
    )
    planted.write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)
    state = tbl.read()
    dirty = state.filter(F.col("text").rlike(PII_EMAIL_PATTERN))
    max_lsn = int(tbl.watermark())
    ups = dirty.select(
        F.lit(max_lsn + 1).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
        "conv_id",
        "turn_idx",
        "role",
        redact_pii(F.col("text")).alias("text"),
        "tool",
        "ts",
    )
    ups.write.mode("append").parquet(log_dir)
    r = mgr.run(spec)
    if (
        r.decision.kind != "incremental"
        or r.rows_upserted == 0
        or r.rows_deleted != 0
    ):
        raise AssertionError(
            f"PII scrub did not apply as incremental updates: "
            f"{r.decision.kind}, ups={r.rows_upserted}, dels={r.rows_deleted}"
        )
    out = tbl.read()
    if out.filter(F.col("text").rlike(PII_EMAIL_PATTERN)).count() != 0:
        raise AssertionError("PII survived the scrub merge")
    return out


# LWW over the planted log, then redaction of the final state — identical
# because redacting already-clean rows is the identity, and the scrub
# envelopes carry the redaction of each key's LWW winner.
SQL_PII_SCRUB_STATE = f"""
WITH ranked AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 37 AS INT) AS turn_idx,
         event_type AS role,
         CASE WHEN event_type <> '{DELETE_OP}' AND event_id % 7 = 0
              THEN event_type || ':' || props
                   || ' reach me at user' || CAST(user_id AS VARCHAR)
                   || '@example.com'
              ELSE event_type || ':' || props END AS text,
         substr(props, 1, 8) AS tool,
         ts,
         event_type = '{DELETE_OP}' AS is_del,
         row_number() OVER (PARTITION BY user_id, event_id % 37
                            ORDER BY event_id DESC) AS rn
  FROM events)
SELECT conv_id, turn_idx, role,
       regexp_replace(
         regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
         '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS text,
       tool, ts
FROM ranked WHERE rn = 1 AND NOT is_del
"""


def q_cdc_fast_count(spark, sf):
    """Metadata-only ``count(*)`` (sinks/snapshot.py fast_count): split
    replay (head full refresh + incremental tail, so the table carries
    REAL tombstones whose per-file counts the manifest must have recorded
    exactly), then the live-row count computed from manifest stats alone —
    Σ(footer rows − tombstones), zero file opens, zero Spark jobs; the
    scan-less count Iceberg answers from manifest-entry stats. The entry
    HARD-FAILS if fast_count fell back to a scan (``source != manifest``):
    a silent fallback would make this a test of ``read().count()``, not of
    the manifest arithmetic. The single returned row must equal the
    oracle's count over the replayed LWW final state."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "fastcount")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    cut = int(log.agg(F.max("lsn")).first()[0]) // 2
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    log.filter(F.col("lsn") <= cut).write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)
    log.filter(F.col("lsn") > cut).write.mode("append").parquet(log_dir)
    mgr.run(spec)
    fc = mgr.table(spec).fast_count()
    if fc["source"] != "manifest":
        raise AssertionError(f"fast_count fell back to a scan: {fc}")
    return spark.createDataFrame(
        [(int(fc["live_rows"]),)], "live_rows bigint"
    )


SQL_FAST_COUNT = f"""
SELECT count(*) AS live_rows FROM ({SQL_ENGINE_FINAL_STATE})
"""


def q_bloom_pruned_lookup(spark, sf):
    """Manifest bloom-filter point lookup, driver-checked end to end
    (sinks/snapshot.py build_blooms/point_lookup): full replay, range-split
    sort compaction (32 files), blooms built over ``text`` — the
    high-cardinality VISIBLE column that neither bucket pruning (conv_id
    is the bucket key, not text) nor zone maps (256-char stat cap + no
    clustering) can serve — then an exact-text lookup of one
    deterministically chosen conversation's opening turns. The probe is a
    driver-side metadata test, so the files-to-open decision costs zero
    file opens; the entry HARD-FAILS if the blooms pruned nothing, and
    the returned rows must hash-equal the oracle's IN-subquery over the
    replayed LWW state (false positives cost a pruned-in file that the
    residual filter empties — never a wrong row)."""
    import shutil

    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "bloom")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    _derived_changelog(spark, sf).write.mode("overwrite").parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)
    tbl.optimize(sort_cols=["turn_idx"], files_per_bucket=4)
    tbl.build_blooms(["text"])
    final = tbl.read()
    # deterministic probe set: the lexicographically first conversation's
    # turns ≤ 2 (control-plane collects: one 1-row agg + ≤3 probe rows)
    first_conv = final.agg(F.min("conv_id")).first()[0]
    probes = [
        r["text"]
        for r in final.filter(
            (F.col("conv_id") == first_conv) & (F.col("turn_idx") <= 2)
        )
        .select("text")
        .collect()
        if r["text"] is not None
    ]
    rep = tbl.bloom_prune_report("text", probes)
    if not rep["files_skipped"]:
        raise AssertionError(f"blooms pruned no files: {rep}")
    return tbl.point_lookup("text", probes)


SQL_BLOOM_LOOKUP = f"""
WITH final AS ({SQL_ENGINE_FINAL_STATE}),
probe AS (
  SELECT text FROM final
  WHERE conv_id = (SELECT min(conv_id) FROM final)
    AND turn_idx <= 2 AND text IS NOT NULL)
SELECT f.conv_id, f.turn_idx, f.role, f.text, f.tool, f.ts
FROM final f
WHERE f.text IN (SELECT text FROM probe)
"""


def q_bloom_join_filter(spark, sf):
    """Runtime bloom semi-join pruning (operators/runtime_filter.py
    bloom_semi_filter): a selective dim side (urgent 1995 orders) builds a
    16 KB bloom in one partial-aggregated pass; the fact scan (lineitem)
    is prefiltered by the whole-stage-codegen probe BEFORE its join
    exchange, so non-joining rows never shuffle — the explicit form of
    Spark's runtime bloom join, reusable across queries. The final join
    drops any false positives, so the revenue rollup must hash-equal the
    plain-join oracle exactly — the pruning is invisible to results by
    construction, and that invariance is what this entry pins."""
    from relational_data_loader_spark.operators.runtime_filter import (
        bloom_semi_filter,
    )

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    dim = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    ).select("o_orderkey")
    pruned, stats = bloom_semi_filter(
        li, dim, "l_orderkey", "o_orderkey", m_bits=1 << 17, k=3
    )
    if not 0 < stats["fill"] < 0.5:
        raise AssertionError(f"bloom fill out of range: {stats}")
    return (
        pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


SQL_BLOOM_JOIN = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN (SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND year(o_orderdate) = 1995) d
  ON l_orderkey = d.o_orderkey
GROUP BY 1
"""


def q_skyline_orders(spark, sf):
    """Distributed Pareto frontier (operators/skyline.py skyline_2d):
    the orders not strictly dominated under (maximize o_totalprice,
    minimize o_orderdate) — "no other order is both bigger and earlier".
    The naive form is an O(n²) NOT-EXISTS self-join; the operator prunes
    map-side with a zero-shuffle per-Arrow-batch skyline (dominated in a
    batch ⇒ dominated globally), then runs the exact sort-cummin sweep on
    the surviving distinct pairs. The oracle deliberately IS the naive
    NOT-EXISTS formulation — an algorithm-independent statement of
    dominance semantics, so the pruned plan is checked against the
    definition, not against itself."""
    from relational_data_loader_spark.operators.skyline import skyline_2d

    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return skyline_2d(o, "o_totalprice", "o_orderdate")


SQL_SKYLINE_ORDERS = """
SELECT a.o_totalprice, a.o_orderdate, a.o_orderkey
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_totalprice >= a.o_totalprice
    AND b.o_orderdate <= a.o_orderdate
    AND (b.o_totalprice > a.o_totalprice OR b.o_orderdate < a.o_orderdate))
"""


def q_record_linkage(spark, sf):
    """Entity resolution (operators/linkage.py blocked_edit_linkage):
    a deterministically dirtied twin of the customer table (id shifted
    +10M, '#'→'-' in every name, a trailing 'x' on every 14th) is linked
    back against the clean table by blocking on (nation, segment) and
    verifying candidates with threshold-banded Levenshtein ≤ 2 — the
    Fellegi–Sunter candidate/verify split that keeps comparisons at
    Σ block² instead of corpus². The planted corruptions guarantee every
    dirty row re-finds its source at distance 1–2; cross-matches to
    near-identical serial names inside the same block are kept too (they
    are what the verify stage is FOR — the oracle recomputes the exact
    same candidate set and band)."""
    from relational_data_loader_spark.operators.linkage import (
        blocked_edit_linkage,
    )

    cust = _t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    dirty = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
        F.when(
            F.col("c_custkey") % 14 == 0,
            F.concat(F.regexp_replace("c_name", "#", "-"), F.lit("x")),
        )
        .otherwise(F.regexp_replace("c_name", "#", "-"))
        .alias("c_name"),
        "c_nationkey",
        "c_mktsegment",
    )
    return blocked_edit_linkage(
        dirty,
        cust,
        "c_custkey",
        "c_name",
        ["c_nationkey", "c_mktsegment"],
        max_dist=2,
    )


SQL_RECORD_LINKAGE = """
WITH dirty AS (
  SELECT c_custkey + 10000000 AS id,
         lower(trim(CASE WHEN c_custkey % 14 = 0
                         THEN replace(c_name, '#', '-') || 'x'
                         ELSE replace(c_name, '#', '-') END)) AS name,
         c_nationkey, c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0),
clean AS (
  SELECT c_custkey AS id, lower(trim(c_name)) AS name,
         c_nationkey, c_mktsegment
  FROM customer)
SELECT d.id AS left_id, c.id AS right_id,
       CAST(levenshtein(d.name, c.name) AS INTEGER) AS edit_dist
FROM dirty d
JOIN clean c USING (c_nationkey, c_mktsegment)
WHERE d.id <> c.id AND levenshtein(d.name, c.name) <= 2
"""


def q_psi_drift(spark, sf):
    """Population Stability Index drift monitor (operators/quality.py
    psi_drift): each event_type's value histogram in the second half of
    the time range scored against the first half — the integrated-shift
    companion to source_length_ks's sup-norm statistic. Equal-width bins
    over the reference period's exact [min,max] (never engine-specific
    quantiles), Laplace-smoothed, clamp-then-cast binning, floor-divide
    midpoint — every choice made so the DuckDB twin is bit-compatible at
    4 dp. One data shuffle; the grid/edge joins are broadcast metadata."""
    from relational_data_loader_spark.operators.quality import psi_drift

    ev = _t(spark, sf, "events").select("event_type", "value", "ts")
    return psi_drift(ev, "event_type", "value", "ts")


SQL_PSI_DRIFT = """
WITH ev0 AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v, epoch_us(ts) AS t
  FROM events),
mid AS (
  SELECT CAST(floor((min(t) + max(t)) / 2.0) AS BIGINT) AS t_mid FROM ev0),
ev AS (
  SELECT g, v, CASE WHEN t < t_mid THEN 'ref' ELSE 'cur' END AS period
  FROM ev0 CROSS JOIN mid),
edges AS (
  SELECT g, min(v) AS vmin, (max(v) - min(v)) / 10 AS width
  FROM ev WHERE period = 'ref' GROUP BY g),
binned AS (
  SELECT e.g, period,
         CASE WHEN width = 0 THEN 0
              ELSE CAST(greatest(0.0, least(9.0,
                        floor((v - vmin) / width))) AS INTEGER) END AS bin,
         count(*) AS cnt
  FROM ev e JOIN edges USING (g) GROUP BY 1, 2, 3),
grid AS (
  SELECT g, bin FROM edges
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin)),
tot AS (
  SELECT g,
         CAST(sum(CASE WHEN period = 'ref' THEN cnt ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(sum(CASE WHEN period = 'cur' THEN cnt ELSE 0 END) AS BIGINT)
           AS n_cur
  FROM binned GROUP BY g),
full_grid AS (
  SELECT grid.g, grid.bin,
         coalesce(r.cnt, 0) AS cnt_ref, coalesce(c.cnt, 0) AS cnt_cur,
         tot.n_ref, tot.n_cur
  FROM grid
  LEFT JOIN binned r ON r.g = grid.g AND r.bin = grid.bin
                     AND r.period = 'ref'
  LEFT JOIN binned c ON c.g = grid.g AND c.bin = grid.bin
                     AND c.period = 'cur'
  JOIN tot ON tot.g = grid.g)
SELECT g AS event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       CAST(round(sum(
         ((cnt_ref + 0.5) / (n_ref + 5.0) - (cnt_cur + 0.5) / (n_cur + 5.0))
         * ln(((cnt_ref + 0.5) / (n_ref + 5.0))
              / ((cnt_cur + 0.5) / (n_cur + 5.0)))), 4) AS DOUBLE) AS psi
FROM full_grid
GROUP BY g
"""


def q_cdc_dblog_backfill_state(spark, sf):
    """Late-started tailer repaired by DBLog-style chunked backfill
    (plans/backfill.py): the log's oldest third has expired, so the
    bootstrap full-refresh only covers the middle window — every key
    whose history ended in the expired third is missing. The source
    snapshot at bootstrap time (LWW-alive rows carrying their own
    last-change lsns) is then merged in 4 key-hash chunks, each an
    idempotent epoch in the ``backfill`` namespace, INTERLEAVED with two
    ordinary incremental runs that keep applying the live tail — the
    exact snapshot-vs-stream race DBLog resolves with log watermarks,
    resolved here by the sink's existing version-guarded LWW merge
    (stream lsns > snapshot lsns; merge-path tombstones out-rank
    snapshot inserts, so deletes landing mid-backfill never resurrect).
    Oracle: the full-log LWW replay — bootstrap gap, 4 chunks, and both
    interleaved tails must be invisible in the final state."""
    import shutil

    from relational_data_loader_spark.plans.backfill import backfill_chunks
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    base = _state_workdir(sf, "dblog")
    shutil.rmtree(base, ignore_errors=True)
    log_dir = os.path.join(base, "log")
    log = _derived_changelog(spark, sf)
    mx = log.agg(F.max("lsn")).first()[0]
    cut1, cut2, cut3 = mx // 3, 2 * mx // 3, 5 * mx // 6

    # bootstrap: only the (cut1, cut2] window survives retention
    log.filter((F.col("lsn") > cut1) & (F.col("lsn") <= cut2)).write.mode(
        "overwrite"
    ).parquet(log_dir)
    spec = transcripts_spec(source=f"parquet://{log_dir}", target_buckets=8)
    mgr = DataLoadManager(spark, os.path.join(base, "wh"))
    mgr.run(spec)
    tbl = mgr.table(spec)

    # source snapshot AT the bootstrap point (cut2): alive rows + their
    # true last-change lsns (in production: a chunked SELECT of the live
    # source; freshness >= bootstrap is the one requirement — see module)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("lsn"))
    # persist the snapshot ONCE (r6): each of the 4 backfill chunks is a
    # hash-filtered slice of this frame, and without the cache every
    # chunk's merge re-ran the full LWW window over the log (4×). In
    # production the snapshot is a chunked SELECT of the live source —
    # i.e. read per chunk, not recomputed per chunk — so the cache is the
    # faithful model, not a shortcut.
    snap = (
        log.filter(F.col("lsn") <= cut2)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .drop("_rn")
        .persist()
    )

    gen = backfill_chunks(tbl, snap, "conv_id", n_chunks=4)
    next(gen), next(gen)  # chunks 0-1
    log.filter(F.col("lsn") <= cut3).write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)  # live tail (cut2, cut3] lands mid-backfill
    next(gen), next(gen)  # chunks 2-3 race the just-applied tail
    log.write.mode("overwrite").parquet(log_dir)
    mgr.run(spec)  # remaining tail (cut3, mx]
    snap.unpersist(blocking=False)
    return tbl.read()


_DECAY_HL_S = 30 * 24 * 3600.0  # 30-day half-life


def q_decayed_score_ivm(spark, sf):
    """Incrementally maintained exponential-decay engagement score
    (operators/incremental.py decayed_rollup/advance_decayed): per-user
    Σ value·0.5^((T−t)/30d). The decayed sum is a plain sum in the
    anchored domain, so the state never rescans history — this entry
    splits the log at the 80% time mark, aggregates the base at the
    early anchor, folds the tail with one rescale + outer merge, and the
    oracle recomputes the WHOLE log directly at the final anchor: the
    rescale algebra (pow(a)·pow(b)=pow(a+b), distributed over the sum)
    is verified against the definition, not against itself. Anchors are
    exact microsecond literals (one 1-row control-plane agg)."""
    from relational_data_loader_spark.operators.incremental import (
        advance_decayed,
        decayed_rollup,
    )

    ev = _t(spark, sf, "events").select("user_id", "value", "ts")
    r = ev.agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("t0"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("t1"),
    ).first()
    t_split = r["t0"] + (r["t1"] - r["t0"]) * 4 // 5
    a_mid = F.timestamp_micros(F.lit(t_split))
    a_end = F.timestamp_micros(F.lit(r["t1"]))

    base = ev.filter(F.unix_micros(F.col("ts").cast("timestamp")) < t_split)
    tail = ev.filter(F.unix_micros(F.col("ts").cast("timestamp")) >= t_split)
    state = decayed_rollup(base, "user_id", "value", "ts", _DECAY_HL_S, a_mid)
    delta = decayed_rollup(tail, "user_id", "value", "ts", _DECAY_HL_S, a_end)
    merged = advance_decayed(state, delta, a_mid, a_end, _DECAY_HL_S)
    return merged.select(
        F.col("key").alias("user_id"),
        F.round("score", 4).cast("double").alias("score"),
    )


SQL_DECAYED_SCORE = """
WITH span AS (SELECT epoch_us(max(ts)) AS t1 FROM events)
SELECT user_id,
       CAST(round(sum(value * power(0.5,
              CAST(t1 - epoch_us(ts) AS DOUBLE) / 2592000000000.0)), 4)
            AS DOUBLE) AS score
FROM events CROSS JOIN span
GROUP BY user_id
"""


QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "cdc_lww_net": (q_cdc_lww_net, SQL_LWW_NET),
    "cdc_apply_final_state": (q_cdc_apply_final_state, SQL_APPLY_FINAL),
    "cdc_watermarks": (q_cdc_watermarks, SQL_WATERMARKS),
    "cdc_op_split": (q_cdc_op_split, SQL_OP_SPLIT),
    "cdc_change_scan": (q_cdc_change_scan, SQL_CHANGE_SCAN),
    "cdc_projection_cast": (q_cdc_projection_cast, SQL_PROJECTION_CAST),
    "cdc_delete_keys": (q_cdc_delete_keys, SQL_DELETE_KEYS),
    "cdc_ct_probe": (q_cdc_ct_probe, SQL_CT_PROBE),
    "merge_full_outer": (q_merge_full_outer, SQL_MERGE_FULL_OUTER),
    "salted_hot_key_agg": (q_salted_hot_key_agg, SQL_SALTED_AGG),
    "hot_key_probe": (q_hot_key_probe, SQL_HOT_KEY_PROBE),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "topk_orders_per_customer": (q_topk_orders_per_customer, SQL_TOPK_ORDERS),
    "sessionize_events": (q_sessionize, SQL_SESSIONIZE),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_LSH_PAIRS),
    "near_dup_pairs": (q_near_dup_pairs, SQL_NEAR_DUP),
    "incremental_near_dup": (q_incremental_near_dup, SQL_INCR_NEAR_DUP),
    "simhash_signatures": (q_simhash_signatures, _simhash_sql()),
    "token_jaccard_pairs": (q_token_jaccard_pairs, SQL_JACCARD),
    "ngram_containment_pairs": (q_ngram_containment_pairs, SQL_NGRAM_CONTAINMENT),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "lang_stopword_ratio": (q_lang_stopword_ratio, SQL_STOPWORD_RATIO),
    "text_fingerprints": (q_text_fingerprints, SQL_TEXT_FINGERPRINTS),
    "embedding_cosine_topk": (q_embedding_cosine_topk, SQL_COSINE_TOPK),
    "set_ops_inactive_customers": (q_set_ops_inactive_customers, SQL_SET_OPS),
    "top_orders_global": (q_top_orders_global, SQL_TOP_ORDERS),
    "asof_last_click_before_error": (q_asof_last_click_before_error, SQL_ASOF),
    "cdc_audit_columns": (q_cdc_audit_columns, SQL_AUDIT_COLUMNS),
    "normalize_text_nfc": (q_normalize_text_nfc, SQL_NORMALIZE_NFC),
    "lsh_cosine_topk": (q_lsh_cosine_topk, _lsh_sql()),
    "cdc_debezium_parse": (q_cdc_debezium_parse, SQL_DEBEZIUM_PARSE),
    "ivf_cosine_topk": (q_ivf_cosine_topk, _ivf_sql()),
    "ivf_cell_ivm": (q_ivf_cell_ivm, _ivf_cells_sql()),
    "ivf_cosine_topk_refined": (q_ivf_cosine_topk_refined, _ivf_refined_sql()),
    "embedding_near_dup": (q_embedding_near_dup, _embedding_near_dup_sql()),
    "windowed_rollup": (q_windowed_rollup, SQL_WINDOWED_ROLLUP),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "lang_id_ngram": (q_lang_id_ngram, _lang_id_sql()),
    "doc_repetition_stats": (q_doc_repetition_stats, _repetition_sql()),
    "cdc_scd2_history": (q_cdc_scd2_history, SQL_SCD2_HISTORY),
    "cdc_snapshot_asof": (q_cdc_snapshot_asof, SQL_SNAPSHOT_ASOF),
    "doc_frequency_topk": (q_doc_frequency_topk, SQL_DOC_FREQUENCY),
    "stratified_sample": (q_stratified_sample, _stratified_sample_sql()),
    "transcript_assembly": (q_transcript_assembly, SQL_TRANSCRIPT_ASSEMBLY),
    "context_window_assembly": (q_context_window_assembly, SQL_CONTEXT_WINDOWS),
    "conversation_dedup": (q_conversation_dedup, SQL_CONVERSATION_DEDUP),
    "transcript_integrity": (q_transcript_integrity, SQL_TRANSCRIPT_INTEGRITY),
    "cdc_snapshot_diff": (q_cdc_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "cdc_incremental_rollup": (q_cdc_incremental_rollup, SQL_INCREMENTAL_ROLLUP),
    "interval_event_rollup": (q_interval_event_rollup, SQL_INTERVAL_ROLLUP),
    "interval_overlap_join": (q_interval_overlap_join, SQL_INTERVAL_OVERLAP),
    "ngram_contamination": (q_ngram_contamination, SQL_NGRAM_CONTAMINATION),
    "repeated_ngrams": (q_repeated_ngrams, SQL_REPEATED_NGRAMS),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "token_length_histogram": (q_token_length_histogram, SQL_TOKEN_HISTOGRAM),
    "event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "rolling_event_stats": (q_rolling_event_stats, SQL_ROLLING_EVENT_STATS),
    "group_quantiles": (q_group_quantiles, SQL_GROUP_QUANTILES),
    "corpus_build": (q_corpus_build, _corpus_build_sql()),
    "cdc_quarantine_split": (q_cdc_quarantine_split, SQL_QUARANTINE_SPLIT),
    "posting_index_ivm": (q_posting_index_ivm, SQL_POSTING_INDEX_IVM),
    "posting_lookup": (q_posting_lookup, SQL_POSTING_LOOKUP),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "hybrid_search_rrf": (q_hybrid_search_rrf, SQL_HYBRID_RRF),
    "embedding_decontam": (q_embedding_decontam, SQL_EMBEDDING_DECONTAM),
    "leakage_safe_split": (q_leakage_safe_split, _leakage_split_sql()),
    "sequence_packing": (q_sequence_packing, SQL_SEQUENCE_PACKING),
    "session_window_rollup": (q_session_window_rollup, SQL_SESSION_WINDOW),
    "cdc_full_refresh_state": (q_cdc_full_refresh_state, SQL_ENGINE_FINAL_STATE),
    "cdc_log_compaction_state": (q_cdc_log_compaction_state, SQL_ENGINE_FINAL_STATE),
    "cdc_incremental_merge_state": (
        q_cdc_incremental_merge_state,
        SQL_ENGINE_FINAL_STATE,
    ),
    "cdc_mor_merge_state": (q_cdc_mor_merge_state, SQL_ENGINE_FINAL_STATE),
    "cdc_mor_read_optimized": (q_cdc_mor_read_optimized, SQL_ROLLBACK_STATE),
    "cdc_clone_state": (q_cdc_clone_state, SQL_ENGINE_FINAL_STATE),
    "cdc_mor_compaction_state": (
        q_cdc_mor_compaction_state,
        SQL_ENGINE_FINAL_STATE,
    ),
    "cdc_schema_evolution_state": (
        q_cdc_schema_evolution_state,
        SQL_SCHEMA_EVOLUTION_STATE,
    ),
    "cdc_compaction_state": (q_cdc_compaction_state, SQL_ENGINE_FINAL_STATE),
    "cdc_zone_pruned_read": (q_cdc_zone_pruned_read, SQL_ZONE_PRUNED_READ),
    "cdc_wap_publish_state": (q_cdc_wap_publish_state, SQL_ENGINE_FINAL_STATE),
    "cdc_shadow_rebuild_diff": (q_cdc_shadow_rebuild_diff, SQL_SHADOW_REBUILD_DIFF),
    "cdc_chunked_backlog_state": (q_cdc_chunked_backlog_state, SQL_ENGINE_FINAL_STATE),
    "cdc_salted_merge_state": (q_cdc_salted_merge_state, SQL_ENGINE_FINAL_STATE),
    "cdc_dq_audit_counts": (q_cdc_dq_audit_counts, SQL_DQ_AUDIT_COUNTS),
    "cdc_rollback_state": (q_cdc_rollback_state, SQL_ROLLBACK_STATE),
    "cdc_streaming_state": (q_cdc_streaming_state, SQL_ENGINE_FINAL_STATE),
    "cdc_streaming_debezium_state": (
        q_cdc_streaming_debezium_state,
        SQL_ENGINE_FINAL_STATE,
    ),
    "cdc_redelivery_state": (q_cdc_redelivery_state, SQL_ENGINE_FINAL_STATE),
    "gdpr_erasure_cascade": (q_gdpr_erasure_cascade, SQL_GDPR_ERASURE),
    "cdc_consistent_cut": (q_cdc_consistent_cut, SQL_CONSISTENT_CUT),
    "bitemporal_asof": (q_bitemporal_asof, SQL_BITEMPORAL_ASOF),
    "anomaly_zscore": (q_anomaly_zscore, SQL_ANOMALY_Z),
    "cdc_staleness_report": (q_cdc_staleness_report, SQL_STALENESS),
    "window_rank_stats": (q_window_rank_stats, SQL_WINDOW_RANK),
    "label_centroid_cohesion": (q_label_centroid_cohesion, SQL_CENTROID_COHESION),
    "cdc_reconciliation_state": (q_cdc_reconciliation_state, SQL_RECONCILIATION),
    "reconcile_drilldown": (q_reconcile_drilldown, SQL_RECONCILE_DRILLDOWN),
    "cdc_txn_publish_state": (q_cdc_txn_publish_state, SQL_TXN_PUBLISH),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP_PRICING),
    "pivot_user_event_matrix": (q_pivot_user_event_matrix, SQL_PIVOT_MATRIX),
    "dq_expectations": (q_dq_expectations, SQL_DQ_EXPECTATIONS),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "out_of_order_stats": (q_out_of_order_stats, SQL_OUT_OF_ORDER),
    "sliding_window_rollup": (q_sliding_window_rollup, SQL_SLIDING_WINDOW),
    "cdc_watermark_drops": (q_cdc_watermark_drops, SQL_WATERMARK_DROPS),
    "json_props_extract": (q_json_props_extract, SQL_JSON_PROPS),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "group_stats_suite": (q_group_stats_suite, SQL_GROUP_STATS),
    "kmv_distinct_tokens": (q_kmv_distinct_tokens, SQL_KMV_DISTINCT),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "cdc_gap_check": (q_cdc_gap_check, SQL_GAP_CHECK),
    "live_key_timeline": (q_live_key_timeline, SQL_LIVE_TIMELINE),
    "unigram_surprisal": (q_unigram_surprisal, SQL_SURPRISAL),
    "dsir_selection": (q_dsir_selection, SQL_DSIR),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "last_touch_attribution": (q_last_touch_attribution, SQL_ATTRIBUTION),
    "shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "big_spenders": (q_big_spenders, SQL_BIG_SPENDERS),
    "scd2_temporal_join": (q_scd2_temporal_join, SQL_SCD2_TEMPORAL_JOIN),
    "fk_orphan_audit": (q_fk_orphan_audit, SQL_FK_ORPHAN_AUDIT),
    "event_transition_matrix": (q_event_transition_matrix, SQL_EVENT_TRANSITIONS),
    "timeseries_gapfill": (q_timeseries_gapfill, SQL_TIMESERIES_GAPFILL),
    "late_shipment_priorities": (q_late_shipment_priorities, SQL_LATE_SHIPMENTS),
    "doc_chunking": (q_doc_chunking, SQL_DOC_CHUNKING),
    "quality_curriculum_sample": (q_quality_curriculum_sample, SQL_CURRICULUM_SAMPLE),
    "minhash_estimate_audit": (q_minhash_estimate_audit, SQL_MINHASH_AUDIT),
    "winsorized_stats": (q_winsorized_stats, SQL_WINSORIZED),
    "period_over_period": (q_period_over_period, SQL_PERIOD_OVER_PERIOD),
    "customer_order_distribution": (q_customer_order_distribution, SQL_CUSTDIST),
    "doc_novelty": (q_doc_novelty, SQL_DOC_NOVELTY),
    "cross_source_overlap": (q_cross_source_overlap, SQL_CROSS_SOURCE_OVERLAP),
    "embedding_norm_audit": (q_embedding_norm_audit, SQL_EMBEDDING_NORM_AUDIT),
    "large_orders": (q_large_orders, SQL_LARGE_ORDERS),
    "small_quantity_revenue": (q_small_quantity_revenue, SQL_SMALL_QTY_REVENUE),
    "bigram_surprisal": (q_bigram_surprisal, SQL_BIGRAM_SURPRISAL),
    "daily_rate_anomaly": (q_daily_rate_anomaly, SQL_DAILY_RATE_ANOMALY),
    "funnel_latency": (q_funnel_latency, SQL_FUNNEL_LATENCY),
    "per_group_sample": (q_per_group_sample, SQL_PER_GROUP_SAMPLE),
    "edit_distance_near_dup": (
        q_edit_distance_near_dup,
        SQL_EDIT_DISTANCE_NEAR_DUP,
    ),
    "bpe_merge_candidates": (q_bpe_merge_candidates, SQL_BPE_MERGE),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "sq8_cosine_topk": (q_sq8_cosine_topk, SQL_SQ8_COSINE_TOPK),
    "sq8_recall_audit": (q_sq8_recall_audit, SQL_SQ8_RECALL),
    "zorder_file_stats": (q_zorder_file_stats, SQL_ZORDER_FILE_STATS),
    "zorder_skipping_gain": (q_zorder_skipping_gain, SQL_ZORDER_GAIN),
    "cms_frequency_audit": (q_cms_frequency_audit, SQL_CMS_AUDIT),
    "kmv_merge_rollup": (q_kmv_merge_rollup, SQL_KMV_MERGE_ROLLUP),
    "salted_join_rollup": (q_salted_join_rollup, SQL_SALTED_JOIN),
    "pmi_collocations": (q_pmi_collocations, SQL_PMI_COLLOCATIONS),
    "volume_trend": (q_volume_trend, SQL_VOLUME_TREND),
    "pagerank_docs": (q_pagerank_docs, _pagerank_sql()),
    "hist_quantile_rollup": (q_hist_quantile_rollup, SQL_HIST_QUANTILE_ROLLUP),
    "contrastive_negatives": (q_contrastive_negatives, SQL_CONTRASTIVE_NEGATIVES),
    "source_length_ks": (q_source_length_ks, SQL_SOURCE_LENGTH_KS),
    "cdc_join_view_ivm": (q_cdc_join_view_ivm, SQL_JOIN_VIEW_IVM),
    "ivm_cascade_rollup": (q_ivm_cascade_rollup, SQL_IVM_CASCADE_ROLLUP),
    "conversation_tree_paths": (q_conversation_tree_paths, SQL_TREE_PATHS),
    "tree_canonical_path": (q_tree_canonical_path, SQL_TREE_CANONICAL),
    "boilerplate_turn_scrub": (q_boilerplate_turn_scrub, SQL_BOILERPLATE_SCRUB),
    "transcript_role_audit": (q_transcript_role_audit, SQL_TRANSCRIPT_ROLE_AUDIT),
    "transcript_role_repair": (q_transcript_role_repair, SQL_TRANSCRIPT_ROLE_REPAIR),
    "transcript_token_trim": (q_transcript_token_trim, SQL_TRANSCRIPT_TOKEN_TRIM),
    "sft_mask_ratio": (q_sft_mask_ratio, SQL_SFT_MASK_RATIO),
    "stream_interval_join": (q_stream_interval_join, SQL_STREAM_INTERVAL_JOIN),
    "posting_serving_refresh": (
        q_posting_serving_refresh,
        SQL_POSTING_SERVING_REFRESH,
    ),
    "cdc_commit_retry_state": (q_cdc_commit_retry_state, SQL_ENGINE_FINAL_STATE),
    "cdc_vacuum_state": (q_cdc_vacuum_state, SQL_ENGINE_FINAL_STATE),
    "cdc_dlq_replay_state": (q_cdc_dlq_replay_state, SQL_DLQ_REPLAY_STATE),
    "tool_call_stats": (q_tool_call_stats, SQL_TOOL_CALL_STATS),
    "agent_loop_audit": (q_agent_loop_audit, SQL_AGENT_LOOP_AUDIT),
    "preference_pairs": (q_preference_pairs, SQL_PREFERENCE_PAIRS),
    "sparse_envelope_fold": (q_sparse_envelope_fold, SQL_SPARSE_FOLD),
    "cdc_sparse_merge_state": (q_cdc_sparse_merge_state, SQL_SPARSE_MERGE_STATE),
    "sparse_mask_fold": (q_sparse_mask_fold, SQL_SPARSE_MASK_FOLD),
    "epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
    "cdc_dedup_erasure_state": (q_cdc_dedup_erasure_state, SQL_DEDUP_ERASURE_STATE),
    "cdc_fast_count": (q_cdc_fast_count, SQL_FAST_COUNT),
    "bloom_pruned_lookup": (q_bloom_pruned_lookup, SQL_BLOOM_LOOKUP),
    "bloom_join_filter": (q_bloom_join_filter, SQL_BLOOM_JOIN),
    "cdc_dblog_backfill_state": (q_cdc_dblog_backfill_state, SQL_ENGINE_FINAL_STATE),
    "skyline_orders": (q_skyline_orders, SQL_SKYLINE_ORDERS),
    "record_linkage": (q_record_linkage, SQL_RECORD_LINKAGE),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "decayed_score_ivm": (q_decayed_score_ivm, SQL_DECAYED_SCORE),
    "duplicated_spans": (q_duplicated_spans, SQL_DUPLICATED_SPANS),
    "dup_span_stats": (q_dup_span_stats, SQL_DUP_SPAN_STATS),
    "span_cut_corpus": (q_span_cut_corpus, SQL_SPAN_CUT_CORPUS),
    "cdc_pii_scrub_state": (q_cdc_pii_scrub_state, SQL_PII_SCRUB_STATE),
    "asof_enrich": (q_asof_enrich, SQL_ASOF_ENRICH),
    "asof_nearest": (q_asof_nearest, SQL_ASOF_NEAREST),
    "json_schema_drift": (q_json_schema_drift, SQL_JSON_SCHEMA_DRIFT),
}
