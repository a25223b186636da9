"""Round-5 session-2 additions: erasure cascade, bitemporal/consistent-cut
reads, anomaly + staleness monitoring, label-centroid cohesion."""

import datetime as dt

import pyspark.sql.functions as F

from relational_data_loader_spark.operators.bitemporal import (
    bitemporal_asof,
    consistent_cut,
    cut_snapshot,
)
from relational_data_loader_spark.operators.erasure import (
    cascade_keys,
    erasure_report,
)
from relational_data_loader_spark.operators.events import (
    flag_anomalies,
    staleness_report,
)
from relational_data_loader_spark.operators.similarity import (
    label_centroid_cohesion,
)


def _ts(d):
    return dt.datetime(2026, 1, d)


# --------------------------------------------------------------------------
# erasure cascade


def test_erasure_cascade_counts_and_depth(spark):
    erased = spark.createDataFrame([(1,), (3,)], ["k"]).select("k")
    cust = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["c_id"])
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["o_id", "o_cust"]
    )
    items = spark.createDataFrame(
        [(10, "a"), (10, "b"), (12, "c"), (13, "d")], ["i_order", "sku"]
    )
    root = erasure_report(
        erased.select(F.col("k")),
        [("cust", cust, "c_id"), ("orders", orders, "o_cust")],
    )
    okeys = cascade_keys(erased, orders, "o_cust", "o_id")
    leaf = erasure_report(okeys, [("items", items, "i_order")])
    got = {r["table_name"]: (r["rows_erased"], r["rows_kept"]) for r in root.unionByName(leaf).collect()}
    assert got == {"cust": (2, 2), "orders": (3, 1), "items": (3, 1)}


def test_erasure_joins_are_broadcast(spark):
    """Every cascade hop must broadcast the key frame — a fact-vs-fact
    SortMergeJoin anywhere means the cascade re-shuffles a 100 TB table
    per hop."""
    erased = spark.range(5).select(F.col("id").alias("k"))
    fact = spark.range(1000).select(F.col("id").alias("fk"), (F.col("id") % 7).alias("v"))
    rep = erasure_report(erased, [("fact", fact, "fk")])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    keys2 = cascade_keys(erased, fact, "fk", "v")
    plan2 = keys2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan2, plan2


# --------------------------------------------------------------------------
# bitemporal / consistent cut


def test_bitemporal_belief_revision(spark):
    """A later-ingested correction (higher lsn) of the SAME business time
    wins only once system time includes it."""
    log = spark.createDataFrame(
        [
            (1, "U", 7, 10.0, _ts(5)),
            (2, "U", 7, 20.0, _ts(9)),   # newer business state
            (3, "U", 7, 11.0, _ts(5)),   # late correction of day-5 belief
        ],
        ["lsn", "op", "key", "v", "ts"],
    )
    # As known at lsn 2, valid at day 6: day-5 row, original belief
    out1 = bitemporal_asof(
        log, ["key"], F.lit(2), F.lit(_ts(6)), lsn_col="lsn", valid_col="ts"
    ).collect()
    assert [(r["v"]) for r in out1] == [10.0]
    # As known at lsn 3: the correction supersedes
    out2 = bitemporal_asof(
        log, ["key"], F.lit(3), F.lit(_ts(6)), lsn_col="lsn", valid_col="ts"
    ).collect()
    assert [(r["v"]) for r in out2] == [11.0]
    # valid cut at day 9 picks the newer business state regardless
    out3 = bitemporal_asof(
        log, ["key"], F.lit(3), F.lit(_ts(9)), lsn_col="lsn", valid_col="ts"
    ).collect()
    assert [(r["v"]) for r in out3] == [20.0]


def test_bitemporal_delete_hides_key(spark):
    log = spark.createDataFrame(
        [(1, "U", 7, 1.0, _ts(1)), (2, "D", 7, None, _ts(2))],
        ["lsn", "op", "key", "v", "ts"],
    )
    assert (
        bitemporal_asof(log, ["key"], F.lit(9), F.lit(_ts(9)), lsn_col="lsn", valid_col="ts").count()
        == 0
    )


def test_consistent_cut_held_by_slowest_source(spark):
    log = spark.createDataFrame(
        [
            (1, "U", "a", 1, 1.0),
            (5, "U", "a", 1, 5.0),   # source a is ahead
            (3, "U", "b", 2, 3.0),   # source b's watermark = 3
            (4, "U", "b", 2, 4.0),
        ],
        ["lsn", "op", "src", "key", "v"],
    )
    cut = consistent_cut(log, "src", lsn_col="lsn")
    assert cut.collect()[0]["cut_lsn"] == 4
    snap = cut_snapshot(log, cut, ["key"], lsn_col="lsn")
    got = {r["key"]: r["v"] for r in snap.collect()}
    # lsn-5 row from the fast source is NOT visible at the cut
    assert got == {1: 1.0, 2: 4.0}


def test_cut_snapshot_single_window_shuffle(spark):
    log = spark.range(100).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        (F.col("id") % 10).alias("key"),
        F.rand(1).alias("v"),
        (F.col("id") % 4).alias("src"),
    )
    snap = cut_snapshot(log, consistent_cut(log, "src", lsn_col="lsn"), ["key"], lsn_col="lsn")
    plan = snap._jdf.queryExecution().executedPlan().toString()
    # the 1-row cut joins as broadcast; the per-key window is the only
    # full-data exchange
    assert "SortMergeJoin" not in plan, plan


# --------------------------------------------------------------------------
# monitoring


def test_flag_anomalies_constant_group_and_outlier(spark):
    rows = [(i, "steady", 5.0) for i in range(20)]
    rows += [(100 + i, "noisy", float(i % 5)) for i in range(40)]
    rows += [(999, "noisy", 1000.0)]  # blatant outlier
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = flag_anomalies(ev, z_threshold=2.5).collect()
    ids = {r["event_id"] for r in out}
    assert 999 in ids
    # zero-variance group can't divide; it must be excluded, not NaN/crash
    assert all(r["event_type"] != "steady" for r in out)


def test_staleness_report_boundary(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, _ts(1)),    # 29 days behind the watermark (day 30)
            (2, 2, _ts(30)),   # the watermark row itself
        ],
        ["event_id", "user_id", "ts"],
    )
    got = {r["user_id"]: (r["lag_days"], r["is_stale"]) for r in staleness_report(ev, stale_after_days=29).collect()}
    assert got == {1: (29, True), 2: (0, False)}


# --------------------------------------------------------------------------
# centroid cohesion


def test_label_centroid_cohesion_known_geometry(spark):
    # label 0: identical vectors -> cohesion 1.0
    # label 1: two orthogonal unit vectors -> centroid at 45deg, cos = cos(45) ~ 0.707
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [1.0, 0.0], 1),
        (4, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r["label"]: (r["n_vecs"], r["cohesion"]) for r in label_centroid_cohesion(emb).collect()}
    assert got[0] == (2, 1.0)
    assert got[1] == (2, 0.707)


def test_label_centroid_cohesion_broadcasts_centroids(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = label_centroid_cohesion(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# --------------------------------------------------------------------------
# reconciliation


def test_reconcile_flags_exactly_the_tampered_bucket(spark):
    from relational_data_loader_spark.operators.reconcile import (
        bucket_checksums,
        reconcile,
    )

    src = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    dst_bad = src.withColumn(
        "v", F.when(F.col("k") == 17, F.lit("TAMPERED")).otherwise(F.col("v"))
    )
    rep = reconcile(
        bucket_checksums(src, ["k"], ["k", "v"], n_buckets=8),
        bucket_checksums(dst_bad, ["k"], ["k", "v"], n_buckets=8),
    ).collect()
    bad = [r for r in rep if not r["checksum_match"]]
    good = [r for r in rep if r["checksum_match"]]
    assert len(bad) == 1  # only the bucket containing k=17
    assert len(good) == 7
    # row counts still agree everywhere: checksum catches what counts miss
    assert all(r["rows_match"] for r in rep)


def test_reconcile_missing_row_changes_count_and_checksum(spark):
    from relational_data_loader_spark.operators.reconcile import (
        bucket_checksums,
        reconcile,
    )

    src = spark.range(50).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    dst = src.filter(F.col("k") != 3)
    rep = reconcile(
        bucket_checksums(src, ["k"], ["k", "v"], n_buckets=4),
        bucket_checksums(dst, ["k"], ["k", "v"], n_buckets=4),
    ).collect()
    bad = [r for r in rep if not r["rows_match"]]
    assert len(bad) == 1 and not bad[0]["checksum_match"]
    assert bad[0]["src_rows"] == bad[0]["dst_rows"] + 1


def test_bucket_checksums_order_independent(spark):
    from relational_data_loader_spark.operators.reconcile import bucket_checksums

    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
    a = {
        r["bucket"]: (r["n_rows"], r["checksum"])
        for r in bucket_checksums(df, ["k"], ["k", "v"], 4).collect()
    }
    b = {
        r["bucket"]: (r["n_rows"], r["checksum"])
        for r in bucket_checksums(
            df.orderBy(F.desc("k")).repartition(7), ["k"], ["k", "v"], 4
        ).collect()
    }
    assert a == b


# --------------------------------------------------------------------------
# tfidf


def test_tfidf_scores_known_corpus(spark):
    import math

    from relational_data_loader_spark.operators.index import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["tok"]): r["tfidf"]
        for r in tfidf_top_terms(docs, "text", "doc_id", k=2).collect()
    }
    # 'apple': tf=2 in doc1, df=1, N=3 -> 2*ln(3)
    assert got[(1, "apple")] == round(2 * math.log(3.0), 4)
    # 'cherry' in doc3: tf=3, df=2 -> 3*ln(3/2)
    assert got[(3, "cherry")] == round(3 * math.log(1.5), 4)
    # doc2: both terms df=2 -> ln(1.5), banana before cherry on tie
    assert got[(2, "banana")] == got[(2, "cherry")] == round(math.log(1.5), 4)


# --------------------------------------------------------------------------
# rollup / pivot plans


def test_rollup_levels_present(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = li.rollup("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    rows = out.collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    per_flag = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == li.count()
    assert sum(r["n"] for r in per_flag) == li.count()


def test_pivot_single_shuffle(spark):
    from relational_data_loader_spark.queries import q_pivot_user_event_matrix

    out = q_pivot_user_event_matrix(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# --------------------------------------------------------------------------
# data-quality expectations


def test_row_expectations_single_scan_counts(spark):
    from relational_data_loader_spark.operators.quality import row_expectations

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "X"), (3, None, "F"), (4, 2.0, "O")],
        ["k", "price", "status"],
    )
    rep = row_expectations(
        df,
        [
            ("price_positive", F.col("price").isNull() | (F.col("price") <= 0)),
            ("status_accepted", ~F.col("status").isin("O", "F")),
        ],
    )
    got = {r["check_name"]: (r["n_violations"], r["passed"]) for r in rep.collect()}
    assert got == {"price_positive": (2, False), "status_accepted": (1, False)}
    # all row predicates fold into ONE aggregate over one scan (AQE's
    # executed string repeats the initial plan; gate on the final section)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan") == 1, plan


def test_unique_and_fk_expectations(spark):
    from relational_data_loader_spark.operators.quality import (
        referential_expectation,
        unique_key_expectation,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    uk = unique_key_expectation(child, ["fk"]).collect()[0]
    # fk=10 twice -> 1 droppable row; NULL and 99 are singletons
    assert (uk["n_violations"], uk["passed"]) == (1, False)
    fk = referential_expectation(child, "fk", parent, "pk").collect()[0]
    # only fk=99 is an orphan; NULL fk is not a violation (SQL semantics)
    assert (fk["n_violations"], fk["passed"]) == (1, False)
    ok = unique_key_expectation(parent, ["pk"]).collect()[0]
    assert (ok["n_violations"], ok["passed"]) == (0, True)


def test_profile_columns_prunes_to_one_column(spark):
    from relational_data_loader_spark.operators.quality import profile_columns

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    prof = profile_columns(orders, ["o_orderstatus"])
    row = prof.collect()[0]
    assert row["n_distinct"] == 3 and row["min_value"] == "F" and row["max_value"] == "P"
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<o_orderstatus:string>" in plan, plan


# --------------------------------------------------------------------------
# out-of-orderness


def test_out_of_order_stats_measures_regression(spark):
    from relational_data_loader_spark.operators.watermark import out_of_order_stats

    log = spark.createDataFrame(
        [
            # key 1: lsn order 1,2,3 but the lsn-2 event's ts regressed 60s
            (1, 1, _ts(2)),
            (2, 1, dt.datetime(2026, 1, 2, 0, 0) - dt.timedelta(seconds=60)),
            (3, 1, _ts(3)),
            # key 2: perfectly ordered
            (4, 2, _ts(1)),
            (5, 2, _ts(2)),
        ],
        ["lsn", "key", "ts"],
    )
    got = {
        r["key"]: (r["n_events"], r["n_late"], r["p_late"], r["max_regress_s"])
        for r in out_of_order_stats(log, "key").collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 4), 60)
    assert got[2] == (2, 0, 0.0, 0)


# --------------------------------------------------------------------------
# watermark-drop simulation


def test_simulate_watermark_drops_matches_streaming_semantics(spark):
    from relational_data_loader_spark.operators.watermark import (
        simulate_watermark_drops,
    )

    log = spark.createDataFrame(
        [
            # batch 0 (lsn 0-1): max ts = day 5
            (0, _ts(1)),
            (1, _ts(5)),
            # batch 1 (lsn 2-3): day-2 event is behind the day-5 watermark
            (2, _ts(2)),
            (3, _ts(6)),
            # batch 2 (lsn 4): watermark is now day 6; day 3 drops
            (4, _ts(3)),
        ],
        ["lsn", "ts"],
    )
    got = {
        r["batch"]: (r["n_events"], r["n_dropped"], r["watermark_ts"])
        for r in simulate_watermark_drops(
            log, batch_size=2, delay_seconds=0
        ).collect()
    }
    assert got[0][:2] == (2, 0) and got[0][2] is None  # no prior batch: no wm
    assert got[1] == (2, 1, _ts(5))
    assert got[2] == (1, 1, _ts(6))


def test_simulate_watermark_drops_delay_rescues(spark):
    from relational_data_loader_spark.operators.watermark import (
        simulate_watermark_drops,
    )

    log = spark.createDataFrame(
        [(0, _ts(1)), (1, _ts(5)), (2, _ts(4))], ["lsn", "ts"]
    )
    # watermark day5 - 2 days = day3 < day4: the late row survives
    got = simulate_watermark_drops(log, batch_size=2, delay_seconds=2 * 86400)
    row = {r["batch"]: r for r in got.collect()}[1]
    assert (row["n_events"], row["n_dropped"]) == (1, 0)


# --------------------------------------------------------------------------
# KMV sketch


def test_kmv_exact_path_and_estimate_accuracy(spark):
    from relational_data_loader_spark.operators.sketch import kmv_distinct

    small = spark.createDataFrame(
        [("a", f"v{i % 10}") for i in range(100)], ["g", "v"]
    )
    row = kmv_distinct(small, "g", "v", k=64).collect()[0]
    # below k distinct -> the sketch IS the distinct set: exact, zero error
    assert (row["n_exact"], row["n_estimate"], row["rel_error"]) == (10, 10.0, 0.0)

    big = spark.range(5000).select(
        F.lit("b").alias("g"), F.concat(F.lit("tok"), F.col("id")).alias("v")
    )
    r = kmv_distinct(big, "g", "v", k=64).collect()[0]
    assert r["n_exact"] == 5000
    # se ~ 1/sqrt(62) ~ 12.7%; 4 sigma bound keeps the test deterministic
    # in spirit AND in fact (the hash set is fixed, so this never flakes)
    assert abs(r["rel_error"]) < 0.5, r


def test_kmv_topk_rides_window_group_limit(spark):
    from relational_data_loader_spark.operators.sketch import kmv_distinct

    df = spark.range(10000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("string").alias("v")
    )
    plan = kmv_distinct(df, "g", "v", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


# --------------------------------------------------------------------------
# weighted sampling


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from relational_data_loader_spark.operators.sampling import (
        weighted_sample_topk,
    )

    # one heavy doc among 200 light ones: with weight 10_000 vs 1 the
    # heavy doc's inclusion probability in a top-20 sample is ~1
    rows = [(i, "g", 1) for i in range(200)] + [(999, "g", 10_000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    s1 = weighted_sample_topk(df, "lang", "doc_id", "n_chars", k=20)
    ids1 = {r["doc_id"] for r in s1.collect()}
    assert 999 in ids1
    # determinism across partitionings
    ids2 = {
        r["doc_id"]
        for r in weighted_sample_topk(
            df.repartition(7), "lang", "doc_id", "n_chars", k=20
        ).collect()
    }
    assert ids1 == ids2


def test_weighted_sample_rides_window_group_limit(spark):
    from relational_data_loader_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        weighted_sample_topk(docs, "lang", "doc_id", "n_chars", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


# --------------------------------------------------------------------------
# live-key timeline


def test_live_key_timeline_transitions(spark):
    from relational_data_loader_spark.operators.lww import live_key_timeline

    log = spark.createDataFrame(
        [
            (1, "U", 1, _ts(1)),   # key 1 born day 1
            (2, "U", 2, _ts(1)),   # key 2 born day 1
            (3, "U", 1, _ts(2)),   # update: NOT a transition
            (4, "D", 2, _ts(3)),   # key 2 dies day 3
            (5, "U", 2, _ts(5)),   # key 2 resurrected day 5
            (6, "D", 2, _ts(5)),   # ... and dies again same day: net 0
        ],
        ["lsn", "op", "key", "ts"],
    )
    got = {
        str(r["day"]): (r["net_change"], r["live_keys"])
        for r in live_key_timeline(log, ["key"]).collect()
    }
    # day 5's resurrection+death are BOTH transitions, so the day keeps a
    # row whose deltas cancel to net 0 (live count unchanged)
    assert got == {
        "2026-01-01": (2, 2),
        "2026-01-03": (-1, 1),
        "2026-01-05": (0, 1),
    }


def test_reconcile_drilldown_prunes_and_repairs(spark):
    """Merkle descent: the drill-down's verdict equals the plain row diff
    (every injected drift found, correctly classified), zero drift yields
    zero rows, and the row join is bucket-pruned through a broadcast of
    the mismatched-bucket list (plan-gated)."""
    from pyspark.sql import functions as F

    from relational_data_loader_spark.operators.reconcile import (
        reconcile_drilldown,
    )

    cols = ["doc_id", "text"]
    src = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(200)], "doc_id int, text string"
    )
    dest = (
        src.filter(F.col("doc_id") != 7)                       # one dropped
        .withColumn(
            "text",
            F.when(F.col("doc_id") == 11, F.lit("drifted"))    # one altered
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame([(999, "extra")], "doc_id int, text string")
        )                                                      # one spurious
    )
    out = reconcile_drilldown(src, dest, ["doc_id"], cols, n_buckets=8)
    got = {(r["doc_id"], r["status"]) for r in out.collect()}
    assert got == {
        (7, "missing_in_dest"),
        (11, "value_drift"),
        (999, "missing_in_source"),
    }
    # pruning mechanism: the mismatched-bucket list joins broadcast
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()

    clean = reconcile_drilldown(src, src, ["doc_id"], cols, n_buckets=8)
    assert clean.count() == 0
