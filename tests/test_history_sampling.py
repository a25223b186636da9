"""scd2_history + stratified_sample operator semantics and plan shapes."""

import pyspark.sql.functions as F

from relational_data_loader_spark.operators.lww import scd2_history
from relational_data_loader_spark.operators.sampling import (
    hash_uniform,
    stratified_sample,
)


def test_scd2_intervals_and_current_flag(spark):
    log = spark.createDataFrame(
        [
            (1, 10, "I", "a"),
            (1, 20, "U", "b"),
            (1, 30, "U", "c"),   # current version of key 1
            (2, 15, "I", "x"),
            (2, 25, "D", None),  # key 2 deleted → no current version
        ],
        "k int, lsn bigint, op string, payload string",
    )
    rows = {
        (r["k"], r["lsn"]): (r["valid_to_lsn"], r["is_current"])
        for r in scd2_history(log, ["k"]).collect()
    }
    assert rows == {
        (1, 10): (20, False),
        (1, 20): (30, False),
        (1, 30): (None, True),
        (2, 15): (25, False),
        (2, 25): (None, False),  # open interval but deleted → not current
    }


def test_scd2_is_single_window_shuffle(spark):
    log = spark.createDataFrame(
        [(1, 10, "I")], "k int, lsn bigint, op string"
    )
    plan = scd2_history(log, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    a = {r["doc_id"] for r in
         stratified_sample(docs, "lang", {"en": 0.2}, 0.8, "doc_id").collect()}
    # same rows regardless of physical layout — the decision is content-hash
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(17), "lang", {"en": 0.2}, 0.8,
                           "doc_id").collect()}
    assert a == b and len(a) > 0
    # rates land near target per stratum (md5 uniformity at n≈666/1333)
    en_total = 2000 // 3 + 1
    en_kept = sum(1 for i in a if i % 3 == 0)
    de_kept = len(a) - en_kept
    assert 0.1 < en_kept / en_total < 0.3
    assert 0.7 < de_kept / (2000 - en_total) < 0.9


def test_stratified_sample_is_filter_only(spark):
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    plan = (
        stratified_sample(docs, "lang", {"en": 0.5}, 0.5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_hash_uniform_in_unit_range(spark):
    vals = [
        r["u"]
        for r in spark.range(500)
        .select(hash_uniform(F.col("id")).alias("u"))
        .collect()
    ]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.4 < sum(vals) / len(vals) < 0.6


# --------------------------------------------------------------------------
# contrastive_negative_pairs


def test_contrastive_negatives_contract(spark):
    from relational_data_loader_spark.operators.sampling import (
        contrastive_negative_pairs,
    )
    import pyspark.sql.functions as F

    # 20 vectors: ids 0-9 all identical (accidental positives for each
    # other), ids 10-19 orthogonal-ish distinct directions
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.0, 0.0, 0.0]))
    for i in range(10, 20):
        v = [0.0] * 4
        v[i % 4] = 1.0
        v[(i + 1) % 4] = float(i) / 20.0
        rows.append((i, v))
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = contrastive_negative_pairs(vec, 20, k=3).collect()
    out2 = contrastive_negative_pairs(vec, 20, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))  # deterministic
    assert all(r["a_id"] != r["n_id"] for r in out)             # no self pairs
    assert all(r["sim"] < 0.9 for r in out)                     # no accidental positives
    # identical-vector pairs (both ids < 10) must have been filtered
    assert not [r for r in out if r["a_id"] < 10 and r["n_id"] < 10]
    # at most k negatives per anchor
    from collections import Counter
    assert max(Counter(r["a_id"] for r in out).values()) <= 3


def test_dsir_selects_target_like_docs(spark):
    """DSIR's defining property: the top of the ranking is ENRICHED in
    docs drawn from the target distribution relative to the pool — here
    two synthetic 'languages' with disjoint-ish vocabularies, target = A.
    Also pins determinism (same frame twice → same ranking) and the
    smoothing (a pool-only token never yields -inf/NULL scores)."""
    from pyspark.sql import functions as F

    from relational_data_loader_spark.operators.sampling import (
        dsir_logratio_topk,
    )

    rows = []
    for i in range(30):  # target-like: vocabulary alpha..delta
        rows.append((i, "alpha beta gamma delta alpha beta", "A"))
    for i in range(30, 90):  # source-only: vocabulary zeta..theta
        rows.append((i, "zeta eta theta zeta eta theta iota", "B"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")

    out = dsir_logratio_topk(docs, F.col("lang") == "A", k=40).collect()
    assert len(out) == 40 and out[0]["rk"] == 1
    top30 = {r["doc_id"] for r in out if r["rk"] <= 30}
    assert top30 == set(range(30)), "target-vocabulary docs must rank first"
    # rows 30+ share no tokens with the target: smoothing must still give
    # them a finite negative score, never NULL
    tail = [r for r in out if r["rk"] > 30]
    assert tail and all(
        r["logratio"] is not None and r["logratio"] < 0 for r in tail
    )
    again = dsir_logratio_topk(docs, F.col("lang") == "A", k=40).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_temperature_mix_flattens_head_stratum(spark):
    """alpha<1 must raise the tail stratum's keep rate above the head's
    (the p^alpha point), alpha=1 must keep NATURAL proportions (every
    stratum the same rate = the budget), and rates clamp at 1."""
    from pyspark.sql import functions as F

    from relational_data_loader_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "head") for i in range(900)] + [
        (900 + i, "tail") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, lang string")

    out = temperature_mix(docs, "lang", "doc_id", alpha=0.3, budget_frac=0.5)
    rates = {
        r["lang"]: r["rate"]
        for r in out.select("lang", "rate").distinct().collect()
    }
    assert rates["tail"] > rates["head"], rates
    assert rates["tail"] == 1.0  # tail saturates under this skew: clamp

    nat = temperature_mix(docs, "lang", "doc_id", alpha=1.0, budget_frac=0.5)
    nat_rates = {
        r["lang"]: r["rate"]
        for r in nat.select("lang", "rate").distinct().collect()
    }
    assert nat_rates == {"head": 0.5, "tail": 0.5}

    # determinism: the keep set is content-derived, not RNG
    again = temperature_mix(docs, "lang", "doc_id", alpha=0.3, budget_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
