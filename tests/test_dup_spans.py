"""Span-level exact-substring dedup (operators/contamination.py
duplicated_spans / dup_span_stats): offset semantics the SQL twin can't
pin — hand-planted duplicates with known token offsets, adjacency/overlap
merging, within-doc-repeat exclusion, zero-fill, and a plan gate (no
cartesian anywhere in the join chain).
"""

from pyspark.sql import functions as F

from relational_data_loader_spark.operators.contamination import (
    cut_duplicated_spans,
    dup_span_stats,
    duplicated_spans,
)

# Tokens a..z as words so offsets are readable. Shared run "c d e f g h i j"
# (8 tokens) between docs 1 and 2 => with k=6 the covered 6-gram starts in
# doc 1 are positions 2,3,4 (tokens 2..9), merging to one span [2, 10).
_D1 = "a b c d e f g h i j k l"  # 12 tokens, shared run at 2..9
_D2 = "x y z c d e f g h i j q r s"  # 14 tokens, shared run at 3..10
_D3 = "m n o p m n o p m n o p m n o p"  # self-repeats only, no cross-doc dup
_D4 = "one two three"  # shorter than k: emits no windows at all


def _docs(spark):
    return spark.createDataFrame(
        [(1, _D1), (2, _D2), (3, _D3), (4, _D4)], "doc_id long, text string"
    )


def test_duplicated_spans_offsets_and_merge(spark):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(_docs(spark), "text", "doc_id", k=6).collect()
    }
    # overlapping windows merged to ONE maximal span per doc, end exclusive
    assert got == {(1, 2, 10, 8), (2, 3, 11, 8)}


def test_within_doc_repeats_do_not_count(spark):
    # doc 3 repeats "m n o p" four times internally but shares nothing
    # cross-doc: doc-frequency is distinct-doc, so it emits no span.
    out = duplicated_spans(_docs(spark), "text", "doc_id", k=6).filter(
        F.col("doc_id") == 3
    )
    assert out.count() == 0


def test_min_docs_three_drops_pairwise_dup(spark):
    out = duplicated_spans(_docs(spark), "text", "doc_id", k=6, min_docs=3)
    assert out.count() == 0


def test_disjoint_spans_stay_separate(spark):
    # two shared runs in one doc separated by > k unique tokens => 2 spans
    shared1 = "c1 c2 c3 c4 c5 c6"
    shared2 = "d1 d2 d3 d4 d5 d6"
    a = f"{shared1} u1 u2 u3 u4 u5 u6 u7 {shared2}"
    b = f"{shared1} v1 v2 v3 v4 v5 v6 v7 {shared2}"
    df = spark.createDataFrame([(10, a), (11, b)], "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df, "text", "doc_id", k=6).collect()
    )
    assert got == [(10, 0, 6), (10, 13, 19), (11, 0, 6), (11, 13, 19)]


def test_dup_span_stats_zero_fill_and_frac(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
        for r in dup_span_stats(_docs(spark), "text", "doc_id", k=6).collect()
    }
    assert got[1] == (12, 1, 8, round(8 / 12, 4))
    assert got[2] == (14, 1, 8, round(8 / 14, 4))
    assert got[3] == (16, 0, 0, 0.0)  # zero-filled, present
    assert got[4] == (3, 0, 0, 0.0)


def test_cut_keeps_owner_copy_and_cuts_rest(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_cut"])
        for r in cut_duplicated_spans(
            _docs(spark), "text", "doc_id", k=6
        ).collect()
    }
    # doc 1 is the min-doc_id owner of every shared 6-gram: keeps its text
    assert got[1] == (_D1, 12, 0)
    # doc 2 cuts tokens 3..10 (the shared run), keeping the unique rim
    assert got[2] == ("x y z q r s", 14, 8)
    # untouched docs come back normalized but uncut
    assert got[3] == (_D3, 16, 0)
    assert got[4] == (_D4, 3, 0)


def test_cut_can_empty_a_full_duplicate(spark):
    # doc 21 is a verbatim copy of doc 20: every token is covered, the
    # non-owner copy empties out entirely.
    t = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame([(20, t), (21, t)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_cut"])
        for r in cut_duplicated_spans(df, "text", "doc_id", k=6).collect()
    }
    assert got[20] == (t, 0)
    assert got[21] == ("", 8)


def test_plan_no_cartesian(spark):
    plan = duplicated_spans(
        _docs(spark), "text", "doc_id", k=6
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
