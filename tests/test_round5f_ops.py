"""Round-5 session-6 additions: incrementally maintained enrichment
join views (both-side CDC churn must equal a full recompute) and
turn-granular boilerplate scrubbing on transcripts."""

import hashlib

import pyspark.sql.functions as F

from relational_data_loader_spark.operators.incremental import (
    apply_delta_join_view,
    join_view,
)
from relational_data_loader_spark.operators.transcript import (
    drop_boilerplate_turns,
)


# --------------------------------------------------------------------------
# apply_delta_join_view


def _frames(spark):
    fact_old = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (4, 30, "d")],
        ["id", "fk", "val"],
    )
    dim_old = spark.createDataFrame(
        [(10, "ten"), (20, "twenty"), (30, "thirty")], ["k", "attr"]
    )
    # epoch: fact — insert 5→40, update 2 (fk MOVES 10→20), delete 4;
    #        dim  — insert 40, update 10 ("ten"→"TEN"), delete 30
    fact_changes = spark.createDataFrame(
        [
            ("I", 5, 40, "e"),
            ("U", 2, 20, "b2"),
            ("D", 4, None, None),
        ],
        ["op", "id", "fk", "val"],
    )
    dim_changes = spark.createDataFrame(
        [("I", 40, "forty"), ("U", 10, "TEN"), ("D", 30, None)],
        ["op", "k", "attr"],
    )
    fact_new = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b2"), (3, 20, "c"), (5, 40, "e")],
        ["id", "fk", "val"],
    )
    dim_new = spark.createDataFrame(
        [(10, "TEN"), (20, "twenty"), (40, "forty")], ["k", "attr"]
    )
    return fact_old, dim_old, fact_changes, dim_changes, fact_new, dim_new


def test_join_view_delta_equals_recompute(spark):
    fact_old, dim_old, fc, dc, fact_new, dim_new = _frames(spark)
    prev = join_view(fact_old, dim_old, "fk", "k", ["attr"])
    got = apply_delta_join_view(
        prev, fc, dc, dim_old, ["id"], "fk", "k", ["attr"]
    )
    want = join_view(fact_new, dim_new, "fk", "k", ["attr"])
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_join_view_delta_cases(spark):
    fact_old, dim_old, fc, dc, *_ = _frames(spark)
    prev = join_view(fact_old, dim_old, "fk", "k", ["attr"])
    rows = {
        r["id"]: r
        for r in apply_delta_join_view(
            prev, fc, dc, dim_old, ["id"], "fk", "k", ["attr"]
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 5}  # 4 deleted
    # unchanged fact, dim row updated this epoch → new attr patched in
    assert rows[1]["attr"] == "TEN"
    # fact fk moved 10→20; must carry the TARGET dim's attr
    assert rows[2]["attr"] == "twenty" and rows[2]["val"] == "b2"
    # dim row 30 deleted → no fact references it any more (4 was deleted);
    # inserted fact 5 references dim 40 inserted the SAME epoch
    assert rows[5]["attr"] == "forty"


def test_join_view_dim_delete_nulls_attr_fact_survives(spark):
    fact_old = spark.createDataFrame([(1, 30, "a")], ["id", "fk", "val"])
    dim_old = spark.createDataFrame([(30, "thirty")], ["k", "attr"])
    prev = join_view(fact_old, dim_old, "fk", "k", ["attr"])
    fc = spark.createDataFrame([], "op string, id long, fk long, val string")
    dc = spark.createDataFrame(
        [("D", 30, None)], "op string, k long, attr string"
    )
    got = apply_delta_join_view(
        prev, fc, dc, dim_old, ["id"], "fk", "k", ["attr"]
    ).collect()
    assert len(got) == 1
    assert got[0]["id"] == 1 and got[0]["attr"] is None


# --------------------------------------------------------------------------
# drop_boilerplate_turns


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_boilerplate_known_values(spark):
    sep = "\x1f"
    turns = spark.createDataFrame(
        [
            (1, 0, "hi"), (1, 1, "u1a"), (1, 2, "u1b"),
            (2, 0, "hi"), (2, 1, "u2a"),
            (3, 0, "hi"),  # pure boilerplate conversation
        ],
        ["conv", "turn", "txt"],
    )
    rows = {
        r["conv"]: r
        for r in drop_boilerplate_turns(
            turns, "conv", "turn", "txt", min_convs=3
        ).collect()
    }
    assert rows[1]["n_turns"] == 3 and rows[1]["n_kept"] == 2
    assert rows[1]["n_dropped"] == 1
    assert rows[1]["kept_fingerprint"] == _md5(f"u1a{sep}u1b")
    assert rows[1]["kept_chars"] == 6
    assert rows[2]["kept_fingerprint"] == _md5("u2a")
    # a conversation reduced to nothing still emits a row, md5('')
    assert rows[3]["n_kept"] == 0
    assert rows[3]["kept_fingerprint"] == _md5("")
    assert rows[3]["kept_chars"] == 0


def test_boilerplate_within_conv_repetition_not_flagged(spark):
    # "spam" appears 4x but inside ONE conversation → distinct-conv df=1,
    # below min_convs → kept (repetition is doc_repetition_stats' axis)
    turns = spark.createDataFrame(
        [(1, i, "spam") for i in range(4)] + [(2, 0, "x")],
        ["conv", "turn", "txt"],
    )
    rows = {
        r["conv"]: r
        for r in drop_boilerplate_turns(
            turns, "conv", "turn", "txt", min_convs=3
        ).collect()
    }
    assert rows[1]["n_kept"] == 4 and rows[1]["n_dropped"] == 0


def test_boilerplate_order_preserved_in_fingerprint(spark):
    sep = "\x1f"
    turns = spark.createDataFrame(
        [(1, 2, "c"), (1, 0, "a"), (1, 1, "b")], ["conv", "turn", "txt"]
    )
    (row,) = drop_boilerplate_turns(
        turns, "conv", "turn", "txt", min_convs=2
    ).collect()
    assert row["kept_fingerprint"] == _md5(f"a{sep}b{sep}c")


# --------------------------------------------------------------------------
# role_alternation_audit / trim_to_token_budget / sft_loss_mask_stats

from relational_data_loader_spark.operators.transcript import (  # noqa: E402
    role_alternation_audit,
    sft_loss_mask_stats,
    trim_to_token_budget,
)


def _turns(spark, rows):
    return spark.createDataFrame(rows, ["conv", "turn", "role", "txt"])


def test_role_audit_clean_and_violations(spark):
    rows = (
        # conv 1: clean agent transcript incl. back-to-back tool turns
        [(1, 0, "system", ""), (1, 1, "user", ""), (1, 2, "assistant", ""),
         (1, 3, "tool", ""), (1, 4, "tool", ""), (1, 5, "assistant", "")]
        # conv 2: double-user + a mid-conversation system injection
        + [(2, 0, "user", ""), (2, 1, "user", ""), (2, 2, "system", ""),
           (2, 3, "assistant", "")]
        # conv 3: opens with assistant
        + [(3, 0, "assistant", ""), (3, 1, "user", "")]
    )
    got = {
        r["conv"]: r
        for r in role_alternation_audit(
            _turns(spark, rows), "conv", "turn", "role"
        ).collect()
    }
    assert got[1]["is_clean"] and got[1]["n_role_repeats"] == 0
    assert got[2]["n_role_repeats"] == 1 and got[2]["n_system_mid"] == 1
    assert not got[2]["is_clean"]
    assert got[3]["first_role"] == "assistant" and not got[3]["is_clean"]
    assert got[3]["n_role_repeats"] == 0  # alternation itself is fine


def test_trim_keeps_suffix_within_budget(spark):
    # 4 turns x 3 tokens each; budget 7 -> last two fit (6), third busts
    rows = [(1, i, "u", "a b c") for i in range(4)]
    (r,) = trim_to_token_budget(
        _turns(spark, rows), "conv", "turn", "txt", budget=7
    ).collect()
    assert r["n_turns"] == 4 and r["n_kept"] == 2
    assert r["kept_tokens"] == 6 and r["first_kept_turn"] == 2
    import hashlib

    assert r["kept_fingerprint"] == hashlib.md5(
        "a b c\x1fa b c".encode()
    ).hexdigest()


def test_trim_always_keeps_final_turn(spark):
    rows = [(1, 0, "u", "tiny"), (1, 1, "u", "w x y z q r s t")]  # 8 > 5
    (r,) = trim_to_token_budget(
        _turns(spark, rows), "conv", "turn", "txt", budget=5
    ).collect()
    assert r["n_kept"] == 1 and r["first_kept_turn"] == 1
    assert r["kept_tokens"] == 8  # documented budget overshoot case


def test_sft_mask_ratio_known_values(spark):
    rows = [
        (1, 0, "user", "a b c d"),       # 4 context tokens
        (1, 1, "assistant", "e f"),      # 2 trainable
        (1, 2, "user", "g"),             # 1 context
        (1, 3, "assistant", "h"),        # 1 trainable
    ]
    (r,) = sft_loss_mask_stats(
        _turns(spark, rows), "conv", "role", "txt"
    ).collect()
    assert r["total_tokens"] == 8 and r["trainable_tokens"] == 3
    assert r["n_examples"] == 2
    assert r["mask_ratio"] == round(3 / 8, 4)


# --------------------------------------------------------------------------
# interval_join_streams (streaming/joins.py)

from relational_data_loader_spark.streaming.joins import (  # noqa: E402
    interval_join_streams,
)


def _write_side(spark, tmp_path, name, rows, cols):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(d)
    return d


def test_stream_join_equals_batch_join(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    clicks = [(1, s(0)), (1, s(60)), (2, s(10)), (3, s(0))]
    buys = [(1, s(20), 5.0), (2, s(100), 7.0), (3, s(0), 1.0), (4, s(5), 9.0)]
    cdir = _write_side(spark, tmp_path, "c", clicks, ["user_id", "click_ts"])
    bdir = _write_side(
        spark, tmp_path, "b", buys, ["user_id", "buy_ts", "amt"]
    )

    kw = dict(
        key="user_id", left_ts="click_ts", right_ts="buy_ts",
        window="30 minutes", left_delay="365 days", right_delay="365 days",
    )
    want = sorted(
        interval_join_streams(
            spark.read.parquet(cdir), spark.read.parquet(bdir), **kw
        ).collect()
    )
    # expected by hand: u1 click@0 -> buy@20 (in 30m); click@60 no;
    # u2 buy@100 is 90m after click -> no; u3 exact-equal ts -> yes; u4 no click
    assert [(r["user_id"], r["amt"]) for r in want] == [(1, 5.0), (3, 1.0)]

    csch = spark.read.parquet(cdir).schema
    bsch = spark.read.parquet(bdir).schema
    joined = interval_join_streams(
        spark.readStream.schema(csch).parquet(cdir),
        spark.readStream.schema(bsch).parquet(bdir),
        **kw,
    )
    q = (
        joined.writeStream.format("memory").queryName("sjtest")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(spark.table("sjtest").collect())
    assert got == want


def test_stream_join_rejects_colliding_ts_names(spark, tmp_path):
    d = _write_side(spark, tmp_path, "x", [(1, 2)], ["user_id", "ts"])
    df = spark.read.parquet(d)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct column names"):
        interval_join_streams(
            df, df, key="user_id", left_ts="ts", right_ts="ts",
            window="1 minute", left_delay="1 minute", right_delay="1 minute",
        )


# --------------------------------------------------------------------------
# refresh_serving_postings (operators/index.py)

from relational_data_loader_spark.operators.index import (  # noqa: E402
    apply_delta_postings,
    posting_index,
    refresh_serving_postings,
    write_serving_postings,
)


def test_serving_refresh_partial_rewrite_equals_full_rebuild(spark, tmp_path):
    import glob
    import os

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared") for i in range(40)],
        ["doc_id", "text"],
    )
    prev_index = posting_index(docs, "text", "doc_id")
    serving = str(tmp_path / "serving")
    write_serving_postings(prev_index, serving, n_buckets=16)

    # record per-bucket file mtimes before the refresh
    def bucket_mtimes():
        out = {}
        for f in glob.glob(os.path.join(serving, "_bucket=*", "*.parquet")):
            b = int(f.split("_bucket=")[1].split("/")[0])
            out.setdefault(b, []).append((f, os.path.getmtime(f)))
        return out

    before = bucket_mtimes()

    # epoch: doc 0 rewritten, doc 39 deleted, doc 100 inserted
    changes = spark.createDataFrame(
        [
            ("U", 0, "newtok shared"),
            ("D", 39, None),
            ("I", 100, "tok0 brandnew"),
        ],
        "op string, doc_id long, text string",
    )
    new_index = apply_delta_postings(prev_index, changes, "text", "doc_id")
    n_rewritten = refresh_serving_postings(
        spark, new_index, prev_index, changes, "text", "doc_id", serving
    )
    assert 0 < n_rewritten < 16, "epoch must touch some but not all buckets"

    # content == a from-scratch rebuild of the new index
    got = sorted(
        (r["tok"], r["doc_id"])
        for r in spark.read.parquet(serving).select("tok", "doc_id").collect()
    )
    want = sorted(
        (r["tok"], r["doc_id"]) for r in new_index.collect()
    )
    assert got == want

    # untouched buckets were not rewritten (same files, same mtimes);
    # not every one of the 16 buckets necessarily materialized originally
    after = bucket_mtimes()
    changed = [b for b in before if before[b] != after.get(b)]
    assert changed, "refresh must have rewritten something"
    assert len(changed) <= n_rewritten
    assert len(before) - len(changed) >= len(before) - n_rewritten


def test_serving_refresh_noop_epoch_touches_nothing(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    idx = posting_index(docs, "text", "doc_id")
    serving = str(tmp_path / "s2")
    write_serving_postings(idx, serving, n_buckets=8)
    empty = spark.createDataFrame([], "op string, doc_id long, text string")
    assert (
        refresh_serving_postings(
            spark, idx, idx, empty, "text", "doc_id", serving
        )
        == 0
    )


def test_serving_refresh_drops_emptied_bucket(spark, tmp_path):
    import glob
    import os

    # one doc, one token: deleting the doc empties the token's bucket —
    # dynamic overwrite writes no rows there, so the operator must drop
    # the stale directory explicitly
    docs = spark.createDataFrame([(1, "solotoken")], ["doc_id", "text"])
    idx = posting_index(docs, "text", "doc_id")
    serving = str(tmp_path / "s3")
    write_serving_postings(idx, serving, n_buckets=8)
    assert glob.glob(os.path.join(serving, "_bucket=*"))

    changes = spark.createDataFrame(
        [("D", 1, None)], "op string, doc_id long, text string"
    )
    new_idx = apply_delta_postings(idx, changes, "text", "doc_id")
    n = refresh_serving_postings(
        spark, new_idx, idx, changes, "text", "doc_id", serving
    )
    assert n == 1
    assert not glob.glob(os.path.join(serving, "_bucket=*", "*.parquet"))


def test_join_view_rejects_colliding_attr_names(spark):
    fact_old, dim_old, fc, dc, *_ = _frames(spark)
    prev = join_view(fact_old, dim_old, "fk", "k", ["attr"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide with fact columns"):
        apply_delta_join_view(
            prev, fc.withColumnRenamed("val", "attr"), dc, dim_old,
            ["id"], "fk", "k", ["attr"],
        )


def test_role_audit_empty_repeatable_roles(spark):
    rows = [(1, 0, "tool", ""), (1, 1, "tool", "")]
    (r,) = role_alternation_audit(
        _turns(spark, rows), "conv", "turn", "role", repeatable_roles=()
    ).collect()
    # with no exemptions the tool-tool repeat IS a violation
    assert r["n_role_repeats"] == 1


def test_role_audit_system_prefix_not_a_repeat(spark):
    # multi-part system prompt is legal under the system* grammar
    rows = [(1, 0, "system", ""), (1, 1, "system", ""), (1, 2, "user", ""),
            (1, 3, "assistant", "")]
    (r,) = role_alternation_audit(
        _turns(spark, rows), "conv", "turn", "role"
    ).collect()
    assert r["n_role_repeats"] == 0 and r["n_system_mid"] == 0
    assert r["is_clean"]
    # ...and a mid-conversation system PAIR is billed exactly once
    rows2 = [(2, 0, "user", ""), (2, 1, "system", ""), (2, 2, "system", ""),
             (2, 3, "assistant", "")]
    (r2,) = role_alternation_audit(
        _turns(spark, rows2), "conv", "turn", "role"
    ).collect()
    assert r2["n_system_mid"] == 1 and r2["n_role_repeats"] == 0
    assert not r2["is_clean"]


def test_coalesce_role_runs_repairs_to_clean_alternation(spark):
    """Repair closes the audit's findings: a transcript with same-role
    runs coalesces to one turn per run (texts joined in turn order, dense
    renumbering), and the repaired transcript re-audits CLEAN with no
    repeatable-role exemptions needed."""
    from relational_data_loader_spark.operators.transcript import (
        coalesce_role_runs,
        role_alternation_audit,
    )

    rows = [
        ("c1", 0, "system", "s0"),
        ("c1", 2, "system", "s1"),      # system pair -> one turn
        ("c1", 5, "user", "hi"),
        ("c1", 7, "assistant", "a0"),
        ("c1", 8, "tool", "t0"),
        ("c1", 9, "tool", "t1"),        # tool run -> one turn
        ("c1", 12, "assistant", "a1"),
        ("c2", 1, "user", "only"),      # singleton conversation untouched
    ]
    df = spark.createDataFrame(
        rows, "conv string, turn int, role string, text string"
    )
    out = coalesce_role_runs(df, "conv", "turn", "role", "text", sep=" ")
    got = {
        (r["conv"], r["turn_idx"]): (r["role"], r["text"], r["n_merged"])
        for r in out.collect()
    }
    assert got == {
        ("c1", 0): ("system", "s0 s1", 2),
        ("c1", 1): ("user", "hi", 1),
        ("c1", 2): ("assistant", "a0", 1),
        ("c1", 3): ("tool", "t0 t1", 2),
        ("c1", 4): ("assistant", "a1", 1),
        ("c2", 0): ("user", "only", 1),
    }
    audit = role_alternation_audit(
        out, "conv", "turn_idx", "role", repeatable_roles=()
    )
    assert all(r["is_clean"] for r in audit.collect())
