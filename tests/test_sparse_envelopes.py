"""Column-sparse update envelopes (operators/sparse.py): the fold under
both patch conventions, its tombstone/reset edges, and the densify bridge
driving the real snapshot sink — final state must equal a column-level
LWW oracle computed independently in pandas."""

import datetime as dt

import pyarrow.compute as pc
import pytest
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.sparse import (
    densify_sparse_batch,
    fold_sparse_envelopes,
)

SCHEMA = (
    "lsn bigint, op string, k int, a string, b string, changed array<string>"
)


def _fold(spark, rows, mask=False, keep_meta=False):
    df = spark.createDataFrame(rows, SCHEMA)
    return fold_sparse_envelopes(
        df, ["k"], "lsn", "op", ["a", "b"],
        mask_col="changed" if mask else None,
        keep_meta=keep_meta,
    )


# --------------------------------------------------------------------------
# fold — null-means-unchanged convention


def test_fold_patches_compose_columnwise(spark):
    rows = [
        (1, "I", 1, "a0", "b0", None),
        (2, "U", 1, None, "b1", None),   # touches b only
        (3, "U", 1, "a1", None, None),   # touches a only
    ]
    out = _fold(spark, rows).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["lsn"]) == ("a1", "b1", 3)


def test_fold_full_image_resets_earlier_patches(spark):
    rows = [
        (1, "U", 1, "a0", None, None),
        (2, "U", 1, None, "b0", None),
        (3, "I", 1, "a1", None, None),   # full image: b is a TRUE null
        (4, "U", 1, None, None, None),   # empty patch, sets nothing
    ]
    r = _fold(spark, rows).collect()[0]
    assert r["a"] == "a1"
    assert r["b"] is None  # the pre-image b0 must NOT survive the reset
    assert r["lsn"] == 4


def test_fold_delete_then_patch_stays_dead_then_insert_resurrects(spark):
    rows = [
        (1, "I", 1, "a0", "b0", None),
        (2, "D", 1, None, None, None),
        (3, "U", 1, "a1", None, None),   # orphan patch: must NOT resurrect
        (1, "I", 2, "x0", "y0", None),
        (2, "D", 2, None, None, None),
        (3, "I", 2, "x1", None, None),   # insert AFTER delete: resurrects
        (4, "U", 2, None, "y1", None),
    ]
    out = {r["k"]: r for r in _fold(spark, rows).collect()}
    assert 1 not in out
    assert (out[2]["a"], out[2]["b"]) == ("x1", "y1")


def test_fold_pure_patch_key_without_insert(spark):
    rows = [(1, "U", 1, "a0", None, None), (2, "U", 1, None, "b0", None)]
    r = _fold(spark, rows).collect()[0]
    assert (r["a"], r["b"], r["lsn"]) == ("a0", "b0", 2)


def test_fold_validates_inputs(spark):
    df = spark.createDataFrame([(1, "I", 1, "a", "b", None)], SCHEMA)
    with pytest.raises(ValueError):
        fold_sparse_envelopes(df, [], "lsn", "op", ["a"])
    with pytest.raises(ValueError):
        fold_sparse_envelopes(df, ["k"], "lsn", "op", [])


# --------------------------------------------------------------------------
# fold — mask convention (lossless set-to-NULL)


def test_fold_mask_sets_null_explicitly(spark):
    rows = [
        (1, "I", 1, "a0", "b0", None),
        (2, "U", 1, None, None, ["a"]),  # explicit a := NULL
        (3, "U", 1, None, "b1", ["b"]),
    ]
    r = _fold(spark, rows, mask=True).collect()[0]
    assert r["a"] is None  # set-to-NULL round-trips under the mask
    assert r["b"] == "b1"


def test_fold_mask_unmasked_value_ignored(spark):
    rows = [
        (1, "I", 1, "a0", "b0", None),
        # value present but NOT in the mask → must not apply (the mask is
        # the source of truth; stray payload bytes happen in real feeds)
        (2, "U", 1, "aX", None, ["b"]),
    ]
    r = _fold(spark, rows, mask=True).collect()[0]
    assert r["a"] == "a0"
    assert r["b"] is None


# --------------------------------------------------------------------------
# densify bridge → real snapshot sink


def _seed_table(spark, warehouse, tmp_path):
    from relational_data_loader_spark.fixtures import generate_change_log
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec
    from tests.util import write_log

    log = generate_change_log(n_events=2000, n_convs=40, seed=11)
    logdir = str(tmp_path / "log")
    write_log(log, logdir)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)
    return mgr.table(spec), pc.max(log["lsn"]).as_py()


def test_densify_merge_equals_columnwise_oracle(spark, warehouse, tmp_path):
    tbl, max_lsn = _seed_table(spark, warehouse, tmp_path)
    before = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in tbl.read().collect()
    }
    keys = sorted(before)[:6]
    l0 = max_lsn
    patches = [
        # patch role only on k0; text only on k1; both via two patches on
        # k2 (composition); full image on k3 (reset); delete k4; k5 gets a
        # patch then a delete (dead wins)
        (l0 + 1, "U", *keys[0], "ROLE0", None, None, None),
        (l0 + 2, "U", *keys[1], None, "TEXT1", None, None),
        (l0 + 3, "U", *keys[2], "ROLE2", None, None, None),
        (l0 + 4, "U", *keys[2], None, "TEXT2", None, None),
        (l0 + 5, "I", *keys[3], "ROLE3", None, "TOOL3",
         dt.datetime(2024, 6, 1)),
        (l0 + 6, "D", *keys[4], None, None, None, None),
        (l0 + 7, "U", *keys[5], "ROLE5", None, None, None),
        (l0 + 8, "D", *keys[5], None, None, None, None),
    ]
    batch = spark.createDataFrame(
        patches,
        "lsn bigint, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )
    dense = densify_sparse_batch(
        tbl, batch, ["conv_id", "turn_idx"], "lsn", "op",
        ["role", "text", "tool", "ts"],
    )
    tbl.merge(dense, epoch_id=l0 + 8)

    after = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in tbl.read().collect()
    }
    # oracle: column-level LWW applied in plain python over the pre-state
    want = dict(before)
    for k, pr in [(keys[0], {"role": "ROLE0"}), (keys[1], {"text": "TEXT1"}),
                  (keys[2], {"role": "ROLE2", "text": "TEXT2"})]:
        want[k] = {**want[k], **pr}
    want[keys[3]] = {
        "conv_id": keys[3][0], "turn_idx": keys[3][1], "role": "ROLE3",
        "text": None, "tool": "TOOL3", "ts": dt.datetime(2024, 6, 1),
    }
    del want[keys[4]]
    del want[keys[5]]
    assert after == want


def test_densify_is_idempotent_via_epoch_guard(spark, warehouse, tmp_path):
    tbl, max_lsn = _seed_table(spark, warehouse, tmp_path)
    k = sorted(
        (r["conv_id"], r["turn_idx"]) for r in tbl.read().collect()
    )[0]
    batch = spark.createDataFrame(
        [(max_lsn + 1, "U", *k, "RX", None, None, None)],
        "lsn bigint, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )
    dense = densify_sparse_batch(
        tbl, batch, ["conv_id", "turn_idx"], "lsn", "op",
        ["role", "text", "tool", "ts"],
    )
    s1 = tbl.merge(dense, epoch_id=max_lsn + 1)
    s2 = tbl.merge(dense, epoch_id=max_lsn + 1)  # replayed epoch
    assert not s1.skipped and s2.skipped
    row = [
        r for r in tbl.read().collect()
        if (r["conv_id"], r["turn_idx"]) == k
    ][0]
    assert row["role"] == "RX"


def _python_fold(envs):
    """Independent oracle: column-level LWW fold in plain python."""
    by_key = {}
    for e in sorted(envs, key=lambda e: e[0]):
        lsn, op, cid, tidx, role, text, tool, ts = e
        k = (cid, tidx)
        st = by_key.setdefault(k, {"anchor": None, "dead": None, "cols": {}})
        if op == "D":
            st["dead"] = lsn
        elif op == "I":
            st["anchor"] = lsn
            st["cols"] = {"role": role, "text": text, "tool": tool, "ts": ts}
        else:
            for c, v in zip(["role", "text", "tool", "ts"], [role, text, tool, ts]):
                if v is not None:
                    st["cols"][c] = v
    out = {}
    for k, st in by_key.items():
        if st["dead"] is not None and (st["anchor"] or -1) <= st["dead"]:
            continue
        out[k] = {c: st["cols"].get(c) for c in ["role", "text", "tool", "ts"]}
    return out


def test_manager_runs_sparse_spec_end_to_end(spark, warehouse, tmp_path):
    """envelope='sparse' through the whole engine: full refresh folds the
    sparse head, the incremental tail densifies+merges; final state equals
    an independent python fold of the entire envelope stream. NOTE the
    python oracle replays ops in lsn order WITHOUT the anchor-reset rule
    (patches below a later full image are applied then overwritten), which
    coincides with the fold exactly when application is in-order — the
    equivalence this test pins."""
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec

    envs = [
        (1, "I", "c1", 0, "user", "t0", None, dt.datetime(2024, 1, 1)),
        (2, "U", "c1", 0, None, "t1", None, None),          # patch text
        (3, "U", "c1", 0, "assistant", None, None, None),   # patch role
        (4, "I", "c2", 0, "user", "x0", "tl", dt.datetime(2024, 1, 2)),
        (5, "D", "c2", 0, None, None, None, None),          # delete c2
        (6, "U", "c3", 0, None, "orphan", None, None),      # patch-only key
        # --- tail (incremental epoch) ---
        (7, "U", "c1", 0, None, None, "tool7", None),       # patch tool
        (8, "I", "c2", 0, "user", "resurrected", None, None),  # resurrect
        (9, "D", "c3", 0, None, None, None, None),          # kill c3
    ]
    schema = (
        "lsn bigint, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp"
    )
    logdir = str(tmp_path / "slog")
    spark.createDataFrame([e for e in envs if e[0] <= 6], schema).write.mode(
        "overwrite"
    ).parquet(logdir)
    spec = transcripts_spec(
        source=f"parquet://{logdir}", target_buckets=4, envelope="sparse"
    )
    mgr = DataLoadManager(spark, warehouse)
    r1 = mgr.run(spec)
    assert r1.decision.kind == "full_refresh" and r1.rows_upserted == 2

    spark.createDataFrame(envs, schema).write.mode("overwrite").parquet(logdir)
    r2 = mgr.run(spec)
    assert r2.decision.kind == "incremental" and not r2.skipped
    r3 = mgr.run(spec)
    assert r3.skipped  # watermark idempotence holds for sparse specs too

    got = {
        (r["conv_id"], r["turn_idx"]): {
            c: r[c] for c in ["role", "text", "tool", "ts"]
        }
        for r in mgr.table(spec).read().collect()
    }
    assert got == _python_fold(envs)
    # spot-check the column composition across the epoch boundary
    assert got[("c1", 0)] == {
        "role": "assistant", "text": "t1", "tool": "tool7",
        "ts": dt.datetime(2024, 1, 1),
    }


def test_sparse_spec_json_roundtrip_and_validation(spark):
    from relational_data_loader_spark.spec import IngestSpec, transcripts_spec

    spec = transcripts_spec(source="parquet:///x", envelope="sparse")
    again = IngestSpec.from_json(spec.to_json())
    assert again.envelope == "sparse"
    # envelope is wire format, not schema: flipping it must not refresh
    assert again.checksum() == transcripts_spec(source="parquet:///x").checksum()
    with pytest.raises(ValueError):
        transcripts_spec(source="parquet:///x", envelope="bogus")


def test_streaming_rejects_sparse_specs(spark, warehouse, tmp_path):
    from relational_data_loader_spark.plans.manager import DataLoadManager
    from relational_data_loader_spark.spec import transcripts_spec
    from relational_data_loader_spark.streaming.runner import StreamingIngest

    spec = transcripts_spec(source="parquet:///x", envelope="sparse")
    mgr = DataLoadManager(spark, warehouse)
    with pytest.raises(ValueError, match="batch-only"):
        StreamingIngest(mgr, spec, str(tmp_path / "ck"))


def test_densify_new_key_pure_patch_inserts_partial_row(spark, warehouse, tmp_path):
    tbl, max_lsn = _seed_table(spark, warehouse, tmp_path)
    batch = spark.createDataFrame(
        [(max_lsn + 1, "U", "conv-new", 999, None, "hello", None, None)],
        "lsn bigint, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )
    dense = densify_sparse_batch(
        tbl, batch, ["conv_id", "turn_idx"], "lsn", "op",
        ["role", "text", "tool", "ts"],
    )
    tbl.merge(dense, epoch_id=max_lsn + 1)
    row = [
        r for r in tbl.read().collect()
        if (r["conv_id"], r["turn_idx"]) == ("conv-new", 999)
    ]
    assert len(row) == 1
    assert row[0]["text"] == "hello" and row[0]["role"] is None
