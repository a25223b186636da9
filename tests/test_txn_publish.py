"""Cross-table transactional publish (plans/txn.py): two-phase group
commit over WAP branches, crash recovery (roll forward / abort), rival
conflict compensation, the compensation-hazard guard, and pinned
consistent-cut reads."""

import datetime as dt
import json
import os
from glob import glob

import pytest

from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.plans.txn import (
    GroupPublishConflict,
    list_cuts,
    publish_group,
    read_cut,
    recover_groups,
)
from relational_data_loader_spark.sinks.snapshot import SnapshotTable
from relational_data_loader_spark.spec import ColumnSpec, IngestSpec, transcripts_spec

TS = dt.datetime(2026, 1, 1)
ENV_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp"
)
REG_SCHEMA = "lsn long, op string, conv_id string, last_role string"


def registry_spec(**kw) -> IngestSpec:
    cols = [
        ColumnSpec("conv_id", "conv_id", "string", primary_key=True, nullable=False),
        ColumnSpec("last_role", "last_role", "string"),
    ]
    kwargs = dict(name="conv_registry", source="parquet:///dev/null", columns=cols)
    kwargs.update(kw)
    return IngestSpec(**kwargs)


@pytest.fixture()
def pair(spark, warehouse):
    """Two tables (transcripts + conv_registry) with committed main state
    and one staged WAP branch each carrying an FK-consistent update."""
    mgr = DataLoadManager(spark, warehouse)
    spec_a = transcripts_spec(source="parquet:///dev/null", target_buckets=4)
    spec_b = registry_spec(target_buckets=4)
    ta, tb = mgr.table(spec_a), mgr.table(spec_b)

    init_a = [(i, "U", f"c{i % 2}", i, "user", f"t{i}", None, TS) for i in range(4)]
    init_b = [(3, "U", "c0", "user"), (4, "U", "c1", "user")]
    ta.full_refresh_from_envelopes(
        spark.createDataFrame(init_a, ENV_SCHEMA), epoch_id=0, watermark=10
    )
    tb.full_refresh_from_envelopes(
        spark.createDataFrame(init_b, REG_SCHEMA), epoch_id=0, watermark=10
    )
    # staged update: a NEW conversation c9 lands in both tables — readers
    # must never see the turn without its registry row
    ta.branch("wap").merge(
        spark.createDataFrame(
            [(20, "U", "c9", 0, "asst", "new", None, TS)], ENV_SCHEMA
        ),
        epoch_id=1,
    )
    tb.branch("wap").merge(
        spark.createDataFrame([(20, "U", "c9", "asst")], REG_SCHEMA), epoch_id=1
    )
    return mgr, spec_a, spec_b, ta, tb


def _convs(tbl):
    return {r["conv_id"] for r in tbl.read().select("conv_id").distinct().collect()}


def _journals(warehouse):
    return [
        json.load(open(p))
        for p in sorted(glob(os.path.join(warehouse, "_txn", "*.json")))
    ]


def test_group_publish_happy_path(pair, warehouse):
    mgr, spec_a, spec_b, ta, tb = pair
    assert "c9" not in _convs(ta)  # staged, invisible on main
    j = publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    assert j["status"] == "committed"
    assert "c9" in _convs(ta) and "c9" in _convs(tb)
    assert ta.list_branches() == [] and tb.list_branches() == []
    # consistent cut pinned the published versions
    (cut,) = list_cuts(warehouse)
    assert cut["txid"] == j["txid"]
    assert cut["tables"] == {
        p["table"]: p["target_main_version"] for p in j["participants"]
    }
    views = read_cut(mgr, [spec_a, spec_b], j["txid"])
    assert {r["conv_id"] for r in views["transcripts"].collect()} >= {"c9"}


def test_read_cut_is_immune_to_later_commits(pair, spark):
    mgr, spec_a, spec_b, ta, tb = pair
    j = publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    # later main-line churn: c9's turn gets deleted
    ta.merge(
        spark.createDataFrame(
            [(30, "D", "c9", 0, None, None, None, None)], ENV_SCHEMA
        ),
        epoch_id=2,
    )
    assert "c9" not in _convs(ta)
    views = read_cut(mgr, [spec_a, spec_b], j["txid"])
    assert "c9" in {r["conv_id"] for r in views["transcripts"].collect()}


def test_crash_mid_group_rolls_forward(pair, warehouse):
    mgr, spec_a, spec_b, ta, tb = pair
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")], _fail_after=1)
    # torn: first participant live, second still staged
    assert "c9" in _convs(ta) and "c9" not in _convs(tb)
    (j,) = _journals(warehouse)
    assert j["status"] == "prepared"

    settled = recover_groups(mgr, [spec_a, spec_b])
    assert len(settled) == 1 and settled[0]["status"] == "committed"
    assert "c9" in _convs(tb)
    assert list_cuts(warehouse)[0]["txid"] == j["txid"]
    # idempotent: nothing left to settle
    assert recover_groups(mgr, [spec_a, spec_b]) == []


def test_crash_before_any_publish_aborts(pair, warehouse, monkeypatch):
    mgr, spec_a, spec_b, ta, tb = pair

    def bomb(self, name, require_fast_forward=True):
        raise RuntimeError("crash before first publish [test]")

    monkeypatch.setattr(SnapshotTable, "publish_branch", bomb)
    with pytest.raises(RuntimeError, match="crash before first"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    monkeypatch.undo()

    settled = recover_groups(mgr, [spec_a, spec_b])
    assert settled[0]["status"] == "aborted_crash"
    # nothing published, branches left staged for re-audit / retry
    assert "c9" not in _convs(ta) and "c9" not in _convs(tb)
    assert "wap" in ta.list_branches() and "wap" in tb.list_branches()
    # the staged work is still publishable afterwards
    j = publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    assert j["status"] == "committed"


def test_rival_conflict_compensates_published_participants(pair, spark, warehouse):
    mgr, spec_a, spec_b, ta, tb = pair
    pre_a = sorted(tuple(r) for r in ta.read().collect())
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")], _fail_after=1)
    # rival single-table writer advances B's main past the prepared version
    tb.merge(
        spark.createDataFrame([(21, "U", "c7", "tool")], REG_SCHEMA), epoch_id=7
    )
    # recovery settles the conflict (compensates + stamps) and CONTINUES —
    # it reports the outcome instead of raising, so one stuck group can
    # never block later journals or crash the CLI verb
    (settled,) = recover_groups(mgr, [spec_a, spec_b])
    assert settled["status"] == "aborted_conflict"
    assert settled["rolled_back"] == ["transcripts"] and not settled["unrecovered"]
    # A's publish was compensated: main reads its pre-group state again
    assert sorted(tuple(r) for r in ta.read().collect()) == pre_a
    # rival's write survives untouched
    assert "c7" in _convs(tb)
    # idempotent: the journal is terminal now
    assert recover_groups(mgr, [spec_a, spec_b]) == []


def test_compensation_hazard_guard(pair, spark, warehouse):
    """A rival that built ON TOP of a published participant must NOT be
    erased by compensation — the guard reports it unrecovered instead."""
    mgr, spec_a, spec_b, ta, tb = pair
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")], _fail_after=1)
    # rivals land on BOTH tables: on top of A's published state, and past
    # B's prepared version
    ta.merge(
        spark.createDataFrame(
            [(25, "U", "c9", 1, "tool", "rival", None, TS)], ENV_SCHEMA
        ),
        epoch_id=9,
    )
    tb.merge(
        spark.createDataFrame([(21, "U", "c7", "tool")], REG_SCHEMA), epoch_id=7
    )
    (settled,) = recover_groups(mgr, [spec_a, spec_b])
    assert settled["status"] == "aborted_conflict"
    assert settled["unrecovered"] == ["transcripts"]
    # the rival's row is intact — compensation never reverted it
    texts = {r["text"] for r in ta.read().collect()}
    assert "rival" in texts


def test_prepare_rejects_stale_fork(pair, spark):
    mgr, spec_a, spec_b, ta, tb = pair
    # main A advances after the branch forked → not a fast-forward
    ta.merge(
        spark.createDataFrame(
            [(25, "U", "c0", 0, "tool", "advance", None, TS)], ENV_SCHEMA
        ),
        epoch_id=5,
    )
    with pytest.raises(RuntimeError, match="not a fast-forward"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    # prepare-time failure leaves NO journal side effects to recover
    assert recover_groups(mgr, [spec_a, spec_b]) == []


def test_publish_group_validates_input(pair):
    mgr, spec_a, spec_b, *_ = pair
    with pytest.raises(ValueError, match="no participants"):
        publish_group(mgr, [])
    with pytest.raises(ValueError, match="no staged commits"):
        publish_group(mgr, [(spec_a, "nonexistent")])


def test_live_path_conflict_raises_and_compensates(pair, spark, warehouse, monkeypatch):
    """Rival lands between participant publishes WITHIN one publish_group
    call: the live path compensates and raises the typed conflict."""
    mgr, spec_a, spec_b, ta, tb = pair
    pre_a = sorted(tuple(r) for r in ta.read().collect())
    orig = SnapshotTable.publish_branch

    def sneaky(self, name, require_fast_forward=True):
        out = orig(self, name, require_fast_forward)
        if self.spec.name == "transcripts":
            # immediately after A's fast-forward, a rival advances B's main
            tb.merge(
                spark.createDataFrame([(21, "U", "c7", "tool")], REG_SCHEMA),
                epoch_id=7,
            )
        return out

    monkeypatch.setattr(SnapshotTable, "publish_branch", sneaky)
    with pytest.raises(GroupPublishConflict, match="main advanced"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")])
    monkeypatch.undo()
    assert sorted(tuple(r) for r in ta.read().collect()) == pre_a
    j = [d for d in _journals(warehouse) if d["status"] == "aborted_conflict"]
    assert j and j[0]["rolled_back"] == ["transcripts"]


def test_first_ever_commit_conflict_reports_unrecovered(spark, warehouse, tmp_path):
    """Compensating a participant whose publish was the table's FIRST-EVER
    commit: there is no pre-group version to restore (v0 does not exist),
    so the journal must report it unrecovered — stamped, no crash, no
    permanently-stuck 'prepared' journal."""
    mgr = DataLoadManager(spark, warehouse)
    spec_a = transcripts_spec(source="parquet:///dev/null", target_buckets=4)
    spec_b = registry_spec(target_buckets=4)
    # both tables are born ON the branch: main has no commits at all
    mgr.table(spec_a).branch("wap").full_refresh_from_envelopes(
        spark.createDataFrame(
            [(1, "U", "c1", 0, "user", "x", None, TS)], ENV_SCHEMA
        ),
        epoch_id=0,
        watermark=1,
    )
    mgr.table(spec_b).branch("wap").full_refresh_from_envelopes(
        spark.createDataFrame([(1, "U", "c1", "user")], REG_SCHEMA),
        epoch_id=0,
        watermark=1,
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        publish_group(mgr, [(spec_a, "wap"), (spec_b, "wap")], _fail_after=1)
    # rival takes B's prepared version before recovery
    mgr.table(spec_b).full_refresh_from_envelopes(
        spark.createDataFrame([(2, "U", "c2", "tool")], REG_SCHEMA),
        epoch_id=1,
        watermark=2,
    )
    (settled,) = recover_groups(mgr, [spec_a, spec_b])
    assert settled["status"] == "aborted_conflict"
    assert settled["unrecovered"] == ["transcripts"]
    assert settled["rolled_back"] == []
    # A stays readable (its v1 stands; manual resolution is the operator's
    # documented call), and recovery is terminal
    assert mgr.table(spec_a).read().count() == 1
    assert recover_groups(mgr, [spec_a, spec_b]) == []
