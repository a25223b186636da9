"""Write-audit-publish branches on the snapshot sink (sinks/snapshot.py
branch/publish_branch/drop_branch): staged commits invisible to main,
fast-forward publish, divergence rejection, vacuum retention of live
branches, exactly-once carry-over, and fsck on the branch view."""

import os

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.sinks.snapshot import SnapshotTable
from relational_data_loader_spark.sources.readers import read_change_log
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import spark_sorted_pdf, write_log


def _setup(spark, tmp_path, n_events=2000):
    log = generate_change_log(n_events=n_events, n_convs=40, seed=3)
    cut = pc.max(log["lsn"]).as_py() // 2
    write_log(log, str(tmp_path / "log"), lsn_upto=cut)
    spec = transcripts_spec(
        source=f"parquet://{tmp_path}/log", target_buckets=4
    )
    mgr = DataLoadManager(spark, str(tmp_path / "wh"))
    mgr.run(spec)  # main baseline (head of the log)
    return mgr, spec, log, cut


def test_staged_load_invisible_until_publish(spark, tmp_path):
    mgr, spec, log, cut = _setup(spark, tmp_path)
    main = mgr.table(spec)
    v_before = main.current_manifest()["version"]
    before = spark_sorted_pdf(main.read())

    # stage the tail on a branch: main must not move
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    r = mgr.run(spec, branch="audit")
    assert not r.skipped and r.rows_upserted > 0
    assert main.current_manifest()["version"] == v_before
    assert spark_sorted_pdf(main.read()).equals(before)

    # the branch view sees the staged state, and fsck passes on it
    staged = main.branch("audit")
    assert staged.watermark() > main.watermark()
    assert staged.fsck()["ok"]
    assert main.list_branches() == ["audit"]

    # publish: main now equals a plain (branchless) replay of the whole
    # log — the WAP detour must be invisible in the final state
    pub = main.publish_branch("audit")
    assert pub["version"] == v_before + 1
    assert main.list_branches() == []
    oracle = mgr.final_state(spec, read_change_log(spark, spec))
    assert spark_sorted_pdf(main.read()).equals(spark_sorted_pdf(oracle))


def test_publish_carries_epochs_exactly_once(spark, tmp_path):
    mgr, spec, log, cut = _setup(spark, tmp_path)
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    mgr.run(spec, branch="wap")
    mgr.table(spec).publish_branch("wap")
    # the same tail replayed straight at main must skip (watermark +
    # applied_epochs published with the branch head)
    r = mgr.run(spec)
    assert r.skipped


def test_divergence_rejected(spark, tmp_path):
    mgr, spec, log, cut = _setup(spark, tmp_path)
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    mgr.run(spec, branch="stale")
    # main advances past the fork point
    mgr.run(spec)
    main = mgr.table(spec)
    with pytest.raises(RuntimeError, match="not a fast-forward"):
        main.publish_branch("stale")
    # explicit override still works (documented overwrite escape hatch)
    pub = main.publish_branch("stale", require_fast_forward=False)
    assert pub["version"] == main.current_manifest()["version"]


def test_drop_branch_then_vacuum_reclaims_staged_files(spark, tmp_path):
    mgr, spec, log, cut = _setup(spark, tmp_path)
    main = mgr.table(spec)
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    mgr.run(spec, branch="abandon")

    # while the branch lives, vacuum must NOT touch its staged files
    staged_rels = {
        p
        for files in main.branch("abandon").current_manifest()["buckets"].values()
        for p in files
    }
    main_rels = {
        p for files in main.current_manifest()["buckets"].values() for p in files
    }
    only_staged = staged_rels - main_rels
    assert only_staged  # the merge wrote fresh files
    assert main.vacuum(keep_manifests=1) == 0
    for rel in only_staged:
        assert os.path.exists(os.path.join(main.path, rel))

    main.drop_branch("abandon")
    removed = main.vacuum(keep_manifests=1)
    assert removed >= len(only_staged)
    for rel in only_staged:
        assert not os.path.exists(os.path.join(main.path, rel))
    # main is intact
    assert main.fsck()["ok"]


def test_branch_requires_snapshot_sink(spark, tmp_path):
    mgr, spec, _, _ = _setup(spark, tmp_path)
    spec2 = transcripts_spec(
        source=spec.source, target_buckets=4, sink="iceberg://cat.db.t"
    )
    with pytest.raises(Exception):
        # IcebergTable has no branch() view in this sandbox (jar-gated
        # constructor fails first; either way the run must not silently
        # write to main)
        mgr.run(spec2, branch="x")


def test_bad_branch_name_rejected(spark, tmp_path):
    mgr, spec, _, _ = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="invalid branch name"):
        mgr.table(spec).branch("../escape")


def test_publish_retry_after_crash_between_commit_and_cleanup(spark, tmp_path):
    """Kill-between-publish-steps: the main commit landed but drop_branch
    never ran. The retry must complete idempotently (finish the cleanup,
    return the already-published manifest) — not refuse as a divergence,
    and NOT double-commit."""
    mgr, spec, log, cut = _setup(spark, tmp_path)
    main = mgr.table(spec)
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    mgr.run(spec, branch="wap")

    # simulate the crash: run the commit half of publish, skip the cleanup
    orig_drop = SnapshotTable.drop_branch
    try:
        SnapshotTable.drop_branch = lambda self, name: None
        first = main.publish_branch("wap")
    finally:
        SnapshotTable.drop_branch = orig_drop
    assert main.list_branches() == ["wap"]  # cleanup really was skipped

    retried = main.publish_branch("wap")
    assert retried["version"] == first["version"]  # no second commit
    assert main.current_manifest()["version"] == first["version"]
    assert main.list_branches() == []


def test_staged_epoch_replay_skips_on_branch(spark, tmp_path):
    """Exactly-once WITHIN staging: rerunning the same tail against the
    branch must skip (the staged head carries the watermark), so a
    crashed-and-restarted staging job never double-applies."""
    mgr, spec, log, cut = _setup(spark, tmp_path)
    write_log(log, str(tmp_path / "log"), lsn_from=cut)
    r1 = mgr.run(spec, branch="wap")
    assert not r1.skipped
    r2 = mgr.run(spec, branch="wap")
    assert r2.skipped
