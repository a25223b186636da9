"""Optimistic concurrency on the manifest commit: two writers race for
the same version; the loser gets a typed ConcurrentCommitError and
DataLoadManager.run_with_retry re-plans against the winner's commit.

The race is injected at the exact window it occurs in production — after
the loser has listed manifests (chosen its version) but before its
link(2) lands — by wrapping os.link so the FIRST manifest link first lets
a competing manager run the identical load to completion (it commits the
version for real), then proceeds; the original link then collides
naturally. Nothing about the engine is faked.
"""

import os

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.sinks.snapshot import ConcurrentCommitError
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


@pytest.fixture()
def staged(spark, warehouse, tmp_path):
    log = generate_change_log(n_events=3000, n_convs=60, seed=11)
    cut = pc.max(log["lsn"]).as_py() // 2
    logdir = str(tmp_path / "log")
    write_log(log, logdir, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    assert mgr.run(spec).decision.kind == "full_refresh"
    write_log(log, logdir, lsn_from=cut)  # backlog both writers will chase
    return spec, mgr, logdir


def test_loser_gets_typed_error_and_retry_lands_on_winner(
    spark, warehouse, staged, monkeypatch
):
    spec, mgr, logdir = staged
    rival = DataLoadManager(spark, warehouse)
    real_link = os.link
    fired = {"n": 0}

    def racing_link(src, dst, *a, **kw):
        if "_manifests" in str(dst) and fired["n"] == 0:
            fired["n"] = 1
            # the rival lands the SAME incremental load first (real commit)
            monkeypatch.setattr(os, "link", real_link)
            r = rival.run(spec)
            assert r.decision.kind == "incremental" and not r.skipped
            monkeypatch.setattr(os, "link", racing_link)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", racing_link)
    with pytest.raises(ConcurrentCommitError):
        mgr.run(spec)
    monkeypatch.setattr(os, "link", real_link)

    # the loser tracked nothing; a plain re-run re-plans and detects the
    # winner's watermark — nothing left to do
    res = mgr.run(spec)
    assert res.skipped
    got = spark_sorted_pdf(mgr.table(spec).read())
    assert_tables_equal(got, duck_final_state(f"{logdir}/*.parquet"))


def test_run_with_retry_recovers_in_one_call(
    spark, warehouse, staged, monkeypatch
):
    spec, mgr, logdir = staged
    rival = DataLoadManager(spark, warehouse)
    real_link = os.link
    fired = {"n": 0}

    def racing_link(src, dst, *a, **kw):
        if "_manifests" in str(dst) and fired["n"] == 0:
            fired["n"] = 1
            monkeypatch.setattr(os, "link", real_link)
            rival.run(spec)
            monkeypatch.setattr(os, "link", racing_link)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", racing_link)
    res = mgr.run_with_retry(spec, max_attempts=3)
    # attempt 1 lost the race; attempt 2 re-planned and found the winner's
    # commit already covers the backlog
    assert fired["n"] == 1 and res.skipped
    got = spark_sorted_pdf(mgr.table(spec).read())
    assert_tables_equal(got, duck_final_state(f"{logdir}/*.parquet"))


def test_retry_exhaustion_reraises_typed(spark, warehouse, staged, monkeypatch):
    spec, mgr, _ = staged
    real_link = os.link

    def always_lose(src, dst, *a, **kw):
        if "_manifests" in str(dst):
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", always_lose)
    with pytest.raises(ConcurrentCommitError, match="writer storm"):
        mgr.run_with_retry(spec, max_attempts=2)


def test_error_is_runtimeerror_subclass():
    # callers that caught RuntimeError before the typed class keep working
    assert issubclass(ConcurrentCommitError, RuntimeError)


def test_vacuum_age_gates_never_referenced_orphans(
    spark, warehouse, staged, monkeypatch
):
    """A race loser's data files are referenced by no manifest ever.
    Default vacuum must NOT touch them (they are indistinguishable from a
    live writer's in-flight commit); orphan_min_age_seconds=0 reclaims
    them. Superseded-history expiry is unaffected either way."""
    import glob as globmod
    import os

    spec, mgr, logdir = staged
    real_link = os.link

    def always_lose(src, dst, *a, **kw):
        if "_manifests" in str(dst):
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **kw)

    t = mgr.table(spec)
    data_glob = os.path.join(t.path, "data", "*", "_bucket=*", "*.parquet")
    n_before = len(globmod.glob(data_glob))

    monkeypatch.setattr(os, "link", always_lose)
    import pytest as _pytest

    from relational_data_loader_spark.sinks.snapshot import (
        ConcurrentCommitError,
    )

    with _pytest.raises(ConcurrentCommitError):
        mgr.run(spec)
    monkeypatch.setattr(os, "link", real_link)

    n_after_loss = len(globmod.glob(data_glob))
    assert n_after_loss > n_before, "losing attempt must have left orphans"

    # default (age-gated) vacuum keeps the fresh never-referenced files
    assert t.vacuum(keep_manifests=99) == 0
    assert len(globmod.glob(data_glob)) == n_after_loss
    # explicit no-other-writers vacuum reclaims exactly the orphans
    removed = t.vacuum(keep_manifests=99, orphan_min_age_seconds=0)
    assert removed == n_after_loss - n_before
    assert len(globmod.glob(data_glob)) == n_before
    # table is untouched and still serves reads
    assert t.fsck()["ok"]
