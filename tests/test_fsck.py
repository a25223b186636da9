"""Integrity scan: commit-time file stats in the manifest + fsck
verification (missing / truncated / swapped data files), and the CLI's
rc-3 corruption signal."""

import os
import pathlib

import pyarrow.compute as pc

from relational_data_loader_spark.cli import main
from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec


def _rig(spark, warehouse, tmp_path, seed=53):
    tbl = generate_change_log(n_events=2500, n_convs=40, seed=seed)
    logdir = str(tmp_path / "log")
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    return tbl, logdir, spec, mgr


def test_manifest_records_stats_and_fsck_passes_clean(
    spark, warehouse, tmp_path
):
    from tests.util import write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path)
    max_lsn = pc.max(tbl["lsn"]).as_py()
    write_log(tbl, logdir, lsn_upto=max_lsn // 2)
    mgr.run(spec)
    write_log(tbl, logdir, lsn_from=max_lsn // 2)
    mgr.run(spec)

    t = mgr.table(spec)
    m = t.current_manifest()
    refd = [p for files in m["buckets"].values() for p in files]
    # every referenced file has commit-time stats
    assert set(m["file_stats"]) == set(refd)
    assert all(
        s["rows"] > 0 and s["bytes"] > 0 for s in m["file_stats"].values()
    )
    rep = t.fsck()
    assert rep["ok"] and rep["files_checked"] == len(refd)
    assert rep["missing"] == [] and rep["corrupt"] == []

    # maintenance rewrites keep stats fresh for their new files
    t.optimize()
    assert t.fsck()["ok"]
    t.rebucket(8)
    assert t.fsck()["ok"]


def test_fsck_flags_missing_truncated_and_swapped(spark, warehouse, tmp_path):
    from tests.util import write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=59)
    write_log(tbl, logdir)
    mgr.run(spec)
    t = mgr.table(spec)
    m = t.current_manifest()
    refd = sorted(p for files in m["buckets"].values() for p in files)
    victim_missing, victim_trunc, victim_swap = refd[0], refd[1], refd[2]

    os.remove(os.path.join(t.path, victim_missing))
    full_t = os.path.join(t.path, victim_trunc)
    with open(full_t, "r+b") as f:
        f.truncate(os.path.getsize(full_t) // 2)
    # swap: replace with a DIFFERENT valid parquet file of the same table
    # (size differs -> caught by the size check before the footer read)
    import shutil

    shutil.copyfile(
        os.path.join(t.path, refd[3]), os.path.join(t.path, victim_swap)
    )

    rep = t.fsck()
    assert not rep["ok"]
    assert rep["missing"] == [victim_missing]
    assert victim_trunc in rep["corrupt"]
    assert victim_swap in rep["corrupt"]


def test_cli_fsck_rc3_on_corruption(spark, warehouse, tmp_path, capsys):
    import json as _json

    from tests.util import write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=61)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    pathlib.Path(specdir / "transcripts.json").write_text(spec.to_json())
    write_log(tbl, logdir)
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    capsys.readouterr()

    # clean table: rc 0 and an ok report
    assert (
        main(["--warehouse", warehouse, "--specs", str(specdir), "--fsck"])
        == 0
    )
    out = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert out[-1]["fsck"]["ok"]

    # corrupt one file: rc 3
    t = mgr.table(spec)
    m = t.current_manifest()
    victim = sorted(p for f in m["buckets"].values() for p in f)[0]
    os.remove(os.path.join(t.path, victim))
    assert (
        main(["--warehouse", warehouse, "--specs", str(specdir), "--fsck"])
        == 3
    )
    out = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert out[-1]["fsck"]["missing"] == [victim]


def test_rollback_then_rerun_repairs_corruption(spark, warehouse, tmp_path):
    """The full disaster drill: corrupt the current version's files, fsck
    flags it, roll back to the last intact version, re-run the load — the
    tail re-ingests exactly-once and the final state equals the oracle."""
    from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=67)
    max_lsn = pc.max(tbl["lsn"]).as_py()
    write_log(tbl, logdir, lsn_upto=max_lsn // 2)
    mgr.run(spec)
    t = mgr.table(spec)
    v1 = t.current_manifest()["version"]
    write_log(tbl, logdir, lsn_from=max_lsn // 2)
    mgr.run(spec)
    m2 = t.current_manifest()
    assert m2["version"] > v1

    # corrupt a file that v2 references but v1 does not
    v1_files = {
        p
        for f in t.manifest_at(v1)["buckets"].values()
        for p in f
    }
    victim = next(
        p
        for f in m2["buckets"].values()
        for p in f
        if p not in v1_files
    )
    with open(os.path.join(t.path, victim), "r+b") as fh:
        fh.truncate(10)
    assert not t.fsck()["ok"]
    # the target version is still intact — check BEFORE rolling back
    assert t.fsck(version=v1)["ok"]

    m3 = t.rollback(v1)
    assert m3["kind"] == "rollback" and m3["rollback_of"] == v1
    assert m3["rolled_back_from"] == m2["version"]
    assert t.fsck()["ok"]
    # content == v1, watermark reverted
    assert_tables_equal(
        spark_sorted_pdf(t.read()), spark_sorted_pdf(t.read(version=v1))
    )
    assert t.watermark() == t.manifest_at(v1)["watermark"]

    # re-run: the tail re-ingests and the final state matches the oracle
    r = mgr.run(spec)
    assert r.decision.kind == "incremental" and not r.skipped
    assert_tables_equal(
        spark_sorted_pdf(t.read()), duck_final_state(f"{logdir}/*.parquet")
    )

    # guard: rolling back to the current version is rejected
    import pytest

    with pytest.raises(ValueError, match="already the current version"):
        t.rollback(t.current_manifest()["version"])


def test_cli_rollback_flag(spark, warehouse, tmp_path, capsys):
    import json as _json

    from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=71)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    pathlib.Path(specdir / "transcripts.json").write_text(spec.to_json())
    max_lsn = pc.max(tbl["lsn"]).as_py()
    write_log(tbl, logdir, lsn_upto=max_lsn // 2)
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    t = mgr.table(spec)
    v1 = t.current_manifest()["version"]
    write_log(tbl, logdir, lsn_from=max_lsn // 2)
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    capsys.readouterr()

    rc = main(
        ["--warehouse", warehouse, "--specs", str(specdir),
         "--rollback-to", str(v1), "--fsck"]
    )
    assert rc == 0
    out = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert out[-1]["rolled_back_to"] == v1 and out[-1]["fsck"]["ok"]
    # batch run after CLI rollback converges back to the oracle state
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    assert_tables_equal(
        spark_sorted_pdf(t.read()), duck_final_state(f"{logdir}/*.parquet")
    )


def test_maintenance_report_recommendations(spark, warehouse, tmp_path):
    from tests.util import write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=73)
    write_log(tbl, logdir)
    mgr.run(spec)
    t = mgr.table(spec)

    rep = t.maintenance_report()
    assert rep["n_buckets"] == 4 and rep["total_rows"] > 0
    # fresh full refresh: one file per bucket, nothing to optimize
    assert rep["max_files_per_bucket"] == 1
    assert rep["recommend_optimize"] is False
    # tiny table vs the 512MB default target: no rebucket either
    assert rep["recommend_rebucket_to"] is None
    assert rep["bucket_skew"] >= 1.0

    # squeeze the target so the mean bucket exceeds it: recommendation is
    # the next power-of-two multiple that brings it back under
    tiny = t.maintenance_report(target_bucket_bytes=rep["mean_bucket_bytes"] // 3)
    assert tiny["recommend_rebucket_to"] == 16  # 4 buckets * 2^2
    # acting on the advice splits the layout and shrinks buckets (at this
    # KB scale per-file parquet overhead keeps totals from dividing
    # perfectly by 4, so assert direction + layout, not exact clearing —
    # at real bucket sizes the overhead is noise)
    t.rebucket(tiny["recommend_rebucket_to"])
    after = t.maintenance_report(target_bucket_bytes=rep["mean_bucket_bytes"] // 3)
    assert after["n_buckets"] == 16
    assert after["mean_bucket_bytes"] < rep["mean_bucket_bytes"]


def test_cli_maintenance_report(spark, warehouse, tmp_path, capsys):
    import json as _json

    from tests.util import write_log

    tbl, logdir, spec, mgr = _rig(spark, warehouse, tmp_path, seed=79)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    pathlib.Path(specdir / "transcripts.json").write_text(spec.to_json())
    write_log(tbl, logdir)
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    capsys.readouterr()
    assert (
        main(
            ["--warehouse", warehouse, "--specs", str(specdir),
             "--maintenance-report"]
        )
        == 0
    )
    out = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    rep = out[-1]["report"]
    assert rep["n_buckets"] == 4 and "recommend_optimize" in rep
