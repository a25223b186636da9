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
