"""Table clones (SnapshotTable.clone_to — the Delta/Iceberg CLONE analog):
shallow zero-copy semantics, bidirectional divergence isolation, GC safety
in both directions (including the documented source-vacuum liability),
deep-clone byte isolation, MoR delta carry-over, and continued ingestion
on the clone."""

import datetime as dt
import os
from glob import glob

import pytest

from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.sinks.snapshot import SnapshotTable
from relational_data_loader_spark.spec import transcripts_spec

TS = dt.datetime(2026, 1, 1)
ENV_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp"
)


def mk(spark, path, mode="cow", **kw):
    spec = transcripts_spec(
        source="parquet:///dev/null", target_buckets=4, merge_mode=mode, **kw
    )
    return SnapshotTable(spark, path, spec)


def seed(spark, t, n=8):
    rows = [(i, "U", f"c{i % 3}", i, "user", f"t{i}", None, TS) for i in range(n)]
    t.full_refresh_from_envelopes(
        spark.createDataFrame(rows, ENV_SCHEMA), epoch_id=0, watermark=n
    )
    return t


def merge1(spark, t, lsn, conv, turn, text, epoch):
    t.merge(
        spark.createDataFrame(
            [(lsn, "U", conv, turn, "user", text, None, TS)], ENV_SCHEMA
        ),
        epoch_id=epoch,
    )


def vis(t):
    return sorted(tuple(r) for r in t.read().collect())


def data_files(path):
    return glob(os.path.join(path, "data", "*", "_bucket=*", "*.parquet"))


def test_shallow_clone_zero_copy_reads_equal(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    m = src.clone_to(str(tmp_path / "dev"), mode="shallow")
    assert m["kind"] == "clone_shallow"
    clone = mk(spark, str(tmp_path / "dev"))
    assert vis(clone) == vis(src)
    assert data_files(str(tmp_path / "dev")) == [], "shallow clone copied bytes"
    assert clone.fsck()["ok"]


def test_clone_divergence_is_isolated_both_ways(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    base = vis(src)
    src.clone_to(str(tmp_path / "dev"))
    clone = mk(spark, str(tmp_path / "dev"))
    merge1(spark, clone, 100, "c0", 0, "clone-edit", 1)
    assert vis(src) == base, "clone merge leaked into source"
    merge1(spark, src, 101, "c1", 1, "src-edit", 2)
    texts = {r[3] for r in vis(clone)}
    assert "src-edit" not in texts and "clone-edit" in texts


def test_clone_vacuum_never_touches_source_bytes(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    src.clone_to(str(tmp_path / "dev"))
    clone = mk(spark, str(tmp_path / "dev"))
    # churn the clone so every bucket rewrites, then GC aggressively
    for i, lsn in enumerate(range(100, 108), start=1):
        merge1(spark, clone, lsn, f"c{lsn % 3}", lsn % 8, f"e{lsn}", i)
    clone.vacuum(keep_manifests=1, orphan_min_age_seconds=0)
    assert src.fsck()["ok"], "clone vacuum reclaimed source files"
    assert vis(src)  # still readable


def test_source_vacuum_liability_is_detectable(spark, tmp_path):
    """The documented Delta-parity hazard: the SOURCE's vacuum does not see
    clone references, so expiring the cloned version strands the clone —
    and fsck must say so rather than the read failing mysteriously."""
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    src.clone_to(str(tmp_path / "dev"))
    clone = mk(spark, str(tmp_path / "dev"))
    # source churns every bucket past retention, then vacuums hard
    for i, lsn in enumerate(range(100, 108), start=1):
        merge1(spark, src, lsn, f"c{lsn % 3}", lsn % 8, f"e{lsn}", i)
    src.vacuum(keep_manifests=1, orphan_min_age_seconds=0)
    r = clone.fsck()
    assert not r["ok"] and r["missing"], "stranding must be detectable"


def test_deep_clone_survives_source_deletion(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    want = vis(src)
    m = src.clone_to(str(tmp_path / "bak"), mode="deep")
    assert m["kind"] == "clone_deep"
    assert len(data_files(str(tmp_path / "bak"))) > 0
    import shutil

    shutil.rmtree(str(tmp_path / "src"))
    clone = mk(spark, str(tmp_path / "bak"))
    assert vis(clone) == want and clone.fsck()["ok"]


def test_clone_carries_mor_deltas_and_keeps_folding(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src"), mode="mor"))
    merge1(spark, src, 100, "c0", 0, "delta-edit", 1)
    assert src.current_manifest().get("deltas")
    src.clone_to(str(tmp_path / "dev"))
    clone = mk(spark, str(tmp_path / "dev"), mode="mor")
    assert vis(clone) == vis(src)
    assert clone.current_manifest().get("deltas")
    # compaction on the clone rewrites locally, never upstream
    clone.compact_deltas()
    assert vis(clone) == vis(src)
    assert src.current_manifest().get("deltas"), "clone compaction leaked"


def test_clone_continues_ingestion_from_same_log(spark, tmp_path):
    """The dev-replay workflow: clone production state, keep tailing the
    SAME change log on the clone — the carried watermark/epochs make the
    clone apply only what production had not yet applied."""
    import pyarrow.compute as pc

    from relational_data_loader_spark.fixtures import generate_change_log
    from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log

    log = generate_change_log(n_events=2000, n_convs=40, seed=13)
    logdir = str(tmp_path / "log")
    cut = pc.max(log["lsn"]).as_py() // 2
    write_log(log, logdir, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp_path / "prod"))
    mgr.run(spec)

    mgr.table(spec).clone_to(str(tmp_path / "dev" / spec.name))
    dev_mgr = DataLoadManager(spark, str(tmp_path / "dev"))
    write_log(log, logdir, lsn_from=cut)
    res = dev_mgr.run(spec)
    assert res.decision.kind == "incremental" and not res.skipped
    got = spark_sorted_pdf(dev_mgr.table(spec).read())
    assert_tables_equal(got, duck_final_state(f"{logdir}/*.parquet"))
    # production never advanced
    assert mgr.table(spec).watermark() == cut


def test_clone_validations(spark, tmp_path):
    src = seed(spark, mk(spark, str(tmp_path / "src")))
    with pytest.raises(ValueError, match="shallow.*deep|'shallow' or 'deep'"):
        src.clone_to(str(tmp_path / "x"), mode="full")
    with pytest.raises(ValueError, match="destination is the source"):
        src.clone_to(str(tmp_path / "src"))
    src.clone_to(str(tmp_path / "x"))
    with pytest.raises(RuntimeError, match="already has a table"):
        src.clone_to(str(tmp_path / "x"))


def test_shallow_clone_commit_is_metadata_only(spark, tmp_path, monkeypatch):
    """The clone commit must not open a single parquet footer: the source's
    per-file stats carry over under the remapped keys (zone maps included,
    so read_range prunes on the clone immediately)."""
    import pyarrow.parquet as pq_mod

    src = seed(spark, mk(spark, str(tmp_path / "src")))
    src_stats = src.current_manifest()["file_stats"]

    def bomb(*a, **kw):
        raise AssertionError("clone commit opened a parquet footer")

    monkeypatch.setattr(pq_mod, "ParquetFile", bomb)
    m = src.clone_to(str(tmp_path / "dev"), mode="shallow")
    monkeypatch.undo()
    assert len(m["file_stats"]) == len(src_stats)
    # stats values identical to the source's, keyed by the absolute refs
    got = {os.path.basename(k): v for k, v in m["file_stats"].items()}
    want = {os.path.basename(k): v for k, v in src_stats.items()}
    assert got == want
