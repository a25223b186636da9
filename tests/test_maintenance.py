"""Vacuum: long merge histories leave orphaned bucket files from superseded
manifests; snapshot expiry removes them without disturbing current state.

(Per-bucket compaction is unnecessary for this sink by construction — a
merge rewrites each touched bucket to exactly one file; compaction belongs
to the Iceberg merge-on-read sink, sinks/iceberg.py.)
"""

import glob
import os

import pyarrow.compute as pc

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


def test_vacuum_removes_only_orphans(spark, warehouse, tmp_path):
    tbl = generate_change_log(n_events=3000, n_convs=40, seed=17)
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(tbl["lsn"]).as_py()

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    # apply the log in 6 slices → 6 commits → superseded files accumulate
    step = max_lsn // 6 + 1
    for i in range(6):
        write_log(tbl, logdir, lsn_upto=min((i + 1) * step, max_lsn), lsn_from=i * step)
        mgr.run(spec)

    t = mgr.table(spec)
    before = spark_sorted_pdf(t.read())

    data_glob = os.path.join(warehouse, "transcripts", "data", "*", "_bucket=*", "*.parquet")
    n_files_before = len(glob.glob(data_glob))
    referenced = sum(len(f) for f in t.current_manifest()["buckets"].values())
    assert n_files_before > referenced, "history must have produced orphans"

    removed = t.vacuum(keep_manifests=1)
    assert removed == n_files_before - referenced
    assert len(glob.glob(data_glob)) == referenced

    final = spark_sorted_pdf(t.read())
    assert_tables_equal(final, before)
    assert_tables_equal(final, duck_final_state(f"{logdir}/*.parquet"))


def test_optimize_sorts_buckets_preserving_state(spark, warehouse, tmp_path):
    tbl = generate_change_log(n_events=3000, n_convs=40, seed=23)
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(tbl["lsn"]).as_py()
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    write_log(tbl, logdir, lsn_upto=max_lsn // 2)
    mgr.run(spec)
    write_log(tbl, logdir, lsn_from=max_lsn // 2)
    mgr.run(spec)

    t = mgr.table(spec)
    before = spark_sorted_pdf(t.read())
    m0 = t.current_manifest()
    v0 = m0["version"]
    n_files = sum(len(f) for f in m0["buckets"].values())

    compacted = t.optimize()
    assert compacted == n_files

    m1 = t.current_manifest()
    assert m1["version"] == v0 + 1 and m1["kind"] == "optimize"
    # replay guard + watermark carry over untouched
    assert m1["applied_epochs"] == m0["applied_epochs"]
    assert m1["watermark"] == m0["watermark"]
    # one file per bucket, every bucket rewritten
    assert all(len(f) == 1 for f in m1["buckets"].values())

    # logical state is bit-identical (tombstones included: the READ view
    # hides them, so also compare raw storage row counts)
    assert_tables_equal(spark_sorted_pdf(t.read()), before)
    raw0 = t._read_files([p for f in m0["buckets"].values() for p in f]).count()
    raw1 = t._read_files([p for f in m1["buckets"].values() for p in f]).count()
    assert raw0 == raw1

    # rows inside each rewritten file are PK-sorted (the row-group pruning
    # contract)
    for files in m1["buckets"].values():
        pdf = t._read_files(files).toPandas()
        keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
        assert keys == sorted(keys)

    # time travel: the pre-optimize version still reads the old files
    assert_tables_equal(spark_sorted_pdf(t.read(version=v0)), before)
