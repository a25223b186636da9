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
