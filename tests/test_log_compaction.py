"""Change-log compaction (sources/compaction.py): replay equivalence for
every consumer position, tombstone retention, crash-duplication tolerance,
and the whole-segments-only / no-op guards. The driver entry
(cdc_log_compaction_state) pins the fresh-bootstrap route against the
DuckDB oracle; this file pins the edges the entry can't reach.
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow.compute as pc

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.sources.compaction import (
    _footer_max,
    compact_change_log,
)
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import duck_final_state, write_log

PK = ["conv_id", "turn_idx"]


def _final(mgr, spec):
    return (
        mgr.table(spec)
        .read()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
        .reset_index(drop=True)
    )


def _oracle(log_dir):
    return duck_final_state(os.path.join(log_dir, "*.parquet"))


def _files(log_dir):
    return sorted(glob.glob(os.path.join(log_dir, "*.parquet")))


def test_compacted_bootstrap_equals_full_replay(spark, tmp_path):
    log = generate_change_log(n_events=4000, n_convs=50, seed=3)
    logdir = str(tmp_path / "log")
    write_log(log, logdir, n_files=6)
    want = _oracle(logdir)  # oracle BEFORE compaction, over the full log

    hi = pc.max(log["lsn"]).as_py()
    stats = compact_change_log(spark, logdir, hi // 2, PK)
    assert not stats["skipped"] and stats["segments_consumed"] >= 2
    assert stats["rows_out"] < stats["rows_in"], "netting must shrink"

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp_path / "wh"))
    mgr.run(spec)
    # deletes netted as tombstone WINNERS stay in the log (Kafka-style);
    # the oracle already excludes those keys, so frame equality checks
    # both no-resurrection and no-loss at once
    pd.testing.assert_frame_equal(_final(mgr, spec), want, check_dtype=False)


def test_synced_destination_survives_compaction(spark, tmp_path):
    """A destination synced to the log HEAD before compaction must land on
    the full oracle after the tail arrives — whether the CT probe routes
    the post-compaction run incrementally or (min-valid conservatism)
    through a full refresh, the STATE contract is the same."""
    log = generate_change_log(n_events=4000, n_convs=50, seed=4)
    logdir = str(tmp_path / "log")
    hi = pc.max(log["lsn"]).as_py()
    cut = hi // 2

    write_log(log, logdir, n_files=4, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp_path / "wh"))
    mgr.run(spec)  # synced to cut

    stats = compact_change_log(spark, logdir, cut, PK)  # whole synced head
    assert not stats["skipped"]
    write_log(log, logdir, n_files=4, lsn_from=cut)
    mgr.run(spec)

    # the on-disk log (compacted prefix + tail) must itself stay
    # LWW-equivalent to the original log — and the table must match it
    full = str(tmp_path / "fulllog")
    write_log(log, full, n_files=4)
    want = _oracle(full)
    pd.testing.assert_frame_equal(_oracle(logdir), want, check_dtype=False)
    pd.testing.assert_frame_equal(_final(mgr, spec), want, check_dtype=False)


def test_crash_between_write_and_delete_is_harmless(spark, tmp_path):
    """Write-first crash ordering: if compaction dies after publishing the
    netted segment but before removing the consumed prefix, every prefix
    event exists twice — replay must still net to the oracle, and a RERUN
    of compaction consumes both copies."""
    log = generate_change_log(n_events=3000, n_convs=40, seed=5)
    logdir = str(tmp_path / "log")
    write_log(log, logdir, n_files=6)
    want = _oracle(logdir)
    hi = pc.max(log["lsn"]).as_py()

    saved = str(tmp_path / "saved")
    shutil.copytree(logdir, saved)
    pre = {os.path.basename(f) for f in _files(logdir)}
    compact_change_log(spark, logdir, hi // 2, PK)
    post = {os.path.basename(f) for f in _files(logdir)}
    consumed = pre - post
    assert len(consumed) >= 2
    for name in consumed:  # restore = the crash left them behind
        shutil.copy(os.path.join(saved, name), os.path.join(logdir, name))

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp_path / "wh"))
    mgr.run(spec)
    pd.testing.assert_frame_equal(_final(mgr, spec), want, check_dtype=False)

    # rerun consumes the duplicates too, and the log still replays clean
    stats2 = compact_change_log(spark, logdir, hi // 2, PK)
    assert not stats2["skipped"]
    pd.testing.assert_frame_equal(_oracle(logdir), want, check_dtype=False)


def test_whole_segments_only_and_noop_guard(spark, tmp_path):
    log = generate_change_log(n_events=2000, n_convs=30, seed=6)
    logdir = str(tmp_path / "log")
    write_log(log, logdir, n_files=4)

    # a boundary just past segment 0's max leaves only ONE eligible
    # segment (write_log slices are lsn-ordered), and one segment alone
    # is a no-op: nothing consumed, nothing written
    files = _files(logdir)
    boundary = _footer_max(files[0], "lsn") + 1
    stats = compact_change_log(spark, logdir, boundary, PK)
    assert stats["skipped"] and stats["segments_consumed"] == 0
    assert _files(logdir) == files
