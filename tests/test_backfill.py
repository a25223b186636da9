"""DBLog-style chunked backfill (plans/backfill.py): the race and resume
cases the oracle-paired ``cdc_dblog_backfill_state`` entry can't isolate.

Scenario fixture: a change log split at LSN cuts; the target bootstraps
from a middle window (retention expired the head), the backfill merges the
snapshot-at-bootstrap in chunks, the live tail keeps applying in between.
"""

import os

import pyarrow.compute as pc
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.backfill import (
    backfill_chunks,
    run_backfill,
)
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec

from util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


def _snapshot_at(spark, log_dir_all: str, upto: int):
    """LWW-alive source rows at lsn ``upto``, each carrying its own
    last-change lsn — what a chunked SELECT of the live source returns."""
    log = spark.read.parquet(log_dir_all)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("lsn"))
    return (
        log.filter(F.col("lsn") <= upto)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .drop("_rn")
    )


@pytest.fixture()
def scenario(spark, tmp_path):
    log = generate_change_log(n_events=4000, n_convs=80, seed=11)
    mx = pc.max(log["lsn"]).as_py()
    cut1, cut2 = mx // 3, 2 * mx // 3
    all_dir = str(tmp_path / "all")
    live_dir = str(tmp_path / "live")
    write_log(log, all_dir)  # the oracle's full history
    write_log(log, live_dir, lsn_upto=cut2, lsn_from=cut1)  # surviving window
    spec = transcripts_spec(source=f"parquet://{live_dir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp_path / "wh"))
    mgr.run(spec)  # bootstrap full refresh over (cut1, cut2]
    return dict(
        log=log, mx=mx, cut2=cut2, all_dir=all_dir, live_dir=live_dir,
        spec=spec, mgr=mgr, tbl=mgr.table(spec),
    )


def test_backfill_interleaved_with_tail_matches_full_replay(spark, scenario):
    s = scenario
    snap = _snapshot_at(spark, s["all_dir"], s["cut2"])
    gen = backfill_chunks(s["tbl"], snap, "conv_id", n_chunks=4)
    next(gen), next(gen)
    write_log(s["log"], s["live_dir"], lsn_from=s["cut2"])  # tail arrives
    s["mgr"].run(s["spec"])
    next(gen), next(gen)  # late chunks race the applied tail
    assert_tables_equal(
        spark_sorted_pdf(s["tbl"].read()),
        duck_final_state(os.path.join(s["all_dir"], "*.parquet")),
    )


def test_backfill_does_not_resurrect_mid_backfill_delete(spark, scenario):
    s = scenario
    snap = _snapshot_at(spark, s["all_dir"], s["cut2"])
    # pick a key that is alive at cut2 and whose FINAL event is a tail
    # delete (reinsert_frac means some deletes are followed by a fresh I —
    # those keys legitimately survive)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("lsn"))
    tail_deleted = (
        spark.read.parquet(s["all_dir"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            & (F.col("lsn") > s["cut2"])
            & (F.col("op") == "D")
        )
        .join(snap.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"])
        .select("conv_id", "turn_idx")
        .first()
    )
    assert tail_deleted is not None, "fixture must contain a tail delete"
    # tail (with the delete) applies BEFORE any backfill chunk
    write_log(s["log"], s["live_dir"], lsn_from=s["cut2"])
    s["mgr"].run(s["spec"])
    run_backfill(s["tbl"], snap, "conv_id", n_chunks=3)
    got = s["tbl"].read().filter(
        (F.col("conv_id") == tail_deleted["conv_id"])
        & (F.col("turn_idx") == tail_deleted["turn_idx"])
    )
    assert got.count() == 0  # tombstone out-ranked the snapshot insert
    assert_tables_equal(
        spark_sorted_pdf(s["tbl"].read()),
        duck_final_state(os.path.join(s["all_dir"], "*.parquet")),
    )


def test_backfill_resume_skips_applied_chunks(spark, scenario):
    s = scenario
    snap = _snapshot_at(spark, s["all_dir"], s["cut2"])
    gen = backfill_chunks(s["tbl"], snap, "conv_id", n_chunks=4)
    first = [next(gen)[1], next(gen)[1]]
    assert all(not st.skipped for st in first)
    del gen  # "crash" between chunks 1 and 2

    # restart re-runs ALL chunks: 0-1 must no-op via the epoch guard
    stats = run_backfill(s["tbl"], snap, "conv_id", n_chunks=4)
    assert [st.skipped for st in stats] == [True, True, False, False]

    write_log(s["log"], s["live_dir"], lsn_from=s["cut2"])
    s["mgr"].run(s["spec"])
    assert_tables_equal(
        spark_sorted_pdf(s["tbl"].read()),
        duck_final_state(os.path.join(s["all_dir"], "*.parquet")),
    )


def test_backfill_stream_update_beats_older_snapshot_row(spark, scenario):
    s = scenario
    snap = _snapshot_at(spark, s["all_dir"], s["cut2"])
    # a key updated (not deleted) in the tail, also present in the snapshot
    upd = (
        spark.read.parquet(s["all_dir"])
        .filter((F.col("lsn") > s["cut2"]) & (F.col("op") == "U"))
        .join(snap.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"])
        .orderBy("lsn")
        .first()
    )
    assert upd is not None
    write_log(s["log"], s["live_dir"], lsn_from=s["cut2"])
    s["mgr"].run(s["spec"])
    run_backfill(s["tbl"], snap, "conv_id", n_chunks=2)
    row = (
        s["tbl"].read()
        .filter(
            (F.col("conv_id") == upd["conv_id"])
            & (F.col("turn_idx") == upd["turn_idx"])
        )
        .first()
    )
    # final text is the full-log winner, never the older snapshot payload
    oracle = duck_final_state(os.path.join(s["all_dir"], "*.parquet"))
    want = oracle[
        (oracle["conv_id"] == upd["conv_id"])
        & (oracle["turn_idx"] == upd["turn_idx"])
    ]["text"].iloc[0]
    assert row["text"] == want


def test_backfill_rejects_bad_chunk_count(spark, scenario):
    snap = _snapshot_at(spark, scenario["all_dir"], scenario["cut2"])
    with pytest.raises(ValueError, match="n_chunks"):
        list(backfill_chunks(scenario["tbl"], snap, "conv_id", n_chunks=0))
