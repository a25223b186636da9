"""Out-of-order segment delivery (the round-2 root-caused bug).

Structured Streaming's file source batches by file mtime, not lsn; around a
kill/resume it was OBSERVED delivering segment [1537,1920] before
[1153,1536]. The round-1 global-watermark drop silently lost the permuted
segment (100 final rows). These tests replay that exact permutation
deterministically through apply_batch and assert the version-guarded merge
(sinks/snapshot.py) lands the same final state as an in-order replay.
"""

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from relational_data_loader_spark.streaming.runner import StreamingIngest
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


@pytest.fixture(scope="module")
def log_tbl():
    # seed 11 = the log that exposed the bug in the wild
    return generate_change_log(n_events=3000, n_convs=60, seed=11)


def _ingest(spark, warehouse, tmp_path, log_tbl, n_files=8):
    logdir = str(tmp_path / "log")
    write_log(log_tbl, logdir, n_files=n_files)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    ing = StreamingIngest(mgr, spec, str(tmp_path / "ckpt"))
    batch = lambda lo, hi: (  # noqa: E731
        mgr.spark.read.schema(spec.change_schema())
        .parquet(logdir)
        .filter(f"lsn > {lo} AND lsn <= {hi}")
    )
    return mgr, spec, ing, batch, logdir


def test_permuted_segments_land_the_same_final_state(
    spark, warehouse, tmp_path, log_tbl
):
    """The exact observed permutation: [1537,1920] applied before [1153,1536]."""
    mgr, spec, ing, batch, logdir = _ingest(spark, warehouse, tmp_path, log_tbl)
    max_lsn = pc.max(log_tbl["lsn"]).as_py()

    order = [(0, 384), (384, 768), (768, 1152),
             (1536, 1920),          # <-- arrives EARLY
             (1152, 1536),          # <-- arrives LATE (was silently dropped)
             (1920, 2304), (2304, 2688), (2688, max_lsn)]
    for i, (lo, hi) in enumerate(order):
        ing.apply_batch(batch(lo, hi), epoch_id=i)

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)


def test_stale_segment_cannot_overwrite_or_resurrect(
    spark, warehouse, tmp_path, log_tbl
):
    """A fully superseded old segment REPLAYED after newer ones must change
    nothing: version guard blocks stale updates, tombstones block stale
    inserts from resurrecting deleted PKs."""
    mgr, spec, ing, batch, logdir = _ingest(spark, warehouse, tmp_path, log_tbl)
    max_lsn = pc.max(log_tbl["lsn"]).as_py()

    ing.apply_batch(batch(0, max_lsn), epoch_id=0)       # everything, in order
    before = spark_sorted_pdf(mgr.table(spec).read())

    ing.apply_batch(batch(0, 1536), epoch_id=1)          # stale half, new epoch
    after = spark_sorted_pdf(mgr.table(spec).read())
    assert_tables_equal(after, before)

    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(after, want)


def test_out_of_order_with_interleaved_delete_reinsert(
    spark, warehouse, tmp_path, log_tbl
):
    """Split at arbitrary cuts and apply in reverse order — the hardest case
    for delete/reinsert interplay (I..U..D..I sequences straddle segments)."""
    mgr, spec, ing, batch, logdir = _ingest(spark, warehouse, tmp_path, log_tbl)
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    cuts = [0, 700, 1400, 2100, max_lsn]
    segments = list(zip(cuts, cuts[1:]))
    for i, (lo, hi) in enumerate(reversed(segments)):    # fully reversed
        ing.apply_batch(batch(lo, hi), epoch_id=i)

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)


def test_baseline_still_drops_truly_covered_events(
    spark, warehouse, tmp_path, log_tbl
):
    """The full-refresh baseline really covers its range: replaying events at
    or below it is a no-op (they'd be stale by stamp anyway — this asserts
    the cheap drop path also holds)."""
    mgr, spec, ing, batch, logdir = _ingest(spark, warehouse, tmp_path, log_tbl)
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    mgr.run(spec)  # batch full refresh → baseline = max_lsn
    table = mgr.table(spec)
    assert table.baseline_watermark() == max_lsn
    v_before = table.current_manifest()["version"]

    ing.apply_batch(batch(0, max_lsn), epoch_id=5)  # all ≤ baseline
    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)
    # the drop made the merge an empty no-op commit, not a rewrite
    m = mgr.table(spec).current_manifest()
    assert m["kind"] == "merge_empty" and m["version"] == v_before + 1


def test_expire_tombstones(spark, warehouse, tmp_path, log_tbl):
    mgr, spec, ing, batch, logdir = _ingest(spark, warehouse, tmp_path, log_tbl)
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    ing.apply_batch(batch(0, max_lsn), epoch_id=0)
    table = mgr.table(spec)

    import duckdb

    n_dead = duckdb.sql(
        f"""
        WITH r AS (SELECT *, row_number() OVER
                   (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
                   FROM read_parquet('{logdir}/*.parquet'))
        SELECT count(*) FROM r WHERE rn = 1 AND op = 'D'
        """
    ).fetchone()[0]
    assert n_dead > 0

    expired = table.expire_tombstones(below_lsn=max_lsn)
    assert expired == n_dead
    assert table.expire_tombstones(below_lsn=max_lsn) == 0  # idempotent

    got = spark_sorted_pdf(table.read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)  # visible state unchanged
