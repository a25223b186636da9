"""Stateful cross-batch dedup (streaming/state_filter.py): per-PK monotone
LSN filter via applyInPandasWithState.

The engine family this extends: at-least-once upstreams re-deliver log
segments across micro-batches; the sink already no-ops them (version guard +
epoch manifest), these tests pin that the stateful filter (a) removes the
wasted re-delivery BEFORE the merge, (b) never changes final table state —
including the stale-delete case the version guard exists for."""

import os
import time

import pyarrow.parquet as pq
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from relational_data_loader_spark.streaming.runner import StreamingIngest
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf


class RecordingIngest(StreamingIngest):
    """StreamingIngest that records rows delivered to the sink per epoch
    (foreachBatch runs in the driver in local mode, so a list works)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.delivered: list[int] = []

    def apply_batch(self, batch_df, epoch_id):
        batch_df = batch_df.persist()
        try:
            self.delivered.append(batch_df.count())
            super().apply_batch(batch_df, epoch_id)
        finally:
            batch_df.unpersist()


def _write_segments(tbl, logdir, cuts):
    """Write lsn-slices of the log as one parquet file each, in cuts order
    (mtimes strictly increasing so the file source batches deterministically)."""
    os.makedirs(logdir, exist_ok=True)
    t = 1_700_000_000
    for i, (lo, hi) in enumerate(cuts):
        import pyarrow.compute as pc

        seg = tbl.filter(
            pc.and_(pc.greater_equal(tbl["lsn"], lo), pc.less(tbl["lsn"], hi))
        ).sort_by("lsn")
        path = os.path.join(logdir, f"seg-{i:03d}.parquet")
        pq.write_table(seg, path)
        os.utime(path, (t + i, t + i))


def test_redelivered_segment_filtered_before_sink(spark, warehouse, tmp_path):
    tbl = generate_change_log(n_events=1200, n_convs=25, seed=19)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    # seg0: first half; seg1: FULL re-delivery of seg0 (duplicate) PLUS the
    # second half — the at-least-once overlap pattern
    _write_segments(tbl, logdir, [(0, n // 2), (0, n + 1)])

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = RecordingIngest(
        mgr, spec, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        stateful_dedup=True,
    )
    ing.run_until_caught_up()

    # batch 2 carried all n rows raw but only the new ones may reach the sink
    import pyarrow.compute as pc

    n_first = tbl.filter(pc.less(tbl["lsn"], n // 2)).num_rows
    assert len(ing.delivered) == 2, ing.delivered
    assert ing.delivered[0] == n_first
    assert ing.delivered[1] == n - n_first, (
        f"re-delivered prefix leaked through the state filter: {ing.delivered}"
    )

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)


def test_stale_events_dropped_state_unchanged(spark, warehouse, tmp_path):
    """A later micro-batch delivering only already-superseded events (incl.
    stale deletes) must change nothing."""
    tbl = generate_change_log(n_events=800, n_convs=15, seed=23)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    # seg0: everything; seg1: a stale slice from the middle (all lsn < max)
    _write_segments(tbl, logdir, [(0, n + 1), (n // 4, n // 2)])

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = RecordingIngest(
        mgr, spec, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        stateful_dedup=True,
    )
    ing.run_until_caught_up()

    assert ing.delivered == [n, 0], ing.delivered  # lsns are 1..n
    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/seg-000.parquet")
    assert_tables_equal(got, want)


def test_stateful_resume_from_checkpoint(spark, warehouse, tmp_path):
    """Kill between micro-batches and restart: state + sink manifests resume
    exactly-once, final state equals the batch oracle."""
    tbl = generate_change_log(n_events=1000, n_convs=20, seed=29)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    _write_segments(tbl, logdir, [(0, n // 3), (0, 2 * n // 3), (0, n + 1)])

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    mgr = DataLoadManager(spark, warehouse)

    ing1 = RecordingIngest(mgr, spec, ckpt, max_files_per_trigger=1,
                           stateful_dedup=True)
    q = ing1.start(available_now=True)
    deadline = time.time() + 120
    while time.time() < deadline and not ing1.delivered:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    ing2 = RecordingIngest(mgr, spec, ckpt, max_files_per_trigger=1,
                           stateful_dedup=True)
    ing2.run_until_caught_up()

    # every event reached the sink exactly once across both runs
    assert sum(ing1.delivered) + sum(ing2.delivered) <= n + n // 3  # replayed
    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/seg-002.parquet")
    assert_tables_equal(got, want)


def test_state_filter_with_renamed_pk_spec(spark, warehouse, tmp_path):
    """The filter must group by SOURCE column names — a spec that renames
    its PKs (the engine's core mapping feature) used to crash at query
    start with UNRESOLVED_COLUMN on the destination name."""
    from relational_data_loader_spark.spec import ColumnSpec, IngestSpec

    tbl = generate_change_log(n_events=400, n_convs=10, seed=41)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    _write_segments(tbl, logdir, [(0, n // 2), (0, n + 1)])

    cols = [
        ColumnSpec("conv_id", "conversation_id", "string", primary_key=True,
                   nullable=False),
        ColumnSpec("turn_idx", "turn_number", "int", primary_key=True,
                   nullable=False),
        ColumnSpec("role", "speaker", "string"),
        ColumnSpec("text", "text", "string"),
        ColumnSpec("tool", "tool", "string"),
        ColumnSpec("ts", "ts", "datetime"),
    ]
    spec = IngestSpec(name="renamed", source=f"parquet://{logdir}",
                      columns=cols, target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = RecordingIngest(mgr, spec, str(tmp_path / "ckpt"),
                          max_files_per_trigger=1, stateful_dedup=True)
    ing.run_until_caught_up()
    # re-delivered prefix filtered, and the destination table carries the
    # renamed columns
    assert len(ing.delivered) == 2 and ing.delivered[1] < n
    got = mgr.table(spec).read()
    assert {"conversation_id", "turn_number", "speaker"} <= set(got.columns)
    assert got.count() > 0


def test_ttl_eviction_admits_stale_rows_sink_guard_keeps_state_exact(
    spark, warehouse, tmp_path
):
    """With a (deliberately absurd) 0-minute TTL on a RESIDENT stream, keys
    idle for one batch are evicted; a later stale re-delivery for them
    PASSES the filter — and the version-guarded MERGE still no-ops every
    row, so the final table is byte-equal to the no-redelivery oracle.
    Pins the safety argument in monotone_lsn_filter's docstring: eviction
    trades wasted merge work, never correctness."""
    import pyarrow.compute as pc

    tbl = generate_change_log(n_events=1200, n_convs=25, seed=19)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    # seg0: everything; seg1: thin stale slice (keeps its few convs' state
    # alive, everyone else times out in seg1's batch); seg2: wide stale
    # re-delivery hitting evicted convs
    cuts = [(0, n + 1), (n // 2, n // 2 + 20), (n // 4, n // 2)]
    _write_segments(tbl, logdir, cuts)

    # deterministic expectation: exactly the seg2 rows of convs NOT kept
    # alive by seg1 pass the filter (their state was evicted)
    def _convs(lo, hi):
        seg = tbl.filter(
            pc.and_(pc.greater_equal(tbl["lsn"], lo), pc.less(tbl["lsn"], hi))
        )
        return set(seg["conv_id"].to_pylist())

    alive = _convs(*cuts[1])
    seg2 = tbl.filter(
        pc.and_(
            pc.greater_equal(tbl["lsn"], cuts[2][0]),
            pc.less(tbl["lsn"], cuts[2][1]),
        )
    )
    expected_pass = sum(c not in alive for c in seg2["conv_id"].to_pylist())
    assert 0 < expected_pass < seg2.num_rows  # fixture exercises both sides

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = RecordingIngest(
        mgr, spec, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        stateful_dedup=True, state_ttl_minutes=0,  # 1 ms: next-batch evict
    )
    q = ing.start(available_now=False)
    try:
        deadline = time.time() + 300
        while time.time() < deadline and len(ing.delivered) < 3:
            time.sleep(2)
        assert len(ing.delivered) >= 3, ing.delivered
    finally:
        q.stop()
        q.awaitTermination(60)

    data_batches = ing.delivered[:3]  # later entries are empty drain batches
    assert data_batches[0] == n
    # seg1's convs still had live state -> all 20 stale rows filtered
    assert data_batches[1] == 0, ing.delivered
    # seg2: evicted convs pass, still-armed (seg1) convs stay filtered
    assert data_batches[2] == expected_pass, ing.delivered
    assert all(d == 0 for d in ing.delivered[3:]), ing.delivered
    # ...and the sink's version guard no-ops every admitted stale row
    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/seg-000.parquet")
    assert_tables_equal(got, want)


def test_ttl_refused_on_available_now(spark, warehouse, tmp_path):
    tbl = generate_change_log(n_events=100, n_convs=5, seed=3)
    logdir = str(tmp_path / "log")
    _write_segments(tbl, logdir, [(0, tbl.num_rows + 1)])
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = StreamingIngest(
        mgr, spec, str(tmp_path / "ckpt"),
        stateful_dedup=True, state_ttl_minutes=5,
    )
    with pytest.raises(ValueError, match="resident stream"):
        ing.start(available_now=True)


def test_no_ttl_behavior_unchanged(spark, warehouse, tmp_path):
    """Default (no TTL) keeps the NoTimeout contract: the same wide stale
    re-delivery is fully filtered."""
    tbl = generate_change_log(n_events=1200, n_convs=25, seed=19)
    n = tbl.num_rows
    logdir = str(tmp_path / "log")
    _write_segments(tbl, logdir, [(0, n + 1), (n // 4, n // 2)])

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    ing = RecordingIngest(
        mgr, spec, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        stateful_dedup=True,
    )
    ing.run_until_caught_up()
    assert ing.delivered == [n, 0], ing.delivered
