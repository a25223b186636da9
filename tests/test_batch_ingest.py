"""Port of the reference's four pytest families (SURVEY.md §5) — batch mode.

full-refresh / incremental / delete-propagation run the whole engine
(DataLoadManager) over a seeded change log and compare the committed
destination state against an independent DuckDB replay oracle.
"""

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log

N_EVENTS = 4000
N_CONVS = 80


@pytest.fixture(scope="module")
def log_tbl():
    return generate_change_log(n_events=N_EVENTS, n_convs=N_CONVS, seed=42)


def test_full_refresh_matches_oracle(spark, warehouse, tmp_path, log_tbl):
    logdir = str(tmp_path / "log")
    write_log(log_tbl, logdir)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)

    res = mgr.run(spec)
    assert res.decision.kind == "full_refresh"
    assert "destination table missing" in " ".join(res.decision.reasons)

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)
    assert res.watermark == pc.max(log_tbl["lsn"]).as_py()


def test_incremental_upsert_and_delete_propagation(spark, warehouse, tmp_path, log_tbl):
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    cut = max_lsn // 2

    # phase 1: half the log → initial full load
    write_log(log_tbl, logdir, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    res1 = mgr.run(spec)
    assert res1.decision.kind == "full_refresh"
    assert res1.watermark == cut

    # phase 2: the tail arrives → incremental merge (upserts + deletes)
    write_log(log_tbl, logdir, lsn_from=cut)
    res2 = mgr.run(spec)
    assert res2.decision.kind == "incremental"
    assert not res2.skipped
    assert res2.rows_deleted > 0, "fixture must exercise delete propagation"
    assert res2.watermark == max_lsn

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)

    # deleted PKs really gone: a PK whose final op is D is absent
    import duckdb

    gone = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM read_parquet('{logdir}/*.parquet'))
        SELECT conv_id, turn_idx FROM ranked WHERE rn = 1 AND op = 'D'
        """
    ).df()
    assert len(gone) > 0
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert all((c, t) not in keys for c, t in zip(gone["conv_id"], gone["turn_idx"]))


def test_incremental_rerun_is_idempotent_noop(spark, warehouse, tmp_path, log_tbl):
    logdir = str(tmp_path / "log")
    write_log(log_tbl, logdir)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)

    before = mgr.table(spec).current_manifest()
    res = mgr.run(spec)  # unchanged log → epoch already applied
    assert res.decision.kind == "incremental"
    assert res.skipped
    after = mgr.table(spec).current_manifest()
    assert before["version"] == after["version"], "no new snapshot on a no-op"
    assert before["buckets"] == after["buckets"]


def test_ct_invalid_forces_full_refresh(spark, warehouse, tmp_path, log_tbl):
    """SURVEY.md §1.3 invariant 6: log truncated past watermark ⇒ full reload."""
    import shutil

    logdir = str(tmp_path / "log")
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    cut = max_lsn // 3

    write_log(log_tbl, logdir, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)

    # the log is truncated: head (≤ cut+gap) evicted, tail present, with a
    # gap after our watermark ⇒ incremental would lose events
    shutil.rmtree(logdir)
    write_log(log_tbl, logdir, lsn_from=cut + 50)
    res = mgr.run(spec)
    assert res.decision.kind == "full_refresh"
    assert any("change tracking invalid" in r for r in res.decision.reasons)

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)
