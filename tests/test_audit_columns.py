"""Per-row audit/lineage columns (reference P3 — modules/BatchDataLoader.py
appends load metadata to every destination row), behind spec.audit_columns."""

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import (
    AUDIT_EXEC_ID,
    AUDIT_LOADED_AT,
    transcripts_spec,
)
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


@pytest.fixture(scope="module")
def log_tbl():
    return generate_change_log(n_events=3000, n_convs=60, seed=23)


def test_audit_stamps_full_refresh_and_merge(spark, warehouse, tmp_path, log_tbl):
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(log_tbl["lsn"]).as_py()
    cut = max_lsn // 2
    write_log(log_tbl, logdir, lsn_upto=cut)

    spec = transcripts_spec(
        source=f"parquet://{logdir}", target_buckets=8, audit_columns=True
    )
    mgr = DataLoadManager(spark, warehouse)
    res1 = mgr.run(spec)

    df = mgr.table(spec).read()
    assert {AUDIT_EXEC_ID, AUDIT_LOADED_AT} <= set(df.columns)
    stamps = {r[0] for r in df.select(AUDIT_EXEC_ID).distinct().collect()}
    assert stamps == {res1.epoch_id}, "full refresh stamps every row"

    # loaded_at is epoch-DERIVED (deterministic), not wall-clock
    row = df.select(AUDIT_LOADED_AT).first()
    import datetime as dt

    assert row[0] == dt.datetime.fromtimestamp(res1.epoch_id, dt.timezone.utc).replace(
        tzinfo=None
    )

    # incremental: rewritten rows get the merge epoch, survivors keep theirs
    write_log(log_tbl, logdir, lsn_from=cut)
    res2 = mgr.run(spec)
    df2 = mgr.table(spec).read()
    stamps2 = {r[0] for r in df2.select(AUDIT_EXEC_ID).distinct().collect()}
    assert res2.epoch_id in stamps2, "merge-written rows carry the new epoch"
    assert res1.epoch_id in stamps2, "untouched rows keep the old stamp"

    # payload still equals the oracle (audit cols are additive metadata)
    got = spark_sorted_pdf(df2.drop(AUDIT_EXEC_ID, AUDIT_LOADED_AT))
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)

    # rows actually updated by phase 2 carry a phase-2 chunk epoch
    updated = df2.filter(f"{AUDIT_EXEC_ID} > {cut}").count()
    assert updated > 0


def test_toggling_audit_flag_is_breaking(spark, warehouse, tmp_path, log_tbl):
    logdir = str(tmp_path / "log")
    write_log(log_tbl, logdir)
    mgr = DataLoadManager(spark, warehouse)
    plain = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr.run(plain)

    audited = transcripts_spec(
        source=f"parquet://{logdir}", target_buckets=8, audit_columns=True
    )
    res = mgr.run(audited)
    assert res.decision.kind == "full_refresh"
    assert any("breaking" in r for r in res.decision.reasons)
    assert AUDIT_EXEC_ID in mgr.table(audited).read().columns


def test_iceberg_merge_sql_stamps_audit_literals(spark):
    from tests.test_iceberg_sink import FakeSpark, _FakeDF
    from relational_data_loader_spark.sinks.iceberg import IcebergTable

    spec = transcripts_spec(source="parquet:///dev/null", audit_columns=True)
    t = IcebergTable(FakeSpark(), "lake.db.t", spec, check_runtime=False)
    t.merge(_FakeDF(mx=76), epoch_id=77, netted=True)
    sql = next(c[1] for c in t.spark.calls if c[0] == "sql" and "MERGE INTO" in c[1])
    assert f"t.{AUDIT_EXEC_ID} = 77L" in sql
    assert f"t.{AUDIT_LOADED_AT} = timestamp_seconds(77)" in sql
    # delete-tombstone SET + update SET + INSERT VALUES
    assert sql.count("timestamp_seconds(77)") == 3

    ddl_t = IcebergTable(FakeSpark(), "lake.db.t", spec, check_runtime=False)
    ddl_t.ensure_table()
    ddl = next(c[1] for c in ddl_t.spark.calls if "CREATE TABLE" in c[1])
    assert f"{AUDIT_EXEC_ID} bigint" in ddl and f"{AUDIT_LOADED_AT} timestamp" in ddl
