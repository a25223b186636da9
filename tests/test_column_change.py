"""Column-change family (reference model-JSON schema-change tests →
FIXTURES.md F3): additive column, rename, breaking retype."""

import duckdb
import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import ColumnSpec, IngestSpec, transcripts_spec
from tests.util import assert_tables_equal, spark_sorted_pdf, write_log


@pytest.fixture(scope="module")
def logs():
    v1 = generate_change_log(n_events=2000, n_convs=50, seed=5)
    v2 = generate_change_log(n_events=3000, n_convs=50, seed=5, schema_v2=True)
    # v2 shares the v1 prefix semantics: same seed ⇒ same events, plus model col
    return v1, v2


def _v2_spec(source):
    base = transcripts_spec(source=source, target_buckets=8)
    cols = list(base.columns) + [ColumnSpec("model", "model", "string")]
    return IngestSpec(name="transcripts", source=source, columns=cols, target_buckets=8)


def test_additive_column_evolves_in_place(spark, warehouse, tmp_path, logs):
    v1, v2 = logs
    logdir = str(tmp_path / "log")
    cut = pc.max(v1["lsn"]).as_py() // 2
    write_log(v1, logdir, lsn_upto=cut)

    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    r1 = mgr.run(spec1)
    assert r1.decision.kind == "full_refresh"
    v_before = mgr.table(spec1).current_manifest()["version"]

    # the tail arrives with the NEW column; spec gains the additive mapping
    write_log(v2, logdir, lsn_from=cut)
    spec2 = _v2_spec(f"parquet://{logdir}")
    r2 = mgr.run(spec2)
    assert r2.decision.kind == "incremental", r2.decision.reasons
    assert r2.decision.evolve_added

    t = mgr.table(spec2)
    got = spark_sorted_pdf(t.read())
    assert "model" in got.columns

    want = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM read_parquet('{logdir}/*.parquet', union_by_name=true))
        SELECT conv_id, turn_idx, role, text, tool, ts, model
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()
    assert_tables_equal(got, want)
    # rows applied before the evolution read back as NULL model
    assert got["model"].isna().any()
    assert got["model"].notna().any()
    assert mgr.table(spec2).current_manifest()["version"] > v_before


def test_rename_column_preserves_data(spark, warehouse, tmp_path, logs):
    v1, _ = logs
    logdir = str(tmp_path / "log")
    write_log(v1, logdir)

    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr.run(spec1)
    before = spark_sorted_pdf(mgr.table(spec1).read())

    cols = [
        c if c.source != "tool" else ColumnSpec("tool", "tool_name", "string")
        for c in spec1.columns
    ]
    spec2 = IngestSpec(
        name="transcripts", source=f"parquet://{logdir}", columns=cols, target_buckets=8
    )
    r = mgr.run(spec2)
    assert r.decision.kind == "incremental", r.decision.reasons
    assert ("tool", "tool_name") in r.decision.evolve_renames

    after = spark_sorted_pdf(mgr.table(spec2).read())
    assert "tool_name" in after.columns and "tool" not in after.columns
    assert list(after["tool_name"]) == list(before["tool"])


def test_breaking_retype_forces_full_refresh(spark, warehouse, tmp_path, logs):
    v1, _ = logs
    logdir = str(tmp_path / "log")
    write_log(v1, logdir)

    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr.run(spec1)

    cols = [
        c if c.source != "turn_idx"
        else ColumnSpec("turn_idx", "turn_idx", "bigint", primary_key=True, nullable=False)
        for c in spec1.columns
    ]
    spec2 = IngestSpec(
        name="transcripts", source=f"parquet://{logdir}", columns=cols, target_buckets=8
    )
    r = mgr.run(spec2)
    assert r.decision.kind == "full_refresh"
    assert any("breaking" in x for x in r.decision.reasons)
    # destination type actually changed
    t = mgr.table(spec2)
    assert dict(t.read().dtypes)["turn_idx"] == "bigint"
