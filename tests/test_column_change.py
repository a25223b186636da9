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

    # a DROPPED column is the breaking class that still reads the same log
    # (non-widening retypes also break, but change the change-log read
    # schema too — is_type_widening unit-covers that classification;
    # int→bigint moved to in-place evolution, test_widen_* below)
    cols = [c for c in spec1.columns if c.source != "tool"]
    spec2 = IngestSpec(
        name="transcripts", source=f"parquet://{logdir}", columns=cols, target_buckets=8
    )
    r = mgr.run(spec2)
    assert r.decision.kind == "full_refresh"
    assert any("breaking" in x for x in r.decision.reasons)
    # destination schema actually changed
    t = mgr.table(spec2)
    assert "tool" not in dict(t.read().dtypes)


def _widened_spec(source, first_pk="conv_id"):
    """transcripts spec with turn_idx widened int→bigint; first_pk picks the
    column order (and therefore the bucket key)."""
    base = transcripts_spec(source=source, target_buckets=8)
    cols = [
        c if c.destination != "turn_idx"
        else ColumnSpec("turn_idx", "turn_idx", "bigint", primary_key=True,
                        nullable=False)
        for c in base.columns
    ]
    if first_pk == "turn_idx":
        cols = sorted(cols, key=lambda c: c.destination != "turn_idx")
    return IngestSpec(
        name="transcripts", source=source, columns=cols, target_buckets=8
    )


def test_widen_classification():
    from relational_data_loader_spark.spec import is_type_widening

    assert is_type_widening("int", "bigint")
    assert is_type_widening("float", "double")
    assert is_type_widening("decimal(10,2)", "decimal(14,2)")
    assert not is_type_widening("bigint", "int")          # narrowing
    assert not is_type_widening("decimal(10,2)", "decimal(14,4)")  # scale change
    assert not is_type_widening("int", "double")          # not in Iceberg's set

    old = transcripts_spec(source="x://")
    new = _widened_spec("x://")
    d = new.diff(old)
    assert d.widened == [("turn_idx", "bigint")]
    assert not d.is_breaking and not d.renamed and not d.added


def test_widen_column_evolves_in_place(spark, warehouse, tmp_path, logs):
    """turn_idx int→bigint (a PK, but not the bucket key): metadata-only
    evolve, old int32 files read back under the widened schema, incremental
    apply continues against the same table."""
    v1, _ = logs
    logdir = str(tmp_path / "log")
    cut = pc.max(v1["lsn"]).as_py() // 2
    write_log(v1, logdir, lsn_upto=cut)

    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    r1 = mgr.run(spec1)
    assert r1.decision.kind == "full_refresh"
    m1 = mgr.table(spec1).current_manifest()
    files_before = {p for fs in m1["buckets"].values() for p in fs}
    v_before = m1["version"]

    write_log(v1, logdir, lsn_from=cut)
    spec2 = _widened_spec(f"parquet://{logdir}")
    r2 = mgr.run(spec2)
    assert r2.decision.kind == "incremental", r2.decision.reasons
    assert r2.decision.evolve_widened == [("turn_idx", "bigint")]

    t = mgr.table(spec2)
    got = spark_sorted_pdf(t.read())
    assert str(t.read().schema["turn_idx"].dataType) == "LongType()"
    want = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM read_parquet('{logdir}/*.parquet'))
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()
    assert_tables_equal(got, want)
    # the EVOLVE commit itself (manifest v_before+1, before the incremental
    # merge's own commit) must keep the original int32 files byte-for-byte —
    # read-time promotion does the work, no rewrite
    import json as _json
    import os as _os

    evolve_manifest = _json.load(
        open(_os.path.join(t.path, "_manifests", f"v{v_before + 1:08d}.json"))
    )
    assert evolve_manifest["kind"] == "evolve_add"
    files_evolve = {
        p for fs in evolve_manifest["buckets"].values() for p in fs
    }
    assert files_evolve == files_before, "widen rewrote data files"
    assert '"bigint"' in evolve_manifest["spec_json"] or "bigint" in evolve_manifest["spec_json"]


def test_widen_bucket_key_forces_rebucket(spark, warehouse, tmp_path, logs):
    """Widening the bucket key (primary_keys[0]) must NOT evolve in place:
    xxhash64 is width-sensitive, so the decision layer re-buckets."""
    v1, _ = logs
    logdir = str(tmp_path / "log")
    write_log(v1, logdir)

    # table keyed with turn_idx as the FIRST pk → turn_idx is the bucket key
    base = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    cols = sorted(base.columns, key=lambda c: c.destination != "turn_idx")
    spec1 = IngestSpec(name="transcripts", source=base.source, columns=cols,
                       target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec1)

    spec2 = _widened_spec(f"parquet://{logdir}", first_pk="turn_idx")
    r = mgr.run(spec2)
    assert r.decision.kind == "full_refresh"
    assert any("bucket key" in x and "widened" in x for x in r.decision.reasons)
