"""Vectorized text normalization inside ingest (north_star: per-event
normalization via Arrow pandas UDFs, no per-row Python) — parity against
DuckDB's native nfc_normalize."""

import duckdb

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, spark_sorted_pdf, write_log


def test_ingest_with_nfc_normalization_matches_duckdb(spark, warehouse, tmp_path):
    # fixture injects NFC/NFD pairs of 'café schön naïve' (fixtures._EDGE_TEXTS)
    tbl = generate_change_log(n_events=1500, n_convs=30, seed=21)
    logdir = str(tmp_path / "log")
    write_log(tbl, logdir)

    spec = transcripts_spec(
        source=f"parquet://{logdir}",
        target_buckets=4,
        transforms={"text": "normalize_text"},
    )
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)
    got = spark_sorted_pdf(mgr.table(spec).read())

    want = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM read_parquet('{logdir}/*.parquet'))
        SELECT conv_id, turn_idx, role,
               trim(regexp_replace(nfc_normalize(text), '\\s+', ' ', 'g')) AS text,
               tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()
    assert_tables_equal(got, want)

    # every surviving destination text is in NFC form (the fixture injects
    # NFD variants; whether a given edge row survives LWW is data-dependent)
    import unicodedata

    assert all(
        unicodedata.is_normalized("NFC", t) for t in got["text"].dropna() if t
    ), "all destination texts must be NFC"


def test_rdl_state_per_partition_watermarks_consistent(spark, warehouse, tmp_path):
    """F4 contract: per-bucket max_applied_lsn rows match the data applied."""
    import pyarrow.compute as pc

    tbl = generate_change_log(n_events=2000, n_convs=40, seed=4)
    logdir = str(tmp_path / "log")
    cut = pc.max(tbl["lsn"]).as_py() // 2
    write_log(tbl, logdir, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)
    write_log(tbl, logdir, lsn_from=cut)
    mgr.run(spec)

    st = mgr.state.read().to_pandas()
    merges = st[st["kind"] == "merge"]
    assert len(merges) > 0
    assert merges["partition_id"].nunique() > 1, "per-partition rows expected"
    assert merges["max_applied_lsn"].max() == pc.max(tbl["lsn"]).as_py()
    # upserted+deleted counters equal the EVENTS applied (the reference's
    # tracker counted rows transferred per batch; since the netting was
    # fused into the merge window, lineage counts raw envelopes, split by op)
    import duckdb

    tail_events = duckdb.sql(
        f"""
        SELECT count(*) FILTER (WHERE op <> 'D') ups,
               count(*) FILTER (WHERE op = 'D') dels
        FROM read_parquet('{logdir}/*.parquet') WHERE lsn > {cut}
        """
    ).df()
    assert merges["rows_upserted"].sum() == tail_events["ups"][0]
    assert merges["rows_deleted"].sum() == tail_events["dels"][0]
    # reference-tracker C3 parity (VERDICT r3 task #7): rows/sec recorded per
    # row, derived from the epoch wall — exact recomputation, never negative
    expect = (
        (merges["rows_upserted"] + merges["rows_deleted"])
        / (merges["wall_ms"].clip(lower=1) / 1000.0)
    ).round(2)
    assert (merges["rows_per_sec"] == expect).all()
    assert (st["rows_per_sec"] >= 0).all()
