"""CSV source family — the reference's own integration tests run with a
``csv://`` source (SURVEY.md §2.1 S4, §3.3); ours ingests a CSV change log
through the identical pipeline."""

import csv
import os

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, spark_sorted_pdf


def test_csv_change_log_full_refresh(spark, warehouse, tmp_path):
    tbl = generate_change_log(n_events=800, n_convs=20, seed=13)
    csvdir = str(tmp_path / "csvlog")
    os.makedirs(csvdir)
    pdf = tbl.to_pandas()
    # drop exotic texts CSV can't round-trip byte-exactly (newlines are fine
    # quoted, but keep the fixture simple: the parquet family covers unicode)
    pdf["text"] = pdf["text"].str.replace("\n", " ", regex=False)
    # the engine's csv conventions (sources/readers.py): \N nulls, ISO-8601
    # 'T' timestamps with microseconds
    pdf.to_csv(
        os.path.join(csvdir, "log.csv"),
        index=False,
        quoting=csv.QUOTE_MINIMAL,
        na_rep="\\N",
        date_format="%Y-%m-%dT%H:%M:%S.%f",
    )

    spec = transcripts_spec(source=f"csv://{csvdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    res = mgr.run(spec)
    assert res.decision.kind == "full_refresh"

    got = spark_sorted_pdf(mgr.table(spec).read())

    import duckdb

    want = duckdb.sql(
        f"""
        WITH src AS (
          SELECT * FROM read_csv('{csvdir}/log.csv', header=true,
            nullstr='\\N',
            columns={{'lsn':'BIGINT','op':'VARCHAR','conv_id':'VARCHAR',
                      'turn_idx':'INT','role':'VARCHAR','text':'VARCHAR',
                      'tool':'VARCHAR','ts':'TIMESTAMP'}})),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM src)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()
    # CSV cannot distinguish empty string from NULL; normalize both sides
    for c in ("role", "text", "tool"):
        got[c] = got[c].fillna("")
        want[c] = want[c].fillna("")
    assert_tables_equal(got, want)


def test_csv_second_precision_timestamps_parse(spark, tmp_path):
    """The convention's fractional seconds are OPTIONAL ([.SSSSSS]): a
    second-precision producer must parse, not silently NULL the column."""
    import pandas as pd

    from relational_data_loader_spark.sources.readers import read_source
    from relational_data_loader_spark.spec import transcripts_spec

    csvdir = tmp_path / "sec"
    csvdir.mkdir()
    (csvdir / "log.csv").write_text(
        "lsn,op,conv_id,turn_idx,role,text,tool,ts\n"
        "1,I,c0,0,user,hello,\\N,2024-01-01T00:00:00\n"
        "2,I,c0,1,user,world,\\N,2024-01-01T00:00:01.500000\n"
    )
    spec = transcripts_spec(source="x://")
    df = read_source(spark, f"csv://{csvdir}", spec.change_schema()).toPandas()
    assert df["ts"].notna().all()
    assert pd.Timestamp(df["ts"].iloc[1]).microsecond == 500000


def test_csv_convention_violation_fails_loudly(spark, tmp_path):
    """A producer writing space-separated timestamps violates the documented
    convention: FAILFAST must raise, never silently load NULL payloads into
    LWW state (the permissive default was measured to do exactly that)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from relational_data_loader_spark.sources.readers import read_source
    from relational_data_loader_spark.spec import transcripts_spec

    csvdir = tmp_path / "bad"
    csvdir.mkdir()
    (csvdir / "log.csv").write_text(
        "lsn,op,conv_id,turn_idx,role,text,tool,ts\n"
        "1,I,c0,0,user,hello,\\N,2024-01-01 00:00:00\n"
    )
    spec = transcripts_spec(source="x://")
    with pytest.raises(Exception) as ei:
        read_source(spark, f"csv://{csvdir}", spec.change_schema()).collect()
    assert "FAILFAST" in str(ei.value) or "Malformed" in str(ei.value)
