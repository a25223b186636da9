"""JDBC option assembly (reference S1/S2's MsSqlDataSource contract) —
unit-tested without a driver jar: everything up to .load() is pure."""

import pytest

from relational_data_loader_spark.sources.readers import (
    build_jdbc_options,
    jdbc_bounds_query,
    jdbc_probe_options,
)
from relational_data_loader_spark.spec import transcripts_spec

URI = "jdbc://jdbc:sqlserver://db1:1433;databaseName=src?dbtable=dbo.transcripts_ct"


def test_full_option_map_from_uri():
    opts = build_jdbc_options(URI, spec=transcripts_spec())
    assert opts["url"] == "jdbc:sqlserver://db1:1433;databaseName=src"
    assert opts["dbtable"] == "dbo.transcripts_ct"
    assert opts["fetchsize"] == "10000"
    # spec-driven parallel read on the change-version column
    assert opts["partitionColumn"] == "lsn"
    assert opts["numPartitions"] == "32"


def test_uri_overrides_beat_defaults_and_pass_through():
    uri = (
        "jdbc://jdbc:postgresql://h/db?dbtable=public.t&user=u&password=p"
        "&fetchsize=500&partitionColumn=id&lowerBound=0&upperBound=99"
        "&numPartitions=4&ssl=true"
    )
    opts = build_jdbc_options(uri, spec=transcripts_spec())
    assert opts["user"] == "u" and opts["password"] == "p"
    assert opts["fetchsize"] == "500"
    assert (opts["partitionColumn"], opts["lowerBound"], opts["upperBound"]) == (
        "id", "0", "99",
    )
    assert opts["numPartitions"] == "4"
    assert opts["ssl"] == "true"  # unknown keys forwarded as connection props


def test_credentials_fall_back_to_env(monkeypatch):
    monkeypatch.setenv("RDL_SPARK_JDBC_USER", "svc")
    monkeypatch.setenv("RDL_SPARK_JDBC_PASSWORD", "s3cret")
    opts = build_jdbc_options(URI)
    assert opts["user"] == "svc" and opts["password"] == "s3cret"


def test_query_source_and_validation():
    opts = build_jdbc_options(
        "jdbc://jdbc:postgresql://h/db?query=SELECT *%20FROM t WHERE lsn > 5"
    )
    assert "query" in opts and "dbtable" not in opts

    with pytest.raises(ValueError, match="dbtable= or query="):
        build_jdbc_options("jdbc://jdbc:postgresql://h/db")
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_jdbc_options("jdbc://jdbc:postgresql://h/db?dbtable=a&query=b")
    with pytest.raises(ValueError, match="real JDBC url"):
        build_jdbc_options("jdbc://not-a-jdbc-url?dbtable=t")


def test_probe_drops_the_whole_partition_option_group():
    """ADVICE r2: a URI pinning exactly ONE bound must not leak it into the
    probe read — Spark all-or-none-checks the partition options."""
    uri = (
        "jdbc://jdbc:postgresql://h/db?dbtable=public.t"
        "&partitionColumn=id&lowerBound=7"  # upperBound deliberately absent
    )
    opts = build_jdbc_options(uri, spec=transcripts_spec())
    probe = jdbc_probe_options(opts)
    for k in ("partitionColumn", "numPartitions", "lowerBound", "upperBound",
              "query"):
        assert k not in probe
    assert probe["dbtable"] == "(SELECT min(id) AS lo, max(id) AS hi FROM public.t) bounds"
    assert probe["url"] == opts["url"]


def test_bounds_probe_sql():
    opts = build_jdbc_options(URI, spec=transcripts_spec())
    assert jdbc_bounds_query(opts) == (
        "(SELECT min(lsn) AS lo, max(lsn) AS hi FROM dbo.transcripts_ct) bounds"
    )
    qopts = build_jdbc_options(
        "jdbc://jdbc:postgresql://h/db?query=SELECT 1 AS lsn&partitionColumn=lsn"
    )
    assert jdbc_bounds_query(qopts) == (
        "(SELECT min(lsn) AS lo, max(lsn) AS hi FROM (SELECT 1 AS lsn) q) bounds"
    )
