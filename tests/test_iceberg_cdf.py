"""Iceberg change-data-feed twin (sinks/iceberg.py, round 4).

The CALL glue is jar-gated (no Iceberg runtime here), so the feed is
tested at its two seams:

- ``changelog_view_sql``: the exact CALL statement, pure string;
- ``classify_changelog``: the physical→logical lift, on hand-built
  changelog DataFrames with a real session. The fixtures cover every
  visibility transition the soft-tombstone convention can produce,
  including the two traps the docstring names: insert-then-delete inside
  the window must net to NOTHING (not D), and a tombstone's lsn bump must
  stay invisible.
"""

import pytest
from pyspark.sql import types as T

from relational_data_loader_spark.sinks.iceberg import (
    changelog_view_sql,
    classify_changelog,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.LongType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("_rdl_lsn", T.LongType()),
        T.StructField("_rdl_deleted", T.BooleanType()),
        T.StructField("_change_type", T.StringType()),
        T.StructField("_change_ordinal", T.IntegerType()),
    ]
)


def _classify(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = classify_changelog(df, ["conv_id", "turn_idx"], ["text"])
    return {(r["conv_id"], r["turn_idx"]): (r["op"], r["text"], r["lsn"]) for r in out.collect()}


def test_changelog_view_sql_statement():
    sql = changelog_view_sql("lake.db.transcripts", 111, 222, "_rdl_cdf_x")
    assert sql.startswith("CALL lake.system.create_changelog_view(")
    assert "table => 'db.transcripts'" in sql
    assert "'start-snapshot-id', '111'" in sql
    assert "'end-snapshot-id', '222'" in sql
    assert "changelog_view => '_rdl_cdf_x'" in sql
    # net_changes deliberately absent: classify_changelog nets itself
    assert "net_changes" not in sql


def test_classify_all_visibility_transitions(spark):
    rows = [
        # fresh insert -> I
        (1, 0, "a", 10, False, "INSERT", 0),
        # live update (UB/UA pair) -> U with new payload + lsn
        (2, 0, "old", 5, False, "UPDATE_BEFORE", 0),
        (2, 0, "new", 11, False, "UPDATE_AFTER", 0),
        # live -> tombstone = logical delete: D, NULL payload, delete's lsn
        (3, 0, "gone", 6, False, "UPDATE_BEFORE", 1),
        (3, 0, "gone", 12, True, "UPDATE_AFTER", 1),
        # tombstone -> live = logical (re)insert
        (4, 0, "dead", 7, True, "UPDATE_BEFORE", 0),
        (4, 0, "back", 13, False, "UPDATE_AFTER", 0),
        # insert then soft-delete inside the window -> nets to nothing
        (5, 0, "blip", 8, False, "INSERT", 0),
        (5, 0, "blip", 8, False, "UPDATE_BEFORE", 1),
        (5, 0, "blip", 14, True, "UPDATE_AFTER", 1),
        # tombstone lsn bump (stale replayed delete) -> invisible both sides
        (6, 0, "x", 9, True, "UPDATE_BEFORE", 0),
        (6, 0, "x", 15, True, "UPDATE_AFTER", 0),
        # trailing physical DELETE (post-expire window) -> D, before's lsn
        (7, 0, "hard", 4, False, "DELETE", 0),
    ]
    got = _classify(spark, rows)
    assert got == {
        (1, 0): ("I", "a", 10),
        (2, 0): ("U", "new", 11),
        (3, 0): ("D", None, 12),
        (4, 0): ("I", "back", 13),
        (7, 0): ("D", None, 4),
    }


def test_classify_mor_delete_insert_shape_is_update(spark):
    # merge-on-read updates surface as DELETE(old)+INSERT(new) at ONE
    # ordinal when compute_updates isn't requested — must classify U
    rows = [
        (8, 0, "v1", 3, False, "DELETE", 0),
        (8, 0, "v2", 16, False, "INSERT", 0),
    ]
    assert _classify(spark, rows) == {(8, 0): ("U", "v2", 16)}


def test_classify_multi_commit_nets_to_boundary_images(spark):
    # two updates across two commits: one U row, final payload/lsn only
    rows = [
        (9, 0, "v1", 2, False, "UPDATE_BEFORE", 0),
        (9, 0, "v2", 17, False, "UPDATE_AFTER", 0),
        (9, 0, "v2", 17, False, "UPDATE_BEFORE", 1),
        (9, 0, "v3", 18, False, "UPDATE_AFTER", 1),
    ]
    assert _classify(spark, rows) == {(9, 0): ("U", "v3", 18)}


def test_classify_schema_matches_snapshot_twin(spark):
    out = classify_changelog(
        spark.createDataFrame([(1, 0, "a", 10, False, "INSERT", 0)], SCHEMA),
        ["conv_id", "turn_idx"],
        ["text"],
    )
    assert [f.name for f in out.schema.fields] == ["op", "conv_id", "turn_idx", "text", "lsn"]


def test_iceberg_changes_between_issues_call_and_classifies():
    # glue: the CALL text reaches spark.sql and the classifier reads the view
    from relational_data_loader_spark.sinks.iceberg import IcebergTable
    from relational_data_loader_spark.spec import transcripts_spec

    recorded = []

    class _Glue(IcebergTable):
        def __init__(self):  # bypass runtime gate; only what the method touches
            self.identifier = "lake.db.transcripts"
            self.spec = transcripts_spec(source="parquet:///dev/null")

            class _S:
                def sql(self_inner, text):
                    recorded.append(text)

                def table(self_inner, name):
                    recorded.append(("table", name))
                    raise _Stop()

            self.spark = _S()

    class _Stop(Exception):
        pass

    with pytest.raises(_Stop):
        _Glue().changes_between(100, 200)
    assert recorded[0] == changelog_view_sql(
        "lake.db.transcripts", 100, 200, "_rdl_cdf_db_transcripts"
    )
    assert recorded[1] == ("table", "_rdl_cdf_db_transcripts")
