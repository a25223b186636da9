"""IcebergTable exactly-once plumbing, unit-tested against a recording fake.

The sandbox has no Iceberg jars, so these tests drive the sink with a fake
SparkSession that records every ``sql()`` call and every ``conf`` mutation
and serves canned ``.snapshots`` metadata rows. They pin the round-1 bug
class shut (VERDICT item 1): the epoch/watermark stamp must ride the SAME
commit as the data (no separate ALTER TABLE), and the reader must parse the
SAME snapshot-summary key the writer stamps.
"""

import re

import pytest

from relational_data_loader_spark.sinks.iceberg import (
    IcebergTable,
    _decode_stamp,
    _encode_stamp,
)
from relational_data_loader_spark.spec import transcripts_spec


class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


class _FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _FakeConf:
    def __init__(self, log):
        self._store = {}
        self._log = log

    def set(self, k, v):
        self._store[k] = v
        self._log.append(("conf_set", k, v))

    def unset(self, k):
        self._store.pop(k, None)
        self._log.append(("conf_unset", k))

    def get(self, k, default=None):
        return self._store.get(k, default)


class _FakeDF:
    def createOrReplaceTempView(self, name):
        pass


class FakeSpark:
    """Records sql()/conf calls; serves canned .snapshots summaries."""

    def __init__(self, snapshot_stamps=()):
        self.calls = []  # interleaved ("sql", text) / ("conf_set",k,v) / ("conf_unset",k)
        self.conf = _FakeConf(self.calls)
        self.snapshot_stamps = list(snapshot_stamps)

    def sql(self, text):
        self.calls.append(("sql", " ".join(text.split())))
        if ".snapshots" in text:
            return _FakeResult([_Row(stamp=s) for s in self.snapshot_stamps])
        # a data write commits a snapshot stamped with the live wap.id
        wap = self.conf.get("spark.wap.id")
        if wap is not None and ("MERGE INTO" in text or "INSERT OVERWRITE" in text):
            self.snapshot_stamps.append(wap)
        return _FakeResult([])


def _table(stamps=()):
    spec = transcripts_spec(source="parquet:///dev/null", target_buckets=8)
    return IcebergTable(FakeSpark(stamps), "lake.db.transcripts", spec,
                        check_runtime=False)


def test_stamp_codec_round_trips():
    for key, wm in [("batch:120000", 119987), ("stream:7", -1), ("batch:-1", 0)]:
        assert _decode_stamp(_encode_stamp(key, wm)) == (key, wm)
    assert _decode_stamp(None) is None
    assert _decode_stamp("someone-elses-wap-id") is None


def test_merge_stamps_epoch_atomically_with_the_commit():
    t = _table()
    assert t.merge(_FakeDF(), epoch_id=42, watermark=41, namespace="batch") is True
    calls = t.spark.calls

    merge_idx = next(i for i, c in enumerate(calls) if c[0] == "sql" and "MERGE INTO" in c[1])
    set_idx = next(i for i, c in enumerate(calls) if c[0] == "conf_set" and c[1] == "spark.wap.id")
    unset_idx = next(i for i, c in enumerate(calls) if c[0] == "conf_unset" and c[1] == "spark.wap.id")
    # the stamp brackets the single data commit: set < MERGE < unset
    assert set_idx < merge_idx < unset_idx
    # and there is NO separate bookkeeping commit
    assert not any(c[0] == "sql" and "ALTER TABLE" in c[1] for c in calls)
    # the stamped payload is exactly what the reader parses
    payload = calls[set_idx][2]
    assert _decode_stamp(payload) == ("batch:42", 41)

    # generated MERGE: every clause sequence-guarded; deletes are SOFT
    # tombstones (out-of-order safety — stale segments can't overwrite or
    # resurrect newer state)
    sql = calls[merge_idx][1]
    assert re.search(
        r"WHEN MATCHED AND s\.lsn > t\._rdl_lsn AND s\.op = 'D' THEN UPDATE SET "
        r"t\._rdl_lsn = s\.lsn, t\._rdl_deleted = true",
        sql,
    )
    assert "WHEN MATCHED AND s.lsn > t._rdl_lsn THEN UPDATE SET" in sql
    assert "t._rdl_deleted = false" in sql
    assert "THEN DELETE" not in sql  # hard delete would break ordering safety
    # unmatched rows insert unconditionally — including D as a tombstone
    assert re.search(r"WHEN NOT MATCHED THEN INSERT \(.*_rdl_lsn, _rdl_deleted\)", sql)
    assert "s.op = 'D'" in sql.split("VALUES")[-1]
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql


def test_replayed_epoch_is_skipped_without_touching_the_table():
    t = _table(stamps=[_encode_stamp("batch:42", 41)])
    assert t.merge(_FakeDF(), epoch_id=42, watermark=41) is False
    assert not any(c[0] == "sql" and "MERGE INTO" in c[1] for c in t.spark.calls)
    # same id in the OTHER namespace is a different epoch and must apply
    assert t.merge(_FakeDF(), epoch_id=42, watermark=43, namespace="stream") is True


def test_reader_sees_what_writer_stamped():
    t = _table()
    t.merge(_FakeDF(), epoch_id=10, watermark=9)
    t.merge(_FakeDF(), epoch_id=20, watermark=19)
    assert t.applied_epochs() == {"batch:10", "batch:20"}
    assert t.watermark() == 19
    # foreign wap ids (another tool's WAP flow) are ignored, not crashed on
    t.spark.snapshot_stamps.append("audit-1234")
    assert t.applied_epochs() == {"batch:10", "batch:20"}


def test_wap_conf_unset_even_when_the_commit_throws():
    t = _table()

    class Boom(RuntimeError):
        pass

    real_sql = t.spark.sql

    def dying_sql(text):
        if "MERGE INTO" in text:
            raise Boom()
        return real_sql(text)

    t.spark.sql = dying_sql
    with pytest.raises(Boom):
        t.merge(_FakeDF(), epoch_id=5, watermark=4)
    assert t.spark.conf.get("spark.wap.id") is None, "stamp must not leak"
    # and the failed epoch is NOT recorded → retry applies it
    assert t.applied_epochs() == set()


def test_reader_view_filters_tombstones():
    t = _table()
    view = t.create_reader_view()
    sql = next(c[1] for c in t.spark.calls if "CREATE OR REPLACE VIEW" in c[1])
    assert view == "lake.db.transcripts_live"
    assert "WHERE NOT _rdl_deleted" in sql
    assert "_rdl_lsn" not in sql.split("SELECT")[1].split("FROM")[0]


def test_full_refresh_single_stamped_commit():
    t = _table()
    t.full_refresh(_FakeDF(), epoch_id=100, watermark=100)
    sqls = [c[1] for c in t.spark.calls if c[0] == "sql"]
    assert any("CREATE TABLE IF NOT EXISTS" in s for s in sqls)
    assert any("INSERT OVERWRITE" in s for s in sqls)
    assert not any("ALTER TABLE" in s for s in sqls)
    # baseline rows stamped with the covered watermark
    ins = next(s for s in sqls if "INSERT OVERWRITE" in s)
    assert "CAST(100 AS BIGINT) AS _rdl_lsn" in ins and "false AS _rdl_deleted" in ins
    # ensure_table keeps WAP publishing on (stamp rides spark.wap.id)
    ddl = next(s for s in sqls if "CREATE TABLE" in s)
    assert "'write.wap.enabled' = 'false'" in ddl
    assert t.applied_epochs() == {"batch:100"}
    assert t.watermark() == 100
