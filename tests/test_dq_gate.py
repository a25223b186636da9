"""Admission gate on the load path (spec.expectations): enforce-mode
rejection commits nothing, audit mode reports counts, deletes are exempt,
and the gate never perturbs the schema-change machinery."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from relational_data_loader_spark.operators.quality import ExpectationFailedError
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import IngestSpec, transcripts_spec

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _log(rows):
    """rows: (lsn, op, conv, turn, role, text)."""
    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "conv_id": pa.array([r[2] for r in rows]),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array([r[4] for r in rows]),
            "text": pa.array([r[5] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([T0] * len(rows), pa.timestamp("us")),
        }
    )


def _write(logdir, table):
    os.makedirs(logdir, exist_ok=True)
    pq.write_table(table, os.path.join(logdir, "seg-000.parquet"))


EXPECT = {"text_not_null": "text IS NULL", "role_known": "role NOT IN ('user','assistant')"}


def _spec(logdir, mode="enforce"):
    s = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    s.expectations = dict(EXPECT)
    s.expectations_mode = mode
    return s


def test_enforce_rejects_and_commits_nothing(spark, warehouse, tmp_path):
    logdir = str(tmp_path / "log")
    _write(logdir, _log([
        (1, "I", "c1", 0, "user", "hi"),
        (2, "I", "c1", 1, "assistant", None),  # poison: NULL text on upsert
    ]))
    mgr = DataLoadManager(spark, warehouse)
    spec = _spec(logdir)
    with pytest.raises(ExpectationFailedError) as ei:
        mgr.run(spec)
    assert ei.value.violations == {"text_not_null": 1}
    # nothing committed: the table does not exist yet
    assert not mgr.table(spec).exists()


def test_enforce_incremental_leaves_watermark(spark, warehouse, tmp_path):
    logdir = str(tmp_path / "log")
    _write(logdir, _log([(1, "I", "c1", 0, "user", "hi")]))
    mgr = DataLoadManager(spark, warehouse)
    spec = _spec(logdir)
    r1 = mgr.run(spec)
    assert r1.decision.kind == "full_refresh" and r1.rows_upserted == 1
    wm = mgr.table(spec).watermark()
    # tail chunk carries a bad role
    _write(logdir, _log([
        (1, "I", "c1", 0, "user", "hi"),
        (2, "I", "c1", 1, "robot", "x"),   # poison: unknown role
    ]))
    with pytest.raises(ExpectationFailedError) as ei:
        mgr.run(spec)
    assert ei.value.violations == {"role_known": 1}
    assert mgr.table(spec).watermark() == wm  # epoch not committed
    # source fixed -> the SAME epoch replays cleanly
    _write(logdir, _log([
        (1, "I", "c1", 0, "user", "hi"),
        (2, "I", "c1", 1, "assistant", "x"),
    ]))
    r3 = mgr.run(spec)
    assert r3.rows_upserted == 1 and not r3.skipped
    assert mgr.table(spec).watermark() == 2


def test_audit_mode_commits_and_reports(spark, warehouse, tmp_path):
    logdir = str(tmp_path / "log")
    _write(logdir, _log([
        (1, "I", "c1", 0, "user", "hi"),
        (2, "I", "c1", 1, "assistant", None),
    ]))
    mgr = DataLoadManager(spark, warehouse)
    spec = _spec(logdir, mode="audit")
    r = mgr.run(spec)
    assert r.dq_violations == {"text_not_null": 1, "role_known": 0}
    assert mgr.table(spec).read().count() == 2  # committed anyway


def test_deletes_exempt_from_expectations(spark, warehouse, tmp_path):
    logdir = str(tmp_path / "log")
    # a delete envelope's payload is NULL by contract; must NOT trip the gate
    _write(logdir, _log([
        (1, "I", "c1", 0, "user", "hi"),
        (2, "D", "c1", 0, None, None),
    ]))
    mgr = DataLoadManager(spark, warehouse)
    r = mgr.run(_spec(logdir))
    assert r.rows_upserted == 0 or r.rows_upserted == 1  # net state: deleted
    assert mgr.table(_spec(logdir)).read().count() == 0


def test_expectations_not_in_checksum_and_roundtrip(tmp_path):
    a = _spec(str(tmp_path), mode="audit")
    b = transcripts_spec(source=a.source, target_buckets=4)
    assert a.checksum() == b.checksum()  # gate changes never force reloads
    rt = IngestSpec.from_json(a.to_json())
    assert rt.expectations == EXPECT and rt.expectations_mode == "audit"


def test_gate_mid_backlog_commits_earlier_chunks(spark, warehouse, tmp_path):
    """A rejection in chunk 2 of a chunked backlog must leave chunk 1
    COMMITTED (its manifest landed before the gate saw chunk 2) and the
    watermark at chunk 1's upper bound — the resume point after the fix."""
    logdir = str(tmp_path / "log")
    # bootstrap an (empty-ish) table so the next run is incremental
    _write(logdir, _log([(1, "I", "c0", 0, "user", "seed")]))
    mgr = DataLoadManager(spark, warehouse)
    spec = _spec(logdir)
    spec.batch_size = 5  # force chunking of the 10-lsn backlog below
    mgr.run(spec)
    # backlog lsns 2..11: poison sits in the SECOND chunk (lsn >= 7)
    rows = [(i, "I", f"c{i}", 0, "user", f"t{i}") for i in range(2, 10)]
    rows.append((10, "I", "cx", 1, "robot", "bad-role"))  # violates role_known
    rows.append((11, "I", "cy", 0, "user", "ok"))
    _write(logdir, _log([(1, "I", "c0", 0, "user", "seed")] + rows))
    with pytest.raises(ExpectationFailedError):
        mgr.run(spec)
    wm = mgr.table(spec).watermark()
    assert 1 < wm < 10  # chunk 1 committed, poisoned chunk did not
    # fix the poison row -> rerun applies ONLY the remaining chunks
    fixed = [r for r in rows if r[0] != 10] + [(10, "I", "cx", 1, "user", "ok")]
    _write(logdir, _log([(1, "I", "c0", 0, "user", "seed")] + fixed))
    r = mgr.run(spec)
    assert mgr.table(spec).watermark() == 11 and not r.skipped
    assert mgr.table(spec).read().count() == 11  # all 11 live rows landed


def test_cli_reports_rejection_and_exits_nonzero(spark, tmp_path, capsys):
    import json as _json

    from relational_data_loader_spark import cli

    logdir = str(tmp_path / "log")
    _write(logdir, _log([(1, "I", "c1", 0, "user", None)]))  # poison
    specdir = str(tmp_path / "specs")
    os.makedirs(specdir)
    with open(os.path.join(specdir, "t.json"), "w") as fh:
        fh.write(_spec(logdir).to_json())
    rc = cli.main(
        ["--warehouse", str(tmp_path / "wh"), "--specs", specdir,
         "--master", "local[4]"]
    )
    assert rc == 3
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rep = _json.loads(out[-1])
    assert rep["rejected"] is True and rep["violations"] == {"text_not_null": 1}


# --------------------------------------------------------------------------
# ks_drift (two-sample KS per group vs rest)


def _ks_df(spark, rows):
    return spark.createDataFrame(rows, ["g", "v"])


def test_ks_identical_distributions_is_zero(spark):
    from relational_data_loader_spark.operators.quality import ks_drift

    rows = [("a", v) for v in (1, 2, 3, 4)] * 5 + [("b", v) for v in (1, 2, 3, 4)] * 7
    out = {r["g"]: r["ks"] for r in ks_drift(_ks_df(spark, rows), "g", "v").collect()}
    assert out["a"] == 0.0 and out["b"] == 0.0


def test_ks_disjoint_supports_is_one(spark):
    from relational_data_loader_spark.operators.quality import ks_drift

    rows = [("lo", v) for v in (1, 2, 3)] + [("hi", v) for v in (10, 11, 12)]
    out = {r["g"]: r["ks"] for r in ks_drift(_ks_df(spark, rows), "g", "v").collect()}
    assert out["lo"] == 1.0 and out["hi"] == 1.0


def test_ks_matches_manual_ecdf(spark):
    from relational_data_loader_spark.operators.quality import ks_drift

    a = [1, 1, 2, 5, 9]
    b = [2, 3, 3, 7]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    grid = sorted(set(a + b))
    def ecdf(xs, x):
        return sum(1 for t in xs if t <= x) / len(xs)
    want = max(abs(ecdf(a, x) - ecdf(b, x)) for x in grid)
    out = {r["g"]: r["ks"] for r in ks_drift(_ks_df(spark, rows), "g", "v").collect()}
    assert abs(out["a"] - round(want, 4)) < 1e-12
    assert out["a"] == out["b"]  # two-group case is symmetric


def test_ks_single_group_is_null_not_crash(spark):
    from relational_data_loader_spark.operators.quality import ks_drift

    rows = [("only", v) for v in (1, 2, 3)]
    r = ks_drift(_ks_df(spark, rows), "g", "v").first()
    assert r["ks"] is None and r["n"] == 3
