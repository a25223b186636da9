"""Schema-registry-style compatibility gate (spec.compat_level):
BACKWARD/FORWARD/FULL evolution policies enforced BEFORE any load work.

The two consumer contracts (spec.py field doc): backward = new-schema
readers must read pre-evolution data; forward = old-schema consumers must
survive the evolved table. Breaking changes violate every non-none level.
"""

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import (
    ColumnSpec,
    CompatibilityError,
    IngestSpec,
    transcripts_spec,
)
from tests.util import write_log


def _spec(cols=None, level="none", **kw):
    base = transcripts_spec(source="parquet:///x", target_buckets=8, **kw)
    if cols is not None:
        base = IngestSpec(
            name="transcripts",
            source="parquet:///x",
            columns=cols,
            target_buckets=8,
            compat_level=level,
        )
    else:
        base.compat_level = level
    return base


def _cols(extra=None, retype=None, rename=None):
    cols = [
        ColumnSpec("conv_id", "conv_id", "string", primary_key=True, nullable=False),
        ColumnSpec("turn_idx", "turn_idx", "int", primary_key=True, nullable=False),
        ColumnSpec("role", "role", "string"),
        ColumnSpec("text", "text", "string"),
        ColumnSpec("tool", "tool", "string"),
        ColumnSpec("ts", "ts", "datetime"),
    ]
    if retype:
        cols = [
            ColumnSpec(c.source, c.destination, retype[1], primary_key=c.primary_key,
                       nullable=c.nullable) if c.source == retype[0] else c
            for c in cols
        ]
    if rename:
        cols = [
            ColumnSpec(c.source, rename[1], c.type, primary_key=c.primary_key,
                       nullable=c.nullable) if c.source == rename[0] else c
            for c in cols
        ]
    if extra:
        cols = cols + [extra]
    return cols


# ---- pure classification -----------------------------------------------------


def test_backward_allows_nullable_add_rename_widen():
    old = _spec()
    for new in (
        _spec(_cols(extra=ColumnSpec("model", "model", "string")), "backward"),
        _spec(_cols(rename=("tool", "tool_name")), "backward"),
        _spec(_cols(retype=("turn_idx", "bigint")), "backward"),
    ):
        assert new.check_compat(old) == [], new.check_compat(old)


def test_backward_rejects_non_nullable_add():
    old = _spec()
    new = _spec(
        _cols(extra=ColumnSpec("model", "model", "string", nullable=False)),
        "backward",
    )
    (v,) = new.check_compat(old)
    assert "NON-NULLABLE" in v and "model" in v


def test_forward_rejects_rename_and_widen_allows_add():
    old = _spec()
    renamed = _spec(_cols(rename=("tool", "tool_name")), "forward")
    assert any("rename" in v for v in renamed.check_compat(old))
    widened = _spec(_cols(retype=("turn_idx", "bigint")), "forward")
    assert any("widen" in v for v in widened.check_compat(old))
    added = _spec(_cols(extra=ColumnSpec("model", "model", "string")), "forward")
    assert added.check_compat(old) == []


def test_breaking_rejected_at_every_level_allowed_at_none():
    old = _spec()
    for level in ("backward", "forward", "full"):
        new = _spec(_cols(retype=("text", "int")), level)  # narrowing retype
        assert any("breaking" in v for v in new.check_compat(old)), level
    assert _spec(_cols(retype=("text", "int")), "none").check_compat(old) == []


def test_full_is_union_of_both():
    old = _spec()
    new = _spec(_cols(rename=("tool", "tool_name"),
                      extra=ColumnSpec("m", "m", "string", nullable=False)), "full")
    vs = new.check_compat(old)
    assert any("rename" in v for v in vs) and any("NON-NULLABLE" in v for v in vs)


def test_compat_level_json_roundtrip_and_checksum_neutral():
    s = _spec(level="full")
    assert IngestSpec.from_json(s.to_json()).compat_level == "full"
    t = _spec(level="none")
    assert s.checksum() == t.checksum()  # governance knob never forces a refresh
    with pytest.raises(ValueError, match="compat_level"):
        transcripts_spec(source="parquet:///x", compat_level="sideways")


# ---- manager integration ------------------------------------------------------


def test_gate_rejects_before_any_load_work(spark, warehouse, tmp_path):
    log = generate_change_log(n_events=2000, n_convs=40, seed=11)
    logdir = str(tmp_path / "log")
    cut = pc.max(log["lsn"]).as_py() // 2
    write_log(log, logdir, lsn_upto=cut)
    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr.run(spec1)
    t = mgr.table(spec1)
    v0, wm0 = t.current_manifest()["version"], t.watermark()

    write_log(log, logdir, lsn_from=cut)
    bad = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=_cols(rename=("tool", "tool_name")),
        target_buckets=8,
        compat_level="forward",
    )
    with pytest.raises(CompatibilityError) as ei:
        mgr.run(bad)
    assert ei.value.spec_name == "transcripts" and ei.value.level == "forward"
    # state untouched: no commit, no watermark advance
    assert t.current_manifest()["version"] == v0 and t.watermark() == wm0

    # the corrected spec (additive under forward) applies the tail cleanly
    ok = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=_cols(extra=ColumnSpec("model", "model", "string")),
        target_buckets=8,
        compat_level="forward",
    )
    r = mgr.run(ok)
    assert r.decision.kind == "incremental" and r.decision.evolve_added
    assert mgr.table(ok).watermark() > wm0


def test_gate_off_by_default_preserves_breaking_refresh(spark, warehouse, tmp_path):
    log = generate_change_log(n_events=1500, n_convs=30, seed=12)
    logdir = str(tmp_path / "log")
    write_log(log, logdir)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(transcripts_spec(source=f"parquet://{logdir}", target_buckets=8))
    # dropped column: the breaking class that still reads the same log
    breaking = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=[c for c in _cols() if c.source != "tool"],
        target_buckets=8,
    )
    r = mgr.run(breaking)  # compat_level="none": today's behavior
    assert r.decision.kind == "full_refresh"
    assert any("breaking" in x for x in r.decision.reasons)


def test_cli_check_compat_dry_run(spark, warehouse, tmp_path, capsys):
    """--check-compat reports violations without loading; rc 3 on reject,
    rc 0 (and no state change) on a compatible or initial spec."""
    import json as _json

    from relational_data_loader_spark.cli import main

    log = generate_change_log(n_events=1500, n_convs=30, seed=13)
    logdir = str(tmp_path / "log")
    write_log(log, logdir)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    wh = str(tmp_path / "wh")
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    (specdir / "transcripts.json").write_text(spec.to_json())
    assert main(["--warehouse", wh, "--specs", str(specdir)]) == 0
    capsys.readouterr()

    mgr = DataLoadManager(spark, wh)
    wm0 = mgr.table(spec).watermark()

    bad = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=_cols(rename=("tool", "tool_name")),
        target_buckets=8,
        compat_level="forward",
    )
    (specdir / "transcripts.json").write_text(bad.to_json())
    rc = main(["--warehouse", wh, "--specs", str(specdir), "--check-compat"])
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    doc = _json.loads(out[-1])
    assert rc == 3
    assert doc["compat_violations"] and "rename" in doc["compat_violations"][0]
    assert mgr.table(spec).watermark() == wm0  # dry run: nothing loaded

    ok = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=_cols(extra=ColumnSpec("model", "model", "string")),
        target_buckets=8,
        compat_level="forward",
    )
    (specdir / "transcripts.json").write_text(ok.to_json())
    rc = main(["--warehouse", wh, "--specs", str(specdir), "--check-compat"])
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert rc == 0 and _json.loads(out[-1])["compat_violations"] == []
    assert mgr.table(spec).watermark() == wm0


def test_streaming_start_gates_compat(spark, warehouse, tmp_path):
    """A resident stream applies one spec for its whole life — a forbidden
    evolution is rejected at start(), before any micro-batch."""
    from relational_data_loader_spark.streaming.runner import StreamingIngest

    log = generate_change_log(n_events=1500, n_convs=30, seed=14)
    logdir = str(tmp_path / "log")
    write_log(log, logdir)
    mgr = DataLoadManager(spark, warehouse)
    spec1 = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr.run(spec1)
    wm0 = mgr.table(spec1).watermark()

    bad = IngestSpec(
        name="transcripts",
        source=f"parquet://{logdir}",
        columns=_cols(rename=("tool", "tool_name")),
        target_buckets=8,
        compat_level="full",
    )
    ing = StreamingIngest(mgr, bad, str(tmp_path / "ckpt"))
    with pytest.raises(CompatibilityError):
        ing.run_until_caught_up()
    assert mgr.table(spec1).watermark() == wm0  # nothing applied
