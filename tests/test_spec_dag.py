"""Dependency-ordered multi-spec orchestration (plans/dag.py + CLI):
wave layering, config-bug rejection, and rejected-parent dependent
skipping in batch mode."""

import json

import pyarrow.compute as pc
import pytest

from relational_data_loader_spark.cli import main
from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.dag import (
    SpecDependencyError,
    blocked_dependents,
    dependency_waves,
)
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import write_log


def _spec(name, deps=()):
    return transcripts_spec(name=name, depends_on=tuple(deps))


# --------------------------------------------------------------------------
# wave layering


def test_waves_layer_parents_first():
    specs = [
        _spec("lineitem", ["orders", "part"]),
        _spec("orders", ["customer"]),
        _spec("customer", ["nation"]),
        _spec("nation"),
        _spec("part"),
    ]
    waves = [[s.name for s in w] for w in dependency_waves(specs)]
    assert waves == [["nation", "part"], ["customer"], ["orders"], ["lineitem"]]


def test_waves_no_deps_single_wave_sorted():
    waves = dependency_waves([_spec("b"), _spec("a"), _spec("c")])
    assert [[s.name for s in w] for w in waves] == [["a", "b", "c"]]


def test_unknown_dependency_rejected():
    with pytest.raises(SpecDependencyError, match="unknown spec 'ghost'"):
        dependency_waves([_spec("a", ["ghost"])])


def test_cycle_rejected():
    with pytest.raises(SpecDependencyError, match="cycle"):
        dependency_waves([_spec("a", ["b"]), _spec("b", ["a"])])


def test_self_dependency_rejected():
    with pytest.raises(SpecDependencyError, match="itself"):
        dependency_waves([_spec("a", ["a"])])


def test_duplicate_names_rejected():
    with pytest.raises(SpecDependencyError, match="duplicate"):
        dependency_waves([_spec("a"), _spec("a")])


# --------------------------------------------------------------------------
# blocked dependents


def test_blocked_dependents_transitive():
    specs = [
        _spec("a"),
        _spec("b", ["a"]),
        _spec("c", ["b"]),
        _spec("d"),
    ]
    got = blocked_dependents(specs, failed={"a"})
    assert got == {"b": ["a"], "c": ["a"]}


def test_blocked_dependents_none_when_clean():
    assert blocked_dependents([_spec("a"), _spec("b", ["a"])], set()) == {}


# --------------------------------------------------------------------------
# CLI integration: rejected parent blocks the child in the same run


def _out_lines(capsys):
    return [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]


def test_cli_skips_dependent_of_rejected_parent(tmp_path, spark, capsys):
    log = generate_change_log(n_events=600, n_convs=20, seed=41)
    parent_dir, child_dir = str(tmp_path / "plog"), str(tmp_path / "clog")
    write_log(log, parent_dir)
    write_log(log, child_dir)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    # parent's gate rejects every epoch (text is never null in the fixture,
    # so flag the opposite: every row with a non-null text "violates")
    parent = transcripts_spec(
        name="parent", source=f"parquet://{parent_dir}",
        expectations={"poison": "text IS NOT NULL"},
    )
    child = transcripts_spec(
        name="child", source=f"parquet://{child_dir}",
        depends_on=("parent",),
    )
    (specdir / "a_parent.json").write_text(parent.to_json())
    (specdir / "b_child.json").write_text(child.to_json())
    wh = str(tmp_path / "wh")

    rc = main(["--warehouse", wh, "--specs", str(specdir)])
    assert rc == 3  # rejection surfaced to the scheduler
    lines = {l["spec"]: l for l in _out_lines(capsys)}
    assert lines["parent"]["rejected"] is True
    assert lines["child"]["skipped"] is True
    assert lines["child"]["blocked_by"] == ["parent"]


def test_cli_dependency_config_bug_stops_before_any_load(tmp_path, spark, capsys):
    log = generate_change_log(n_events=300, n_convs=10, seed=43)
    logdir = str(tmp_path / "log")
    write_log(log, logdir)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    spec = transcripts_spec(
        name="t", source=f"parquet://{logdir}", depends_on=("missing",)
    )
    (specdir / "t.json").write_text(spec.to_json())
    wh = str(tmp_path / "wh")
    assert main(["--warehouse", wh, "--specs", str(specdir)]) == 2
    assert _out_lines(capsys) == []  # nothing loaded


def test_cli_parent_child_both_load_in_order(tmp_path, spark, capsys):
    log = generate_change_log(n_events=600, n_convs=20, seed=47)
    parent_dir, child_dir = str(tmp_path / "plog"), str(tmp_path / "clog")
    cut = pc.max(log["lsn"]).as_py()
    write_log(log, parent_dir)
    write_log(log, child_dir)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    parent = transcripts_spec(name="parent", source=f"parquet://{parent_dir}")
    child = transcripts_spec(
        name="child", source=f"parquet://{child_dir}", depends_on=("parent",)
    )
    # filename order (c_ before d_) would load child first; waves must win
    (specdir / "c_child.json").write_text(child.to_json())
    (specdir / "d_parent.json").write_text(parent.to_json())
    wh = str(tmp_path / "wh")
    assert main(["--warehouse", wh, "--specs", str(specdir)]) == 0
    lines = _out_lines(capsys)
    assert [l["spec"] for l in lines] == ["parent", "child"]
    assert all(l["decision"] == "full_refresh" for l in lines)
    assert all(l["watermark"] == cut for l in lines)
