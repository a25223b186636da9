"""Agent-trajectory operators (operators/agent.py): tool-usage stats,
degenerate-loop detection, preference-pair mining — hand-built edge cases
the fixture-derived oracle entries can't isolate (trailing calls, null
tools, single-response prefix groups, ties in the winner rule)."""

import datetime as dt

import pytest

from relational_data_loader_spark.operators.agent import (
    agent_loop_audit,
    preference_pairs,
    tool_call_stats,
)


def _ts(sec):
    return dt.datetime(2024, 1, 1, 0, 0, sec)


# --------------------------------------------------------------------------
# tool_call_stats


def _turns(spark):
    # conv 1: user → tool(search, answered after 2s) → assistant →
    #         tool(search, TRAILING — last turn of the conversation)
    # conv 2: tool(calc, answered after 5s) → assistant
    # conv 3: a tool-role turn with NULL tool name (dirty row) → excluded
    rows = [
        (1, 0, "user", None, _ts(0)),
        (1, 1, "tool", "search", _ts(1)),
        (1, 2, "assistant", None, _ts(3)),
        (1, 3, "tool", "search", _ts(4)),
        (2, 0, "tool", "calc", _ts(10)),
        (2, 1, "assistant", None, _ts(15)),
        (3, 0, "tool", None, _ts(20)),
        (3, 1, "assistant", None, _ts(21)),
    ]
    return spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, tool string, ts timestamp"
    )


def test_tool_call_stats_counts_trailing_and_gaps(spark):
    out = {
        r["tool"]: r.asDict()
        for r in tool_call_stats(
            _turns(spark), "conv_id", "turn_idx", "role", "tool", "ts"
        ).collect()
    }
    assert set(out) == {"search", "calc"}  # NULL-tool dirty row excluded
    s = out["search"]
    assert s["n_calls"] == 2 and s["n_convs"] == 1
    assert s["n_trailing"] == 1 and s["n_answered"] == 1
    assert s["total_gap_us"] == 2_000_000
    assert s["avg_gap_us"] == pytest.approx(2_000_000.0)
    c = out["calc"]
    assert c["n_calls"] == 1 and c["n_trailing"] == 0
    assert c["total_gap_us"] == 5_000_000


def test_tool_call_stats_all_trailing_has_null_avg(spark):
    df = spark.createDataFrame(
        [(1, 0, "tool", "x", _ts(0))],
        "conv_id int, turn_idx int, role string, tool string, ts timestamp",
    )
    row = tool_call_stats(
        df, "conv_id", "turn_idx", "role", "tool", "ts"
    ).collect()[0]
    assert row["n_trailing"] == 1 and row["n_answered"] == 0
    assert row["total_gap_us"] == 0 and row["avg_gap_us"] is None


# --------------------------------------------------------------------------
# agent_loop_audit


def _loop_turns(spark):
    # conv 1 tool turns: a a a | b | a a  → runs: a×3, b×1, a×2
    # conv 2 tool turns: a b a b          → no run (alternating)
    # non-tool turns interleave and must not break tool-run adjacency
    rows = [
        (1, 0, "tool", "a"), (1, 1, "assistant", None), (1, 2, "tool", "a"),
        (1, 3, "tool", "a"), (1, 4, "tool", "b"), (1, 5, "tool", "a"),
        (1, 6, "user", None), (1, 7, "tool", "a"),
        (2, 0, "tool", "a"), (2, 1, "tool", "b"),
        (2, 2, "tool", "a"), (2, 3, "tool", "b"),
    ]
    return spark.createDataFrame(
        rows, "conv_id int, turn_idx int, role string, tool string"
    )


def test_agent_loop_audit_gaps_and_islands(spark):
    out = agent_loop_audit(
        _loop_turns(spark), "conv_id", "turn_idx", "role", ["tool"], min_run=2
    ).collect()
    assert len(out) == 1  # conv 2 alternates → no flagged run → no row
    r = out[0].asDict()
    assert r["conv_id"] == 1
    assert r["n_loop_runs"] == 2  # a×3 and a×2; the b singleton is no run
    assert r["max_run_len"] == 3
    assert r["n_looped_turns"] == 5


def test_agent_loop_audit_min_run_threshold(spark):
    out = agent_loop_audit(
        _loop_turns(spark), "conv_id", "turn_idx", "role", ["tool"], min_run=3
    ).collect()
    assert len(out) == 1 and out[0]["n_loop_runs"] == 1
    assert out[0]["max_run_len"] == 3 and out[0]["n_looped_turns"] == 3


def test_agent_loop_audit_requires_keys(spark):
    with pytest.raises(ValueError):
        agent_loop_audit(
            _loop_turns(spark), "conv_id", "turn_idx", "role", [], min_run=2
        )


# --------------------------------------------------------------------------
# preference_pairs


def _pref_turns(spark):
    # prefix group "hi": convs 1,2,3 — responses "long answer" (1),
    #   "short" (2), "long answer" (3, same as 1 → collapses with it)
    # prefix group "yo": conv 4 only — single response, no pair
    # conv 5: one turn only (no continuation) → drops out
    rows = [
        (1, 0, "hi", "hi there"), (1, 1, "hi", "long answer"),
        (2, 0, "hi", "hi there"), (2, 1, "hi", "short"),
        (3, 0, "hi", "hi again"), (3, 1, "hi", "long answer"),
        (4, 0, "yo", "yo"), (4, 1, "yo", "resp"),
        (5, 0, "hi", "hi"),
    ]
    return spark.createDataFrame(
        rows, "conv_id int, turn_idx int, etype string, txt string"
    )


def test_preference_pairs_winner_and_collapse(spark):
    out = preference_pairs(
        _pref_turns(spark), "conv_id", "turn_idx", "etype", "txt", prefix_k=1
    ).collect()
    # group "hi": distinct responses {"long answer" (convs 1,3), "short"
    # (conv 2)} → winner "long answer" (longer), one rejected row;
    # group "yo": single response → zero rows; conv 5: too short → none
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_convs"] == 3
    assert r["chosen_conv"] == 1  # representative = min conv of the winner
    assert r["rejected_conv"] == 2
    assert r["chosen_len"] == len("long answer")
    assert r["rejected_len"] == len("short")
    assert r["chosen_fp"] != r["rejected_fp"]


def test_preference_pairs_lexical_tiebreak(spark):
    rows = [
        (1, 0, "p", "ctx"), (1, 1, "p", "bbb"),
        (2, 0, "p", "ctx"), (2, 1, "p", "aaa"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, etype string, txt string"
    )
    out = preference_pairs(
        df, "conv_id", "turn_idx", "etype", "txt", prefix_k=1
    ).collect()
    assert len(out) == 1
    # equal lengths → lexically greatest wins
    assert out[0]["chosen_conv"] == 1 and out[0]["rejected_conv"] == 2


def test_preference_pairs_prefix_k2_separates_groups(spark):
    rows = [
        (1, 0, "a", "t"), (1, 1, "b", "u"), (1, 2, "x", "resp1"),
        (2, 0, "a", "t"), (2, 1, "b", "u"), (2, 2, "x", "resp2!"),
        (3, 0, "a", "t"), (3, 1, "c", "u"), (3, 2, "x", "resp3"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id int, turn_idx int, etype string, txt string"
    )
    out = preference_pairs(
        df, "conv_id", "turn_idx", "etype", "txt", prefix_k=2
    ).collect()
    # convs 1,2 share prefix (a,b); conv 3's (a,c) is its own group
    assert len(out) == 1
    assert out[0]["chosen_conv"] == 2 and out[0]["rejected_conv"] == 1
