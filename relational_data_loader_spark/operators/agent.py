"""Agent-trajectory analytics over replicated transcript turn tables.

The engine's payload is multi-turn conversation / agent transcripts
(BASELINE.json input_hint: conv_id, turn_idx, role, text, tool, ts). Once
CDC replay lands the turn table, three trajectory-level consumers show up
in every agent-data pipeline that none of the conversation-shape operators
(operators/transcript.py) cover:

- **Tool-usage accounting** (`tool_call_stats`): per-tool call volume,
  conversation reach, un-responded trailing calls (the truncation /
  crashed-agent signal), and wall-clock latency from a tool call to the
  next turn — the first dashboard anyone builds over an agent corpus.
- **Degenerate-loop detection** (`agent_loop_audit`): runs of consecutive
  tool calls with an identical key (same tool, or same tool+args) inside
  one conversation — the classic stuck-agent signature. Trajectories
  dominated by such runs poison SFT corpora and must be flagged before
  assembly.
- **Preference-pair mining** (`preference_pairs`): conversations that share
  an identical prefix but diverge at the next turn are natural
  chosen/rejected candidates for preference tuning; this emits one pair per
  (shared prefix, rejected continuation) with a deterministic winner.

Scale notes (all three): the heavy key is conv_id — one window exchange on
(conv, turn) each, with every subsequent per-conversation aggregation keyed
on the same column so Spark reuses the partitioning; the final per-tool /
per-prefix aggregations shuffle a frame already reduced to one row per
call/run/conversation. No collect, no python rows, no cross join; group
state is O(one conversation) at worst.

Reference parity: the reference (RDL, SURVEY.md §2) has no analytics layer
at all — these are part of the beyond-reference training-data surface the
build brief mandates, same tier as operators/transcript.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_call_stats(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    tool_col: str,
    ts_col: str,
    tool_role: str = "tool",
) -> DataFrame:
    """Per-tool usage statistics over a transcript turn table.

    One output row per distinct tool value observed on ``tool_role`` turns:

    - ``n_calls``: tool turns invoking it.
    - ``n_convs``: distinct conversations it appears in.
    - ``n_trailing``: calls that are the LAST turn of their conversation —
      an un-responded tool call, the signature of a truncated ingest or an
      agent killed mid-step; a corpus-health counter worth alerting on.
    - ``n_answered`` / ``total_gap_us`` / ``avg_gap_us``: for calls with a
      following turn, the exact summed and mean wall-clock gap to it (the
      tool-roundtrip latency proxy; exact bigint sum so replicas compare
      bit-for-bit, mean as one IEEE division of the two exact carriers).

    Plan: one ``lead`` window on (conv, turn) — a single exchange on
    conv_col — then a groupBy on the tool value over the already-filtered
    tool-turn subset (call-count rows, not corpus rows). Tool-name skew is
    real (one tool usually dominates) but the group collapses to scalar
    partial aggregates, so the hot group costs one combiner row per map
    task, never a row list.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    next_ts = F.lead(ts_col).over(w)
    calls = (
        df.select(
            F.col(conv_col).alias("_conv"),
            F.col(role_col).alias("_role"),
            F.col(tool_col).alias("_tool"),
            F.col(ts_col).alias("_ts"),
            next_ts.alias("_next_ts"),
        )
        .filter((F.col("_role") == tool_role) & F.col("_tool").isNotNull())
    )
    gap = F.unix_micros("_next_ts") - F.unix_micros("_ts")
    answered = F.col("_next_ts").isNotNull()
    agg = calls.groupBy(F.col("_tool").alias("tool")).agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.countDistinct("_conv").alias("n_convs"),
        F.sum(F.when(~answered, 1).otherwise(0)).alias("n_trailing"),
        F.sum(answered.cast("bigint")).alias("n_answered"),
        F.coalesce(F.sum(F.when(answered, gap)), F.lit(0)).alias(
            "total_gap_us"
        ),
    )
    return agg.withColumn(
        "avg_gap_us",
        F.when(
            F.col("n_answered") > 0,
            F.col("total_gap_us").cast("double")
            / F.col("n_answered").cast("double"),
        ),
    )


def agent_loop_audit(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    key_cols: list[str],
    min_run: int = 3,
    tool_role: str = "tool",
) -> DataFrame:
    """Flag conversations containing degenerate agent loops: runs of
    ``>= min_run`` CONSECUTIVE tool calls (consecutive among the
    conversation's tool turns, ordered by ``turn_col``) whose ``key_cols``
    tuple is identical — same tool re-invoked back-to-back
    (``key_cols=[tool]``), or same tool with identical arguments
    (``key_cols=[tool, args_fingerprint]``) for the strict variant.

    Output, one row per conversation that has at least one such run:
    ``n_loop_runs``, ``max_run_len``, ``n_looped_turns`` (turns inside
    flagged runs — the retry/flailing volume a curriculum filter down-
    weights or drops).

    Plan: classic gaps-and-islands. One window pass on (conv, turn) over
    the tool-turn subset marks run starts (``lag`` of the key tuple) and
    assigns run ids by a running sum — both frames share the single
    conv-keyed exchange — then two groupBys on conv-prefixed keys, which
    reuse that partitioning. State per row is one key tuple; a
    million-turn stuck trajectory is still streamed, never buffered.
    """
    if not key_cols:
        raise ValueError("agent_loop_audit needs at least one key column")
    key = F.struct(*[F.col(c) for c in key_cols])
    tool_turns = df.filter(F.col(role_col) == tool_role).select(
        F.col(conv_col).alias("_conv"), F.col(turn_col).alias("_turn"),
        key.alias("_key"),
    )
    w2 = Window.partitionBy("_conv").orderBy("_turn")
    new_run = (~F.col("_key").eqNullSafe(F.lag("_key").over(w2))).cast("int")
    runs = (
        tool_turns.withColumn("_new", new_run)
        .withColumn(
            "_run",
            F.sum("_new").over(
                w2.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("_conv", "_run")
        .agg(F.count(F.lit(1)).alias("_len"))
        .filter(F.col("_len") >= F.lit(int(min_run)))
    )
    return runs.groupBy(F.col("_conv").alias(conv_col)).agg(
        F.count(F.lit(1)).alias("n_loop_runs"),
        F.max("_len").alias("max_run_len"),
        F.sum("_len").alias("n_looped_turns"),
    )


def preference_pairs(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    prefix_col: str,
    response_col: str,
    prefix_k: int = 1,
    sep: str = "\x1f",
) -> DataFrame:
    """Mine preference-tuning candidates from a transcript corpus:
    conversations whose first ``prefix_k`` turns agree on ``prefix_col``
    but diverge on the (k+1)-th turn's ``response_col`` yield
    chosen/rejected pairs — the shared prefix is the prompt, the divergent
    continuations are the completions a preference model ranks.

    ``prefix_col`` and ``response_col`` are separate on purpose: the prefix
    match usually wants a NORMALIZED text (template id, event type,
    boilerplate-scrubbed fingerprint) while the response comparison wants
    the raw turn text — passing the same column gives exact-prefix mining.

    Winner rule (deterministic, no model in the loop): the longest
    response, ties broken by the lexically greatest text — a stand-in
    scorer; production swaps in a reward-model score column the same way.
    Pairs are emitted at DISTINCT-response granularity: one row per
    (prefix, rejected response), each carrying the representative (lowest)
    conv id of both sides, so a group of N identical continuations costs
    one row, not N.

    Output: ``prefix_fp``, ``n_convs`` (group size), ``chosen_conv`` /
    ``rejected_conv`` (representatives), ``chosen_fp`` / ``rejected_fp``
    (md5 of the response texts), ``chosen_len`` / ``rejected_len``.

    Plan: one row_number window on (conv, turn) — single conv-keyed
    exchange — reduced to one row per conversation by a groupBy on the
    same key (exchange reused); then one groupBy on (prefix_fp, response)
    and a max-struct window on prefix_fp, whose partitioning the final
    filter and the group-size join reuse. Prefix fingerprints are md5 —
    uniform keys; a viral prompt shared by millions of conversations
    lands its group on one reducer, but by then the group holds DISTINCT
    responses only, already collapsed by the partial-aggregated count.
    """
    k = int(prefix_k)
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    ranked = df.select(
        F.col(conv_col).alias("_conv"),
        F.col(prefix_col).alias("_pfx"),
        F.col(response_col).alias("_resp"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") <= k + 1)
    prefix_struct = F.when(
        F.col("_rn") <= k,
        F.struct(F.col("_rn").alias("r"), F.col("_pfx").alias("x")),
    )
    per_conv = (
        ranked.groupBy("_conv")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(prefix_struct)),
                        lambda s: s["x"],
                    ),
                    sep,
                    null_replacement="\x00",
                )
            ).alias("prefix_fp"),
            F.sum(F.when(F.col("_rn") <= k, 1).otherwise(0)).alias("_npfx"),
            F.max(F.when(F.col("_rn") == k + 1, F.col("_resp"))).alias(
                "_resp"
            ),
        )
        # a conversation shorter than k+1 turns has no continuation to rank
        .filter((F.col("_npfx") == k) & F.col("_resp").isNotNull())
    )
    by_resp = per_conv.groupBy("prefix_fp", "_resp").agg(
        F.min("_conv").alias("_rep_conv"),
        F.count(F.lit(1)).alias("_n"),
    )
    wp = Window.partitionBy("prefix_fp")
    scored = by_resp.select(
        "prefix_fp", "_resp", "_rep_conv", "_n",
        F.sum("_n").over(wp).alias("n_convs"),
        F.max(
            F.struct(
                F.length("_resp").alias("l"),
                F.col("_resp").alias("x"),
                F.col("_rep_conv").alias("c"),
            )
        ).over(wp).alias("_chosen"),
    )
    rejected = scored.filter(F.col("_resp") != F.col("_chosen.x"))
    return rejected.select(
        "prefix_fp",
        "n_convs",
        F.col("_chosen.c").alias("chosen_conv"),
        F.col("_rep_conv").alias("rejected_conv"),
        F.md5("_chosen.x").alias("chosen_fp"),
        F.md5("_resp").alias("rejected_fp"),
        F.col("_chosen.l").cast("bigint").alias("chosen_len"),
        F.length("_resp").cast("bigint").alias("rejected_len"),
    )
