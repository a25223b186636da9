"""Transcript-native operators: conversation assembly and turn integrity.

The engine's payload is multi-turn conversation / agent transcripts keyed
(conv_id, turn_idx) (BASELINE.json input_hint). After CDC replay lands the
turn-level table, two consumers dominate:

- **Assembly**: training pipelines consume whole conversations, not turns —
  the per-conversation ordered concatenation of turn texts. Its md5 is the
  *conversation fingerprint*, the per-turn-text-equality-under-stable-
  ordering invariant (north_star) reduced to one comparable value: two
  replicas agree on a conversation iff the fingerprints match.
- **Integrity**: the replicated table must have no duplicate or missing
  turn_idx per conversation — duplicate turns mean a MERGE keyed too
  coarsely; gaps mean lost deletes or dropped events.

Scale notes: both are ONE partial-aggregated groupBy on conv_id. Assembly's
``collect_list`` is the one agg here whose buffer is O(turns-per-group) —
bounded by the longest single conversation (thousands of turns), never by
the corpus, and groups spread uniformly over reducers. Hot conversations
(1% of convs owning 30% of events in the fixture) are one *group* each —
skew in group SIZE, handled by partial aggregation of the scalar stats; the
list agg itself cannot partial-combine order-correctly, so Spark ships the
group's rows — acceptable because a conversation is small relative to a
partition. The sort is per-group ``array_sort`` AFTER collection (no global
sort, no window shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    sep: str = "\x1f",
) -> DataFrame:
    """Per conversation: turn count, ordered text concatenation, fingerprint.

    Ordering is (turn_col ASC) — stable and total because turn_col is part
    of the primary key (unique per conversation after replay). The struct
    sort orders by the struct's FIRST field, so turn_col leads; texts ride
    along. ``sep`` must not occur in texts for the fingerprint to be
    injective (0x1F unit separator by default).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col).alias("t"), F.col(text_col).alias("x")))
    )
    joined = F.array_join(
        F.transform(ordered, lambda s: s["x"]), sep, null_replacement="\x00"
    )
    return df.groupBy(F.col(conv_col)).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(turn_col).alias("first_turn"),
        F.max(turn_col).alias("last_turn"),
        F.md5(joined).alias("conv_fingerprint"),
        F.sum(F.length(text_col)).alias("total_chars"),
    )


def turn_integrity(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
) -> DataFrame:
    """Per-conversation turn-sequence audit: duplicates and gaps.

    - ``n_dup_turns``: rows beyond the first per turn_idx (MERGE keyed too
      coarsely, or a replay that double-applied an epoch).
    - ``n_gaps``: missing indices inside [min_turn, max_turn] (lost deletes
      propagate as gaps only if the writer compacts; a gap in a
      freshly-replicated table means dropped events).
    - ``is_clean``: zero of both and turns start at their minimum
      contiguously.

    One groupBy; all stats partial-aggregate (count, count distinct via
    the exact countDistinct — per-group cardinality is conversation-sized,
    never corpus-sized, so the distinct expansion is bounded).
    """
    span = F.col("max_turn") - F.col("min_turn") + F.lit(1)
    agg = df.groupBy(F.col(conv_col)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(turn_col)).alias("n_turns"),
        F.min(turn_col).alias("min_turn"),
        F.max(turn_col).alias("max_turn"),
    )
    return agg.select(
        conv_col,
        "n_rows",
        "n_turns",
        "min_turn",
        "max_turn",
        (F.col("n_rows") - F.col("n_turns")).alias("n_dup_turns"),
        (span - F.col("n_turns")).cast("bigint").alias("n_gaps"),
        (
            (F.col("n_rows") == F.col("n_turns")) & (span == F.col("n_turns"))
        ).alias("is_clean"),
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str,
    role_col: str,
    ts_col: str,
    tool_col: str | None = None,
) -> DataFrame:
    """Per-conversation shape statistics for corpus analytics: turn counts
    by role, wall-clock span, tool usage. One partial-aggregated groupBy —
    every aggregate is a scalar conditional count/min/max, so map-side
    combine reduces each partition to one row per conversation seen there.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.count(F.when(F.col(role_col) == "user", 1)).alias("n_user"),
        F.count(F.when(F.col(role_col) == "assistant", 1)).alias("n_assistant"),
        F.min(ts_col).alias("started_at"),
        F.max(ts_col).alias("ended_at"),
    ]
    if tool_col is not None:
        aggs.append(
            F.count(F.when(F.col(tool_col).isNotNull() & (F.col(tool_col) != ""), 1)).alias(
                "n_tool_calls"
            )
        )
    return df.groupBy(F.col(conv_col)).agg(*aggs)


def context_windows(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    k_prev: int = 3,
    sep: str = "\x1f",
) -> DataFrame:
    """Sliding training-example assembly: for every turn, the concatenation
    of the previous ``k_prev`` turns plus the turn itself — the
    context-window construction an SFT/RLHF pipeline runs over a turn
    table to emit one example per target turn. Output is one row per turn:
    ``(conv, turn, n_ctx, ctx_chars, ctx_fingerprint)`` with the
    fingerprint standing in for the assembled text (the md5 is what
    equality checks and dedup consume; callers wanting the raw example
    drop the md5 and keep the join).

    Plan: ONE window exchange on conv_col (the same hash partitioning the
    turn table's bucketed layout already has, so on a bucketed read the
    exchange disappears) and a per-partition sort; the frame
    ``rowsBetween(-k_prev, 0)`` keeps the buffer at k_prev+1 texts per row
    regardless of conversation length — unlike a whole-conversation
    collect_list, a hot conversation never concentrates its full history
    in one aggregation buffer. Ordering is total because turn_col is
    unique per conversation (PK after replay)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(-int(k_prev), 0)
    )
    ctx = F.array_join(
        F.collect_list(F.col(text_col)).over(w), sep, null_replacement="\x00"
    )
    return df.select(
        F.col(conv_col),
        F.col(turn_col),
        F.count(F.lit(1)).over(w).alias("n_ctx"),
        F.md5(ctx).alias("ctx_fingerprint"),
        F.length(ctx).cast("bigint").alias("ctx_chars"),
    )


def dedup_conversations(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
) -> DataFrame:
    """Conversation-granular exact dedup: assemble each conversation's
    ordered fingerprint (``assemble_conversations``), then keep the lowest
    conv id per fingerprint. Transcript corpora duplicate at the
    CONVERSATION level (re-ingested sessions, mirrored sources), where
    turn-level or document-level dedup never fires. Output: one row per
    distinct conversation content — ``(conv_fingerprint, n_convs, keeper,
    n_turns)``; downstream joins ``keeper`` back to the turn table to
    materialize the surviving corpus.

    Plan: the assembly groupBy (one exchange on conv_col) feeds a second
    groupBy on the 128-bit fingerprint — uniform md5 keys, no skew, both
    aggregations partial-combine."""
    asm = assemble_conversations(df, conv_col, turn_col, text_col)
    return (
        asm.groupBy("conv_fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.min(conv_col).alias("keeper"),
            F.min("n_turns").alias("n_turns"),
        )
    )


def dedup_drop_list(
    state: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
) -> DataFrame:
    """Non-keeper conversations under exact conversation-level dedup —
    the DROP side of ``dedup_conversations``' verdict, as a one-column
    frame ready to drive downstream erasure.

    The intended composition is **dedup as a CDC writer**: join the drop
    list back to the live table, emit one DELETE envelope per surviving
    turn of each dropped conversation (at a fresh lsn), and apply them
    through the ordinary merge path. Against a table rewrite this buys
    what the GDPR cascade (operators/erasure.py) buys: the drop is an
    auditable, replayable change event — CDF consumers see D rows,
    time travel still serves the pre-dedup state, and a kill mid-apply
    resumes exactly-once like any other epoch.

    Plan: one assembly groupBy (exchange on conv_col) + a window over the
    128-bit fingerprint — uniform md5 partitioning, no skew; output is
    O(dropped conversations), control-plane small relative to the corpus.
    """
    from pyspark.sql.window import Window

    asm = assemble_conversations(state, conv_col, turn_col, text_col)
    w = Window.partitionBy("conv_fingerprint")
    return (
        asm.withColumn("_keeper", F.min(conv_col).over(w))
        .filter(F.col(conv_col) != F.col("_keeper"))
        .select(conv_col)
    )


def drop_boilerplate_turns(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    min_convs: int = 3,
    sep: str = "\x1f",
) -> DataFrame:
    """Corpus-frequency boilerplate removal at TURN granularity: drop every
    turn whose exact text appears in ``>= min_convs`` distinct
    conversations, then re-assemble what survives.

    Transcript corpora carry canned text *inside* otherwise-unique
    conversations — templated system prompts, autoresponder greetings,
    tool-call preambles — which conversation-level dedup
    (``dedup_conversations``) never fires on because the surrounding turns
    differ. The document-corpus analog drops high-document-frequency lines
    (CCNet-style boilerplate pruning); here the unit is the turn and the
    frequency is *distinct conversations containing the text* (a text
    repeated 50× inside ONE conversation is repetition, not boilerplate —
    ``doc_repetition_stats`` covers that axis).

    Output, one row per conversation: ``n_turns`` (before), ``n_kept``,
    ``n_dropped``, ``kept_fingerprint`` (md5 of the ordered surviving
    texts; md5('') for a conversation that was pure boilerplate),
    ``kept_chars``.

    Plan shape (two exchanges, both partial-aggregated):
    1. groupBy(text) with count(DISTINCT conv) — the text key is the
       shuffle; uniform unless one string dominates the corpus, and that
       string is exactly the boilerplate head whose group collapses to a
       count, not a row list.
    2. Mark turns via a left join of the turn table against the flagged
       texts. The flagged side is the df >= min_convs HEAD of the text
       frequency distribution — corpus/min_convs rows at worst, tiny in
       practice — so AQE turns this into a broadcast; we do not force the
       hint because at 100 TB with min_convs=2 the head can exceed driver
       memory, and a shuffled equi-join on the text is still exact.
    3. One groupBy(conv) re-assembly identical to
       ``assemble_conversations`` but collecting only unmarked turns
       (``collect_list`` skips the NULLs the ``when`` emits for dropped
       turns).
    """
    # NULL text normalizes to '' so the fingerprint agrees with any SQL
    # twin (string_agg SKIPS nulls while array_join substitutes — two
    # engines, two conventions; '' sidesteps both)
    turns = df.select(
        F.col(conv_col).alias("_conv"),
        F.col(turn_col).alias("_turn"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    )
    flagged = (
        turns.groupBy("_txt")
        .agg(F.countDistinct("_conv").alias("_nc"))
        .filter(F.col("_nc") >= F.lit(min_convs))
        .select("_txt", F.lit(1).alias("_bp"))
    )
    marked = turns.join(flagged, "_txt", "left")
    kept_struct = F.when(
        F.col("_bp").isNull(), F.struct(F.col("_turn").alias("t"), F.col("_txt").alias("x"))
    )
    ordered = F.array_sort(F.collect_list(kept_struct))
    joined = F.array_join(
        F.transform(ordered, lambda s: s["x"]), sep, null_replacement="\x00"
    )
    return marked.groupBy(F.col("_conv").alias(conv_col)).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("_bp").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("_bp").isNull(), 0).otherwise(1)).alias("n_dropped"),
        F.md5(joined).alias("kept_fingerprint"),
        F.coalesce(
            F.sum(F.when(F.col("_bp").isNull(), F.length("_txt"))), F.lit(0)
        ).alias("kept_chars"),
    )


def role_alternation_audit(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    repeatable_roles: tuple[str, ...] = ("tool",),
) -> DataFrame:
    """Per-conversation role-protocol audit: does the turn sequence obey
    the transcript grammar ``system* (user | assistant | tool)…`` with no
    same-role back-to-back turns (except system pairs — the system*
    prefix legalizes multi-part system prompts, and a mid-conversation
    pair is already billed once via ``n_system_mid`` — and except
    ``repeatable_roles`` — agent
    transcripts legitimately emit consecutive tool-result turns)?

    Violations counted per conversation:
    - ``n_role_repeats``: turns whose role equals the PREVIOUS turn's role
      and is not repeatable (double-user means a lost assistant turn;
      double-assistant means a double-applied epoch the PK dedup missed).
    - ``n_system_mid``: system turns preceded by a non-system turn — the
      system prompt must be a prefix, so any later system turn is an
      injection or a mis-ordered replay.
    - ``first_role``: arg-min by turn; clean conversations open with
      'system' or 'user'.
    - ``is_clean``: all of the above hold.

    Plan: one ``lag`` window on (conv, turn) and one groupBy on the SAME
    key — Spark reuses the window's hash partitioning for the aggregation,
    so the whole audit is a single exchange; every aggregate is a scalar
    conditional sum with map-side combine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(turn_col)
    role = F.col(role_col)
    prev = F.lag(role_col).over(w)
    # system-system pairs are NOT repeats: the grammar's system* prefix
    # makes a multi-part system prompt legal, and a system repeated MID
    # conversation already fired n_system_mid on its first row — counting
    # the pair again would double-bill one injection event
    rep = role.eqNullSafe(prev) & ~(role == "system")
    if repeatable_roles:  # isin() with zero args is a Spark error
        rep = rep & ~role.isin(*repeatable_roles)
    rep = rep.cast("int")
    sys_mid = (
        (role == "system") & prev.isNotNull() & (prev != "system")
    ).cast("int")
    agg = df.select(
        F.col(conv_col), F.col(turn_col), role.alias("_role"),
        rep.alias("_rep"), sys_mid.alias("_sys_mid"),
    ).groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_rep").alias("n_role_repeats"),
        F.sum("_sys_mid").alias("n_system_mid"),
        F.min_by("_role", F.col(turn_col)).alias("first_role"),
    )
    return agg.withColumn(
        "is_clean",
        (F.col("n_role_repeats") == 0)
        & (F.col("n_system_mid") == 0)
        & F.col("first_role").isin("system", "user"),
    )


def trim_to_token_budget(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    budget: int,
    sep: str = "\x1f",
) -> DataFrame:
    """Context-window trimming: keep the longest SUFFIX of turns whose
    cumulative whitespace-token count fits ``budget`` — the standard
    "drop oldest turns first" truncation an inference/SFT pipeline applies
    before packing. The FINAL turn is always kept even if it alone busts
    the budget (an example with zero turns is useless; the caller's
    length filter handles oversized single turns).

    Output, one row per conversation: ``n_turns`` (before), ``n_kept``,
    ``kept_tokens`` (may exceed ``budget`` only in the single-oversized-
    final-turn case), ``first_kept_turn``, and ``kept_fingerprint`` — md5
    of the ordered surviving texts, so a trimmed replica can be compared
    turn-text-exactly without shipping the texts.

    Plan: one descending window on (conv, turn) computes the reverse
    running token sum and row number in a single pass; the groupBy keys on
    the same conv column, so the window's exchange is reused — one shuffle
    total. Token counting is `size(split(...))` codegen, no Python.
    """
    from pyspark.sql import Window

    from relational_data_loader_spark.functions.text import token_count

    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # NULL text → '' (same cross-engine fingerprint rationale as
    # drop_boilerplate_turns)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ntok = token_count(txt)
    rows = df.select(
        F.col(conv_col), F.col(turn_col), txt.alias("_txt"),
        ntok.alias("_ntok"),
        F.sum(ntok).over(w).alias("_rev_cum"),
        F.row_number().over(
            Window.partitionBy(conv_col).orderBy(F.col(turn_col).desc())
        ).alias("_rn_desc"),
    ).withColumn(
        "_keep",
        (F.col("_rev_cum") <= F.lit(int(budget))) | (F.col("_rn_desc") == 1),
    )
    kept_struct = F.when(
        F.col("_keep"),
        F.struct(F.col(turn_col).alias("t"), F.col("_txt").alias("x")),
    )
    joined = F.array_join(
        F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["x"]),
        sep,
        null_replacement="\x00",
    )
    return rows.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
        F.sum(F.when(F.col("_keep"), F.col("_ntok")).otherwise(0)).alias(
            "kept_tokens"
        ),
        F.min(F.when(F.col("_keep"), F.col(turn_col))).alias(
            "first_kept_turn"
        ),
        F.md5(joined).alias("kept_fingerprint"),
    )


def sft_loss_mask_stats(
    df: DataFrame,
    conv_col: str,
    role_col: str,
    text_col: str,
    trainable_role: str = "assistant",
) -> DataFrame:
    """Loss-mask accounting for SFT example construction: per conversation,
    how many tokens are TRAINABLE (turns of ``trainable_role`` — the only
    spans that receive loss; user/system/tool turns are context-masked)
    vs total, the mask ratio (4dp), and ``n_examples`` (one training
    example per trainable turn under the each-assistant-turn-is-a-target
    convention). A corpus whose mask ratio collapses toward 0 trains
    mostly on padding context — this is the monitor that catches it.

    Plan: one partial-aggregated groupBy; token counting is codegen."""
    from relational_data_loader_spark.functions.text import token_count

    ntok = token_count(F.col(text_col))
    trainable = F.when(F.col(role_col) == trainable_role, ntok).otherwise(
        F.lit(0)
    )
    return df.groupBy(conv_col).agg(
        F.sum(ntok).alias("total_tokens"),
        F.sum(trainable).alias("trainable_tokens"),
        F.count(F.when(F.col(role_col) == trainable_role, 1)).alias(
            "n_examples"
        ),
        F.round(
            F.sum(trainable)
            / F.nullif(F.sum(ntok).cast("double"), F.lit(0.0)),
            4,
        ).alias("mask_ratio"),
    )


def coalesce_role_runs(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Merge each maximal run of consecutive SAME-ROLE turns into one turn
    (texts concatenated in turn order) and renumber the survivors densely
    from 0 — the REPAIR dual of ``role_alternation_audit``: the audit
    counts protocol violations, this produces the strictly-alternating
    transcript chat templates and SFT tokenizers require. CDC replays of
    agent loops legitimately land consecutive tool chunks and multi-part
    system prompts; training wants them as one turn each, so the repair
    merges EVERY same-role run (including the audit's exempt roles — the
    exemptions exist so the audit doesn't flag legal transcripts, not
    because a merged run would be wrong).

    Gaps-and-islands without self-joins: within a conversation,
    ``row_number() over (conv) − row_number() over (conv, role)`` is
    constant exactly along a same-role run, so (conv, role, island) IS the
    run key. One groupBy collapses each run (order restored by
    ``array_sort`` on (turn, text) structs — no per-group sort shuffle);
    a final (conv)-partitioned ``row_number`` over the runs' first turns
    renumbers. Three exchanges, all on conv-prefixed keys, each over
    strictly shrinking data; nothing global.

    Output: ``conv_col``, ``turn_idx`` (new, dense, 0-based), ``role_col``,
    ``text_col`` (merged), ``n_merged`` (turns folded into this one),
    ``first_turn`` (the run's original first ``turn_col`` — the join-back
    key for provenance).
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy(conv_col).orderBy(turn_col)
    w_role = Window.partitionBy(conv_col, role_col).orderBy(turn_col)
    runs = (
        df.select(
            conv_col,
            turn_col,
            role_col,
            F.col(text_col).alias("_txt"),
            (
                F.row_number().over(w_all) - F.row_number().over(w_role)
            ).alias("_island"),
        )
        .groupBy(conv_col, role_col, "_island")
        .agg(
            F.min(turn_col).alias("first_turn"),
            F.count(F.lit(1)).cast("int").alias("n_merged"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(turn_col).alias("t"), F.col("_txt"))
                        )
                    ),
                    lambda s: s["_txt"],
                ),
            ).alias(text_col),
        )
    )
    w_new = Window.partitionBy(conv_col).orderBy("first_turn")
    return runs.select(
        conv_col,
        (F.row_number().over(w_new) - 1).cast("int").alias("turn_idx"),
        role_col,
        text_col,
        "n_merged",
        "first_turn",
    )
