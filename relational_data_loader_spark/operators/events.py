"""Event-stream analytics: cohort retention, rolling per-entity stats,
per-group exact quantiles.

The longitudinal layer over the ``events`` table, complementing
sessionization (queries.q_sessionize) and funnels (operators/funnel.py).
All pure DataFrame compositions with DuckDB-reproducible semantics —
window frames are pinned to a deterministic total order (ties broken on
the unique event id) so ROWS-frame results are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort retention: users grouped by the (Monday-start) week of
    their FIRST event; one row per (cohort_week, week_offset) counting the
    cohort's users active in that later week.

    Plan, sized for 10^11 events: the raw stream reduces FIRST —
    ``distinct`` on (user, week) collapses every event a user fires in a
    week to one row before anything user-global happens. The cohort week
    then comes from a window min over the (much smaller) user-week table,
    and the final count is a plain groupBy: because (user, week) rows are
    already unique, ``count(*)`` IS the distinct-user count — no
    count-distinct state at the cohort level. Offsets are exact multiples
    of 7 days by construction (both ends week-truncated), so the /7 is
    exact in any arithmetic.
    """
    uw = events.select(
        F.col(user_col).alias("u"), F.date_trunc("week", F.col(ts_col)).alias("w")
    ).distinct()
    cohort = F.min("w").over(Window.partitionBy("u"))
    return (
        uw.select("u", "w", cohort.alias("cohort_week"))
        .groupBy("cohort_week", (F.datediff("w", "cohort_week") / 7).cast("int").alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_event_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n: int = 3,
) -> DataFrame:
    """Per-user trailing-window stats: for every event, the sum and mean of
    ``value_col`` over the last ``n`` events of that user (ROWS frame,
    order pinned by (ts, event_id) so the frame content is deterministic
    under timestamp ties), plus the user's running event count.

    One shuffle (the window partition by user); the frame itself is
    streaming state of O(n) per partition-local user run. A RANGE/interval
    frame ("last 7 days") is the same shape — ROWS is used here because a
    fixed event count is what the deterministic oracle pairing needs.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    frame = w.rowsBetween(-(n - 1), 0)
    return events.select(
        user_col,
        id_col,
        F.round(F.sum(value_col).over(frame), 4).alias("roll_sum"),
        F.round(F.avg(value_col).over(frame), 4).alias("roll_avg"),
        F.row_number().over(w).alias("cum_events"),
    )


def group_quantiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact interpolated per-group quantiles (SQL ``percentile`` — the
    same (n-1)*q linear interpolation as DuckDB's ``quantile_cont``),
    plus the group count.

    Exact percentile is a sort-based aggregate: fine when groups are few
    (event types) and partial aggregation bounds the shuffle to per-group
    sketch state. For high-cardinality groups or 100 TB single columns,
    swap ``percentile`` for ``percentile_approx`` (t-digest, mergeable,
    bounded memory) — same call shape, approximate answer, which is why
    the exact form is the oracle-paired default and the approx form is a
    one-token change documented here rather than a second code path.
    """
    aggs = [
        F.round(F.expr(f"percentile({value_col}, {q})"), 4).alias(
            f"p{int(round(q * 100))}"
        )
        for q in quantiles
    ]
    return events.groupBy(group_col).agg(*aggs, F.count(F.lit(1)).alias("n"))


def flag_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 2.5,
    round_dp: int = 3,
) -> DataFrame:
    """Per-group z-score outliers: events whose value sits more than
    ``z_threshold`` population standard deviations from their group's
    mean. The monitoring primitive a CDC pipeline runs over an incoming
    window before trusting it (a source that suddenly emits value*100 is
    a schema/unit bug, not data).

    Two passes, one cheap: group stats are a partial-agged groupBy on the
    (tiny) group dimension — count/sum/sum-of-squares state only — and
    broadcast back onto the stream, so the scan is the only full-data
    stage and the filter runs inside codegen. The threshold compares the
    ROUNDED z (both engines round before comparing), so boundary events
    cannot flip on 1e-15 accumulation-order noise.
    """
    stats = events.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sigma"),
    )
    z = F.round(
        (F.col(value_col) - F.col("_mu")) / F.col("_sigma"), round_dp
    ).cast("double")
    return (
        events.join(F.broadcast(stats), group_col)
        .filter(F.col("_sigma") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(id_col, group_col, value_col, "z")
    )


def staleness_report(
    events: DataFrame,
    key_col: str = "user_id",
    lsn_col: str = "event_id",
    ts_col: str = "ts",
    stale_after_days: int = 30,
) -> DataFrame:
    """Per-key sync lag against the stream's global watermark: last lsn,
    last business timestamp, lag in whole days, and a stale verdict. The
    freshness dashboard behind a CDC destination (RDL's tracker records
    last-sync per table — SURVEY.md §2.1 C3; this is the per-key
    generalization).

    One partial-agged groupBy on the key + a 1-row global max broadcast
    back; lag arithmetic is integer (whole days on timestamps both
    engines truncate identically), so no FP pairing risk.
    """
    per_key = events.groupBy(key_col).agg(
        F.max(lsn_col).alias("last_lsn"), F.max(ts_col).alias("last_ts")
    )
    wm = events.agg(F.max(ts_col).alias("wm_ts"))
    lag = F.datediff(F.col("wm_ts"), F.col("last_ts"))
    return per_key.crossJoin(F.broadcast(wm)).select(
        key_col,
        "last_lsn",
        "last_ts",
        lag.cast("int").alias("lag_days"),
        (lag >= stale_after_days).alias("is_stale"),
    )


def event_transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: one row per (prev_type, next_type) with the transition
    count and the row-normalized probability (4dp) — the behavioral
    fingerprint behind next-action prediction and bot detection.

    Plan, sized for 10^11 events: the only per-entity structure is a
    ``lag`` window on (ts, tiebreak) — one shuffle on the entity key,
    state O(1) per row (no per-user arrays, unlike funnels); transitions
    then collapse by a plain partial-agged groupBy on the tiny
    (types x types) domain, and the normalizing row totals come from a
    window over that same tiny frame (|types|^2 rows — control-plane
    sized, no second pass over the input). The tie-break pins a total
    order so ties at equal ts are engine-independent.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    trans = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / row_total, 4).alias("prob"),
    )


def winsorized_stats(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Robust per-group moments: clip each value to its group's
    [lo_q, hi_q] exact quantiles (winsorization — outliers are pulled to
    the fence, not dropped, so n is preserved), then mean/stddev of the
    clipped column. The monitoring statistic that survives the bot/sensor
    spikes that poison a plain mean.

    Two passes by necessity (the fences are a distributive-breaking
    aggregate of the same column being clipped): pass 1 reduces to one
    fence row per group (exact ``percentile`` — same interpolation as
    DuckDB ``quantile_cont``; swap for ``percentile_approx`` at
    high-cardinality groups, as in ``group_quantiles``), broadcast back
    (group domain is control-plane sized), pass 2 clips and aggregates —
    partial-agged, one shuffle each.
    """
    fences = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo_q})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi_q})").alias("_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        events.join(F.broadcast(fences), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(clipped), 4).alias("wins_mean"),
            F.round(F.stddev(clipped), 4).alias("wins_std"),
            F.round(F.first("_lo"), 4).alias("lo_fence"),
            F.round(F.first("_hi"), 4).alias("hi_fence"),
        )
    )


def daily_rate_anomaly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
    round_dp: int = 3,
) -> DataFrame:
    """Volume-anomaly monitor: per (group, day) event counts z-scored
    against that group's own daily history — the RATE twin of
    ``flag_anomalies`` (which scores individual VALUES). A source whose
    change feed doubles overnight or silently halves is the first thing
    a CDC operator wants paged about, and per-event value checks cannot
    see it.

    The raw stream collapses to one row per (group, day) FIRST (partial-
    agged groupBy) — everything after runs on the calendar-sized frame:
    per-group mean/stddev via a window over that tiny table (groups x
    days rows), z rounded BEFORE the threshold compare (same
    engine-noise guard as flag_anomalies). Counts are integers, so the
    moment inputs are exact in both engines.
    """
    daily = events.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("grp")
    z = F.round(
        (F.col("n_events") - F.avg("n_events").over(w))
        / F.stddev_pop("n_events").over(w),
        round_dp,
    ).cast("double")
    return (
        daily.withColumn("_sigma", F.stddev_pop("n_events").over(w))
        .filter(F.col("_sigma") > 0)
        .withColumn("z", z)
        .select(
            F.col("grp").alias(group_col),
            "day",
            "n_events",
            "z",
            (F.abs(F.col("z")) > z_threshold).alias("is_anomaly"),
        )
    )


def funnel_latency(
    events: DataFrame,
    from_type: str,
    to_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Stage-to-stage conversion latency: for every entity whose first
    ``from_type`` event is later followed by a ``to_type`` event, the
    seconds between them — reduced to conversion counts and exact
    latency quantiles (one report row). The time-to-convert statistic
    behind funnel SLAs, where the funnel operator itself only reports
    WHETHER stages were reached.

    Plan: both stage streams are filtered BEFORE any shuffle (each
    groupBy sees only its stage's events), the first-``from`` frame
    joins the ``to`` events per entity (posting-sized: entities x their
    to-events), and min-after-start collapses it back to one row per
    converter. Latencies are whole integer seconds in both engines
    (timestamp diff at second grain), so the exact-percentile
    interpolation cannot diverge on FP noise.
    """
    first_from = (
        events.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t0"))
    )
    to_ev = events.filter(F.col(type_col) == to_type).select(
        user_col, F.col(ts_col).alias("_t1")
    )
    conv = (
        first_from.join(to_ev, user_col)
        .filter(F.col("_t1") >= F.col("_t0"))
        .groupBy(user_col)
        .agg(
            (
                F.unix_timestamp(F.min("_t1")) - F.unix_timestamp(F.first("_t0"))
            ).alias("latency_s")
        )
    )
    n_started = first_from.agg(F.count(F.lit(1)).alias("n_started"))
    aggs = [
        F.round(F.expr(f"percentile(latency_s, {q})"), 4).alias(
            f"p{int(round(q * 100))}_latency_s"
        )
        for q in quantiles
    ]
    return (
        conv.agg(F.count(F.lit(1)).alias("n_converted"), *aggs)
        .crossJoin(F.broadcast(n_started))
        .select(
            "n_started",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_started"), 4).alias(
                "conversion_rate"
            ),
            *[f"p{int(round(q * 100))}_latency_s" for q in quantiles],
        )
    )
