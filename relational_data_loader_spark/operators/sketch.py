"""Deterministic cardinality sketches.

``approx_count_distinct`` (HLL++) is the right tool at 100 TB, but its
estimates are engine-specific — useless for cross-engine verification and
awkward for reproducible pipelines. KMV (k-minimum-values) gives the same
mergeable, bounded-state estimate while being DETERMINISTIC by
construction: hash every value to a uniform in (0,1) with md5 (bit-equal
in any engine), keep each group's k smallest distinct hashes, estimate
distinct = (k-1)/h_k. Standard error ≈ 1/√(k−2) (~13% at k=64); groups
with fewer than k distinct values return the exact count (the sketch IS
the distinct set there).

Scale shape: the hash projection stays in codegen; the distinct on
(group, hash) is one shuffle with map-side combine; the per-group top-k
is a rank window on the SAME key (Catalyst plans a WindowGroupLimit, so
each map partition forwards at most k rows per group — the sort never
sees the full distinct set). State per group is k doubles — mergeable by
keeping the k smallest of a union, which is why KMV sketches can be
rolled up across partitions/days without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_56 = float(1 << 56)


def uniform_hash(col: Column) -> Column:
    """Deterministic uniform(0,1) from md5's first 56 bits — the same
    construction both engines compute bit-identically (see
    operators/reconcile.py for the integer variant)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("double") / _TWO_56
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group KMV distinct estimate next to the exact count and the
    signed relative error — the audit row that justifies swapping exact
    count-distinct for the sketch at scale.

    Returns (group, n_exact, n_estimate, rel_error). ``n_estimate`` is
    exact when the group holds fewer than k distinct values.
    """
    u = uniform_hash(F.col(value_col))
    hashed = df.select(F.col(group_col).alias("g"), u.alias("u")).distinct()
    w = Window.partitionBy("g").orderBy("u")
    topk = hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    est = F.when(
        F.max("rk") < k, F.max("rk").cast("double")
    ).otherwise(F.round((F.lit(float(k - 1))) / F.max("u"), round_dp))
    agg = topk.groupBy("g").agg(est.alias("n_estimate"))
    exact = hashed.groupBy("g").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(agg, "g")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            "n_estimate",
            F.round(
                (F.col("n_estimate") - F.col("n_exact")) / F.col("n_exact"),
                round_dp,
            ).alias("rel_error"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch (deterministic, mergeable frequency estimation)

_CMS_SALTS = "pqrstuvwxyz"


def _cms_cell(salt: str, col: Column, w: int) -> Column:
    """Row-``salt``'s column index for a value: first 32 md5 bits mod w —
    the same engine-agnostic uniform-hash family every sketch here uses."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % w).cast("int")


def cms_cells(
    df: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Build a count-min sketch over a value column: ``d × w`` cells of
    ``(hash_row, cell, n)`` — frequency estimation in O(d·w) state where
    exact per-value counting needs O(distinct values).

    Why it earns its place next to KMV: the sketch is MERGEABLE (cell-wise
    sum — roll up partition/daily sketches without rescanning) and
    DETERMINISTIC (md5 rows, not engine-seeded hashes), so two engines —
    or two clusters — build bit-identical sketches. Estimate error is the
    classic CM bound: overestimate only, ≤ ⌈e·N/w⌉ with prob 1−e^−d.

    Plan: one scan; the d row-indices per value are an inline array of
    structs exploded in the same projection (a per-row union of d
    projections would rescan the input d times); ONE groupBy on
    (hash_row, cell) with map-side partial aggregation — at any corpus
    size the shuffle carries ≤ d·w partial cells per map task.
    """
    salts = _CMS_SALTS[:d]
    v = F.col(value_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("hash_row"), _cms_cell(s, v, w).alias("cell")
            )
            for i, s in enumerate(salts)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.hash_row").alias("hash_row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    cells: DataFrame, items: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-query the sketch for each item: min over the item's d cells
    (the CM estimator). ``items`` is query-time small — its d cell ids per
    item broadcast-join against the ≤ d·w sketch cells, so the lookup
    never touches the original corpus.
    """
    salts = _CMS_SALTS[:d]
    v = F.col(value_col)
    probes = items.select(
        v.alias("_item"),
        *[
            _cms_cell(s, v, w).alias(f"_c{i}")
            for i, s in enumerate(salts)
        ],
    )
    est = None
    out = probes
    for i in range(d):
        cell_i = cells.filter(F.col("hash_row") == i).select(
            F.col("cell").alias(f"_c{i}"), F.col("n").alias(f"_n{i}")
        )
        out = out.join(F.broadcast(cell_i), f"_c{i}", "left")
        ni = F.coalesce(F.col(f"_n{i}"), F.lit(0))
        est = ni if est is None else F.least(est, ni)
    return out.select(
        F.col("_item").alias(value_col), est.alias("cms_estimate")
    )


def cms_frequency_audit(
    df: DataFrame,
    value_col: str,
    k: int = 30,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """The audit row that justifies swapping exact heavy-hitter counting
    for the sketch: the top-``k`` values by exact count next to their CM
    estimates and the overestimate (≥ 0 by construction — an estimate
    BELOW exact means the sketch is broken, pinned in tests).

    Rank ties break on the value itself so both engines pick the same
    top-k when counts tie.
    """
    exact = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("exact_count"))
    topk = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("exact_count"), F.asc(value_col))
            ),
        )
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
    cells = cms_cells(df, value_col, d=d, w=w)
    est = cms_estimate(cells, topk.select(value_col), value_col, d=d, w=w)
    return topk.join(est, value_col).select(
        value_col,
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


def kmv_merge_rollup(
    df: DataFrame,
    group_col: str,
    unit_col,
    value_col: str,
    k: int = 64,
    round_dp: int = 4,
) -> DataFrame:
    """Distinct-count rollup FROM stored per-unit sketches — the query
    shape that makes KMV worth materializing: keep one k-hash sketch per
    (group, day) as the day closes, answer "distinct over any period" by
    merging sketches, never rescanning the period's raw rows.

    The merge is LOSSLESS, not approximate-on-approximate: if a hash is
    among a group's global k smallest, then fewer than k group hashes are
    smaller than it, so it is also within the top-k of every unit that
    contains it — hence the k smallest of the union of per-unit top-k sets
    ARE the k smallest of the full union, and the merged estimate equals
    the estimate a from-scratch sketch of the period would give, exactly
    (pinned in tests). Same value on several days dedupes by its hash.

    Plan: the per-unit rank and the merge rank are two WindowGroupLimit
    windows (each map partition forwards ≤ k rows per key); the exact
    count (audit column) is the only full-width aggregate.

    Returns (group, n_units, n_exact, n_estimate, rel_error).
    """
    g = F.col(group_col)
    unit = unit_col if not isinstance(unit_col, str) else F.col(unit_col)
    u = uniform_hash(F.col(value_col))
    hashed = df.select(
        g.alias("g"), unit.alias("unit"), u.alias("u")
    ).distinct()
    w_unit = Window.partitionBy("g", "unit").orderBy("u")
    unit_sk = (
        hashed.withColumn("rk", F.row_number().over(w_unit))
        .filter(F.col("rk") <= k)
        .select("g", "unit", "u")
    )
    n_units = unit_sk.groupBy("g").agg(
        F.count_distinct("unit").alias("n_units")
    )
    w_g = Window.partitionBy("g").orderBy("u")
    merged = (
        unit_sk.select("g", "u")
        .distinct()
        .withColumn("rk", F.row_number().over(w_g))
        .filter(F.col("rk") <= k)
    )
    est = F.when(
        F.max("rk") < k, F.max("rk").cast("double")
    ).otherwise(F.round((F.lit(float(k - 1))) / F.max("u"), round_dp))
    agg = merged.groupBy("g").agg(est.alias("n_estimate"))
    exact = hashed.select("g", "u").distinct().groupBy("g").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        exact.join(agg, "g")
        .join(n_units, "g")
        .select(
            F.col("g").alias(group_col),
            "n_units",
            "n_exact",
            "n_estimate",
            F.round(
                (F.col("n_estimate") - F.col("n_exact")) / F.col("n_exact"),
                round_dp,
            ).alias("rel_error"),
        )
    )


def hist_quantile_rollup(
    df: DataFrame,
    group_col: str,
    unit_col,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    audit_q: float = 0.95,
    round_dp: int = 4,
) -> DataFrame:
    """Quantile rollup FROM stored per-unit histogram sketches — the
    mergeable-quantile complement to kmv_merge_rollup: keep one fixed-bin
    count histogram per (group, day) as the day closes, answer "p50/p95/p99
    over any period" by SUMMING histograms, never rescanning the period's
    raw rows.

    Unlike t-digest (``percentile_approx``'s sketch, whose merge is
    engine-internal and order-sensitive), a fixed-bin histogram's merge is
    elementwise integer addition — associative, deterministic, and
    expressible in any engine, which is what makes the rollup oracle-able.
    Accuracy is bounded by the bin width (hi-lo)/n_bins; values outside
    [lo, hi) clamp into the edge bins, degrading only edge-bin estimates
    (callers size [lo, hi) from the column's profile — table_profile).

    The quantile readout is the classic crossing-bin interpolation: with
    k_q = ceil(q·n), the unique bin where the cumulative count crosses k_q
    contributes est = lo + w·(bin + (k_q − cum_before)/bin_count). k_q is
    an integer rank, so bin choice is FP-noise-immune; q·n is computed in
    identical double arithmetic on both engines.

    Plan shape: sketch build = one groupBy (group, unit, bin) with map-side
    combine (the only pass over raw rows); merge = one groupBy (group, bin)
    over sketch rows (#groups × #units × ≤n_bins of them); readout = one
    window over ≤n_bins rows per group. The exact-percentile audit column
    is a separate full-width sort-based aggregate — audit only, drop it in
    production where the sketch replaces exactly that rescan.

    Returns (group, n_units, n_rows, p{q}_est per q, p{audit}_exact,
    p{audit}_abs_err).
    """
    width = (hi - lo) / float(n_bins)
    v = F.col(value_col)
    bin_expr = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)).cast("bigint"),
                   F.lit(0)),
        F.lit(n_bins - 1),
    )
    unit = F.col(unit_col) if isinstance(unit_col, str) else unit_col
    # stage 1 — the per-unit sketch a pipeline would materialize daily
    sk = (
        df.select(F.col(group_col).alias("g"), unit.alias("unit"),
                  bin_expr.alias("bin"))
        .groupBy("g", "unit", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_units = sk.groupBy("g").agg(F.count_distinct("unit").alias("n_units"))
    # stage 2 — merge: elementwise sum, the whole point of the sketch
    merged = sk.groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    # stage 3 — readout over ≤ n_bins rows per group
    w_cum = Window.partitionBy("g").orderBy("bin")
    w_tot = Window.partitionBy("g")
    cum = (
        merged.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("tot", F.sum("cnt").over(w_tot))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    )
    ests = []
    for q in qs:
        kq = F.ceil(F.lit(float(q)) * F.col("tot"))
        crossing = (F.col("cum_prev") < kq) & (F.col("cum") >= kq)
        est = F.lit(lo) + F.lit(width) * (
            F.col("bin")
            + (kq - F.col("cum_prev")).cast("double") / F.col("cnt")
        )
        ests.append(
            F.round(F.max(F.when(crossing, est)), round_dp)
            .cast("double")
            .alias(f"p{int(round(q * 100))}_est")
        )
    out = cum.groupBy("g").agg(F.max("tot").alias("n_rows"), *ests)
    audit_name = f"p{int(round(audit_q * 100))}"
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.round(F.expr(f"percentile({value_col}, {audit_q})"), round_dp)
        .cast("double")
        .alias(f"{audit_name}_exact")
    )
    est_col = f"{audit_name}_est"
    return (
        out.join(n_units, "g")
        .join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "n_units",
            "n_rows",
            *[f"p{int(round(q * 100))}_est" for q in qs],
            f"{audit_name}_exact",
            F.round(
                F.abs(F.col(est_col) - F.col(f"{audit_name}_exact")), round_dp
            )
            .cast("double")
            .alias(f"{audit_name}_abs_err"),
        )
    )
