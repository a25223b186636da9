"""Z-order (Morton) data layout — multi-column data skipping.

A PK-sorted compaction (sinks/snapshot.py ``optimize``) makes parquet
min/max stats prune on ONE leading column; queries filtering on a second
column still read every file. Z-ordering interleaves the bits of several
columns' range-bucket ids so that files (= contiguous z-ranges) stay
rectangular-ish in EVERY interleaved dimension — the layout Delta/Iceberg
``OPTIMIZE ... ZORDER BY`` rewrites produce, re-expressed here as plain
column arithmetic so Catalyst codegens it and any engine can replay it.

Determinism contract (what makes the layout oracle-checkable, unlike
Delta's reservoir-sampled range IDs): bucket ids come from EXACT min/max
scaling with true integer division (SQL ``div``, never FP ``floor(a/b)``
— a quotient like ``k + 1 − 1/span`` sits within a double ulp of ``k+1``
for large spans and would mis-floor), and the file id is a fixed-width
prefix of the z-code (``z >> shift``), not a sampled range partitioner.
Same input → same file assignment, bit-for-bit, in any engine.

Scale shape: one 1-row min/max aggregate per layout decision
(control-plane, like the IVF centroid collect), then the z-code is a pure
projection; the physical move is ONE ``repartitionByRange``/local-sort on
the z-code — the same single shuffle a linear sort-compaction pays, so
z-ordering is free at write time relative to any sorted rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_code_expr(buckets: list[Column], bits: int) -> Column:
    """Morton interleave of ``len(buckets)`` range-bucket ids, ``bits``
    bits each: output bit ``j·ndims + d`` is bit ``j`` of dimension ``d``.
    Unrolled into ``bits × ndims`` shift/mask terms — all inside one
    whole-stage-codegen projection, no UDF.
    """
    ndims = len(buckets)
    z = F.lit(0).cast("bigint")
    for d, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * ndims + d))
    return z


def zorder_assign(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Append ``zcode`` and ``file_id`` columns: ``file_id`` is the
    ``log2(n_files)``-bit prefix of the z-code — the deterministic file
    assignment a z-order rewrite uses (files = equal-width z-ranges).

    ``ranges`` maps column → (min, max); when omitted they are computed
    with ONE 1-row aggregate (control-plane collect, same class as the
    IVF centroid literals — at 10^10 rows this is a full-scan agg the
    caller should amortize by passing known ranges, e.g. from the table
    profile stats the engine already maintains). Values outside a stated
    range clamp into the edge buckets, so stale profiled ranges degrade
    locality, never correctness.
    """
    n_bits_total = bits * len(cols)
    fbits = max(1, (n_files - 1).bit_length())
    if n_files != 1 << fbits:
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    if fbits > n_bits_total:
        raise ValueError(
            f"n_files=2^{fbits} exceeds the z-code's {n_bits_total} bits"
        )
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        ranges = {c: (int(row[f"_mn_{c}"]), int(row[f"_mx_{c}"])) for c in cols}

    out = df
    bucket_names = []
    for i, c in enumerate(cols):
        cmin, cmax = int(ranges[c][0]), int(ranges[c][1])
        span = cmax - cmin + 1
        sc, bk = f"_rdl_zsc_{i}", f"_rdl_zbk_{i}"
        out = out.withColumn(
            sc, (F.col(c).cast("bigint") - F.lit(cmin)) * F.lit(1 << bits)
        )
        # clamp AFTER the div: sub-range values floor toward 0 / top bucket
        out = out.withColumn(
            bk,
            F.greatest(
                F.lit(0).cast("bigint"),
                F.least(
                    F.lit((1 << bits) - 1).cast("bigint"),
                    F.expr(f"{sc} div {span}"),
                ),
            ),
        )
        bucket_names.append(bk)
    z = zorder_code_expr([F.col(b) for b in bucket_names], bits)
    out = out.withColumn("zcode", z).withColumn(
        "file_id",
        F.shiftright(F.col("zcode"), n_bits_total - fbits).cast("int"),
    )
    return out.drop(
        *[f"_rdl_zsc_{i}" for i in range(len(cols))], *bucket_names
    )


def zorder_file_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Per-file row count and min/max extents of every z-ordered column —
    the parquet footer stats a scan's data-skipping actually reads. The
    audit that justifies the layout: under z-order EVERY dimension's
    per-file span is ~domain·n_files^(−1/ndims), so a predicate on ANY of
    the columns prunes most files; under a linear sort only the leading
    column's spans shrink. One groupBy(file_id) over a projection.
    """
    assigned = zorder_assign(df, cols, bits=bits, n_files=n_files, ranges=ranges)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return assigned.groupBy("file_id").agg(*aggs)


def zorder_skipping_gain(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """The layout decision in one row per dimension: mean normalized
    per-file span of each column under (a) the z-order assignment and
    (b) a linear sort on the FIRST column (the status-quo compaction),
    using the same equal-count file split. ``span_ratio < 1`` on a
    non-leading column is the data-skipping win z-order buys; the leading
    column's ratio > 1 is the price it pays.

    Two groupBys over the same projection (one per layout); file counts
    are identical by construction so the comparison is fair.
    """
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        ranges = {c: (int(row[f"_mn_{c}"]), int(row[f"_mx_{c}"])) for c in cols}

    z_stats = zorder_file_stats(df, cols, bits=bits, n_files=n_files, ranges=ranges)

    # linear baseline: equal-width ranges of the leading column (same
    # deterministic prefix trick, 1 dimension, so both layouts cut the
    # table into n_files deterministic pieces)
    lead = cols[0]
    lin = zorder_assign(
        df, [lead], bits=bits, n_files=n_files, ranges={lead: ranges[lead]}
    )
    lin_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        lin_aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    lin_stats = lin.groupBy("file_id").agg(*lin_aggs)

    def _mean_span(c: str) -> Column:
        dom = float(ranges[c][1] - ranges[c][0] + 1)
        return F.avg(
            (F.col(f"max_{c}") - F.col(f"min_{c}") + F.lit(1)) / F.lit(dom)
        ).alias(f"s_{c}")

    # ONE aggregate per layout (a per-column agg loop would re-run each
    # layout's whole groupBy once per column); 2 single-row collects total
    z_row = z_stats.agg(*[_mean_span(c) for c in cols]).collect()[0]
    l_row = lin_stats.agg(*[_mean_span(c) for c in cols]).collect()[0]
    rows = [
        (c, float(z_row[f"s_{c}"]), float(l_row[f"s_{c}"])) for c in cols
    ]
    spark = df.sparkSession
    out = spark.createDataFrame(rows, ["col_name", "zorder_span", "linear_span"])
    return out.select(
        "col_name",
        F.round("zorder_span", 4).cast("double").alias("zorder_span"),
        F.round("linear_span", 4).cast("double").alias("linear_span"),
        F.round(F.col("zorder_span") / F.col("linear_span"), 4)
        .cast("double")
        .alias("span_ratio"),
    )
