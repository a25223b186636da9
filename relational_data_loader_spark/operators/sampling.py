"""Deterministic hash-based sampling — the training-data downsampler.

A 100 TB corpus is never fed to training whole: dominant languages/sources
are downsampled to a target mix. ``df.sample()`` is non-deterministic
across retries and cluster layouts (seeded per-partition, so a repartition
changes the draw); these samplers decide per ROW from a content hash, so
the same row is kept or dropped on every run, on any cluster, at any
parallelism — which is what makes sampled pipelines replayable and
oracle-checkable. All JVM-side codegen (md5 + conv), no shuffle: the
sample is a narrow filter that pushes work-reduction to the earliest
possible point in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# uniform u32 from the first 8 hex chars of md5 — reproducible in any
# engine with md5 (DuckDB oracle included)
_U32_SPAN = float(2**32)


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from a key column: first 8 md5 hex chars
    as a 32-bit integer / 2^32. Content-derived — independent of
    partitioning, ordering, and retries."""
    u32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return u32 / F.lit(_U32_SPAN)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    key_col: str,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the row's
    OWN key hash: ``hash_uniform(key) < rate[stratum]``.

    Per-stratum rates rebalance a skewed corpus (e.g. keep 20% of dominant
    'en', 80% of everything else). Filter-only plan: no shuffle, no sort,
    no state — at scale the filter sits directly on the scan and every
    downstream stage sees only the sampled fraction.
    """
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(hash_uniform(F.col(key_col)) < rate)
