"""Distributed 2-D skyline (Pareto frontier) query.

``skyline_2d`` returns the rows not *strictly dominated* by any other row,
maximizing one column and minimizing the other — the classic "best
price/date trade-offs" query that naive SQL writes as a ``NOT EXISTS``
self-join, i.e. an O(n²) nested-loop at scale.

Scale shape (the reason this is an operator and not a query):

1. **Map-side local prune, zero shuffle.** A row dominated inside its own
   Arrow batch is dominated globally, so a vectorized per-batch skyline
   (``mapInPandas`` + numpy argsort/cummin) discards the overwhelming
   majority of rows before anything moves. For uniformly random 2-D data
   the expected skyline of a batch of b rows is O(ln b), so the survivor
   set entering the shuffle is ~partitions × ln(batch) — thousands of
   rows out of billions. No correctness risk: pruning only ever removes
   dominated rows.
2. **Exact global stage on the survivor set.** Distinct (max,min) pairs
   (one small shuffle), then the sort-cummin sweep: order pairs by
   max DESC / min ASC; a pair is on the frontier iff its min is strictly
   below the running min of everything ordered before it. The global
   window is a single partition by construction — acceptable because the
   input is the pruned pair set, and the skyline itself must fit on one
   node to be returned anyway (documented trade-off: an adversarially
   anti-correlated input whose *frontier* is billions of rows needs a
   different contract entirely).
3. Survivor pairs semi-join back to the pruned rows to recover full rows
   (ties included: identical (max,min) points do not dominate each other,
   so all rows carrying a frontier pair are returned).

Dominance: A dominates B iff A.max_col >= B.max_col AND
A.min_col <= B.min_col AND they differ in at least one of the two.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_prune(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """Per-Arrow-batch skyline prune via mapInPandas — removes rows
    dominated within their own batch without shuffling anything."""
    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            # sort by max DESC then min ASC; a row survives iff its min is
            # strictly below the running min of all rows before it, OR it
            # ties the running min AND ties the max of the row that set it
            # (identical pairs never dominate each other). Keeping ALL
            # equal-pair rows is required for exactness; keeping the rare
            # "min ties but max lower" row is a harmless over-keep — the
            # global exact stage removes it.
            srt = pdf.sort_values(
                [max_col, min_col], ascending=[False, True], kind="mergesort"
            )
            mins = srt[min_col].to_numpy()
            cummin = pd.Series(mins).cummin().to_numpy()
            keep = mins <= cummin  # <= (not <): over-keep ties, never drop
            yield srt[keep]

    return df.mapInPandas(prune, schema=schema)


def skyline_2d(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """Exact skyline of ``df``: rows not strictly dominated under
    (maximize ``max_col``, minimize ``min_col``). Null rows in either
    dimension are excluded (null is not comparable)."""
    base = df.filter(F.col(max_col).isNotNull() & F.col(min_col).isNotNull())
    pruned = _local_prune(base, max_col, min_col)

    pairs = pruned.select(max_col, min_col).distinct()
    w = Window.orderBy(F.col(max_col).desc(), F.col(min_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        pairs.withColumn("_prev_min", F.min(min_col).over(w))
        .filter(
            F.col("_prev_min").isNull() | (F.col(min_col) < F.col("_prev_min"))
        )
        .drop("_prev_min")
    )
    return pruned.join(F.broadcast(frontier), [max_col, min_col], "left_semi")
