"""Right-to-erasure (GDPR) cascade over a foreign-key chain.

A CDC ingest pipeline's delete stream answers "which keys were erased at
the source"; this operator answers the downstream question: "what does
honoring those erasures do to every DERIVED table?" Given a set of erased
root keys and an ordered FK chain (root → child → grandchild …), it
computes, per table, how many rows the cascade removes and how many
survive — the audit artifact a deletion run has to produce before (and
after) it rewrites data.

Scale shape: the erased-key set is the *distinct deleted keys* of a CDC
window — orders of magnitude smaller than any fact table — so every
cascade step is a broadcast semi/anti join against it (no fact-table
shuffle anywhere; each table is scanned once with only its join key
read). The child step derives the *child's* erased keys (e.g. orderkeys
of erased customers) as a new small frame before descending, so the
grandchild join is again key-vs-keys, never fact-vs-fact. If the erased
set ever outgrows broadcast range (a mass-erasure event), Spark's AQE
falls back to a shuffle join on the same plan — the semantics don't
change, only the strategy.

Reference locus: RDL applies source deletions to its single destination
table (SURVEY.md §2.1 W2); the cascade is the multi-table generalization
a relational destination needs for referential integrity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def erasure_report(
    erased_keys: DataFrame,
    tables: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Audit the cascade of ``erased_keys`` through ``tables``.

    ``erased_keys``: single-column DataFrame of root keys to erase.
    ``tables``: ordered ``(table_name, df, key_col)`` list; the FIRST
    entry's ``key_col`` must match the erased-key column semantics, and
    each subsequent entry joins on keys *derived* by ``derive`` below —
    callers chain with :func:`cascade_keys` for multi-hop chains.

    Returns one row per table: ``(table_name, rows_erased, rows_kept)``.
    """
    keys = erased_keys.toDF("k").distinct()
    reports = []
    for name, df, key_col in tables:
        hit = F.col(key_col).eqNullSafe(F.col("k"))
        joined = df.join(F.broadcast(keys), hit, "left")
        rep = joined.agg(
            F.lit(name).alias("table_name"),
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("rows_erased"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("rows_kept"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def cascade_keys(
    parent_keys: DataFrame, child: DataFrame, fk_col: str, pk_col: str
) -> DataFrame:
    """Derive the next hop's erased-key set: primary keys of ``child``
    rows whose ``fk_col`` references an erased parent key.

    Broadcast semi join → project the child PK → distinct. The result is
    again a small keys-only frame, so the cascade stays broadcast-shaped
    at every depth.
    """
    keys = parent_keys.toDF("k").distinct()
    return (
        child.join(F.broadcast(keys), child[fk_col] == F.col("k"), "left_semi")
        .select(pk_col)
        .distinct()
    )
