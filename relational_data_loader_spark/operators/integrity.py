"""Referential-integrity audit across replicated tables.

A CDC pipeline replicating many tables gives no cross-table ordering
guarantee unless the consistent-cut reader (queries.q_cdc_consistent_cut)
is used, so child rows routinely land before their parents. The audit
every operator of such a warehouse schedules is the FK orphan scan this
module implements: per declared relationship, how many child rows
reference a parent key that does not (yet) exist.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FkRelation:
    """One declared child.fk -> parent.pk edge, named for the report."""

    name: str
    child: DataFrame
    child_key: str
    parent: DataFrame
    parent_key: str


def fk_orphan_audit(spark: SparkSession, relations: list[FkRelation]) -> DataFrame:
    """One report row per relation: child row count, NULL-FK rows (not
    orphans — a NULL reference references nothing), orphan rows (non-NULL
    FK with no matching parent key), distinct orphan key count, and the
    orphan ratio over non-NULL references (4dp).

    Plan per relation, sized for 10^11-row children: the parent
    collapses to its DISTINCT key column first (column-pruned scan +
    one agg — at 100 TB the parent's key set is the small side, and AQE
    broadcasts it when it fits), then ONE left join + ONE aggregate
    over the child's key column classifies every child row; no second
    scan for the totals, no anti-join followed by a separate count.
    Relations are independent report rows unioned at the end (each ~1
    row, so the union is control-plane).
    """
    reports = []
    for r in relations:
        pk = (
            r.parent.select(F.col(r.parent_key).alias(r.child_key))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        ck = F.col(r.child_key)
        orphan = ck.isNotNull() & F.col("_hit").isNull()
        reports.append(
            r.child.select(r.child_key)
            .join(pk, r.child_key, "left")
            .agg(
                F.lit(r.name).alias("relation"),
                F.count(F.lit(1)).alias("child_rows"),
                F.count(F.when(ck.isNull(), 1)).alias("null_fk_rows"),
                F.count(F.when(orphan, 1)).alias("orphan_rows"),
                F.count_distinct(F.when(orphan, ck)).alias("orphan_keys"),
                F.round(
                    F.count(F.when(orphan, 1))
                    / F.greatest(F.count(F.when(ck.isNotNull(), 1)), F.lit(1)),
                    4,
                ).alias("orphan_ratio"),
            )
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out
