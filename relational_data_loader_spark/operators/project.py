"""Column mapping: projection + rename + cast + vectorized transforms.

Reference: the model JSON ``columns[]`` mapping applied in the generated
SELECT (only mapped columns leave the source) and pandas-side casting
(``modules/BatchDataLoader.py``; SURVEY.md §2.1 P1/P2). In Spark the
select/alias/cast below is column-pruned into the parquet scan by Catalyst,
so the reference's hand-rolled projection pushdown comes for free.

Transforms are the engine's single user extension point (the reference has
none): named, Arrow-vectorized functions from
``relational_data_loader_spark.functions.registry`` — never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from relational_data_loader_spark.spec import IngestSpec


def project_cast(df: DataFrame, spec: IngestSpec, include_envelope: bool = True) -> DataFrame:
    """Apply the spec's column mapping to a change batch or snapshot scan.

    Keeps the (lsn, op) envelope columns when present and requested; maps
    each spec column ``source -> destination`` with a cast to the declared
    type and the optional named transform.
    """
    from relational_data_loader_spark.functions.registry import get_transform

    cols: list[Column] = []
    if include_envelope:
        for env in (spec.lsn_column, spec.op_column):
            if env in df.columns:
                cols.append(F.col(env))
    for c in spec.columns:
        expr = F.col(c.source).cast(c.spark_type)
        t = spec.transforms.get(c.destination)
        if t:
            expr = get_transform(t)(expr)
        cols.append(expr.alias(c.destination))
    return df.select(*cols)
