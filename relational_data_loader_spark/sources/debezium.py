"""Debezium-style JSON change-event envelope source.

The reference tails MS-SQL Change Tracking, whose envelope is a flat
CHANGETABLE row (SURVEY.md §1.1). The industry-standard wire format for the
same binlog/WAL tail is the Debezium envelope — one JSON document per change
event:

    {"op": "c"|"r"|"u"|"d", "ts_ms": <millis>,
     "before": {<row image>}|null, "after": {<row image>}|null,
     "source": {"lsn": <monotone change version>, ...}}

This module maps that envelope onto the engine's change schema
(``IngestSpec.change_schema()``: lsn, op, pk..., nullable payload...) with
pure JVM expressions — one ``from_json`` against a spec-derived struct
schema, then column extraction:

- op: ``c`` (create) and ``r`` (snapshot read) → the spec's first upsert op
  (I); ``u`` → U; ``d`` → the delete op. Anything else fails the load loudly
  (same FAILFAST stance as the csv conventions in sources/readers.py).
- lsn: ``source.lsn`` — Debezium's guaranteed per-source monotone version
  (for MySQL sources deployments map file+pos into it upstream).
- primary keys: ``after`` image, falling back to ``before`` — a delete
  carries its keys only in ``before``.
- payload: ``after`` only, so deletes land with NULL payload exactly like a
  CHANGETABLE row left-joined to a deleted base row (change_schema contract).
- Kafka-style tombstones (null/empty value) are dropped: they are a
  compaction hint, not a change event — the engine's deletes are the ``d``
  envelopes themselves.

Scale note: parsing is a single whole-stage-codegen projection per event —
no shuffle, no Python — so a 10^10-event replay pays only the scan plus the
JSON parse, and Spark's JacksonParser is column-pruned by the extraction
(only fields named in the spec are materialized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relational_data_loader_spark.spec import IngestSpec

# Debezium op codes → engine op classification
_DBZ_CREATE_OPS = ("c", "r")  # create / snapshot-read both materialize a row
_DBZ_UPDATE_OP = "u"
_DBZ_DELETE_OP = "d"


def envelope_schema(spec: IngestSpec) -> T.StructType:
    """from_json target: the Debezium envelope with spec-typed row images.

    Timestamp fields parse as STRINGS and cast afterwards: from_json's
    pattern-based formatter silently truncates sub-millisecond fractions
    (measured: ``.963378`` → ``.963000`` under the default format), while
    the string→timestamp cast accepts any fraction length — and a
    transcript feed's event times are microsecond-grained."""
    row_image = T.StructType(
        [
            T.StructField(
                c.source,
                T.StringType()
                if isinstance(c.spark_type, T.TimestampType)
                else c.spark_type,
                True,
            )
            for c in spec.columns
        ]
    )
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("before", row_image, True),
            T.StructField("after", row_image, True),
            T.StructField(
                "source",
                T.StructType([T.StructField("lsn", T.LongType(), True)]),
                True,
            ),
        ]
    )


def _map_op(env: Column, spec: IngestSpec) -> Column:
    """Debezium op code → the spec's op vocabulary, loud on anything else."""
    insert_op = spec.upsert_ops[0]
    update_op = spec.upsert_ops[-1]
    return (
        F.when(env["op"].isin(*_DBZ_CREATE_OPS), F.lit(insert_op))
        .when(env["op"] == _DBZ_UPDATE_OP, F.lit(update_op))
        .when(env["op"] == _DBZ_DELETE_OP, F.lit(spec.delete_op))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("debezium envelope with unknown op: "), env["op"])
            )
        )
    )


def parse_debezium(
    df: DataFrame, spec: IngestSpec, value_col: str = "value"
) -> DataFrame:
    """Parse a column of Debezium JSON documents into the change schema.

    Returns columns in exactly ``spec.change_schema()`` order:
    (lsn, op, pk..., payload...). Malformed JSON fails the load (FAILFAST);
    tombstones (null / blank value) are filtered out.
    """
    raw = F.col(value_col)
    # tombstones: null value, blank line, or the JSON literal `null` (what a
    # null Kafka message serializes to in a jsonl dump). They must be dropped
    # BEFORE from_json — FAILFAST classifies an all-null record as malformed.
    parsed = df.filter(
        raw.isNotNull() & (F.length(F.trim(raw)) > 0) & (F.trim(raw) != "null")
    ).select(
        F.from_json(raw, envelope_schema(spec), {"mode": "FAILFAST"}).alias("_env")
    )
    env = F.col("_env")
    # a missing source.lsn parses to NULL (FAILFAST only rejects unparseable
    # JSON, not absent fields) and a NULL lsn would be *silently dropped* by
    # every downstream range filter — e.g. a MySQL feed whose file+pos was
    # never mapped to lsn (module docstring). Fail the load instead.
    lsn = F.when(
        env["source"]["lsn"].isNotNull(), env["source"]["lsn"]
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("debezium envelope without source.lsn (op="),
                F.coalesce(env["op"], F.lit("null")),
                F.lit(")"),
            )
        ).cast("long")
    )
    cols = [
        lsn.alias(spec.lsn_column),
        _map_op(env, spec).alias(spec.op_column),
    ]
    for c in spec.columns:
        if c.primary_key:
            # deletes carry keys only in the before image
            expr = F.coalesce(env["after"][c.source], env["before"][c.source])
        else:
            # payload NULL on delete — the change_schema contract
            expr = env["after"][c.source]
        # lands string-parsed timestamp fields (envelope_schema) on the
        # spec type; a no-op for already-typed fields
        cols.append(expr.cast(c.spark_type).alias(c.source))
    return parsed.select(*cols)
