"""Last-writer-wins netting of a raw change batch.

The reference never implements this: SQL Server's ``CHANGETABLE(CHANGES …)``
returns *net* changes per PK server-side, so the reference's staged batch
already has one row per key (``modules/data_sources/MsSqlDataSource.py``
change select — SURVEY.md §1.3 invariant 2). Our engine tails a *raw*
LSN-ordered log, so netting is an explicit operator.

Spark-first design notes (scale):
- ``max_by(struct(...), lsn)`` instead of a window ``row_number``: max_by is
  a declarative aggregate with **map-side partial aggregation**, so a hot
  (conv_id, turn_idx) key is pre-combined inside each input partition before
  the shuffle — a window would ship every duplicate through the shuffle and
  sort it. This is the skew story for netting; the PK is fine-grained
  (conv_id AND turn_idx), so even a hot conversation spreads over its turns.
- The LWW + delete interplay (SURVEY.md §7.3): ``I..U..D`` in one batch must
  net to the max-LSN op. Netting keeps op in the struct and branches *after*
  picking the winner — never "any delete wins".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def net_changes(
    df: DataFrame,
    primary_keys: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Reduce a change batch to one winning row per primary key.

    Input: change envelopes ``(lsn, op, pk..., payload...)``; output: one row
    per PK carrying the max-lsn event's op + payload. Ties are impossible
    (lsn is unique); if the input ever had duplicate lsns per PK the result
    is an arbitrary one of them, matching MERGE's requirement of a unique
    source key.
    """
    other = [c for c in df.columns if c not in set(primary_keys)]
    packed = F.max_by(F.struct(*[F.col(c) for c in other]), F.col(lsn_col))
    return (
        df.groupBy(*primary_keys)
        .agg(packed.alias("_w"))
        .select(*primary_keys, "_w.*")
    )
