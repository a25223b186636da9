"""rdl-spark: a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``pageuppeople-opensource/relational-data-loader`` (a single-threaded
MS-SQL Change-Tracking -> PostgreSQL batch copier; see SURVEY.md) as an
idiomatic Spark engine:

- declarative ingest specs (mirror of the reference's JSON model configs),
- LSN-ordered change-log sources (batch + Structured Streaming),
- last-writer-wins netting + MERGE-style upsert/delete apply,
- atomic snapshot sink with exactly-once commit manifests,
- per-partition watermarks + lineage/metrics (`_rdl_state`),
- additive/rename schema evolution with forced-full-refresh fallback,
- vectorized (Arrow) text normalization; no per-row Python in the hot path.

Reference citations in docstrings use the ``modules/<File>.py::<symbol>``
convention from SURVEY.md §0 (the mounted reference checkout is empty, so
no file:line is possible).
"""

from relational_data_loader_spark.spec import ColumnSpec, IngestSpec

__all__ = ["ColumnSpec", "IngestSpec"]
__version__ = "0.1.0"
