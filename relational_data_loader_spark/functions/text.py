"""Text-analysis column functions for training-data pipelines.

All pure JVM-side Column expressions (whole-stage codegen; no Python in the
hot path): tokenization, token counting, quality scoring, stopword-based
language scoring, and document fingerprinting. These extend the engine
beyond the reference (which has no expression surface at all — SURVEY.md
§2.2 "Scalar functions") toward the ops a 100 TB text-ingest pipeline needs.

Determinism note: everything here reduces to lower/regexp/split/md5, which
behave identically in Spark and DuckDB — required for the driver's
side-by-side oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize(col: Column) -> Column:
    """Canonical text form used for fingerprints: lowercase + collapse ws."""
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(normalize(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(col))


def alpha_ratio(col: Column) -> Column:
    """Quality feature: fraction of characters that are ASCII letters/space."""
    return F.round(
        F.length(F.regexp_replace(col, "[^a-zA-Z ]", ""))
        / F.length(col),
        4,
    ).cast("double")


def stopword_count(tok: Column, stopwords: list[str]) -> Column:
    """Count of tokens in the stopword list (use after explode)."""
    return F.count(F.when(tok.isin(stopwords), 1))
