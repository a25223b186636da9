"""Named vectorized transforms — the engine's single extension point.

The reference has no user extension surface at all (SURVEY.md §2.2 "UDF
surface"); its only per-column behavior is declarative type casting. The
north_star adds exactly one: per-event decode / text normalization, and
mandates it runs as vectorized pandas/Arrow UDFs or native DataFrame ops —
no per-row Python. Transforms registered here take and return a Column;
anything that crosses into Python does so via ``pandas_udf`` (Arrow batch
transfer), and anything expressible JVM-side stays JVM-side.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_REGISTRY: dict[str, Callable[[Column], Column]] = {}


def register_transform(name: str) -> Callable:
    def deco(fn: Callable[[Column], Column]) -> Callable[[Column], Column]:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_transform(name: str) -> Callable[[Column], Column]:
    if name not in _REGISTRY:
        raise KeyError(f"unknown transform {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


# ---------------------------------------------------------------------------
# built-ins


@pandas_udf(StringType())
def _nfc_normalize(s: pd.Series) -> pd.Series:
    # Arrow-batched: one Python call per ~10k-row batch, string kernel inside.
    # NFC has no JVM builtin, so this is the one legitimate Python crossing.
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


@register_transform("normalize_text")
def normalize_text(col: Column) -> Column:
    """Unicode NFC + whitespace collapse + trim.

    The whitespace collapse and trim stay JVM-side (regexp_replace inside
    whole-stage codegen); only the NFC step crosses to Python, Arrow-batched.
    """
    return F.trim(F.regexp_replace(_nfc_normalize(col), r"\s+", " "))


@register_transform("whitespace_collapse")
def whitespace_collapse(col: Column) -> Column:
    """Pure-JVM variant: collapse runs of whitespace and trim (no NFC)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


@register_transform("lowercase")
def lowercase(col: Column) -> Column:
    return F.lower(col)
