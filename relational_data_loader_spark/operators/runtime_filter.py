"""Runtime bloom-filter semi-join pruning: shrink the fact side of a
shuffle join BEFORE the exchange, using a compact bloom built from the dim
side's join keys.

The scale problem this solves: ``fact ⋈ dim`` where the dim side is
selective (a filter keeps few keys) but still too many DISTINCT keys for a
broadcast hash join or an ``isin`` literal list (10^7–10^8 keys at
cluster scale). Catalyst's own answers each fall short somewhere:

- broadcast join: capped by ``autoBroadcastJoinThreshold``; a 10^8-key dim
  side is GBs.
- Spark's runtime bloom (``spark.sql.optimizer.runtime.bloomFilter.*``):
  the right default, but it only fires within one query's plan and its
  trigger heuristics (creation-side size thresholds) routinely pass on
  mid-sized dims; this operator is the explicit, always-on form, and the
  built filter is REUSABLE across queries in a session (build once, apply
  to every fact scan that joins the same keys — the IVM/backfill loop).

Mechanics: one pass over dim keys fans each into k bit positions
(xxhash64 double-hashing — build and probe are both JVM-side here, so no
cross-runtime hash constraint; contrast ``operators/bloom.py``, whose
manifest blooms must also be probed by the DRIVER and therefore pay for
md5), reduced via ``bit_or`` partial aggregation to m/64 longs — the
collect is O(m), never O(keys). The probe is a pure whole-stage-codegen
predicate over a literal word array, pushed below the fact's exchange, so
every pruned row saves its shuffle write+read+sort. False positives pass
the probe and are dropped by the real join — results are EXACTLY the
plain join's for any m/k, which is what the oracle pairing checks.

For very large filters a literal array stops being reasonable codegen
(the expression tree embeds m/64 constants); past ``_LITERAL_MAX_WORDS``
the probe switches to an Arrow-batched pandas UDF over a broadcast numpy
bitmap — positions are still computed JVM-side, Python only indexes the
bitmap, so the crossing stays vectorized.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_semi_filter"]

_SEED1 = 0x5EED_0001
_SEED2 = 0x5EED_0002

# beyond this the literal-array expression is larger than the win; 2^13
# words = 2^19 bits ≈ 65 KB of constants
_LITERAL_MAX_WORDS = 8192


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """Kirsch–Mitzenmacher double hashing on xxhash64: k positions from
    two seeded hashes, ``pmod`` because xxhash64 is signed."""
    h1 = F.xxhash64(col, F.lit(_SEED1))
    h2 = F.xxhash64(col, F.lit(_SEED2)).bitwiseOR(F.lit(1))
    # pmod each TERM before combining so h1 + i*h2 cannot overflow a long
    # (each term is then < 2^20-ish, far below 2^63)
    h1m = F.pmod(h1, F.lit(m_bits))
    h2m = F.pmod(h2, F.lit(m_bits))
    return [
        F.pmod(h1m + F.lit(i) * h2m, F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_semi_filter(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> tuple[DataFrame, dict[str, Any]]:
    """Return ``(fact rows that MIGHT join dim_keys, build stats)``.

    ``dim_keys`` is the already-filtered dim side (only its ``dim_key``
    column is read). The returned frame is a superset of the joining fact
    rows — follow it with the real join; never treat it as the join
    itself. ``m_bits`` must be a multiple of 64; size it at ~10 bits per
    expected distinct dim key (FP ≈ 1% at k=3–4; a false positive costs
    one shuffled row, not a wrong result).

    The build is one partial-aggregated pass over dim keys (the classic
    two-phase bit_or: map-side combine leaves ≤ m/64 rows per partition)
    and collects exactly ``m_bits/64`` longs — driver memory is O(filter
    size) no matter how many keys the dim has. Stats report the fill
    ratio so callers can detect an undersized filter (fill → 1 means the
    probe passes everything and the operator degrades to a no-op, never
    to a wrong answer).
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    dk = dim_key or fact_key
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(dk), m_bits, k))).alias("pos")
    rows = (
        dim_keys.where(F.col(dk).isNotNull())
        .select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("widx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["widx"]] = r["word"]
    fill = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in words) / m_bits
    stats = {"m_bits": m_bits, "k": k, "fill": round(fill, 4)}

    probe_pos = _positions(F.col(fact_key), m_bits, k)
    if n_words <= _LITERAL_MAX_WORDS:
        # ONE array literal, not F.array(*[F.lit(w) ...]): building m/64
        # Column objects costs one py4j round trip each (~2-4 s of driver
        # time per query at 2048 words — measured r6), while a single
        # typed literal ships the whole word list in one call and codegen
        # references one constant ArrayData. Same values, same probe.
        arr = F.lit(words).cast("array<long>")
        cond = F.col(fact_key).isNotNull()
        for p in probe_pos:
            word = F.element_at(arr, (F.floor(p / 64) + 1).cast("int"))
            cond = cond & (F.getbit(word, p % 64) == F.lit(1))
        return fact.where(cond), stats

    # large-filter path: broadcast a numpy bitmap, probe via a vectorized
    # pandas UDF — positions computed JVM-side, Python only indexes
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    sc = SparkSession.getActiveSession().sparkContext
    bitmap = np.array(
        [w & 0xFFFFFFFFFFFFFFFF for w in words], dtype=np.uint64
    )
    bcast = sc.broadcast(bitmap)

    @pandas_udf("boolean")
    def _might_contain(ps: pd.Series) -> pd.Series:
        bm = bcast.value
        arr = np.stack(ps.to_numpy())  # rows × k positions
        widx = (arr >> 6).astype(np.int64)
        bit = (arr & 63).astype(np.uint64)
        hits = (bm[widx] >> bit) & np.uint64(1)
        return pd.Series(hits.all(axis=1).astype(bool))

    out = (
        fact.where(F.col(fact_key).isNotNull())
        .withColumn("_rdl_bloom_pos", F.array(*probe_pos))
        .where(_might_contain(F.col("_rdl_bloom_pos")))
        .drop("_rdl_bloom_pos")
    )
    return out, stats
