"""Deterministic bloom-filter primitives shared by the manifest stats
builder (executor-side, JVM md5) and the point-lookup pruner (driver-side,
hashlib md5).

Design constraints, in order:

- **One hash definition, two runtimes.** File blooms are BUILT by a Spark
  job (so a 100 TB table never funnels column data through the driver) but
  PROBED from the manifest JSON on the driver (so a lookup decides which
  files to open before any Spark job exists). The two sides must therefore
  agree bit-for-bit, which rules out ``xxhash64`` (JVM-only) and Python's
  salted ``hash()``. md5 over the value's canonical string form is the one
  hash both runtimes (and DuckDB, for oracle SQL) share; its cost is paid
  once per row at build time, never on the read path.
- **Kirsch–Mitzenmacher double hashing**: k probe positions derive from
  two 60-bit halves of one digest as ``(h1 + i*h2) mod m`` — one md5 per
  value regardless of k, and the standard result says the false-positive
  bound matches k independent hashes. ``h2`` is forced odd so the stride
  never degenerates to a single position when m is even.
- **Canonical string form** is Spark's ``CAST(col AS STRING)``: integral
  types render exactly like Python's ``str(int)``, strings are identity.
  Fractional/temporal types are rejected by callers rather than risking a
  formatting divergence between runtimes.

The 60-bit halves keep every intermediate below 2^62 (``h1 + (k-1)*h2``
for k ≤ 4), so the arithmetic never overflows a signed long on either
side — no wrap-around to reconcile.
"""

from __future__ import annotations

import base64
import hashlib
import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "BLOOM_K",
    "bloom_positions_expr",
    "bloom_positions_py",
    "bloom_size_bits",
    "pack_words",
    "unpack_words",
    "probe_words",
]

# k=4 with ~10 bits/key sizing gives a ~1.2% per-file false-positive rate
# (1 - e^(-kn/m))^k at m/n=10 — a false positive costs one extra FILE READ
# that the residual filter then empties, never a wrong row, so favoring a
# small k (fewer codegen'd probes) over the FP-optimal k≈7 is the right
# trade for a pruning structure.
BLOOM_K = 4


def bloom_size_bits(n_rows: int, bits_per_key: int = 10) -> int:
    """Bloom size for one file, rounded up to whole 64-bit words with a
    floor of 1024 bits — tiny files should not produce degenerate 2-word
    filters whose FP rate is effectively 1."""
    m = max(1024, int(n_rows) * int(bits_per_key))
    return ((m + 63) // 64) * 64


def _halves_expr(col: Column) -> tuple[Column, Column]:
    hexd = F.md5(col.cast("string").cast("binary"))
    h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hexd, 16, 15), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return h1, h2


def bloom_positions_expr(col: Column, m_bits: int, k: int = BLOOM_K) -> Column:
    """``array<long>`` of the k bloom bit positions for ``col``'s value —
    pure whole-stage-codegen (md5 + conv + arithmetic, no Python)."""
    h1, h2 = _halves_expr(col)
    return F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(int(m_bits)) for i in range(k)]
    )


def bloom_positions_py(value, m_bits: int, k: int = BLOOM_K) -> list[int]:
    """Driver-side twin of :func:`bloom_positions_expr` — same canonical
    string form, same digest halves, same double-hash stride."""
    hexd = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    h1 = int(hexd[:15], 16)
    h2 = int(hexd[15:30], 16) | 1
    return [(h1 + i * h2) % int(m_bits) for i in range(k)]


def pack_words(words: dict[int, int], m_bits: int) -> str:
    """Dense little-endian uint64 packing of a sparse {word_idx: bits}
    map, base64 for JSON manifests (m/8 bytes per file per column — a
    20k-row file at 10 bits/key is ~25 KB before base64)."""
    n = m_bits // 64
    arr = [0] * n
    for idx, bits in words.items():
        arr[int(idx)] = int(bits) & 0xFFFFFFFFFFFFFFFF
    return base64.b64encode(struct.pack(f"<{n}Q", *arr)).decode("ascii")


def unpack_words(b64: str, m_bits: int) -> list[int]:
    n = m_bits // 64
    return list(struct.unpack(f"<{n}Q", base64.b64decode(b64)))


def probe_words(words: list[int], value, m_bits: int, k: int = BLOOM_K) -> bool:
    """Might-contain test against an unpacked filter. False means the
    value is PROVABLY absent from the file; True means "must read"."""
    for pos in bloom_positions_py(value, m_bits, k):
        if not (words[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True
