"""Document chunking for retrieval / training-window assembly.

The dual of sequence packing (operators/packing.py): packing concatenates
SHORT documents up to a token budget; chunking splits LONG documents into
overlapping fixed-width token windows — the preprocessing step behind RAG
indexes and long-context training shards. Pure JVM array codegen
(split / sequence / slice / array_join): no shuffle, no Python, output
rows stream straight off the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap_tokens`` of left context repeated in
    the next window (stride = chunk - overlap). Window starts are
    0, stride, 2*stride, ... while start < n_tokens, so every token lands
    in at least one chunk and the last chunk may run short — the standard
    sliding-window convention (a short tail is kept, not merged, so chunk
    boundaries are a pure function of the token count and survive
    incremental re-chunking of edited documents).

    Emits (id, chunk_idx, start_tok, n_tokens, chunk_md5): the md5
    stands in for the chunk text in the audit path (dedup of chunks,
    cross-run diffing) without carrying the payload; callers wanting the
    text itself select ``chunk_text`` too (kept as a column, pruned for
    free when unused).

    Scale shape: narrow map — per input row, output fan-out is
    ceil(n/stride) rows of bounded width; no shuffle, no per-doc state
    beyond the token array already materialized by the split. Skew note:
    one pathological 10^9-token document still fans out within a single
    task; cap upstream (documents over a token ceiling are quality-gated
    out long before chunking) rather than here.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap_tokens={overlap_tokens} must be < chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.regexp_replace(F.col(text_col), r"\s+", " "), " ")
    n = F.size("_toks")
    # last window start: largest multiple of stride strictly below n
    starts = F.sequence(
        F.lit(0),
        (F.floor((n - 1) / stride) * stride).cast("int"),
        F.lit(stride),
    )
    chunk_text = F.array_join(
        F.slice(F.col("_toks"), F.col("start_tok") + 1, chunk_tokens), " "
    )
    return (
        docs.select(id_col, toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .select(
            id_col,
            "chunk_idx",
            "start_tok",
            F.least(
                F.lit(chunk_tokens), F.size("_toks") - F.col("start_tok")
            ).alias("n_tokens"),
            F.md5(chunk_text).alias("chunk_md5"),
            chunk_text.alias("chunk_text"),
        )
    )
