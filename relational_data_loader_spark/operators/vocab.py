"""Tokenizer-vocabulary induction over a document corpus.

Two corpus-scale primitives a tokenizer-training pipeline needs before any
BPE trainer runs (the trainer itself is an iterative driver loop over these
exact aggregates; reference scope per SURVEY.md §2.2 text category):

- ``bpe_merge_candidates``: the frequency table BPE's FIRST merge is chosen
  from — adjacent symbol-pair counts, weighted by word frequency. The classic
  scale trick is built in: aggregate to the DISTINCT-WORD level first (vocab
  ≪ corpus — a 100 TB corpus has ~10^7 distinct words, not 10^13), then
  explode char pairs over the distinct words only. Exploding pairs over raw
  token occurrences would shuffle ~|corpus| rows; this shuffles ~|vocab|.

- ``vocab_coverage``: for a cutoff list of sizes, what fraction of token
  OCCURRENCES the top-N most frequent words cover — the curve that picks a
  word-level vocab size / decides how much falls through to subword units.
  One word-frequency aggregate feeds every cutoff (conditional sums over the
  rank, no per-cutoff rescan).

Both are pure codegen + one/two hash aggregates: no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# whitespace-normalized lowercase word split — the corpus tokenization every
# text operator in this repo shares (operators/dedup.py _distinct_tokens)
def _words(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "")


def bpe_merge_candidates(
    df: DataFrame, text_col: str, k: int = 50
) -> DataFrame:
    """Top-``k`` adjacent character pairs by word-frequency-weighted count —
    the argmax table of a BPE trainer's first iteration.

    Plan: one shuffle to the distinct-word frequency table, a shuffle-free
    ``transform(sequence(...))`` explode of each DISTINCT word's char pairs
    (array built in codegen; words shorter than 2 chars contribute nothing
    and are filtered BEFORE sequence() so Spark's descending-sequence
    surprise — sequence(1,0) = [1,0] — can't fire), then one pair-keyed
    aggregate. Rank on (count desc, pair asc) so the result is deterministic
    across engines.
    """
    wf = _words(df, text_col).groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    pairs = (
        wf.filter(F.length("w") >= 2)
        .select(
            "f",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("f").alias("pair_count"))
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("pair", "pair_count", "rk")
    )


def vocab_coverage(
    df: DataFrame, text_col: str, cutoffs: list[int] | None = None
) -> DataFrame:
    """Token-occurrence coverage of the top-N word vocabulary for each N in
    ``cutoffs`` — (vocab_size, covered_tokens, total_tokens, coverage).

    One word-frequency aggregate; each word gets a frequency rank
    (tie-broken on the word so the rank — and therefore the coverage of a
    cutoff that lands mid-tie — is deterministic in both engines); one final
    conditional-sum pass computes every cutoff together. The rank window is
    a global sort over |vocab| rows (not |corpus|) — the same reduction
    argument as ``bpe_merge_candidates``.
    """
    cutoffs = cutoffs or [10, 50, 100, 500]
    wf = _words(df, text_col).groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ranked = wf.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("w")))
    )
    aggs = [F.sum("f").alias("total_tokens")]
    for n in cutoffs:
        aggs.append(
            F.sum(F.when(F.col("rk") <= n, F.col("f")).otherwise(F.lit(0))).alias(
                f"_cov_{n}"
            )
        )
    row = ranked.agg(*aggs)
    # one row → |cutoffs| rows via an inline array explode; a per-cutoff
    # union of projections over `row` would re-run the aggregate (and the
    # corpus scan under it) once per cutoff
    cut_structs = F.array(
        *[
            F.struct(
                F.lit(n).cast("int").alias("vocab_size"),
                F.col(f"_cov_{n}").alias("covered_tokens"),
            )
            for n in cutoffs
        ]
    )
    return row.select(
        F.explode(cut_structs).alias("c"), F.col("total_tokens")
    ).select(
        F.col("c.vocab_size").alias("vocab_size"),
        F.col("c.covered_tokens").alias("covered_tokens"),
        F.col("total_tokens"),
        F.round(F.col("c.covered_tokens") / F.col("total_tokens"), 4)
        .cast("double")
        .alias("coverage"),
    )


def pmi_collocations(
    df: DataFrame, text_col: str, min_count: int = 5, k: int = 40
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information — the multi-word-expression miner that feeds a PHRASE
    vocabulary (high-PMI pairs like proper names and idioms deserve one
    token; high-frequency-but-low-PMI pairs are just common words
    colliding). PMI = ln(c_xy·N / (c_x·c_y)) over the bigram contingency
    table: c_x = x's count in the FIRST slot, c_y = y's in the SECOND,
    N = total bigrams. ``min_count`` kills the classic PMI pathology
    (rare pairs score highest on noise).

    Plan: shuffle-free bigram extraction (array transform over token
    positions, same shape as bigram_surprisal), three partial-agged
    counts over the bigram stream, posting-sized joins, and a broadcast
    1-row total. Ranks on the ROUNDED pmi with (prev, cur) tie-break so
    engines agree.
    """
    from relational_data_loader_spark.functions.text import _one_to_one, tokens

    bg = (
        df.select(_one_to_one(tokens(F.col(text_col)), "_toks"))
        .filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS prev, _toks[i] AS cur))"
                )
            ).alias("bg")
        )
        .select("bg.prev", "bg.cur")
    )
    bgc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    left = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_prev"))
    right = bg.groupBy("cur").agg(F.count(F.lit(1)).alias("c_cur"))
    total = bg.agg(F.count(F.lit(1)).alias("n_total"))
    pmi = F.round(
        F.log((F.col("c_bg") * F.col("n_total")) / (F.col("c_prev") * F.col("c_cur"))),
        4,
    ).cast("double")
    scored = (
        bgc.filter(F.col("c_bg") >= min_count)
        .join(left, "prev")
        .join(right, "cur")
        .crossJoin(F.broadcast(total))
        .select("prev", "cur", "c_bg", pmi.alias("pmi"))
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("prev"), F.asc("cur"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("prev", "cur", "c_bg", "pmi", "rk")
    )
