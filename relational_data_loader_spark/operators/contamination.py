"""Benchmark-contamination detection: word-n-gram overlap against an
evaluation set.

Decontamination is a standard stage of LLM training-data pipelines: any
training document sharing long-enough word n-grams with an evaluation
benchmark is flagged (and usually dropped), otherwise eval scores measure
memorization. The canonical method (GPT-3 appendix C and successors) is
exactly this operator: n-gram overlap between each corpus document and the
union of benchmark n-grams.

Scale notes: the benchmark side is an eval suite — thousands of documents,
millions of n-grams — so its distinct n-gram set is BROADCAST; the corpus
side never shuffles on anything but its own per-doc aggregation. The
corpus n-gram explode is the large intermediate, immediately reduced by a
partial-aggregated groupBy. No self-join, no corpus×corpus anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relational_data_loader_spark.functions.text import (
    _one_to_one,
    tokens,
    word_ngrams_from_tokens,
)


def word_ngrams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-grams per document: ``(doc_id, ngram)``.

    Pure array expressions (codegen): tokenize ONCE behind a
    ``_one_to_one`` Generate barrier (the O(tokens²) re-split trap
    documented on ``word_ngrams_from_tokens``), then one transform over
    positions. Documents shorter than ``n`` tokens emit nothing (explode
    of an empty array).
    """
    based = df.select(
        F.col(id_col).alias("doc_id"),
        _one_to_one(tokens(F.col(text_col)), "_toks"),
    )
    return based.select(
        "doc_id",
        F.explode(word_ngrams_from_tokens(F.col("_toks"), int(n))).alias("ngram"),
    ).distinct()


def repeated_ngrams(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Word n-grams shared across documents: ``(ngram, n_docs,
    n_occurrences)`` for every ``n``-gram appearing in at least
    ``min_docs`` distinct documents.

    The memorization-risk twin of decontamination: long spans repeated
    across many training documents are what models most readily memorize
    verbatim (boilerplate, licenses, templated text), so pipelines surface
    them for down-weighting or span-level dedup.

    Plan: two-LEVEL aggregation instead of one ``count_distinct`` groupBy —
    the (doc_id, ngram) pre-aggregation partial-combines map-side (a doc's
    internal repeats never shuffle), and the second rollup then gets
    distinct-doc counts as plain ``count(*)``, avoiding the Expand
    duplication a count_distinct would put on the full exploded stream.
    At corpus scale the explode is the large intermediate; it flows
    straight into partial aggregation, and the final state is bounded by
    the distinct-ngram count. Production note: swap the ngram string for
    ``xxhash64(ngram)`` as the shuffle key when spans are long — the
    output then carries hashes and a sample span per hash."""
    based = docs.select(
        F.col(id_col).alias("doc_id"),
        _one_to_one(tokens(F.col(text_col)), "_toks"),
    )
    per_doc = (
        based.select(
            "doc_id",
            F.explode(word_ngrams_from_tokens(F.col("_toks"), int(n))).alias(
                "ngram"
            ),
        )
        .groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("cnt").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= int(min_docs))
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document duplicated spans with token offsets — the
    span-level exact-substring dedup of Lee et al. ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed as joins +
    windows instead of a suffix array.

    A token position is *covered* when the ``k``-token window starting
    there occurs in at least ``min_docs`` distinct documents; overlapping
    and adjacent covered windows are merged into maximal spans. Output:
    ``(doc_id, span_start, span_end, span_tokens)`` — 0-based token
    offsets, end exclusive. Downstream pipelines cut or down-weight these
    spans rather than dropping whole documents.

    Plan, inner to outer: one ``posexplode`` of the n-gram transform
    (tokenized once behind the ``_one_to_one`` Generate barrier) produces
    ``(doc_id, pos, ngram)``; doc-frequency is the same two-level
    aggregation as ``repeated_ngrams`` (map-side partials absorb a doc's
    internal repeats); positions join the df≥min_docs n-gram set on
    ``ngram`` — a shuffled equi-join, NOT a broadcast, because at corpus
    scale the duplicated-ngram set is itself corpus-sized (boilerplate),
    and AQE skew-splitting handles mega-posting n-grams. Span merging is
    one window per doc over the *surviving* positions only (lag trick:
    windows sorted by pos merge while ``pos <= prev_pos + k``), so the
    sort is bounded by a single document's duplicated-position count,
    never the corpus. No suffix array is needed for fixed-k coverage:
    the union of duplicated k-windows equals the byte ranges a suffix
    array would flag at threshold k, up to tokenization granularity.
    """
    from pyspark.sql.window import Window

    based = docs.select(
        F.col(id_col).alias("doc_id"),
        _one_to_one(tokens(F.col(text_col)), "_toks"),
    )
    pos = based.select(
        "doc_id",
        F.posexplode(word_ngrams_from_tokens(F.col("_toks"), int(k))).alias(
            "pos", "ngram"
        ),
    )
    dup = (
        pos.groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .filter(F.col("_ndocs") >= int(min_docs))
        .select("ngram")
    )
    hit = pos.join(dup, "ngram").select("doc_id", F.col("pos").cast("bigint"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hit.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + int(k)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    islands = flagged.select(
        "doc_id",
        "pos",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "_island"
        ),
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + int(k)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def cut_duplicated_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """The corpus-cleaning composition of ``duplicated_spans``: rebuild
    each document's text with cross-document duplicated windows CUT,
    keeping exactly one canonical occurrence per n-gram (Lee-et-al's
    remove-all-but-one policy). Ownership is the deterministic
    ``min(doc_id)`` per n-gram — the same first-seen convention as
    ``doc_novelty`` — so the output is a pure function of corpus content.

    Output: ``(doc_id, clean_text, n_tokens, n_cut)`` for EVERY input
    document (``n_cut = 0`` and text normalized-but-uncut when nothing is
    shared). Owner documents keep their windows (including internal
    repeats); non-owners cut every token covered by a duplicated window.

    Plan: the ``duplicated_spans`` chain up to the position join, with the
    doc-frequency aggregate also carrying ``min(doc_id)`` (one agg, two
    outputs); covered token positions are a bounded k-fold explode of the
    surviving windows; reconstruction is one per-doc ``collect_set`` of
    cut positions (bounded by a single doc's token count) joined back to
    the tokenized scan and filtered with an index lambda — array ops in
    codegen, no Python, no per-token shuffle of the full corpus.
    """
    based = docs.select(
        F.col(id_col).alias("doc_id"),
        _one_to_one(tokens(F.col(text_col)), "_toks"),
    )
    pos = based.select(
        "doc_id",
        F.posexplode(word_ngrams_from_tokens(F.col("_toks"), int(k))).alias(
            "pos", "ngram"
        ),
    )
    stats = (
        pos.groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("_ndocs"),
            F.min("doc_id").alias("_owner"),
        )
        .filter(F.col("_ndocs") >= int(min_docs))
        .select("ngram", "_owner")
    )
    cutpos = (
        pos.join(stats, "ngram")
        .filter(F.col("doc_id") != F.col("_owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + int(k) - 1)
            ).alias("_tp"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("_tp").alias("_cut"))
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.coalesce(F.array_contains(F.col("_cut"), i), F.lit(False)),
    )
    return based.join(cutpos, "doc_id", "left").select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.coalesce(F.size("_cut"), F.lit(0)).cast("bigint").alias("n_cut"),
    )


def dup_span_stats(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document rollup of ``duplicated_spans`` coverage:
    ``(doc_id, n_tokens, n_spans, dup_tokens, dup_frac)`` for EVERY
    document (zero-filled when nothing is duplicated) — the budget signal
    a pipeline thresholds on ("drop docs >50% span-duplicated, cut spans
    otherwise"). One extra broadcast-free left join of the span rollup
    onto per-doc token counts; token counting is pure codegen on the scan.
    """
    spans = (
        duplicated_spans(docs, text_col, id_col, k=k, min_docs=min_docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_tokens").alias("dup_tokens"),
        )
    )
    sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return sizes.join(spans, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 4
        ).alias("dup_frac"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per corpus document: how many of its distinct ``n``-grams appear
    anywhere in the benchmark set, and the contaminated fraction.

    Output: ``(doc_id, n_ngrams, n_contaminated, contaminated_frac)`` —
    one row per corpus document that has at least one ``n``-gram.
    Downstream policy (drop / review thresholds) is the caller's.
    """
    c_ng = word_ngrams(corpus, text_col, id_col, n)
    b_ng = word_ngrams(benchmark, text_col, id_col, n).select("ngram").distinct()
    sizes = c_ng.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        c_ng.join(F.broadcast(b_ng), "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        n_cont.alias("n_contaminated"),
        F.round(n_cont / F.col("n_ngrams"), 4).cast("double").alias(
            "contaminated_frac"
        ),
    )


def doc_novelty(
    docs: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    ``n``-grams that the doc itself INTRODUCED to the corpus (no
    lower-id document contains them). The corpus-contribution score
    behind ingestion-order dedup budgeting — a crawl snapshot whose
    novelty collapses is re-crawling what the corpus already has, and
    per-source novelty averages tell which feeds still pay for
    themselves.

    "Introduced" is pinned to the deterministic ``min(doc_id)`` owner
    per n-gram, so the score is a pure function of the corpus content —
    reshuffling partitions or re-running cannot move credit between
    duplicate docs.

    Plan: the inverted-index shape — distinct (doc, ngram) postings
    (codegen n-gram transform), one groupBy(ngram) for the first-seen
    owner (partial-agged min), one join of postings to that 1-row-per-
    ngram frame (output = posting count, never quadratic), one final
    groupBy(doc). Boilerplate n-grams with huge posting lists skew the
    JOIN key, not a bucket self-join — AQE skew splitting handles them
    without a cap.
    """
    ng = word_ngrams(docs, text_col, id_col, int(n))
    first = ng.groupBy("ngram").agg(F.min("doc_id").alias("first_doc"))
    return (
        ng.join(first, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "novel_ngrams"
            ),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "novel_ngrams",
            F.round(F.col("novel_ngrams") / F.col("n_ngrams"), 4).alias(
                "novelty"
            ),
        )
    )


def embedding_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    round_dp: int = 3,
) -> DataFrame:
    """Semantic decontamination: flag corpus items whose embedding cosine
    against ANY benchmark item reaches ``threshold`` — the companion of
    the n-gram overlap above for paraphrased/translated leakage that
    shares no surface n-grams (the reason modern pipelines run both).
    Returns ``(vec_id, max_sim, contaminated)`` per corpus item — the
    audit row; callers drop or down-weight on ``contaminated``.

    Scale shape: the benchmark side is an eval suite (10³–10⁵ vectors —
    KBs to MBs), so it BROADCASTS and the plan is a map-only
    broadcast-nested-loop over the corpus followed by one partial-agged
    groupBy per corpus id: corpus never self-joins, never shuffles its
    embedding payload, and the cost is corpus × |benchmark| fused
    multiply-adds in codegen. If the "benchmark" ever grows corpus-sized,
    this is the wrong operator — use the LSH-bucketed
    ``embedding_near_dup_pairs`` (operators/similarity.py) instead.
    The comparison runs on the ``round_dp``-rounded cosine so the
    flag boundary is bit-stable across engines.
    """
    from pyspark.sql.functions import broadcast

    from relational_data_loader_spark.operators.similarity import _dot, _norm

    # norms hoisted out of the corpus × benchmark loop (r6, guide §2.3):
    # once per row on each side instead of once per pair; dot/(cn*bn) is
    # the same subtree as cosine_expr so the rounded sims are bit-identical
    b = broadcast(
        benchmark.select(
            F.col(id_col).alias("_b_id"),
            F.col(emb_col).alias("_b_emb"),
            _norm(F.col(emb_col)).alias("_b_n"),
        )
    )
    c = corpus.select(
        F.col(id_col),
        F.col(emb_col).alias("_c_emb"),
        _norm(F.col(emb_col)).alias("_c_n"),
    )
    sim = F.round(
        _dot(F.col("_c_emb"), F.col("_b_emb"))
        / (F.col("_c_n") * F.col("_b_n")),
        round_dp,
    )
    return (
        c.crossJoin(b)
        .groupBy(id_col)
        .agg(F.max(sim).cast("double").alias("max_sim"))
        .select(
            id_col,
            "max_sim",
            (F.col("max_sim") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )
