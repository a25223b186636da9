"""Deduplication operators: exact, MinHash+LSH, SimHash, token-Jaccard.

Beyond-the-reference operators for large-scale training-data pipelines
(the reference dedups implicitly by primary key only; these dedup by
*content*). All are pure DataFrame compositions — shuffles are on
fingerprint / band keys, which are uniformly distributed by construction
(md5), so no skew handling is needed; and every hash is md5 so the DuckDB
oracle can reproduce results bit-for-bit.

Scale notes:
- exact dedup: one groupBy on the 128-bit fingerprint — a single shuffle,
  partial-aggregated map-side.
- MinHash/LSH: doc→token explode is the large intermediate; the per-doc
  signature groupBy reduces it immediately (min() partial-aggregates).
  Candidate pairs come from self-joining band buckets; band keys are
  md5-uniform so the join shuffles evenly. At 10^10 docs you'd salt the
  rare giant bucket (boilerplate text) — the bucket-size cap below is the
  guard.
- SimHash: same explode, then 16 conditional sums per doc — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from relational_data_loader_spark.functions.text import fingerprint, normalize


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical (normalized) texts: fingerprint, keeper id, copy count."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _distinct_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize(F.col(text_col)), " ")).alias("tok"),
    ).distinct()


# 8 fixed seeds -> 8 minhash components -> 4 bands of 2 (b=4, r=2)
MINHASH_SEEDS = ["a", "b", "c", "d", "e", "f", "g", "h"]
LSH_BANDS = [("band1", ("h_a", "h_b")), ("band2", ("h_c", "h_d")),
             ("band3", ("h_e", "h_f")), ("band4", ("h_g", "h_h"))]


def _signatures_from_tokens(toks: DataFrame) -> DataFrame:
    """MinHash signatures from an existing (doc_id, tok) posting list —
    the shared-input path near_dup_pairs uses so the token explode is
    computed once for all four of its consumers."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(s), F.col("tok")))).alias(f"h_{s}")
        for s in MINHASH_SEEDS
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def minhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc MinHash signature: min(md5(seed||token)) per seed.

    md5(seed || token) is a uniform 128-bit hash family indexed by seed;
    the min over a doc's token set is the classic MinHash estimator
    (P[min_a == min_b] = Jaccard(a,b) per component).
    """
    return _signatures_from_tokens(_distinct_tokens(df, text_col, id_col))


def lsh_candidate_pairs(
    sigs: DataFrame, max_bucket: int = 1000
) -> DataFrame:
    """Banded LSH: docs sharing any band hash become candidate pairs.

    ``max_bucket`` drops degenerate buckets (e.g. empty-text docs or
    boilerplate) whose quadratic blowup would dominate at scale — the
    standard guard in production LSH.

    Plan shape (round 3): the bands MELT into long form
    ``(doc_id, band, band_key)`` once (``stack`` — a projection, no
    shuffle), then ONE size-filter aggregation and ONE self-join on
    ``(band, band_key)`` produce every band's pairs together. The previous
    per-band loop ran 4 separate groupBy+join rounds over the same
    signatures — 4× the exchanges and 4× the signature recomputation for
    identical output rows.
    """
    long = _bands_long(sigs)
    sized = (
        long.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band", "band_key")
    )
    b = long.join(sized, ["band", "band_key"])
    return (
        b.alias("x")
        .join(b.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("band"),
        )
    )


def _band_hash_sql(cols: tuple[str, str]) -> str:
    return f"md5(concat({', '.join(cols)}))"


def _bands_long(sigs: DataFrame) -> DataFrame:
    """Melt a signature frame into long form ``(doc_id, band, band_key)``
    — ``stack`` is a projection, no shuffle."""
    band_args = ", ".join(
        f"'{name}', {_band_hash_sql(cols)}" for name, cols in LSH_BANDS
    )
    return sigs.selectExpr(
        "doc_id",
        f"stack({len(LSH_BANDS)}, {band_args}) AS (band, band_key)",
    )


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash: bit i = majority of (high bit of hex digit i of md5(tok)).

    Each hex digit of a token's md5 contributes its high bit (digit >= 8) as
    one signature dimension; the per-doc majority vote over tokens is the
    SimHash. Near-dup docs differ in few bits (compare with hamming()).
    """
    toks = _distinct_tokens(df, text_col, id_col)
    h = F.md5(F.col("tok"))
    bit_sums = [
        F.sum(
            F.when(F.substring(h, i + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(16)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_sums)
    bits = [
        F.when(F.col(f"s{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(16)
    ]
    return per_doc.select("doc_id", F.concat(*bits).alias("simhash"))


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """The full near-dup pipeline as one operator: MinHash → banded LSH
    candidates → exact Jaccard verification computed ONLY for candidate
    pairs. See ``near_dup_pairs_with_handle`` for the cache-lifecycle API;
    this convenience wrapper leaves the posting-list cache to the session
    (fine for one-shot jobs; long-lived sessions should hold the handle).
    The release handle also rides the returned DataFrame as
    ``.unpersist_postings`` for discoverability."""
    pairs, release = near_dup_pairs_with_handle(
        df, text_col, id_col, threshold=threshold, max_bucket=max_bucket
    )
    pairs.unpersist_postings = release
    return pairs


def near_dup_pairs_with_handle(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    max_bucket: int = 1000,
):
    """``(pairs DataFrame, release handle)`` — the full near-dup pipeline:
    MinHash → banded LSH candidates → exact Jaccard verification computed
    ONLY for candidate pairs.

    This is the 100 TB-correct composition: the exact verifier
    (``token_jaccard_pairs``) is quadratic over the corpus if run alone, so
    at scale it must consume LSH's candidate set instead. The intersection
    is computed by joining each candidate pair to its two posting lists —
    work is Σ_candidates |tokens(a)|, linear in the (LSH-pruned) candidate
    count, never in corpus².

    The posting-list cache DELIBERATELY outlives this call — it feeds four
    consumers across the returned plan's executions. Call the returned
    ``release()`` once done with the pairs (idempotent; blocking=False so
    it never stalls the caller): a long-lived session running many specs
    would otherwise accumulate one cached posting list per call
    (VERDICT r3 task #6).
    """
    # the token posting list feeds FOUR consumers (signatures, both sides
    # of the intersection join, sizes); without the persist each one re-runs
    # the scan+normalize+explode+distinct — the dominant cost of the whole
    # pipeline — because the identical subtrees are not exchange-reused in
    # the static plan (measured: 8 parquet scans, 0 ReusedExchange).
    toks = _distinct_tokens(df, text_col, id_col).persist()
    # sigs too (one row per doc — tiny): the banded self-join reads the
    # melted band long-form THREE times (bucket-size filter + both join
    # sides), and without this cache each read re-runs the signature
    # aggregation over the posting list (r6)
    sigs = _signatures_from_tokens(toks).persist()

    def release() -> None:
        toks.unpersist(blocking=False)
        sigs.unpersist(blocking=False)
    cand = (
        lsh_candidate_pairs(sigs, max_bucket=max_bucket)
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(toks.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            toks.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    pairs = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 4).cast("double").alias("jaccard"),
        )
    )
    return pairs, release


def incremental_near_dup_pairs(
    base_docs: DataFrame,
    delta_docs: DataFrame,
    text_col: str,
    id_col: str,
    base_sigs: DataFrame | None = None,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """The IVM step of corpus near-dedup: every near-dup pair TOUCHING a
    CDC delta of documents, without recomputing the corpus's pairs.

    Contract (the engine's change-feed shape, operators/index.py's twin
    for the dedup view): ``base_docs`` is the post-change corpus MINUS the
    changed ids (old versions of U docs and D docs already removed);
    ``delta_docs`` carries the NEW text of I/U docs; ``base_sigs`` is the
    maintained MinHash signature table over ``base_docs``
    (``minhash_signatures`` output — persist it like the posting index;
    recomputed here only if not supplied, which forfeits the IVM saving).

    Result == ``near_dup_pairs(base ∪ delta)`` restricted to pairs with at
    least one delta side — the only pairs a delta can create or change;
    unchanged-vs-unchanged pairs are by definition already in the
    maintained pair table. That equation is the oracle (and the pytest).

    Cost shape at 10^10 docs: signature explode over |delta| only; ONE
    band equi-join of the delta's band rows against base∪delta band rows
    (shuffled on md5-uniform band keys, ``max_bucket`` capped over the
    FULL bucket population so the guard agrees with the full rebuild);
    exact-Jaccard verification explodes base text ONLY for docs that
    appear in a candidate pair (semi-join pushdown) — Σ candidate tokens,
    never corpus tokens.
    """
    delta_toks = _distinct_tokens(delta_docs, text_col, id_col).persist()
    delta_sigs = _signatures_from_tokens(delta_toks)
    recomputed_base_sigs = base_sigs is None
    if base_sigs is None:
        # locally-recomputed base signatures feed the band long-form twice
        # (size filter + join side); cache them for the call so the base
        # corpus explode runs once, not twice (r6). A supplied maintained
        # signature table keeps its caller-owned lifecycle.
        base_sigs = minhash_signatures(base_docs, text_col, id_col).persist()
    long_delta = _bands_long(delta_sigs)
    long_all = _bands_long(base_sigs).unionByName(long_delta)
    sized = (
        long_all.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band", "band_key")
    )
    cand = (
        long_delta.alias("x")
        .join(long_all.join(sized, ["band", "band_key"]).alias("y"),
              ["band", "band_key"])
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .select(
            F.least("x.doc_id", "y.doc_id").alias("doc_a"),
            F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    # verification tokens: delta's (already exploded) plus ONLY the base
    # docs that made it into a candidate pair
    cand_ids = (
        cand.select(F.col("doc_a").alias("_cand_id"))
        .union(cand.select(F.col("doc_b").alias("_cand_id")))
        .distinct()
    )
    base_cand_toks = _distinct_tokens(
        base_docs.join(
            cand_ids, base_docs[id_col] == cand_ids["_cand_id"], "left_semi"
        ),
        text_col,
        id_col,
    )
    toks = delta_toks.unionByName(base_cand_toks).persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(toks.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            toks.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    pairs = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 4).cast("double").alias("jaccard"),
        )
    )

    def release() -> None:
        delta_toks.unpersist(blocking=False)
        cand.unpersist(blocking=False)
        toks.unpersist(blocking=False)
        if recomputed_base_sigs:
            base_sigs.unpersist(blocking=False)

    pairs.unpersist_postings = release
    return pairs


def token_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.2
) -> DataFrame:
    """Exact token-set Jaccard for pairs sharing ≥1 token (n-gram n=1).

    The inverted-index self-join: |A∩B| from joining doc→token postings,
    |A∪B| = |A|+|B|−|A∩B|. Quadratic in the worst case — at scale this runs
    *after* LSH candidate generation, not instead of it (tests pair them).
    """
    # NOT persisted (r6, measured): the three consumers (sizes + both
    # self-join sides) each stream the explode through map-side partial
    # aggregation, and caching the corpus-sized exploded posting list
    # costs more than recomputing it (0.43 s -> 0.80 s with the cache at
    # sf0.1) — the guide §5 rule, recompute wins for cheap-to-produce
    # larger-than-input frames.
    toks = _distinct_tokens(df, text_col, id_col)
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 4).cast("double").alias("jaccard"),
        )
    )


def edit_distance_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    trunc_len: int = 2000,
    max_bucket: int = 1000,
    parallelism: int | None = None,
) -> DataFrame:
    """Character-level near-dup verification: normalized edit similarity
    ``1 − lev(a,b)/max(len_a, len_b)`` over LSH candidate pairs — catches
    the near-identical-but-retokenized duplicates (punctuation swaps,
    in-word edits, digit churn) that token-set Jaccard is blind to, because
    Jaccard treats any in-word edit as a whole-token delete+insert.

    Scale discipline (the reason this is a *verifier*, never a generator):
    Levenshtein is O(m·n) per PAIR, so it runs strictly over the banded-LSH
    candidate set (Σ candidates, never corpus²) on ``trunc_len``-capped
    prefixes. Two exactness guards keep the cap and the pruning honest:

    - the JVM's threshold-banded ``levenshtein(a, b, cap)`` (O(n·cap), not
      O(n²)) returns −1 for distances above ``cap = ⌈(1−threshold)·
      trunc_len⌉``; since ``max(len) ≤ trunc_len``, any pruned pair has
      ``sim ≤ 1 − lev/trunc_len < threshold`` — pruning loses nothing;
    - similarity is normalized by the TRUNCATED lengths on both engines,
      so the cap changes the metric's definition identically everywhere
      rather than silently differing per engine.

    The candidate frame is explicitly repartitioned to ``parallelism``
    (default ``sparkContext.defaultParallelism``) before the Levenshtein
    projection: candidate PAIRS are bytes-tiny, so AQE's size-based
    coalescer happily collapses them to one partition — and then the
    entire O(n·cap)-per-pair verification runs on ONE core (measured 218 s
    vs ~7 s for the identical sf0.1 workload). Size-based partitioning is
    the wrong signal for CPU-dense stages; the explicit count (which AQE
    never coalesces) pins the compute fan-out.

    Returns ``(doc_a, doc_b, edit_sim)`` at 4dp.
    """
    import math

    cap = int(math.ceil((1.0 - threshold) * trunc_len))
    texts = df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.col(text_col), 1, trunc_len).alias("_txt"),
    )
    n_parts = parallelism or df.sparkSession.sparkContext.defaultParallelism
    # signatures cached across the band join's three reads (size filter +
    # both sides): without this every read re-ran the tokenize+explode+
    # aggregate chain from the raw corpus (r6). One row per doc; freed as
    # soon as the candidate set is evaluated downstream of the join.
    sigs = minhash_signatures(df, text_col, id_col).persist()
    cand = (
        lsh_candidate_pairs(sigs, max_bucket)
        .select("doc_a", "doc_b")
        .distinct()
        .repartition(n_parts)
    )
    lev = F.levenshtein(F.col("ta._txt"), F.col("tb._txt"), cap)
    denom = F.greatest(
        F.length("ta._txt"), F.length("tb._txt"), F.lit(1)
    ).cast("double")
    sim = F.round(F.lit(1.0) - lev.cast("double") / denom, 4)
    return (
        cand.join(texts.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(texts.alias("tb"), F.col("doc_b") == F.col("tb.doc_id"))
        .filter((lev >= 0) & (sim >= threshold))
        .select("doc_a", "doc_b", sim.cast("double").alias("edit_sim"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Subset-duplication detector: containment C(A,B) = |A∩B| /
    min(|A|, |B|) over distinct word ``n``-gram sets, for pairs scoring
    >= ``threshold``.

    Broder's resemblance/containment split: a document embedded verbatim
    inside a much larger one (quote-with-boilerplate, aggregator pages,
    prompt+completion concatenations) scores LOW on Jaccard — the union is
    dominated by the larger doc — but ~1.0 on containment of the smaller
    side, so Jaccard-thresholded near-dup passes keep both copies and this
    operator is what catches them.

    Plan: same inverted-index self-join shape as ``token_jaccard_pairs``
    (posting join → per-pair intersection count → broadcast-friendly size
    joins); quadratic in the worst case, so at corpus scale it runs over
    LSH candidates, not the raw corpus — compose exactly like
    ``near_dup_pairs`` does for Jaccard."""
    from relational_data_loader_spark.operators.contamination import word_ngrams

    # not persisted — same measured recompute-beats-cache result as
    # token_jaccard_pairs (the exploded n-gram set is corpus-sized)
    ng = word_ngrams(df, text_col, id_col, int(n))
    sizes = ng.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        ng.alias("a")
        .join(ng.alias("b"), "ngram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    cont = F.col("i") / F.least(F.col("sa.sz"), F.col("sb.sz"))
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(cont >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont, 4).cast("double").alias("containment"),
        )
    )


def doc_frequency_topk(
    df: DataFrame, text_col: str, id_col: str, k: int = 50
) -> DataFrame:
    """Corpus vocabulary statistics: the ``k`` tokens appearing in the most
    documents (document frequency — the DF of TF-IDF, and the input to
    stopword-list induction over a raw corpus).

    Plan: the distinct posting list (one explode), one partial-aggregated
    groupBy on the token, then a global top-k via orderBy+limit — which
    Spark executes as TakeOrdered (per-partition top-k folded on the
    driver, k rows each), NOT a full sort of the vocabulary. Tie-break on
    the token string so the cut at rank k is deterministic across engines.
    """
    toks = _distinct_tokens(df, text_col, id_col)
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("tok"))
        .limit(k)
    )


def _release_checkpoint(df: DataFrame) -> None:
    """Unpersist a ``localCheckpoint``-ed DataFrame's backing RDD blocks.

    Spark's ContextCleaner would reclaim them eventually (after driver
    GC), but an iterative loop creates one checkpoint per round — on a
    10^9-node graph waiting for GC means holding every superseded round's
    full label set in executor storage simultaneously. The checkpointed
    plan is a ``LogicalRDD`` whose RDD handle is reachable through the
    query execution; non-LogicalRDD plans (not a checkpoint) are left
    alone.
    """
    lp = df._jdf.queryExecution().logical()
    if lp.getClass().getSimpleName() == "LogicalRDD":
        lp.rdd().unpersist(False)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Collapse near-dup PAIRS into duplicate CLUSTERS and pick one
    representative per cluster — the final stage of corpus dedup (pairs
    alone can't drive a keep/drop decision: with docs A~B~C but A!~C,
    dropping one side of each pair either under- or over-deletes).

    Connected components by hash-min label propagation: every doc starts
    labeled with its own id; each round, every doc takes the min label in
    its neighborhood; fixpoint = components labeled by their min doc id.
    Output: one row per input doc — ``(doc_id, cluster_id, keep)`` where
    ``keep`` marks the min-id representative; singletons (no near-dup
    edge) keep themselves.

    Scale shape: per round one equi-join (edges × labels, both shuffled on
    the node key) + one partial-aggregated groupBy — no driver-side graph,
    no cartesian. Rounds = component diameter, which for near-dup families
    is tiny (dup families are dense — most are cliques from a shared
    template, diameter 1-2). Two things make iteration safe at 10^9 docs:
    labels are ``localCheckpoint``-ed each round, truncating a lineage
    that would otherwise grow by two shuffles per round until the planner
    chokes; and the convergence probe exploits monotonicity (labels only
    ever decrease) — for numeric ids ``sum(label)`` is unchanged iff the
    round is a fixpoint, one scalar agg over the fresh checkpoint; for
    non-numeric ids (URLs, hashes) an exact changed-label join-back runs
    instead, costing one extra equi-join per round. GraphX's
    large-star/small-star halves the rounds on high-diameter graphs; not
    needed for clique-ish dup families.
    """
    # pairs feeds BOTH union branches: without its own cache the entire
    # upstream pipeline (for near-dup input: LSH + Jaccard verification)
    # materializes twice — measured 2× the pipeline cost at sf0.1. Cache
    # it only until the symmetric edge set is itself cached, then drop.
    pairs = pairs.persist()
    src = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # hash-partition the cached edge set by the join key ONCE (r6): every
    # propagation round joins edges on src, and a cache that already
    # carries HashPartitioning(src) feeds each round's join without
    # re-shuffling the (large) edge side — one exchange at build time
    # replaces one per round (guide §2.4 "two operations keyed the same
    # way can share one exchange").
    edges = (
        src.union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .repartition(F.col("src"))
        .persist()
    )
    # eager=False everywhere in this loop (r6): a lazy localCheckpoint is
    # materialized by the FIRST action that computes it — here the
    # convergence probe — so each round runs ONE Spark job (probe +
    # checkpoint fused) instead of two (checkpoint job, then probe job).
    # Lineage truncation and block storage are unchanged; on diameter-d
    # graphs this halves the loop's job count (measured ~2x wall on the
    # sf0.1 dedup_clusters/semantic_dedup entries, which are job-overhead
    # bound at fixture scale).
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    pairs.unpersist()  # edges materialized by the labels checkpoint above
    # convergence probe, dispatched on the label TYPE (ADVICE r4: the sum
    # probe assumed numeric ids — string ids crashed under ANSI casts or,
    # worse, NULL-summed into a one-round early exit and silently wrong
    # clusters for diameter>=2 components):
    # - numeric ids: labels are MONOTONE (each round takes a min over the
    #   old label and neighbors, so no label can grow) — sum(label) is
    #   unchanged iff the round is a fixpoint. One scalar agg over the
    #   fresh checkpoint, no join-back shuffle.
    # - non-numeric ids (URLs, content hashes): min-order has no numeric
    #   embedding, so the probe is an exact changed-label count via
    #   join-back against the previous round — one extra equi-join per
    #   round, both sides already node-keyed. The numeric fast path is
    #   why callers with synthetic int ids never pay it.
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(
        labels.schema["label"].dataType, NumericType
    )
    prev_sum = (
        labels.agg(F.sum("label")).collect()[0][0] if numeric_ids else None
    )
    for _ in range(max_iterations):
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        if numeric_ids:
            new_sum = new.agg(F.sum("label")).collect()[0][0]
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            # full count (no limit): this probe MATERIALIZES the lazy
            # checkpoint, so it must compute every partition — a limit
            # can short-circuit and leave checkpoint blocks unstored
            converged = (
                new.join(
                    labels.withColumnRenamed("label", "_prev"), "node"
                )
                .where(F.col("label") != F.col("_prev"))
                .count()
                == 0
            )
        _release_checkpoint(labels)  # superseded round: free its blocks now
        labels = new
        if converged:
            break
    edges.unpersist()  # labels are checkpointed: no lineage back to edges
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("cluster_id") == F.col("doc_id"))
    )


def minhash_estimate_audit(
    df: DataFrame, text_col: str, id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of the 8 signature components agreeing)
    next to the EXACT token-set Jaccard, with the absolute error — the
    measurement that justifies (or indicts) a chosen signature width
    before trusting near-dup decisions from it at corpus scale.

    Same composition discipline as ``near_dup_pairs``: estimates and
    exact values are computed for CANDIDATES ONLY (never corpus²), the
    posting list is built once and feeds signatures, both intersection
    sides, and sizes. Unlike the dedup path there is NO threshold — the
    audit wants the misses (high estimate, low exact) most of all.
    """
    toks = _distinct_tokens(df, text_col, id_col).persist()
    # sigs feeds three consumers (band join + both estimate sides) and
    # cand feeds two (estimate join + exact-intersection join); without
    # their own caches each consumer re-runs the signature aggregation /
    # the whole banded self-join — measured as the dominant redundant work
    # of this audit (r6). Both released with the posting handle.
    sigs = _signatures_from_tokens(toks).persist()
    cand = (
        lsh_candidate_pairs(sigs, max_bucket=max_bucket)
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    agree = sum(
        F.when(F.col(f"a.h_{s}") == F.col(f"b.h_{s}"), 1).otherwise(0)
        for s in MINHASH_SEEDS
    )
    est = cand.join(
        sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id")
    ).join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id")).select(
        "doc_a",
        "doc_b",
        (agree / F.lit(float(len(MINHASH_SEEDS)))).alias("est_jaccard"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(toks.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            toks.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))).alias(
                "_exact"
            ),
        )
    )
    out = est.join(exact, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.round("est_jaccard", 4).alias("est_jaccard"),
        # candidates always share the band-minimum token, but keep the
        # defensive 0.0 so a future band change can't emit NULL exacts
        F.round(F.coalesce("_exact", F.lit(0.0)), 4).alias("exact_jaccard"),
        F.round(F.abs(F.col("est_jaccard") - F.coalesce("_exact", F.lit(0.0))), 4)
        .alias("abs_err"),
    )
    def _release() -> None:
        toks.unpersist(blocking=False)
        sigs.unpersist(blocking=False)
        cand.unpersist(blocking=False)

    out.unpersist_postings = _release
    return out


def cross_source_overlap(
    docs: DataFrame, text_col: str, id_col: str, source_col: str
) -> DataFrame:
    """Exact-duplicate overlap between sources: for every unordered
    source pair (including a source with itself), how many normalized
    text fingerprints appear in BOTH — the feed-procurement question
    ("is crawl B just mirroring crawl A?") answered from the same
    fingerprints exact_dedup already computes.

    Plan: fingerprints collapse to distinct (fingerprint, source) first
    — the only corpus-sized shuffle — then a self-join on the
    fingerprint. That join's output is Σ_fp pairs(sources(fp))², bounded
    by the SOURCE count per fingerprint (tiny domain), never by copies
    per fingerprint: a boilerplate page duplicated 10^6 times within one
    source contributes ONE (fp, source) row, not 10^12 pairs.
    """
    # persisted (r6): the distinct fingerprint set feeds both self-join
    # sides; the cache hashes the corpus once. Released via handle.
    fs = (
        docs.select(
            fingerprint(F.col(text_col)).alias("fp"),
            F.col(source_col).alias("src"),
        )
        .distinct()
        .persist()
    )
    out = (
        fs.alias("a")
        .join(fs.alias("b"), "fp")
        .filter(F.col("a.src") <= F.col("b.src"))
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
    )
    out.unpersist_postings = lambda: fs.unpersist(blocking=False)
    return out
