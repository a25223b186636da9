"""Deterministic hash-based sampling — the training-data downsampler.

A 100 TB corpus is never fed to training whole: dominant languages/sources
are downsampled to a target mix. ``df.sample()`` is non-deterministic
across retries and cluster layouts (seeded per-partition, so a repartition
changes the draw); these samplers decide per ROW from a content hash, so
the same row is kept or dropped on every run, on any cluster, at any
parallelism — which is what makes sampled pipelines replayable and
oracle-checkable. All JVM-side codegen (md5 + conv), no shuffle: the
sample is a narrow filter that pushes work-reduction to the earliest
possible point in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# uniform u32 from the first 8 hex chars of md5 — reproducible in any
# engine with md5 (DuckDB oracle included)
_U32_SPAN = float(2**32)


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from a key column: first 8 md5 hex chars
    as a 32-bit integer / 2^32. Content-derived — independent of
    partitioning, ordering, and retries."""
    u32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return u32 / F.lit(_U32_SPAN)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    key_col: str,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the row's
    OWN key hash: ``hash_uniform(key) < rate[stratum]``.

    Per-stratum rates rebalance a skewed corpus (e.g. keep 20% of dominant
    'en', 80% of everything else). Filter-only plan: no shuffle, no sort,
    no state — at scale the filter sits directly on the scan and every
    downstream stage sees only the sampled fraction.
    """
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(hash_uniform(F.col(key_col)) < rate)


def group_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every GROUP (conversation,
    user, document family) lands wholly in one split, decided by the
    group key's own content hash against cumulative fraction bounds.

    The guard this exists for: a row-level random split leaks shared
    context across partitions — turns of one conversation (or docs of one
    near-dup family) end up on both sides of train/eval, and eval scores
    measure memorization of the family, not generalization. Hashing the
    GROUP key makes co-membership structural, and the content hash makes
    the split identical on every run, cluster layout, and retry (same
    argument as ``hash_uniform`` sampling).

    ``splits`` is ``[(name, fraction), ...]``; fractions should sum to 1
    (the last split absorbs any remainder, so rounding dust can't drop
    rows). Pure projection — no shuffle, no state; downstream writers
    partition by ``out_col`` to materialize the three corpora in one pass.
    """
    u = hash_uniform(F.col(group_col))
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += float(frac)
        clause = u < F.lit(cum)
        expr = F.when(clause, F.lit(name)) if expr is None else expr.when(
            clause, F.lit(name)
        )
    last = F.lit(splits[-1][0])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def weighted_sample_topk(
    df,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 5,
    round_dp: int = 9,
):
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): rank on ln(u)/w where u is the row's
    md5-derived uniform — the top-k by that key IS a weight-proportional
    sample. Used to sample training documents proportional to a quality
    or length weight, reproducibly: same data → same sample, on any
    engine and any partitioning (the u are content-derived, not RNG).

    ln(u)/w (monotone with the textbook u^(1/w)) keeps keys spread out
    where large weights would compress u^(1/w) against 1.0; the key is
    rounded before ranking with an id tie-break, so a ≤1-ulp libm
    difference between engines cannot flip the cut. One shuffle; the
    top-k rides WindowGroupLimit (≤ k rows per group leave each map
    partition).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from relational_data_loader_spark.operators.sketch import uniform_hash

    key = F.round(
        F.log(uniform_hash(F.col(id_col).cast("string")))
        / F.col(weight_col).cast("double"),
        round_dp,
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("sample_key"), F.asc(id_col))
    return (
        df.select(group_col, id_col, weight_col, key.alias("sample_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group_col, id_col, weight_col, "sample_key", "rk")
    )


def curriculum_sample(
    df: DataFrame,
    score_col: Column,
    key_col: str,
    n_buckets: int = 10,
    out_score: str = "score",
    out_bucket: str = "bucket",
) -> DataFrame:
    """Quality-curriculum downsampler: bucket rows by an equi-width cut of
    a [0,1] quality score and keep each row with probability proportional
    to its bucket's rank — high-quality buckets survive (bucket 9 keeps
    100%), low-quality ones are thinned (bucket 0 keeps 10%). The
    data-mix move behind quality-weighted pretraining corpora: never a
    hard cutoff (low-quality text still appears, just rarer), and the
    mix is tunable per bucket.

    Equi-width bucketing on the score's own [0,1] range — NOT quantile
    bucketing — is deliberate: it needs no distribution probe (quantile
    boundaries are a full-data aggregate and an FP-exactness hazard
    between engines), is stable as the corpus grows (a bucket means the
    same quality tomorrow), and keeps the whole plan a pure narrow
    filter+projection on the scan, same as ``stratified_sample``. The
    keep/drop draw is the content-hash uniform (``hash_uniform``), so
    the sample is deterministic under retries and repartitioning.
    """
    score = F.round(score_col, 4)
    bucket = F.least(
        F.lit(n_buckets - 1), F.floor(score * n_buckets)
    ).cast("int")
    keep_rate = (bucket + 1).cast("double") / F.lit(float(n_buckets))
    return (
        df.withColumn(out_score, score)
        .withColumn(out_bucket, bucket)
        .filter(hash_uniform(F.col(key_col)) < keep_rate)
    )


def per_group_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic k-per-group sample: within each group keep the k
    rows whose content-hash uniforms are smallest (ties broken on the
    key) — a fixed-size per-stratum panel that is STABLE as the corpus
    grows (a row already in the panel stays in it unless k genuinely
    better-hashed rows arrive), unlike rate-based sampling whose output
    size tracks the stratum.

    One window shuffle on the group key; the rank is a top-k window
    (WindowGroupLimit pushes the limit into the partial sort on
    Spark >= 3.5, so no group's full membership materializes in one
    task). The hash order makes the draw uniform over the group and
    identical across runs, partitionings, and engines.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def contrastive_negative_pairs(
    vectors: DataFrame,
    n_ids: int,
    k: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_sim: float = 0.9,
    salt: str = "neg",
    round_dp: int = 3,
) -> DataFrame:
    """Deterministic random negatives for contrastive training: each anchor
    draws ``k`` partner ids as ``md5(anchor:j:salt) % n_ids``, then pairs
    whose embedding cosine reaches ``max_sim`` are dropped — the standard
    accidental-positive guard (a "random" negative that is semantically the
    anchor would push the embedding space apart incorrectly).

    Content-hash drawn, so the sample is independent of partitioning,
    ordering, and retries, and the DuckDB oracle can replay it verbatim —
    the same contract as hash_uniform above. Requires ids in [0, n_ids)
    (dense index), like graph.hash_link_graph.

    Scale shape: the candidate build is a projection + explode (no
    shuffle); resolving partner embeddings is ONE equi-join on the partner
    id (each side shuffles once; payload is the embedding array). The
    similarity filter runs on the rounded cosine so the cut is bit-stable
    across engines. No sort, no window, no cross join.

    Returns (a_id, j, n_id, sim) — sim kept as the "hardness" feature
    curriculum samplers weight by.
    """
    js = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j")
    anchors = vectors.select(
        F.col(id_col).alias("a_id"), F.col(emb_col).alias("a_emb"), js
    )
    n_id = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("a_id"), F.col("j"), F.lit(salt))),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint") % F.lit(n_ids)
    cand = anchors.select("a_id", "j", n_id.alias("n_id"), "a_emb").filter(
        F.col("a_id") != F.col("n_id")
    )
    partners = vectors.select(
        F.col(id_col).alias("n_id"), F.col(emb_col).alias("n_emb")
    )
    from relational_data_loader_spark.operators.similarity import cosine_expr

    sim = F.round(
        cosine_expr(F.col("a_emb"), F.col("n_emb")), round_dp
    ).cast("double")
    return (
        cand.join(partners, "n_id")
        .select("a_id", "j", "n_id", sim.alias("sim"))
        .filter(F.col("sim") < max_sim)
    )


def dsir_logratio_topk(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 200,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
    score every doc in the raw pool by the log-likelihood ratio between a
    TARGET distribution (the docs matching ``is_target`` — the small
    high-quality set the training mix should look like) and the SOURCE
    distribution (the whole pool), under add-one-smoothed unigram LMs
    estimated from the pool itself; keep the top-``k``.

    score(d) = (1/|d|) · Σ_w tf_w(d) · ln( p_target(w) / p_source(w) )

    with p(w) = (c(w)+1)/(N+V), V = pool vocabulary size — so a token the
    target never uses contributes a finite negative pull instead of −∞,
    and docs full of target-typical tokens rank first. The
    length-normalisation (1/|d|) keeps scores comparable across doc sizes
    (raw DSIR sums favour long docs).

    Scale shape: one token explode → one (doc, tok) reduce, then every
    join is against REDUCED frames — the two count tables are
    vocabulary-sized, the totals are one broadcast row. This is the same
    two-aggregate skeleton as tfidf/unigram_surprisal; nothing touches
    the corpus twice. Production swap, documented: with an unbounded
    vocabulary, hash tokens into 10^4–10^5 buckets first (DSIR's hashed
    n-gram features) — counts then have a fixed size independent of the
    corpus; the per-token form here keeps the oracle exact.

    Output: (doc_id, n_tokens, logratio, rk) for the top-k by score,
    ties broken by ``id_col`` — deterministic under replay.
    """
    from relational_data_loader_spark.functions.text import _one_to_one, tokens
    from pyspark.sql.window import Window

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_tgt"),
        _one_to_one(tokens(F.col(text_col)), "_toks"),
    ).select("doc_id", "_tgt", F.explode("_toks").alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("_tgt").alias("_tgt")
    )
    cs = tf.groupBy("tok").agg(F.sum("tf").alias("c_s"))
    ct = (
        tf.filter(F.col("_tgt"))
        .groupBy("tok")
        .agg(F.sum("tf").alias("c_t"))
    )
    tot = cs.agg(
        F.sum("c_s").alias("n_s"), F.count(F.lit(1)).alias("v")
    ).crossJoin(ct.agg(F.sum("c_t").alias("n_t")))
    ratio = F.log(
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1)
        / (F.col("n_t") + F.col("v"))
    ) - F.log((F.col("c_s") + 1) / (F.col("n_s") + F.col("v")))
    scored = (
        tf.join(cs, "tok")
        .join(ct, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * ratio) / F.sum("tf"), 4).alias(
                "logratio"
            ),
        )
    )
    # distributed top-k FIRST (TakeOrdered — per-partition heads, no
    # single-partition exchange of the full scored frame), THEN the
    # row_number window, which now only ever sees k rows
    top = scored.orderBy(F.col("logratio").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("logratio").desc(), F.col("doc_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based source rebalancing — the p^α mix rule
    multilingual / multi-source training recipes use (mT5's exponential
    smoothing): stratum s gets sampling share q_s ∝ n_s^α, so α<1 flattens
    head-source dominance (α=1 keeps natural proportions, α=0 makes every
    stratum equal), scaled so the EXPECTED total kept fraction is
    ``budget_frac``:

        rate_s = min(1, budget_frac · (q_s · N) / n_s),
        q_s    = n_s^α / Σ_t n_t^α

    Unlike ``stratified_sample`` the rates are not caller-supplied — they
    are derived from the corpus's own stratum counts, which is the actual
    workflow (you know the α and the token budget, not 40 per-language
    fractions). Head strata can saturate at rate 1 (min-clamp): the
    realized total then undershoots budget_frac — the standard behavior,
    documented rather than silently re-normalized.

    Scale shape: one partial-agged count per stratum (|strata| rows), the
    totals one more scalar agg, both broadcast back; the keep decision is
    the same content-hash filter as every sampler here — deterministic
    across retries, partitionings and engines. Rates round to 6 dp before
    the compare so the float boundary is engine-portable.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n_s"))
    tot = counts.agg(
        F.sum("_n_s").alias("_n"),
        F.sum(F.pow("_n_s", F.lit(float(alpha)))).alias("_z"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget_frac))
                * F.pow("_n_s", F.lit(float(alpha)))
                / F.col("_z")
                * F.col("_n")
                / F.col("_n_s"),
            ),
            6,
        ).alias("rate"),
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        hash_uniform(F.col(key_col)) < F.col("rate")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int,
    n_shards: int,
) -> DataFrame:
    """Deterministic global training-order shuffle: every example gets a
    content-derived pseudo-random rank, sharded for parallel consumption —
    the once-per-epoch shuffle a training data loader needs, replayable
    bit-for-bit across retries, cluster layouts, and engines.

    Two properties a naive ``orderBy(rand())`` can't give:

    - **determinism**: the order is a pure function of (seed, key) — a
      re-run after a failure feeds batches in the identical order, and a
      different ``seed`` gives an independent permutation per epoch;
    - **no global sort**: the shard is ``hash % n_shards`` (narrow) and
      the within-shard rank is a per-shard window after one hash
      repartition — cost is one exchange + local sorts, never a
      range-partitioned total sort. Consumers read shards in shard order
      (or in parallel, one per data-loader worker); uniform md5 keys make
      the shards size-balanced by construction.

    Output: ``(key_col, shard, pos)`` with ``pos`` the 1-based rank inside
    the shard (ties on the 60-bit hash broken by key, so the order is
    total). Join back to the payload table by ``key_col`` to materialize
    the epoch, or write ``partitionBy(shard)`` for loader-addressable
    files.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.window import Window

    # 60-bit hash of (seed : key): same construction as the samplers —
    # md5 hex → bigint, reproducible in the DuckDB oracle
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(int(seed))), F.col(key_col))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("hkey", key_col)
    return (
        df.select(F.col(key_col), h.alias("hkey"))
        .withColumn("shard", (F.col("hkey") % F.lit(int(n_shards))).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select(key_col, "shard", "pos")
    )
