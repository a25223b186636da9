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


def bpe_tokens(col: Column) -> Column:
    """BPE-ish regex pre-tokenization (array<string>): letter runs, single
    digits, single non-alphanumeric marks — the GPT-2-style split shape
    that byte-pair merges start from, minus the byte-level merges
    themselves. Pure regexp (codegen), and the pattern uses only portable
    character classes so DuckDB's RE2 and Java's Pattern agree (both are
    codepoint-aware for classes, including astral-plane emoji)."""
    return F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col)).cast("bigint")


# rolling-hash fingerprint parameters (shared with the DuckDB oracle SQL)
ROLLING_BASE = 131
ROLLING_MOD = 1_000_000_007


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the whitespace-token stream, ``h = fold(h*131 + v(tok)) mod 1e9+7``
    with ``v(tok) = codepoint(first char)*256 + len(tok)``.

    Unlike the md5 ``fingerprint`` (content-identity), the rolling hash is
    sequence-sensitive — token permutations change it — which is what
    incremental/windowed fingerprinting schemes roll at 100 TB. Entirely
    JVM-side (``transform`` + ``aggregate`` array expressions, no shuffle,
    no Python); the fold starts from the first token's value (DuckDB's
    ``list_reduce`` has no init parameter, so the oracle and engine share
    fold-from-first semantics)."""
    vals = F.transform(
        tokens(col), lambda t: (F.ascii(t) * 256 + F.length(t)).cast("long")
    )
    return F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: (acc * ROLLING_BASE + v) % F.lit(ROLLING_MOD),
    )


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


# -- n-gram language identification ----------------------------------------

# Character-trigram profiles (the classic Cavnar–Trenkle n-gram heuristic,
# reduced to a fixed literal profile per language). Weights are INTEGERS so
# scoring is exact arithmetic — a DuckDB oracle reproduces every score
# bit-for-bit. Space acts as a word-boundary character, so boundary
# trigrams like 'th' at word start ("• th") discriminate as in the paper.
LANG_TRIGRAM_PROFILES: dict[str, dict[str, int]] = {
    "en": {"the": 5, "he ": 4, " th": 4, "ing": 4, "and": 4, "ion": 3,
           "ent": 2, " of": 3, "of ": 3, "ed ": 2, " to": 2, "to ": 2,
           " an": 2, "nd ": 3, "er ": 2, " in": 2},
    "de": {"der": 5, "die": 5, "und": 5, "sch": 4, "ein": 4, "ich": 4,
           "nde": 3, "den": 3, "cht": 3, " de": 3, "en ": 4, "ch ": 3,
           "ung": 3, "gen": 3, " ge": 2, "ber": 2},
    "fr": {"les": 5, "ent": 4, " de": 4, "de ": 4, "ion": 3, "que": 4,
           " le": 4, "la ": 3, " la": 3, "ait": 3, "et ": 3, " et": 3,
           "ur ": 2, " qu": 3, "res": 2, "eur": 2},
}


def lang_trigrams(col: Column) -> Column:
    """All character trigrams of the normalized text (lowercase, runs of
    non-letters collapsed to single spaces) — pure JVM array expression.
    Texts shorter than 3 normalized chars yield an empty array."""
    norm = F.regexp_replace(F.lower(col), "[^a-z]+", " ")
    return F.when(
        F.length(norm) < 3, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 2),
            lambda i: norm.substr(i, F.lit(3)),
        )
    )


def _lang_weight_patterns() -> list[tuple[str, int, str]]:
    """One zero-width-lookahead alternation pattern per (lang, weight):
    ``(?=(?:tri_a|tri_b|...))``.

    ``regexp_count`` over such a pattern counts every POSITION where any
    trigram of that weight class starts — the lookahead makes matches
    zero-width, so overlapping occurrences of different trigrams are all
    seen (``Matcher.find`` bumps one char on an empty match). At a fixed
    position at most ONE length-3 string can match, so the count is exactly
    Σ positional-occurrences over the class, and weight·count sums to the
    Cavnar–Trenkle positional score the DuckDB oracle computes by
    extraction. Trigrams are lowercase letters/spaces only — no regex
    metacharacters to escape (asserted).
    """
    out = []
    for lang, prof in LANG_TRIGRAM_PROFILES.items():
        by_w: dict[int, list[str]] = {}
        for tri, w in prof.items():
            assert all(c == " " or "a" <= c <= "z" for c in tri), tri
            by_w.setdefault(w, []).append(tri)
        for w, tris in sorted(by_w.items()):
            out.append((lang, w, "(?=(?:" + "|".join(sorted(tris)) + "))"))
    return out


def lang_score_exprs(norm: Column) -> list[tuple[str, Column]]:
    """(lang, integer-score Column) per profile language over an
    already-materialized normalized-text column: Σ weight ·
    regexp_count(weight-class pattern) — ~12 single-pass regex scans in one
    narrow codegen projection, versus the prior plan's per-position explode
    + 48-row broadcast join + groupBy + window."""
    pats = _lang_weight_patterns()
    out: list[tuple[str, Column]] = []
    for lang in LANG_TRIGRAM_PROFILES:
        terms = [
            F.regexp_count(norm, F.lit(p)).cast("long") * F.lit(w)
            for plang, w, p in pats
            if plang == lang
        ]
        score = terms[0]
        for t in terms[1:]:
            score = score + t
        out.append((lang, score))
    return out


def _one_to_one(col: Column, alias: str) -> Column:
    """``explode(array(col))`` — a 1:1 Generate that materializes ``col`` as
    a real attribute. Used as a projection barrier: CollapseProject will
    happily inline an expensive Project alias into every downstream
    reference (measured on lang_id: the normalization regexp inlined 96×),
    but it cannot collapse through a Generate, so everything downstream
    references the attribute and the expression runs exactly once per row.
    """
    return F.explode(F.array(col)).alias(alias)


def fan_out_if_narrow(df, min_partitions: int | None = None):
    """Round-robin repartition ONLY when the scan has fewer splits than the
    session's parallelism. On a real 100 TB input this is a no-op — file
    splits vastly outnumber cores, so no exchange is added — but a
    single-file local fixture would otherwise serialize a compute-heavy
    narrow projection on one task while 31 cores idle. The check reads
    split counts from the planned RDD (no job is run)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def lang_id(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document argmax trigram-profile language (DataFrame → DataFrame
    with id, lang, score). ONE implementation shared by the paired query
    and the tests.

    Plan (round 4): SHUFFLE-FREE on any real (multi-split) input. The
    round-3 plan exploded every character position's trigram and
    broadcast-joined the 48-row profile table — 34% of the whole bench
    headline spent materializing ~|text| rows per doc when only 48 distinct
    trigrams ever match. Now each language's score is Σ weight ·
    regexp_count(weight-class lookahead pattern) — ~12 single-pass regex
    scans per row, all codegen — and the argmax is ``array_max`` over
    (score, tiebreak, lang) structs: scan → project → filter, no explode of
    data, no join, no aggregation, no exchange (the only conditional
    exchange is ``fan_out_if_narrow`` for single-file local fixtures).
    Both the normalization and the best-struct ride ``_one_to_one``
    Generate barriers so each is evaluated exactly once per row
    (plan-gated: a single regexp_replace in the optimized plan).
    Semantics unchanged vs round 3: integer scores, lexicographic-ascending
    tie-break, docs with zero profile evidence (or NULL text) excluded.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
    based = fan_out_if_narrow(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select(F.col("doc_id"), _one_to_one(norm, "_norm"))
    scores = lang_score_exprs(F.col("_norm"))
    # tie-break: max over structs picks the highest second field on equal
    # scores, so rank langs in REVERSE lexicographic order → ties resolve
    # to the alphabetically-first language, as before
    tb = {lang: i for i, lang in enumerate(sorted(LANG_TRIGRAM_PROFILES, reverse=True))}
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s.alias("score"),
                    F.lit(tb[lang]).alias("tb"),
                    F.lit(lang).alias("lang"),
                )
                for lang, s in scores
            ]
        )
    )
    return (
        based.select("doc_id", _one_to_one(best, "_b"))
        .filter(F.col("_b.score") > 0)
        .select(
            "doc_id",
            F.col("_b.lang").alias("lang"),
            F.col("_b.score").cast("long").alias("score"),
        )
    )


def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams over an ALREADY-MATERIALIZED token-array column.

    Callers must pass a real column attribute, not the tokens() expression
    inline: every element_at inside the transform lambda inlines its
    argument, so an inline split re-tokenizes the document once per n-gram
    element — O(tokens²) re-splitting, measured 5.5 s vs 0.6 s on 500 docs.
    """
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


# -- PII scrubbing -----------------------------------------------------------

# Patterns restricted to syntax RE2 (DuckDB) and java.util.regex agree on:
# plain character classes and bounded repetition, no lookaround, no \d
# shorthand (class semantics differ under unicode flags across engines).
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii(col: Column) -> Column:
    """Replace email addresses and NNN-NNN-NNNN phone numbers with typed
    placeholder tags. Two single-pass codegen regexp_replace calls — the
    standard pre-training scrub stage, linear per row, no shuffle. Email
    runs first so a digit-bearing local part is consumed as <EMAIL>, not
    half-eaten as a phone number."""
    out = F.regexp_replace(col, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_PATTERN, "<PHONE>")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) occurrence counts — the audit metric a scrub
    stage must emit so corpus-level PII rates are monitorable."""
    return (
        F.regexp_count(col, F.lit(PII_EMAIL_PATTERN)).cast("bigint"),
        F.regexp_count(
            F.regexp_replace(col, PII_EMAIL_PATTERN, "<EMAIL>"),
            F.lit(PII_PHONE_PATTERN),
        ).cast("bigint"),
    )


def duplicate_ngram_fraction_from_tokens(toks: Column, n: int) -> Column:
    """Fraction of word n-gram OCCURRENCES that are repeats of an earlier
    occurrence within the same document: 1 - distinct/total. The
    Gopher/MassiveText repetition rule — high values flag boilerplate and
    degenerate generations. NULL when the doc has no n-grams.
    ``toks`` must be a materialized token-array column (see
    word_ngrams_from_tokens)."""
    grams = word_ngrams_from_tokens(toks, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(None).cast("double")).otherwise(
        1.0 - F.size(F.array_distinct(grams)).cast("double") / total.cast("double")
    )
