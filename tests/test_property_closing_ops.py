"""Hypothesis property families for the closing-session operators:
merge_asof (all directions, random keys/tolerances) and duplicated_spans /
cut_duplicated_spans (random small-alphabet corpora, where cross-doc
repeats are dense) — each checked against a brute-force Python oracle,
derandomized so the driver's pytest gate is reproducible.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from relational_data_loader_spark.operators.asof import merge_asof
from relational_data_loader_spark.operators.contamination import (
    cut_duplicated_spans,
    duplicated_spans,
)

# ------------------------------------------------------------- merge_asof
# distinct on-keys per side (the operator's documented uniqueness contract)
_keys = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=12, unique=True
)


def _brute_asof(left, right, direction, tolerance):
    out = {}
    for k, t in left:
        cands = [(rt, v) for rk, rt, v in right if rk == k]
        if direction == "backward":
            c = [x for x in cands if x[0] <= t]
            best = max(c, key=lambda x: x[0]) if c else None
        elif direction == "forward":
            c = [x for x in cands if x[0] >= t]
            best = min(c, key=lambda x: x[0]) if c else None
        else:
            best = None
            for rt, v in cands:
                if best is None or abs(rt - t) < abs(best[0] - t) or (
                    abs(rt - t) == abs(best[0] - t) and rt < t <= best[0]
                ):
                    best = (rt, v)
        if best is not None and tolerance is not None and abs(best[0] - t) > tolerance:
            best = None
        out[(k, t)] = best
    return out


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lk=_keys,
    rk=_keys,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=15)),
)
def test_merge_asof_matches_bruteforce(spark, lk, rk, direction, tolerance):
    left = [("a", t) for t in lk] + [("b", t) for t in lk[:3]]
    right = [("a", t, f"v{t}") for t in rk]  # key 'b' has NO right rows
    l = spark.createDataFrame(left, "k string, t long")
    r = spark.createDataFrame(right, "k string, t long, val string")
    got = {
        (row["k"], row["t"]): (
            None if row["val_r"] is None else (int(row["_asof_on_r"]), row["val_r"])
        )
        for row in merge_asof(
            l, r, by="k", on="t", value_cols=["val"],
            direction=direction, tolerance=tolerance,
        ).collect()
    }
    assert got == _brute_asof(left, right, direction, tolerance)


# ------------------------------------------------- duplicated spans / cut
_doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=24
).map(" ".join)


def _brute_spans(docs, k):
    """(doc_id -> sorted maximal spans, doc_id -> cut-position set)."""
    grams: dict[str, dict[int, int]] = {}  # ngram -> {doc: count}
    toks = {i: t.split(" ") for i, t in docs}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            g = " ".join(ts[p : p + k])
            grams.setdefault(g, {})[i] = grams.get(g, {}).get(i, 0) + 1
    dup = {g for g, d in grams.items() if len(d) >= 2}
    owner = {
        g: min(d) for g, d in grams.items() if g in dup
    }
    spans, cuts = {}, {}
    for i, ts in toks.items():
        hits = [
            p
            for p in range(len(ts) - k + 1)
            if " ".join(ts[p : p + k]) in dup
        ]
        merged = []
        for p in hits:
            if merged and p <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], p + k))
            else:
                merged.append((p, p + k))
        if merged:
            spans[i] = merged
        cut = set()
        for p in hits:
            g = " ".join(ts[p : p + k])
            if owner[g] != i:
                cut.update(range(p, p + k))
        cuts[i] = cut
    return spans, cuts


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=2, max_size=8))
def test_spans_and_cut_match_bruteforce(spark, texts):
    k = 3
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exp_spans, exp_cuts = _brute_spans(docs, k)

    got_spans: dict[int, list] = {}
    for r in duplicated_spans(df, "text", "doc_id", k=k).collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert {i: sorted(v) for i, v in got_spans.items()} == exp_spans

    for r in cut_duplicated_spans(df, "text", "doc_id", k=k).collect():
        i = r["doc_id"]
        toks = texts[i].split(" ")
        kept = [t for p, t in enumerate(toks) if p not in exp_cuts[i]]
        assert r["clean_text"] == " ".join(kept), i
        assert r["n_cut"] == len(exp_cuts[i]), i
