"""Session-11 operators: skyline, record linkage, PSI drift, decayed IVM.

Each operator also has an oracle-paired catalog entry (test_entry_contract
covers the DuckDB twin); these tests pin the SEMANTIC properties the SQL
twin can't state — brute-force dominance equality, planted-duplicate
recall, block-cap drop behavior, multi-epoch rescale algebra.
"""

import pytest
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.incremental import (
    advance_decayed,
    decayed_rollup,
)
from relational_data_loader_spark.operators.linkage import blocked_edit_linkage
from relational_data_loader_spark.operators.quality import psi_drift
from relational_data_loader_spark.operators.skyline import skyline_2d


# ---------------------------------------------------------------- skyline
def _brute_skyline(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] >= a[1] and b[2] <= a[2] and (b[1] > a[1] or b[2] < a[2])
            for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties(spark):
    # deterministic pseudo-random points plus planted exact ties and a
    # dominated clone, spread across partitions so the map-side prune runs
    rows = [
        (i, float((i * 37) % 101), ((i * 53) % 89)) for i in range(400)
    ]
    rows += [(1000, 100.0, 0), (1001, 100.0, 0)]  # identical frontier pair
    rows += [(1002, 0.0, 88)]  # dominated by nearly everything
    df = spark.createDataFrame(rows, "id long, price double, d int").repartition(7)
    got = sorted(
        (r["id"], r["price"], r["d"])
        for r in skyline_2d(df, "price", "d").collect()
    )
    assert got == _brute_skyline(rows)
    ids = [g[0] for g in got]
    assert 1000 in ids and 1001 in ids  # ties don't dominate each other
    assert 1002 not in ids


def test_skyline_excludes_null_dimensions(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1), (2, None, 0), (3, 9.0, None)],
        "id long, price double, d int",
    )
    got = [r["id"] for r in skyline_2d(df, "price", "d").collect()]
    assert got == [1]


# ---------------------------------------------------------------- linkage
def test_linkage_finds_planted_duplicates(spark):
    clean = spark.createDataFrame(
        [
            (1, "Alice Smith", "AU", "RETAIL"),
            (2, "Bob Jones", "AU", "RETAIL"),
            (3, "Carol White", "NZ", "CORP"),
        ],
        "id long, name string, country string, seg string",
    )
    dirty = spark.createDataFrame(
        [
            (101, "alice  smith", "AU", "RETAIL"),  # case/space → dist<=2
            (102, "Bob Jonez", "AU", "RETAIL"),  # 1 edit
            (103, "Carol White", "AU", "RETAIL"),  # wrong block: no link
            (104, "Zzzzz Qqqqq", "NZ", "CORP"),  # far: no link
        ],
        "id long, name string, country string, seg string",
    )
    pairs = {
        (r["left_id"], r["right_id"], r["edit_dist"])
        for r in blocked_edit_linkage(
            dirty, clean, "id", "name", ["country", "seg"], max_dist=2
        ).collect()
    }
    assert (101, 1, 1) in pairs  # case folded; inner double-space = 1 edit
    assert (102, 2, 1) in pairs
    assert not any(lid == 103 for lid, _, _ in pairs)
    assert not any(lid == 104 for lid, _, _ in pairs)


def test_linkage_block_cap_drops_hot_block(spark):
    # 30 identical-block rows vs cap 10: the hot block must vanish rather
    # than go quadratic; the small block still links
    left = spark.createDataFrame(
        [(i, "same name", "HOT", "X") for i in range(30)]
        + [(100, "tiny name", "COLD", "X")],
        "id long, name string, b string, seg string",
    )
    right = spark.createDataFrame(
        [(200 + i, "same name", "HOT", "X") for i in range(30)]
        + [(300, "tiny namez", "COLD", "X")],
        "id long, name string, b string, seg string",
    )
    got = blocked_edit_linkage(
        left, right, "id", "name", ["b", "seg"], max_dist=2, max_block=10
    ).collect()
    assert {(r["left_id"], r["right_id"]) for r in got} == {(100, 300)}


# -------------------------------------------------------------- psi drift
def test_psi_zero_when_halves_identical(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for half in (0, 1):
        for i in range(200):
            rows.append(
                ("a", float(i % 10), base + dt.timedelta(hours=half * 100 + i % 50))
            )
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    out = psi_drift(df, "event_type", "value", "ts").collect()
    assert len(out) == 1
    # identical histograms → every (p−q) term is 0 → psi exactly 0
    assert out[0]["psi"] == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_shifted_group(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        early = base + dt.timedelta(minutes=i)
        late = base + dt.timedelta(days=10, minutes=i)
        rows.append(("stable", float(i % 20), early))
        rows.append(("stable", float(i % 20), late))
        rows.append(("drifted", float(i % 20), early))
        rows.append(("drifted", float(i % 20) + 15.0, late))  # mass shift
    df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    psi = {r["event_type"]: r["psi"] for r in psi_drift(df, "event_type", "value", "ts").collect()}
    assert psi["stable"] < 0.01
    assert psi["drifted"] > 0.25  # "major shift" band
    assert psi["drifted"] > psi["stable"] * 10


# ----------------------------------------------------------- decayed IVM
def test_decayed_two_epoch_fold_equals_recompute(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i % 5, float(i % 7 + 1), base + dt.timedelta(hours=i * 3))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "k long, v double, ts timestamp")
    hl = 86400.0 * 2  # 2-day half-life: decay visible across the span
    cuts = [base + dt.timedelta(days=10), base + dt.timedelta(days=20)]
    final_anchor = base + dt.timedelta(days=30)

    # three epochs folded through two anchor advances
    a0, a1, a2 = (F.lit(c) for c in (cuts[0], cuts[1], final_anchor))
    e0 = df.filter(F.col("ts") < cuts[0])
    e1 = df.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]))
    e2 = df.filter(F.col("ts") >= cuts[1])
    state = decayed_rollup(e0, "k", "v", "ts", hl, a0)
    state = advance_decayed(state, decayed_rollup(e1, "k", "v", "ts", hl, a1), a0, a1, hl)
    state = advance_decayed(state, decayed_rollup(e2, "k", "v", "ts", hl, a2), a1, a2, hl)

    direct = decayed_rollup(df, "k", "v", "ts", hl, a2)
    got = {r["key"]: r["score"] for r in state.collect()}
    want = {r["key"]: r["score"] for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_decayed_keys_absent_from_delta_survive_rescaled(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 8.0, base)], "k long, v double, ts timestamp"
    )
    hl = 86400.0
    a_old, a_new = F.lit(base), F.lit(base + dt.timedelta(days=3))
    state = decayed_rollup(df, "k", "v", "ts", hl, a_old)
    empty = state.filter(F.lit(False))
    out = advance_decayed(state, empty, a_old, a_new, hl).collect()
    assert len(out) == 1
    assert out[0]["score"] == pytest.approx(1.0)  # 8 · 0.5³
