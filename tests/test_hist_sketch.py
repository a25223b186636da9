"""hist_quantile_rollup (operators/sketch.py): merge-equals-rebuild,
bin-width error bound, edge clamping, and exact integer-rank readout."""

import pyspark.sql.functions as F

from relational_data_loader_spark.operators.sketch import hist_quantile_rollup


def _df(spark, rows):
    return spark.createDataFrame(rows, ["g", "unit", "v"])


def test_merge_equals_rebuild(spark):
    # same values split over 3 days vs crammed into 1 day: the merged
    # period estimate must be identical — the merge is exact addition
    vals = [float(i % 97) + 0.5 for i in range(300)]
    split = _df(spark, [("a", i % 3, v) for i, v in enumerate(vals)])
    whole = _df(spark, [("a", 0, v) for v in vals])
    kw = dict(lo=0.0, hi=100.0, n_bins=50)
    r_split = hist_quantile_rollup(split, "g", "unit", "v", **kw).first()
    r_whole = hist_quantile_rollup(whole, "g", "unit", "v", **kw).first()
    for c in ("p50_est", "p95_est", "p99_est", "n_rows"):
        assert r_split[c] == r_whole[c]
    assert r_split["n_units"] == 3 and r_whole["n_units"] == 1


def test_error_bounded_by_bin_width(spark):
    # uniform-ish values: every quantile estimate must land within one
    # bin width of the exact interpolated percentile
    rows = [("a", i % 5, float((i * 37) % 400) + 0.25) for i in range(1000)]
    df = _df(spark, rows)
    r = hist_quantile_rollup(
        df, "g", "unit", "v", lo=0.0, hi=400.0, n_bins=100
    ).first()
    width = 4.0
    assert r["p95_abs_err"] <= width
    exact = df.agg(F.expr("percentile(v, 0.5)")).first()[0]
    assert abs(r["p50_est"] - exact) <= width


def test_clamps_out_of_range_into_edge_bins(spark):
    # values beyond hi land in the last bin: p99 caps at hi, no crash
    rows = [("a", 0, 5.0)] * 50 + [("a", 0, 1e9)] * 50
    r = hist_quantile_rollup(
        _df(spark, rows), "g", "unit", "v", lo=0.0, hi=10.0, n_bins=10
    ).first()
    assert r["n_rows"] == 100
    assert r["p99_est"] <= 10.0  # clamped mass interpolates inside [lo, hi)


def test_integer_rank_readout_exact_on_aligned_data(spark):
    # 100 values 0..99 with unit bins: k_q = ceil(q*100) lands exactly,
    # est = bin + fraction-of-one-count — deterministic and checkable by hand
    rows = [("a", 0, float(i) + 0.5) for i in range(100)]
    r = hist_quantile_rollup(
        _df(spark, rows), "g", "unit", "v", lo=0.0, hi=100.0, n_bins=100
    ).first()
    # k_50 = 50 -> bin 49 (cum 50), fraction (50-49)/1 = 1 -> est 50.0
    assert r["p50_est"] == 50.0
    assert r["p95_est"] == 95.0
    assert r["p99_est"] == 99.0
