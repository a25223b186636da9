"""Z-order layout: Morton arithmetic, deterministic file assignment,
multi-column locality, and the sink's ZORDER-compaction rewrite."""

import pyarrow.compute as pc
import pyspark.sql.functions as F
import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.operators.layout import (
    zorder_assign,
    zorder_code_expr,
    zorder_file_stats,
    zorder_skipping_gain,
)
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from relational_data_loader_spark.sinks.snapshot import LSN_COL
from tests.util import assert_tables_equal, spark_sorted_pdf, write_log


def _py_morton(vals, bits):
    z = 0
    nd = len(vals)
    for d, v in enumerate(vals):
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * nd + d)
    return z


def test_morton_interleave_known_bits(spark):
    # b0=0b11, b1=0b01, bits=2: positions 0,2 from dim0 -> 1,1; position 1
    # from dim1 -> 1; position 3 -> 0 => z = 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], ["b0", "b1"])
    z = df.select(
        zorder_code_expr([F.col("b0"), F.col("b1")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 7 == _py_morton([3, 1], 2)


def test_zorder_assign_matches_python_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = zorder_assign(df, ["x", "y"], bits=4, n_files=4).collect()
    for r in got:
        # ranges are exactly [0,15] so bucket == value
        assert r["zcode"] == _py_morton([r["x"], r["y"]], 4)
        assert r["file_id"] == r["zcode"] >> 6  # 8 z-bits, 4 files


def test_zorder_assign_rejects_bad_file_counts(spark):
    df = spark.createDataFrame([(1, 2)], ["x", "y"])
    with pytest.raises(ValueError, match="power of two"):
        zorder_assign(df, ["x", "y"], bits=4, n_files=6)
    with pytest.raises(ValueError, match="exceeds"):
        zorder_assign(df, ["x", "y"], bits=2, n_files=32)


def test_zorder_locality_beats_linear_on_second_column(spark):
    # uniform 64x64 grid: a linear sort on x gives y-spans ~ the full
    # domain in every file; z-order gives both dimensions ~sqrt locality
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    gain = {
        r["col_name"]: r
        for r in zorder_skipping_gain(df, ["x", "y"], bits=6, n_files=16).collect()
    }
    assert gain["y"]["span_ratio"] < 0.3  # the win
    assert gain["y"]["zorder_span"] < 0.3 < gain["y"]["linear_span"]
    assert gain["x"]["span_ratio"] > 1.0  # the price on the leading key
    # file stats cover all rows across the deterministic assignment
    stats = zorder_file_stats(df, ["x", "y"], bits=6, n_files=16).collect()
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    assert len(stats) == 16


def test_sink_optimize_zorder_preserves_state_and_orders_rows(
    spark, warehouse, tmp_path
):
    tbl = generate_change_log(n_events=3000, n_convs=40, seed=29)
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(tbl["lsn"]).as_py()
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, warehouse)
    write_log(tbl, logdir, lsn_upto=max_lsn)
    mgr.run(spec)

    t = mgr.table(spec)
    before = spark_sorted_pdf(t.read())
    m0 = t.current_manifest()

    t.optimize(zorder_cols=["turn_idx", LSN_COL], zorder_bits=8)
    m1 = t.current_manifest()
    assert m1["kind"] == "optimize"
    assert m1["applied_epochs"] == m0["applied_epochs"]
    assert m1["watermark"] == m0["watermark"]

    # logical content untouched; zcode/file_id never leak into storage
    after = spark_sorted_pdf(t.read())
    assert_tables_equal(after, before)
    raw = t._read_files([p for f in m1["buckets"].values() for p in f])
    assert "zcode" not in raw.columns and "file_id" not in raw.columns

    # rows inside each rewritten bucket file follow the Morton order over
    # (turn_idx, lsn) scaled by the GLOBAL min/max the rewrite used
    pdf_all = raw.toPandas()
    mins = {c: int(pdf_all[c].min()) for c in ("turn_idx", LSN_COL)}
    maxs = {c: int(pdf_all[c].max()) for c in ("turn_idx", LSN_COL)}

    def bucket(v, c):
        span = maxs[c] - mins[c] + 1
        return min(255, max(0, ((int(v) - mins[c]) * 256) // span))

    for files in m1["buckets"].values():
        pdf = t._read_files(files).toPandas()
        # plain tuples: itertuples would mangle the leading-underscore
        # internal column name
        zs = [
            _py_morton([bucket(ti, "turn_idx"), bucket(ls, LSN_COL)], 8)
            for ti, ls in pdf[["turn_idx", LSN_COL]].itertuples(
                index=False, name=None
            )
        ]
        assert zs == sorted(zs)
