"""Layout evolution: SnapshotTable.rebucket — in-place bucket-count change
with state/epoch/watermark preservation, correct routing of every later
merge and point lookup, and layout-pinned time travel."""

import pyarrow.compute as pc
import pyspark.sql.functions as F

from relational_data_loader_spark.cli import main
from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


def _rig(spark, warehouse, tmp_path, seed=41, buckets=4):
    tbl = generate_change_log(n_events=3000, n_convs=40, seed=seed)
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(tbl["lsn"]).as_py()
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=buckets)
    mgr = DataLoadManager(spark, warehouse)
    return tbl, logdir, max_lsn, spec, mgr


def test_rebucket_preserves_state_and_metadata(spark, warehouse, tmp_path):
    tbl, logdir, max_lsn, spec, mgr = _rig(spark, warehouse, tmp_path)
    write_log(tbl, logdir, lsn_upto=max_lsn)
    mgr.run(spec)
    t = mgr.table(spec)
    before = spark_sorted_pdf(t.read())
    m0 = t.current_manifest()
    v0 = m0["version"]
    assert int(m0["n_buckets"]) == 4

    assert t.rebucket(8) == 4
    m1 = t.current_manifest()
    assert m1["kind"] == "rebucket" and int(m1["n_buckets"]) == 8
    assert m1["applied_epochs"] == m0["applied_epochs"]
    assert m1["watermark"] == m0["watermark"]
    assert len(m1["buckets"]) == 8
    assert_tables_equal(spark_sorted_pdf(t.read()), before)

    # raw row counts identical — tombstones and internals survive the move
    raw0 = t._read_files([p for f in m0["buckets"].values() for p in f]).count()
    raw1 = t._read_files([p for f in m1["buckets"].values() for p in f]).count()
    assert raw0 == raw1

    # time travel: the pre-rebucket version reads the old layout's files
    assert_tables_equal(spark_sorted_pdf(t.read(version=v0)), before)

    # no-op and validation paths
    assert t.rebucket(8) == 0
    assert t.current_manifest()["version"] == m1["version"]


def test_merge_and_lookup_after_rebucket_use_new_layout(
    spark, warehouse, tmp_path
):
    tbl, logdir, max_lsn, spec, mgr = _rig(spark, warehouse, tmp_path, seed=43)
    write_log(tbl, logdir, lsn_upto=max_lsn // 2)
    mgr.run(spec)
    t = mgr.table(spec)
    assert t.rebucket(16) == 4

    # incremental merge lands on the NEW layout and the final state equals
    # the full-log oracle
    write_log(tbl, logdir, lsn_from=max_lsn // 2)
    r = mgr.run(spec)
    assert r.decision.kind == "incremental" and not r.skipped
    m = t.current_manifest()
    assert int(m["n_buckets"]) == 16
    assert_tables_equal(
        spark_sorted_pdf(t.read()), duck_final_state(f"{logdir}/*.parquet")
    )

    # point lookups hash against the new layout and still prune
    some = [
        r["conv_id"]
        for r in t.read().select("conv_id").distinct().limit(3).collect()
    ]
    got = t.read_keys(some)
    want = t.read().filter(F.col("conv_id").isin(some))
    k = lambda r: (r["conv_id"], r["turn_idx"], r["text"])
    assert sorted(map(k, got.collect())) == sorted(map(k, want.collect()))
    n_files_all = sum(len(v) for v in m["buckets"].values())
    scanned = got.select(F.input_file_name()).distinct().count()
    assert scanned < n_files_all


def test_cli_rebucket_flag(spark, warehouse, tmp_path, capsys):
    import json as _json
    import pathlib

    tbl, logdir, max_lsn, spec, mgr = _rig(spark, warehouse, tmp_path, seed=47)
    specdir = tmp_path / "specs"
    specdir.mkdir()
    pathlib.Path(specdir / "transcripts.json").write_text(spec.to_json())
    write_log(tbl, logdir, lsn_upto=max_lsn)
    assert main(["--warehouse", warehouse, "--specs", str(specdir)]) == 0
    capsys.readouterr()

    rc = main(
        ["--warehouse", warehouse, "--specs", str(specdir), "--rebucket", "8"]
    )
    assert rc == 0
    out = [
        _json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert out[-1]["rebucketed_from"] == 4 and out[-1]["rebucketed_to"] == 8
    t = mgr.table(spec)
    assert int(t.current_manifest()["n_buckets"]) == 8
    assert_tables_equal(
        spark_sorted_pdf(t.read()), duck_final_state(f"{logdir}/*.parquet")
    )
