"""Hot-key skew family (SURVEY.md §5.2): one conversation owning ~30% of all
events must neither break correctness nor stall the merge."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, duck_final_state, spark_sorted_pdf, write_log


def _skewed_log(n_events: int = 6000) -> pa.Table:
    """Fixture log with one conv_id rewritten onto ~30% of events."""
    tbl = generate_change_log(n_events=n_events, n_convs=100, seed=9)
    conv = tbl["conv_id"].to_pylist()
    rng = np.random.default_rng(1)
    hot_rows = rng.random(len(conv)) < 0.3
    conv = ["conv_hot00" if h else c for c, h in zip(conv, hot_rows)]
    return tbl.set_column(
        tbl.schema.get_field_index("conv_id"), "conv_id", pa.array(conv)
    )


def test_hot_key_replay_matches_oracle(spark, warehouse, tmp_path):
    tbl = _skewed_log()
    logdir = str(tmp_path / "log")
    max_lsn = pc.max(tbl["lsn"]).as_py()
    cut = max_lsn // 2
    write_log(tbl, logdir, lsn_upto=cut)

    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=8)
    mgr = DataLoadManager(spark, warehouse)
    mgr.run(spec)
    write_log(tbl, logdir, lsn_from=cut)
    res = mgr.run(spec)
    assert res.decision.kind == "incremental"

    got = spark_sorted_pdf(mgr.table(spec).read())
    want = duck_final_state(f"{logdir}/*.parquet")
    assert_tables_equal(got, want)
    # the hot conversation really is hot and survived netting per turn
    assert (got["conv_id"] == "conv_hot00").sum() > 0
