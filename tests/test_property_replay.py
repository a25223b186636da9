"""Property-based check (hypothesis): for ANY valid change log, the engine's
committed state equals an independent pandas replay — across randomized op
sequences, key collisions, delete/reinsert patterns, and split points.

Spark session startup dominates, so the property drives the netting + merge
semantics through the engine with small logs and few examples; the seeded
fixture families cover volume.
"""

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import write_log

_event = st.tuples(
    st.integers(0, 5),        # conv
    st.integers(0, 3),        # turn
    st.sampled_from("IUD"),   # op
    st.text(alphabet="abcé ", min_size=0, max_size=8),
)


def _to_table(events: list) -> pa.Table:
    rows = []
    for lsn, (conv, turn, op, text) in enumerate(events, start=1):
        d = op == "D"
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "role": None if d else "user",
                "text": None if d else text,
                "tool": None if d else "",
                "ts": None if d else pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=lsn),
            }
        )
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    schema = pa.schema(
        [
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    # explicit schema: an all-delete log has all-None payload columns, which
    # pandas would otherwise infer as a non-string type
    return pa.Table.from_pandas(df[schema.names], schema=schema, preserve_index=False)


def _pandas_oracle(events: list) -> pd.DataFrame:
    state: dict = {}
    for lsn, (conv, turn, op, text) in enumerate(events, start=1):
        k = (f"c{conv}", turn)
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (lsn, text)
    out = pd.DataFrame(
        [(c, t, txt) for (c, t), (_, txt) in state.items()],
        columns=["conv_id", "turn_idx", "text"],
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # deterministic for the driver's pytest gate
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=1, max_size=60),
    split_frac=st.floats(0.1, 0.9),
)
def test_replay_equals_pandas_oracle(spark, tmp_path_factory, events, split_frac):
    tmp = tmp_path_factory.mktemp("prop")
    logdir = str(tmp / "log")
    tbl = _to_table(events)
    cut = max(int(len(events) * split_frac), 1)

    write_log(tbl, logdir, n_files=2, lsn_upto=cut)
    spec = transcripts_spec(source=f"parquet://{logdir}", target_buckets=4)
    mgr = DataLoadManager(spark, str(tmp / "wh"))
    mgr.run(spec)
    if cut < len(events):
        write_log(tbl, logdir, n_files=2, lsn_from=cut)
        res = mgr.run(spec)
        assert res.decision.kind == "incremental"

    got = (
        mgr.table(spec)
        .read()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = _pandas_oracle(events)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=1, max_size=60),
    split_frac=st.floats(0.1, 0.9),
    compact_mid=st.booleans(),
    partial=st.booleans(),
)
def test_mor_replay_equals_pandas_oracle(
    spark, tmp_path_factory, events, split_frac, compact_mid, partial
):
    """The same property, through the merge-on-read write path — and with a
    (possibly partial, worst-buckets-first) compaction injected between the
    two engine runs on half the examples: ANY interleaving of delta-append
    epochs and compactions must land on the pandas oracle's state."""
    tmp = tmp_path_factory.mktemp("prop_mor")
    logdir = str(tmp / "log")
    tbl = _to_table(events)
    cut = max(int(len(events) * split_frac), 1)

    write_log(tbl, logdir, n_files=2, lsn_upto=cut)
    spec = transcripts_spec(
        source=f"parquet://{logdir}", target_buckets=4, merge_mode="mor",
        batch_size=7,  # tiny chunks → several delta epochs per run
    )
    mgr = DataLoadManager(spark, str(tmp / "wh"))
    mgr.run(spec)
    if cut < len(events):
        write_log(tbl, logdir, n_files=2, lsn_from=cut)
        mgr.run(spec)
        if compact_mid:
            mgr.table(spec).compact_deltas(max_buckets=1 if partial else None)
        # a second, fully-redundant run must skip and change nothing
        res = mgr.run(spec)
        assert res.skipped

    got = (
        mgr.table(spec)
        .read()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = _pandas_oracle(events)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
