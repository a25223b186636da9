"""Debezium envelope source (sources/debezium.py) — the binlog/WAL wire
format parsed into the engine's change schema and replayed end-to-end.

The reference's analog is the CHANGETABLE scan (SURVEY.md §2.1 S2); these
tests assert the Debezium path is replay-equivalent to the parquet change
log the rest of the suite uses: same fixture → same final table state."""

import json
import os

import pytest

from relational_data_loader_spark.fixtures import generate_change_log
from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.sources.debezium import parse_debezium
from relational_data_loader_spark.spec import transcripts_spec
from tests.util import assert_tables_equal, spark_sorted_pdf, write_log


def _dbz_doc(row: dict) -> str:
    """One fixture change-log row → a Debezium envelope JSON document."""
    image = {
        "conv_id": row["conv_id"],
        "turn_idx": row["turn_idx"],
        "role": row["role"],
        "text": row["text"],
        "tool": row["tool"],
        "ts": row["ts"].isoformat() if row["ts"] is not None else None,
    }
    if row["op"] == "D":
        op, before, after = "d", {k: image[k] for k in ("conv_id", "turn_idx")}, None
    elif row["op"] == "I":
        op, before, after = "c", None, image
    else:
        op, before, after = "u", image, image
    return json.dumps(
        {
            "op": op,
            "ts_ms": int(row["lsn"]) * 1000,
            "before": before,
            "after": after,
            "source": {"lsn": int(row["lsn"])},
        },
        ensure_ascii=False,
    )


def write_dbz_log(tbl, path: str, n_files: int = 4, prefix: str = "log") -> None:
    """Write a change-log pyarrow table as Debezium JSON-lines segments."""
    os.makedirs(path, exist_ok=True)
    pdf = tbl.to_pandas().sort_values("lsn").reset_index(drop=True)
    rows = pdf.where(pdf.notnull(), None).to_dict("records")
    step = (len(rows) + n_files - 1) // max(n_files, 1)
    for i in range(n_files):
        chunk = rows[i * step : (i + 1) * step]
        if not chunk:
            continue
        with open(os.path.join(path, f"{prefix}-{i:05d}.jsonl"), "w") as f:
            for r in chunk:
                f.write(_dbz_doc(r) + "\n")


def test_debezium_replay_equals_parquet_replay(spark, tmp_path):
    """Full e2e: the same fixture replayed from debezium:// and parquet://
    sources lands byte-identical final table state."""
    tbl = generate_change_log(n_events=1500, n_convs=30, seed=77)
    pq_dir, dbz_dir = str(tmp_path / "pqlog"), str(tmp_path / "dbzlog")
    write_log(tbl, pq_dir)
    write_dbz_log(tbl, dbz_dir)

    mgr_a = DataLoadManager(spark, str(tmp_path / "wh_a"))
    mgr_b = DataLoadManager(spark, str(tmp_path / "wh_b"))
    spec_a = transcripts_spec(source=f"parquet://{pq_dir}", target_buckets=4)
    spec_b = transcripts_spec(source=f"debezium://{dbz_dir}", target_buckets=4)
    mgr_a.run(spec_a)
    res_b = mgr_b.run(spec_b)
    assert res_b.decision.kind == "full_refresh"

    got_a = spark_sorted_pdf(mgr_a.table(spec_a).read())
    got_b = spark_sorted_pdf(mgr_b.table(spec_b).read())
    assert_tables_equal(got_b, got_a)

    # incremental leg: append a second debezium segment and re-run both
    tbl2 = generate_change_log(n_events=2200, n_convs=30, seed=77)
    import pyarrow.compute as pc

    delta = tbl2.filter(pc.greater(tbl2["lsn"], tbl.num_rows - 1))
    write_log(tbl2, pq_dir, lsn_from=tbl.num_rows - 1)
    write_dbz_log(delta, dbz_dir, prefix="delta")
    res_a2 = mgr_a.run(spec_a)
    res_b2 = mgr_b.run(spec_b)
    assert res_a2.decision.kind == res_b2.decision.kind == "incremental"
    assert_tables_equal(
        spark_sorted_pdf(mgr_b.table(spec_b).read()),
        spark_sorted_pdf(mgr_a.table(spec_a).read()),
    )


def test_debezium_parse_semantics(spark):
    """Envelope mapping invariants: r→I, keys-from-before on delete with NULL
    payload, tombstones and blank lines dropped."""
    spec = transcripts_spec(source="debezium:///dev/null")
    docs = [
        # snapshot read → insert
        json.dumps({"op": "r", "before": None, "source": {"lsn": 1},
                    "after": {"conv_id": "c1", "turn_idx": 0, "role": "user",
                              "text": "hi", "tool": None,
                              "ts": "2024-01-02T03:04:05.123456"}}),
        # delete: keys only in before
        json.dumps({"op": "d", "after": None, "source": {"lsn": 2},
                    "before": {"conv_id": "c1", "turn_idx": 0, "role": "user",
                               "text": "hi", "tool": None, "ts": None}}),
        "",          # blank line → dropped
        "   ",       # whitespace line → dropped
        "null",      # JSON-null tombstone → dropped
    ]
    df = spark.createDataFrame([(d,) for d in docs], "value string")
    out = parse_debezium(df, spec).orderBy("lsn").collect()
    assert len(out) == 2
    ins, dele = out
    assert (ins["op"], ins["conv_id"], ins["turn_idx"], ins["text"]) == (
        "I", "c1", 0, "hi")
    assert ins["ts"].microsecond == 123456
    assert (dele["op"], dele["conv_id"], dele["turn_idx"]) == ("D", "c1", 0)
    # payload NULL on delete — the change_schema contract
    assert dele["role"] is None and dele["text"] is None and dele["ts"] is None


def test_debezium_unknown_op_fails(spark):
    spec = transcripts_spec(source="debezium:///dev/null")
    doc = json.dumps({"op": "x", "after": {"conv_id": "c", "turn_idx": 0},
                      "before": None, "source": {"lsn": 1}})
    df = spark.createDataFrame([(doc,)], "value string")
    with pytest.raises(Exception, match="unknown op"):
        parse_debezium(df, spec).collect()


def test_debezium_malformed_fails(spark):
    spec = transcripts_spec(source="debezium:///dev/null")
    df = spark.createDataFrame([("{not json",)], "value string")
    with pytest.raises(Exception):
        parse_debezium(df, spec).collect()


def test_debezium_streaming(spark, tmp_path):
    """debezium:// streamed through StreamingIngest equals the batch replay."""
    from relational_data_loader_spark.streaming.runner import StreamingIngest

    tbl = generate_change_log(n_events=900, n_convs=15, seed=31)
    dbz_dir = str(tmp_path / "dbzstream")
    write_dbz_log(tbl, dbz_dir, n_files=3)

    mgr = DataLoadManager(spark, str(tmp_path / "wh_stream"))
    spec = transcripts_spec(
        source=f"debezium://{dbz_dir}", target_buckets=4, batch_size=250_000
    )
    ingest = StreamingIngest(
        mgr, spec, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    ingest.run_until_caught_up()

    mgr_b = DataLoadManager(spark, str(tmp_path / "wh_batch"))
    spec_b = transcripts_spec(source=f"debezium://{dbz_dir}", target_buckets=4)
    mgr_b.run(spec_b)
    assert_tables_equal(
        spark_sorted_pdf(mgr.table(spec).read()),
        spark_sorted_pdf(mgr_b.table(spec_b).read()),
    )


def test_debezium_missing_lsn_fails_loudly(spark):
    """An envelope without source.lsn must fail the load, not parse to a
    NULL lsn that every downstream range filter silently drops."""
    spec = transcripts_spec(source="debezium:///dev/null")
    doc = json.dumps({"op": "c", "before": None,
                      "after": {"conv_id": "c1", "turn_idx": 0},
                      "source": {}})
    df = spark.createDataFrame([(doc,)], "value string")
    with pytest.raises(Exception, match="without source.lsn"):
        parse_debezium(df, spec).collect()


def test_debezium_property_roundtrip(spark):
    """Property family: ANY payload content (unicode, quotes, newlines,
    backslashes, nulls) survives the JSON envelope → parser round trip
    byte-exactly, for every op mapping."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    spec = transcripts_spec(source="debezium:///dev/null")

    text_st = st.one_of(
        st.none(),
        st.text(alphabet='ab"\\\n\t東é🗼 ', min_size=0, max_size=20),
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(
        st.tuples(st.sampled_from("crud"), text_st), min_size=1, max_size=6,
    ))
    def prop(events):
        docs, expect = [], []
        for lsn, (op, text) in enumerate(events, start=1):
            image = {"conv_id": f"c{lsn}", "turn_idx": 0, "role": "user",
                     "text": text, "tool": None, "ts": None}
            if op == "d":
                doc = {"op": "d", "source": {"lsn": lsn}, "after": None,
                       "before": {"conv_id": f"c{lsn}", "turn_idx": 0}}
                expect.append((lsn, "D", f"c{lsn}", None))
            else:
                doc = {"op": op, "source": {"lsn": lsn},
                       "before": None, "after": image}
                mapped = "U" if op == "u" else "I"
                expect.append((lsn, mapped, f"c{lsn}", text))
            docs.append(json.dumps(doc, ensure_ascii=False))
        df = spark.createDataFrame([(d,) for d in docs], "value string")
        got = [
            (r["lsn"], r["op"], r["conv_id"], r["text"])
            for r in parse_debezium(df, spec).orderBy("lsn").collect()
        ]
        assert got == expect

    prop()
