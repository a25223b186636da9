"""Session windows (streaming/sessions.py): the inclusive merge boundary,
batch/stream equivalence under watermark finalization, and state-bounded
append emission."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from relational_data_loader_spark.streaming.sessions import session_window_stats

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _batch(spark, rows):
    """rows: (user_id, minute_offset, value, event_id)."""
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), v, e) for u, m, v, e in rows],
        "user_id long, ts timestamp, value double, event_id long",
    )


def test_boundary_is_inclusive(spark):
    """An event at exactly prev_ts + gap EXTENDS the session — the oracle
    SQL's strict > gap rule mirrors this; a >= rule would split here."""
    df = _batch(spark, [(1, 0, 1.0, 1), (1, 30, 1.0, 2), (1, 59, 1.0, 3)])
    out = session_window_stats(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 3
    assert r["session_start"] == T0
    # end = last event + gap, 10:59 + 30min
    assert r["session_end"] == T0 + dt.timedelta(minutes=89)


def test_strictly_larger_gap_splits(spark):
    df = _batch(spark, [(1, 0, 1.0, 1), (1, 31, 2.0, 2)])
    out = sorted(session_window_stats(df).collect(), key=lambda r: r["session_start"])
    assert [r["n_events"] for r in out] == [1, 1]
    assert out[0]["session_end"] == T0 + dt.timedelta(minutes=30)
    assert out[1]["session_start"] == T0 + dt.timedelta(minutes=31)


def _seg(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(minutes=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _write(logdir, segs):
    os.makedirs(logdir, exist_ok=True)
    t = 1_700_000_000
    for i, seg in enumerate(segs):
        p = os.path.join(logdir, f"seg-{i:03d}.parquet")
        pq.write_table(seg, p)
        os.utime(p, (t + i, t + i))


def test_stream_matches_batch_for_finalized_sessions(spark, tmp_path):
    """Streaming append emits a session exactly once when the watermark
    passes its end; the emitted rows equal the batch result for those
    sessions. The far-future flush event advances the watermark past every
    real session (its own stays open — append's documented behavior)."""
    logdir = str(tmp_path / "slog")
    segs = [
        _seg([(1, 0, 1.0, 1), (1, 10, 2.0, 2), (2, 5, 1.0, 3)]),
        _seg([(1, 50, 1.0, 4), (2, 20, 4.0, 5)]),   # u1 new session; u2 extends
        _seg([(9, 10_000, 0.0, 6)]),                 # flush: wm >> all ends
    ]
    _write(logdir, segs)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double, event_id long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(logdir)
    )
    q = (
        session_window_stats(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in spark.sql("SELECT * FROM sess_eq").collect()
    }

    want_df = session_window_stats(spark.read.parquet(logdir))
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in want_df.collect()
        if r["user_id"] != 9  # flush session never finalizes in append
    }
    assert got == want
    # and the three real sessions are what we expect
    assert got[(1, T0)][1] == 2
    assert got[(1, T0 + dt.timedelta(minutes=50))][1] == 1
    assert got[(2, T0 + dt.timedelta(minutes=5))] == (
        T0 + dt.timedelta(minutes=50), 2, 5.0
    )
