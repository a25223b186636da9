"""Deterministic synthetic transcript change-log generator (FIXTURES.md).

Mirrors the reference's CSV test fixtures (``tests/`` CSV folders driving
full-refresh / incremental / delete / column-change families — SURVEY.md §5)
re-expressed as an LSN-ordered CT-style change log over the transcript
payload mandated by BASELINE.json ``input_hint``.

Everything is seeded (default 42) and vectorized with numpy so the same
code generates both the tiny pytest fixtures and the multi-million-event
benchmark logs. No external data.

Event grammar per PK (conv_id, turn_idx):  I U* (D (I U*)?)?
with per-PK order embedded in a global event-time ordering, so sequences
like I..U..D and U..D..I occur across and within micro-batches
(SURVEY.md §7.3 "LWW + delete interplay").
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "calculator", "browser", "python", "sql"])
_VOCAB = np.array(
    "the quick brown fox jumps over lazy dog spark merge upsert delta "
    "conversation agent tool result stream batch shuffle partition skew "
    "watermark lsn epoch manifest snapshot commit replay resume naïve "
    "café schön 東京 data loader incremental refresh".split()
)

# Unicode NFC/NFD pairs and edge-case texts injected at deterministic rows
_EDGE_TEXTS = [
    unicodedata.normalize("NFC", "café schön naïve"),
    unicodedata.normalize("NFD", "café schön naïve"),
    "",
    "  leading and   trailing   whitespace  ",
    "東京タワー🗼 emoji and\ttabs\nand newlines",
    "x" * 5000,  # > 4 KiB value
]


def _conv_ids(n_convs: int, rng: np.random.Generator, n_events: int) -> np.ndarray:
    """Per-conversation event weights: ~1% of conv ids own ~30% of events."""
    n_hot = max(1, n_convs // 100)
    w = np.full(n_convs, 0.7 / max(n_convs - n_hot, 1))
    w[:n_hot] = 0.3 / n_hot
    return rng.choice(n_convs, size=n_events, p=w / w.sum())


def generate_change_log(
    n_events: int = 10_000,
    n_convs: int = 200,
    seed: int = 42,
    delete_frac: float = 0.08,
    reinsert_frac: float = 0.03,
    schema_v2: bool = False,
) -> pa.Table:
    """Generate an LSN-ordered change log as a pyarrow Table.

    Columns: lsn:int64 (globally monotone unique), op:string in {I,U,D},
    conv_id:string, turn_idx:int32, then nullable payload
    (role, text, tool, ts[, model]) — NULL when op='D'.
    """
    rng = np.random.default_rng(seed)

    # 1. Each event targets a (conv, turn) PK; first event for a PK is I,
    #    subsequent ones are U; a slice become D, and a sub-slice of those
    #    get a fresh I (+ more U) after the delete.
    conv = _conv_ids(n_convs, rng, n_events)
    max_turns = 40
    turn = rng.integers(0, max_turns, size=n_events).astype(np.int32)
    pk = conv.astype(np.int64) * max_turns + turn

    # per-PK sequence number via argsort trick (stable → event order = gen order)
    order = np.argsort(pk, kind="stable")
    seq = np.empty(n_events, dtype=np.int64)
    boundaries = np.ones(n_events, dtype=bool)
    boundaries[1:] = pk[order][1:] != pk[order][:-1]
    grp_start = np.maximum.accumulate(np.where(boundaries, np.arange(n_events), 0))
    seq[order] = np.arange(n_events) - grp_start

    op = np.where(seq == 0, "I", "U").astype(object)

    # deletes: mark the LAST event of a fraction of multi-event PKs as D,
    # and for a sub-fraction append an I (reinsert) + U after it below.
    is_last = np.zeros(n_events, dtype=bool)
    last_pos = np.empty(n_events, dtype=np.int64)
    # last event index of each group in `order`
    ends = np.append(np.where(boundaries)[0][1:], n_events) - 1
    is_last[order[ends]] = True
    del last_pos

    u = rng.random(n_events)
    mark_d = is_last & (seq > 0) & (u < delete_frac * 4)
    op[mark_d] = "D"

    # reinsert events appended after deletes (I with fresh payload)
    d_idx = np.where(mark_d)[0]
    n_re = int(len(d_idx) * (reinsert_frac / max(delete_frac, 1e-9)))
    re_src = rng.choice(d_idx, size=min(n_re, len(d_idx)), replace=False)

    conv = np.concatenate([conv, conv[re_src]])
    turn = np.concatenate([turn, turn[re_src]])
    op = np.concatenate([op, np.full(len(re_src), "I", dtype=object)])
    seq = np.concatenate([seq, seq[re_src] + 1])
    n_total = len(conv)

    # 2. Global LSN order: event_time = per-PK-increasing jittered clock.
    #    base time ~ generation index (so per-PK order is preserved: seq was
    #    assigned in generation order and reinserts get later times).
    gen_pos = np.arange(n_total, dtype=np.float64)
    gen_pos[n_events:] = n_events + np.arange(len(re_src)) * 1.0 + 0.5
    event_time = gen_pos + rng.random(n_total) * 0.25
    lsn_order = np.argsort(event_time, kind="stable")
    lsn = np.empty(n_total, dtype=np.int64)
    lsn[lsn_order] = np.arange(1, n_total + 1, dtype=np.int64)

    # 3. Payload — Arrow-native construction (vectorized end to end; the
    #    same code must generate multi-million-event benchmark logs fast).
    #    6 vocab words + the lsn as a marker so every U produces a distinct
    #    text (last-writer-wins is observable).
    import pyarrow.compute as pc

    lsn_pa = pa.array(lsn, type=pa.int64())
    vocab = pa.array(list(_VOCAB), type=pa.string())
    word_idx = rng.integers(0, len(_VOCAB), size=(n_total, 6))
    words = [vocab.take(pa.array(word_idx[:, i])) for i in range(6)]
    text = pc.binary_join_element_wise(
        *words, pc.cast(lsn_pa, pa.string()), " "
    )

    # inject edge-case texts (unicode NFC/NFD pairs, empty, >4KiB) at
    # deterministic rows — replace_with_mask touches only the masked rows
    edge_pos = {}
    for i, t in enumerate(_EDGE_TEXTS):
        edge_pos.setdefault((i * 7 + 11) % n_total, t)
    mask = np.zeros(n_total, dtype=bool)
    mask[list(edge_pos)] = True
    repl = pa.array([edge_pos[p] for p in sorted(edge_pos)], type=pa.string())
    text = pc.replace_with_mask(text, pa.array(mask), repl)

    roles = pa.array(list(_ROLES), type=pa.string())
    tools = pa.array(list(_TOOLS), type=pa.string())
    role = roles.take(pa.array(rng.integers(0, len(_ROLES), size=n_total)))
    tool = pc.if_else(
        pc.equal(role, "tool"),
        tools.take(pa.array(rng.integers(0, len(_TOOLS), size=n_total))),
        "",
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts_np = base + (event_time * 1_000_000).astype("timedelta64[us]")
    ts = pa.array(ts_np, type=pa.timestamp("us"))

    # NULL payload on deletes (CT envelope: deletes carry PKs only)
    is_d = pc.equal(pa.array(op, type=pa.string()), "D")

    def _null_on_d(arr: pa.Array, typ: pa.DataType) -> pa.Array:
        return pc.if_else(is_d, pa.scalar(None, type=typ), arr)

    conv_str = pc.binary_join_element_wise(
        pa.array(np.full(n_total, "conv_"), type=pa.string()),
        pc.utf8_lpad(pc.cast(pa.array(conv), pa.string()), 6, "0"),
        "",
    )

    cols: dict[str, pa.Array] = {
        "lsn": lsn_pa,
        "op": pa.array(op, type=pa.string()),
        "conv_id": conv_str,
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": _null_on_d(role, pa.string()),
        "text": _null_on_d(text, pa.string()),
        "tool": _null_on_d(tool, pa.string()),
        "ts": _null_on_d(ts, pa.timestamp("us")),
    }
    if schema_v2:
        model = pc.if_else(
            pa.array(rng.random(n_total) < 0.5), pa.scalar("model-a"), pa.scalar("model-b")
        )
        cols["model"] = _null_on_d(model, pa.string())

    tbl = pa.table(cols)
    # return in LSN order — the log as a tailer would read it
    return tbl.take(pa.array(lsn_order))


def write_change_log(
    path: str,
    n_events: int = 10_000,
    n_files: int = 8,
    truncate_below_lsn: int = 0,
    **kwargs,
) -> pa.Table:
    """Write the log as ``n_files`` parquet files split by contiguous LSN range.

    File-per-LSN-range mirrors how a binlog/WAL tailer lands segments and lets
    the Structured Streaming file source deliver in-order micro-batches via
    ``maxFilesPerTrigger``. ``truncate_below_lsn`` drops the head of the log —
    the CT-log-truncation fixture (CHANGE_TRACKING_MIN_VALID_VERSION analog,
    SURVEY.md §1.3 invariant 6).
    """
    tbl = generate_change_log(n_events=n_events, **kwargs)
    if truncate_below_lsn:
        tbl = tbl.filter(pa.compute.greater_equal(tbl["lsn"], truncate_below_lsn))
    os.makedirs(path, exist_ok=True)
    n = tbl.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"log-{i:05d}.parquet"))
    return tbl


def expected_final_state(tbl: pa.Table) -> pa.Table:
    """Independent (non-Spark) oracle: replay the log, return final table state.

    Last-writer-wins by max lsn per (conv_id, turn_idx); a final op of D
    removes the row. Pure pandas — used by pytest as a second opinion next
    to the DuckDB oracle.
    """
    df = tbl.to_pandas()
    df = df.sort_values("lsn").groupby(["conv_id", "turn_idx"], as_index=False).last()
    df = df[df["op"] != "D"]
    out = df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    if "model" in df.columns:
        out = df[["conv_id", "turn_idx", "role", "text", "tool", "ts", "model"]]
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
