"""Model-based LIFECYCLE property (hypothesis): for ANY valid change log,
ANY interleaving of chunked ingestion with the table-maintenance surface —
MoR delta compaction, vacuum GC, rollback + exactly-once re-ingest, shallow
clone handoff — must land on the same pandas-oracle final state, with fsck
green after every maintenance step.

The per-op families (test_fsck.py, test_clone.py, test_mor.py,
test_maintenance.py) pin each operator's contract in isolation; this file
pins their COMPOSITION, where the historical bugs live: a vacuum that eats a
version a later rollback needs, a compaction that breaks the clone's
absolute-path references, a rollback whose reverted watermark double-applies
the re-ingested chunk. The model is the same LWW-by-lsn dict as
test_property_replay — maintenance ops must be semantically invisible, and
rollback+re-run must CONVERGE back to it.
"""

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from relational_data_loader_spark.plans.manager import DataLoadManager
from relational_data_loader_spark.spec import transcripts_spec
from tests.test_property_replay import _event, _pandas_oracle, _to_table
from tests.util import write_log

# one maintenance op per ingestion gap; "clone" switches the ACTIVE
# warehouse to a shallow clone (dev-replay handoff) and later gaps act on
# it; "logcompact" nets the SOURCE log below the already-ingested prefix
# (sources/compaction.py) — the destination must not notice
OPS = ["none", "compact", "vacuum", "rollback", "clone", "logcompact"]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,  # deterministic for the driver's pytest gate
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=4, max_size=50),
    fracs=st.lists(st.floats(0.15, 0.85), min_size=1, max_size=2),
    gap_ops=st.lists(st.sampled_from(OPS), min_size=2, max_size=2),
    mor=st.booleans(),
)
def test_lifecycle_interleavings_land_on_oracle(
    spark, tmp_path_factory, events, fracs, gap_ops, mor
):
    tmp = tmp_path_factory.mktemp("life")
    logdir = str(tmp / "log")
    tbl = _to_table(events)
    n = len(events)
    cuts = sorted({max(1, min(n - 1, int(n * f))) for f in fracs})
    bounds = cuts + [n]  # lsn upper bound of each ingestion step
    spec = transcripts_spec(
        source=f"parquet://{logdir}",
        target_buckets=4,
        merge_mode="mor" if mor else "cow",
    )

    mgr = DataLoadManager(spark, str(tmp / "wh"))
    write_log(tbl, logdir, n_files=2, lsn_upto=bounds[0])
    mgr.run(spec)
    prev_hi = bounds[0]
    src_mgr, src_prefix_hi = None, None  # set when a clone handoff happens

    for i, hi in enumerate(bounds[1:]):
        op = gap_ops[i % len(gap_ops)]
        t = mgr.table(spec)
        if op == "compact":
            t.compact_deltas()  # CoW tables simply have no pending deltas
        elif op == "vacuum":
            t.vacuum(keep_manifests=2, orphan_min_age_seconds=0)
        elif op == "clone" and src_mgr is None:
            dev_wh = str(tmp / f"dev{i}")
            t.clone_to(os.path.join(dev_wh, spec.name))
            src_mgr, src_prefix_hi = mgr, prev_hi
            mgr = DataLoadManager(spark, dev_wh)  # ingestion continues here
        elif op == "logcompact":
            from relational_data_loader_spark.sources.compaction import (
                compact_change_log,
            )

            compact_change_log(
                spark, logdir, prev_hi, ["conv_id", "turn_idx"]
            )  # no-ops when <2 whole segments fit below the watermark
        assert mgr.table(spec).fsck()["ok"], f"fsck broken after {op}"

        pre_v = int(mgr.table(spec).current_manifest()["version"])
        write_log(tbl, logdir, n_files=2, lsn_from=prev_hi, lsn_upto=hi)
        mgr.run(spec)
        if op == "rollback":
            t = mgr.table(spec)
            if int(t.current_manifest()["version"]) > pre_v:
                t.rollback(pre_v)  # watermark/epochs revert with the manifest
                res = mgr.run(spec)  # re-ingest the rolled-back chunk
                assert res.decision.kind == "incremental"
        prev_hi = hi

    def _state(manager):
        return (
            manager.table(spec)
            .read()
            .orderBy("conv_id", "turn_idx")
            .select("conv_id", "turn_idx", "text")
            .toPandas()
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(
        _state(mgr), _pandas_oracle(events), check_dtype=False
    )
    if src_mgr is not None:
        # the handed-off source must be PINNED at its pre-clone prefix:
        # nothing the clone did (merges, compaction, vacuum, rollback) may
        # leak back through the shared absolute-path file references
        pd.testing.assert_frame_equal(
            _state(src_mgr),
            _pandas_oracle(events[:src_prefix_hi]),
            check_dtype=False,
        )
