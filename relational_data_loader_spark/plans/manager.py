"""DataLoadManager — the engine's orchestration / control plane.

Reference: ``modules/DataLoadManager.py::start_imports / start_single_import``
(SURVEY.md §2.1 C1, §3): per model, read the checkpoint, probe change
tracking, choose full vs incremental, run, commit the new sync version.

All control flow here is pure Python around lazy DataFrame plans; Spark
(Catalyst + AQE) owns the physical execution. Batch-mode epochs are keyed by
the log's current max lsn, so re-running the same load against an unchanged
log is a detected no-op — the batch analog of the streaming commit manifest.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from relational_data_loader_spark.operators.lww import net_changes
from relational_data_loader_spark.operators.project import project_cast
from relational_data_loader_spark.plans.decision import LoadDecision, decide
from relational_data_loader_spark.sinks.snapshot import SnapshotTable
from relational_data_loader_spark.sources.readers import (
    change_tracking_info,
    read_change_log,
)
from relational_data_loader_spark.spec import IngestSpec
from relational_data_loader_spark.state import StateTable


@dataclass
class RunResult:
    decision: LoadDecision
    rows_upserted: int
    rows_deleted: int
    watermark: int
    epoch_id: int
    skipped: bool
    wall_ms: int


class DataLoadManager:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.state = StateTable(os.path.join(warehouse, "_rdl_state"))

    def table(self, spec: IngestSpec) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.warehouse, spec.name), spec)

    # -- the four dataflow stages, reused by batch + streaming ---------------

    def prepare_batch(self, spec: IngestSpec, changes: DataFrame) -> DataFrame:
        """envelope scan → column mapping/cast/transform → LWW netting."""
        mapped = project_cast(changes, spec, include_envelope=True)
        return net_changes(
            mapped, spec.primary_keys, spec.lsn_column, spec.op_column
        )

    def final_state(self, spec: IngestSpec, log: DataFrame) -> DataFrame:
        """Replay a whole log to its final table state (full-refresh source)."""
        netted = self.prepare_batch(spec, log)
        return netted.filter(F.col(spec.op_column) != spec.delete_op).select(
            *[c.destination for c in spec.columns]
        )

    # -- entry point -----------------------------------------------------------

    def run(self, spec: IngestSpec, force_full: bool = False) -> RunResult:
        """One load execution: decide, run, commit, track (reference C1+C3)."""
        t0 = time.time()
        table = self.table(spec)
        log = read_change_log(self.spark, spec)

        m = table.current_manifest()
        last = int(m["watermark"]) if m else -1
        cti = change_tracking_info(log, last, spec.lsn_column)
        stored_spec = (
            IngestSpec.from_json(m["spec_json"]) if m and m.get("spec_json") else None
        )
        decision = decide(
            spec,
            target_exists=m is not None,
            stored_checksum=m["spec_checksum"] if m else None,
            stored_spec=stored_spec,
            ct_force_full=cti.force_full,
            forced=force_full,
        )

        if decision.kind == "incremental" and (decision.evolve_added or decision.evolve_renames):
            table.evolve(spec, decision.evolve_renames)
            m = table.current_manifest()

        if decision.kind == "full_refresh":
            epoch_id = cti.current_version
            # row count observed during the write itself — no second pass
            from pyspark.sql import Observation

            obs = Observation()
            df = self.final_state(spec, log).observe(obs, F.count(F.lit(1)).alias("n"))
            table.full_refresh(
                df,
                epoch_id=epoch_id,
                watermark=max(cti.current_version, 0),
            )
            n = int(obs.get["n"])
            wall = int((time.time() - t0) * 1000)
            self.state.append(
                spec.name,
                epoch_id,
                [
                    {
                        "partition_id": -1,
                        "max_applied_lsn": max(cti.current_version, 0),
                        "rows_upserted": n,
                        "rows_deleted": 0,
                    }
                ],
                wall,
                kind="full_refresh",
            )
            return RunResult(decision, n, 0, table.watermark(), epoch_id, False, wall)

        # incremental: only events past the committed watermark
        epoch_id = cti.current_version
        changes = log.filter(F.col(spec.lsn_column) > F.lit(last))
        netted = self.prepare_batch(spec, changes)
        stats = table.merge(netted, epoch_id)
        if not stats.skipped:
            self.state.append(
                spec.name, epoch_id, stats.bucket_stats or [], stats.wall_ms, "merge"
            )
        return RunResult(
            decision,
            stats.rows_upserted,
            stats.rows_deleted,
            stats.watermark,
            epoch_id,
            stats.skipped,
            int((time.time() - t0) * 1000),
        )
