"""Full-refresh vs incremental decision — the reference's C1 control plane.

Reference: ``modules/DataLoadManager.py::start_single_import`` chooses full
refresh when (a) the CLI forces it, (b) the destination table is missing,
(c) the model config changed, or (d) change tracking is invalid
(last synced < min valid version); otherwise incremental (SURVEY.md §3.1/§3.2).

Ours adds one refinement the reference folds into (c): a config change is
*classified* (SpecDiff) — additive/rename evolves the target in place
(Iceberg-style metadata DDL), only a breaking change forces the full reload.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from relational_data_loader_spark.spec import IngestSpec, SpecDiff


@dataclass
class LoadDecision:
    kind: str                      # "full_refresh" | "incremental" | "noop"
    reasons: list[str] = field(default_factory=list)
    evolve_renames: list[tuple[str, str]] = field(default_factory=list)
    evolve_added: bool = False
    evolve_widened: list[tuple[str, str]] = field(default_factory=list)


def decide(
    spec: IngestSpec,
    target_exists: bool,
    stored_checksum: str | None,
    stored_spec: IngestSpec | None,
    ct_force_full: bool,
    forced: bool = False,
    pk_widen_rebuckets: bool = True,
) -> LoadDecision:
    reasons: list[str] = []
    if forced:
        reasons.append("forced by caller (--force-full-refresh)")
    if not target_exists:
        reasons.append("destination table missing")
    if ct_force_full and target_exists:
        reasons.append("change tracking invalid: log truncated past watermark")
    if (
        target_exists
        and stored_spec is not None
        and stored_spec.target_buckets != spec.target_buckets
    ):
        # the committed files are laid out with the OLD bucket count; an
        # incremental merge under the new count would look up the wrong
        # buckets and leave stale duplicates — re-bucket via full refresh
        reasons.append(
            f"bucket layout changed (target_buckets "
            f"{stored_spec.target_buckets} -> {spec.target_buckets}): re-bucket"
        )

    renames: list[tuple[str, str]] = []
    widened: list[tuple[str, str]] = []
    added = False
    if target_exists and stored_checksum is not None and stored_checksum != spec.checksum():
        if stored_spec is None:
            reasons.append("model config changed (no stored spec to diff)")
        else:
            diff: SpecDiff = spec.diff(stored_spec)
            if diff.is_breaking:
                reasons.append(
                    f"breaking model change: {[getattr(c, 'destination', c) for c in diff.breaking]}"
                )
            elif pk_widen_rebuckets and any(
                w[0] == spec.primary_keys[0] for w in diff.widened
            ):
                # sink-declared (width_stable_bucket_hash): the snapshot
                # sink's xxhash64 bucket hash is width-sensitive (an int and
                # the same value as bigint hash differently), so widening
                # its bucket key invalidates the committed layout; Iceberg's
                # bucket transform hashes ints through their long
                # representation, so ITS sink opts out of this rule
                reasons.append(
                    f"bucket key {spec.primary_keys[0]} widened: re-bucket"
                )
            else:
                renames = diff.renamed
                widened = diff.widened
                added = bool(diff.added)

    if reasons:
        return LoadDecision("full_refresh", reasons, renames, added)
    return LoadDecision(
        "incremental", ["watermark valid"], renames, added, widened
    )
