"""Cross-table transactional publish — multi-table WAP with crash recovery.

The reference loads each destination table in its own transaction
(SURVEY.md §2.1 C1 — one ``start_single_import`` per model), so a reader
joining two destinations mid-load can see an FK-torn window: ``order_lines``
rows whose parent ``orders`` row hasn't committed yet. At 100 TB with
hundreds of tables per source database, "refresh everything, then flip"
needs a commit that spans tables.

This module is the manifest-sink analog of an Iceberg REST-catalog
multi-table transaction (one catalog commit moving many table pointers):

1. Load every table onto a WAP **branch** (``SnapshotTable.branch`` — staged
   commits invisible to main readers; audit them however you like).
2. ``publish_group`` runs two-phase commit over the branches:
   - **prepare**: verify every branch is fast-forwardable, then fsync a
     group journal (``_txn/<txid>.json``) recording each participant's
     branch head and the exact main version it will become. The journal is
     the atomicity anchor — after it exists, the group's outcome is
     decided by what the journal says, never by how far the process got.
   - **commit**: publish each branch in journal order (metadata-only
     fast-forwards, ~ms each), then stamp the journal ``committed`` and
     write a **consistent-cut** record (``_cuts/<txid>.json``: table →
     published main version) that pins the FK-consistent multi-table
     snapshot forever (within vacuum retention) — training-data snapshot
     pinning for free.
3. Crash anywhere → ``recover_groups`` replays the journal:
   - no participant published yet → **abort** (journal stamped, branches
     left staged for re-audit or drop);
   - the first participant's target version is ours → **roll forward**
     (finish the remaining publishes — each is idempotent via
     ``publish_branch``'s crash-safe retry — then stamp + cut).
   The direction is decided by the FIRST participant alone because commits
   happen in journal order — participant k can only be published if
   1..k-1 are.
4. A RIVAL single-table writer landing between prepare and a participant's
   publish makes that fast-forward fail. Atomicity then demands
   **compensating rollback**: every already-published participant is
   rolled back (a new manifest restoring its pre-group state — history
   stays append-only and auditable), the journal is stamped
   ``aborted_conflict``, and the conflict re-raises for the caller's
   retry loop (re-stage against the new head), exactly the
   CommitFailedException contract of ``run_with_retry``.

Readers of MAIN can still observe a torn window between two participant
fast-forwards (separate manifest files; there is no warehouse-level
pointer to swing), so the atomicity claim is precise: atomic under
crash (journal recovery), atomic under conflict (compensating rollback),
and torn only within the few-ms metadata window between fast-forwards —
readers needing a guaranteed-consistent multi-table view read through the
cut record (``read_cut``), never through "latest".
"""

from __future__ import annotations

import json
import os
import time
import uuid
from glob import glob
from typing import Any

from relational_data_loader_spark.sinks.snapshot import SnapshotTable


class GroupPublishConflict(RuntimeError):
    """A rival writer advanced a participant's main head between prepare and
    commit. Already-published participants were compensated (rolled back);
    the group is aborted. Re-stage against the new heads and retry."""


def _txn_dir(warehouse: str) -> str:
    return os.path.join(warehouse, "_txn")


def _cut_dir(warehouse: str) -> str:
    return os.path.join(warehouse, "_cuts")


def _write_json_atomic(path: str, doc: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _main_version(table: SnapshotTable) -> int:
    m = table.current_manifest()
    return int(m["version"]) if m else 0


def _branch_head(table: SnapshotTable, branch: str) -> dict[str, Any]:
    staged = table._branch_files(branch)
    if not staged:
        raise ValueError(
            f"table {table.spec.name!r}: branch {branch!r} has no staged commits"
        )
    with open(staged[-1]) as f:
        return json.load(f)


def _published_our_version(table: SnapshotTable, part: dict[str, Any]) -> bool:
    """Did OUR fast-forward land as this participant's target version?
    Decided from committed manifests alone (recovery must not guess)."""
    try:
        m = table.manifest_at(int(part["target_main_version"]))
    except ValueError:
        return False
    return (
        m.get("published_from_branch") == part["branch"]
        and m.get("published_branch_version") == part["branch_head_version"]
    )


def publish_group(
    mgr, specs_branches: list[tuple[Any, str]], _fail_after: int | None = None
) -> dict[str, Any]:
    """Atomically publish one staged WAP branch per table (module
    docstring). ``specs_branches`` is [(spec, branch_name), ...]; all specs
    must route to the snapshot sink. Returns the committed journal (with
    the per-table published versions). ``_fail_after=k`` is the FAULT
    INJECTION hook for crash tests: raises after k participant publishes,
    leaving the journal prepared — production callers never pass it."""
    if not specs_branches:
        raise ValueError("publish_group: no participants")
    tables = []
    for spec, branch in specs_branches:
        t = mgr.table(spec)
        if not isinstance(t, SnapshotTable):
            raise ValueError(
                f"publish_group is snapshot-sink only (Iceberg: use a REST "
                f"catalog multi-table transaction); {spec.name!r} routes to "
                f"{spec.sink!r}"
            )
        tables.append((t, branch))

    # prepare: every branch must be fast-forwardable NOW; record the exact
    # versions the commit phase will produce
    participants = []
    for t, branch in tables:
        head = _branch_head(t, branch)
        main_v = _main_version(t)
        if int(head.get("base_version", 0)) != main_v:
            raise RuntimeError(
                f"table {t.spec.name!r}: branch {branch!r} forked from main "
                f"v{head.get('base_version')} but main is at v{main_v} — "
                "not a fast-forward; re-stage before grouping"
            )
        participants.append(
            {
                "table": t.spec.name,
                "path": t.path,
                "branch": branch,
                "branch_head_version": head["version"],
                "expected_main_version": main_v,
                "target_main_version": main_v + 1,
            }
        )
    txid = uuid.uuid4().hex
    os.makedirs(_txn_dir(mgr.warehouse), exist_ok=True)
    journal_path = os.path.join(_txn_dir(mgr.warehouse), f"{txid}.json")
    journal = {
        "txid": txid,
        "status": "prepared",
        "prepared_at": time.time(),
        "participants": participants,
    }
    _write_json_atomic(journal_path, journal)

    # commit: fast-forward in journal order
    by_name = {t.spec.name: t for t, _ in tables}
    return _commit_prepared(mgr, journal_path, journal, by_name, _fail_after)


def _commit_prepared(
    mgr,
    journal_path: str,
    journal: dict[str, Any],
    by_name: dict[str, SnapshotTable],
    _fail_after: int | None = None,
) -> dict[str, Any]:
    published: list[dict[str, Any]] = []
    for i, part in enumerate(journal["participants"]):
        t = by_name[part["table"]]
        if _published_our_version(t, part):
            # recovery re-entry: the manifest already landed — the only
            # unfinished work is the branch cleanup (a crash inside
            # publish_branch between commit and drop)
            if part["branch"] in t.list_branches():
                t.drop_branch(part["branch"])
            published.append(part)
            continue
        head_drifted = (
            part["branch"] in t.list_branches()
            and _branch_head(t, part["branch"])["version"]
            != part["branch_head_version"]
        )
        if head_drifted or _main_version(t) != part["expected_main_version"]:
            # rival writer won the version we prepared for: compensate.
            # Roll back ONLY participants we are still the head of — if a
            # rival has since built on top of a published participant,
            # reverting it would erase the rival's committed state, which
            # is worse than a torn group; surface that loudly instead.
            rolled, stuck = [], []
            for done in published:
                td = by_name[done["table"]]
                if _main_version(td) != done["target_main_version"]:
                    # a rival built ON TOP of the published state — reverting
                    # would erase the rival's committed work
                    stuck.append(done["table"])
                elif done["expected_main_version"] == 0:
                    # the publish was the table's FIRST-EVER commit: there
                    # is no pre-group version to restore (history is
                    # append-only, v0 does not exist) — report, don't crash
                    stuck.append(done["table"])
                else:
                    td.rollback(done["expected_main_version"])
                    rolled.append(done["table"])
            journal["status"] = "aborted_conflict"
            journal["aborted_at"] = time.time()
            journal["rolled_back"] = rolled
            journal["unrecovered"] = stuck
            _write_json_atomic(journal_path, journal)
            reason = (
                f"branch {part['branch']!r} head moved after prepare"
                if head_drifted
                else f"main advanced past v{part['expected_main_version']}"
            )
            msg = (
                f"table {part['table']!r}: {reason}; "
                f"rolled back {rolled or 'nothing'}"
            )
            if stuck:
                msg += (
                    f"; COULD NOT roll back {stuck} (rival commits built on "
                    "the published state, or the publish was the table's "
                    "first-ever commit — resolve manually via rollback())"
                )
            raise GroupPublishConflict(msg)
        t.publish_branch(part["branch"])
        published.append(part)
        if _fail_after is not None and len(published) >= _fail_after:
            raise RuntimeError(
                f"injected crash after {len(published)} publish(es) [test hook]"
            )

    journal["status"] = "committed"
    journal["committed_at"] = time.time()
    _write_json_atomic(journal_path, journal)
    os.makedirs(_cut_dir(mgr.warehouse), exist_ok=True)
    cut = {
        "txid": journal["txid"],
        "committed_at": journal["committed_at"],
        "tables": {
            p["table"]: p["target_main_version"]
            for p in journal["participants"]
        },
    }
    _write_json_atomic(
        os.path.join(_cut_dir(mgr.warehouse), f"{journal['txid']}.json"), cut
    )
    return journal


def recover_groups(mgr, specs: list) -> list[dict[str, Any]]:
    """Replay every non-terminal group journal after a crash (module
    docstring rule: roll FORWARD iff the first participant's publish
    landed, else abort and leave the branches staged). Idempotent — safe
    to run on every manager start. A journal whose roll-forward hits a
    rival conflict is compensated and stamped ``aborted_conflict`` like
    the live path, then recovery CONTINUES to later journals — one stuck
    group must not block the rest. Returns the journals it settled (check
    each ``status``; ``aborted_conflict`` entries carry
    ``rolled_back``/``unrecovered``)."""
    by_name = {s.name: mgr.table(s) for s in specs}
    settled = []
    for path in sorted(glob(os.path.join(_txn_dir(mgr.warehouse), "*.json"))):
        with open(path) as f:
            journal = json.load(f)
        if journal.get("status") != "prepared":
            continue
        # validate EVERY participant's spec before touching anything — a
        # missing spec mid-roll-forward would strand a half-settled group
        missing = [
            p["table"]
            for p in journal["participants"]
            if p["table"] not in by_name
        ]
        if missing:
            raise ValueError(
                f"recover_groups: journal {journal['txid']} references "
                f"table(s) {missing} with no spec passed — provide them"
            )
        first = journal["participants"][0]
        if _published_our_version(by_name[first["table"]], first):
            try:
                journal = _commit_prepared(mgr, path, journal, by_name)
            except GroupPublishConflict:
                # journal already stamped aborted_conflict by the
                # compensation path; reload it for the report and move on
                with open(path) as f:
                    journal = json.load(f)
        else:
            journal["status"] = "aborted_crash"
            journal["aborted_at"] = time.time()
            _write_json_atomic(path, journal)
        settled.append(journal)
    return settled


def read_cut(mgr, specs: list, txid: str) -> dict[str, Any]:
    """FK-consistent multi-table read: each table AT the version the cut
    pinned (time travel), immune to later commits. Returns
    {table_name: DataFrame}. Valid within vacuum's retention window, like
    any time travel."""
    cut_path = os.path.join(_cut_dir(mgr.warehouse), f"{txid}.json")
    with open(cut_path) as f:
        cut = json.load(f)
    by_name = {s.name: s for s in specs}
    out = {}
    for name, version in cut["tables"].items():
        spec = by_name.get(name)
        if spec is None:
            raise ValueError(f"read_cut: no spec passed for table {name!r}")
        out[name] = mgr.table(spec).read(version=int(version))
    return out


def list_cuts(warehouse: str) -> list[dict[str, Any]]:
    out = []
    for path in sorted(glob(os.path.join(_cut_dir(warehouse), "*.json"))):
        with open(path) as f:
            out.append(json.load(f))
    return out
