"""Dependency-ordered load orchestration for multi-spec runs.

The reference loads each model file independently, in folder order
(``modules/RelationalDataLoader.py`` — SURVEY.md §2.1 C4), which is fine
for one source database with referential integrity already enforced
upstream. A warehouse replicating MANY tables has no such guarantee: a
child table loaded before its parent exposes FK orphans to every query
between the two commits (exactly what operators/integrity.py
fk_orphan_audit measures after the fact). This module prevents the window
instead: specs declare ``depends_on`` and the batch runner executes
topological WAVES — every parent committed before any child starts, specs
within a wave independent and order-irrelevant.

Waves, not a flat topological order, on purpose: a flat order serializes
specs that could run together; a wave is exactly the set whose parents
are all committed, i.e. the unit a scheduler may parallelize (the CLI
runs a wave serially today — one Spark session — but the contract is the
wave boundary, so a multi-session deployment can fan each wave out
without re-deriving anything).
"""

from __future__ import annotations

from relational_data_loader_spark.spec import IngestSpec


class SpecDependencyError(ValueError):
    """Unknown ``depends_on`` target or dependency cycle."""


def dependency_waves(specs: list[IngestSpec]) -> list[list[IngestSpec]]:
    """Kahn layering of specs by ``depends_on``: wave 0 has no
    dependencies, wave N+1 depends only on waves <= N. Within a wave,
    specs sort by name (deterministic run order and output). Raises
    ``SpecDependencyError`` naming the offender on an unknown dependency
    or a cycle — config bugs must stop the run before any load, not
    after half the warehouse committed in a wrong order.
    """
    by_name = {s.name: s for s in specs}
    if len(by_name) != len(specs):
        dupes = sorted(
            {s.name for s in specs if sum(t.name == s.name for t in specs) > 1}
        )
        raise SpecDependencyError(f"duplicate spec names: {dupes}")
    for s in specs:
        for dep in s.depends_on:
            if dep not in by_name:
                raise SpecDependencyError(
                    f"spec {s.name!r} depends on unknown spec {dep!r}"
                )
            if dep == s.name:
                raise SpecDependencyError(f"spec {s.name!r} depends on itself")
    waves: list[list[IngestSpec]] = []
    placed: set[str] = set()
    remaining = dict(by_name)
    while remaining:
        ready = sorted(
            n for n, s in remaining.items()
            if all(d in placed for d in s.depends_on)
        )
        if not ready:
            raise SpecDependencyError(
                f"dependency cycle among specs: {sorted(remaining)}"
            )
        waves.append([remaining.pop(n) for n in ready])
        placed.update(ready)
    return waves


def blocked_dependents(
    specs: list[IngestSpec], failed: set[str]
) -> dict[str, list[str]]:
    """Transitive closure of specs that must NOT load because a
    dependency (direct or inherited) failed or was rejected this run:
    ``{spec_name: sorted failed roots it is blocked by}``. Loading a
    child after its parent's epoch was rejected would commit exactly the
    orphan window the ordering exists to prevent.
    """
    by_name = {s.name: s for s in specs}
    blocked: dict[str, set[str]] = {}

    def roots(name: str, seen: frozenset[str]) -> set[str]:
        if name in failed:
            return {name}
        if name in blocked:
            return blocked[name]
        if name in seen or name not in by_name:
            return set()
        out: set[str] = set()
        for dep in by_name[name].depends_on:
            out |= roots(dep, seen | {name})
        blocked[name] = out
        return out

    return {
        s.name: sorted(r)
        for s in specs
        if s.name not in failed and (r := roots(s.name, frozenset()))
    }
