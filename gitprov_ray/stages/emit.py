"""Stateless statement emitters (SURVEY.md §2.9 rows without cross-row state).

``emit_stateless_batch`` turns REVISIONS rows into statement rows for:
activity, wasAssociatedWith, entity (specialized), base-entity candidate,
specializationOf, wasGeneratedBy, wasInvalidatedBy, wasInformedBy
(parents-list explode, J4). The version-dependent statements (used /
wasDerivedFrom) come from the `versions.py` shuffle stage.

Commit-level statements (activity / association / informedBy) repeat across
the file rows of one commit; they are deduped per batch here and globally by
the final (graph,subj,pred,obj) triple dedup — identical rows flatten to
identical triples, so no extra shuffle is needed for exactness.

Base-entity dedup (reference ST3, first-touch by LABEL,
ProvenanceService.java:378-394): the base-entity id and label are pure
functions of the filename, so emitting one candidate per event and deduping
at the triple level yields exactly the reference's triple set — including
the reference's id-collision behavior where two filenames normalize to the
same id but keep distinct labels (both label triples survive, as in the
reference). No groupby-first shuffle required for parity.

Agent resolution (ST2) uses a BROADCAST of the small contributors side
table: the ``ray.put`` object ref is passed to the actor-pool class, fetched
once per actor in ``__init__`` — never re-shipped per batch.
"""

from __future__ import annotations

import ray
import pyarrow as pa

from .. import prov, schemas


def agents_index(contributor_rows: list[dict]) -> dict[str, list[tuple]]:
    """graph → [(login, name-or-None), ...] in contributor-table order (ST2)."""
    idx: dict[str, list[tuple]] = {}
    for c in contributor_rows:
        idx.setdefault(c["graph"], []).append((c["login"], c["name"]))
    return idx


def resolve_author(agents: list[tuple], author, author_name) -> str:
    """ST2 fallback (ProvenanceService.java:141-153): null login → first
    agent whose foaf:name equals the commit author name, agents WITHOUT a
    name matching by default; first match wins."""
    if author is not None:
        return author
    for login, name in agents:
        if name is None or name == author_name:
            return login
    raise IndexError("no agent matched author fallback")


def _stmts_to_table(stmts: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(stmts, schema=schemas.STATEMENTS)


def make_emitter(agents_idx: dict):
    """Stateless task-pool variant of EmitStateless: the (small) agents
    index is captured in the closure, which Ray serializes ONCE and ships by
    reference to tasks — the broadcast without actor-spawn latency. Use the
    actor-pool class when per-worker setup is genuinely expensive (models,
    indexes); use this when the state is a small lookup table."""
    emitter = EmitStateless(agents_idx)

    def emit_batch(batch: pa.Table) -> pa.Table:
        return emitter(batch)

    return emit_batch


class EmitStateless:
    """Actor-pool callable: broadcast agents index in __init__ (once per
    actor), per-batch stateless statement emit in __call__."""

    def __init__(self, agents_ref):
        self.agents = (
            ray.get(agents_ref) if not isinstance(agents_ref, dict) else agents_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        stmts: list[dict] = []
        seen_commit: set[str] = set()
        cols = {
            name: batch.column(name).to_pylist()
            for name in (
                "graph", "page_key", "snapshot_id", "ts", "author",
                "author_name", "label", "change_status", "parents",
            )
        }
        for graph, f, sha, ts, author, author_name, label, status, parents in zip(
            cols["graph"], cols["page_key"], cols["snapshot_id"], cols["ts"],
            cols["author"], cols["author_name"], cols["label"],
            cols["change_status"], cols["parents"],
        ):
            if sha not in seen_commit:
                seen_commit.add(sha)
                resolved = resolve_author(self.agents.get(graph, []), author, author_name)
                stmts.append(prov.stmt_activity(graph, sha, ts, label))
                stmts.append(prov.stmt_association(graph, sha, resolved))
                for parent in parents or []:
                    stmts.append(prov.stmt_informed(graph, sha, parent))
            stmts.append(prov.stmt_entity(graph, f, sha))
            stmts.append(prov.stmt_base_entity(graph, f))
            stmts.append(prov.stmt_specialization(graph, f, sha))
            if status == "added" or status == "modified":
                stmts.append(prov.stmt_generation(graph, f, sha, ts))
            elif status == "removed":
                stmts.append(prov.stmt_invalidation(graph, f, sha, ts))
        return _stmts_to_table(stmts)


def emit_agents_table(contributor_rows: list[dict]) -> pa.Table:
    """Agent statements from the contributors side table
    (processAllAgents, ProvenanceService.java:332-365)."""
    stmts = [
        prov.stmt_agent(c["graph"], c["login"], c["agent_type"],
                        c["contributions"], c["email"], c["avatar_url"], c["name"])
        for c in contributor_rows
    ]
    return _stmts_to_table(stmts)
