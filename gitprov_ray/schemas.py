"""pyarrow schemas for every logical table (SURVEY.md §1.3)."""

from __future__ import annotations

import pyarrow as pa

# Primary corpus — exact shape of BASELINE.json input_hint.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Git-analog exploded commit×file event stream (reference's
# RepositoryCommit + CommitFile after the per-commit file fetch,
# ProvenanceService.java:129-183).
REVISIONS = pa.schema(
    [
        ("graph", pa.string()),
        ("page_key", pa.string()),        # filename / resource key
        ("snapshot_id", pa.string()),     # commit sha analog
        ("ts", pa.timestamp("us")),
        ("author", pa.string()),          # login; null → ST2 fallback path
        ("author_name", pa.string()),     # display name used by the fallback
        ("label", pa.string()),           # commit message analog
        ("change_status", pa.string()),   # added | removed | modified
        ("event_seq", pa.int32()),        # index of the resource within its
                                          # page: the oracle's first-event-wins
                                          # tie-break for duplicate
                                          # (page_key, snapshot) rows
        ("additions", pa.int32()),
        ("changes", pa.int32()),
        ("deletions", pa.int32()),
        ("parents", pa.list_(pa.string())),
        ("url", pa.string()),
    ]
)

# Contributor side table (reference's contributors+user join,
# ProvenanceService.java:336-360).
CONTRIBUTORS = pa.schema(
    [
        ("graph", pa.string()),
        ("login", pa.string()),
        ("agent_type", pa.string()),
        ("contributions", pa.int32()),
        ("email", pa.string()),           # nullable → optional foaf:mbox
        ("avatar_url", pa.string()),
        ("name", pa.string()),            # nullable → ST2 no-name fallback
    ]
)

# Internal IR between extract and materialize — one row per PROV statement
# (the reference's 11 in-memory lists, ProvenanceService.java:81-92).
# attrs is a JSON object string {pred: [value, dtype], ...} to stay
# Arrow-friendly without map-type pitfalls.
STATEMENTS = pa.schema(
    [
        ("stmt_type", pa.string()),
        ("id", pa.string()),
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("secondary", pa.string()),
        ("t", pa.timestamp("us")),
        ("attrs", pa.string()),
        ("graph", pa.string()),
        ("stmt_rank", pa.int32()),        # category-major document order
    ]
)

# Final RDF graph table — sorted/deduped, hash-partitioned by graph.
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
        ("obj_dtype", pa.string()),
        ("graph", pa.string()),
    ]
)

# Category-major statement order of the assembled document
# (ProvenanceService.java:202-212).
STMT_RANK = {
    "activity": 0,
    "agent": 1,
    "wasAssociatedWith": 2,
    "entity": 3,
    "base_entity": 4,
    "specializationOf": 5,
    "wasGeneratedBy": 6,
    "wasInvalidatedBy": 7,
    "used": 8,
    "wasInformedBy": 9,
    "wasDerivedFrom": 10,
}
