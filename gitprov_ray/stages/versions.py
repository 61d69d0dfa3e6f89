"""ST1 — the version-chain lag shuffle.

The reference's only cross-record state is ``entityVersions: Map<filename,
List<sha>>`` (ProvenanceService.java:92,:294-299,:548-551): the parent of a
'modified' file event is the sha of the LAST prior event (any status) of the
same file. Distributed re-expression: hash-partition the event stream by
(graph, page_key), re-establish per-key order INSIDE the partition, and
compute the lag with a vectorized pandas groupby/shift — never a global
state object (the reference's own concurrency bug, SURVEY.md §3.4, is the
cautionary tale).

Scale design: instead of one map_groups group per file key (per-group Python
call overhead at 10^12 keys), the shuffle key is ``bucket =
hash64(graph,page_key) % num_buckets`` — each group is a whole bucket and
the per-key lag inside it is one vectorized pandas groupby/shift. Hot keys
spread over buckets by the hash; a single pathological key still fits one
bucket, which is the documented partitioning assumption (one key's event
chain fits one worker — the same assumption the reference makes with its
in-memory map). The bucket hash is sha1-based and process-stable, so reruns
partition identically (checkpoint/resume safe).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import prov, schemas


def stable_bucket(graph: pd.Series, key: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic, process-stable bucket id per (graph, key) — vectorized
    pandas siphash (fixed default hash key → identical across workers)."""
    joined = graph.astype(str) + "\x1f" + key.astype(str)
    h = pd.util.hash_pandas_object(joined, index=False).to_numpy()
    return (h % num_buckets).astype(np.int64)


def add_bucket_column(batch: pa.Table, num_buckets: int) -> pa.Table:
    g = batch.column("graph").to_pandas()
    k = batch.column("page_key").to_pandas()
    return batch.append_column(
        "bucket", pa.array(stable_bucket(g, k, num_buckets), type=pa.int64())
    )


_EMPTY = pd.DataFrame(
    {
        "stmt_type": pd.Series(dtype=object), "id": pd.Series(dtype=object),
        "subj": pd.Series(dtype=object), "obj": pd.Series(dtype=object),
        "secondary": pd.Series(dtype=object),
        "t": pd.Series(dtype="datetime64[us]"),
        "attrs": pd.Series(dtype=object), "graph": pd.Series(dtype=object),
        "stmt_rank": pd.Series(dtype="int32"),
    }
)


def version_lag_group(df: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of events → used/wasDerivedFrom STATEMENT rows.

    Replicates: per-key chronological order (ts, snapshot_id); pre-lag dedup
    of duplicate (key, snapshot) events; parent = previous event sha of any
    status; quirk-4 policy (modified with no prior → no usage/derivation,
    counted upstream in metrics).
    """
    df = df.sort_values(["graph", "page_key", "ts", "snapshot_id"], kind="mergesort")
    df = df.drop_duplicates(["graph", "page_key", "snapshot_id"])
    df["parent"] = df.groupby(["graph", "page_key"], sort=False)["snapshot_id"].shift(1)
    m = df[(df["change_status"] == "modified") & df["parent"].notna()]
    if len(m) == 0:
        return _EMPTY.copy()

    return _emit_version_stmts_vec(m)


def _emit_version_stmts_rows(m: pd.DataFrame) -> pd.DataFrame:
    """Row-at-a-time reference emit (kept for the parity test)."""
    ts_py = [x.to_pydatetime() for x in m["ts"]]
    stmts: list[dict] = []
    for graph, f, sha, parent, t, a, c, d in zip(
        m["graph"].to_numpy(dtype=object), m["page_key"].to_numpy(dtype=object),
        m["snapshot_id"].to_numpy(dtype=object), m["parent"].to_numpy(dtype=object),
        ts_py, m["additions"].to_numpy(), m["changes"].to_numpy(),
        m["deletions"].to_numpy(),
    ):
        stmts.append(prov.stmt_used(graph, f, sha, parent, t))
        stmts.append(prov.stmt_derivation(graph, f, sha, parent, a, c, d))

    out = pd.DataFrame.from_records(stmts)
    out["t"] = pd.to_datetime(out["t"])
    out["stmt_rank"] = out["stmt_rank"].astype("int32")
    return out


def _emit_version_stmts_vec(m: pd.DataFrame) -> pd.DataFrame:
    """Vectorized twin of _emit_version_stmts_rows (same distributive-escape
    invariants as emit_stateless_vec; byte-exact attrs JSON template)."""
    from .. import idgen
    from ..schemas import STMT_RANK

    base_of = {v: idgen.escape_ncname(idgen.base_entity_name(v))
               for v in pd.unique(m["page_key"])}
    base = m["page_key"].map(base_of)
    sha, parent = m["snapshot_id"], m["parent"]
    spec = base + "_commit-" + sha
    parent_spec = base + "_commit-" + parent
    act = "commit-" + sha

    used = pd.DataFrame({
        "stmt_type": "used",
        "id": ("usage-" + base + "-" + sha + "-" + parent).to_numpy(),
        "subj": act.to_numpy(), "obj": parent_spec.to_numpy(),
        "secondary": None, "t": m["ts"].to_numpy(), "attrs": "{}",
        "graph": m["graph"].to_numpy(), "stmt_rank": STMT_RANK["used"]})

    attrs = ('{"gitprov:additions": [' + m["additions"].astype(str)
             + ', "xsd:int"], "gitprov:changes": [' + m["changes"].astype(str)
             + ', "xsd:int"], "gitprov:deletions": [' + m["deletions"].astype(str)
             + ', "xsd:int"], "prov:hadGeneration": ["generation-' + sha
             + '", "@uri"], "prov:hadUsage": ["usage-' + sha + "-" + parent
             + '", "@uri"]}')
    deriv = pd.DataFrame({
        "stmt_type": "wasDerivedFrom",
        "id": ("derivation-" + spec + "-" + parent).to_numpy(),
        "subj": spec.to_numpy(), "obj": parent_spec.to_numpy(),
        "secondary": act.to_numpy(), "t": pd.NaT, "attrs": attrs.to_numpy(),
        "graph": m["graph"].to_numpy(),
        "stmt_rank": STMT_RANK["wasDerivedFrom"]})

    out = pd.concat([used, deriv], ignore_index=True)
    out["t"] = pd.to_datetime(out["t"])
    out["stmt_rank"] = out["stmt_rank"].astype("int32")
    return out


def version_statements(revisions_ds, num_buckets: int = 64):
    """revisions Dataset → used/wasDerivedFrom statements Dataset.

    Shuffle #1 of the physical plan (SURVEY.md §4.3): key = hash bucket of
    (graph, page_key). Columns are pruned BEFORE the shuffle so only the
    lag-relevant fields move.
    """
    keyed = revisions_ds.select_columns(
        ["graph", "page_key", "snapshot_id", "ts", "change_status",
         "additions", "changes", "deletions"]
    ).map_batches(lambda b: add_bucket_column(b, num_buckets),
                  batch_format="pyarrow")
    grouped = keyed.groupby("bucket").map_groups(
        lambda df: version_lag_group(df.drop(columns=["bucket"])),
        batch_format="pandas",
    )
    # normalize back to Arrow blocks with the canonical STATEMENTS schema so
    # the downstream union sees one schema
    from ..util import pandas_to_arrow

    return grouped.map_batches(
        lambda df: pandas_to_arrow(df, schemas.STATEMENTS),
        batch_format="pandas",
    )
