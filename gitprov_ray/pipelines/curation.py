"""Training-data curation pipeline: the engine's LLM-data ops composed
into one streaming pass over a documents table —

    read (pruned) → annotate (token count, char count, content hash)
                  → language + length gate
                  → exact dedup (min-doc_id per content hash wins,
                    applied via the bucketed hash semi-join)

Each stage is an already-tested operator (linking.exact_dedup_stats'
two-phase hash dedup, textops token kernels); the composition streams —
the only shuffles are the dedup hash aggregate and the keep-id semi-join.
The whole pipeline is SQL-expressible, so the driver's oracle checks the
composition end-to-end (q_curation_pipeline); the heuristic language-ID
variant (textops.lang_id instead of the table's lang column) is the same
pipeline with ``predict_lang=True`` — rows-only, since the n-gram
heuristic has no SQL twin."""

from __future__ import annotations

import pandas as pd


def curate_documents(docs_ds, lang: str = "en", min_tokens: int = 10,
                     max_tokens: int = 1_000_000,
                     predict_lang: bool = False,
                     keep_method: str = "semi_join"):
    """documents Dataset → curated (doc_id, lang, tok_cnt, n_chars,
    text_md5) rows: language- and length-gated, exact-deduplicated
    (min doc_id per content hash wins).

    ``keep_method``: 'semi_join' routes the keep-id set through the
    bucketed hash semi-join (scale path — the keep set is the same order
    of magnitude as the corpus); 'broadcast' collects it into a value set
    (small-corpus fast path)."""
    from .. import textops
    from ..linking import exact_dedup_stats
    from ..ops import semi_join

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        lang_col = (textops.lang_id(df["text"]) if predict_lang
                    else df["lang"])
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang": lang_col.to_numpy(),
            "tok_cnt": textops.token_count(df["text"]),
            "n_chars": df["text"].fillna("").str.len().astype("int64"),
            "text_md5": textops.md5_series(df["text"].fillna("")),
        })

    gated = docs_ds.map_batches(annotate, batch_format="pandas").map_batches(
        lambda df: df[(df["lang"] == lang)
                      & (df["tok_cnt"] >= min_tokens)
                      & (df["tok_cnt"] <= max_tokens)],
        batch_format="pandas")

    keep = exact_dedup_stats(docs_ds).map_batches(
        lambda df: pd.DataFrame({"keep_id": df["keep_id"]}),
        batch_format="pandas")
    if keep_method == "broadcast":
        keep_ids = set(keep.to_pandas()["keep_id"])
        return gated.map_batches(
            lambda df: df[df["doc_id"].isin(keep_ids)],
            batch_format="pandas")
    return semi_join(gated, keep, "doc_id", "keep_id")


def curate_documents_full(docs_ds, lang: str = "en", min_tokens: int = 10,
                          max_tokens: int = 1_000_000,
                          max_dup_line_milli: int = 300):
    """Round-4 full curation: one annotate pass computing token counts,
    Gopher quality gates, repetition stats and PII-scrubbed text, then
    the language/length/quality/repetition filter and exact dedup via
    the bucketed hash semi-join — still one streaming pass over the
    corpus plus the two dedup shuffles. Fully SQL-expressible
    (q_curation_full), so the driver oracle checks the whole
    composition including the redacted text bytes."""
    from .. import textops
    from ..linking import exact_dedup_stats
    from ..ops import semi_join

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        g = textops.gopher_quality(df)
        r = textops.repetition_stats(df["text"])
        p = textops.pii_scrub(df["text"].fillna(""))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang": df["lang"].to_numpy(),
            "tok_cnt": textops.token_count(df["text"]),
            "text_md5": textops.md5_series(df["text"].fillna("")),
            "n_words": g["n_words"].to_numpy(),
            "gopher_pass": g["gopher_pass"].to_numpy(),
            "dup_line_milli": r["dup_line_milli"].to_numpy(),
            "n_emails": p["n_emails"].to_numpy(),
            "n_ips": p["n_ips"].to_numpy(),
            "scrubbed": p["scrubbed"].to_numpy(),
        })

    gated = docs_ds.map_batches(annotate, batch_format="pandas") \
        .map_batches(
            lambda df: df[(df["lang"] == lang)
                          & (df["tok_cnt"] >= min_tokens)
                          & (df["tok_cnt"] <= max_tokens)
                          & (df["gopher_pass"] == 1)
                          & (df["dup_line_milli"] <= max_dup_line_milli)],
            batch_format="pandas")
    keep = exact_dedup_stats(docs_ds).map_batches(
        lambda df: pd.DataFrame({"keep_id": df["keep_id"]}),
        batch_format="pandas")
    return semi_join(gated, keep, "doc_id", "keep_id")
