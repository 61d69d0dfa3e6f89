"""Text-analysis operators over document tables (training-data pipeline ops).

All vectorized (pandas str kernels / numpy) inside ``map_batches``; the
hashes are md5-based and process-stable (no Python ``hash()``).

Operators: token counting, punctuation/quality stats, normalization
fingerprint, n-gram-heuristic language ID, 64-bit SimHash.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_PUNct = r"[.,;:!?]"

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "de", "que", "es", "un", "una", "por", "con"},
}
_LANGS = sorted(STOPWORDS)


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace token count; empty/blank text → 0. SQL twin:
    CASE WHEN trim(text)='' THEN 0 ELSE len(string_split_regex(trim(text),'\\s+')) END."""
    stripped = texts.fillna("").str.strip()
    n = stripped.str.split(_WS).str.len()
    return n.where(stripped != "", 0).astype("int64")


def punct_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.count(_PUNct).astype("int64")


def normalize_text(texts: pd.Series) -> pd.Series:
    """lower + collapse whitespace + strip (the fingerprint normal form)."""
    return texts.fillna("").str.lower().str.replace(_WS, " ", regex=True).str.strip()


def md5_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def fingerprint(texts: pd.Series) -> pd.Series:
    """Document fingerprint = md5 of the normalized text."""
    return md5_series(normalize_text(texts))


def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword-heuristic language ID; 'und' below confidence."""
    out = []
    for t in texts.fillna(""):
        toks = t.lower().split()
        if not toks:
            out.append("und")
            continue
        scores = [(sum(w in STOPWORDS[l] for w in toks) / len(toks), l)
                  for l in _LANGS]
        best, lang = max(scores)
        out.append(lang if best >= 0.08 else "und")
    return pd.Series(out, index=texts.index)


def _stable_token_hash(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")


def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (stable md5 token hashes).
    Returned as a hex string (Arrow/DuckDB-friendly; uint64 doesn't fit
    int64)."""
    bits = np.arange(64, dtype=np.uint64)
    out = []
    for t in texts.fillna(""):
        toks = t.split()
        if not toks:
            out.append("0" * 16)
            continue
        hs = np.fromiter((_stable_token_hash(tok) for tok in toks),
                         dtype=np.uint64, count=len(toks))
        votes = ((hs[:, None] >> bits) & np.uint64(1)).astype(np.int64)
        sig = (votes.sum(axis=0) * 2 > len(toks)).astype(np.uint64)
        val = np.uint64(0)
        for b in range(64):
            if sig[b]:
                val |= np.uint64(1) << np.uint64(b)
        out.append(format(int(val), "016x"))
    return pd.Series(out, index=texts.index)


def quality_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length/punct/stopword-ratio quality features (integers only so the
    oracle value-hash is FP-safe)."""
    t = df[text_col]
    toks = token_count(t)
    out = pd.DataFrame(
        {
            "n_chars_m": t.fillna("").str.len().astype("int64"),
            "tok_cnt": toks,
            "punct_cnt": punct_count(t),
        }
    )
    return out
