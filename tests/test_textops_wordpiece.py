"""WordPiece greedy longest-match tokenizer (textops.wordpiece_*)."""

import numpy as np
import pandas as pd
import pytest

from gitprov_ray import textops as T


def test_examples():
    assert T.wordpiece_tokenize("the") == ["the"]
    assert T.wordpiece_tokenize("interesting") == ["inter", "##est",
                                                   "##ing"]
    assert T.wordpiece_tokenize("zzz") == ["z", "##z", "##z"]
    assert T.wordpiece_tokenize("a") == ["a"]
    assert T.wordpiece_tokenize("") == []
    # truncation contract: only the first 16 chars tokenize
    long = "x" * 40
    assert len(T.wordpiece_tokenize(long)) == 16


def test_pieces_reassemble_and_greedy():
    """Pieces concatenate back to the word, and every piece is the
    LONGEST vocab match at its position (the greedy invariant)."""
    rng = np.random.default_rng(4)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(alpha[i] for i in rng.integers(0, 26,
                                                    rng.integers(1, 16)))
             for _ in range(300)]
    words += ["interesting", "preconditions", "understanding",
              "theations", "quest", "ations"]
    for w in words:
        w = w[:T.WORDPIECE_WORD_CAP]
        pieces = T.wordpiece_tokenize(w)
        flat = "".join(p.lstrip("#") for p in pieces)
        assert flat == w, w
        pos = 0
        for p in pieces:
            cont = pos > 0
            raw = p[2:] if p.startswith("##") else p
            assert (raw, cont) in set(T.WORDPIECE_VOCAB), (w, p)
            for longer in T._WP_BY_LEN[cont]:
                if len(longer) <= len(raw):
                    break
                assert not w.startswith(longer, pos), (w, p, longer)
            pos += len(raw)


def test_stats_matches_tokenize():
    texts = pd.Series(["The quick brown fox", "", None,
                       "interesting preconditions!!", "a b c"])
    out = T.wordpiece_stats(texts)
    for i, t in enumerate(texts.fillna("")):
        import re

        words = re.findall(r"[a-z]+", t.lower())
        pieces = [p for w in words
                  for p in T.wordpiece_tokenize(w[:T.WORDPIECE_WORD_CAP])]
        assert out["n_words"][i] == len(words)
        assert out["n_pieces"][i] == len(pieces)
        assert out["n_cont"][i] == sum(p.startswith("##") for p in pieces)
