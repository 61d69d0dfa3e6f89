"""Benchmark decontamination (linking.decontaminate /
decontaminate_bucketed): planted-contamination recovery, broadcast-vs-
bucketed parity, and the tokenization contract shared with the DuckDB
oracle twin (q_decontaminate_docs)."""

import numpy as np
import pandas as pd
import pytest

from gitprov_ray import linking


def _corpus(ray_session):
    import ray.data as rd

    bench_text = ("alpha beta gamma delta epsilon zeta eta theta "
                  "iota kappa lambda mu")
    rows = [
        {"doc_id": 0, "text": bench_text},                      # benchmark
        # doc 1: contains an 8-gram window of the benchmark → contaminated
        {"doc_id": 1, "text": "x y " + " ".join(
            bench_text.split()[2:10]) + " z"},
        # doc 2: same words, different order → clean
        {"doc_id": 2, "text": " ".join(reversed(bench_text.split()))},
        # doc 3: verbatim copy → max overlap (5 distinct 8-grams)
        {"doc_id": 3, "text": bench_text},
        # doc 4: too short for any 8-gram
        {"doc_id": 4, "text": "one two three"},
    ]
    df = pd.DataFrame(rows)
    bench = rd.from_pandas(df[df.doc_id == 0])
    corpus = rd.from_pandas(df[df.doc_id != 0]).repartition(2)
    return corpus, bench


def test_planted_contamination_broadcast(ray_session):
    corpus, bench = _corpus(ray_session)
    out = linking.decontaminate(corpus, bench).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [1, 3]
    assert out.n_overlap.tolist() == [1, 5]    # 12 tokens → 5 grams
    assert out.n_overlap.dtype == np.int64


def test_bucketed_matches_broadcast(ray_session):
    corpus, bench = _corpus(ray_session)
    fast = linking.decontaminate(corpus, bench).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    scale = linking.decontaminate_bucketed(corpus, bench).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, scale, check_dtype=False)


def test_tokenization_matches_oracle_contract():
    """Punctuation/case fold exactly like the DuckDB twin's
    string_split_regex(lower(text), '[^a-z0-9]+') + drop-empties."""
    g = linking._word_ngrams("A,b!!c d e f g h", n=8)
    assert g == {"a b c d e f g h"}
    assert linking._word_ngrams("only seven words here not quite eight",
                                n=8) == set()
    assert linking._word_ngrams("", n=8) == set()


def test_ngram_threshold_param(ray_session):
    corpus, bench = _corpus(ray_session)
    # with 4-grams the reversed doc still shares nothing, but doc 1
    # overlaps in more windows
    out = linking.decontaminate(corpus, bench, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert 1 in out.doc_id.tolist() and 3 in out.doc_id.tolist()
    assert 2 not in out.doc_id.tolist()
    assert out.set_index("doc_id").n_overlap[1] == 5   # 8-token window


# --- LM quality scoring (textops.CharTrigramLM / lm_quality_scores) ---


def test_lm_fluent_scores_below_gibberish(ray_session):
    import ray.data as rd

    from gitprov_ray import textops

    fluent = ["the quick brown fox jumps over the lazy dog again and again",
              "a data pipeline reads rows and writes tables every day",
              "the table scan merges sorted runs of row groups"]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        fluent + ["zq xv jj qq kk zz wv xx qzk vjw ppq mzx"])]
    docs = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    ref = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(fluent)]))
    out = textops.lm_quality_scores(docs, ref).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 4
    assert out.lm_millibits.dtype == np.int64
    # in-domain docs score clearly lower cross-entropy than gibberish
    assert out.lm_millibits[:3].max() < out.lm_millibits.iloc[3]


def test_lm_deterministic_and_bounded():
    from gitprov_ray.textops import CharTrigramLM

    lm = CharTrigramLM().fit(["abc abc abd"])
    a = lm.perplexity_bits("abc")
    assert a == lm.perplexity_bits("abc")      # deterministic
    assert 0.0 < a <= 8.0                      # ≤ log2(256)
    assert lm.perplexity_bits("") == 8.0       # degenerate → uniform
