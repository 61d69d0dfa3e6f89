"""Unit parity for the round-4 distributed operators: as-of join, band
join, BFS, Misra–Gries exact top-k, SemDeDup — each checked against a
brute-force pandas/python ground truth on seeded random inputs (the
DuckDB twins cover the corpus-scale contract; these pin edge cases:
keyless rows, empty windows, trimmed sketches, tie-breaks)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gitprov_ray import ops

pytestmark = pytest.mark.usefixtures("ray_session")


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_asof_join_matches_merge_asof():
    rng = _rng()
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n_l), unit="s"),
        "lid": np.arange(n_l, dtype="int64")})
    right = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n_r), unit="s"),
        "v": rng.normal(size=n_r)})
    # (k, ts) unique on the right — the documented precondition
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)

    got = (ops.asof_join(rd.from_pandas(left, override_num_blocks=5),
                         rd.from_pandas(right, override_num_blocks=4),
                         "k", "ts", ["lid"], ["v"], num_buckets=8)
           .to_pandas())
    got = got.sort_values("lid").reset_index(drop=True)

    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", by="k", direction="backward",
                         allow_exact_matches=True)
    want = want.sort_values("lid").reset_index(drop=True)
    assert len(got) == n_l
    assert (got["lid"].astype("int64") == want["lid"]).all()
    pd.testing.assert_series_equal(got["v"].reset_index(drop=True),
                                   want["v"].reset_index(drop=True),
                                   check_names=False)


def test_band_join_count_matches_bruteforce():
    rng = _rng(11)
    band = 500_000          # 0.5 s in micros; bucket width 2 s
    lt = pd.to_datetime(np.sort(rng.integers(0, 60 * 10**6, 300)), unit="us")
    rt = pd.to_datetime(np.sort(rng.integers(0, 60 * 10**6, 500)), unit="us")
    left = pd.DataFrame({"event_id": np.arange(300, dtype="int64"),
                         "ts": lt})
    right = pd.DataFrame({"event_id": np.arange(500, dtype="int64") + 1000,
                          "ts": rt})

    got = (ops.band_join_count(
        rd.from_pandas(left, override_num_blocks=4),
        rd.from_pandas(right, override_num_blocks=3),
        "ts", band, "event_id", bucket_width_us=2_000_000,
        num_buckets=8).to_pandas()
        .sort_values("event_id").reset_index(drop=True))

    l_us = left["ts"].astype("int64").to_numpy()
    r_us = right["ts"].astype("int64").to_numpy()
    want = np.array([int(((r_us > t) & (r_us <= t + band)).sum())
                     for t in l_us])
    assert len(got) == 300
    assert (got["n_follow"].to_numpy() == want).all()


def test_bfs_distances_matches_python_bfs():
    rng = _rng(3)
    edges = pd.DataFrame({
        "s": rng.integers(0, 40, 120).astype("int64"),
        "o": rng.integers(0, 40, 120).astype("int64")})
    got = (ops.bfs_distances(rd.from_pandas(edges, override_num_blocks=3),
                             source=0, num_partitions=2)
           .to_pandas().sort_values("node").reset_index(drop=True))

    adj = {}
    for s, o in edges.itertuples(index=False):
        adj.setdefault(int(s), set()).add(int(o))
    want, frontier, d = {0: 0}, {0}, 0
    while frontier:
        d += 1
        nxt = {o for s in frontier for o in adj.get(s, ())} - want.keys()
        for o in nxt:
            want[o] = d
        frontier = nxt
    wdf = (pd.DataFrame({"node": list(want), "dist": list(want.values())})
           .sort_values("node").reset_index(drop=True))
    assert (got["node"].to_numpy() == wdf["node"].to_numpy()).all()
    assert (got["dist"].to_numpy() == wdf["dist"].to_numpy()).all()


def test_exact_topk_certified_and_fallback():
    rng = _rng(5)
    # zipf-ish stream: sketch certifies with capacity 64
    vals = np.array([f"w{i}" for i in
                     rng.zipf(1.5, 5000).clip(max=400)], dtype=object)
    df = pd.DataFrame({"tok": vals})
    want = (df["tok"].value_counts().rename("n").rename_axis("tok")
            .reset_index())
    want = (want.sort_values(["n", "tok"], ascending=[False, True],
                             kind="mergesort").head(10)
            .reset_index(drop=True))

    got = ops.exact_topk(rd.from_pandas(df, override_num_blocks=6),
                         "tok", k=10, capacity=64)
    assert (got["tok"].to_numpy() == want["tok"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()

    # capacity 2 on a near-uniform stream forces the fallback — still exact
    uni = pd.DataFrame({"tok": np.array(
        [f"u{i % 37}" for i in range(1110)], dtype=object)})
    wu = (uni["tok"].value_counts().rename("n").rename_axis("tok")
          .reset_index().sort_values(["n", "tok"],
                                     ascending=[False, True],
                                     kind="mergesort").head(5)
          .reset_index(drop=True))
    gu = ops.exact_topk(rd.from_pandas(uni, override_num_blocks=5),
                        "tok", k=5, capacity=2)
    assert (gu["tok"].to_numpy() == wu["tok"].to_numpy()).all()
    assert (gu["n"].to_numpy() == wu["n"].to_numpy()).all()


def test_semdedup_plants_are_dropped():
    from gitprov_ray import annsearch

    rng = _rng(9)
    base = rng.normal(size=(60, 16))
    emb = pd.DataFrame({
        "vec_id": np.arange(60, dtype="int64"),
        "embedding": [v.astype(np.float32) for v in base]})
    dup = emb.iloc[:10].copy()
    dup["vec_id"] = dup["vec_id"] + 1000
    planted = pd.concat([emb, dup], ignore_index=True)

    out = (annsearch.semdedup(rd.from_pandas(planted, override_num_blocks=4),
                              k=3, iters=2, threshold=0.9)
           .to_pandas().set_index("vec_id").sort_index())
    assert len(out) == 70
    # every planted copy has its original (smaller id) nearby -> dropped
    assert (~out.loc[1000:]["keep"]).all()
    # originals keep (random normals: off-diagonal cosine << 0.9)
    assert out.loc[:999]["keep"].all()
    # copy lands in its original's cluster
    for i in range(10):
        assert out.loc[i, "cluster"] == out.loc[1000 + i, "cluster"]


def test_histogram_quantiles_bound_and_constant():
    rng = _rng(13)
    v = rng.normal(10, 3, 20000)
    df = pd.DataFrame({"v": v})
    sk = ops.histogram_quantiles(rd.from_pandas(df, override_num_blocks=6),
                                 "v", ps=(0.25, 0.5, 0.9), bins=512)
    srt = np.sort(v)
    binw = (v.max() - v.min()) / 512
    for p, val in zip(sk["p"], sk["value"]):
        exact = srt[int(np.floor(p * (len(v) - 1)))]
        assert abs(val - exact) <= binw + 1e-12
    # degenerate: constant column
    cs = ops.histogram_quantiles(
        rd.from_pandas(pd.DataFrame({"v": np.full(100, 7.0)})), "v",
        ps=(0.5,))
    assert list(cs["value"]) == [7.0]


def test_winnow_duplicate_pairs_planted_span():
    from gitprov_ray import linking

    rng = _rng(7)
    words = [f"w{i:03d}" for i in range(200)]

    def doc(n):
        return " ".join(rng.choice(words, n))

    span = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "text": doc(60)})
    # plant the same long span inside docs 100 and 101 (different context)
    rows.append({"doc_id": 100, "text": doc(30) + " " + span + " " + doc(30)})
    rows.append({"doc_id": 101, "text": doc(25) + " " + span + " " + doc(35)})
    ds = rd.from_pandas(pd.DataFrame(rows), override_num_blocks=4)
    out = (linking.winnow_duplicate_pairs(ds, k=16, w=8, min_shared=3)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert (100, 101) in set(zip(out["a"], out["b"]))
    # the planted pair dominates: no random-word pair shares >= its count
    planted = out[(out["a"] == 100) & (out["b"] == 101)]["shared"].iloc[0]
    others = out[(out["a"] != 100) | (out["b"] != 101)]
    assert others.empty or others["shared"].max() < planted


def test_winnow_fingerprints_short_and_empty_docs():
    from gitprov_ray import linking

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["", "short", "x" * 100]})
    out = (linking.winnow_fingerprints(
        rd.from_pandas(df), k=16, w=8).to_pandas())
    assert set(out["doc_id"]) == {3}          # <16 chars -> no grams
    # constant text: every gram hash identical -> exactly one fingerprint
    assert len(out[out["doc_id"] == 3]) == 1


def test_triangle_count_matches_bruteforce():
    rng = _rng(11)
    n = 40
    # random undirected graph, ~15% density, plus guaranteed triangles
    s, o = np.where(rng.random((n, n)) < 0.15)
    edges = pd.DataFrame({"s": s, "o": o})
    edges = pd.concat([edges, pd.DataFrame(
        {"s": [0, 1, 2, 0], "o": [1, 2, 0, 2]})], ignore_index=True)
    # brute force on the oriented simple graph
    e = edges[edges.s != edges.o].copy()
    u, v = np.minimum(e.s, e.o), np.maximum(e.s, e.o)
    eset = set(zip(u, v))
    ref = sum(1 for (a, b) in eset for c in range(n)
              if b < c and (a, c) in eset and (b, c) in eset)
    got = ops.triangle_count(rd.from_pandas(edges, override_num_blocks=4),
                             num_buckets=8)
    assert got == ref and ref > 0


def test_edit_distance_pairs_joins_and_empty():
    from gitprov_ray import linking

    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": ["kitten", "sitting", "kitten"]})
    pairs = pd.DataFrame({"a": [1, 1], "b": [2, 3]})
    out = (linking.edit_distance_pairs(rd.from_pandas(docs),
                                       rd.from_pandas(pairs))
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert list(out["edit_dist"]) == [3, 0]
    empty = linking.edit_distance_pairs(
        rd.from_pandas(docs), rd.from_pandas(pairs).limit(0))
    assert empty.count() == 0
    assert empty.schema().names == ["a", "b", "edit_dist"]


def test_bloom_semi_join_matches_plain_semi_join():
    rng = _rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 5000, 3000).astype("int64"),
        "lid": np.arange(3000, dtype="int64")})
    right = pd.DataFrame({
        "rk": rng.choice(5000, 120, replace=False).astype("int64")})

    got = (ops.bloom_semi_join(
        rd.from_pandas(left, override_num_blocks=6),
        rd.from_pandas(right, override_num_blocks=3),
        "k", "rk", m_bits=1 << 16)
        .to_pandas().sort_values("lid").reset_index(drop=True))
    want = (left[left["k"].isin(set(right["rk"]))]
            .sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "lid"]], want)


def test_bloom_prefilter_no_false_negatives_and_selective():
    from gitprov_ray.ops import _bloom_member, _bloom_positions

    m_bits, k = 1 << 16, 4
    members = pd.Series(np.arange(500).astype(str))
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = _bloom_positions(members, m_bits, k).ravel()
    np.bitwise_or.at(bm, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    assert _bloom_member(members, bm, m_bits, k).all()
    probes = pd.Series((np.arange(20000) + 10**6).astype(str))
    fp = _bloom_member(probes, bm, m_bits, k).mean()
    assert fp < 0.05


def test_skew_join_matches_pandas_merge():
    rng = _rng(23)
    # one pathologically hot key + a cold tail
    keys = np.concatenate([np.zeros(800, dtype="int64"),
                           rng.integers(1, 50, 400)])
    left = pd.DataFrame({"k": keys, "lid": np.arange(1200, dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(0, 60, dtype="int64")})
    right["v"] = right["rk"] * 10

    got = (ops.skew_join(rd.from_pandas(left, override_num_blocks=6),
                         rd.from_pandas(right, override_num_blocks=3),
                         "k", "rk", hot_threshold=100, num_salts=4)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    want = (left.merge(right.rename(columns={"rk": "k"}), on="k")
            .sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "lid", "v"]].astype({"k": "int64", "v": "int64"}),
        want[["k", "lid", "v"]].astype({"k": "int64", "v": "int64"}))


def test_skew_join_all_cold_path():
    rng = _rng(29)
    left = pd.DataFrame({"k": rng.integers(0, 500, 300).astype("int64"),
                         "lid": np.arange(300, dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(500, dtype="int64"),
                          "v": np.arange(500, dtype="int64") * 2})
    got = (ops.skew_join(rd.from_pandas(left, override_num_blocks=4),
                         rd.from_pandas(right, override_num_blocks=2),
                         "k", "rk", hot_threshold=10**9)
           .to_pandas().sort_values("lid").reset_index(drop=True))
    want = (left.merge(right.rename(columns={"rk": "k"}), on="k")
            .sort_values("lid").reset_index(drop=True))
    assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
    assert (got["v"].to_numpy() == want["v"].to_numpy()).all()


def test_bloom_semi_join_no_match_and_empty_right():
    left = pd.DataFrame({"k": np.arange(100, dtype="int64"),
                         "lid": np.arange(100, dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(1000, 1010, dtype="int64")})
    out = ops.bloom_semi_join(
        rd.from_pandas(left, override_num_blocks=3),
        rd.from_pandas(right, override_num_blocks=2),
        "k", "rk", m_bits=1 << 16).to_pandas()
    assert len(out) == 0
    out = ops.bloom_semi_join(
        rd.from_pandas(left, override_num_blocks=3),
        rd.from_pandas(right.iloc[:0], override_num_blocks=1),
        "k", "rk", m_bits=1 << 16).to_pandas()
    assert len(out) == 0


def test_paragraph_dedup_first_occurrence_wins():
    from gitprov_ray import linking

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a\nb\na",          # in-doc repeat of 'a'
                 "b\nc",             # 'b' already seen in doc 0
                 "c\nd\n",           # trailing sep -> empty last para
                 ""]})               # empty doc -> one empty para
    ds = rd.from_pandas(docs)
    out = (linking.paragraph_dedup(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["total_paras"].tolist() == [3, 2, 3, 1]
    assert out["kept_paras"].tolist() == [2, 1, 2, 0]
    # doc 2's trailing '' wins the empty paragraph; doc 3 keeps nothing
    assert out["dedup_text"].tolist() == ["a\nb", "c", "d\n", ""]


def test_paragraph_dedup_multiblock_global():
    from gitprov_ray import linking

    # same paragraph across many blocks: only the smallest doc_id keeps it
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype="int64"),
                         "text": ["shared\nuniq%d" % i for i in range(40)]})
    ds = rd.from_pandas(docs).repartition(8)
    out = (linking.paragraph_dedup(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "dedup_text"] == "shared\nuniq0"
    assert (out.loc[1:, "kept_paras"] == 1).all()
    assert (out.loc[1:, "dedup_text"] == [
        "uniq%d" % i for i in range(1, 40)]).all()


def test_profile_columns_exact():
    df = pd.DataFrame({
        "a": [1.0, 2.0, 2.0, np.nan, 5.0],
        "b": np.array([10, 10, 20, 30, 30], dtype="int64")})
    out = ops.profile_columns(rd.from_pandas(df).repartition(3), ["a", "b"])
    a = out[out.col_name == "a"].iloc[0]
    b = out[out.col_name == "b"].iloc[0]
    assert (a.n_rows, a.n_null, a.n_distinct) == (5, 1, 3)
    assert (a.min_v, a.max_v) == (1.0, 5.0)
    assert (b.n_rows, b.n_null, b.n_distinct) == (5, 0, 3)
    assert (b.min_v, b.max_v) == (10.0, 30.0)


def test_c4_line_filter_gates():
    from gitprov_ray import textops

    t = pd.Series(["Good line with words.\nno punct\ntiny.\n"
                   "Has a { brace here.\nLorem Ipsum dolor sit amet.\n"
                   "Ends with a question mark?"])
    out = textops.c4_line_filter(t)
    assert out.loc[0, "n_lines"] == 6
    assert out.loc[0, "kept_lines"] == 2
    assert out.loc[0, "cleaned_text"] == (
        "Good line with words.\nEnds with a question mark?")
    assert out.loc[0, "c4_pass"] == 0


def test_bpe_train_consecutive_pair_merge():
    """' a b a b ' shares delimiter spaces: the 2-pass replace must merge
    BOTH occurrences (classic BPE), not every second one."""
    from gitprov_ray import textops

    words = pd.DataFrame({"word": ["abab", "ab"],
                          "cnt": np.array([5, 2], dtype="int64")})
    m = textops.bpe_train(rd.from_pandas(words), n_merges=2)
    # round 1: (a,b) appears 2x in 'abab' (w=10) + 1x in 'ab' (w=2) = 12
    assert (m.loc[0, "left"], m.loc[0, "right"],
            m.loc[0, "pair_count"]) == ("a", "b", 12)
    # round 2 only exists if BOTH 'ab's merged in 'abab' -> pair (ab, ab)
    assert (m.loc[1, "left"], m.loc[1, "right"],
            m.loc[1, "pair_count"]) == ("ab", "ab", 5)


def test_late_data_window_counts_matches_sequential_replay():
    rng = _rng(11)
    n = 3000
    ts = rng.integers(0, 3_600_000_000 * 30, n)          # 30 hours
    ids = np.arange(n, dtype="int64")
    arr = ts + rng.integers(0, 7_200_000_000, n)         # up to 2 h jitter
    W, L = 3_600_000_000, 600_000_000
    # brute-force sequential replay
    order = np.lexsort((ids, arr))
    wm = np.iinfo(np.int64).min
    kept, late = {}, {}
    for i in order:
        win = ts[i] // W * W
        if win + W <= wm - L:
            late[win] = late.get(win, 0) + 1
        else:
            kept[win] = kept.get(win, 0) + 1
        wm = max(wm, ts[i])
    df = pd.DataFrame({"event_id": ids, "ts_us": ts, "arr_us": arr})
    out = (ops.late_data_window_counts(
        rd.from_pandas(df).repartition(9), "ts_us", "arr_us", "event_id",
        window_us=W, lateness_us=L).to_pandas()
        .sort_values("window_start_us").reset_index(drop=True))
    assert int(out["n_late"].sum()) > 0                  # semantics fire
    for _, r in out.iterrows():
        w = int(r["window_start_us"])
        assert r["n_kept"] == kept.get(w, 0), w
        assert r["n_late"] == late.get(w, 0), w
    assert int(out["n_kept"].sum() + out["n_late"].sum()) == n


def test_dup_span_stats_islands_and_edge_docs():
    from gitprov_ray import linking

    shared = "one two three four five six seven eight"   # exactly 8 tokens
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": [
            f"{shared} filler0a filler0b",      # window 0 dup, rest unique
            f"prefix0 prefix1 {shared}",        # dup windows at the tail
            "tiny doc",                          # 2 tokens -> 0 windows
            f"{shared} mid {shared}",           # two separated dup spans
        ]})
    out = (linking.dup_span_stats(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_windows"].tolist() == [3, 3, 0, 10]
    # doc 0: only widx 0 duplicates; doc 1: only the last window; doc 2:
    # nothing; doc 3: windows 0 and 9 (the two shared copies), separated
    assert out["dup_windows"].tolist() == [1, 1, 0, 2]
    assert out["dup_spans"].tolist() == [1, 1, 0, 2]


def test_bfs_join_regime_matches_broadcast_regime():
    """broadcast_max=2 forces the Dataset-join continuation after the
    first round — distances must equal the pure broadcast run."""
    rng = _rng(13)
    e = pd.DataFrame({"s": rng.integers(0, 60, 400),
                      "o": rng.integers(0, 60, 400)}).astype("int64")
    ds = rd.from_pandas(e).repartition(4)
    a = (ops.bfs_distances(ds, source=0).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (ops.bfs_distances(ds, source=0, broadcast_max=2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert a.equals(b)


def test_gopher_stats_hand_computed():
    from gitprov_ray import textops

    # 60 alpha words incl. stop words, no symbols: every gate passes
    good = " ".join(["the", "of", "and"] + [f"word{i}" for i in range(57)])
    # word-soup repetition: 'x y' dominates → g_top2 fails
    rep = "x y " * 40 + "the of " + " ".join(f"w{i}" for i in range(50))
    # bullet-heavy: 10 of 11 lines bullets → g_bullet fails
    bullets = "intro line\n" + "\n".join(f"- b {i}" for i in range(10))
    out = textops.gopher_stats(pd.Series([good, rep, bullets, ""]))

    g = out.iloc[0]
    assert g.n_words == 60 and bool(g.gopher_pass)
    assert g.stop_kinds == 3 and g.n_lines == 1 and g.dup_lines == 0

    r = out.iloc[1]
    assert r.top2_chars == 40 * 2 and not bool(r.g_top2)
    assert bool(r.g_count) and not bool(r.gopher_pass)

    b = out.iloc[2]
    assert b.bullet_lines == 10 and b.n_lines == 11
    assert not bool(b.g_bullet)

    e = out.iloc[3]
    assert e.n_words == 0 and not bool(e.g_count) and not bool(e.g_stop)


def test_gopher_stats_symbol_and_dup_lines():
    from gitprov_ray import textops

    t = pd.Series(["# # #... same\nsame\nsame\nother",
                   "plain text line\nplain text line"])
    out = textops.gopher_stats(t)
    assert out.iloc[0].symbols == 4          # three '#' + one '...'
    assert out.iloc[0].n_lines == 4 and out.iloc[0].dup_lines == 1
    assert out.iloc[1].dup_lines == 1
    assert not bool(out.iloc[1].g_dupline)   # 10*1 > 3*2


def test_merge_upsert_semantics():
    import ray.data as rd
    from gitprov_ray import ops

    base = pd.DataFrame({
        "k": [1, 2, 3, 4], "v": [10, 20, 30, 40],
        "ver": [1, 1, 1, 5]})
    chg = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "v": [11, 21, 31, 41, 51],
        "ver": [2, 2, 1, 4, 1],
        "del": [False, True, False, False, False]})
    out = ops.merge_upsert(
        rd.from_pandas(base).repartition(3),
        rd.from_pandas(chg).repartition(4),
        keys=["k"], order=["ver"], delete_col="del",
        num_buckets=8).to_pandas().sort_values("k").reset_index(drop=True)
    # k=1 change wins (ver 2); k=2 tombstoned; k=3 tie -> changelog
    # beats base; k=4 base keeps (ver 5 > 4); k=5 insert
    assert out["k"].tolist() == [1, 3, 4, 5]
    assert out["v"].tolist() == [11, 31, 40, 51]
    assert out["ver"].tolist() == [2, 1, 5, 1]
    assert "del" not in out.columns and "__src" not in out.columns


def test_luhn_card_stats_known_vectors():
    from gitprov_ray import textops

    t = pd.Series([
        "pay 4111111111111111 now",          # classic valid test PAN
        "pay 4111111111111112 now",          # bad check digit
        "id 79927398713 end",                # valid Luhn but 11 digits
        "a 1234567812345670 b 4111111111111111 c",
        "no digits at all",
        "call +1-555-123-4567 or +1-555-000-1111"])
    out = textops.luhn_card_stats(t)
    assert out["n_cands"].tolist() == [1, 1, 0, 2, 0, 0]
    assert out["n_valid"].tolist() == [1, 0, 0, 2, 0, 0]
    assert out["n_phones"].tolist() == [0, 0, 0, 0, 0, 2]


def test_kmv_distinct_estimate_and_exact_mode():
    import hashlib

    vals = pd.DataFrame({"v": [f"item-{i}" for i in range(2000)] * 3})
    out = ops.kmv_distinct(rd.from_pandas(vals, override_num_blocks=5),
                           "v", k=128)
    assert out["k_used"].iloc[0] == 128
    est = out["est_distinct"].iloc[0]
    assert 1500 < est < 2600            # KMV rse ~ 1/sqrt(k) ≈ 9%

    # fewer distinct than k: the sketch is exact
    small = pd.DataFrame({"v": [f"s{i % 17}" for i in range(300)]})
    o2 = ops.kmv_distinct(rd.from_pandas(small, override_num_blocks=3),
                          "v", k=64)
    assert o2["k_used"].iloc[0] == 17
    assert o2["est_distinct"].iloc[0] == 17
    want_kth = max(int(hashlib.md5(f"s{i}".encode()).hexdigest()[:12], 16)
                   for i in range(17))
    assert o2["kth_hash"].iloc[0] == want_kth


def test_morton2_and_zorder_zone_maps():
    # interleave correctness on known values
    assert ops.morton2(np.array([0b101]), np.array([0b011]))[0] == 0b011011
    assert ops.morton2(np.array([65535]), np.array([0]))[0] == 0x55555555
    assert ops.morton2(np.array([0]), np.array([65535]))[0] == 0xAAAAAAAA
    # zone maps: z-range files cover narrow slices of BOTH dims
    rng = _rng(21)
    df = pd.DataFrame({"x": rng.integers(0, 65536, 20000),
                       "y": rng.integers(0, 65536, 20000)})
    st = ops.zorder_layout_stats(rd.from_pandas(df, override_num_blocks=4),
                                 "x", "y", num_files=4).to_pandas()
    assert st["n"].sum() == 20000
    # 4 z-files quarter the y-range exactly (top interleaved bit is y's)
    for _, r in st.iterrows():
        assert (r.max_y - r.min_y) <= 65536 // 2   # each file: half y-span
        assert (r.max_x - r.min_x) <= 65536        # x spans within bound
    spans_y = (st["max_y"] - st["min_y"]).sum()
    assert spans_y < 4 * 65536 * 0.55              # clustered, not random


def test_hamming_topk_matches_bruteforce():
    from gitprov_ray import annsearch

    rng = _rng(31)
    m = rng.normal(size=(300, 32)).astype(np.float32)
    emb = pd.DataFrame({"vec_id": np.arange(300, dtype="int64"),
                        "embedding": [v for v in m]})
    got = (annsearch.hamming_topk(
        rd.from_pandas(emb, override_num_blocks=5), [0, 7], k=4)
        .to_pandas().sort_values(["query_id", "rank"])
        .reset_index(drop=True))

    bits = m > 0
    for qid in (0, 7):
        ham = (bits != bits[qid]).sum(axis=1)
        cand = pd.DataFrame({"id": np.arange(300), "h": ham})
        cand = cand[cand["id"] != qid].sort_values(
            ["h", "id"], kind="mergesort").head(4)
        sub = got[got["query_id"] == qid]
        assert sub["neighbor_id"].tolist() == cand["id"].tolist()
        assert sub["hamming"].tolist() == cand["h"].tolist()


def test_simhash_neardup_pairs_planted():
    from gitprov_ray import linking, textops

    anchor = "alpha beta gamma delta epsilon zeta " * 8
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [anchor + "tail0", anchor + "tail1",    # near-dup pair
                 "totally different words here one",
                 "and another unrelated doc two",
                 anchor + "tail0",                       # exact dup of 0
                 "more unrelated filler text three"]})
    got = (linking.simhash_neardup_pairs(
        rd.from_pandas(docs, override_num_blocks=3), max_hamming=3)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 4) in pairs                    # exact dup: hamming 0
    h = textops.simhash64(docs["text"])
    ham01 = bin(int(h[0], 16) ^ int(h[1], 16)).count("1")
    assert ((0, 1) in pairs) == (ham01 <= 3)
    assert ((1, 4) in pairs) == (ham01 <= 3)  # same signature as 0
    # no duplicates from multi-band collisions (emit-once)
    assert len(got) == len(pairs)
    hz = got.set_index(["a", "b"])["hamming"]
    assert hz.loc[(0, 4)] == 0


def test_kcore_peel_matches_brute_force():
    """4-round peel on a graph with a planted 4-clique-plus-tail: the
    pendant chain peels away, the clique core survives with in-core
    degrees; engine == sequential NetworkX-style peel."""
    from gitprov_ray import ops

    # 4-clique {0,1,2,3} + chain 3-10-11-12 (chain peels at k=2)
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (3, 10), (10, 11), (11, 12)]
    df = pd.DataFrame({"s": [a for a, _ in e], "o": [b for _, b in e]})
    got = (ops.kcore(rd.from_pandas(df, override_num_blocks=3),
                     k=2, rounds=4, num_buckets=4)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # sequential reference peel, exactly 4 rounds
    edges = {(min(a, b), max(a, b)) for a, b in e}
    for _ in range(4):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= 2}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    ref_deg = {}
    for a, b in edges:
        ref_deg[a] = ref_deg.get(a, 0) + 1
        ref_deg[b] = ref_deg.get(b, 0) + 1
    assert dict(zip(got["node"], got["d"])) == ref_deg
    assert set(got["node"]) == {0, 1, 2, 3}   # the clique survives


def test_ra_link_scores_brute_force():
    """Square with one diagonal: RA/CN scores for the missing diagonal
    only (adjacent pairs are excluded), integer micro-units exact."""
    from gitprov_ray import ops

    # square 0-1-2-3-0 plus diagonal 0-2; missing link is (1,3)
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = pd.DataFrame({"s": [a for a, _ in e], "o": [b for _, b in e]})
    got = (ops.ra_link_scores(rd.from_pandas(df, override_num_blocks=2),
                              num_buckets=4)
           .to_pandas().sort_values(["p", "q"]).reset_index(drop=True))
    # (1,3) shares neighbors 0 (deg 3) and 2 (deg 3):
    #   cn=2, ra = 2 * (10^6 // 3)
    assert got.loc[(got["p"] == 1) & (got["q"] == 3),
                   ["cn", "ra_micro"]].values.tolist() == \
        [[2, 2 * (1_000_000 // 3)]]
    # every adjacent pair is excluded
    adj = {(min(a, b), max(a, b)) for a, b in e}
    assert not (set(zip(got["p"], got["q"])) & adj)


def test_phrase_search_repeated_word_and_overlaps():
    """The offset-alignment vote trick on its hard cases: a phrase with
    a REPEATED word, overlapping matches, and a doc with none."""
    from gitprov_ray import textops

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["x batch batch batch batch y",     # overlapping: 2 hits
                 "batch batch",                      # too short: 0
                 "a batch batch batch",              # exactly 1 at pos 1
                 "nothing here"]})
    got = (textops.phrase_search(
        rd.from_pandas(docs, override_num_blocks=2),
        "batch batch batch", num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 2]
    assert got["n_matches"].tolist() == [2, 1]
    assert got["first_pos"].tolist() == [1, 1]


def test_interval_join_cross_bucket_and_canonical_emit():
    """Intervals spanning several halo buckets: every overlap is found
    exactly once (the canonical-bucket rule), including pairs whose
    overlap crosses a bucket boundary; brute force is the referee."""
    from gitprov_ray import ops

    W = 1000                       # tiny bucket width to force halos
    rng = np.random.default_rng(11)
    ls = rng.integers(0, 10_000, 60)
    le = ls + rng.integers(1, 3_500, 60)       # spans up to 3.5 buckets
    rs = rng.integers(0, 10_000, 80)
    re_ = rs + rng.integers(1, 2_500, 80)
    left = pd.DataFrame({"id": np.arange(60, dtype="int64"),
                         "s": ls.astype("int64"),
                         "e": le.astype("int64")})
    right = pd.DataFrame({"id": np.arange(80, dtype="int64"),
                          "s": rs.astype("int64"),
                          "e": re_.astype("int64")})
    got = (ops.interval_join(rd.from_pandas(left, override_num_blocks=3),
                             rd.from_pandas(right, override_num_blocks=2),
                             bucket_width_us=W, num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = {}
    for i in range(60):
        n = ov = 0
        for j in range(80):
            if ls[i] <= re_[j] and rs[j] <= le[i]:
                n += 1
                ov += min(le[i], re_[j]) - max(ls[i], rs[j])
        if n:
            ref[i] = (n, ov)
    assert dict(zip(got["id"],
                    zip(got["n_overlaps"], got["sum_overlap_us"]))) == ref


def test_soundex_published_examples():
    """NARA's own coding examples (simple vowel-separated variant:
    h/w code '0' like vowels): Robert/Rupert collide, Tymczak's
    adjacent same-code letters code once, Pfister's first-letter
    collapse gives P236 (the NARA-documented code), Jackson J250."""
    from gitprov_ray.textops import soundex_vec

    cases = {"Robert": "R163", "Rupert": "R163", "Tymczak": "T522",
             "Pfister": "P236", "Honeyman": "H555", "Jackson": "J250",
             "Soundex": "S532", "Example": "E251", "bob": "B100",
             "x": "X000", "": "", "123": ""}
    got = soundex_vec(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_random_walks_match_sequential_replay():
    """The distributed walk joins land on exactly the nodes a
    sequential md5 replay picks (square-with-diagonal graph)."""
    import hashlib

    from gitprov_ray import ops

    e = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = pd.DataFrame({"s": [a for a, _ in e], "o": [b for _, b in e]})
    got = (ops.random_walks(rd.from_pandas(df, override_num_blocks=2),
                            length=3, num_buckets=4)
           .to_pandas())
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adj.items()}
    ref = []
    for s0 in sorted(adj):
        cur = s0
        ref.append((s0, 0, cur))
        for t in range(1, 4):
            nb = adj[cur]
            pick = int(hashlib.md5(f"{cur}:{t}".encode())
                       .hexdigest()[:8], 16) % len(nb)
            cur = nb[pick]
            ref.append((s0, t, cur))
    assert sorted(map(tuple, got[["start", "step", "node"]]
                      .itertuples(index=False))) == sorted(ref)


def test_grid_distance_join_brute_force():
    """Random integer points incl. cell-boundary pairs: the 3x3 halo
    grid finds exactly the brute-force within-radius sets, and the
    nearest tie-break is (d2, id)."""
    from gitprov_ray import ops

    rng = np.random.default_rng(3)
    R = 500
    lx = rng.integers(0, 5000, 50)
    ly = rng.integers(0, 5000, 50)
    rx = rng.integers(0, 5000, 70)
    ry = rng.integers(0, 5000, 70)
    left = pd.DataFrame({"id": np.arange(50, dtype="int64"),
                         "x": lx.astype("int64"),
                         "y": ly.astype("int64")})
    right = pd.DataFrame({"id": np.arange(70, dtype="int64"),
                          "x": rx.astype("int64"),
                          "y": ry.astype("int64")})
    got = (ops.grid_distance_join(
        rd.from_pandas(left, override_num_blocks=3),
        rd.from_pandas(right, override_num_blocks=2),
        radius=R, num_buckets=8)
        .to_pandas().sort_values("id").reset_index(drop=True))
    ref = {}
    for i in range(50):
        cands = []
        for j in range(70):
            d2 = int((lx[i] - rx[j]) ** 2 + (ly[i] - ry[j]) ** 2)
            if d2 <= R * R:
                cands.append((d2, j))
        if cands:
            cands.sort()
            ref[i] = (len(cands), cands[0][1], cands[0][0])
    assert dict(zip(got["id"], zip(got["n_within"], got["nearest_id"],
                                   got["nearest_d2"]))) == ref


def test_label_propagation_barbell_and_regime_parity(ray_session):
    """Two triangles joined by one bridge edge: after 2 synchronous
    rounds with (count desc, min label) tie-break, each triangle
    converges to its minimum id; broadcast and join regimes agree."""
    import pandas as pd
    import ray.data as rd

    from gitprov_ray import ops

    edges = pd.DataFrame({
        "src": [0, 1, 2, 10, 11, 12, 2],
        "dst": [1, 2, 0, 11, 12, 10, 10]})
    ds = rd.from_pandas(edges)
    got = (ops.label_propagation(ds, rounds=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    lab = dict(zip(got["node"], got["label"]))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[11] == lab[12]
    # join regime (broadcast_max=0) must produce identical labels
    got2 = (ops.label_propagation(rd.from_pandas(edges), rounds=4,
                                  broadcast_max=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert got.equals(got2)


def test_label_propagation_rejects_wide_ids(ray_session):
    """The (u<<32)|v packed edge key is only injective for ids in
    [0, 2^31) — wider or negative ids must raise, not silently alias
    (ADVICE r04)."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from gitprov_ray import ops

    for bad in (pd.DataFrame({"src": [1, 2**31], "dst": [2, 3]}),
                pd.DataFrame({"src": [1, -5], "dst": [2, 3]})):
        with pytest.raises((ValueError, Exception)) as ei:
            ops.label_propagation(rd.from_pandas(bad), rounds=1).to_pandas()
        assert "2^31" in str(ei.value) or "2^31" in repr(ei.value)


def test_semdedup_auto_sizes_k(ray_session):
    """k=None derives the cluster count from count() so the expected
    cluster stays ~target_cluster_rows — the quadratic within-cluster
    pass is bounded at any corpus size (VERDICT r04 #3). Explicit k is
    honored unchanged (the oracle twins pin it)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gitprov_ray import annsearch

    assert annsearch._auto_k(10_000_000) == 100
    assert annsearch._auto_k(1_000_000_000) == 10_000
    assert annsearch._auto_k(50) == 4          # floor
    assert annsearch._auto_k(2) == 2           # capped at n
    assert annsearch._auto_k(320, target=40) == 8

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "vec_id": np.arange(240, dtype=np.int64),
        "embedding": [rng.normal(size=8).tolist() for _ in range(240)]})
    ds = rd.from_pandas(df, override_num_blocks=4)
    # target=40 rows/cluster over 240 rows -> k=6 clusters
    out = annsearch.semdedup(ds, k=None, iters=2,
                             target_cluster_rows=40).to_pandas()
    assert len(out) == 240
    assert out["cluster"].nunique() <= 6 and out["cluster"].max() <= 5
    # kmeans auto-size path works standalone too
    asn, cent = annsearch.kmeans_embeddings(ds, k=None, iters=2,
                                            target_cluster_rows=40)
    assert cent.shape == (6, 8)
    assert asn.count() == 240
