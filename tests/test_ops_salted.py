"""Salted two-phase aggregation: exactness under hot-key skew."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_salted_counts_exact_with_hot_key():
    import ray.data as rd
    from gitprov_ray.ops import salted_value_counts

    # hot key: 'hot' holds 80% of rows
    vals = ["hot"] * 8000 + [f"k{i % 50}" for i in range(2000)]
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    for final in ("driver", "shuffle"):
        out = salted_value_counts(ds, "v", num_salts=8, final=final)
        assert int(out[out["v"] == "hot"]["n"].iloc[0]) == 8000
        assert int(out["n"].sum()) == 10000


@pytest.mark.usefixtures("ray_session")
def test_salted_sum_matches_pandas():
    import numpy as np
    import ray.data as rd
    from gitprov_ray.ops import salted_sum

    df = pd.DataFrame({"k": [f"g{i % 7}" for i in range(5000)],
                       "x": np.arange(5000, dtype="int64")})
    exp = df.groupby("k", as_index=False)["x"].sum().sort_values("k")
    for final in ("driver", "shuffle"):
        out = salted_sum(rd.from_pandas(df), "k", "x", num_salts=4,
                         final=final)
        assert list(out["k"]) == list(exp["k"])
        assert list(out["sum_x"]) == list(exp["x"])


@pytest.mark.usefixtures("ray_session")
def test_transitive_closure_path_doubling():
    """ops.transitive_closure: chains close in log2 rounds; result equals
    the brute-force reachability set."""
    import itertools

    import ray.data as rd

    from gitprov_ray.ops import transitive_closure

    # two chains (0..5), (10..13) and a diamond 20->21,20->22,21->23,22->23
    edges = ([(i, i + 1) for i in range(5)] +
             [(i, i + 1) for i in range(10, 13)] +
             [(20, 21), (20, 22), (21, 23), (22, 23)])
    df = pd.DataFrame(edges, columns=["s", "o"]).astype("int64")
    out = transitive_closure(rd.from_pandas(df), num_partitions=2) \
        .to_pandas().sort_values(["s", "o"]).reset_index(drop=True)

    want = set()
    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
    for start in {s for s, _ in edges}:
        seen, stack = set(), [start]
        while stack:
            for nxt in adj.get(stack.pop(), ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        want.update((start, x) for x in seen)
    got = set(zip(out.s, out.o))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_pagerank_known_graph_with_dangling():
    """ops.pagerank on a 3-ring + feeder + a truly DANGLING node (4 has
    no out-edges, so its mass redistributes uniformly each round):
    converged ranks match a brute-force power-iteration reference and
    total mass stays 1."""
    import numpy as np
    import ray.data as rd

    from gitprov_ray.ops import pagerank

    # 0->1, 1->2, 2->0 ring; 3 -> 0 feeder; 4 receives from nobody and
    # has NO out-edges (dangling: its mass redistributes uniformly)
    e = pd.DataFrame({"src": [0, 1, 2, 3, 0],
                      "dst": [1, 2, 0, 0, 4]})
    out = pagerank(rd.from_pandas(e), iters=40).to_pandas() \
        .set_index("node")["score"]
    assert abs(out.sum() - 1.0) < 1e-9          # mass conserved
    # brute-force reference power iteration
    nodes = [0, 1, 2, 3, 4]
    outd = {0: 2, 1: 1, 2: 1, 3: 1}
    s = {v: 1 / 5 for v in nodes}
    for _ in range(40):
        dang = sum(s[v] for v in nodes if v not in outd)
        new = {v: 0.15 / 5 + 0.85 * dang / 5 for v in nodes}
        for src, dst in zip(e["src"], e["dst"]):
            new[dst] += 0.85 * s[src] / outd[src]
        s = new
    for v in nodes:
        assert abs(out[v] - round(s[v], 9)) < 1e-9, v


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_accuracy_and_determinism():
    """HLL sketch: ≤3% relative error at p=12 across cardinality regimes
    (linear-counting AND raw-estimate branches), identical estimate
    under different partitionings (mergeable + stable hash)."""
    import numpy as np
    import ray.data as rd

    from gitprov_ray.ops import hll_distinct

    for n_distinct in (100, 5000, 60000):
        vals = np.arange(n_distinct).repeat(2)
        est1, _ = hll_distinct(
            rd.from_pandas(pd.DataFrame({"u": vals})).repartition(3), "u")
        est2, _ = hll_distinct(
            rd.from_pandas(pd.DataFrame({"u": vals})).repartition(11), "u")
        assert est1 == est2                     # partition-invariant
        assert abs(est1 - n_distinct) / n_distinct < 0.03


@pytest.mark.usefixtures("ray_session")
def test_hll_md5_partition_invariant_and_accurate():
    """md5-hash HLL (the oracle-checkable variant): identical estimate
    under different partitionings, <3% error in both regimes, and p!=12
    rejected (the nibble math is pinned to 3-nibble buckets)."""
    import numpy as np
    import ray.data as rd

    from gitprov_ray.ops import hll_distinct

    for n_distinct in (150, 20000):
        vals = np.arange(n_distinct).repeat(2)
        est1, _ = hll_distinct(
            rd.from_pandas(pd.DataFrame({"u": vals})).repartition(3),
            "u", hash="md5")
        est2, _ = hll_distinct(
            rd.from_pandas(pd.DataFrame({"u": vals})).repartition(11),
            "u", hash="md5")
        assert est1 == est2
        assert abs(est1 - n_distinct) / n_distinct < 0.03
    with pytest.raises(ValueError):
        hll_distinct(rd.range(10), "id", p=10, hash="md5")


def test_pagerank_regimes_agree():
    """broadcast_max=2 forces the join regime — scores must equal the
    broadcast regime at the round-9 contract."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gitprov_ray.ops import pagerank

    rng = np.random.default_rng(5)
    e = pd.DataFrame({"src": rng.integers(0, 40, 300),
                      "dst": rng.integers(0, 40, 300)}).astype("int64")
    ds = rd.from_pandas(e).repartition(4)
    a = (pagerank(ds, iters=3).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (pagerank(ds, iters=3, broadcast_max=2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert (a["node"] == b["node"]).all()
    assert np.abs(a["score"] - b["score"]).max() <= 2e-9
