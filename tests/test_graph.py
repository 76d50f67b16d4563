"""Fixed-point distributed PageRank: exactness vs a single-process integer
reference, bit-invariance across block layouts, broadcast == shuffle."""

import pandas as pd
import pytest
import ray.data as rd

from folkscope_ray.ops.graph import SCALE, pagerank


def _reference_pagerank(edges: list[tuple[str, str]], iterations: int = 10,
                        damping_pct: int = 85) -> dict[str, int]:
    """Single-process mirror of the fixed-point recurrence."""
    nodes = sorted({n for e in edges for n in e})
    out_deg: dict[str, int] = {}
    for s, _d in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    ranks = {n: SCALE for n in nodes}
    base = SCALE * (100 - damping_pct) // 100
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += ranks[s] // out_deg[s]
        ranks = {n: base + (incoming[n] * damping_pct) // 100 for n in nodes}
    return ranks


@pytest.fixture()
def edges():
    # a hub, a cycle, sink nodes, parallel edges
    return [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
            ("d", "c"), ("d", "c"), ("e", "a")]


def test_pagerank_matches_reference(edges):
    exp = _reference_pagerank(edges)
    out = pagerank(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]),
                       override_num_blocks=3),
        iterations=10,
    ).to_pandas()
    got = dict(zip(out["node"], out["rank_units"]))
    assert got == exp


def test_pagerank_block_invariant_and_hub_ranking(edges):
    df = pd.DataFrame(edges * 5, columns=["src", "dst"])  # parallel edges
    outs = []
    for blocks in (1, 4):
        out = pagerank(rd.from_pandas(df, override_num_blocks=blocks),
                       iterations=6).to_pandas().sort_values("node")
        outs.append(list(zip(out["node"], out["rank_units"])))
    assert outs[0] == outs[1]
    ranks = dict(outs[0])
    assert ranks["c"] == max(ranks.values())  # most in-links wins


def test_pagerank_shuffle_mode_identical(edges):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    b = pagerank(rd.from_pandas(df, override_num_blocks=3), iterations=3,
                 mode="broadcast").to_pandas().sort_values("node") \
        .reset_index(drop=True)
    s = pagerank(rd.from_pandas(df, override_num_blocks=3), iterations=3,
                 mode="shuffle").to_pandas().sort_values("node") \
        .reset_index(drop=True)
    assert b.equals(s)


def test_bfs_depths_planted_and_mode_equivalence():
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.graph import bfs_depths

    # path 1->2->3->4, branch 2->5, island 9->10; undirected via reversal
    e = pd.DataFrame({"src": [1, 2, 3, 2, 9],
                      "dst": [2, 3, 4, 5, 10]})
    und = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
    ds = rd.from_pandas(und, override_num_blocks=3)
    out = (bfs_depths(ds, seeds=[1], max_depth=6, mode="broadcast")
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == [1, 2, 3, 4, 5]
    assert out["depth"].tolist() == [0, 1, 2, 3, 2]
    # depth cap respected
    capped = (bfs_depths(ds, seeds=[1], max_depth=2, mode="broadcast")
              .to_pandas().sort_values("node").reset_index(drop=True))
    assert capped["depth"].max() == 2 and 4 not in capped["node"].tolist()
    # shuffle mode is bit-identical
    shuf = (bfs_depths(ds, seeds=[1], max_depth=6, mode="shuffle")
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert shuf["node"].tolist() == out["node"].tolist()
    assert shuf["depth"].tolist() == out["depth"].tolist()
    # multi-seed: island joins via its own seed
    multi = (bfs_depths(ds, seeds=[1, 9], max_depth=6, mode="broadcast")
             .to_pandas().sort_values("node").reset_index(drop=True))
    assert multi[multi["node"] == 10]["depth"].iloc[0] == 1


def test_bfs_modes_equivalent_on_random_graph():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.graph import bfs_depths

    rng = np.random.RandomState(23)
    e = pd.DataFrame({"src": rng.randint(0, 150, 800),
                      "dst": rng.randint(0, 150, 800)})
    und = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
    ds = rd.from_pandas(und, override_num_blocks=5)
    a = (bfs_depths(ds, seeds=[0, 77], max_depth=5, mode="broadcast")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (bfs_depths(ds, seeds=[0, 77], max_depth=5, mode="shuffle")
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a["node"].tolist() == b["node"].tolist()
    assert a["depth"].tolist() == b["depth"].tolist()
