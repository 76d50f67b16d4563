"""Embedding-cosine near-duplicate detection (exact + LSH scale path).

Oracle: numpy all-pairs cosine on the same table (and, via the driver gate,
the DuckDB ``list_cosine_similarity`` SQL in ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"
TAU = 0.4


def _emb():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def _oracle_pairs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round((m @ m.T) * 1e6) / 1e6
    order = np.argsort(ids, kind="stable")
    ids, sims = ids[order], sims[np.ix_(order, order)]
    iu, ju = np.triu_indices(len(ids), 1)
    keep = sims[iu, ju] >= TAU
    return {
        (int(ids[i]), int(ids[j])): float(sims[i, j])
        for i, j in zip(iu[keep], ju[keep])
    }


def test_exact_pairs_match_numpy_oracle():
    from folkscope_ray.ops.similarity import embedding_neardup_pairs

    got = embedding_neardup_pairs(_emb(), tau=TAU).to_pandas()
    want = _oracle_pairs()
    assert len(want) > 0, "threshold too high: no pairs to verify"
    got_map = {(int(a), int(b)): float(c)
               for a, b, c in zip(got["a"], got["b"], got["cosine"])}
    assert got_map == want


def test_exact_pairs_invariant_to_partitioning():
    from folkscope_ray.ops.similarity import embedding_neardup_pairs

    def run(nblocks):
        ds = _emb().repartition(nblocks)
        df = embedding_neardup_pairs(ds, tau=TAU).to_pandas()
        return df.sort_values(["a", "b"]).reset_index(drop=True)

    a, b = run(1), run(7)
    assert a.equals(b)


def test_lsh_pairs_are_subset_of_exact():
    from folkscope_ray.ops.similarity import (
        embedding_neardup_pairs_lsh,
    )

    got = embedding_neardup_pairs_lsh(_emb(), tau=TAU, n_planes=2).to_pandas()
    want = _oracle_pairs()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    assert got_pairs <= set(want)
    # single-band hyperplane LSH collision prob at cosine 0.4 is
    # (1 - acos(0.4)/pi)^2 ~ 0.40; assert half that to stay variance-safe
    assert len(got_pairs) >= len(want) * 0.2


def test_components_group_transitively():
    from folkscope_ray.ops.similarity import embedding_neardup_components

    comp = embedding_neardup_components(_emb(), tau=TAU).to_pandas()
    lab = {int(i): int(c) for i, c in zip(comp["vec_id"], comp["component"])}
    # every vector labeled exactly once
    n = _emb().count()
    assert len(lab) == n
    # union-find oracle over the exact pair set
    parent = {i: i for i in lab}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _oracle_pairs():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in lab}
    # canonical root = min member, which is what min-label propagation yields
    roots: dict[int, int] = {}
    for i, r in want.items():
        roots[r] = min(roots.get(r, r), i)
    want = {i: roots[find(i)] for i in lab}
    assert lab == want


def test_word_jaccard_vs_query_matches_python_oracle():
    """Vectorized factorize/bincount kernel == naive per-row set oracle."""
    import ray.data as rd

    from folkscope_ray.ops.dedup import word_jaccard_vs_query

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    q_text = (
        docs.filter(lambda r: r["doc_id"] == 0).to_pandas()["text"].iloc[0]
    )
    got = (
        word_jaccard_vs_query(
            docs.filter(lambda r: r["doc_id"] != 0), q_text
        )
        .to_pandas().set_index("doc_id")["jaccard"].to_dict()
    )
    df = docs.to_pandas()
    qset = set(q_text.lower().split())
    for _, row in df.iterrows():
        if row["doc_id"] == 0:
            continue
        ws = set(str(row["text"]).lower().split())
        inter = len(ws & qset)
        denom = len(ws) + len(qset) - inter
        want = np.floor((inter / denom if denom else 0.0) * 1e6 + 0.5) / 1e6
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_word_jaccard_edge_cases():
    """Empty text, text identical to the query, disjoint text."""
    import ray.data as rd

    from folkscope_ray.ops.dedup import word_jaccard_vs_query

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "alpha  beta\tgamma\n"},
            {"doc_id": 3, "text": "zeta eta theta"},
            {"doc_id": 4, "text": "ALPHA beta"},
        ]
    )
    out = (
        word_jaccard_vs_query(ds, "alpha beta gamma")
        .to_pandas().set_index("doc_id")["jaccard"].to_dict()
    )
    assert out[1] == 0.0
    assert out[2] == 1.0
    assert out[3] == 0.0
    assert out[4] == np.floor(2 / 3 * 1e6 + 0.5) / 1e6


def test_kmeans_assign_partition_invariant_and_clusters():
    """kmeans_assign is bit-identical across block counts (fixed-point
    training) and separates two planted blobs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.similarity import kmeans_assign

    rng = np.random.RandomState(4)
    a = rng.standard_normal((60, 8)) * 0.05 + np.array([1, 0, 0, 0, 0, 0, 0, 0])
    b = rng.standard_normal((60, 8)) * 0.05 + np.array([0, 1, 0, 0, 0, 0, 0, 0])
    df = pd.DataFrame({"vec_id": np.arange(120),
                       "embedding": list(np.vstack([a, b]))})
    outs = []
    for nb in (1, 6):
        out = (kmeans_assign(rd.from_pandas(df, override_num_blocks=nb),
                             n_centroids=2, n_iters=4)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    ca = set(outs[0]["cluster_id"][:60])
    cb = set(outs[0]["cluster_id"][60:])
    assert len(ca) == 1 and len(cb) == 1 and ca != cb


def test_semantic_dedup_min_id_survivor_and_partitioning():
    """Planted exact duplicates: within each near-dup group only the
    smallest id survives, regardless of block layout (SemDeDup shape)."""
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.similarity import semantic_dedup

    rng = np.random.RandomState(9)
    base = rng.randn(40, 16)
    # ids 100..103 duplicate id 0's vector; 200 duplicates id 7's
    vecs = np.vstack([base, base[0], base[0], base[0], base[0], base[7]])
    ids = np.concatenate([np.arange(40), [100, 101, 102, 103], [200]])
    df = pd.DataFrame({"vec_id": ids.astype(np.int64),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    outs = []
    for nblocks in (1, 6):
        out = (semantic_dedup(rd.from_pandas(df).repartition(nblocks),
                              tau=0.999, n_centroids=4, n_iters=2)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        outs.append(out)
        keep = out.set_index("vec_id")["keep"]
        assert keep[0] and keep[7]                     # originals survive
        assert not keep[[100, 101, 102, 103, 200]].any()  # copies pruned
        # distinct directions survive (near-orthogonal at tau=0.999)
        assert keep[list(range(40))].all()
    pd.testing.assert_frame_equal(outs[0], outs[1])
