"""TransE trainer (G9, reference run_transE.py:17-118 re-expressed
Ray-Data-first): distributed synchronous epochs, deterministic corrupt-tail
negatives, fixed-point gradient partials."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from folkscope_ray.stages.transe import build_vocab, train_transe


def _toy_triples(n_blocks: int) -> rd.Dataset:
    rows = []
    ents = [f"e{i}" for i in range(12)]
    for i in range(60):
        rows.append(
            {
                "subj": ents[i % 12],
                "pred": ["likes", "near"][i % 2],
                "obj": ents[(i * 5 + 3) % 12],
            }
        )
    return rd.from_pandas(__import__("pandas").DataFrame(rows)).repartition(n_blocks)


def test_vocab_and_shapes():
    ents, rels = build_vocab(_toy_triples(2))
    assert ents == sorted(set(ents)) and rels == ["likes", "near"]
    entities, rels, ent_emb, rel_emb = train_transe(
        _toy_triples(2), dim=8, epochs=2, lr=0.05
    )
    assert ent_emb.shape == (len(entities), 8)
    assert rel_emb.shape == (len(rels), 8)
    # final entity rows are L2-normalized (reference renorm semantics)
    np.testing.assert_allclose(np.linalg.norm(ent_emb, axis=1), 1.0, atol=1e-9)


def test_partition_invariance():
    """Fixed-point per-contribution quantization makes the trained matrices
    bit-identical regardless of how the triples are partitioned."""
    _, _, emb_a, rel_a = train_transe(_toy_triples(1), dim=8, epochs=3, lr=0.05)
    _, _, emb_b, rel_b = train_transe(_toy_triples(7), dim=8, epochs=3, lr=0.05)
    assert np.array_equal(emb_a, emb_b)
    assert np.array_equal(rel_a, rel_b)


def test_margin_loss_decreases():
    """Training separates positives from the deterministic negatives."""
    ds = _toy_triples(2)

    def mean_loss(entities, rels, ent_emb, rel_emb, margin=1.0):
        eid = {e: i for i, e in enumerate(entities)}
        rid = {r: i for i, r in enumerate(rels)}
        df = ds.to_pandas()
        from folkscope_ray.util import stable_u64

        h = np.array([eid[s] for s in df["subj"]])
        r = np.array([rid[p] for p in df["pred"]])
        t = np.array([eid[o] for o in df["obj"]])
        t_neg = np.array([stable_u64(0, a, b, c) % len(entities)
                          for a, b, c in zip(h, r, t)])
        dp = np.linalg.norm(ent_emb[h] + rel_emb[r] - ent_emb[t], axis=1)
        dn = np.linalg.norm(ent_emb[h] + rel_emb[r] - ent_emb[t_neg], axis=1)
        return float(np.maximum(margin + dp - dn, 0).mean())

    e0, r0, emb0, rel0 = train_transe(ds, dim=8, epochs=0, lr=0.05)
    e1, r1, emb1, rel1 = train_transe(ds, dim=8, epochs=8, lr=0.05)
    assert mean_loss(e1, r1, emb1, rel1) < mean_loss(e0, r0, emb0, rel0)
