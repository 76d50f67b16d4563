"""Critic: plausibility + typicality scoring and threshold filter.

The reference scores every assertion with fine-tuned DeBERTa classifiers and
keeps rows whose softmax score clears a threshold chosen on a PR curve
(src/classifier/run_classification.py:396-411,634-656;
src/classifier/precision_recall_selection.py:21-54).  Here the same stage is a
stateful actor pool with a deterministic seeded scorer (sandbox has no GPU /
model weights); the contract — batch of assertions in, same batch + two score
columns out, filter downstream — is identical, so a real model actor drops in.

Scores are pure functions of (pair_key, gen_idx, assertion) so the
single-process oracle reproduces them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import stable_uniform

PLAUSIBILITY_THRESHOLD = 0.5   # precision@recall-selected cut, reference sweeps thresholds
CRITIC_BATCH_SIZE = 2048       # reference eval batch is 32 on GPU (run_predict.sh:13)


def plausibility_score(pair_key: str, gen_idx: int, assertion: str) -> float:
    """Deterministic stand-in for P(valid) = softmax[:, 1] (run_classification.py:68-71)."""
    base = stable_uniform("plaus", pair_key, gen_idx)
    length_bonus = 0.05 * min(len(assertion.split()), 10) / 10.0
    return round(min(0.999, 0.10 + 0.85 * base + length_bonus), 6)


def typicality_score(pair_key: str, gen_idx: int, assertion: str) -> float:
    base = stable_uniform("typic", pair_key, gen_idx)
    return round(min(0.999, 0.05 + 0.90 * base), 6)


def prep_critic_text(assertion: str, name_a: str, name_b: str) -> str:
    """Classifier input prep: substitute the Item A / Item B placeholders
    with the actual entity names (run_classification.py:479-482)."""
    return assertion.replace("Item A", name_a).replace("Item B", name_b)


def prep_critic_batch(batch: pa.Table, a_col: str = "surf_a",
                      b_col: str = "surf_b",
                      text_col: str = "assertion") -> pa.Table:
    texts = [
        prep_critic_text(t, a, b)
        for t, a, b in zip(
            batch.column(text_col).to_pylist(),
            batch.column(a_col).to_pylist(),
            batch.column(b_col).to_pylist(),
        )
    ]
    return batch.append_column("critic_input", pa.array(texts, pa.string()))


class Critic:
    """Actor-pool scorer: model state loads once per actor in ``__init__``."""

    def __init__(self, threshold: float = PLAUSIBILITY_THRESHOLD):
        self.threshold = threshold  # a real impl would load weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hashlib import blake2b

        keys = batch.column("pair_key").to_pylist()
        gens = batch.column("gen_idx").to_pylist()
        # score the prepped classifier input when the caller ran
        # prep_critic_batch (placeholder substitution,
        # run_classification.py:479-482); raw assertion otherwise — a real
        # model dropped in here then sees the substituted text, not
        # "Item A/Item B" placeholders
        text_col = ("critic_input" if "critic_input" in batch.column_names
                    else "assertion")
        texts = batch.column(text_col).to_pylist()
        n = len(keys)
        plaus = np.empty(n, dtype=np.float64)
        typic = np.empty(n, dtype=np.float64)
        # inlined plausibility_score / typicality_score (same bytes hashed,
        # bit-identical outputs — pytest-asserted): the per-row function-call
        # + *args-join overhead was ~2x the hash itself on this 6M-row stage
        ib = int.from_bytes
        for i in range(n):
            k, g, a = keys[i], gens[i], texts[i]
            bp = ib(blake2b(f"plaus|{k}|{g}".encode(), digest_size=8).digest(),
                    "little") / 2**64
            bt = ib(blake2b(f"typic|{k}|{g}".encode(), digest_size=8).digest(),
                    "little") / 2**64
            # len(a.split()) with the work capped at 11 tokens: only
            # min(nw, 10) feeds the bonus, and maxsplit bounds the per-row
            # cost on long assertions (equivalence vs plausibility_score is
            # pinned by an irregular-whitespace pytest)
            nw = len(a.split(None, 10))
            plaus[i] = round(min(0.999, 0.10 + 0.85 * bp
                                 + 0.05 * min(nw, 10) / 10.0), 6)
            typic[i] = round(min(0.999, 0.05 + 0.90 * bt), 6)
        out = batch.append_column("plausibility", pa.array(plaus, pa.float64()))
        out = out.append_column("typicality", pa.array(typic, pa.float64()))
        # threshold filter fused into the scoring batch (avoids a second pass)
        return out.filter(pc.greater_equal(out.column("plausibility"), self.threshold))
