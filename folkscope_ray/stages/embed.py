"""Edge-text embedding stage (T7): the SBERT actor-pool contract.

The reference embeds every KG edge sentence with a SentenceTransformer
loaded once per process and encoded in fixed batches of 512
(src/recommendation/preprocess.py:168-199: ``SentenceTransformer(
'all-MiniLM-L6-v2')``, ``batch_size = 512``, ``model.encode(batched)``).
Here the same stage is a Ray Data actor pool: ``__init__`` is where a real
deployment loads the transformer (once per actor, amortized across batches);
this sandbox has no torch, so the model is a deterministic hashed
bag-of-words encoder with the identical I/O contract — swap ``_load_model``
to return the real SentenceTransformer and nothing else changes.

Usage:
    ds.map_batches(SentenceEmbedder, batch_format="pyarrow",
                   fn_constructor_kwargs={"text_col": "obj"},
                   concurrency=(1, N))   # num_gpus=1 per actor on GPU
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EMBED_DIM = 384          # all-MiniLM-L6-v2 output width
EMBED_BATCH_SIZE = 512   # preprocess.py:179


class _DeterministicSentenceModel:
    """Hashed bag-of-words stand-in for SentenceTransformer.encode: each
    token hashes to a fixed pseudo-random unit direction; a sentence embeds
    as the L2-normalized token sum, so token overlap => cosine similarity
    (the property the downstream mean-pool / ANN consumers exercise)."""

    def __init__(self, dim: int):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            from ..util import stable_u64

            rng = np.random.RandomState(stable_u64("embed", tok) % (2 ** 31))
            v = rng.standard_normal(self.dim)
            v /= np.linalg.norm(v)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = v
        return v

    def encode(self, sentences: list[str]) -> np.ndarray:
        out = np.zeros((len(sentences), self.dim), dtype=np.float64)
        for i, s in enumerate(sentences):
            toks = s.lower().split()
            if toks:
                out[i] = np.sum([self._token_vec(t) for t in toks], axis=0)
                n = np.linalg.norm(out[i])
                if n > 0:
                    out[i] /= n
        return out


def _load_model(dim: int):
    # real deployment: from sentence_transformers import SentenceTransformer
    #                  return SentenceTransformer("all-MiniLM-L6-v2")
    return _DeterministicSentenceModel(dim)


class SentenceEmbedder:
    """map_batches actor: model loaded ONCE in ``__init__``; ``__call__``
    slices its block into fixed ``EMBED_BATCH_SIZE`` inference batches
    internally (the reference's fixed-batch contract) instead of forcing
    Ray-level row bundling."""

    def __init__(self, text_col: str = "obj", out_col: str = "embedding",
                 dim: int = EMBED_DIM):
        self.text_col = text_col
        self.out_col = out_col
        self.model = _load_model(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        chunks = [
            self.model.encode(texts[i:i + EMBED_BATCH_SIZE])
            for i in range(0, len(texts), EMBED_BATCH_SIZE)
        ]
        embs = np.concatenate(chunks) if chunks else np.zeros((0, self.model.dim))
        return batch.append_column(
            self.out_col, pa.array(embs.tolist(), pa.list_(pa.float64()))
        )
