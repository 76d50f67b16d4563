"""Prompt fan-out: pair -> 21 (pair x relation) prompt rows.

Analogue of BehaviorTemplate.cobuy_generate (src/generator/prompt.py:81-100):
every pair expands to exactly N_RELATIONS prompt rows, each carrying the md5
pair key (src/generator/utils.py:42-49) used downstream for dedup / resume.
Implemented as a vectorized 1->21 explode inside ``map_batches`` (never
``ds.flat_map`` per row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..relations import N_RELATIONS, PAIR_PREDICATE, REL_NAMES, RELATIONS
from ..util import md5_hex, pair_key

_SUFFIXES = [r.suffix for r in RELATIONS]

# single-entity predicate — the reference's single_buy variant uses column 1
# of the prompt dict ("because the product is ...", prompt.py:41-47,66-81)
SINGLE_PREDICATE = 'The project uses "[A]" '
_SINGLE_SUFFIXES = [
    r.suffix.replace("they both are", "the component is")
    .replace("they are both", "the component is")
    .replace("they both have", "the component has")
    .replace("they are", "the component is")
    .replace("they could both", "the component could")
    for r in RELATIONS
]


def expand_single_prompts(batch: pa.Table, entity_col: str = "surf_a") -> pa.Table:
    """1 entity row -> N_RELATIONS single-entity prompt rows (the single_buy
    analogue; same fan-out law as the pair form)."""
    n = batch.num_rows
    if n == 0:
        # typed empty WITH the fan-out columns: returning the input batch
        # unchanged would omit rel/prompt/pair_key and diverge the stream
        # schema (the expand_prompts _empty() discipline)
        out = batch
        for c in ("rel", "prompt", "pair_key"):
            out = out.append_column(c, pa.array([], pa.string()))
        return out
    idx = np.repeat(np.arange(n, dtype=np.int64), N_RELATIONS)
    rep = batch.take(pa.array(idx))
    rels = np.tile(np.asarray(REL_NAMES, dtype=object), n)
    ents = rep.column(entity_col).to_pylist()
    suffixes = np.tile(np.asarray(_SINGLE_SUFFIXES, dtype=object), n)
    prompts = [
        SINGLE_PREDICATE.replace("[A]", e) + suf for e, suf in zip(ents, suffixes)
    ]
    keys = [md5_hex(f"{e}-{r}") for e, r in zip(ents, rels)]
    out = rep.append_column("rel", pa.array(rels, pa.string()))
    out = out.append_column("prompt", pa.array(prompts, pa.string()))
    out = out.append_column("pair_key", pa.array(keys, pa.string()))
    return out


def expand_prompts(batch: pa.Table) -> pa.Table:
    """1 pair row -> N_RELATIONS prompt rows (vectorized repeat + tile)."""
    n = batch.num_rows
    if n == 0:
        return _empty()
    # repeat each pair row N_RELATIONS times (zero-copy take on Arrow)
    idx = np.repeat(np.arange(n, dtype=np.int64), N_RELATIONS)
    rep = batch.take(pa.array(idx))
    rels = np.tile(np.asarray(REL_NAMES, dtype=object), n)
    surf_a = rep.column("surf_a").to_pylist()
    surf_b = rep.column("surf_b").to_pylist()
    suffixes = np.tile(np.asarray(_SUFFIXES, dtype=object), n)
    prompts = [
        PAIR_PREDICATE.replace("[A]", a).replace("[B]", b) + suf
        for a, b, suf in zip(surf_a, surf_b, suffixes)
    ]
    # util.pair_key IS the canonical format (oracle.py joins on it) — one
    # implementation, not an inline re-spelling that could drift
    keys = [pair_key(a, b, r) for a, b, r in zip(surf_a, surf_b, rels)]
    out = rep.append_column("rel", pa.array(rels, pa.string()))
    out = out.append_column("prompt", pa.array(prompts, pa.string()))
    out = out.append_column("pair_key", pa.array(keys, pa.string()))
    return out


def _empty() -> pa.Table:
    return pa.table(
        {
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "content_sha256": pa.array([], pa.string()),
            "surf_a": pa.array([], pa.string()),
            "surf_b": pa.array([], pa.string()),
            "rel": pa.array([], pa.string()),
            "prompt": pa.array([], pa.string()),
            "pair_key": pa.array([], pa.string()),
        }
    )
