"""Entity canonicalization: minhash-LSH banding + union-find.

The north rule adds a stage the reference lacks (it only exact-hashes with
sha1 eids/cids, src/pattern/object.py:130,711): near-duplicate entity surface
forms ("json_parser", "JsonParser", "json_parser_impl", ...) must map to one
canonical id.  Distributed shape:

1. surface normalization + per-batch partial dedup (map-side combine — this is
   the skew defence: the hot entity that appears in ~30% of rows collapses to
   ONE row per batch *before* any shuffle, so no reducer sees the hot key's
   full row stream);
2. ``groupby(norm)`` over the partials -> distinct normalized surfaces;
3. per-surface minhash (character 3-gram shingles, 64 perms) banded into
   ``LSH_BANDS`` bands of ``LSH_ROWS`` rows -> (band_id, band_hash, norm);
4. ``groupby(band_id, band_hash)`` emits *star* candidate edges (min-norm ->
   other) — O(group) edges, never the O(group²) clique, so even a pathological
   hot band stays linear;
5. the bounded candidate-edge set (≤ #surfaces × #bands) is verified with real
   3-gram Jaccard ≥ ``JACCARD_THRESHOLD`` and union-found on the driver;
   the canonical id of a component is its lexicographically-smallest member;
6. the surface -> canonical map is broadcast via ``ray.put`` and applied
   inside ``map_batches`` — a broadcast join, not a shuffle join.

For corpora where even the *distinct-surface* set outgrows the driver, step 5
degrades gracefully to iterative min-label propagation over the edge Dataset
(groupby(node).min(label) until fixpoint); the star-edge emission already
bounds each round.  Documented, not needed at current scale.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

N_PERMS = 64
LSH_BANDS = 32
LSH_ROWS = 2          # N_PERMS == LSH_BANDS * LSH_ROWS; narrow bands => high
                      # candidate recall even at Jaccard ~0.5 (verifier filters)
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.8   # only for non-prefix near-dups; see is_near_duplicate
MAX_SUFFIX_EXTRA = 4      # prefix-extension variants: base + <=4 extra chars
DRIVER_BANDING_MAX = 200_000  # below this many distinct surfaces, band on driver

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=N_PERMS, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=N_PERMS, dtype=np.int64)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_surface(surface: str) -> str:
    """snake/camel/Pascal/kebab case-fold to a bare alnum form."""
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", surface)
    return _NORM_RE.sub("", s.lower())


def shingles(norm: str) -> set[int]:
    if len(norm) < SHINGLE_K:
        return {hash_shingle(norm)}
    return {hash_shingle(norm[i : i + SHINGLE_K]) for i in range(len(norm) - SHINGLE_K + 1)}


def hash_shingle(s: str) -> int:
    # FNV-1a 64-bit: deterministic across processes (unlike builtin hash)
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_sig(norm: str) -> np.ndarray:
    sh = np.fromiter(shingles(norm), dtype=np.uint64)
    vals = (sh[:, None].astype(np.int64) * _PERM_A + _PERM_B) % _MERSENNE
    return vals.min(axis=0)


def band_hashes(norm: str) -> list[int]:
    sig = minhash_sig(norm).reshape(LSH_BANDS, LSH_ROWS)
    out = []
    for band in sig:
        h = 0xCBF29CE484222325
        for v in band:
            h = ((h ^ int(v)) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out.append(h)
    return out


def jaccard(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if inter else 0.0


def is_near_duplicate(a: str, b: str) -> bool:
    """Edge verifier for candidate pairs from LSH banding.

    Union-find is transitive, so the verifier must be strict enough that
    chains cannot bridge distinct entities that share a long suffix
    ("local_allocator" ~ "disk_allocator" have char-3-gram J = 0.5 — a naive
    J >= 0.5 cut over-merges through such chains).  Two rules:

    - prefix extension: one norm extends the other by <= MAX_SUFFIX_EXTRA
      chars ("jsonparser" -> "jsonparserimpl", "jsonparser2") — the shape of
      real fork/version/impl suffixes;
    - otherwise a high Jaccard bar (>= JACCARD_THRESHOLD) for genuine
      near-identical strings.
    """
    if a == b:
        return True
    lo, hi = (a, b) if len(a) <= len(b) else (b, a)
    if hi.startswith(lo) and len(hi) - len(lo) <= MAX_SUFFIX_EXTRA:
        return True
    return jaccard(a, b) >= JACCARD_THRESHOLD


# ------------------------------------------------------------- Ray stages

def _distinct_norms_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine: distinct (norm, surface-sample) pairs per batch.

    ``pc.unique`` first (vectorized) — only the few hundred distinct surfaces
    per block pay the Python normalization, not every row."""
    import pyarrow.compute as pc

    seen: dict[str, str] = {}
    for col in ("surf_a", "surf_b"):
        if col in batch.column_names:
            for s in pc.unique(batch.column(col)).to_pylist():
                n = normalize_surface(s)
                if n not in seen or s < seen[n]:
                    seen[n] = s
    return pa.table(
        {
            "norm": pa.array(list(seen.keys()), pa.string()),
            "surface": pa.array(list(seen.values()), pa.string()),
        }
    )


def _band_rows_batch(batch: pa.Table) -> pa.Table:
    norms = batch.column("norm").to_pylist()
    b_ids, b_hashes, b_norms = [], [], []
    for n in norms:
        for bid, bh in enumerate(band_hashes(n)):
            b_ids.append(bid)
            b_hashes.append(bh)
            b_norms.append(n)
    return pa.table(
        {
            "band_id": pa.array(b_ids, pa.int32()),
            "band_hash": pa.array(b_hashes, pa.uint64()),
            "norm": pa.array(b_norms, pa.string()),
        }
    )


def _star_edges(group) -> "pa.Table":
    import pandas as pd

    norms = sorted(set(group["norm"]))
    if len(norms) < 2:
        return pd.DataFrame({"a": [], "b": []})
    root = norms[0]
    return pd.DataFrame({"a": [root] * (len(norms) - 1), "b": norms[1:]})


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical id = lexicographically smallest member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def build_canonical_map(pairs_or_surfaces: Dataset) -> dict[str, str]:
    """surface-bearing Dataset -> {normalized surface: canonical id}.

    One distributed pass computes per-batch partial dedups (the skew defence);
    the partials are merged on the driver while they stream back.  Only if the
    merged set exceeds ``DRIVER_BANDING_MAX`` does the full distributed
    ``groupby(norm)`` + banding path run instead."""
    partials = pairs_or_surfaces.map_batches(
        _distinct_norms_batch, batch_format="pyarrow"
    ).materialize()  # tiny per-block partials; full-parallel map pass
    seen: set[str] = set()
    overflow = False
    for tbl in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if "norm" in tbl.column_names:
            seen.update(tbl.column("norm").to_pylist())
        if len(seen) > DRIVER_BANDING_MAX:
            overflow = True
            break
    if overflow:  # web-scale path: distributed distinct
        distinct = (
            partials.groupby("norm")
            .map_groups(lambda g: g.head(1), batch_format="pandas")
        ).materialize()
        norm_list = []
        for tbl in distinct.iter_batches(batch_size=None, batch_format="pyarrow"):
            if "norm" in tbl.column_names:
                norm_list.extend(tbl.column("norm").to_pylist())
    else:
        distinct = None
        norm_list = sorted(seen)

    if len(norm_list) <= DRIVER_BANDING_MAX:
        return canonical_from_norms(norm_list)
    uf = UnionFind()
    for n in norm_list:
        uf.find(n)
    bands = distinct.map_batches(_band_rows_batch, batch_format="pyarrow")
    edges = bands.groupby(["band_id", "band_hash"]).map_groups(
        _star_edges, batch_format="pandas"
    )
    edge_df = edges.to_pandas()
    for a, b in zip(edge_df["a"], edge_df["b"]):
        if is_near_duplicate(a, b):
            uf.union(a, b)
    return {n: uf.find(n) for n in norm_list}


def canonical_from_norms(norm_list: list[str]) -> dict[str, str]:
    """Driver-side banding + union-find over a (small) distinct-norm list —
    the same minhash-LSH math as the distributed path, minus the shuffle."""
    uf = UnionFind()
    buckets: dict[tuple[int, int], list[str]] = {}
    for n in norm_list:
        uf.find(n)
        for bid, bh in enumerate(band_hashes(n)):
            buckets.setdefault((bid, bh), []).append(n)
    for members in buckets.values():
        if len(members) > 1:
            members = sorted(set(members))
            root = members[0]
            for m in members[1:]:
                if is_near_duplicate(root, m):
                    uf.union(root, m)
    return {n: uf.find(n) for n in norm_list}


def apply_canonical(batch: pa.Table, canon: dict[str, str]) -> pa.Table:
    """Broadcast-join the canonical map onto surf_a/surf_b columns."""
    out = batch
    for col, new in (("surf_a", "canon_a"), ("surf_b", "canon_b")):
        surfs = batch.column(col).to_pylist()
        canons = [canon.get(normalize_surface(s), normalize_surface(s)) for s in surfs]
        out = out.append_column(new, pa.array(canons, pa.string()))
    return out


class CanonicalMapper:
    """Actor-style callable: resolves the broadcast map once per worker."""

    def __init__(self, canon_ref):
        self.canon = ray.get(canon_ref) if isinstance(canon_ref, ray.ObjectRef) else canon_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_canonical(batch, self.canon)
