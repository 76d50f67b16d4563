"""Fuzzy (edit-distance) string self-join.

The approximate-join family member next to ops/setjoin (token-set Jaccard)
and ops/similarity (embedding cosine): all pairs of rows whose string
column is within Levenshtein distance ``k`` — entity resolution over
names/titles, near-identical record detection, label canonicalization.

Execution shape (sound and complete, FastSS / deletion-neighborhood):

1. SIGNATURES — every string emits hashes of all variants obtained by
   deleting <= k characters (k=1: L+1 variants; k=2: O(L^2)).  If
   lev(a, b) <= k the two deletion neighborhoods intersect (Bocek et al.
   2007, "Fast Similarity Search in Large Dictionaries"), so bucketing by
   variant hash NEVER misses a true pair.  Variant hashes are computed in
   O(L) total per string from prefix/suffix rolling hashes (no variant
   string is ever materialized), double-modded into one int64 like
   ops/dedup dup-gram keys (~2^-62 pairwise collision odds).
2. CANDIDATES — variants co-locate by HASH BUCKET (not one group per
   variant — the tiny-group discipline); one vectorized body per bucket
   emits in-variant (a < b) id pairs via the repeat/arange explode, then
   pairs dedup with a map-side-combined groupby.  Candidate work is
   O(sum variant-group^2) — bounded because a variant group is the set of
   strings within distance k of one deletion variant, not a corpus-scale
   bucket; a pathological hot variant (e.g. millions of identical short
   strings) is the operator's documented residual risk — pre-dedup exact
   duplicates first (ops/dedup.exact) if the corpus has them.
3. VERIFY — candidates join back to their strings through a broadcast
   id -> string map (gated by ``FOLKSCOPE_EDITJOIN_BROADCAST_MAX`` rows,
   default 2M, the neardup gate discipline) and a BATCHED Levenshtein DP
   verifies all pairs at once: the column-order dependency of the unit-cost
   DP is folded into a vectorized min-plus prefix scan
   (``minimum.accumulate`` of cand_j - j, plus j back), so the whole block
   of pairs advances one DP row per step with zero Python per pair.

Reference analogue: none (the reference matches eventualities exactly);
this is the §2.4 approximate-join extension.  SQL oracle: DuckDB
``levenshtein`` cross join at sf0.01.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

_EJ_MOD1 = (1 << 31) - 1
_EJ_MOD2 = 2147483629
_EJ_B1, _EJ_B2 = 1000003, 999979


def _delk_hashes(text: str, k: int) -> np.ndarray:
    """int64 keys for every variant of ``text`` with <= k deletions
    (k in {1, 2}), computed from prefix/suffix rolling hashes without ever
    building a variant string: delete-i hashes as
    ``P[i] * B^(L-1-i) + S[i+1]``; delete-(i, j), i < j, as
    ``((P[i] * B^(j-i-1) + mid(i+1, j)) * B^(L-1-j) + S[j+1])`` where
    ``mid(a, b) = P[b] - P[a] * B^(b-a)`` is the substring hash.  The
    delete-2 set is vectorized over all ``triu`` (i, j) pairs."""
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    L = len(arr)
    if L == 0:
        return np.zeros(1, dtype=np.int64)
    ks = []
    iu, ju = (np.triu_indices(L, 1) if (k >= 2 and L >= 2)
              else (np.empty(0, np.int64), np.empty(0, np.int64)))
    for mod, base in ((_EJ_MOD1, _EJ_B1), (_EJ_MOD2, _EJ_B2)):
        a = arr % mod
        pw = np.empty(L + 1, dtype=np.int64)   # pw[j] = B^j mod M
        pw[0] = 1
        for j in range(1, L + 1):
            pw[j] = (pw[j - 1] * base) % mod
        pref = np.zeros(L + 1, dtype=np.int64)  # hash of arr[:i]
        for i in range(L):
            pref[i + 1] = (pref[i] * base + a[i]) % mod
        suf = np.zeros(L + 1, dtype=np.int64)   # hash of arr[i:]
        for i in range(L - 1, -1, -1):
            suf[i] = (a[i] * pw[L - 1 - i] + suf[i + 1]) % mod
        # full string (0 deletions) then delete-i for each i
        h1 = np.empty(L + 1, dtype=np.int64)
        h1[0] = pref[L]
        idx = np.arange(L)
        h1[1:] = (pref[idx] * pw[L - 1 - idx] + suf[idx + 1]) % mod
        if len(iu):
            mid = (pref[ju] - pref[iu + 1] * pw[ju - iu - 1]) % mod
            h2 = ((pref[iu] * pw[ju - iu - 1] + mid) % mod
                  * pw[L - 1 - ju] + suf[ju + 1]) % mod
            ks.append(np.concatenate((h1, h2)))
        else:
            ks.append(h1)
    return ks[0] * np.int64(_EJ_MOD2) + ks[1]


def _del1_hashes(text: str) -> np.ndarray:
    return _delk_hashes(text, 1)


def _lev_mat(A: np.ndarray, la: np.ndarray, B: np.ndarray,
             lb: np.ndarray) -> np.ndarray:
    """Exact Levenshtein over padded char matrices (pad values never affect
    the result: dp[la, lb] only reads A[:, :la] / B[:, :lb])."""
    n = len(la)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    La, Lb = int(la.max()) if n else 0, B.shape[1]
    res = np.where(la == 0, lb, -1).astype(np.int64)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int64), (n, 1))
    jj = np.arange(Lb + 1, dtype=np.int64)
    for i in range(1, La + 1):
        # candidates ignoring insertions: delete (up) and substitute (diag)
        cand = np.empty_like(prev)
        cand[:, 0] = i
        cand[:, 1:] = np.minimum(
            prev[:, 1:] + 1,
            prev[:, :-1] + (A[:, i - 1:i] != B).astype(np.int64))
        # fold insertions (cur[j-1] + 1) via min-plus prefix scan:
        # cur[j] = min_{j' <= j} (cand[j'] + (j - j'))
        cur = np.minimum.accumulate(cand - jj, axis=1) + jj
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def batched_levenshtein(a_strs: list[str], b_strs: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for n pairs at once: one unit-cost DP
    whose horizontal (insertion) dependency is resolved by the min-plus
    prefix trick, so every DP row is a handful of numpy ops over ALL
    pairs."""
    n = len(a_strs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_strs), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_strs), dtype=np.int64, count=n)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(La, 1)), dtype=np.uint32)
    B = np.zeros((n, max(Lb, 1)), dtype=np.uint32)
    for i, s in enumerate(a_strs):
        if s:
            A[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)
    for i, s in enumerate(b_strs):
        if s:
            B[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)
    return _lev_mat(A, la, B, lb)


def edit_distance_selfjoin(ds: Dataset, text_col: str, id_col: str,
                           k: int = 1) -> Dataset:
    """All (a < b by id) row pairs with Levenshtein(text_a, text_b) <= k.
    Signatures are implemented for k in {1, 2} (the entity-resolution
    radii); k=1 verifies DP-free, k=2 through the batched DP kernel.
    Candidate volume grows with k (the <= k-deletion neighborhood is
    O(L^k) variants per string) — the standard FastSS trade."""
    if k not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood signatures implemented for k in {1, 2}; "
            "compose with a coarser prefilter for larger radii")

    from .relational import map_combine_aggregate

    limit = int(os.environ.get("FOLKSCOPE_EDITJOIN_BROADCAST_MAX",
                               2_000_000))
    strings = ds.select_columns([id_col, text_col]).to_pandas()
    if len(strings) > limit:
        raise ValueError(
            f"corpus exceeds FOLKSCOPE_EDITJOIN_BROADCAST_MAX={limit}; "
            "shard the corpus (e.g. by length band) and join shards, or "
            "raise the gate")
    # broadcast ONE padded uint32 char matrix (id-sorted) — verify is then
    # pure numpy gathers, no dict and no Python per pair.  Size is bounded
    # by the gate (rows x max-len x 4B); NUL pad never occurs in real text.
    order = np.argsort(strings[id_col].to_numpy(), kind="stable")
    sids = strings[id_col].to_numpy()[order].astype(np.int64)
    stxt = strings[text_col].to_numpy()[order]
    slen = np.fromiter((len(t) for t in stxt), dtype=np.int64,
                       count=len(stxt))
    W = int(slen.max()) if len(slen) else 1
    smat = np.zeros((len(stxt), max(W, 1)), dtype=np.uint32)
    for r, t in enumerate(stxt):
        if t:
            smat[r, :len(t)] = np.frombuffer(t.encode("utf-32-le"),
                                             dtype=np.uint32)
    corpus_ref = ray.put((sids, slen, smat))

    def signatures(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        keys_l, ids_l = [], []
        for i, t in enumerate(b.column(text_col).to_pylist()):
            h = np.unique(_delk_hashes(t, k))  # dedup in-string variants
            keys_l.append(h)
            ids_l.append(np.full(len(h), ids[i], dtype=np.int64))
        if not keys_l:
            return pa.table({"vkey": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({
            "vkey": pa.array(np.concatenate(keys_l), pa.int64()),
            id_col: pa.array(np.concatenate(ids_l), pa.int64()),
        })

    n_buckets = 64

    def add_bucket(b: pa.Table) -> pa.Table:
        g = b.column("vkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "__b", pa.array((g % n_buckets).astype(np.int64), pa.int64()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vkey", id_col], kind="mergesort")
        v = g["vkey"].to_numpy()
        ids = g[id_col].to_numpy()
        starts = np.flatnonzero(np.concatenate(
            ([True], v[1:] != v[:-1])))
        sizes = np.diff(np.concatenate((starts, [len(v)])))
        # within each variant group of size m emit m(m-1)/2 (a < b) pairs
        # via the repeat/arange explode (ids are sorted within the group)
        m = sizes
        npairs = (m * (m - 1)) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        grp = np.repeat(np.arange(len(m)), npairs)
        off = np.arange(tot) - np.repeat(np.cumsum(npairs) - npairs, npairs)
        # map pair-offset within group -> (i, j) i<j: i = row of triangular
        mm = np.repeat(m, npairs)
        # i such that off < i*m - i(i+1)/2 boundaries: solve vectorized
        # cumulative row starts: row i covers (m-1-i) pairs
        # use the closed form: i = floor((2m-1 - sqrt((2m-1)^2 - 8*off))/2)
        tm = 2 * mm - 1
        i = np.floor((tm - np.sqrt(tm * tm - 8 * off)) / 2).astype(np.int64)
        i = np.clip(i, 0, mm - 2)
        # one-step fixup for float-sqrt boundary error in either direction
        rs = lambda x: x * (2 * mm - x - 1) // 2  # noqa: E731
        i = np.where(rs(i) > off, i - 1, i)
        i = np.where((i + 1 <= mm - 2) & (rs(i + 1) <= off), i + 1, i)
        row_start = rs(i)
        j = off - row_start + i + 1
        base = np.repeat(starts, npairs)
        return pd.DataFrame({"a": ids[base + i], "b": ids[base + j]})

    cands = (ds.select_columns([id_col, text_col])
             .map_batches(signatures, batch_format="pyarrow")
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(bucket_pairs, batch_format="pandas"))

    def verify(b: pa.Table) -> pa.Table:
        # k=1: DP-free exact check, all-numpy — after swapping so la <= lb,
        #   la == lb : dist <= 1  <=>  hamming <= 1 (a lone substitution);
        #   lb-la==1 : dist == 1  <=>  b is a one-char insertion into a,
        #              i.e. chars match up to the first mismatch p and
        #              a[p:] == b[p+1:]  (vectorized shifted comparison);
        #   else     : dist > 1.
        # k=2: length-band prefilter, then the batched DP kernel.
        sids, slen, smat = ray.get(corpus_ref)
        aa = b.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        ai = np.searchsorted(sids, aa)
        bi = np.searchsorted(sids, bb)
        la, lb = slen[ai], slen[bi]
        swap = la > lb
        ai2 = np.where(swap, bi, ai)
        bi2 = np.where(swap, ai, bi)
        la2, lb2 = slen[ai2], slen[bi2]
        A, B = smat[ai2], smat[bi2]
        dist = np.full(len(aa), k + 1, dtype=np.int64)
        dlen = lb2 - la2
        if k == 1:
            mism = A != B
            ham = mism.sum(axis=1)
            eq = dlen == 0
            dist[eq & (ham <= 1)] = ham[eq & (ham <= 1)]
            one = dlen == 1
            if one.any():
                W1 = smat.shape[1]
                cols = np.arange(W1)
                # first mismatch position (la if none — the insertion is
                # then the trailing char of b and the pair matches)
                p = np.where(mism[one].any(axis=1),
                             mism[one].argmax(axis=1), la2[one])
                # a[p:la] must equal b[p+1:lb]  ==  no mismatch between
                # A[:, j] and B[:, j+1] for p <= j < la
                sh = A[one][:, :W1 - 1] != B[one][:, 1:]
                bad = (sh & (cols[:W1 - 1] >= p[:, None])
                       & (cols[:W1 - 1] < la2[one][:, None])).any(axis=1)
                d1 = dist[one]
                d1[~bad] = 1
                dist[one] = d1
        else:
            cand = np.flatnonzero(dlen <= k)
            if len(cand):
                dist[cand] = _lev_mat(A[cand], la2[cand],
                                      B[cand], lb2[cand])
        keep = np.flatnonzero(dist <= k)
        idx = pa.array(keep, pa.int64())
        out = b.select(["a", "b"]).take(idx)
        return out.append_column("dist",
                                 pa.array(dist[keep], pa.int64()))

    # dedup AFTER verify: candidate multiplicity is small (a true pair is
    # found under each shared variant), and this keeps the only (a, b)
    # combine on the verified-pair stream instead of the candidate stream
    return map_combine_aggregate(
        cands.map_batches(verify, batch_format="pyarrow"),
        keys=["a", "b"], mins={"dist": "dist"}, count_alias="__c",
    ).select_columns(["a", "b", "dist"])
