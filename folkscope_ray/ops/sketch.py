"""Distributed sketch / order-statistic operators.

Two shapes a 100-TB pipeline needs that Ray Data doesn't ship:

- exact_quantiles_by_counting : exact discrete quantiles without a global
  sort.  Shuffle only (value, count) pairs via groupby(value) — for bounded
  integer domains (prices in cents, lengths, scores) the histogram is tiny
  regardless of row count, so no all-to-all over the data and no driver
  materialization beyond the histogram.  For unbounded/continuous domains,
  quantize to a fixed grid first (the same trade every exact-at-scale
  quantile makes).  Matches DuckDB ``quantile_disc`` bit-exactly: the
  selected element is the smallest value whose cumulative count ≥ n·q
  (q = 0 → the minimum).

- HyperLogLog : mergeable distinct-count sketch.  Each batch folds its
  values into 2^p max registers (one ``np.maximum.at`` pass); partials merge
  by elementwise max — commutative and idempotent, so the estimate is
  bit-identical at ANY parallelism / block order, which is what lets the
  committed golden fixture gate it.  4 KB per partial at p=12 (±1.6% rel
  error) — the operator that counts distinct surfaces across 100 TB without
  a distinct shuffle.

Reference analogue: the corpus-level distinct-surface statistics pass
(pattern mining min-frequency calibration, pattern_filter.py:120-153)
counts distincts by materializing them; these are the scale-correct forms.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


# ----------------------------------------------------- exact quantiles

def exact_quantiles_by_counting(ds: Dataset, value_col: str,
                                qs: list[float]) -> pd.DataFrame:
    """Exact discrete quantiles of an integer-valued column.

    Phase 1 (distributed): per-batch ``value_counts`` partials →
    ``groupby(value).sum`` — the only shuffle moves (value, count) pairs,
    bounded by the value domain, not the row count.
    Phase 2 (driver): sort the histogram (len = n_distinct, small by
    assumption — assert it) and walk the cumulative counts.

    Returns (q, value) with DuckDB ``quantile_disc`` semantics."""

    def partial_counts(b: pa.Table) -> pa.Table:
        v = b.column(value_col)
        vc = pc.value_counts(v.combine_chunks())
        return pa.table({
            "value": vc.field("values"),
            "__n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from .relational import map_combine_aggregate

    hist = (
        map_combine_aggregate(
            ds.select_columns([value_col])
            .map_batches(partial_counts, batch_format="pyarrow"),
            keys=["value"], sums={"__n": "n"}, count_alias="n")
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    values = hist["value"].to_numpy()
    out = []
    for q in qs:
        if total == 0:
            out.append({"q": float(q), "value": None})
            continue
        # quantile_disc rank = max(1, ceil(q * n)) in EXACT arithmetic —
        # ``total * float(q)`` can round ABOVE the true integer product
        # (25 * 0.28 == 7.000000000000001) and select the next element
        # where DuckDB returns the exact-rank one.  Fraction(str(q))
        # recovers the decimal the caller wrote, so the product is exact.
        rank = max(1, math.ceil(Fraction(str(float(q))) * total))
        # first histogram row whose cumulative count reaches the rank
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append({"q": float(q), "value": values[min(idx, len(values) - 1)]})
    return pd.DataFrame(out)


# --------------------------------------------------------- HyperLogLog

_HLL_P = 12  # 4096 registers, ~1.04/sqrt(m) = 1.6% std error


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash_u64(arr: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a value array, stable across
    processes, runs, AND library versions: the hash determines the HLL
    registers and therefore the operator's OUTPUT (golden-fixture gated), so
    it must never ride on ``pd.util.hash_array`` internals that a pandas
    upgrade could change.  Integers get the splitmix64 finalizer (pure
    uint64 arithmetic); everything else hashes md5(str(v)) and takes the
    first 8 digest bytes (md5 is md5 forever)."""
    if np.issubdtype(arr.dtype, np.integer):
        z = arr.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
    from .split import _md5_digests

    dig = _md5_digests(pa.array(arr))
    return dig[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)


# per-byte leading-zero-count LUT for the exact vectorized clz
_CLZ8 = np.array([8] + [7 - int(np.floor(np.log2(i))) for i in range(1, 256)],
                 dtype=np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros of nonzero uint64 values:
    big-endian byte view, first nonzero byte via argmax, per-byte LUT."""
    b = x.astype(">u8").view(np.uint8).reshape(-1, 8)
    first = np.argmax(b != 0, axis=1)
    lead = b[np.arange(len(b)), first].astype(np.int64)
    return first * 8 + _CLZ8[lead]


def hll_partial(values: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """Fold a value array into a fresh 2^p uint8 register vector."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash_u64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    rho = np.clip(_clz64(rest) + 1, 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard bias-corrected HLL estimate with the small-range
    linear-counting correction (both branches deterministic)."""
    m = len(regs)
    est = _hll_alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_by_key(ds: Dataset, key_col: str, value_col: str,
                        p: int = _HLL_P) -> pd.DataFrame:
    """Approximate distinct ``value_col`` per ``key_col``:
    per-batch (key, registers) partials, groupby(key) elementwise-max merge,
    deterministic estimate.  Only key×4KB partials ever shuffle.  Returns
    (key, approx_distinct:int64) — the estimate is rounded so the result is
    integer-stable for hash comparison."""
    m = 1 << p

    def partials(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        vals = b.column(value_col).to_numpy(zero_copy_only=False)
        # one stable sort, then contiguous per-key segments (no O(keys·rows)
        # boolean rescans when the key cardinality grows)
        order = np.argsort(keys, kind="stable")
        uniq, starts = np.unique(keys[order], return_index=True)
        bounds = np.append(starts, len(keys))
        regs = [hll_partial(vals[order[bounds[i]:bounds[i + 1]]], p)
                for i in range(len(uniq))]
        return pa.table({
            key_col: pa.array(uniq),
            "regs": pa.array([r.tolist() for r in regs],
                             pa.list_(pa.uint8(), m)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.max(np.asarray(list(g["regs"]), dtype=np.uint8), axis=0)
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "approx_distinct": [int(np.floor(hll_estimate(regs) + 0.5))],
        })

    return (
        ds.select_columns([key_col, value_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values(key_col)
        .reset_index(drop=True)
    )


# ----------------------------------------------------- heavy hitters

def heavy_hitters(ds: Dataset, key_col: str, top_k: int,
                  capacity: int | None = None) -> Dataset:
    """EXACT top-k most frequent keys via the two-pass sketch pattern:

    1. Misra-Gries candidate pass: each block summarizes its stream with a
       ``capacity``-slot decrementing counter sketch (any key with block
       frequency > n_block/capacity survives; the union of block candidates
       is a SUPERSET of every key with global frequency > n/capacity —
       the standard MG merge guarantee).  Only O(blocks × capacity)
       candidate rows shuffle, never the key universe.
    2. Exact recount of candidates only: the (small) candidate set is
       broadcast and one counting pass recounts them exactly — false
       candidates get their true (small) counts and lose in the final
       top-k; true heavy hitters are never missed when
       ``capacity > n / f_k`` (f_k = k-th largest frequency).

    Returns (key, n) for the top-k by exact count, ties broken by key
    ascending.  ``capacity`` defaults to ``8 * top_k``.

    EXACTNESS CONDITION: the result equals the true top-k whenever the k-th
    largest global frequency exceeds n_total/capacity (heavy-tailed streams),
    and unconditionally when no block holds more than ``capacity`` distinct
    keys (bounded key domains).  For near-uniform streams where f_k <=
    n/capacity, raise ``capacity`` — exact top-k over such streams
    fundamentally requires counting the key universe."""
    import ray as _ray

    cap = capacity or 8 * top_k

    def mg_partial(b: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            b.column(key_col).to_numpy(zero_copy_only=False),
            return_counts=True)
        if len(vals) > cap:
            # keep the cap largest block counts — every key with block
            # frequency above n_block/cap survives (MG guarantee holds)
            keep = np.argsort(-counts, kind="stable")[:cap]
            vals, counts = vals[keep], counts[keep]
        return pa.table({key_col: pa.array(vals),
                         "n": pa.array(counts, pa.int64())})

    # distinct candidate union only — per-block counts exist solely to pick
    # which keys survive truncation, so the combine is a bounded-domain
    # dedup, not Ray's Aggregate machinery (map_combine_aggregate's auto
    # gate: narrow tree-reduce while blocks × cap fits one task, shuffle of
    # the already-collapsed partials beyond)
    from .relational import map_combine_aggregate

    candidates = map_combine_aggregate(
        ds.select_columns([key_col])
        .map_batches(mg_partial, batch_format="pyarrow"),
        keys=[key_col], sums={"n": "__cand_n"},
        count_alias="__cand_n").to_pandas()
    # recount EVERY candidate exactly — the set is bounded by blocks × cap
    # (a post-hoc nlargest over candidate lower bounds could evict a true
    # heavy hitter whose per-block survivals were small)
    cand_ref = _ray.put(pa.array(candidates[key_col].to_numpy()))

    def recount(b: pa.Table) -> pa.Table:
        cs = _ray.get(cand_ref)
        kept = b.filter(pc.is_in(b.column(key_col), value_set=cs))
        vals, counts = np.unique(
            kept.column(key_col).to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({key_col: pa.array(vals),
                         "n": pa.array(counts, pa.int64())})

    exact = (
        map_combine_aggregate(
            ds.select_columns([key_col])
            .map_batches(recount, batch_format="pyarrow"),
            keys=[key_col], sums={"n": "n"}, count_alias="n")
        .to_pandas()
        .sort_values(["n", key_col], ascending=[False, True], kind="mergesort")
        .head(top_k)
        .reset_index(drop=True)
    )
    import ray.data as rd

    return rd.from_pandas(exact)


# ------------------------------------------- relative-error quantile sketch

def dd_quantiles(ds: Dataset, value_col: str, qs: list[float],
                 rel_err: float = 0.01) -> pd.DataFrame:
    """DDSketch-style quantiles for UNBOUNDED / continuous domains, where
    the exact histogram of :func:`exact_quantiles_by_counting` would be as
    large as the data.

    Values map to logarithmic buckets ``k = ceil(log(v) / log(gamma))``
    with ``gamma = (1 + rel_err) / (1 - rel_err)``; the sketch is the
    (sign, k) -> count histogram, whose size is bounded by the DYNAMIC
    RANGE of the data (log(vmax/vmin)/log(gamma) buckets — e.g. ~2.3k
    buckets for 10 orders of magnitude at 1% error), never by the row
    count.  Counts are integer sums, so partial merge is commutative and
    associative and the shuffled histogram — and therefore the estimate —
    is bit-identical at any parallelism.  Zeros get an exact dedicated
    bucket; negative values mirror into sign=-1 buckets.

    Guarantee: for each q, the returned estimate e satisfies
    ``|e - x_q| <= rel_err * |x_q|`` where ``x_q`` is the element of rank
    ``floor(q * (n-1))`` in sorted order (the standard DDSketch bound;
    exact for zeros).  Returns (q, est)."""
    if not 0.0 < rel_err < 1.0:
        raise ValueError("rel_err must be in (0, 1)")
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = np.log(gamma)

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if not np.isfinite(v).all():
            # np.sign(NaN).astype(int8) is an undefined cast (lands in the
            # exact-zero bucket on this platform, arbitrary on others) and
            # ceil(log(inf)) overflows the bucket index — a null/NaN/inf
            # would silently shift every quantile, so fail fast instead
            raise ValueError(
                "dd_quantiles: non-finite values (null/NaN/inf) in "
                f"'{value_col}' — filter or fill them first")
        sgn = np.sign(v).astype(np.int8)
        k = np.zeros(len(v), dtype=np.int64)
        pos, neg = v > 0, v < 0
        k[pos] = np.ceil(np.log(v[pos]) / lg).astype(np.int64)
        k[neg] = np.ceil(np.log(-v[neg]) / lg).astype(np.int64)
        df = pd.DataFrame({"sgn": sgn, "k": k})
        g = df.groupby(["sgn", "k"], sort=False).size().reset_index(name="__n")
        return pa.table({"sgn": pa.array(g["sgn"], pa.int8()),
                         "k": pa.array(g["k"], pa.int64()),
                         "__n": pa.array(g["__n"], pa.int64())})

    from .relational import map_combine_aggregate

    hist = (
        map_combine_aggregate(
            ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow"),
            keys=["sgn", "k"], sums={"__n": "n"}, count_alias="n")
        .to_pandas()
    )
    # ascending VALUE order: negatives by k desc (big magnitude first),
    # zeros, positives by k asc
    neg = hist[hist["sgn"] < 0].sort_values("k", ascending=False)
    zero = hist[hist["sgn"] == 0]
    pos = hist[hist["sgn"] > 0].sort_values("k", ascending=True)
    ordered = pd.concat([neg, zero, pos], ignore_index=True)
    counts = ordered["n"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    def bucket_estimate(row) -> float:
        if row["sgn"] == 0:
            return 0.0
        est = 2.0 * gamma ** int(row["k"]) / (gamma + 1.0)
        return est if row["sgn"] > 0 else -est

    out = []
    for q in qs:
        if n == 0:
            out.append((q, float("nan")))
            continue
        # exact integral rank: float q*(n-1) can round BELOW the exact
        # product (0.29 * 100 == 28.999999999999996) and select the
        # previous element, blowing the documented rel_err bound when
        # adjacent values differ — same Fraction discipline as
        # exact_quantiles_by_counting
        rank = int(Fraction(str(q)) * (n - 1))  # 0-based target rank
        idx = int(np.searchsorted(cum, rank + 1, side="left"))
        out.append((q, bucket_estimate(ordered.iloc[idx])))
    return pd.DataFrame(out, columns=["q", "est"])


def exact_quantiles_by_group(ds: Dataset, key_col: str, value_col: str,
                             qs: list[float]) -> Dataset:
    """Exact per-group discrete quantiles WITHOUT a global sort — the
    grouped form of :func:`exact_quantiles_by_counting`.

    Phase 1 (distributed): map-side-combined ``(key, value) -> count``
    histogram — the only shuffle moves histogram rows, bounded by
    ``groups x value-domain``, never the data stream.
    Phase 2 (distributed): ``groupby(key).map_groups`` walks each group's
    tiny histogram with the SAME exact-arithmetic rank
    (``max(1, ceil(Fraction(q) * n))``) as the global operator, so results
    match DuckDB ``quantile_disc`` bit-exactly per group.

    Output: ``(key_col, q, value)`` — one row per (group, requested q).
    Reference analogue: none (the reference computes only global length
    CDFs, pattern_filter.py:120-153); this is the grouped §2.8 extension."""
    from .relational import map_combine_aggregate

    hist = map_combine_aggregate(
        ds.select_columns([key_col, value_col]),
        keys=[key_col, value_col], count_alias="n")

    q_list = [float(q) for q in qs]

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        values = g[value_col].to_numpy()
        total = int(cum[-1])
        out_q = []
        out_v = []
        for q in q_list:
            rank = max(1, math.ceil(Fraction(str(q)) * total))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_q.append(q)
            out_v.append(values[min(idx, len(values) - 1)])
        return pd.DataFrame({key_col: [g[key_col].iloc[0]] * len(q_list),
                             "q": out_q, "value": out_v})

    def walk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one Ray dispatch per BUCKET; the per-key exact-rank walk loops
        # inside (cheap: len(qs) searchsorteds over a tiny histogram)
        return pd.concat([walk(g) for _, g in
                          df.groupby(key_col, sort=False)],
                         ignore_index=True)

    from .window import _bucketed_groups

    return _bucketed_groups(hist, key_col, walk_bucket)


# ------------------------------------------------------- Count-Min sketch

def countmin_partial(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Fold a value array into a fresh (depth, width) int64 Count-Min
    sketch.  Row hashes come from the Kirsch-Mitzenmacher construction
    ``(h1 + r * h2) mod width`` over the ONE version-stable 64-bit hash
    (:func:`_hash_u64`), so the sketch — and therefore every estimate — is
    identical across processes, runs, and library versions."""
    sk = np.zeros((depth, width), dtype=np.int64)
    if len(values) == 0:
        return sk
    h = _hash_u64(values)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    for r in range(depth):
        np.add.at(sk[r], (h1 + r * h2) % width, 1)
    return sk


def countmin_build(ds: Dataset, key_col: str, width: int = 4096,
                   depth: int = 4) -> np.ndarray:
    """Distributed Count-Min build: per-block fixed-size partial sketches,
    SUM-combined on the driver (the bloom ``build_bloom`` shape) —
    O(blocks x depth x width) int64 collected, independent of row count.
    Integer sums commute, so the merged sketch is bit-identical at any
    parallelism / block order."""

    def block_sketch(b: pa.Table) -> pa.Table:
        v = b.column(key_col).to_numpy(zero_copy_only=False)
        sk = countmin_partial(v, width, depth)
        return pa.table({"sk": pa.array([sk.reshape(-1).tobytes()],
                                        pa.binary())})

    parts = (ds.select_columns([key_col])
             .map_batches(block_sketch, batch_format="pyarrow")
             .to_pandas()["sk"])
    out = np.zeros(depth * width, dtype=np.int64)
    for blob in parts:
        out += np.frombuffer(blob, dtype=np.int64)
    return out.reshape(depth, width)


def countmin_estimate(sk: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the depth rows (the CM guarantee:
    ``exact <= est <= exact + eps*N`` w.h.p., eps = e/width)."""
    depth, width = sk.shape
    h = _hash_u64(np.asarray(keys))
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    ests = np.stack([sk[r][(h1 + r * h2) % width] for r in range(depth)])
    return ests.min(axis=0)


def countmin_freq_by_key(ds: Dataset, key_col: str, query_keys: np.ndarray,
                         width: int = 4096, depth: int = 4) -> pd.DataFrame:
    """Count-Min frequency estimates for a fixed query-key set — the
    mergeable point-frequency sketch a 100-TB stream uses where the exact
    per-key groupby (or Misra-Gries top-k) is the wrong shape: bounded
    memory (depth x width int64, ~128 KB at defaults) regardless of key
    cardinality, one pass, no shuffle at all.

    Output: ``(key, est)`` — deterministic (integer partial sums commute),
    golden-fixture gated; the over-estimate bound is pytest
    property-gated.  Reference analogue: none (the reference counts
    patterns exactly, pattern_filter.py:24-60); this is the §2.9 sketch
    family extension."""
    sk = countmin_build(ds, key_col, width, depth)
    q = np.asarray(query_keys)
    return pd.DataFrame({key_col: q,
                         "est": countmin_estimate(sk, q).astype(np.int64)})


def quantile_cont_by_group(ds: Dataset, key_col: str, value_col: str,
                           qs: list[float]) -> Dataset:
    """Exact per-group INTERPOLATED quantiles (SQL ``quantile_cont`` /
    ``percentile_cont``) — the continuous sibling of
    :func:`exact_quantiles_by_group`, same histogram-shuffle shape.

    Rank arithmetic is exact (``h = (n-1) * Fraction(q)``); the
    interpolation ``lo + (hi - lo) * frac`` is ONE float expression over
    int64 values.  For integer values below ~2^51 and dyadic q (quartiles,
    eighths), every term is exactly representable, so the double is the
    exact rational on any engine — bit-equal hashes."""
    from .relational import map_combine_aggregate

    hist = map_combine_aggregate(
        ds.select_columns([key_col, value_col]),
        keys=[key_col, value_col], count_alias="n")

    q_list = [float(q) for q in qs]

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        values = g[value_col].to_numpy()
        total = int(cum[-1])
        out_q, out_v = [], []
        for q in q_list:
            h = Fraction(str(q)) * (total - 1)          # 0-based rank
            ih = h.numerator // h.denominator
            frac = float(h - ih)
            # element at 0-based multiset position p: first idx with
            # cum > p  (cum is 1-based counts)
            lo_i = int(np.searchsorted(cum, ih, side="right"))
            hi_i = int(np.searchsorted(cum, min(ih + 1, total - 1),
                                       side="right"))
            lo = float(values[lo_i])
            hi = float(values[hi_i])
            out_q.append(q)
            out_v.append(lo + (hi - lo) * frac)
        return pd.DataFrame({key_col: [g[key_col].iloc[0]] * len(q_list),
                             "q": out_q,
                             "value": np.asarray(out_v, dtype=np.float64)})

    def walk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([walk(g) for _, g in
                          df.groupby(key_col, sort=False)],
                         ignore_index=True)

    from .window import _bucketed_groups

    return _bucketed_groups(hist, key_col, walk_bucket)
