"""Distributed descriptive statistics: pairwise Pearson correlation matrix.

Single-pass, shuffle-free: every block reduces to one tiny partial row of
EXACT integer sums (n, S_i, P_ij of values quantized at ``scale``), the
driver combines partials with Python bignums, and the closed-form
correlation is evaluated once from the exact totals —

    corr(i, j) = (n*P_ij - S_i*S_j)
                 / (sqrt(n*P_ii - S_i^2) * sqrt(n*P_jj - S_j^2))

so the result is bit-deterministic at any block layout / parallelism (the
repo's fixed-point discipline: float sums are order-dependent, integer sums
commute).  The SQL oracle spells out the same formula over HUGEINT sums
with the identical float operation order, so hashes match bit-for-bit.

The reference engine has no multi-column statistics (its aggregations are
counters and score means, e.g. conceptualizer topK); this is part of the
LLM-data-pipeline analysis family next to quantiles/sketches in
``ops/sketch.py``.

Scale notes: the shuffle is O(blocks * d^2) partial strings — independent
of row count.  Per-block products are accumulated in int64 chunks sized so
``chunk * max|q_i| * max|q_j| < 2^62`` and promoted to Python ints between
chunks, so no magnitude overflows at any corpus size.  Rows with NaN are
the caller's problem (filter first); values must be exact multiples of
``1/scale`` for the quantization to be lossless (prices/quantities at
scale=100).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def corr_matrix(ds: Dataset, cols: list[str], scale: int = 100) -> pd.DataFrame:
    """Pearson correlation for every unordered column pair (col_a < col_b by
    list position).  Returns a small pandas frame (col_a, col_b, corr) —
    d*(d-1)/2 rows.  corr is None when either side has zero variance."""
    d = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        qs = [np.round(batch.column(c).to_numpy(zero_copy_only=False)
                       * scale).astype(np.int64) for c in cols]
        n = batch.num_rows
        mm = max((int(np.abs(q).max()) if n else 0) for q in qs) if d else 0
        sums = [0] * d
        prods = {(i, j): 0 for i in range(d) for j in range(i, d)}
        if mm * mm >= (1 << 62):
            # pathological magnitude: even a single per-element int64
            # product q_i*q_j can overflow (chunking bounds the SUM, not
            # the element) — promote this block to Python bignums via an
            # object-dtype pass; exactness is preserved, only speed drops,
            # and only for blocks whose |q| exceeds ~3e9 at scale
            oq = [q.astype(object) for q in qs]
            for i in range(d):
                sums[i] += int(oq[i].sum()) if n else 0
                for j in range(i, d):
                    prods[(i, j)] += int((oq[i] * oq[j]).sum()) if n else 0
        else:
            chunk = int(min(65536, max(1, (1 << 62) // (mm * mm + 1))))
            for st in range(0, n, chunk):
                en = min(st + chunk, n)
                cq = [q[st:en] for q in qs]
                for i in range(d):
                    sums[i] += int(cq[i].sum(dtype=np.int64))
                    for j in range(i, d):
                        prods[(i, j)] += int(
                            (cq[i] * cq[j]).sum(dtype=np.int64))
        out = {"n": pa.array([n], pa.int64())}
        for i in range(d):
            out[f"s{i}"] = pa.array([str(sums[i])], pa.string())
            for j in range(i, d):
                out[f"p{i}_{j}"] = pa.array([str(prods[(i, j)])], pa.string())
        return pa.table(out)

    parts = (ds.select_columns(cols)
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    n = int(parts["n"].sum()) if len(parts) else 0
    S = [sum(int(x) for x in parts[f"s{i}"]) for i in range(d)]
    P = {(i, j): sum(int(x) for x in parts[f"p{i}_{j}"])
         for i in range(d) for j in range(i, d)}

    rows_a, rows_b, rows_c = [], [], []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * P[(i, j)] - S[i] * S[j]
            den_i = n * P[(i, i)] - S[i] * S[i]
            den_j = n * P[(j, j)] - S[j] * S[j]
            c = (float(num) / (math.sqrt(float(den_i))
                               * math.sqrt(float(den_j)))
                 if den_i > 0 and den_j > 0 else None)
            rows_a.append(cols[i])
            rows_b.append(cols[j])
            rows_c.append(c)
    return pd.DataFrame({"col_a": rows_a, "col_b": rows_b,
                         "corr": pd.array(rows_c, dtype="float64")})


def zscore_outliers_by_key(ds: Dataset, key_col: str, value_col: str,
                           id_cols: list[str], scale: int = 100,
                           z_threshold: float = 3.0) -> Dataset:
    """Per-key z-score outlier scan (anomaly flagging over event streams):
    rows whose |z| >= ``z_threshold`` within their key's distribution.

    Two passes, both scale-correct: (1) exact integer moments per key
    (value quantized to ``1/scale`` units; sum / sum-of-squares / count via
    the map-side-combined groupby — only moment rows shuffle), (2) one
    stateless broadcast-moments filter scan.  The z expression is spelled
    identically here and in the SQL oracle over the SAME exact integers, so
    the quantized score (micro-z int64) hash-matches across engines.
    Keys with n < 2 or zero variance emit no rows.

    Overflow bounds (the corr_matrix discipline, ops/stats.py:40): per-row
    |q| < 2^31 is validated per batch; the caller guarantees
    sum(q^2) < 2^63 per key (raise at ~1e14 rows of |q|~5e4 — far past any
    real per-key stream; shrink ``scale`` if hit)."""
    import pyarrow.compute as pc
    import ray

    from .relational import map_combine_aggregate

    def quantized(b: pa.Table) -> pa.Table:
        q = np.round(b.column(value_col).to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        if len(q) and int(np.abs(q).max()) >= (1 << 31):
            raise ValueError("quantized |value| >= 2^31: per-row square "
                             "would overflow int64; lower `scale`")
        cols = {c: b.column(c) for c in id_cols}
        cols[key_col] = b.column(key_col)
        cols["__q"] = pa.array(q, pa.int64())
        cols["__q2"] = pa.array(q * q, pa.int64())
        return pa.table(cols)

    qds = ds.select_columns(list(dict.fromkeys(
        id_cols + [key_col, value_col]))).map_batches(
        quantized, batch_format="pyarrow")

    moments = map_combine_aggregate(
        qds.select_columns([key_col, "__q", "__q2"]),
        keys=[key_col], sums={"__q": "s1", "__q2": "s2"}, count_alias="n",
    ).to_pandas()
    moments = moments[moments["n"] > 1]
    mref = ray.put({
        k: (int(s1), int(s2), int(n))
        for k, s1, s2, n in zip(moments[key_col], moments["s1"],
                                moments["s2"], moments["n"])
    })

    def flag(b: pa.Table) -> pa.Table:
        m = ray.get(mref)
        q = b.column("__q").to_numpy(zero_copy_only=False).astype(np.float64)
        # vectorized moment lookup: factorize the key column once, gather
        # the per-DISTINCT-key moments, index — no Python per row
        codes, uniq = pd.factorize(b.column(key_col).to_pandas())
        mu = np.array([m.get(k, (0, 0, 0)) for k in uniq],
                      dtype=np.float64).reshape(-1, 3)
        s1, s2, n = mu[codes, 0], mu[codes, 1], mu[codes, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            # spelled EXACTLY like the SQL oracle: (q - s1/n) /
            # sqrt((s2 - s1*s1/n) / (n - 1))
            z = (q - s1 / n) / np.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
        zmic = np.floor(z * 1e6 + 0.5)
        ok = (n > 1) & np.isfinite(z) & (np.abs(zmic)
                                         >= z_threshold * 1e6)
        idx = pa.array(np.flatnonzero(ok), pa.int64())
        out = b.select(id_cols + [key_col]).take(idx)
        return out.append_column(
            "z_micro", pa.array(zmic[np.flatnonzero(ok)].astype(np.int64),
                                pa.int64()))

    return qds.map_batches(flag, batch_format="pyarrow")


def winsorize_by_key(ds: Dataset, key_col: str, value_col: str,
                     id_cols: list[str], q_lo: float = 0.05,
                     q_hi: float = 0.95,
                     alias: str = "clipped") -> Dataset:
    """Per-key winsorization (outlier clipping): each value clamps into its
    group's exact [quantile(q_lo), quantile(q_hi)] band — the standard
    robust-scaling scrub before training-feature export.

    Composition of verified pieces: per-group discrete quantiles from the
    histogram-shuffle operator (ops/sketch.exact_quantiles_by_group —
    DuckDB quantile_disc-exact), broadcast as a tiny per-key bound table,
    then ONE stateless clip scan (vectorized factorize lookup + clip).
    Integer values pass through exactly, so SQL hash-matches."""
    import ray

    from .sketch import exact_quantiles_by_group

    q = exact_quantiles_by_group(ds, key_col, value_col,
                                 [q_lo, q_hi]).to_pandas()
    lo = q[q["q"] == float(q_lo)].set_index(key_col)["value"]
    hi = q[q["q"] == float(q_hi)].set_index(key_col)["value"]
    bref = ray.put({k: (int(lo[k]), int(hi[k])) for k in lo.index})

    def clip(b: pa.Table) -> pa.Table:
        m = ray.get(bref)
        codes, uniq = pd.factorize(b.column(key_col).to_pandas())
        bounds = np.array([m[k] for k in uniq],
                          dtype=np.int64).reshape(-1, 2)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = np.clip(v, bounds[codes, 0], bounds[codes, 1])
        out = b.select(id_cols + [key_col])
        return out.append_column(alias, pa.array(c, pa.int64()))

    return ds.select_columns(list(dict.fromkeys(
        id_cols + [key_col, value_col]))).map_batches(
        clip, batch_format="pyarrow")


def grouped_mode(ds: Dataset, key_col: str, value_col: str,
                 mode_alias: str = "mode_value",
                 count_alias: str = "n") -> Dataset:
    """Most frequent value per key, deterministic tiebreak (smallest value
    wins) — the categorical summary statistic (imputation default / label
    consensus) SQL spells as a row_number-over-counts pick.

    Scale shape: the only shuffle moves the map-side-combined
    ``(key, value) -> count`` histogram (bounded by the distinct-pair
    domain, never the stream); the per-key argmax then rides one bucketed
    vectorized body."""
    from .relational import map_combine_aggregate
    from .window import _bucketed_groups

    hist = map_combine_aggregate(
        ds.select_columns([key_col, value_col]),
        keys=[key_col, value_col], count_alias=count_alias)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, count_alias, value_col],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby(key_col, sort=False).head(1)
        out = out.rename(columns={value_col: mode_alias})
        out[count_alias] = out[count_alias].astype("int64")
        return out

    return _bucketed_groups(hist, key_col, pick)


def mad_by_key(ds: Dataset, key_col: str, value_col: str,
               med_alias: str = "med", mad_alias: str = "mad") -> Dataset:
    """Per-key median absolute deviation over an INTEGER value column —
    the robust dispersion statistic (outlier fences that a single wild
    value cannot move, unlike the z-score's mean/std).

    Both medians use discrete-quantile semantics (exact element selection,
    DuckDB ``quantile_disc``-parity), so every output is an int64 and
    hash-matches SQL at any parallelism.

    Scale shape: two histogram-shuffle passes (each bounded by
    ``groups x value-domain``), with the tiny per-key median table
    broadcast between them — the stream itself is scanned twice, never
    shuffled."""
    import ray

    from .sketch import exact_quantiles_by_group

    med = exact_quantiles_by_group(
        ds.select_columns([key_col, value_col]),
        key_col, value_col, [0.5]).to_pandas()
    med_map = {k: int(v) for k, v in
               zip(med[key_col], med["value"])}
    bref = ray.put(med_map)

    def adev(b: pa.Table) -> pa.Table:
        m = ray.get(bref)
        codes, uniq = pd.factorize(b.column(key_col).to_pandas())
        meds = np.array([m[k] for k in uniq], dtype=np.int64)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = np.abs(v - meds[codes])
        return pa.table({key_col: b.column(key_col),
                         "__adev": pa.array(d, pa.int64())})

    devs = ds.select_columns([key_col, value_col]).map_batches(
        adev, batch_format="pyarrow")
    mad = exact_quantiles_by_group(devs, key_col, "__adev",
                                   [0.5]).to_pandas()

    out = mad[[key_col, "value"]].rename(columns={"value": mad_alias})
    out[med_alias] = out[key_col].map(med_map).astype("int64")
    out[mad_alias] = out[mad_alias].astype("int64")
    import ray.data as rd

    return rd.from_pandas(
        out[[key_col, med_alias, mad_alias]].reset_index(drop=True))


def weighted_avg_by_key(ds: Dataset, key_col: str, value_col: str,
                        weight_col: str,
                        alias: str = "wavg") -> Dataset:
    """Per-key weighted average over INTEGER value/weight columns:
    ``sum(w*v) / sum(w)`` — two order-insensitive integer sums and ONE
    IEEE division of identical operands, so doubles are bit-equal on any
    engine at any parallelism.  One map-side-combined pass; the shuffle
    moves per-key moment rows only.

    Caller guarantees ``sum(|w*v|) < 2^63`` per key (quantize coarser if
    a key's stream could exceed it; the per-row product is checked)."""
    import pyarrow.compute as pc

    from .relational import map_combine_aggregate

    def prods(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = b.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(v) and (int(np.abs(v).max()) * int(np.abs(w).max())
                       >= (1 << 63)):
            raise ValueError("per-row w*v may overflow int64; rescale")
        return pa.table({key_col: b.column(key_col),
                         "__wv": pa.array(w * v, pa.int64()),
                         "__w": pa.array(w, pa.int64())})

    m = map_combine_aggregate(
        ds.select_columns([key_col, value_col, weight_col])
        .map_batches(prods, batch_format="pyarrow"),
        keys=[key_col], sums={"__wv": "__swv", "__w": "__sw"},
        count_alias="__swv")

    def finish(b: pa.Table) -> pa.Table:
        swv = b.column("__swv").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sw = b.column("__sw").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # SQL division by zero is NULL (DuckDB sum(w*v)/sum(w) with zero
        # total weight), not NaN/inf — mask to keep the oracle bit-parity
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = swv / sw
        return pa.table({key_col: b.column(key_col),
                         alias: pa.array(avg, pa.float64(),
                                         mask=(sw == 0)),
                         "total_w": pa.array(sw, pa.int64())})

    return m.map_batches(finish, batch_format="pyarrow")


def upsert(base: Dataset, updates: Dataset, key_col: str,
           n_buckets: int | None = None) -> Dataset:
    """MERGE / upsert: every key of ``base`` with its row REPLACED by the
    ``updates`` row when one exists, plus all new keys from ``updates``
    (updates win; duplicate keys WITHIN a side resolve by the smallest
    payload under a total column sort — deterministic at any block
    layout).  Schemas must match.

    Scale shape: tag each side with an integer priority, union, and keep
    the max-priority row per key via ONE bucketed vectorized head —
    map-side pre-prune first, so the shuffle moves at most
    ``blocks x keys`` rows (the cap_per_key discipline)."""
    import pyarrow.compute as pc

    from .window import _bucketed_groups

    def tag(p: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__prio", pa.array(np.full(b.num_rows, p, dtype=np.int8)))
        return fn

    u = (base.map_batches(tag(0), batch_format="pyarrow")
         .union(updates.map_batches(tag(1), batch_format="pyarrow")))

    def total_sort(df: pd.DataFrame) -> pd.DataFrame:
        # total order (key, prio desc, every payload column asc): picks
        # among SAME-side duplicate keys deterministically regardless of
        # block arrival order
        rest = [c for c in df.columns if c not in (key_col, "__prio")]
        return df.sort_values([key_col, "__prio"] + rest,
                              ascending=[True, False] + [True] * len(rest),
                              kind="mergesort")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return (total_sort(g).groupby(key_col, sort=False).head(1)
                .drop(columns=["__prio"]))

    pruned = u.map_batches(
        lambda df: total_sort(df).groupby(key_col, sort=False).head(1),
        batch_format="pandas")
    return _bucketed_groups(pruned, key_col, pick, n_buckets=n_buckets)


def corr_by_key(ds: Dataset, key_col: str, col_a: str, col_b: str,
                scale_a: int = 100, scale_b: int = 1,
                alias: str = "corr") -> Dataset:
    """Per-key Pearson correlation of two columns — the grouped sibling of
    :func:`corr_matrix`, same fixed-point discipline: ONE map-side-combined
    pass collects exact integer moments (n, Sa, Sb, Paa, Pbb, Pab) per key,
    the keys-bounded moment table is finished driver-side with Python
    bignums, and the closed form is ONE float expression spelled
    identically in the SQL oracle — bit-equal doubles.

    Values must be exact multiples of 1/scale; per-row |q| < 2^31 is
    validated (so q*q and cross products stay in int64 per row); per-key
    integer moment sums are assumed < 2^63 (shrink scale beyond ~1e14
    rows per key).  Zero-variance keys emit NULL."""
    import ray.data as rd

    from .relational import map_combine_aggregate

    def quantized(b: pa.Table) -> pa.Table:
        qa = np.round(b.column(col_a).to_numpy(zero_copy_only=False)
                      * scale_a).astype(np.int64)
        qb = np.round(b.column(col_b).to_numpy(zero_copy_only=False)
                      * scale_b).astype(np.int64)
        for q in (qa, qb):
            if len(q) and int(np.abs(q).max()) >= (1 << 31):
                raise ValueError("quantized |value| >= 2^31; lower scale")
        return pa.table({key_col: b.column(key_col),
                         "__a": pa.array(qa, pa.int64()),
                         "__b": pa.array(qb, pa.int64()),
                         "__aa": pa.array(qa * qa, pa.int64()),
                         "__bb": pa.array(qb * qb, pa.int64()),
                         "__ab": pa.array(qa * qb, pa.int64())})

    m = map_combine_aggregate(
        ds.select_columns([key_col, col_a, col_b]).map_batches(
            quantized, batch_format="pyarrow"),
        keys=[key_col],
        sums={"__a": "sa", "__b": "sb", "__aa": "paa",
              "__bb": "pbb", "__ab": "pab"},
        count_alias="n").to_pandas()

    out_c = []
    for _, r in m.iterrows():
        n, sa, sb = int(r["n"]), int(r["sa"]), int(r["sb"])
        num = n * int(r["pab"]) - sa * sb
        den_a = n * int(r["paa"]) - sa * sa
        den_b = n * int(r["pbb"]) - sb * sb
        out_c.append(
            float(num) / (math.sqrt(float(den_a)) * math.sqrt(float(den_b)))
            if den_a > 0 and den_b > 0 else None)
    return rd.from_pandas(pd.DataFrame({
        key_col: m[key_col],
        alias: pd.array(out_c, dtype="float64")}).reset_index(drop=True))


def profile_table(ds: Dataset, cols: list[str]) -> Dataset:
    """Per-column data-quality profile over NUMERIC columns: row count,
    null count, exact distinct count, min and max (as float64) — the
    expectation/audit primitive run before a table enters a pipeline.

    Scale shape: ONE fan-out scan (row -> one (col, value) pair per
    profiled column) feeds a map-side-combined stats aggregate and a
    two-phase exact-distinct count; both shuffles move histogram rows
    bounded by columns x value-domain, never the stream."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import map_combine_aggregate

    names = list(cols)

    def fan(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cs, vs = [], []
        for c in names:
            cs.append(np.full(n, c, dtype=object))
            vs.append(b.column(c).cast(pa.float64()))
        nulls = pa.chunked_array(
            [ch for ca in vs for ch in ca.chunks])
        return pa.table({
            "col": pa.array(np.concatenate(cs), pa.string()),
            "v": nulls,
            "__isnull": pc.cast(pc.is_null(nulls), pa.int64())})

    fanned = ds.select_columns(names).map_batches(
        fan, batch_format="pyarrow")

    stats = map_combine_aggregate(
        fanned, keys=["col"], sums={"__isnull": "n_null"},
        mins={"v": "min_v"}, maxs={"v": "max_v"},
        count_alias="n").to_pandas()

    distinct = map_combine_aggregate(
        fanned.map_batches(
            lambda b: b.filter(pc.is_valid(b.column("v")))
            .select(["col", "v"]), batch_format="pyarrow"),
        keys=["col", "v"], count_alias="__c")
    nd = map_combine_aggregate(
        distinct.select_columns(["col"]), keys=["col"],
        count_alias="n_distinct").to_pandas()

    # LEFT merge: an entirely-null column has stats rows but zero distinct
    # rows (the distinct stream filters nulls) — an inner merge would drop
    # exactly the column a data-quality profile most needs to flag
    out = stats.merge(nd, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    out = out[["col", "n", "n_null", "n_distinct", "min_v", "max_v"]]
    for c in ("n", "n_null", "n_distinct"):
        out[c] = out[c].astype("int64")
    for c in ("min_v", "max_v"):
        out[c] = out[c].astype("float64")
    return rd.from_pandas(out.sort_values("col").reset_index(drop=True))


CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: keeps the sum in int64


def table_checksum(ds: Dataset, cols: list[str], sep: str = "|") -> Dataset:
    """Order-insensitive table content checksum: per row, the first 7
    bytes of ``md5(col1|col2|...)`` as an integer; integer-summed modulo
    a Mersenne prime.  Addition commutes, so the checksum is identical at
    any row order, block layout or parallelism — the O(1)-output snapshot
    equality probe for resumable pipelines (compare a rebuilt partition
    against its manifest without sorting either side).

    Columns are stringified with Arrow casts (int -> "123"), matching SQL
    ``col::VARCHAR``; stick to integer/string columns for cross-engine
    parity (float formatting differs by engine).  Returns ONE row
    ``(n, checksum)``.  Scale shape: per-block partial (python-int exact,
    shipped as a string), tiny driver combine."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .split import _md5_digests

    def part(b: pa.Table) -> pa.Table:
        arrs = [b.column(c).cast(pa.string()) for c in cols]
        joined = pc.binary_join_element_wise(
            *arrs, pa.scalar(sep, pa.string()))
        if isinstance(joined, pa.Array):
            joined = pa.chunked_array([joined])
        dig = _md5_digests(joined)
        v = dig[:, :7].astype(np.uint64)
        weights = (np.uint64(256) ** np.arange(6, -1, -1, dtype=np.uint64))
        row_vals = (v * weights[None, :]).sum(axis=1, dtype=np.uint64)
        # astype(object) -> Python ints: the block sum is exact at any
        # block size (row values are 56-bit; a uint64 sum would wrap past
        # ~128 rows)
        total = int(row_vals.astype(object).sum()) if len(row_vals) else 0
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "s": pa.array([str(total)], pa.string())})

    parts = ds.select_columns(cols).map_batches(
        part, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    total = sum(int(x) for x in parts["s"]) % CHECKSUM_MOD
    return rd.from_pandas(pd.DataFrame(
        {"n": np.array([n], dtype=np.int64),
         "checksum": np.array([total], dtype=np.int64)}))


def impute_group_mean(ds: Dataset, key_col: str, value_col: str,
                      scale: int = 100,
                      alias: str | None = None) -> Dataset:
    """Null imputation with the per-key mean — the classic ML-prep fill,
    exact across engines: the mean is computed from EXACT integer moments
    (sum of ``round(v*scale)`` over non-null rows as int64, count of
    non-null rows) and finished with ONE IEEE division of identical
    operands (``float(s) / float(c*scale)``), so the filled doubles are
    bit-equal to SQL's ``CAST(s AS DOUBLE)/CAST(c*scale AS DOUBLE)`` at any
    parallelism.  Non-null values pass through untouched; a key with NO
    non-null values stays null (matches ``COALESCE(v, AVG(v) OVER ...)``).

    Shape: one map-side-combined moments pass (shuffle moves per-key moment
    rows only), then one join back — which rides ``hash_join``'s data-tied
    broadcast escape when the key domain is small, and its partitioned path
    beyond it.  Values must be exact multiples of ``1/scale`` for lossless
    quantization (prices at scale=100)."""
    import pyarrow.compute as pc

    from .relational import hash_join, map_combine_aggregate

    alias = alias or value_col + "_filled"

    def widen(b: pa.Table) -> pa.Table:
        # a block whose value column is ALL null infers Arrow type `null`,
        # which join kernels reject — pin the column to float64 everywhere
        i = b.column_names.index(value_col)
        return b.set_column(i, value_col,
                            pc.cast(b.column(value_col), pa.float64()))

    ds = ds.map_batches(widen, batch_format="pyarrow")

    def moments(b: pa.Table) -> pa.Table:
        v = b.column(value_col)
        q = pc.fill_null(
            pc.cast(pc.round(pc.multiply(v, float(scale))), pa.int64()), 0)
        nn = pc.cast(pc.is_valid(v), pa.int64())
        return pa.table({key_col: b.column(key_col), "__q": q, "__c": nn})

    m = map_combine_aggregate(
        ds.select_columns([key_col, value_col])
        .map_batches(moments, batch_format="pyarrow"),
        keys=[key_col], sums={"__q": "__s", "__c": "__c"},
        count_alias="__rows")

    def mean(b: pa.Table) -> pa.Table:
        s = b.column("__s").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("__c").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mu = s.astype(np.float64) / (c * scale).astype(np.float64)
        return pa.table({key_col: b.column(key_col),
                         "__mu": pa.array(mu, pa.float64(),
                                          mask=(c == 0))})

    means = m.map_batches(mean, batch_format="pyarrow")
    j = hash_join(ds, means, on=key_col)

    def fill(b: pa.Table) -> pa.Table:
        out = b.append_column(
            alias, pc.coalesce(b.column(value_col), b.column("__mu")))
        return out.drop_columns(["__mu"])

    return j.map_batches(fill, batch_format="pyarrow")


def regr_slope_by_key(ds: Dataset, key_col: str, x_col: str, y_col: str,
                      scale_x: int = 1, scale_y: int = 100,
                      slope_alias: str = "slope",
                      icept_alias: str = "icept") -> Dataset:
    """Per-key simple OLS regression (slope + intercept) — the grouped
    trend-line operator, same fixed-point discipline as :func:`corr_by_key`:
    ONE map-side-combined pass collects exact integer moments (n, Sx, Sy,
    Pxx, Pxy) per key, the keys-bounded moment table is finished
    driver-side with Python bignums, and the closed forms

        slope = (n·Pxy − Sx·Sy) / (n·Pxx − Sx²)       (× scale ratio)
        icept = (Sy − slope·Sx·r) / (n · scale_y)      spelled identically

    are each ONE float expression mirrored in the SQL oracle — bit-equal
    doubles at any parallelism.  Zero-x-variance keys emit NULL for both."""
    import ray.data as rd

    from .relational import map_combine_aggregate

    def quantized(b: pa.Table) -> pa.Table:
        qx = np.round(b.column(x_col).to_numpy(zero_copy_only=False)
                      * scale_x).astype(np.int64)
        qy = np.round(b.column(y_col).to_numpy(zero_copy_only=False)
                      * scale_y).astype(np.int64)
        for q in (qx, qy):
            if len(q) and int(np.abs(q).max()) >= (1 << 31):
                raise ValueError("quantized |value| >= 2^31; lower scale")
        return pa.table({key_col: b.column(key_col),
                         "__x": pa.array(qx, pa.int64()),
                         "__y": pa.array(qy, pa.int64()),
                         "__xx": pa.array(qx * qx, pa.int64()),
                         "__xy": pa.array(qx * qy, pa.int64())})

    m = map_combine_aggregate(
        ds.select_columns([key_col, x_col, y_col]).map_batches(
            quantized, batch_format="pyarrow"),
        keys=[key_col],
        sums={"__x": "sx", "__y": "sy", "__xx": "pxx", "__xy": "pxy"},
        count_alias="n").to_pandas()

    slopes, icepts = [], []
    for _, r in m.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["pxy"]) - sx * sy
        den = n * int(r["pxx"]) - sx * sx
        if den <= 0:
            slopes.append(None); icepts.append(None)
            continue
        # slope in ORIGINAL units: (num/den) · (scale_x/scale_y); icept =
        # mean_y − slope·mean_x, both as single float expressions
        s = (float(num) / float(den)) * (float(scale_x) / float(scale_y))
        slopes.append(s)
        icepts.append(float(sy) / float(n * scale_y)
                      - s * (float(sx) / float(n * scale_x)))
    return rd.from_pandas(pd.DataFrame({
        key_col: m[key_col],
        slope_alias: pd.array(slopes, dtype="float64"),
        icept_alias: pd.array(icepts, dtype="float64"),
    }).reset_index(drop=True))


def minmax_normalize(ds: Dataset, key_col: str, value_col: str,
                     alias: str | None = None) -> Dataset:
    """Per-key min-max feature scaling: ``(v − min) / (max − min)`` within
    each key, the classic 0-1 normalization before training.  Exact
    cross-engine: min/max are exact comparisons over the SAME input
    doubles, and the subtract/divide chain is spelled identically in the
    SQL oracle — IEEE ops over identical operands are bit-equal.  Keys
    with zero range (min == max) emit NULL, matching SQL's NULLIF guard.

    Shape: one map-side-combined min/max pass (per-key extrema rows
    shuffle, never values), join-back rides ``hash_join``'s data-tied
    broadcast escape, then one stateless Arrow fill scan."""
    import pyarrow.compute as pc

    from .relational import hash_join, map_combine_aggregate

    alias = alias or value_col + "_norm"
    m = map_combine_aggregate(
        ds.select_columns([key_col, value_col]),
        keys=[key_col], mins={value_col: "__lo"},
        maxs={value_col: "__hi"}, count_alias="__n")
    j = hash_join(ds, m.drop_columns(["__n"]), on=key_col)

    def norm(b: pa.Table) -> pa.Table:
        v = b.column(value_col)
        lo, hi = b.column("__lo"), b.column("__hi")
        # cast AFTER the exact subtract for float inputs (bit-identical to
        # SQL's v - MIN); for int inputs the cast is lossless either way
        num = pc.cast(pc.subtract(v, lo), pa.float64())
        rng = pc.cast(pc.subtract(hi, lo), pa.float64())
        out = pc.if_else(pc.equal(rng, pa.scalar(0.0, pa.float64())),
                         pa.scalar(None, pa.float64()),
                         pc.divide(num, rng))
        return b.append_column(alias, out).drop_columns(["__lo", "__hi"])

    return j.map_batches(norm, batch_format="pyarrow")


def mutual_information(ds: Dataset, x_col: str, y_col: str,
                       mi_alias: str = "mi_ub") -> pd.DataFrame:
    """Mutual information between two CATEGORICAL columns, the
    feature-selection screen (which metadata field predicts which other):
    ``MI = sum_xy p(x,y) * log2(p(x,y) / (p(x) p(y)))``.

    Hash-exactness discipline (the entropy_docs convention): every
    per-cell term is computed in float64 from EXACT integer counts and
    quantized to integer microbits (``floor(term * 1e6 + 0.5)``) BEFORE
    summing, so the result is identical at any parallelism and equal to
    the SQL oracle bit-for-bit.  Returned per x-category (one row per x:
    ``(x, n_x, mi_ub)`` — the sum over its cells), so the driver compare
    has real rows to hash.

    Scale shape: ONE map-side-combined count aggregate on (x, y); the
    cell table is bounded by |X| x |Y| (a categorical-domain product,
    never row count) — the marginals and terms are driver math on that
    bounded table, the sketch-family contract."""
    from .relational import map_combine_aggregate

    cells = map_combine_aggregate(
        ds.select_columns([x_col, y_col]),
        keys=[x_col, y_col], count_alias="c",
    ).to_pandas()
    if not len(cells):
        return pd.DataFrame({x_col: [], "n_x": pd.array([], dtype="int64"),
                             mi_alias: pd.array([], dtype="int64")})
    n = float(cells["c"].sum())
    cx = cells.groupby(x_col)["c"].transform("sum").to_numpy().astype(
        np.float64)
    cy = cells.groupby(y_col)["c"].transform("sum").to_numpy().astype(
        np.float64)
    c = cells["c"].to_numpy().astype(np.float64)
    term = (c / n) * np.log2((c * n) / (cx * cy))
    cells["__ub"] = np.floor(term * 1e6 + 0.5).astype(np.int64)
    out = (cells.groupby(x_col, sort=True)
           .agg(n_x=("c", "sum"), **{mi_alias: ("__ub", "sum")})
           .reset_index())
    out["n_x"] = out["n_x"].astype(np.int64)
    return out


def ks_statistic(ds: Dataset, group_col: str, int_value_col: str,
                 group_a, group_b) -> pd.DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two groups — the drift / batch-effect detector a
    data pipeline runs between sources, snapshots, or A/B arms.

    ``D = max_v |F_a(v) - F_b(v)|`` is computed EXACTLY as the integer
    ``max |cum_a * n_b - cum_b * n_a|`` over the merged value grid (no
    float CDFs), then one final float division — identical in SQL via
    window cumsums.  Scale shape: one map-side-combined (value -> count
    per group) histogram; the walk runs on the domain-bounded histogram,
    never the rows."""
    import pyarrow.compute as pc

    from .relational import map_combine_aggregate

    def tag(b: pa.Table) -> pa.Table:
        g = b.column(group_col)
        a = pc.cast(pc.equal(g, pa.scalar(group_a)), pa.int64())
        bb = pc.cast(pc.equal(g, pa.scalar(group_b)), pa.int64())
        keep = pc.or_(pc.equal(g, pa.scalar(group_a)),
                      pc.equal(g, pa.scalar(group_b)))
        return pa.table({
            "v": b.column(int_value_col), "g1": a, "g2": bb,
        }).filter(keep)

    hist = map_combine_aggregate(
        ds.select_columns([group_col, int_value_col])
        .map_batches(tag, batch_format="pyarrow"),
        keys=["v"], sums={"g1": "c1", "g2": "c2"},
    ).to_pandas()
    if not len(hist):
        # neither group present (mistyped label / empty stream)
        return pd.DataFrame({"n1": pd.array([0], dtype="int64"),
                             "n2": pd.array([0], dtype="int64"),
                             "d_num": pd.array([0], dtype="int64"),
                             "ks": [0.0]})
    hist = hist.sort_values("v").reset_index(drop=True)
    f1 = hist["c1"].cumsum().to_numpy().astype(np.int64)
    f2 = hist["c2"].cumsum().to_numpy().astype(np.int64)
    n1, n2 = int(f1[-1]), int(f2[-1])
    # every |f1*n2 - f2*n1| term is bounded by n1*n2 (f1 <= n1, f2 <= n2),
    # so this pre-check proves the numpy int64 products below cannot wrap
    # (the gini_coefficient post-hoc-bound discipline)
    if n1 * n2 >= 2 ** 63:
        raise ValueError(
            "ks_statistic: n1 * n2 >= 2^63 — the integer D numerator "
            "would overflow int64; subsample either group")
    d_num = int(np.abs(f1 * n2 - f2 * n1).max())
    return pd.DataFrame({
        "n1": pd.array([n1], dtype="int64"),
        "n2": pd.array([n2], dtype="int64"),
        "d_num": pd.array([d_num], dtype="int64"),
        "ks": [d_num / (n1 * n2)] if n1 and n2 else [0.0],
    })


def cohens_kappa(ds: Dataset, a_col: str, b_col: str) -> pd.DataFrame:
    """Cohen's kappa between two binary labelers (0/1 int columns) — the
    inter-annotator / heuristic-vs-heuristic agreement score an eval
    pipeline reports before trusting auto-labels.

    ``kappa = (po - pe) / (1 - pe)`` with po, pe computed from the EXACT
    2x2 contingency counts (one map-side-combined aggregate; the cell
    table is 4 rows) — the float expression tree mirrors the SQL oracle
    term for term.  Returns one row: the 4 cells, n, and kappa."""
    from .relational import map_combine_aggregate

    cells = map_combine_aggregate(
        ds.select_columns([a_col, b_col]),
        keys=[a_col, b_col], count_alias="c",
    ).to_pandas()
    n = int(cells["c"].sum()) if len(cells) else 0
    if n == 0:
        return pd.DataFrame({c: pd.array([0], dtype="int64")
                             for c in ("n", "n00", "n01", "n10", "n11")}
                            ).assign(kappa=[0.0])

    def cell(a, b):
        m = cells[(cells[a_col] == a) & (cells[b_col] == b)]
        return int(m["c"].iloc[0]) if len(m) else 0

    n00, n01 = cell(0, 0), cell(0, 1)
    n10, n11 = cell(1, 0), cell(1, 1)
    po = (n00 + n11) / n
    pe = ((n00 + n01) * (n00 + n10)
          + (n10 + n11) * (n01 + n11)) / (n * n)
    kappa = (po - pe) / (1 - pe) if pe != 1 else 1.0
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "n00": pd.array([n00], dtype="int64"),
        "n01": pd.array([n01], dtype="int64"),
        "n10": pd.array([n10], dtype="int64"),
        "n11": pd.array([n11], dtype="int64"),
        "kappa": [kappa],
    })


def quantile_normalize(ds: Dataset, key_col: str, value_col: str,
                       id_col: str,
                       alias: str = "norm_v") -> Dataset:
    """Quantile normalization across slices: each row's value is replaced
    by the GLOBAL value at the same within-slice percentile — the
    batch-effect correction that makes per-source scores comparable
    before cross-source filtering/mixing (the genomics-standard transform
    applied to corpus quality signals).

    Mapping contract (integer-exact on both engines): within-slice rank
    ``r_s`` of ``n_s`` maps to global rank
    ``floor((r_s - 1) / (n_s - 1) * (N - 1) + 0.5) + 1`` (a slice with a
    single row maps to global rank 1); ranks are ROW_NUMBER over the
    total order (value, id), so ties never depend on block layout.

    Plan: per-slice ranks via one bucketed shuffle; global ranks via
    :func:`~folkscope_ray.ops.relational.global_row_number` (sort +
    per-block offset metadata); the mapping is a stateless scan; the
    final lookup is ONE partitioned hash join on the computed global
    rank (broadcast escape under the gate)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    from .relational import global_row_number, hash_join
    from .window import row_number

    cols = [id_col, key_col, value_col]
    ranked = row_number(ds.select_columns(cols), key_col,
                        [value_col, id_col], alias="__rs")
    counts = (ds.groupby(key_col).aggregate(Count(alias_name="__ns"))
              .to_pandas())
    total = int(counts["__ns"].sum())
    ns = dict(zip(counts[key_col], counts["__ns"].astype(int)))

    import ray as _ray
    nref = _ray.put(ns)

    def gidx(b: pa.Table) -> pa.Table:
        m = _ray.get(nref)
        keys = b.column(key_col).to_pandas()
        nsv = keys.map(m).to_numpy().astype(np.float64)
        rs = b.column("__rs").to_numpy(zero_copy_only=False).astype(
            np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            idx = np.floor((rs - 1) / (nsv - 1) * (total - 1) + 0.5) + 1
        idx = np.where(nsv == 1, 1, idx).astype(np.int64)
        return b.append_column("__gidx", pa.array(idx, pa.int64()))

    mapped = ranked.map_batches(gidx, batch_format="pyarrow")

    g = global_row_number(
        ds.select_columns([value_col, id_col]),
        order_cols=[value_col, id_col], alias="__gidx")

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"__gidx": b.column("__gidx"),
                         alias: b.column(value_col)})

    lookup = g.map_batches(slim, batch_format="pyarrow")
    joined = hash_join(mapped, lookup, on="__gidx")
    return joined.select_columns([id_col, key_col, value_col, alias])


def chi2_independence(ds: Dataset, x_col: str, y_col: str,
                      chi2_alias: str = "chi2_micro") -> pd.DataFrame:
    """Pearson chi-square independence statistic between two CATEGORICAL
    columns — mutual_information's frequentist sibling (drift tests,
    feature screens): ``chi2 = sum_cells (observed - expected)^2 /
    expected`` with ``expected = row_total * col_total / n``.

    Same exactness discipline as :func:`mutual_information`: every
    per-cell term is float64 over EXACT integer counts, quantized to
    integer micro-units before summing; the cell table is bounded by the
    categorical domain product.  Returns one row per x-category
    ``(x, n_x, chi2_micro)`` — sum the column for the full statistic."""
    from .relational import map_combine_aggregate

    cells = map_combine_aggregate(
        ds.select_columns([x_col, y_col]),
        keys=[x_col, y_col], count_alias="c",
    ).to_pandas()
    if not len(cells):
        return pd.DataFrame({x_col: [], "n_x": pd.array([], dtype="int64"),
                             chi2_alias: pd.array([], dtype="int64")})
    # chi-square needs the FULL grid: an unobserved (x, y) cell still
    # contributes (0 - e)^2 / e = e (unlike MI, where 0*log0 = 0 makes
    # omitting empty cells correct) — complete the domain product with
    # zero counts before computing terms
    grid = pd.MultiIndex.from_product(
        [np.sort(cells[x_col].unique()), np.sort(cells[y_col].unique())],
        names=[x_col, y_col])
    cells = (cells.set_index([x_col, y_col])
             .reindex(grid, fill_value=0).reset_index())
    n = float(cells["c"].sum())
    cx = cells.groupby(x_col)["c"].transform("sum").to_numpy().astype(
        np.float64)
    cy = cells.groupby(y_col)["c"].transform("sum").to_numpy().astype(
        np.float64)
    o = cells["c"].to_numpy().astype(np.float64)
    e = cx * cy / n
    term = (o - e) * (o - e) / e
    cells["__t"] = np.floor(term * 1e6 + 0.5).astype(np.int64)
    out = (cells.groupby(x_col, sort=True)
           .agg(n_x=("c", "sum"), **{chi2_alias: ("__t", "sum")})
           .reset_index())
    out["n_x"] = out["n_x"].astype(np.int64)
    return out


def gini_coefficient(ds: Dataset, key_col: str, int_value_col: str,
                     alias: str = "gini") -> pd.DataFrame:
    """Gini concentration coefficient over per-key totals (how
    concentrated is spend / traffic / token mass across customers,
    sources, domains) — the inequality number on every curation
    dashboard.

    ``G = (2 * sum_i i * x_(i)) / (n * sum x) - (n + 1) / n`` over the
    ascending-sorted totals, all from EXACT integer sums: one map-side-
    combined per-key aggregate, global ranks from
    :func:`~folkscope_ray.ops.relational.global_row_number` (total order
    (total, key)), one map-combined sum of ``rank * total``, then a
    single float expression mirrored in SQL.  Returns one row
    ``(n_keys, sum_v, weighted_rank_sum, gini)``."""
    from ray.data.aggregate import Sum

    from .relational import global_row_number, map_combine_aggregate

    per_key = map_combine_aggregate(
        ds.select_columns([key_col, int_value_col]),
        keys=[key_col], sums={int_value_col: "__v"})
    ranked = global_row_number(per_key.select_columns([key_col, "__v"]),
                               order_cols=["__v", key_col], alias="__r")

    def prod(b: pa.Table) -> pa.Table:
        v = b.column("__v").to_numpy(zero_copy_only=False)
        r = b.column("__r").to_numpy(zero_copy_only=False)
        return pa.table({"rv": pa.array(r * v, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "one": pa.array(np.ones(len(v), np.int64),
                                         pa.int64())})

    tot = (ranked.map_batches(prod, batch_format="pyarrow")
           .aggregate(Sum("rv", alias_name="rv"), Sum("v", alias_name="v"),
                      Sum("one", alias_name="n")))
    if tot is None or tot.get("n") is None:
        return pd.DataFrame({"n_keys": pd.array([0], dtype="int64"),
                             "sum_v": pd.array([0], dtype="int64"),
                             "weighted_rank_sum": pd.array([0],
                                                           dtype="int64"),
                             alias: [0.0]})
    n, sv, rv = int(tot["n"]), int(tot["v"]), int(tot["rv"])
    # rv <= n * sv, so this post-hoc bound proves no int64 wrap occurred
    # in the distributed rank*v sums (n and sv themselves are exact)
    if n * sv >= 2 ** 63:
        raise ValueError(
            "gini_coefficient: n_keys * sum_v >= 2^63 — the rank-weighted "
            "sum may have overflowed int64; rescale the value column")
    gini = (2 * rv) / (n * sv) - (n + 1) / n if n and sv else 0.0
    return pd.DataFrame({
        "n_keys": pd.array([n], dtype="int64"),
        "sum_v": pd.array([sv], dtype="int64"),
        "weighted_rank_sum": pd.array([rv], dtype="int64"),
        alias: [gini],
    })


def population_stability(ref: Dataset, cur: Dataset, int_value_col: str,
                         n_bins: int = 10,
                         term_alias: str = "psi_micro") -> pd.DataFrame:
    """Population Stability Index between a reference and a current
    period — the standard ML-monitoring drift score: bin the reference
    into ``n_bins`` quantile buckets, then
    ``PSI = sum_b (p_b - q_b) * ln(p_b / q_b)``.

    Exactness: bucket edges are the reference's exact discrete quantiles;
    a row's bucket is the INTEGER count of edges strictly below its value
    (identical on both engines, ties included); bucket shares use +1
    Laplace smoothing (``(c + 1) / (n + n_bins)``) so empty buckets are
    well-defined without epsilon hacks; every per-bucket term is
    quantized to integer micro-units before summing.  Returns one row per
    bucket ``(bucket, ref_n, cur_n, psi_micro)`` — sum the column for the
    full index.

    Scale shape: one domain-bounded histogram pass for the edges
    (``exact_quantiles_by_counting``), then ONE stateless bucket scan
    over both periods with map-combined (bucket, period) counts — the
    shuffle moves n_bins rows per block."""
    import ray

    from .relational import map_combine_aggregate
    from .sketch import exact_quantiles_by_counting

    qs = [i / n_bins for i in range(1, n_bins)]
    edges = np.sort(exact_quantiles_by_counting(
        ref, int_value_col, qs)["value"].to_numpy().astype(np.int64))
    eref = ray.put(edges)

    def bucketize(r_flag: int):
        def fn(b: pa.Table) -> pa.Table:
            e = ray.get(eref)
            v = b.column(int_value_col).to_numpy(zero_copy_only=False)
            bk = np.searchsorted(e, v, side="left").astype(np.int64)
            n = len(v)
            return pa.table({
                "bucket": pa.array(bk, pa.int64()),
                "__r": pa.array(np.full(n, r_flag, np.int64), pa.int64()),
                "__c": pa.array(np.full(n, 1 - r_flag, np.int64),
                                pa.int64()),
            })
        return fn

    both = (ref.select_columns([int_value_col])
            .map_batches(bucketize(1), batch_format="pyarrow")
            .union(cur.select_columns([int_value_col])
                   .map_batches(bucketize(0), batch_format="pyarrow")))
    counts = map_combine_aggregate(
        both, keys=["bucket"], sums={"__r": "ref_n", "__c": "cur_n"},
    ).to_pandas().set_index("bucket")
    counts = counts.reindex(range(n_bins), fill_value=0)
    rc = counts["ref_n"].to_numpy().astype(np.int64)
    cc = counts["cur_n"].to_numpy().astype(np.int64)
    rn, cn = int(rc.sum()), int(cc.sum())
    p = (rc + 1) / (rn + n_bins)
    q = (cc + 1) / (cn + n_bins)
    term = (p - q) * np.log(p / q)
    out = pd.DataFrame({
        "bucket": pd.array(range(n_bins), dtype="int64"),
        "ref_n": pd.array(rc, dtype="int64"),
        "cur_n": pd.array(cc, dtype="int64"),
        term_alias: pd.array(
            np.floor(term * 1e6 + 0.5).astype(np.int64), dtype="int64"),
    })
    return out


def fleiss_kappa_binary(ds: Dataset, rater_cols: list[str],
                        alias: str = "kappa") -> pd.DataFrame:
    """Fleiss' kappa for n binary raters (0/1 int columns) — the
    multi-rater generalization of :func:`cohens_kappa`, the agreement gate
    when SEVERAL heuristic labelers vote on the same rows.

    With r raters and per-item positive count k:
    ``P_i = (k^2 + (r-k)^2 - r) / (r(r-1))``, ``p1 = sum k / (rN)``,
    ``Pe = p0^2 + p1^2``, ``kappa = (Pbar - Pe) / (1 - Pe)`` — all from
    THREE exact integer totals (N, sum k, sum of squared cell counts),
    gathered by one stateless scan + a narrow combine; the float closed
    form is mirrored term-for-term in SQL."""
    from .relational import map_combine_aggregate

    r = len(rater_cols)
    if r < 2:
        raise ValueError("fleiss_kappa_binary needs >= 2 rater columns")

    def per_item(b: pa.Table) -> pa.Table:
        k = np.zeros(b.num_rows, dtype=np.int64)
        for c in rater_cols:
            k += b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = k * k + (r - k) * (r - k)
        one = np.ones(b.num_rows, np.int64)
        return pa.table({"__g": pa.array(one, pa.int64()),
                         "k": pa.array(k, pa.int64()),
                         "s2": pa.array(s2, pa.int64()),
                         "one": pa.array(one, pa.int64())})

    tot = map_combine_aggregate(
        ds.select_columns(rater_cols).map_batches(
            per_item, batch_format="pyarrow"),
        keys=["__g"], sums={"k": "sk", "s2": "ss2", "one": "n"},
    ).to_pandas()
    if not len(tot):
        return pd.DataFrame({"n_items": pd.array([0], dtype="int64"),
                             "sum_pos": pd.array([0], dtype="int64"),
                             "sum_sq": pd.array([0], dtype="int64"),
                             alias: [0.0]})
    n = int(tot["n"].iloc[0])
    sk = int(tot["sk"].iloc[0])
    ss2 = int(tot["ss2"].iloc[0])
    pbar = (ss2 - r * n) / (r * (r - 1) * n)
    p1 = sk / (r * n)
    pe = (1 - p1) * (1 - p1) + p1 * p1
    kappa = (pbar - pe) / (1 - pe) if pe != 1 else 1.0
    return pd.DataFrame({
        "n_items": pd.array([n], dtype="int64"),
        "sum_pos": pd.array([sk], dtype="int64"),
        "sum_sq": pd.array([ss2], dtype="int64"),
        alias: [kappa],
    })
