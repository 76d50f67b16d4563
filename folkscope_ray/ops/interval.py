"""Distributed interval-overlap join.

Inner join of two interval tables on an equality key PLUS time-range
overlap (``l.start <= r.end AND r.start <= l.end``, bounds inclusive) — the
temporal-join shape Ray Data has no native operator for (sessions × orders,
promotions × shipments).  The reference engine has no temporal joins at all
(its joins are exact-key only, e.g. conceptualizer.py instance joins); this
is part of the §2.10 streaming/temporal extension family next to
``asof_join`` / ``session_windows``.

The distributed plan is grid partitioning (the standard spatial-join
decomposition applied to 1-D time):

1. Each row replicates to every grid cell its interval covers
   (``floor(start/cell) .. floor(end/cell)`` — vectorized ``np.repeat``,
   one flat_map-shaped ``map_batches`` per side).
2. Both sides shuffle ONCE on hash(key, cell) — co-location by
   construction, the same bucket discipline as ``hash_join``/``asof_join``.
3. Per bucket: pandas merge on (key, cell), vectorized overlap filter, and
   the **ownership rule** — a pair is emitted only by the cell containing
   ``max(l.start, r.start)`` — so duplicates never exist and no global
   dedup shuffle is needed.

Cost scales with sum(interval_span / cell) replicas + true result size.
``cell`` trades replication (small cell → many copies of long intervals)
against bucket fan-in (big cell → more candidate pairs per cell); the
data-tied default is span/1024.  Hot (key, cell) pairs land in one bucket —
the documented hash_join caveat; widen ``n_buckets`` or shrink ``cell``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

_GOLD = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as int64


def _as_int64(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp, date, or integer column -> int64 numpy.

    Timestamps AND dates normalize to MICROSECONDS so a date side joined
    against a timestamp side compares in one unit (a bare int64 cast of
    date32 would yield days and silently return wrong/empty results).
    Anything else (floats, strings, ...) raises instead of silently
    casting — the grid arithmetic is integer-only by contract."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif pa.types.is_date(t):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif pa.types.is_integer(t):
        if not pa.types.is_int64(t):
            col = col.cast(pa.int64())
    else:
        raise TypeError(
            f"interval_join supports timestamp/date/integer columns, got {t}")
    return col.to_numpy(zero_copy_only=False)


def _int_dtype_map(schema: pa.Schema) -> dict[str, str]:
    return {n: "int64" for n, t in zip(schema.names, schema.types)
            if pa.types.is_integer(t)}


def _make_replicate(side: str, s_col: str, e_col: str, on: str,
                    cell: int, salt: int, n_buckets: int):
    """Grid-replication batch fn for one side (module-level so the salt
    spread is directly testable on the production code path)."""
    def fn(batch: pa.Table) -> pa.Table:
        s = _as_int64(batch.column(s_col))
        e = _as_int64(batch.column(e_col))
        c0 = s // cell
        # inverted intervals (end < start) never replicate — without the
        # explicit mask a same-cell inverted row would still emit one
        # replica and its fate would depend on the cell size
        nrep = np.where(e < s, 0, e // cell - c0 + 1)
        if side == "R" and salt > 1:
            nrep = nrep * salt  # every cell replica copied to all shards
        idx = np.repeat(np.arange(batch.num_rows), nrep)
        local = (np.arange(int(nrep.sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(nrep) - nrep, nrep))
        if side == "R" and salt > 1:
            cells = local // salt + c0[idx]
            t = local % salt
        else:
            cells = local + c0[idx]
            if salt > 1:
                # deterministic left shard: hash of the row's own interval,
                # so identical logical rows land identically at any layout.
                # splitmix-style finalizer, sharded by HIGH bits — a bare
                # ``((s*GOLD) ^ e) % salt`` keyed on the LOW bits, which for
                # correlated intervals (e = s + const) visit only half the
                # shards (pinned by the spread test)
                u = ((s[idx].astype(np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15))
                     ^ e[idx].astype(np.uint64))
                u = u * np.uint64(0xBF58476D1CE4E5B9)
                t = ((u >> np.uint64(33))
                     % np.uint64(salt)).astype(np.int64)
            else:
                t = np.zeros(len(idx), dtype=np.int64)
        out = batch.take(pa.array(idx, pa.int64()))
        # carry the int64 interval for the merge/overlap math
        out = out.append_column("__s", pa.array(s[idx], pa.int64()))
        out = out.append_column("__e", pa.array(e[idx], pa.int64()))
        out = out.append_column("__c", pa.array(cells, pa.int64()))
        out = out.append_column("__t", pa.array(
            np.asarray(t, dtype=np.int64), pa.int64()))
        key = pd.util.hash_array(
            out.column(on).to_pandas().to_numpy()).view(np.int64)
        b = ((key ^ (cells * _GOLD) ^ ((np.asarray(t) + 1) * _GOLD))
             % n_buckets + n_buckets) % n_buckets
        out = out.append_column("__b", pa.array(b.astype(np.int32),
                                                pa.int32()))
        return out.append_column(
            "__side", pa.array([side] * out.num_rows, pa.string()))
    return fn


def interval_join(left: Dataset, right: Dataset, on: str,
                  left_start: str, left_end: str,
                  right_start: str, right_end: str,
                  cell: int | None = None,
                  n_buckets: int | None = None,
                  suffix: str = "_r",
                  salt: int = 1) -> Dataset:
    """All (left, right) pairs with equal ``on`` and overlapping intervals.

    ``left_start``/``left_end`` (and the right pair) are timestamp or
    integer columns; a point table passes the same column for both.  Output
    carries every left column plus every right column except ``on`` (equal
    by construction), right-side collisions renamed with ``suffix``.
    Timestamp columns ship as int64 microseconds (the grid arithmetic
    domain); cast back in the caller if wall-clock types are needed.

    ``salt``: sub-cell skew shards for hot (key, cell) pairs.  With
    ``salt=1`` (default) each (key, cell) lands in exactly one bucket — a
    key+cell holding 50% of both sides straggles in one task.  With
    ``salt=S`` every LEFT replica is deterministically sharded into one of
    S sub-buckets (hash of its interval) and every RIGHT replica is copied
    to all S, so the hot bucket's work spreads S ways at the cost of S x
    right-side replication; pairs still meet exactly once (the merge keys
    on the shard too).  Output is salt-invariant (pytest-pinned)."""
    salt = max(1, int(salt))
    if n_buckets is None:
        try:
            n_buckets = max(4, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_buckets = 16

    if cell is None:
        # data-tied default: big enough that a typical interval covers ~2
        # cells (replication stays O(1) per row), small enough that a cell
        # holds a bounded slice of the span.  ONE fused partial pass per
        # side (min/max/mean as separate Dataset aggregates would each
        # re-execute the upstream pipeline).
        los, his, mlens = [], [], []
        for ds_, s, e in ((left, left_start, left_end),
                          (right, right_start, right_end)):
            def stats(batch: pa.Table, s=s, e=e) -> pa.Table:
                sv = _as_int64(batch.column(s))
                ev = _as_int64(batch.column(e))
                if not len(sv):
                    return pa.table({"lo": pa.array([], pa.int64()),
                                     "hi": pa.array([], pa.int64()),
                                     "dsum": pa.array([], pa.int64()),
                                     "n": pa.array([], pa.int64())})
                return pa.table({
                    "lo": pa.array([int(sv.min())], pa.int64()),
                    "hi": pa.array([int(ev.max())], pa.int64()),
                    "dsum": pa.array([int((ev - sv).sum())], pa.int64()),
                    "n": pa.array([len(sv)], pa.int64())})
            p = (ds_.select_columns(list(dict.fromkeys((s, e))))
                 .map_batches(stats, batch_format="pyarrow").to_pandas())
            if len(p) and p["n"].sum() > 0:
                los.append(int(p["lo"].min()))
                his.append(int(p["hi"].max()))
                mlens.append(int(p["dsum"].sum() // p["n"].sum()))
        span = (max(his) - min(los)) if los else 0
        cell = max(1, span // 4096,
                   min(2 * max(mlens, default=0), span // 16))
    cell = int(cell)

    lnames = list(left.schema().names)
    rnames = [c for c in right.schema().names if c != on]
    ren = {c: (c + suffix if c in lnames else c) for c in rnames}
    out_int = {**_int_dtype_map(left.schema()),
               **{ren[c]: "int64"
                  for c, t in zip(right.schema().names, right.schema().types)
                  if c != on and pa.types.is_integer(t)}}
    # interval columns are normalized to int64 us by prep_times below
    out_int.update({left_start: "int64", left_end: "int64"})
    out_int.update({ren.get(c, c): "int64"
                    for c in (right_start, right_end) if c != on})

    def replicate(side: str, s_col: str, e_col: str):
        return _make_replicate(side, s_col, e_col, on, cell, salt, n_buckets)

    def prep_times(s_col: str, e_col: str):
        """Normalize the interval columns themselves to int64 so both sides
        and the output are timestamp-free."""
        def fn(batch: pa.Table) -> pa.Table:
            for c in dict.fromkeys((s_col, e_col)):
                i = batch.schema.get_field_index(c)
                batch = batch.set_column(
                    i, c, pa.array(_as_int64(batch.column(c)), pa.int64()))
            return batch
        return fn

    lb = (left.map_batches(prep_times(left_start, left_end),
                           batch_format="pyarrow")
          .map_batches(replicate("L", left_start, left_end),
                       batch_format="pyarrow"))
    rb = (right.map_batches(prep_times(right_start, right_end),
                            batch_format="pyarrow")
          .map_batches(replicate("R", right_start, right_end),
                       batch_format="pyarrow"))
    both = lb.union(rb)

    out_cols = lnames + [ren[c] for c in rnames]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # when one side replicated to zero rows everywhere (e.g. every
        # interval inverted), the union's observed schema can omit that
        # side's columns entirely — restore them so the empty join below
        # still carries the full output schema
        for c in dict.fromkeys([*lnames, on, *rnames, "__s", "__e", "__c",
                                "__t"]):
            if c not in g.columns:
                g[c] = pd.Series(np.nan, index=g.index)
        # the union null-fills the other side's columns, promoting int64 to
        # float64 — restore recorded int dtypes after splitting the sides
        lg = g.loc[g["__side"] == "L", [*lnames, "__s", "__e", "__c", "__t"]]
        rg = g.loc[g["__side"] == "R",
                   [on, *rnames, "__s", "__e", "__c", "__t"]]
        # _restore_dtypes discipline: only cast back columns with no
        # genuine nulls — a nullable-int payload column would otherwise
        # raise IntCastingNaNError on the astype
        lg = lg.astype({c: dt for c, dt in out_int.items()
                        if c in lnames and not lg[c].isna().any()})
        rg = rg.rename(columns=ren)
        rg = rg.astype({ren[c]: out_int[ren[c]] for c in rnames
                        if ren[c] in out_int
                        and not rg[ren[c]].isna().any()})
        # the shard key joins too: a left row (one shard) meets each right
        # row exactly once even though right replicas exist in every shard
        m = lg.merge(rg, on=[on, "__c", "__t"], suffixes=("", "__rr"))
        ls = m["__s"].to_numpy()
        le = m["__e"].to_numpy()
        rs = m["__s__rr"].to_numpy()
        re_ = m["__e__rr"].to_numpy()
        cc = m["__c"].to_numpy()
        keep = (ls <= re_) & (rs <= le)
        keep &= np.maximum(ls, rs) // cell == cc  # ownership: emit once
        return m.loc[keep, out_cols]

    return both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")
