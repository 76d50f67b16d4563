"""Prefix-filtered set-similarity self-join (PPJoin-lite).

All pairs of documents whose token-set Jaccard similarity meets a threshold
— the exact-similarity complement to the probabilistic minhash-LSH family in
``ops/dedup.py`` (reference's dedup is exact-hash only, generation.py:227-229;
this is the standard scale-out upgrade from the set-similarity-join
literature: Chaudhuri et al. SSJoin 2006, Xiao et al. PPJoin 2008).

The naive plan (explode tokens, self-join on token, group by pair) moves
O(sum df^2) rows through the shuffle — stopword-grade terms alone make that
quadratic in the corpus.  Prefix filtering bounds it:

1. **Token-set projection** (one scan): per document, the distinct-token set
   (lowercase ``[a-z0-9]+`` — byte-identical to the inverted-index/oracle
   tokenization), its size ``dlen``, and the space-joined set as one string
   column.  Everything downstream reads this slim projection, never the raw
   text.
2. **Document frequencies**: (term, df) via map-side-combined counting (the
   vocabulary-sized shuffle class, same as tfidf).
3. **Prefix selection**: order every document's tokens by the global
   (df asc, term asc) order — rarest first — and keep only the first
   ``dlen - ceil(t * dlen) + 1`` tokens.  The prefix-filtering lemma
   guarantees any pair with J >= t shares at least one *prefix* token, and
   frequency ordering makes prefix tokens the rare ones, so the candidate
   join stays near-linear.  The (term -> df) map is broadcast when the
   vocabulary fits the ``FOLKSCOPE_SETJOIN_BROADCAST_MAX`` gate (selection
   happens map-side, no extra shuffle); beyond it the distributed path
   explodes (doc, term) rows, hash-joins df on, and regroups by doc hash —
   both paths pytest-gated bit-equal.
4. **Candidate generation**: prefix rows shuffle on hash(term) % B (bucketed,
   never raw-term groups), per-bucket vectorized self-merge produces ordered
   pairs (a < b), length-filtered by ``min_len >= t * max_len`` (a J >= t
   necessary condition), then deduplicated globally by (a, b) map-combine.
5. **Verification**: candidates join back to the token-set projection (the
   projection is pre-filtered to candidate doc ids when the id set fits the
   gate) and each surviving pair's exact intersection is counted.  Per-pair
   set intersection is the standard PPJoin verify step — it runs on the
   post-filter residue, not the corpus.

All similarity math is integer (ppm): a pair passes iff
``i * 1e6 >= t_ppm * (la + lb - i)`` and ships ``jaccard_ppm =
i * 1e6 // union`` — hash-exact against the SQL oracle at any parallelism.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

TERM_RE = re.compile(r"[a-z0-9]+")
PPM = 1_000_000

# per-worker-process cache for broadcast-state task closures
_WORKER_CACHE: dict[str, object] = {}


def _n_buckets() -> int:
    try:
        return max(4, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 16


def tokenset_table(ds: Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> Dataset:
    """Slim projection (id, dlen, toks): distinct tokens per doc, sorted
    lexicographically, space-joined.  One scan of the raw text; every later
    stage reads this instead."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        toks, lens = [], []
        for t in texts:
            s = sorted(set(TERM_RE.findall(t.lower())))
            toks.append(" ".join(s))
            lens.append(len(s))
        return pa.table({
            id_col: batch.column(id_col),
            "dlen": pa.array(lens, pa.int64()),
            "toks": pa.array(toks, pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _explode(docsets: Dataset, id_col: str) -> Dataset:
    """(term, id, dlen) rows from the token-set projection — vectorized
    Arrow split/flatten, no per-token Python."""
    def fn(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern(batch.column("toks"), " ")
        n = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(tok_lists)
        ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), n)
        dls = np.repeat(batch.column("dlen").to_numpy(zero_copy_only=False), n)
        out = pa.table({
            "term": flat,
            id_col: pa.array(ids, pa.int64()),
            "dlen": pa.array(dls, pa.int64()),
        })
        # empty docs split to one "" token — drop them
        return out.filter(pc.not_equal(out.column("term"), ""))

    return docsets.map_batches(fn, batch_format="pyarrow")


def _prefix_len(dlen: np.ndarray, t_ppm: int) -> np.ndarray:
    """dlen - ceil(t * dlen) + 1, all-integer."""
    ceil_t = (t_ppm * dlen + (PPM - 1)) // PPM
    return dlen - ceil_t + 1


def _prefix_rows_broadcast(docsets: Dataset, df_sorted: pa.Table,
                           id_col: str, t_ppm: int) -> Dataset:
    """Map-side prefix selection: the (term -> df) vocabulary rides along as
    one broadcast Arrow table (term-sorted; lookups are searchsorted)."""
    ref = ray.put((df_sorted.column("term").to_numpy(zero_copy_only=False),
                   df_sorted.column("df").to_numpy(zero_copy_only=False)))

    def fn(batch: pa.Table) -> pa.Table:
        key = "sj" + ref.hex()
        state = _WORKER_CACHE.get(key)
        if state is None:
            state = ray.get(ref)
            _WORKER_CACHE[key] = state
        terms_sorted, dfs_sorted = state

        tok_lists = pc.split_pattern(batch.column("toks"), " ")
        n = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(tok_lists).to_numpy(zero_copy_only=False)
        ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), n)
        dls = np.repeat(batch.column("dlen").to_numpy(zero_copy_only=False), n)
        keep_tok = flat != ""
        flat, ids, dls = flat[keep_tok], ids[keep_tok], dls[keep_tok]
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "dlen": pa.array([], pa.int64())})
        dfs = dfs_sorted[np.searchsorted(terms_sorted, flat)]
        # global (df, term) order within each doc; docs are contiguous after
        # the primary sort key, so cumcount = arange - first_row_of_doc
        order = np.lexsort((flat, dfs, ids))
        ids_s, flat_s, dls_s = ids[order], flat[order], dls[order]
        first = np.zeros(len(ids_s), dtype=bool)
        first[0] = True
        first[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(ids_s)))
        cum = np.arange(len(ids_s)) - np.repeat(starts, counts)
        keep = cum < _prefix_len(dls_s, t_ppm)
        return pa.table({"term": pa.array(flat_s[keep], pa.string()),
                         id_col: pa.array(ids_s[keep], pa.int64()),
                         "dlen": pa.array(dls_s[keep], pa.int64())})

    return docsets.map_batches(fn, batch_format="pyarrow")


def _prefix_rows_distributed(docsets: Dataset, df_tbl: Dataset,
                             id_col: str, t_ppm: int) -> Dataset:
    """Beyond-broadcast path: explode, hash-join df on, regroup by doc hash,
    per-bucket vectorized prefix selection."""
    from .relational import hash_join

    nb = _n_buckets()
    joined = hash_join(_explode(docsets, id_col), df_tbl, on="term")

    def bucketize(batch: pa.Table) -> pa.Table:
        b = (pd.util.hash_array(
            batch.column(id_col).to_numpy(zero_copy_only=False))
            % nb).astype(np.int32)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def select_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "term"], kind="mergesort")
        cum = g.groupby(id_col, sort=False).cumcount().to_numpy()
        keep = cum < _prefix_len(g["dlen"].to_numpy(), t_ppm)
        out = g.loc[keep, ["term", id_col, "dlen"]]
        return out.astype({id_col: "int64", "dlen": "int64"})

    return (joined.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__b").map_groups(select_bucket, batch_format="pandas"))


def jaccard_selfjoin(ds: Dataset, threshold_ppm: int = 900_000,
                     text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """All unordered pairs (doc_a < doc_b) with token-set Jaccard >= threshold.

    Returns (doc_a, doc_b, jaccard_ppm) — jaccard_ppm is the exact integer
    ``|a&b| * 1e6 // |a|b|``, so output hashes match the SQL oracle bit-for-
    bit at any parallelism."""
    from .relational import map_combine_aggregate

    t_ppm = int(threshold_ppm)
    nb = _n_buckets()
    docsets = tokenset_table(ds, text_col, id_col).materialize()

    df_tbl = map_combine_aggregate(
        _explode(docsets, id_col), keys=["term"], count_alias="df")

    gate = int(os.environ.get("FOLKSCOPE_SETJOIN_BROADCAST_MAX", 4_000_000))
    df_tbl = df_tbl.materialize()
    if gate and df_tbl.count() <= gate:
        vocab = pa.concat_tables(
            ray.get(list(df_tbl.to_arrow_refs())), promote_options="default")
        vocab = vocab.sort_by("term")
        prefix = _prefix_rows_broadcast(docsets, vocab, id_col, t_ppm)
    else:
        prefix = _prefix_rows_distributed(docsets, df_tbl, id_col, t_ppm)

    # ---- candidate pairs: bucket prefix rows on hash(term), self-merge ----
    def term_bucket(batch: pa.Table) -> pa.Table:
        b = (pd.util.hash_array(
            batch.column("term").to_pandas().to_numpy(dtype=object))
            % nb).astype(np.int32)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "la": pd.Series([], dtype="int64"),
                              "lb": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        m = g[["term", id_col, "dlen"]].merge(
            g[["term", id_col, "dlen"]], on="term", suffixes=("_x", "_y"))
        ax, bx = m[id_col + "_x"].to_numpy(), m[id_col + "_y"].to_numpy()
        la, lb = m["dlen_x"].to_numpy(), m["dlen_y"].to_numpy()
        keep = ax < bx
        # J >= t requires min_len >= t * max_len
        keep &= np.minimum(la, lb) * PPM >= t_ppm * np.maximum(la, lb)
        if not keep.any():
            return empty
        out = pd.DataFrame({"doc_a": ax[keep], "doc_b": bx[keep],
                            "la": la[keep], "lb": lb[keep]})
        return out.drop_duplicates(["doc_a", "doc_b"]).astype("int64")

    cand = (prefix.map_batches(term_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(pairs_bucket, batch_format="pandas"))
    # global pair dedup; count suppressed via the alias-collision rule
    cand = map_combine_aggregate(
        cand, keys=["doc_a", "doc_b"],
        mins={"la": "la", "lb": "lb"}, count_alias="la").materialize()

    # ---- verification: join token sets back, exact intersection ----------
    from .relational import hash_join

    vgate = int(os.environ.get("FOLKSCOPE_SETJOIN_VERIFY_MAX", 4_000_000))
    sets = docsets.select_columns([id_col, "toks"])
    if vgate and cand.count() <= vgate:
        # prune the projection to candidate docs before the joins
        ids = pa.concat_tables(
            ray.get(list(cand.select_columns(["doc_a", "doc_b"])
                         .to_arrow_refs())), promote_options="default")
        id_set = pc.unique(pa.chunked_array(
            [ids.column("doc_a").combine_chunks(),
             ids.column("doc_b").combine_chunks()]))
        idref = ray.put(id_set)

        def keep_cand_docs(batch: pa.Table) -> pa.Table:
            key = "sjid" + idref.hex()
            vals = _WORKER_CACHE.get(key)
            if vals is None:
                vals = ray.get(idref)
                _WORKER_CACHE[key] = vals
            return batch.filter(pc.is_in(batch.column(id_col), value_set=vals))

        sets = sets.map_batches(keep_cand_docs, batch_format="pyarrow")

    def rename(frm: str, to: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [to.get(n, n) for n in batch.column_names])
        return fn

    j1 = hash_join(
        cand.map_batches(rename("c", {"doc_a": id_col}), batch_format="pyarrow"),
        sets, on=id_col)
    j1 = j1.map_batches(rename("j", {id_col: "doc_a", "toks": "toks_a",
                                     "doc_b": id_col}), batch_format="pyarrow")
    j2 = hash_join(j1, sets, on=id_col)
    j2 = j2.map_batches(rename("j2", {id_col: "doc_b", "toks": "toks_b"}),
                        batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        la = batch.column("la").to_numpy(zero_copy_only=False)
        lb = batch.column("lb").to_numpy(zero_copy_only=False)
        ta = batch.column("toks_a").to_pylist()
        tb = batch.column("toks_b").to_pylist()
        inter = np.fromiter(
            (len(set(x.split(" ")) & set(y.split(" ")))
             for x, y in zip(ta, tb)),
            dtype=np.int64, count=len(ta))
        union = la + lb - inter
        keep = inter * PPM >= t_ppm * union
        jppm = np.zeros(len(da), dtype=np.int64)
        nz = union > 0
        jppm[nz] = inter[nz] * PPM // union[nz]
        return pa.table({"doc_a": pa.array(da[keep], pa.int64()),
                         "doc_b": pa.array(db[keep], pa.int64()),
                         "jaccard_ppm": pa.array(jppm[keep], pa.int64())})

    return j2.map_batches(verify, batch_format="pyarrow")
