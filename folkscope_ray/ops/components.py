"""Distributed connected components over an edge Dataset.

Iterative min-label propagation — the web-scale replacement for driver-side
union-find in minhash-LSH dedup (ops/dedup.py) and entity canonicalization
(stages/canonicalize.py).  Nothing is ever materialized on the driver: edges
live in the object store, labels are a Dataset, each round is

    msgs       = edges_sym ⨝ labels on src  -> (node=dst, label)
    new_labels = (labels ∪ msgs).groupby(node).min(label)

which converges to label(n) = min(component(n)) in O(component diameter)
rounds (LSH band graphs are unions of per-bucket stars, so diameters are
small).  Each round's result is ``materialize()``d — an iterative algorithm
must pin its frontier or every round re-executes the whole lineage chain.

Works for any orderable node type (int64 doc ids, string surface norms).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Min

# Below this many edges the component labeling runs as one driver union-find
# pass over the (bounded) edge list instead of iterative distributed rounds —
# the same explicit small-side ceiling as canonicalize.DRIVER_BANDING_MAX.
# Labels are identical on both paths (min member of the component), which
# test_cc_driver_and_distributed_paths_agree pins.
CC_DRIVER_EDGE_MAX = int(os.environ.get("FOLKSCOPE_CC_DRIVER_MAX", "2000000"))


def _drop_empty_blocks(ds: Dataset) -> Dataset | None:
    """Rebuild a MATERIALIZED dataset from its non-empty blocks (zero-copy —
    block refs are reused).  Ray's hash-shuffle aggregate can emit zero-row
    blocks with an EMPTY schema; map_batches skips zero-row blocks (so schema
    guards never run) and such a block on either side of a later
    ``Dataset.join`` crashes Acero with "No match for FieldRef".  Returns None
    when every block is empty."""
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def _field_type(ds: Dataset, col: str) -> pa.DataType:
    """Arrow type of a column regardless of block format (pandas-backed
    datasets report numpy dtypes).  A fully-empty dataset can have NO
    schema (zero blocks after a map over zero rows) — fall back to string
    so the documented empty-result contract holds instead of crashing."""
    sch = ds.schema()
    if sch is None:
        return pa.string()
    t = dict(zip(sch.names, sch.types))[col]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def _nparts() -> int:
    # join aggregators carry per-partition state; partitions beyond ~cpus/4
    # cost more than they parallelize at the label-table sizes involved
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    except Exception:
        return 4


def _driver_union_find(edges: Dataset) -> Dataset:
    """Bounded-size exact path: edge list -> (node, min-of-component) via one
    driver union-find sweep.  Only the edges (already counted <= the cap)
    reach the driver; output covers exactly the nodes incident to an edge,
    matching the distributed propagation's contract bit-for-bit."""
    import ray.data as rd

    parent: dict = {}

    def find(x):
        p = parent.setdefault(x, x)
        while p != parent[p]:
            p = parent[p]
        while parent[x] != p:  # path compress
            parent[x], x = p, parent[x]
        return p

    for blk in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(blk.column("a").to_pylist(), blk.column("b").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    nodes = sorted(parent)
    labels = [find(n) for n in nodes]
    typ = _field_type(edges, "a")
    return rd.from_arrow(pa.table({"node": pa.array(nodes, typ),
                                   "label": pa.array(labels, typ)}))


def _labels_signature(labels: Dataset) -> int:
    """Order/partition-independent signature of the (node, label) multiset:
    XOR of mixed per-row 64-bit hashes, combined from one tiny partial per
    block.  Labels only ever decrease under min-propagation, so an unchanged
    signature == convergence (up to a 2^-64 collision)."""
    import pandas as pd

    def part(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names or b.num_rows == 0:
            return pa.table({"sig": pa.array([0], pa.uint64())})
        hn = pd.util.hash_array(b.column("node").to_pandas().to_numpy())
        hl = pd.util.hash_array(b.column("label").to_pandas().to_numpy())
        mix = (hn * np.uint64(0x9E3779B97F4A7C15)) ^ hl
        return pa.table({"sig": pa.array([int(np.bitwise_xor.reduce(mix))], pa.uint64())})

    sig = 0
    for blk in labels.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for v in blk.column("sig").to_pylist():
            sig ^= v
    return sig


def connected_components(edges: Dataset, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 25,
                         num_partitions: int | None = None) -> Dataset:
    """Edge Dataset -> (node, label) Dataset; label = min member of the node's
    component.  Covers every node incident to an edge; isolated nodes are
    absent (their label is themselves — callers coalesce on a left join).

    Returns an EMPTY (node, label) Dataset when there are no edges.
    """
    nparts = num_partitions or _nparts()

    def to_ab(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column(a_col), "b": b.column(b_col)})

    edges = edges.map_batches(to_ab, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        typ = _field_type(edges, "a")
        empty = pa.table({"node": pa.array([], typ), "label": pa.array([], typ)})
        import ray.data as rd

        return rd.from_arrow(empty)
    if n_edges <= CC_DRIVER_EDGE_MAX:
        return _driver_union_find(edges)

    def symmetrize(b: pa.Table) -> pa.Table:
        src = pa.concat_arrays([b.column("a").combine_chunks(),
                                b.column("b").combine_chunks()])
        dst = pa.concat_arrays([b.column("b").combine_chunks(),
                                b.column("a").combine_chunks()])
        return pa.table({"src": src, "dst": dst})

    edges_sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    node_t = _field_type(edges_sym, "src")
    _empty = pa.table({"node": pa.array([], node_t), "label": pa.array([], node_t)})

    # Every map below guards against column-less empty blocks: Ray's hash
    # shuffle join/aggregate can emit empty RefBundles with an EMPTY schema,
    # and such a block on the right side of a later join crashes Acero
    # ("no match for FieldRef") — normalize them to the (node, label) schema.

    def seed(b: pa.Table) -> pa.Table:
        if "src" not in b.column_names:
            return _empty
        lab = pc.min_element_wise(b.column("src"), b.column("dst"))
        return pa.table({"node": b.column("src"), "label": lab})

    def ensure_nodelab(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return _empty
        return b.select(["node", "label"])

    labels = (
        edges_sym.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(ensure_nodelab, batch_format="pyarrow")
        .materialize()
    )
    labels = _drop_empty_blocks(labels) or labels

    def msg(b: pa.Table) -> pa.Table:
        if "dst" not in b.column_names:
            return _empty
        return pa.table({"node": b.column("dst"), "label": b.column("label")})

    # convergence = unchanged multiset signature (labels are monotone
    # non-increasing, so equality <=> no label moved) — one tiny per-block
    # partial instead of a second distributed join per round
    sig = _labels_signature(labels)
    converged = False
    for _ in range(max_iters):
        joined = edges_sym.join(
            labels, join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("node",),
        )
        msgs = joined.map_batches(msg, batch_format="pyarrow")
        new_labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(ensure_nodelab, batch_format="pyarrow")
            .materialize()
        )
        new_labels = _drop_empty_blocks(new_labels) or new_labels
        labels = new_labels
        new_sig = _labels_signature(labels)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # label propagation needs O(component diameter) rounds; returning
        # unconverged labels would silently split components (duplicates
        # survive dedup, canonical entities fragment) — fail loudly instead
        raise RuntimeError(
            f"connected_components: labels still moving after {max_iters} "
            "iterations (component diameter exceeds max_iters) — rerun "
            "with a larger max_iters")
    return labels


def attach_components(ids: Dataset, labels: Dataset, id_col: str,
                      out_col: str = "component",
                      num_partitions: int | None = None) -> Dataset:
    """Left-join component labels onto an id Dataset; isolated ids (no edge)
    keep themselves as the component root.  Returns (id_col, out_col).

    The label table is bounded by nodes-incident-to-an-edge, which in dedup
    workloads is a small fraction of the corpus — under the
    ``FOLKSCOPE_CC_ATTACH_BROADCAST_MAX`` gate it broadcasts once and the
    join is map-only (no shuffle, no Join-operator fixed cost: measured
    2.3 s -> ~0.3 s on the sf0.1 minhash query at 32 cpus); beyond the gate
    the native hash-partitioned left join runs instead."""
    nparts = num_partitions or _nparts()
    id_t = _field_type(ids, id_col)
    labels = labels.materialize()
    n_labels = labels.count()
    if n_labels == 0:
        # no edges at all: every id is its own component, no join needed
        def identity(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b.column(id_col), out_col: b.column(id_col)})

        return ids.map_batches(identity, batch_format="pyarrow")
    labels = _drop_empty_blocks(labels) or labels
    gate = int(os.environ.get("FOLKSCOPE_CC_ATTACH_BROADCAST_MAX", 2_000_000))
    if gate and n_labels <= gate:
        from .relational import broadcast_join

        lab_tbl = pa.concat_tables(
            ray.get(list(labels.to_arrow_refs())), promote_options="default")
        lab_tbl = lab_tbl.rename_columns(
            [id_col if c == "node" else c for c in lab_tbl.column_names])
        joined = broadcast_join(ids, lab_tbl, on=id_col, how="left")
    else:
        joined = ids.join(
            labels, join_type="left_outer", num_partitions=nparts,
            on=(id_col,), right_on=("node",),
        )

    def coalesce(b: pa.Table) -> pa.Table:
        if id_col not in b.column_names:  # empty-schema shuffle block
            return pa.table({id_col: pa.array([], id_t),
                             out_col: pa.array([], id_t)})
        lab = b.column("label") if "label" in b.column_names else None
        ids_arr = b.column(id_col)
        if lab is None:
            comp = ids_arr
        else:
            comp = pc.if_else(pc.is_valid(lab), lab, pc.cast(ids_arr, lab.type))
        return pa.table({id_col: ids_arr, out_col: comp})

    return joined.map_batches(coalesce, batch_format="pyarrow")
