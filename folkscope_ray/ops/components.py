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

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Min


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
    datasets report numpy dtypes)."""
    sch = ds.schema()
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
    if edges.count() == 0:
        typ = _field_type(edges, "a")
        empty = pa.table({"node": pa.array([], typ), "label": pa.array([], typ)})
        import ray.data as rd

        return rd.from_arrow(empty)

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

    def rename_old(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return pa.table({"node": pa.array([], node_t),
                             "label_old": pa.array([], node_t)})
        return pa.table({"node": b.column("node"), "label_old": b.column("label")})

    def changed(b: pa.Table) -> pa.Table:
        if "label" not in b.column_names or "label_old" not in b.column_names:
            return b.slice(0, 0)
        return b.filter(pc.not_equal(b.column("label"), b.column("label_old")))

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
        n_changed = (
            new_labels.join(
                labels.map_batches(rename_old, batch_format="pyarrow"),
                join_type="inner", num_partitions=nparts, on=("node",),
            )
            .map_batches(changed, batch_format="pyarrow")
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    return labels


def attach_components(ids: Dataset, labels: Dataset, id_col: str,
                      out_col: str = "component",
                      num_partitions: int | None = None) -> Dataset:
    """Left-join component labels onto an id Dataset; isolated ids (no edge)
    keep themselves as the component root.  Returns (id_col, out_col)."""
    nparts = num_partitions or _nparts()
    id_t = _field_type(ids, id_col)
    if labels.count() == 0:
        # no edges at all: every id is its own component, no join needed
        def identity(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b.column(id_col), out_col: b.column(id_col)})

        return ids.map_batches(identity, batch_format="pyarrow")
    labels = _drop_empty_blocks(labels.materialize()) or labels
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
