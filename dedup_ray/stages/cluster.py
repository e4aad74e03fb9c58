"""A10 — connected-components clustering of verified duplicate pairs.

The reference processes pairs independently (no clustering); the north rule
requires cluster ids.  Cluster id := min uid of the component.

Two execution paths (SURVEY.md §7.3):
  * driver union-find when the edge count is small (exact, one pass) —
    path-compressed weighted union-find over uint64 node ids;
  * distributed min-label propagation to fixpoint for large edge sets —
    alternating groupby(node).min(neighbor_label) rounds (bounded by
    component diameter; cf. BTS, ICDE'24, PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min

from ..config import DedupConfig


def _driver_union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: larger root points at smaller root
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def _uf_arrays(ua: np.ndarray, ub: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorised driver components: (nodes, cluster_id) with cluster_id =
    min uid of the component — identical semantics to
    :func:`_driver_union_find` (whose smaller-root union also converges to
    the component min), but numpy min-label propagation + pointer doubling
    instead of a per-edge Python dict loop (measured 16.3 s -> <1 s at ~1M
    edges on the 1M-doc corpus)."""
    nodes, inv = np.unique(np.concatenate([ua, ub]), return_inverse=True)
    a, b = inv[: len(ua)], inv[len(ua) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[a], label[b])
        np.minimum.at(label, a, m)
        np.minimum.at(label, b, m)
        # pointer doubling: jump each node to its label's label (twice)
        label = label[label[label]]
        if np.array_equal(label, before):
            break
    return nodes, nodes[label]


def components_from_sources(
    sources: list[tuple[Dataset, str, str]],
    cfg: DedupConfig,
    driver_edge_limit: int = 2_000_000,
) -> Dataset:
    """Connected components over edges drawn from MATERIALISED datasets.

    ``sources``: (dataset, col_a, col_b) triples — e.g. the verified-pair and
    exact-edge tables.  Edge projection runs as raw tasks over the block refs
    (no Dataset executions); under ``driver_edge_limit`` total edges the exact
    driver union-find runs, else distributed min-label propagation.
    """
    import ray

    from ..util import ds_from_refs, map_blocks

    outs = []
    for ds, ca, cb in sources:
        mat = ds.materialize()

        def proj(b: pa.Table, ca=ca, cb=cb):
            t = pa.table({"ua": b.column(ca), "ub": b.column(cb)})
            return t, t.num_rows

        outs += map_blocks(proj, mat, num_returns=2)
    counts = ray.get([o[1] for o in outs]) if outs else []
    total = int(sum(counts))
    refs = [o[0] for o, c in zip(outs, counts) if c]
    if total == 0:
        return ds_from_refs([], count=0, uid=pa.int64(), cluster_id=pa.int64())
    if total <= driver_edge_limit:
        tables = ray.get(refs)
        ua = np.concatenate(
            [t.column("ua").to_numpy(zero_copy_only=False) for t in tables]
        )
        ub = np.concatenate(
            [t.column("ub").to_numpy(zero_copy_only=False) for t in tables]
        )
        uids, cids = _uf_arrays(ua.astype(np.int64), ub.astype(np.int64))
        t = pa.table(
            {
                "uid": pa.array(uids, type=pa.int64()),
                "cluster_id": pa.array(cids, type=pa.int64()),
            }
        )
        return ds_from_refs([ray.put(t)], count=t.num_rows, uid=pa.int64(), cluster_id=pa.int64())
    edges = ds_from_refs(refs, count=total, ua=pa.int64(), ub=pa.int64())
    return _label_propagation(edges, cfg)


def connected_components(
    edges: Dataset, cfg: DedupConfig, driver_edge_limit: int = 2_000_000
) -> Dataset:
    """edges (ua:uint64, ub:uint64) -> (uid, cluster_id) for every node in an edge."""
    n_edges = edges.count()
    if n_edges == 0:
        return edges.map_batches(
            lambda b: pa.table(
                {
                    "uid": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    if n_edges <= driver_edge_limit:
        df = edges.select_columns(["ua", "ub"]).to_pandas()
        uids, cids = _uf_arrays(
            df["ua"].to_numpy(dtype=np.int64), df["ub"].to_numpy(dtype=np.int64)
        )
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "uid": pa.array(uids, type=pa.int64()),
                    "cluster_id": pa.array(cids, type=pa.int64()),
                }
            )
        )
    return _label_propagation(edges, cfg)


def _label_propagation(edges: Dataset, cfg: DedupConfig, max_iters: int = 30) -> Dataset:
    """Distributed min-label propagation over the undirected edge set.

    Each round does one neighbour-min propagation plus one pointer-doubling
    shortcut (label[u] <- label[label[u]]), so convergence is O(log diameter)
    rounds rather than O(diameter) — long near-dup chains (paginated content)
    converge within max_iters.  If the fixpoint is still not reached, a loud
    error is raised rather than silently splitting components.
    """
    import ray.data as rd

    both = edges.select_columns(["ua", "ub"]).union(
        edges.select_columns(["ub", "ua"]).rename_columns(["ua", "ub"])
    )  # directed both ways: (src=ua, dst=ub)
    both = both.materialize()
    labels = both.groupby("ua").aggregate(Min("ub", alias_name="nbr_min"))

    def init_label(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "uid": batch.column("ua"),
                "label": pc.min_element_wise(batch.column("ua"), batch.column("nbr_min")),
            }
        )

    labels = labels.map_batches(init_label, batch_format="pyarrow").materialize()
    n_changed = 0
    for _ in range(max_iters):
        # propagate: each node sends its label to neighbors; take min
        msgs = both.join(
            labels.rename_columns({"uid": "ua"}),
            "inner",
            num_partitions=cfg.join_partitions(),
            on=("ua",),
        ).select_columns(["ub", "label"])
        new_min = msgs.groupby("ub").aggregate(Min("label", alias_name="nbr_label"))
        merged = labels.join(
            new_min.rename_columns({"ub": "uid"}),
            "left_outer",
            num_partitions=cfg.join_partitions(),
            on=("uid",),
        )

        def update(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            nbr = pc.fill_null(batch.column("nbr_label"), np.iinfo(np.int64).max)
            new = pc.min_element_wise(batch.column("label"), nbr)
            changed = pc.less(new, batch.column("label"))
            return pa.table(
                {"uid": batch.column("uid"), "label": new, "changed": changed}
            )

        updated = merged.map_batches(update, batch_format="pyarrow").materialize()
        n_changed = updated.filter(lambda r: r["changed"]).count()
        labels = updated.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            break
        # pointer doubling: label[u] <- label[label[u]] — jumps each node to
        # its label's own label, halving chain length every round
        hop = labels.join(
            labels.rename_columns({"uid": "label", "label": "label2"}),
            "left_outer",
            num_partitions=cfg.join_partitions(),
            on=("label",),
        )

        def shortcut(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            l2 = pc.fill_null(batch.column("label2"), np.iinfo(np.int64).max)
            return pa.table(
                {
                    "uid": batch.column("uid"),
                    "label": pc.min_element_wise(batch.column("label"), l2),
                }
            )

        labels = hop.map_batches(shortcut, batch_format="pyarrow").materialize()
    else:
        if n_changed:
            raise RuntimeError(
                f"connected_components: label propagation did not converge in "
                f"{max_iters} rounds ({n_changed} labels still changing); "
                "component diameter exceeds the round budget — raise max_iters"
            )
    return labels.rename_columns({"label": "cluster_id"})
