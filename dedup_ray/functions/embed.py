"""Embedding-space operators: cosine near-dup pairs, brute-force ANN top-k,
and an IVF-bucketed variant (the 100-TB scale path).

Brute force is the baseline: the (small) query/centroid side is broadcast
once with ``ray.put`` and every data batch does one numpy matmul against it
— no shuffle.  The IVF variant bounds the work at corpus scale: vectors are
bucketed by nearest coarse centroid (a groupby shuffle on the centroid id)
and queries only scan their ``n_probe`` nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, m


def cosine_dup_pairs(ds: Dataset, *, threshold: float = 0.95) -> Dataset:
    """All vector pairs with cosine similarity >= threshold.

    Blocked brute force: the full normalized matrix is broadcast via
    ``ray.put`` (one object-store copy, zero-copy reads in every task) and
    each batch computes its block of the similarity matrix.  O(n^2/p) per
    task — the exact baseline; use :func:`ivf_topk`'s bucketing for scale.
    """
    import ray

    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    all_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, mat))

    class Block:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ self.mat.T  # (batch, n)
            out_a, out_b = [], []
            for r in range(len(ids)):
                hits = np.flatnonzero(sims[r] >= threshold)
                for h in hits:
                    a, b = int(ids[r]), int(self.ids[h])
                    if a < b:
                        out_a.append(a)
                        out_b.append(b)
            return pa.table(
                {
                    "vec_a": pa.array(out_a, type=pa.int64()),
                    "vec_b": pa.array(out_b, type=pa.int64()),
                }
            )

    return ds.map_batches(Block, batch_format="pyarrow", concurrency=(1, 4))


def ivf_topk(
    ds: Dataset,
    *,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> pa.Table:
    """IVF approximate top-k: coarse k-means centroids (built from a driver
    sample — deterministic), vectors bucketed by nearest centroid, queries
    scan only their n_probe nearest buckets.

    Output: (query_id, neighbor_id, rnk) — approximate; recall depends on
    n_probe / n_centroids.
    """
    import ray

    sample_rows = ds.limit(4096).take_all()
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(kmeans_iters):  # spherical k-means on the sample
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / np.linalg.norm(v)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            a = np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
            return batch.append_column("bucket", pa.array(a))

    bucketed = ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4)).materialize()

    # queries + their probe buckets
    q_rows = bucketed.filter(expr=f"vec_id < {n_queries}").take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]  # (q, n_probe)
    q_ref = ray.put((q_ids, q_mat, probes))

    class Search:
        def __init__(self):
            self.q_ids, self.q_mat, self.probes = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for qi, q in enumerate(self.q_ids):
                mask = np.isin(buckets, self.probes[qi]) & (ids != q)
                if not mask.any():
                    continue
                sims = m[mask] @ self.q_mat[qi]
                sub_ids = ids[mask]
                top = np.argsort(-sims, kind="stable")[:k]
                out_q.extend([int(q)] * len(top))
                out_n.extend(sub_ids[top].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "sim": pa.array(out_s, type=pa.float64()),
                }
            )

    partials = bucketed.map_batches(Search, batch_format="pyarrow", concurrency=(1, 4))
    rows = {}
    for r in partials.take_all():
        rows.setdefault(r["query_id"], []).append((r["sim"], r["neighbor_id"]))
    out_q, out_n, out_r = [], [], []
    for q, lst in sorted(rows.items()):
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, nb) in enumerate(lst[:k], 1):
            out_q.append(q)
            out_n.append(nb)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rnk": pa.array(out_r, type=pa.int64()),
        }
    )
