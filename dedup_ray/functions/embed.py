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
    """(vec_id array, (n, dim) float64 matrix) — zero-copy view of the Arrow
    list values buffer (one reshape; no per-row Python list round-trip),
    with a ragged-list fallback."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    col = batch.column("embedding")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return ids, np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        m = flat.reshape(n, arr.type.list_size)
    elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            m = flat.reshape(n, int(widths[0]))
        else:  # ragged — not a valid embedding column, but don't crash
            m = np.array(arr.to_pylist(), dtype=np.float64)
    else:
        m = np.array(arr.to_pylist(), dtype=np.float64)
    return ids, np.ascontiguousarray(m, dtype=np.float64)


def cosine_dup_pairs(ds: Dataset, *, threshold: float = 0.95) -> Dataset:
    """All vector pairs with cosine similarity >= threshold — EXACT.

    Distributed block-pair product: the normalized matrix lives in the object
    store as per-block (ids, matrix) tuples; one raw Ray task per block pair
    (i <= j) computes its tile of the similarity matrix and emits the passing
    pairs, fully vectorised (np.nonzero on the mask, no per-row loop).  No
    driver-side materialisation of the corpus; O(B^2) tasks over O(n^2/B^2)
    tiles.  Exact all-pairs is inherently quadratic — at corpus scale use the
    bucketed approximate paths (:func:`ivf_topk` / hyperplane LSH) instead.
    """
    import ray

    from ..util import block_refs, ds_from_refs

    mat = ds.select_columns(["vec_id", "embedding"]).materialize()
    refs = block_refs(mat)

    @ray.remote
    def prep(t: pa.Table):
        ids, m = _emb_matrix(t)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return ids.astype(np.int64), m

    preps = [prep.remote(r) for r in refs]

    @ray.remote(num_returns=2)
    def tile(pi, pj, same: bool):
        ia, ma = pi
        ib, mb = pj
        sims = ma @ mb.T
        mask = sims >= threshold
        if same:
            mask &= ia[:, None] < ib[None, :]
        rows, cols = np.nonzero(mask)
        a, b = ia[rows], ib[cols]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        t = pa.table(
            {
                "vec_a": pa.array(lo, type=pa.int64()),
                "vec_b": pa.array(hi, type=pa.int64()),
            }
        )
        return t, t.num_rows

    outs = []
    for i in range(len(preps)):
        for j in range(i, len(preps)):
            outs.append(tile.remote(preps[i], preps[j], i == j))
    counts = ray.get([o[1] for o in outs]) if outs else []
    pair_refs = [o[0] for o, c in zip(outs, counts) if c]
    return ds_from_refs(
        pair_refs, count=int(sum(counts)), vec_a=pa.int64(), vec_b=pa.int64()
    )


def rademacher_signs(n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    """(n_tables, n_bits, dim) array of deterministic ±1 hyperplane entries:
    bit 0 of splitmix64((t*n_bits + b)*dim + d).  Rademacher entries are a
    valid sign-random-projection family (Achlioptas 2003) and, unlike
    gaussian draws from a numpy Generator, are replayable bitwise in SQL —
    the DuckDB oracle face recomputes the same signs with the sm64 CTEs."""
    from ..hashing import splitmix64

    idx = np.arange(n_tables * n_bits * dim, dtype=np.uint64)
    bits = (splitmix64(idx) & np.uint64(1)).astype(np.int64)
    return (bits * 2 - 1).reshape(n_tables, n_bits, dim)


def hyperplane_lsh_pairs(
    ds: Dataset,
    *,
    threshold: float = 0.8,
    n_tables: int = 8,
    n_bits: int = 14,
    dim: int | None = None,
    seed: int = 42,
    verify: bool = True,
    bucket_cap: int = 1024,
    plane_kind: str = "gaussian",
    quant: int = 1024,
) -> Dataset:
    """Approximate cosine near-dup pairs via random-hyperplane LSH (Charikar)
    — the 100-TB scale path for embedding pair-finding.

    Each vector gets ``n_tables`` bucket keys (sign bits of ``n_bits`` random
    projections); candidate pairs are docs sharing a bucket (sort-based
    emission, capped per bucket), then exact cosine verification runs per
    pair with a broadcast of ONLY the candidate vectors (gated).  Collision
    probability per table is (1 - theta/pi)^n_bits — tune n_bits/n_tables to
    the target threshold.

    ``plane_kind="rademacher"`` swaps the gaussian planes for deterministic
    splitmix64-derived ±1 entries applied to integer-quantised vectors
    (``floor(x*quant + 0.5)``): every projection is then exact int64
    arithmetic, so the bucket assignment — and with it the whole candidate
    set — is bit-reproducible by the DuckDB oracle face.
    """
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import ds_from_refs, split_boundary

    if dim is None:
        first = ds.take(1)
        dim = len(first[0]["embedding"]) if first else 0
    if dim == 0:
        return ds_from_refs([], count=0, vec_a=pa.int64(), vec_b=pa.int64())
    if plane_kind == "rademacher":
        planes = rademacher_signs(n_tables, n_bits, dim)
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_bits, dim))
    planes_ref = ray.put(planes)
    integer_planes = plane_kind == "rademacher"

    def bucket_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, m = _emb_matrix(batch)
        if integer_planes:
            m = np.floor(m.astype(np.float64) * quant + 0.5).astype(np.int64)
        n = len(ids)
        keys_out = []
        for t in range(n_tables):
            proj = m @ pl[t].T  # (n, n_bits)
            bits = (proj > 0).astype(np.int64)
            key = np.zeros(n, dtype=np.int64)
            for b in range(n_bits):
                key = (key << 1) | bits[:, b]
            keys_out.append((t << n_bits) | key)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(keys_out), type=pa.int64()),
                "uid": pa.array(np.tile(ids.astype(np.int64), n_tables), type=pa.int64()),
            }
        )

    rows = ds.select_columns(["vec_id", "embedding"]).map_batches(
        bucket_rows, batch_format="pyarrow"
    )
    s = rows.sort(["bucket", "uid"])

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ua": pa.array([], type=pa.int64()),
                "ub": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        uid = batch.column("uid").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        first, last = bk[0], bk[-1]
        bnd_rows = (bk == first) | (bk == last)
        out_a, out_b = [], []
        for st, en in zip(starts, ends):
            if bk[st] == first or bk[st] == last:
                continue
            u = np.unique(uid[st:en])[:bucket_cap]
            m = len(u)
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        ua = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        ub = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "ua": pa.array(np.concatenate([ua, bk[bnd_rows]]), type=pa.int64()),
                "ub": pa.array(np.concatenate([ub, uid[bnd_rows]]), type=pa.int64()),
                "_boundary": pa.array(
                    np.r_[np.zeros(len(ua), bool), np.ones(int(bnd_rows.sum()), bool)]
                ),
            }
        )

    part = s.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        bb = boundary.column("ua").to_numpy(zero_copy_only=False)
        bu = boundary.column("ub").to_numpy(zero_copy_only=False)
        order = np.lexsort((bu, bb))
        bb, bu = bb[order], bu[order]
        ua_out, ub_out = [], []
        g_starts = np.flatnonzero(np.r_[True, bb[1:] != bb[:-1]])
        g_ends = np.r_[g_starts[1:], len(bb)]
        for st, en in zip(g_starts, g_ends):
            u = np.unique(bu[st:en])[:bucket_cap]
            m = len(u)
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            ua_out.append(u[ia])
            ub_out.append(u[ib])
        if ua_out:
            bt = pa.table(
                {
                    "ua": pa.array(np.concatenate(ua_out), type=pa.int64()),
                    "ub": pa.array(np.concatenate(ub_out), type=pa.int64()),
                }
            )
            int_refs = int_refs + [ray.put(bt)]
            n_int += bt.num_rows
    cand = sorted_aggregate(
        ds_from_refs(int_refs, count=n_int, ua=pa.int64(), ub=pa.int64()),
        ["ua", "ub"],
        {"n_buckets": ("ua", "count")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )
    if not verify:
        return cand.rename_columns({"ua": "vec_a", "ub": "vec_b"})

    # exact cosine verification: broadcast ONLY the candidate vectors
    from ..stages.verify import _collect_uids

    cand_ids = cand.map_batches(
        lambda b: pa.table({"uid": b.column("ua")}), batch_format="pyarrow"
    ).union(
        cand.map_batches(lambda b: pa.table({"uid": b.column("ub")}), batch_format="pyarrow")
    )
    import ray.data as rd  # noqa: F401

    keys = _collect_uids(cand_ids.materialize())
    keys_ref = ray.put(keys)

    def slim(b: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        ids, m = _emb_matrix(b)
        if len(k) == 0:
            hit = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
            hit = k[pos] == ids
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {
                "vec_id": pa.array(ids[hit], type=pa.int64()),
                "emb": pa.array(list(m[hit]), type=pa.list_(pa.float64())),
            }
        )

    sub = ds.select_columns(["vec_id", "embedding"]).map_batches(
        slim, batch_format="pyarrow"
    ).take_all()
    sids = np.array([r["vec_id"] for r in sub], dtype=np.int64)
    smat = np.array([r["emb"] for r in sub], dtype=np.float64) if sub else np.zeros((0, dim))
    order = np.argsort(sids)
    lookup_ref = ray.put((sids[order], smat[order]))

    def check(b: pa.Table) -> pa.Table:
        k, m = ray.get(lookup_ref)
        ua = b.column("ua").to_numpy(zero_copy_only=False)
        ub = b.column("ub").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"vec_a": pa.array([], type=pa.int64()), "vec_b": pa.array([], type=pa.int64())}
            )
        pa_ = np.searchsorted(k, ua)
        pb_ = np.searchsorted(k, ub)
        sims = np.einsum("ij,ij->i", m[pa_], m[pb_])
        keep = sims >= threshold
        return pa.table(
            {
                "vec_a": pa.array(ua[keep], type=pa.int64()),
                "vec_b": pa.array(ub[keep], type=pa.int64()),
            }
        )

    return cand.map_batches(check, batch_format="pyarrow")


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

    # queries + their probe buckets: raw tasks over the materialised blocks
    # (no Dataset execution, no actor pool — per-task state is one zero-copy
    # ray.get of the broadcast centroid/query refs)
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()

    def q_rows(b: pa.Table):
        ids, m = _emb_matrix(b)
        sel = ids < n_queries
        return np.asarray(ids[sel], dtype=np.int64), m[sel]

    parts = [p for p in ray.get(map_blocks(q_rows, mat)) if len(p[0])]
    if parts:
        q_ids = np.concatenate([p[0] for p in parts])
        q_mat = np.concatenate([p[1] for p in parts]).astype(np.float64)
        order = np.argsort(q_ids, kind="stable")
        q_ids, q_mat = q_ids[order], q_mat[order]
        q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
        probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]  # (q, n_probe)
    else:
        q_ids = np.empty(0, dtype=np.int64)
        q_mat = np.empty((0, 0))
        probes = np.empty((0, 0), dtype=np.int64)
    q_ref = ray.put((q_ids, q_mat, probes))

    def assign_and_search(batch: pa.Table) -> pa.Table:
        """Fused bucket assignment + probe scan: ONE task wave, no
        materialised bucketed intermediate."""
        c = ray.get(cent_ref)
        qi_ids, qi_mat, qi_probes = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
        if m.size == 0 or len(qi_ids) == 0:
            return empty
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        buckets = np.argmax(m @ c.T, axis=1).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi, q in enumerate(qi_ids):
            mask = np.isin(buckets, qi_probes[qi]) & (ids != q)
            if not mask.any():
                continue
            sims = m[mask] @ qi_mat[qi]
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

    partials = mat.map_batches(assign_and_search, batch_format="pyarrow")
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


def kmeans_assign(
    ds: Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    keep_embedding: bool = False,
) -> Dataset:
    """Distributed Lloyd's k-means over the FULL embedding table (unlike
    :func:`ivf_topk`, whose coarse centroids come from a driver sample).

    Per iteration: broadcast the (k x dim) centroids once with ``ray.put``,
    every block computes per-cluster partial vector sums + counts as a raw
    task (one matmul + two bincounts — no shuffle), and the driver reduces
    the O(blocks x k x dim) partials into new centroids.  Driver state is
    k x dim floats — never O(rows).  Deterministic: init = the k smallest
    vec_ids' embeddings, argmin ties take the lowest cluster index, empty
    clusters keep their previous centroid, and partials are reduced in
    block order.

    Returns a Dataset of (vec_id, cluster); with ``keep_embedding`` the
    input embedding column rides along (for downstream within-cluster
    passes like :func:`semantic_dedup`).
    """
    import ray

    from ..util import map_blocks

    from ray.data.dataset import MaterializedDataset

    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()

    # deterministic init: embeddings of the k GLOBALLY smallest vec_ids via a
    # per-block bottom-k merge — correct for offset / sparse / filtered id
    # spaces (not just dense 0-based); driver state is O(blocks x k)
    def bottomk(b: pa.Table, _k=k):
        ids, m = _emb_matrix(b)
        if m.size == 0:
            return np.empty(0, dtype=np.int64), np.empty((0, 0))
        order = np.argsort(ids, kind="stable")[:_k]
        return np.asarray(ids[order], dtype=np.int64), m[order]

    parts = [p for p in ray.get(map_blocks(bottomk, mat)) if p[1].size]
    if parts:
        ids_all = np.concatenate([p[0] for p in parts])
        m_all = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids_all, kind="stable")[:k]
        cent = np.asarray(m_all[order], dtype=np.float64)
    else:
        cent = np.empty((0, 0), dtype=np.float64)
    kk = len(cent)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def part(b: pa.Table, _cref=cent_ref, _k=kk):
            c = ray.get(_cref)
            ids, m = _emb_matrix(b)
            if m.size == 0:
                return np.zeros((_k, c.shape[1])), np.zeros(_k, dtype=np.int64)
            # squared euclidean argmin via the expansion trick
            d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)
            a = np.argmin(d2, axis=1)
            sums = np.zeros((_k, c.shape[1]))
            np.add.at(sums, a, m)
            return sums, np.bincount(a, minlength=_k).astype(np.int64)

        parts = ray.get(map_blocks(part, mat))
        sums = np.zeros_like(cent)
        cnts = np.zeros(kk, dtype=np.int64)
        for s, c in parts:
            sums += s
            cnts += c
        nz = cnts > 0
        cent[nz] = sums[nz] / cnts[nz, None]

    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, m = _emb_matrix(batch)
        if m.size == 0:
            out = {
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
            }
            if keep_embedding:
                out["embedding"] = pa.array([], type=batch.schema.field("embedding").type)
            return pa.table(out)
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)
        a = np.argmin(d2, axis=1).astype(np.int64)
        out = {
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster": pa.array(a, type=pa.int64()),
        }
        if keep_embedding:
            out["embedding"] = batch.column("embedding")
        return pa.table(out)

    return mat.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds: Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    tau: float = 0.95,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public): k-means
    partitions the embedding space; within each cluster, vectors are
    scanned in ascending vec_id order and DROPPED when their cosine
    similarity to an already-kept vector exceeds ``tau``.  Returns
    (vec_id, cluster, kept) for every input vector.

    Physical shape: :func:`kmeans_assign` (broadcast-centroid partial-sum
    rounds — no shuffle) + ONE groupby(cluster) shuffle; the within-cluster
    scan is sequential BY DESIGN (greedy keep-first semantics) but each
    step is one numpy matvec against the kept matrix.  Partitioning
    assumption: one cluster's vectors fit in a task (task memory is
    cluster_size x dim doubles, greedy cost O(cluster_size^2 x dim) worst
    case) — at corpus scale callers must grow ``k`` with N so clusters stay
    task-sized (SemDeDup itself uses ~11k clusters; k ~ N / target_cluster
    is the operating rule, exactly as with IVF list counts).  Deterministic:
    same seeds and tie rules as kmeans_assign, scan order is vec_id."""
    assigned = kmeans_assign(ds, k=k, iters=iters, keep_embedding=True)

    def greedy(group: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(group)
        cluster = group.column("cluster").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_o, m_o = ids[order], m[order]
        norms = np.linalg.norm(m_o, axis=1)
        norms[norms == 0.0] = 1.0
        m_o = m_o / norms[:, None]
        kept_rows = np.empty_like(m_o)
        n_kept = 0
        kept_flags = np.zeros(len(ids_o), dtype=bool)
        for i in range(len(ids_o)):
            if n_kept == 0 or (kept_rows[:n_kept] @ m_o[i]).max() <= tau:
                kept_rows[n_kept] = m_o[i]
                n_kept += 1
                kept_flags[i] = True
        return pa.table(
            {
                "vec_id": pa.array(ids_o, type=pa.int64()),
                "cluster": pa.array(cluster[order], type=pa.int64()),
                "kept": pa.array(kept_flags),
            }
        )

    return assigned.groupby("cluster").map_groups(greedy, batch_format="pyarrow")
