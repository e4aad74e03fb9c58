"""Generic sorted-bucket pair emission: the flagship inverted-index self-join
shape (sort by key, emit each bucket's id pairs per sorted block, heal the
block-boundary buckets on the driver, distinct-count pairs) for ANY key type.
Replaces hash self-joins whose fan-out is bounded by a bucket cap — one sort
+ one distinct instead of a join (no per-partition aggregator actors, no
O(df^2) rows through a hash exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def pairs_by_key(
    ds: Dataset,
    key_col: str,
    id_col: str,
    *,
    bucket_cap: int = 1 << 30,
) -> Dataset:
    """(key, id) rows -> distinct (ua, ub, n_buckets) id pairs sharing a key;
    buckets larger than ``bucket_cap`` are skipped (hot-key guard, mirrored
    by the caller's semantics).  ids must be int64; keys any comparable type.

    ``n_buckets`` = number of distinct shared keys (the ``common`` count when
    input rows are distinct per (key, id)).
    """
    import ray

    from ..util import ds_from_refs, split_boundary
    from .groupagg import sorted_aggregate

    s = ds.sort([key_col, id_col])

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ua": pa.array([], type=pa.int64()),
                "ub": pa.array([], type=pa.int64()),
                "_bnd_key": pa.array([], type=pa.string()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        keys = batch.column(key_col)
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        neq = (
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            if n > 1
            else np.empty(0, dtype=bool)
        )
        starts = np.flatnonzero(np.r_[True, neq])
        ends = np.r_[starts[1:], n]
        sizes = ends - starts
        first_mask = pc.equal(keys, keys[0]).to_numpy(zero_copy_only=False)
        last_mask = pc.equal(keys, keys[n - 1]).to_numpy(zero_copy_only=False)
        bnd_rows = first_mask | last_mask
        interior = ~(first_mask[starts] | last_mask[starts])
        elig = interior & (sizes >= 2) & (sizes <= bucket_cap)
        ua_parts, ub_parts = [], []
        max_m = int(sizes[elig].max()) if elig.any() else 0
        for y in range(1, max_m):
            mask = elig & (sizes > y)
            if not mask.any():
                break
            base = starts[mask]
            for x in range(y):
                # ids ascend within a bucket (sorted by (key, id)) => ua < ub
                ua_parts.append(ids[base + x])
                ub_parts.append(ids[base + y])
        ua = np.concatenate(ua_parts) if ua_parts else np.empty(0, dtype=np.int64)
        ub = np.concatenate(ub_parts) if ub_parts else np.empty(0, dtype=np.int64)
        nb = int(bnd_rows.sum())
        # boundary buckets (the block's first/last key) may span blocks: ship
        # their raw (key-as-string, id) postings for the tiny driver heal
        bnd_keys = pc.cast(keys, pa.string()).filter(pa.array(bnd_rows))
        return pa.table(
            {
                "ua": pa.array(np.concatenate([ua, ids[bnd_rows]]), type=pa.int64()),
                "ub": pa.array(
                    np.concatenate([ub, np.zeros(nb, dtype=np.int64)]), type=pa.int64()
                ),
                "_bnd_key": pa.concat_arrays(
                    [pa.nulls(len(ua), type=pa.string()), bnd_keys]
                ),
                "_boundary": pa.array(np.r_[np.zeros(len(ua), bool), np.ones(nb, bool)]),
            }
        )

    part = s.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)

    def strip(t: pa.Table):
        t = t.drop_columns(["_bnd_key"])
        return t, t.num_rows

    outs = [ray.remote(num_returns=2)(strip).remote(r) for r in int_refs]
    counts = ray.get([o[1] for o in outs])
    refs = [o[0] for o, c in zip(outs, counts) if c]
    n_int = int(sum(counts))

    if boundary is not None and boundary.num_rows:
        bk = np.asarray(boundary.column("_bnd_key").to_pylist(), dtype=object)
        bu = boundary.column("ua").to_numpy(zero_copy_only=False)
        order = np.lexsort((bu, bk))
        bk, bu = bk[order], bu[order]
        keep = np.r_[True, (bk[1:] != bk[:-1]) | (bu[1:] != bu[:-1])]
        bk, bu = bk[keep], bu[keep]
        g_starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        g_ends = np.r_[g_starts[1:], len(bk)]
        ua_out, ub_out = [], []
        for st, en in zip(g_starts, g_ends):
            m = en - st
            if m < 2 or m > bucket_cap:
                continue
            u = bu[st:en]
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
            refs = refs + [ray.put(bt)]
            n_int += bt.num_rows

    pairs = ds_from_refs(refs, count=n_int, ua=pa.int64(), ub=pa.int64())
    return sorted_aggregate(
        pairs, ["ua", "ub"], {"n_buckets": ("ua", "count")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )


def semi_join_by_key(
    ds: Dataset,
    key_col: str,
    id_col: str,
    flag_col: str,
) -> Dataset:
    """Distributed semi-join on a shared key: keep the ``id_col`` of every
    NON-flag row whose key-bucket contains at least one flag row.

    The decontamination shape (GPT-3 appendix C / Brown et al. 2020: drop
    train docs sharing an n-gram with the eval set): rows are (gram, doc_id,
    is_eval); the result is one row per surviving (gram, train-doc) posting —
    callers count per doc.  Same physical plan as :func:`pairs_by_key` (one
    sort, per-block vectorised bucket scan, tiny driver heal for the <=2
    buckets per block that straddle a block edge) but the output is LINEAR in
    bucket size (no pair fan-out), so no bucket cap is needed: a hot gram
    shared by d docs emits d rows, not O(d^2).
    """
    import pyarrow.compute as pc
    import ray

    from ..util import ds_from_refs, split_boundary

    s = ds.sort([key_col, id_col])

    def block_semi(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "_flag": pa.array([], type=pa.bool_()),
                "_bnd_key": pa.array([], type=pa.string()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        keys = batch.column(key_col)
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flags = batch.column(flag_col).to_numpy(zero_copy_only=False).astype(bool)
        neq = (
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            if n > 1
            else np.empty(0, dtype=bool)
        )
        starts = np.flatnonzero(np.r_[True, neq])
        ends = np.r_[starts[1:], n]
        # bucket id per row, bucket-any(flag) broadcast back to rows
        bid = np.cumsum(np.r_[True, neq]) - 1
        any_flag = np.zeros(len(starts), dtype=bool)
        np.logical_or.at(any_flag, bid[flags], True)
        first_mask = pc.equal(keys, keys[0]).to_numpy(zero_copy_only=False)
        last_mask = pc.equal(keys, keys[n - 1]).to_numpy(zero_copy_only=False)
        bnd_rows = first_mask | last_mask
        keep = any_flag[bid] & ~flags & ~bnd_rows
        # boundary buckets (the block's first/last key) may span blocks: ship
        # their raw (key-as-string, id, flag) postings for the driver heal
        bnd_keys = pc.cast(keys, pa.string()).filter(pa.array(bnd_rows))
        nk, nb = int(keep.sum()), int(bnd_rows.sum())
        return pa.table(
            {
                "id": pa.array(np.concatenate([ids[keep], ids[bnd_rows]]), type=pa.int64()),
                "_flag": pa.array(np.r_[np.zeros(nk, bool), flags[bnd_rows]]),
                "_bnd_key": pa.concat_arrays([pa.nulls(nk, type=pa.string()), bnd_keys]),
                "_boundary": pa.array(np.r_[np.zeros(nk, bool), np.ones(nb, bool)]),
            }
        )

    part = s.map_batches(
        block_semi, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)

    def strip(t: pa.Table):
        t = t.select(["id"])
        return t, t.num_rows

    outs = [ray.remote(num_returns=2)(strip).remote(r) for r in int_refs]
    counts = ray.get([o[1] for o in outs])
    refs = [o[0] for o, c in zip(outs, counts) if c]
    n_int = int(sum(counts))

    if boundary is not None and boundary.num_rows:
        bk = np.asarray(boundary.column("_bnd_key").to_pylist(), dtype=object)
        bi = boundary.column("id").to_numpy(zero_copy_only=False)
        bf = boundary.column("_flag").to_numpy(zero_copy_only=False).astype(bool)
        order = np.argsort(bk, kind="stable")
        bk, bi, bf = bk[order], bi[order], bf[order]
        g_starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        gid = np.cumsum(np.r_[True, bk[1:] != bk[:-1]]) - 1
        g_any = np.zeros(len(g_starts), dtype=bool)
        np.logical_or.at(g_any, gid[bf], True)
        keep = g_any[gid] & ~bf
        if keep.any():
            bt = pa.table({"id": pa.array(bi[keep], type=pa.int64())})
            refs = refs + [ray.put(bt)]
            n_int += bt.num_rows

    return ds_from_refs(refs, count=n_int, id=pa.int64())


def annotate_bucket_size(ds: Dataset, key_col: str, *, out_col: str = "bucket_n"):
    """Append ``out_col`` = size of the row's ``key_col`` bucket to every row.

    Same physical plan as :func:`semi_join_by_key` (one sort, per-block
    vectorised bucket scan, tiny driver heal for the <=2 buckets per block
    that straddle a block edge) but it PRESERVES every input column — the
    generic "attach a group count without a join" primitive (document
    frequency annotation, duplicate-segment marking, hot-key detection).
    Returns a materialised-ref dataset; empty input yields an empty dataset
    with no schema (callers gate on known_count upstream).
    """
    import pyarrow.compute as pc
    import ray

    from ..util import ds_from_refs, split_boundary

    s = ds.sort([key_col])

    def markb(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_col, pa.array([], type=pa.int64())
            ).append_column("_boundary", pa.array([], type=pa.bool_()))
        keys = batch.column(key_col)
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
        neq = (
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            if n > 1
            else np.empty(0, dtype=bool)
        )
        starts = np.flatnonzero(np.r_[True, neq])
        sizes = np.r_[starts[1:], n] - starts
        bucket_n = np.repeat(sizes, sizes)
        bnd = (
            pc.equal(keys, keys[0]).to_numpy(zero_copy_only=False)
            | pc.equal(keys, keys[n - 1]).to_numpy(zero_copy_only=False)
        )
        return batch.append_column(
            out_col, pa.array(bucket_n, type=pa.int64())
        ).append_column("_boundary", pa.array(bnd))

    part = s.map_batches(
        markb, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        # boundary buckets have ALL their rows here (each block ships its
        # whole first/last bucket): recount exactly across the concat
        keys = boundary.column(key_col)
        cnt = pa.table({"k": keys}).group_by("k").aggregate([("k", "count")])
        pos = pc.index_in(keys, value_set=cnt.column("k").combine_chunks())
        sizes = pc.take(cnt.column("k_count"), pos).cast(pa.int64())
        healed = boundary.set_column(
            boundary.schema.get_field_index(out_col), out_col, sizes
        )
        int_refs = int_refs + [ray.put(healed)]
        n_int += healed.num_rows
    return ds_from_refs(int_refs, count=n_int)
