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

    Skew-safe heal: a block's edge buckets (its first/last key, which may
    span blocks) first ship only (key, local-count) partials (<= 2 tiny rows
    per block); the driver sums them and a second raw-task round fetches rows
    ONLY for keys whose global size is within the cap.  A hot key covering
    entire blocks therefore costs the driver two dict entries, never its
    rows; driver state is O(blocks + eligible-edge-keys x cap).
    """
    import pyarrow.compute as pc
    import ray

    from ..util import block_refs, ds_from_refs
    from .groupagg import sorted_aggregate

    s = ds.sort([key_col, id_col])

    def block_pairs(t: pa.Table):
        """Returns (interior-pairs table, edge-rows table (key, id),
        edge-counts table (k, n), n_pairs)."""
        empty_pairs = pa.table(
            {"ua": pa.array([], type=pa.int64()), "ub": pa.array([], type=pa.int64())}
        )
        empty_bnd = pa.table(
            {"_k": pa.array([], type=pa.string()), "id": pa.array([], type=pa.int64())}
        )
        empty_edge = pa.table(
            {"k": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
        )
        if t.num_rows == 0:
            return empty_pairs, empty_bnd, empty_edge, 0

        keys = t.column(key_col)
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
        n = t.num_rows
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
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
        pairs = pa.table(
            {"ua": pa.array(ua, type=pa.int64()), "ub": pa.array(ub, type=pa.int64())}
        )
        bnd_keys = pc.cast(keys, pa.string()).filter(pa.array(bnd_rows))
        bnd = pa.table(
            {"_k": bnd_keys, "id": pa.array(ids[bnd_rows], type=pa.int64())}
        )
        fk, lk = str(keys[0].as_py()), str(keys[n - 1].as_py())
        nf = int(first_mask.sum())
        nl = nf if fk == lk else int(last_mask.sum())
        ek = [fk] if fk == lk else [fk, lk]
        en = [nf] if fk == lk else [nf, nl]
        edge = pa.table(
            {"k": pa.array(ek, type=pa.string()), "n": pa.array(en, type=pa.int64())}
        )
        return pairs, bnd, edge, pairs.num_rows

    refs = block_refs(s.materialize())
    task = ray.remote(num_returns=4)(block_pairs)
    outs = [task.remote(r) for r in refs]
    counts = ray.get([o[3] for o in outs])
    edges = ray.get([o[2] for o in outs])
    out_refs = [o[0] for o, c in zip(outs, counts) if c]
    n_int = int(sum(counts))

    # global edge-bucket sizes (O(blocks) driver state, never raw rows)
    totals: dict[str, int] = {}
    for e in edges:
        for k, cnt in zip(e.column("k").to_pylist(), e.column("n").to_pylist()):
            totals[k] = totals.get(k, 0) + int(cnt)
    elig_keys = pa.array(
        [k for k, v in totals.items() if 2 <= v <= bucket_cap], type=pa.string()
    )

    if len(elig_keys):

        def pick(bnd: pa.Table, ek):
            out = bnd.filter(pc.is_in(bnd.column("_k"), value_set=ek))
            return out, out.num_rows

        ptask = ray.remote(num_returns=2)(pick)
        pouts = [ptask.remote(o[1], elig_keys) for o in outs]
        pcounts = ray.get([p[1] for p in pouts])
        btables = ray.get([p[0] for p, c in zip(pouts, pcounts) if c])
        if btables:
            boundary = pa.concat_tables(btables)
            bk = np.asarray(boundary.column("_k").to_pylist(), dtype=object)
            bu = boundary.column("id").to_numpy(zero_copy_only=False)
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
                out_refs = out_refs + [ray.put(bt)]
                n_int += bt.num_rows

    pairs = ds_from_refs(out_refs, count=n_int, ua=pa.int64(), ub=pa.int64())
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
    callers count per doc.  Same physical shape as :func:`pairs_by_key` (one
    sort, per-block vectorised bucket scan) but the output is LINEAR in
    bucket size (no pair fan-out), so no bucket cap is needed: a hot gram
    shared by d docs emits d rows, not O(d^2).

    Skew-safe heal: boundary rows never leave their block.  Each block ships
    only (edge-key, any_flag) bits (<= 2 per block) to the driver; the global
    OR is then shipped back to a second raw-task round that emits the held
    boundary ids in place.  Driver state is O(blocks), even when a hot key
    covers entire blocks after the sort.
    """
    import pyarrow.compute as pc
    import ray

    from ..util import ds_from_refs

    s = ds.sort([key_col, id_col])

    def block_semi(t: pa.Table):
        """Returns (kept-interior ids table, held boundary rows table,
        tiny (key, any_flag) edge table, n_kept_interior)."""
        empty_ids = pa.table({"id": pa.array([], type=pa.int64())})
        empty_bnd = pa.table(
            {
                "_k": pa.array([], type=pa.string()),
                "id": pa.array([], type=pa.int64()),
                "_flag": pa.array([], type=pa.bool_()),
            }
        )
        empty_edge = pa.table(
            {"k": pa.array([], type=pa.string()), "f": pa.array([], type=pa.bool_())}
        )
        if t.num_rows == 0:
            return empty_ids, empty_bnd, empty_edge, 0
        keys = t.column(key_col)
        keys = keys.combine_chunks() if keys.num_chunks != 1 else keys.chunk(0)
        n = t.num_rows
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flags = t.column(flag_col).to_numpy(zero_copy_only=False).astype(bool)
        neq = (
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            if n > 1
            else np.empty(0, dtype=bool)
        )
        starts = np.flatnonzero(np.r_[True, neq])
        # bucket id per row, bucket-any(flag) broadcast back to rows
        bid = np.cumsum(np.r_[True, neq]) - 1
        any_flag = np.zeros(len(starts), dtype=bool)
        np.logical_or.at(any_flag, bid[flags], True)
        first_mask = pc.equal(keys, keys[0]).to_numpy(zero_copy_only=False)
        last_mask = pc.equal(keys, keys[n - 1]).to_numpy(zero_copy_only=False)
        bnd_rows = first_mask | last_mask
        keep = any_flag[bid] & ~flags & ~bnd_rows
        kept = pa.table({"id": pa.array(ids[keep], type=pa.int64())})
        bnd_keys = pc.cast(keys, pa.string()).filter(pa.array(bnd_rows))
        bnd = pa.table(
            {
                "_k": bnd_keys,
                "id": pa.array(ids[bnd_rows], type=pa.int64()),
                "_flag": pa.array(flags[bnd_rows]),
            }
        )
        fk, lk = str(keys[0].as_py()), str(keys[n - 1].as_py())
        ek = [fk] if fk == lk else [fk, lk]
        ef = [bool(any_flag[0])] if fk == lk else [
            bool(any_flag[0]), bool(any_flag[-1])
        ]
        edge = pa.table({"k": pa.array(ek, type=pa.string()), "f": pa.array(ef)})
        return kept, bnd, edge, kept.num_rows

    from ..util import block_refs

    refs = block_refs(s.materialize())
    task = ray.remote(num_returns=4)(block_semi)
    outs = [task.remote(r) for r in refs]
    counts = ray.get([o[3] for o in outs])
    edges = ray.get([o[2] for o in outs])
    out_refs = [o[0] for o, c in zip(outs, counts) if c]
    n_int = int(sum(counts))

    # global OR of the per-block edge-bucket flags (O(blocks) driver state)
    glob: dict[str, bool] = {}
    for e in edges:
        for k, f in zip(e.column("k").to_pylist(), e.column("f").to_pylist()):
            glob[k] = glob.get(k, False) or bool(f)
    true_keys = pa.array([k for k, f in glob.items() if f], type=pa.string())

    def emit_boundary(bnd: pa.Table, tks):
        if bnd.num_rows == 0 or len(tks) == 0:
            return pa.table({"id": pa.array([], type=pa.int64())}), 0
        m = pc.and_(
            pc.is_in(bnd.column("_k"), value_set=tks),
            pc.invert(bnd.column("_flag")),
        )
        out = bnd.filter(m).select(["id"])
        return out, out.num_rows

    etask = ray.remote(num_returns=2)(emit_boundary)
    eouts = [etask.remote(o[1], true_keys) for o in outs]
    ecounts = ray.get([e[1] for e in eouts])
    out_refs += [e[0] for e, c in zip(eouts, ecounts) if c]
    n_int += int(sum(ecounts))

    return ds_from_refs(out_refs, count=n_int, id=pa.int64())


def annotate_bucket_size(ds: Dataset, key_col: str, *, out_col: str = "bucket_n"):
    """Append ``out_col`` = size of the row's ``key_col`` bucket to every row.

    Same physical plan as :func:`semi_join_by_key` (one sort, per-block
    vectorised bucket scan) but it PRESERVES every input column — the generic
    "attach a group count without a join" primitive (document frequency
    annotation, duplicate-segment marking, hot-key detection).

    Skew-safe heal: the driver never sees raw rows.  Each block ships only
    per-(block, boundary-key) PARTIAL COUNTS (<= 2 tiny rows per block); the
    driver sums them and blocks whose edge keys span several blocks get their
    ``out_col`` patched IN PLACE by a second raw-task round.  Driver state is
    O(blocks), even when a hot key covers entire blocks after the sort.
    Returns a materialised-ref dataset; empty input yields an empty dataset
    with no schema (callers gate on known_count upstream).
    """
    import pyarrow.compute as pc
    import ray

    from ..util import block_refs, ds_from_refs

    s = ds.sort([key_col])

    def markb(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
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
        return batch.append_column(out_col, pa.array(bucket_n, type=pa.int64()))

    part = s.map_batches(
        markb, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    refs = block_refs(part)

    def edge_counts(t: pa.Table):
        """((first_key, count), (last_key, count), n_rows) — keys as strings."""
        n = t.num_rows
        if n == 0:
            return None, None, 0
        keys = t.column(key_col)
        first = str(keys[0].as_py())
        last = str(keys[n - 1].as_py())
        fkeys = pc.cast(keys, pa.string())
        n_first = int(pc.sum(pc.equal(fkeys, first)).as_py())
        n_last = n_first if last == first else int(
            pc.sum(pc.equal(fkeys, last)).as_py()
        )
        return (first, n_first), (last, n_last), n

    ec_task = ray.remote(edge_counts)
    outs = ray.get([ec_task.remote(r) for r in refs])
    n_total = int(sum(o[2] for o in outs))
    # global size per edge key (tiny: <= 2 keys per block on the driver)
    totals: dict[str, int] = {}
    for first, last, _n in outs:
        for kv in (first, last) if first != last else (first,):
            if kv is not None:
                totals[kv[0]] = totals.get(kv[0], 0) + kv[1]

    def patch(t: pa.Table, fixes: dict) -> pa.Table:
        fk = pa.array(list(fixes.keys()), type=pa.string())
        fv = np.asarray(list(fixes.values()), dtype=np.int64)
        keys = pc.cast(t.column(key_col), pa.string())
        pos = pc.index_in(keys, value_set=fk).to_numpy(zero_copy_only=False)
        cur = t.column(out_col).to_numpy(zero_copy_only=False).copy()
        hit = pos == pos  # valid (non-null) positions
        cur[hit] = fv[pos[hit].astype(np.int64)]
        return t.set_column(
            t.schema.get_field_index(out_col), out_col, pa.array(cur, type=pa.int64())
        )

    new_refs = []
    patch_task = ray.remote(patch)
    for r, (first, last, n) in zip(refs, outs):
        if n == 0:
            continue
        fixes = {
            k: totals[k]
            for k, local in ((first, last) if first != last else (first,))
            if totals[k] != local
        }
        new_refs.append(patch_task.remote(r, fixes) if fixes else r)
    return ds_from_refs(new_refs, count=n_total)
