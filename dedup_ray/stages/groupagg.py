"""Vectorized large-keyspace aggregation: sort + per-block acero + boundary heal.

Ray Data's built-in ``groupby().aggregate()`` pays per-GROUP Python overhead
(~25 us/key measured) — unusable when the keyspace is the shingle space or
the doc space.  ``Dataset.sort`` however is a vectorized distributed
range-partition sort (~0.9 s for the same input that took 26 s to aggregate).

``sorted_aggregate`` therefore:
  1. sorts by the key column(s) (THE shuffle; range-partitioned, Arrow-native),
  2. aggregates each sorted block with ``pyarrow.Table.group_by`` (acero,
     vectorized) via ``map_batches(batch_size=None)`` — one batch per block,
  3. heals block boundaries: only the first/last key of each block can span
     blocks, so those partial rows (<= 2 per block) are merged in a single
     tiny driver pass and unioned back.

Supported agg fns are the mergeable ones: sum, min, max, count (merge=sum).
All value columns must be Arrow-native types.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_MERGE_FN = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _block_aggregate(batch: pa.Table, keys: list[str], aggs: dict) -> pa.Table:
    """Aggregate one sorted block; flag first/last-key rows as boundary."""
    if batch.num_rows == 0:
        fields = {k: batch.column(k) for k in keys}
        for out, (col, fn) in aggs.items():
            typ = pa.int64() if fn == "count" else batch.schema.field(col).type
            fields[out] = pa.array([], type=typ)
        fields["_boundary"] = pa.array([], type=pa.bool_())
        return pa.table(fields)
    spec = [(col, fn) for _, (col, fn) in aggs.items()]
    gt = batch.group_by(keys, use_threads=False).aggregate(spec)
    # pyarrow names outputs "<col>_<fn>"
    rename = {}
    used = {}
    for out, (col, fn) in aggs.items():
        pa_name = f"{col}_{fn}"
        # handle duplicate (col, fn) pairs defensively
        idx = used.get(pa_name, 0)
        used[pa_name] = idx + 1
        rename.setdefault(pa_name, []).append(out)
    cols = {k: gt.column(k) for k in keys}
    for pa_name, outs in rename.items():
        for out in outs:
            cols[out] = gt.column(pa_name)
    # boundary = groups whose key equals the block's first or last key tuple
    first = tuple(batch.column(k)[0].as_py() for k in keys)
    last = tuple(batch.column(k)[batch.num_rows - 1].as_py() for k in keys)
    mask = np.zeros(gt.num_rows, dtype=bool)
    for ref in (first, last):
        m = np.ones(gt.num_rows, dtype=bool)
        for k, v in zip(keys, ref):
            m &= gt.column(k).to_numpy(zero_copy_only=False) == v
        mask |= m
    cols["_boundary"] = pa.array(mask)
    return pa.table(cols)


def sorted_aggregate(
    ds: Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    empty_types: dict[str, pa.DataType] | None = None,
) -> Dataset:
    """ds -> one row per distinct key tuple with aggregated columns.

    aggs: {out_col: (in_col, fn)} with fn in {sum, min, max, count}.
    ``count`` counts rows per key (in_col ignored for semantics but must be a
    real column).  Returns a Dataset with columns keys + aggs keys.
    """
    import ray

    from ..util import ds_from_refs, split_boundary

    for _, (_, fn) in aggs.items():
        if fn not in _MERGE_FN:
            raise ValueError(f"unsupported agg fn {fn}")

    s = ds.sort(keys)
    part = s.map_batches(
        lambda b: _block_aggregate(b, keys, aggs),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    # THE execution (sort shuffle + per-block aggregate); boundary healing and
    # the interior split run as raw tasks over the materialised blocks.
    part = part.materialize()
    int_refs, boundary, n_interior = split_boundary(part)

    if empty_types is None:
        # Derive the output schema so a degenerate empty input still yields a
        # typed (not zero-column) dataset: keys + agg outputs, in order.  The
        # aggregated ``part`` is materialised, so its schema is metadata-only
        # when any block exists; fall back to the input schema otherwise.
        empty_types = {}
        if not int_refs and (boundary is None or not boundary.num_rows):
            sch = None
            try:
                sch = part.schema(fetch_if_missing=False)
            except Exception:
                sch = None
            if sch is not None and keys[0] in sch.names:
                empty_types = {
                    n: t
                    for n, t in zip(sch.names, sch.types)
                    if n != "_boundary"
                }
            else:
                in_sch = ds.schema()
                if in_sch is not None:
                    in_types = dict(zip(in_sch.names, in_sch.types))
                    empty_types = {k: in_types[k] for k in keys}
                    for out, (col, fn) in aggs.items():
                        empty_types[out] = (
                            pa.int64() if fn == "count" else in_types[col]
                        )
    if boundary is not None and boundary.num_rows:
        merge_spec = [(out, _MERGE_FN[fn]) for out, (_, fn) in aggs.items()]
        gt = boundary.group_by(keys, use_threads=False).aggregate(merge_spec)
        cols = {k: gt.column(k) for k in keys}
        for out, (_, fn) in aggs.items():
            cols[out] = gt.column(f"{out}_{_MERGE_FN[fn]}")
        merged = pa.table(cols)
        int_refs = int_refs + [ray.put(merged)]
        n_interior += merged.num_rows
    return ds_from_refs(int_refs, count=n_interior, **empty_types)


def hash_sum_aggregate(
    ds: Dataset,
    key: str,
    sums: dict[str, str],
    *,
    num_parts: int | None = None,
    empty_types: dict[str, pa.DataType] | None = None,
) -> Dataset:
    """Exact per-key integer SUMs via ONE radix hash exchange — the cheap
    sibling of :func:`sorted_aggregate` for an int64 key with sum-only aggs.

    Shape: each materialised block radix-splits its rows by ``key %
    num_parts`` (one raw task per block, stable argsort + searchsorted
    slices); one combiner task per part concatenates its slices and
    segment-sums per distinct key (argsort + ``np.add.reduceat`` — int64
    exact, no float bincount).  No range-partition sort, no boundary heal;
    the output is one row per distinct key, UNORDERED.

    Why it exists: the per-uid combiner partials of the fused exchange have
    volume n_docs x T (T = task partitions), so their aggregation input
    GROWS with parallelism — at 32 cpus the range sort of
    :func:`sorted_aggregate` was measured 5x slower than at 8 cpus on the
    same corpus (protocol logs, BENCH/BASELINE.md round 4).  The radix
    exchange keeps per-combiner volume at ~n_docs rows independent of T.

    ``sums``: {out_col: in_col} (every agg is a sum).  Semantically equal to
    ``sorted_aggregate(ds, [key], {o: (c, "sum")})`` up to row order
    (parity-pinned by tests/test_groupagg.py).
    """
    import ray

    from ..util import ds_from_refs, map_blocks

    if num_parts is None:
        num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    mat = ds.materialize()
    cols = [key] + list(sums.values())

    def split(block: pa.Table):
        t = block.select(cols)
        k = t.column(key).to_numpy(zero_copy_only=False)
        part = k % num_parts
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(num_parts + 1))
        return tuple(
            t.slice(bounds[q], bounds[q + 1] - bounds[q])
            for q in range(num_parts)
        )

    outs = map_blocks(split, mat, num_returns=num_parts)
    if not outs:
        fields = empty_types or {}
        return ds_from_refs([], count=0, **fields)

    def combine(*parts):
        live = [p for p in parts if p.num_rows]
        if not live:
            empty = pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    **{
                        o: pa.array([], type=pa.int64())
                        for o in sums
                    },
                }
            )
            return empty, 0
        t = pa.concat_tables(live)
        k = t.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        out = {key: pa.array(ks[starts])}
        for o, c in sums.items():
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)[order]
            out[o] = pa.array(np.add.reduceat(v, starts))
        res = pa.table(out)
        return res, res.num_rows

    # every combiner also returns its row count so callers get a
    # known-count dataset (downstream count gates skip a full execution)
    comb = ray.remote(num_returns=2)(combine)
    pairs = [comb.remote(*[o[q] for o in outs]) for q in range(num_parts)]
    counts = ray.get([p[1] for p in pairs])
    refs = [p[0] for p, c in zip(pairs, counts) if c]
    fields = empty_types or {}
    return ds_from_refs(refs, count=int(sum(counts)), **fields)
