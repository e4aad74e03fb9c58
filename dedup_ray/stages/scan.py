"""Distributed ordered prefix-scan (running total in global key order).

The primitive behind budget-style corpus selection ("keep the best docs
until a token budget is exhausted" — the web-pipeline analogue of the
reference's coverage-bounded trimming loop, ``/root/reference/dedup/
dedup.py:437-520``'s global stopping criterion): every row gets the
inclusive running sum of ``value_col`` over the dataset ordered by
``keys``.  SQL equivalent: ``SUM(value) OVER (ORDER BY keys ROWS UNBOUNDED
PRECEDING)``.

Shape (TeraSort-style, all raw tasks over materialised blocks):

  1. one sampling wave: each block returns <=32 key samples + its value sum
     (the sum is free here and lets callers derive relative budgets);
  2. driver picks P-1 range splitters from the pooled samples;
  3. one B x P exchange: each block range-partitions its rows;
  4. one reduce per partition: concat + local sort + local inclusive
     cumsum; returns its value total as a scalar side output;
  5. driver exclusive-scans the P totals (P numbers, not rows) and a final
     tiny wave adds each partition's offset.

No stage ever holds more than one partition; skew is bounded by the sample
quality exactly as in Ray's own sort.  At 100 TB the only driver-side data
is P splitters + P totals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..util import block_refs, ds_from_refs


def ordered_prefix_scan(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    *,
    descending: list[bool] | None = None,
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> tuple[Dataset, int]:
    """Returns (dataset with ``cum_col`` appended, total value sum).

    Rows come back grouped by range partition and sorted by ``keys`` within
    each partition — i.e. in global key order across the output blocks.
    ``keys`` columns must be numeric (int/float); ``value_col`` integer.
    """
    import ray

    desc = descending or [False] * len(keys)
    mat = ds.materialize()
    refs = block_refs(mat)
    B = len(refs)
    schema = mat.schema()
    fields = {n: t for n, t in zip(schema.names, schema.types)}
    out_fields = dict(fields, **{cum_col: pa.int64()})
    if B == 0:
        return ds_from_refs([], count=0, **out_fields), 0

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    P = num_partitions or max(4, min(2 * cpus, B))

    def _sortable(tbl: pa.Table, col_idx: int) -> np.ndarray:
        """Column as a float key with sign flipped for descending order —
        lexsort is ascending-only, so descending keys negate."""
        a = tbl.column(keys[col_idx]).to_numpy(zero_copy_only=False).astype(np.float64)
        return -a if desc[col_idx] else a

    @ray.remote(num_returns=2)
    def sample_block(tbl: pa.Table):
        n = tbl.num_rows
        tot = int(
            np.sum(tbl.column(value_col).to_numpy(zero_copy_only=False), dtype=np.int64)
        )
        take = min(32, n)
        idx = np.linspace(0, n - 1, take).astype(np.int64)
        samp = np.stack([_sortable(tbl, i)[idx] for i in range(len(keys))], axis=1)
        return samp, tot

    samp_outs = [sample_block.remote(r) for r in refs]
    samples = np.concatenate(ray.get([o[0] for o in samp_outs]))
    totals = ray.get([o[1] for o in samp_outs])
    grand_total = int(sum(totals))
    # splitters on the primary key only (secondary keys just break ties
    # within a partition; a tie-straddling boundary only unbalances, never
    # mis-orders, because partition p holds [split_{p-1}, split_p) of key0
    # and the reduce sorts the full key tuple locally) — EXCEPT exact
    # key0 ties across the boundary would split a run. Close that by
    # routing on key0 strictly: rows with equal key0 share a partition
    # (searchsorted side="left" on unique splitter values).
    k0 = np.sort(samples[:, 0])
    q = np.linspace(0, len(k0) - 1, P + 1).astype(np.int64)[1:-1]
    splitters = np.unique(k0[q])
    P_eff = len(splitters) + 1

    @ray.remote
    def split_block(tbl: pa.Table):
        key0 = _sortable(tbl, 0)
        part = np.searchsorted(splitters, key0, side="right")
        order = np.argsort(part.astype(np.uint16), kind="stable")
        counts = np.bincount(part, minlength=P_eff)
        bounds = np.r_[0, np.cumsum(counts)]
        t = tbl.take(pa.array(order))
        return tuple(t.slice(bounds[p], counts[p]) for p in range(P_eff))

    outs = [split_block.options(num_returns=P_eff).remote(r) for r in refs]
    if P_eff == 1:
        outs = [[o] for o in outs]

    @ray.remote(num_returns=3)
    def reduce_sort_cum(*parts):
        live = [p for p in parts if p.num_rows]
        if not live:
            empty = pa.table(
                {
                    **{n: pa.array([], type=fields[n]) for n in fields},
                    cum_col: pa.array([], type=pa.int64()),
                }
            )
            return empty, 0, 0
        t = pa.concat_tables(live).combine_chunks()
        sort_keys = [
            (
                -t.column(k).to_numpy(zero_copy_only=False).astype(np.float64)
                if d
                else t.column(k).to_numpy(zero_copy_only=False).astype(np.float64)
            )
            for k, d in zip(keys, desc)
        ]
        order = np.lexsort(tuple(reversed(sort_keys)))
        t = t.take(pa.array(order))
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(v)
        t = t.append_column(cum_col, pa.array(cum, type=pa.int64()))
        return t, int(cum[-1]) if len(cum) else 0, t.num_rows

    red = [
        reduce_sort_cum.remote(*[outs[b][p] for b in range(B)])
        for p in range(P_eff)
    ]
    part_tots = ray.get([r[1] for r in red])
    n_rows = ray.get([r[2] for r in red])
    offsets = np.r_[0, np.cumsum(part_tots)][:-1]

    @ray.remote
    def add_offset(tbl: pa.Table, off: int):
        if tbl.num_rows == 0 or off == 0:
            return tbl
        cum = tbl.column(cum_col).to_numpy(zero_copy_only=False) + np.int64(off)
        i = tbl.schema.get_field_index(cum_col)
        return tbl.set_column(i, cum_col, pa.array(cum, type=pa.int64()))

    final = [
        add_offset.remote(r[0], int(o))
        for r, o, n in zip(red, offsets, n_rows)
        if n
    ]
    count = int(sum(n_rows))
    return ds_from_refs(final, count=count, **out_fields), grand_total
