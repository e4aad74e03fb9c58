"""Small shared Ray Data helpers.

Execution-count discipline: every ``Dataset.materialize()`` / ``count()`` /
``take_all()`` on a lazy dataset spins up a full streaming-executor run
(~0.3-1 s fixed cost even on tiny data) — round-1 measured ~48 of them per
pipeline run, which was the dominant serial share behind the 0.41 scaling
efficiency.  The helpers here let post-processing of an ALREADY MATERIALISED
dataset (boundary healing, splitting, projections, tiny driver merges) run as
plain Ray tasks over the block refs instead of extra Dataset executions:
zero-copy, still distributed, no executor spin-up.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def member_mask(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean mask of ``values`` present in ``sorted_set`` (sorted ascending).
    searchsorted-based: no concat+argsort like np.isin."""
    if len(sorted_set) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.minimum(np.searchsorted(sorted_set, values), len(sorted_set) - 1)
    return sorted_set[idx] == values


def intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED UNIQUE arrays, sorted — binary search of the
    smaller into the larger (np.intersect1d concat+argsorts both)."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return a
    return a[member_mask(a, b)]


def with_schema(ds: Dataset, **fields) -> Dataset:
    """Union a typed zero-row block onto ``ds`` so that a plan which produced
    no blocks still exposes a schema (required by joins/groupbys on possibly
    empty intermediates)."""
    import ray.data as rd

    empty = rd.from_arrow(pa.table({k: pa.array([], type=t) for k, t in fields.items()}))
    return ds.union(empty)


def empty_dataset(**fields) -> Dataset:
    import ray.data as rd

    return rd.from_arrow(pa.table({k: pa.array([], type=t) for k, t in fields.items()}))


def heal(ds: Dataset, **fields) -> Dataset:
    """Materialise and drop zero-row blocks (zero-copy: block refs are reused).

    Ray 2.49's sort-based groupby/union can emit zero-COLUMN empty blocks for
    empty partitions; the hash-shuffle join then fails with
    ``ArrowInvalid: No match ... FieldRef`` when such a block lands alone in a
    join partition.  Healing a materialised dataset before using it as a join
    input removes the poison blocks.  ``fields`` (name=pa type) define the
    schema of the typed empty result when nothing is left.
    """
    import ray.data as rd

    mat = ds.materialize()
    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return empty_dataset(**fields).materialize()
    return rd.from_arrow_refs(refs)


def block_refs(mat) -> list:
    """Non-empty block refs of a MATERIALISED dataset (zero-copy)."""
    return [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows
    ]


def known_count(ds: Dataset) -> int | None:
    """Row count if attached by ds_from_refs / counted before — no execution."""
    return getattr(ds, "_dedup_count", None)


def fast_count(ds: Dataset) -> int:
    n = known_count(ds)
    if n is None:
        n = ds.count()
        try:
            ds._dedup_count = n
        except Exception:
            pass
    return n


def ds_from_refs(refs: list, count: int | None = None, **fields) -> Dataset:
    """Dataset from arrow block refs, typed-empty fallback; attaches the known
    row count so later gates don't need a count() execution."""
    import ray.data as rd

    if not refs:
        out = empty_dataset(**fields).materialize()
        out._dedup_count = 0
        return out
    out = rd.from_arrow_refs(refs)
    if count is not None:
        out._dedup_count = count
    return out


def rebalance_bytes(
    mat, target_bytes: int, count: int | None = None, parallelism_floor: int = 1
) -> Dataset:
    """Re-chunk a materialised dataset to ~``target_bytes`` blocks via raw
    tasks — merging undersized neighbours (like :func:`coalesce`) AND
    splitting oversized blocks, which coalesce cannot do.

    Block size bounds the per-task working set of every downstream stage; on
    hosts where concurrent tasks share limited DRAM bandwidth the effect is
    brutal (measured on this box: the exchange map task runs 6x more rows/s
    at ~12 MB text blocks than at ~44 MB — see BENCH/BASELINE.md round 4).
    On a multi-node cluster the same bound keeps any single task's memory
    footprint independent of corpus size.

    ``parallelism_floor``: aim for at least this many blocks when the data
    is large enough (blocks are never split below ~1 MB to keep per-block
    fixed costs amortised).
    """
    import ray

    infos = [
        (ref, meta.size_bytes or 0)
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows
    ]
    if not infos:
        out = ds_from_refs([], count=0)
        return out
    total = sum(s for _, s in infos)
    n_out = max(1, -(-total // max(target_bytes, 1)))
    # parallelism floor, capped so blocks never shrink below ~1 MB
    n_out = max(n_out, min(parallelism_floor, max(1, total // (1 << 20))))
    per = max(1, total // n_out)

    @ray.remote
    def cat(*tbls):
        return pa.concat_tables(tbls).combine_chunks()

    def split_block(t: pa.Table, k: int):
        n = t.num_rows
        step = -(-n // k)
        return tuple(
            t.slice(i * step, step).combine_chunks() for i in range(k)
        )

    out_refs: list = []
    group: list = []
    gbytes = 0
    for ref, size in infos:
        if size >= 1.5 * per:
            if group:
                out_refs.append(cat.remote(*group) if len(group) > 1 else group[0])
                group, gbytes = [], 0
            k = max(1, round(size / per))
            if k == 1:
                out_refs.append(ref)
            else:
                out_refs.extend(
                    ray.remote(num_returns=k)(split_block).remote(ref, k)
                )
        else:
            group.append(ref)
            gbytes += size
            if gbytes >= per:
                out_refs.append(cat.remote(*group) if len(group) > 1 else group[0])
                group, gbytes = [], 0
    if group:
        out_refs.append(cat.remote(*group) if len(group) > 1 else group[0])
    return ds_from_refs(out_refs, count=count)


def coalesce(mat, target_blocks: int, count: int | None = None) -> Dataset:
    """Merge a materialised dataset's blocks down to ~target_blocks via raw
    concat tasks (no Dataset execution, no shuffle).

    Ray Data reads/maps often leave hundreds of sub-MB blocks; every
    downstream sort then exchanges O(in_blocks x out_partitions) tiny objects
    whose fixed costs dominate and kill scaling.  A handful of multi-MB
    blocks (~2 per CPU) keeps sorts object-bound on real data instead.
    """
    import ray

    refs = block_refs(mat)
    if len(refs) <= max(target_blocks, 1):
        out = ds_from_refs(refs, count=count)
        return out

    @ray.remote
    def cat(*tbls):
        return pa.concat_tables(tbls).combine_chunks()

    groups = [g for g in np.array_split(np.array(refs, dtype=object), target_blocks) if len(g)]
    new_refs = [cat.remote(*g.tolist()) for g in groups]
    return ds_from_refs(new_refs, count=count)


def map_blocks(fn, mat, *, num_returns: int = 1) -> list:
    """Run ``fn`` (a plain function over one pa.Table) on every non-empty
    block of a materialised dataset as raw Ray tasks.  Returns the list of
    per-block result refs (or ref-tuples when num_returns > 1)."""
    import ray

    task = ray.remote(num_returns=num_returns)(fn)
    return [task.remote(r) for r in block_refs(mat)]


def _split_block(block: pa.Table):
    """(interior sans _boundary, boundary rows sans _boundary, n_interior)."""
    import pyarrow.compute as pc

    mask = block.column("_boundary")
    interior = block.filter(pc.invert(mask)).drop_columns(["_boundary"])
    boundary = block.filter(mask).drop_columns(["_boundary"])
    return interior, boundary, interior.num_rows


def split_boundary(mat) -> tuple[list, pa.Table, int]:
    """Split a materialised dataset with a ``_boundary`` flag column into
    (interior block refs, concatenated boundary table, interior row count) —
    one raw-task round, no Dataset executions.  Empty interior blocks are
    dropped; the boundary rows (<= 2 per block by construction) land on the
    driver for the tiny merge pass."""
    import ray

    outs = map_blocks(_split_block, mat, num_returns=3)
    if not outs:
        return [], None, 0
    counts = ray.get([o[2] for o in outs])
    bnd_tables = [t for t in ray.get([o[1] for o in outs]) if t.num_rows]
    int_refs = [o[0] for o, c in zip(outs, counts) if c]
    boundary = pa.concat_tables(bnd_tables) if bnd_tables else None
    return int_refs, boundary, int(sum(counts))
