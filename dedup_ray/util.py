"""Small shared Ray Data helpers."""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


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
