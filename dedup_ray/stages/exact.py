"""E5 — exact full-document dedup (fast path before MinHash).

Reference semantics: identical docs have containment 1.0 => candidate pair =>
tie on percent-duplicated => the *second* of the canonically-ordered pair is
fully removed (``/root/reference/dedup/dedup.py:244-255`` tie branch +
``:265-269`` full-removal).  Keeping the lexicographically-smallest url per
content hash reproduces exactly that survivor set without ever shipping the
duplicates through shingling/LSH.

Physical form: ONE distributed sort of the corpus by (text_hash, url) —
within a sorted block the first row of each text_hash group is the winner —
in ONE Dataset execution.  Boundary healing (only the first/last hash of a
block can span blocks) and the survivor/edge splits run as raw Ray tasks over
the materialised sorted blocks (util.map_blocks), so no further executor
spin-ups.  The winner scan is vectorised (group starts via shifted-compare +
np.repeat), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..config import DedupConfig


def _annotate(batch: pa.Table) -> pa.Table:
    """One sorted block: winner url per row (block-local first url of its
    text_hash group) + boundary flag for rows of the block's first/last hash."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("_winner", pa.array([], type=pa.string())) \
                    .append_column("_boundary", pa.array([], type=pa.bool_()))
    h = batch.column("text_hash")
    if h.num_chunks != 1:
        h = h.combine_chunks()
    else:
        h = h.chunk(0)
    neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, neq])
    sizes = np.r_[starts[1:], n] - starts
    urls = batch.column("url").to_numpy(zero_copy_only=False)
    winner = np.repeat(urls[starts], sizes)
    first, last = h[0], h[n - 1]
    boundary = pc.or_(pc.equal(h, first), pc.equal(h, last))
    return batch.append_column("_winner", pa.array(winner, type=pa.string())) \
                .append_column("_boundary", boundary)


def exact_dedup(docs: Dataset, cfg: DedupConfig) -> tuple[Dataset, Dataset]:
    """Returns (survivors, exact_edges) — both materialised ref-datasets built
    from one sorted pass + one raw-task round.

    survivors: doc schema, one per distinct text (the min-url member).
    exact_edges: (uid, url, winner_url, winner_uid) for every removed doc.
    """
    import ray

    from ..hashing import hash_u64
    from ..util import ds_from_refs, fast_count, map_blocks

    schema = docs.schema(fetch_if_missing=True)
    edge_fields = dict(
        uid=pa.int64(), url=pa.string(), winner_url=pa.string(), winner_uid=pa.int64()
    )
    if schema is None or fast_count(docs) == 0:
        return docs, ds_from_refs([], count=0, **edge_fields)

    part = docs.sort(["text_hash", "url"]).map_batches(
        _annotate, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    # boundary keys: global winner per spanning text_hash, tiny driver merge
    def boundary_fn(b: pa.Table) -> pa.Table:
        return b.filter(b.column("_boundary")).select(["text_hash", "url"])

    bnd = ray.get(map_blocks(boundary_fn, part))
    fix: dict[str, str] = {}
    for t in bnd:
        for th, u in zip(
            t.column("text_hash").to_pylist(), t.column("url").to_pylist()
        ):
            if th not in fix or u < fix[th]:
                fix[th] = u

    doc_cols = list(schema.names)

    def split_fn(batch: pa.Table):
        """(survivors_block, edges_block, n_surv, n_edges) per sorted block."""
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        winner = batch.column("_winner").to_numpy(zero_copy_only=False)
        bmask = batch.column("_boundary").to_numpy(zero_copy_only=False)
        if bmask.any():
            hashes = batch.column("text_hash").to_numpy(zero_copy_only=False)
            winner = winner.copy()
            for i in np.flatnonzero(bmask):
                winner[i] = fix.get(hashes[i], winner[i])
        keep = urls == winner
        surv = batch.filter(pa.array(keep)).select(doc_cols)
        lose = batch.filter(pa.array(~keep))
        lose_w = winner[~keep]
        edges = pa.table(
            {
                "uid": lose.column("uid"),
                "url": lose.column("url"),
                "winner_url": pa.array(lose_w, type=pa.string()),
                "winner_uid": pa.array(hash_u64(list(lose_w)), type=pa.int64()),
            }
        )
        return surv, edges, surv.num_rows, edges.num_rows

    outs = map_blocks(split_fn, part, num_returns=4)
    n_surv = ray.get([o[2] for o in outs])
    n_edge = ray.get([o[3] for o in outs])
    surv_refs = [o[0] for o, c in zip(outs, n_surv) if c]
    edge_refs = [o[1] for o, c in zip(outs, n_edge) if c]
    doc_fields = dict(zip(schema.names, schema.types))
    survivors = ds_from_refs(surv_refs, count=int(sum(n_surv)), **doc_fields)
    exact_edges = ds_from_refs(edge_refs, count=int(sum(n_edge)), **edge_fields)
    return survivors, exact_edges
