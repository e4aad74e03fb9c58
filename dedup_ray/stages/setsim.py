"""Prefix-filter set-similarity join support (AllPairs / SSJoin family:
Bayardo, Ma & Srikant, WWW 2007; Chaudhuri, Ganti & Kaushik, ICDE 2006).

The classic lossless candidate filter for a Jaccard-threshold join: order
each record's tokens by ascending global document frequency (rarest first,
token string as tie-break) and keep only the first ``n - ceil(t*n) + 1``
tokens (the *prefix*).  Two sets with Jaccard >= t MUST share a prefix
token, so joining on prefix tokens alone loses nothing — while hot tokens
(the reason a naive token join explodes on web text) are pushed to the END
of every ordering and almost never enter a prefix.

This is the deterministic sibling of the MinHash-LSH candidate stage
(stages/lsh.py): same role as the reference's kmer-band pre-filter
(/root/reference/dedup/dedup.py:333-345), but with recall exactly 1.0.

Physical shape (no driver state beyond O(blocks) boundary rows):
one ``annotate_bucket_size`` sorted exchange attaches each row's global
token df (the doc's token count ``_n`` is computed block-locally at
tokenisation time — every doc's text is a single row, so its distinct-token
count never crosses a block), ONE global sort by (doc_id, df, tok) puts
every doc's tokens in prefix order, and a per-block vectorised rank keeps
the prefix rows; docs split across block boundaries are healed on the
driver (<= 2 docs per block ship their rows — same contract and caveat as
the windowed rank operator in pipelines/queries.q_events_rank).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

__all__ = ["prefix_rows"]


def _keep_prefix(
    doc: np.ndarray, plen: np.ndarray
) -> np.ndarray:
    """Boolean keep-mask for rows already sorted by (doc, df, tok): True for
    each doc's first ``plen`` rows (plen is per-row, constant within a doc).
    """
    if len(doc) == 0:
        return np.zeros(0, dtype=bool)
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    base = np.repeat(starts, np.diff(np.r_[starts, len(doc)]))
    rank = np.arange(len(doc), dtype=np.int64) - base + 1
    return rank <= plen


def prefix_rows(toks: Dataset, threshold: float) -> Dataset:
    """Distinct (doc_id, tok) rows -> the (doc_id, tok) PREFIX rows for a
    Jaccard threshold: per doc, the ``n - ceil(threshold*n) + 1`` tokens
    with the smallest (global df, tok) order.

    If ``toks`` already carries a per-doc distinct-token count column
    ``_n`` (producers that tokenise whole docs can compute it block-locally
    for free), the second sorted exchange is skipped entirely; otherwise it
    is attached here with ``annotate_bucket_size``.

    ``ceil`` is evaluated as ``np.ceil(threshold * n)`` in float64 — mirror
    it in SQL as ``CEIL(threshold::DOUBLE * n)`` so both sides round the
    same boundary cases.
    """
    import ray

    from ..util import ds_from_refs, split_boundary
    from .bucketjoin import annotate_bucket_size

    marked = annotate_bucket_size(toks, "tok", out_col="_df")
    if "_n" not in toks.schema().names:
        marked = annotate_bucket_size(marked, "doc_id", out_col="_n")
    s = marked.sort(["doc_id", "_df", "tok"])

    fields = dict(doc_id=pa.int64(), tok=pa.string())

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "tok": pa.array([], type=pa.string()),
                "_df": pa.array([], type=pa.int64()),
                "_n": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        bnd = (doc == doc[0]) | (doc == doc[-1])
        plen = (n - np.ceil(threshold * n) + 1).astype(np.int64)
        keep = _keep_prefix(doc, plen) & ~bnd
        sel = batch.filter(pa.array(keep | bnd))
        sel_bnd = bnd[keep | bnd]
        return pa.table(
            {
                "doc_id": sel.column("doc_id"),
                "tok": sel.column("tok"),
                "_df": sel.column("_df"),
                "_n": sel.column("_n"),
                "_boundary": pa.array(sel_bnd),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    drop_aux = ray.remote(lambda t: t.select(["doc_id", "tok"]))
    int_refs = [drop_aux.remote(r) for r in int_refs]
    extra = 0
    if boundary is not None and boundary.num_rows:
        # driver heal: O(blocks) docs; rows sorted by (doc, df, tok) via
        # Arrow (numpy lexsort cannot order the string column)
        order = pa.compute.sort_indices(
            boundary,
            sort_keys=[("doc_id", "ascending"), ("_df", "ascending"), ("tok", "ascending")],
        )
        b = boundary.take(order)
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        n = b.column("_n").to_numpy(zero_copy_only=False)
        plen = (n - np.ceil(threshold * n) + 1).astype(np.int64)
        keep = _keep_prefix(doc, plen)
        healed = b.filter(pa.array(keep)).select(["doc_id", "tok"])
        if healed.num_rows:
            int_refs.append(ray.put(healed))
            extra = healed.num_rows
    return ds_from_refs(int_refs, count=n_int + extra, **fields)
