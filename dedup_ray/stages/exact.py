"""E5 — exact full-document dedup (fast path before MinHash).

Reference semantics: identical docs have containment 1.0 => candidate pair =>
tie on percent-duplicated => the *second* of the canonically-ordered pair is
fully removed (``/root/reference/dedup/dedup.py:244-255`` tie branch +
``:265-269`` full-removal).  Keeping the lexicographically-smallest url per
content hash reproduces exactly that survivor set without ever shipping the
duplicates through shingling/LSH.

Physical form: ONE distributed sort of the corpus by (text_hash, url) —
within a sorted block the first row of each text_hash group is the winner —
plus the standard boundary-key heal (only the first/last hash of each block
can span blocks; those rows are resolved in a tiny driver pass).  This is
one shuffle of the corpus in two executions, vs. aggregate+join (two
shuffles + per-join actor pools).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..config import DedupConfig


def exact_dedup(docs: Dataset, cfg: DedupConfig) -> tuple[Dataset, Dataset]:
    """Returns (survivors, exact_edges) — both lazy maps over one
    materialised sorted pass.

    survivors: doc schema, one per distinct text (the min-url member).
    exact_edges: (uid, url, winner_url, winner_uid) for every removed doc.
    """
    schema = docs.schema(fetch_if_missing=True)
    if schema is None or docs.count() == 0:
        import ray.data as rd

        empty_edges = rd.from_arrow(
            pa.table(
                {
                    "uid": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "winner_url": pa.array([], type=pa.string()),
                    "winner_uid": pa.array([], type=pa.int64()),
                }
            )
        )
        return docs, empty_edges

    from ..hashing import hash_u64

    s = docs.sort(["text_hash", "url"])

    def annotate(batch: pa.Table) -> pa.Table:
        # batch = one sorted block; first row per text_hash = block-local
        # winner (sorted by url within hash => min url); groups containing
        # the block's first/last hash are flagged boundary — their true
        # winner may live in an adjacent block.
        n = batch.num_rows
        if n == 0:
            return batch.append_column("_winner", pa.array([], type=pa.string())) \
                        .append_column("_boundary", pa.array([], type=pa.bool_()))
        h = batch.column("text_hash").to_pylist()
        urls = batch.column("url").to_pylist()
        winner = [""] * n
        cur = None
        cur_winner = ""
        for i in range(n):
            if h[i] != cur:
                cur = h[i]
                cur_winner = urls[i]
            winner[i] = cur_winner
        first, last = h[0], h[n - 1]
        boundary = [x == first or x == last for x in h]
        return batch.append_column("_winner", pa.array(winner, type=pa.string())) \
                    .append_column("_boundary", pa.array(boundary))

    part = s.map_batches(
        annotate, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    # boundary keys: resolve the global winner per text_hash on the driver
    boundary = part.map_batches(
        lambda b: b.filter(b.column("_boundary")).select(["text_hash", "url"]),
        batch_format="pyarrow",
    ).take_all()
    fix: dict[str, str] = {}
    for r in boundary:
        th, u = r["text_hash"], r["url"]
        if th not in fix or u < fix[th]:
            fix[th] = u

    doc_cols = list(schema.names)

    def survivors_fn(batch: pa.Table) -> pa.Table:
        h = batch.column("text_hash").to_pylist()
        w = batch.column("_winner").to_pylist()
        urls = batch.column("url").to_pylist()
        keep = [u == fix.get(th, wn) for th, wn, u in zip(h, w, urls)]
        return batch.filter(pa.array(keep)).select(doc_cols)

    def edges_fn(batch: pa.Table) -> pa.Table:
        h = batch.column("text_hash").to_pylist()
        w = batch.column("_winner").to_pylist()
        urls = batch.column("url").to_pylist()
        winners = [fix.get(th, wn) for th, wn in zip(h, w)]
        lose = [u != wn for u, wn in zip(urls, winners)]
        sub = batch.filter(pa.array(lose))
        sub_w = [wn for wn, l in zip(winners, lose) if l]
        return pa.table(
            {
                "uid": sub.column("uid"),
                "url": sub.column("url"),
                "winner_url": pa.array(sub_w, type=pa.string()),
                "winner_uid": pa.array(hash_u64(sub_w), type=pa.int64()),
            }
        )

    survivors = part.map_batches(survivors_fn, batch_format="pyarrow")
    exact_edges = part.map_batches(edges_fn, batch_format="pyarrow")
    return survivors, exact_edges
