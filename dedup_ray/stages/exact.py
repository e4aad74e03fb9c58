"""E5 — exact full-document dedup (fast path before MinHash).

Reference semantics: identical docs have containment 1.0 => candidate pair =>
tie on percent-duplicated => the *second* of the canonically-ordered pair is
fully removed (``/root/reference/dedup/dedup.py:244-255`` tie branch +
``:265-269`` full-removal).  Keeping the lexicographically-smallest url per
content hash reproduces exactly that survivor set without ever shipping the
duplicates through shingling/LSH.

Implementation is fully vectorized (no per-group Python):
  keepers  = docs.groupby(text_hash).aggregate(Min(url))
  survivors = docs ⋈ keepers where url == keeper_url
  exact_edges = docs ⋈ keepers where url != keeper_url   (loser -> winner)
"""

from __future__ import annotations

import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min

from ..config import DedupConfig


def exact_dedup(docs: Dataset, cfg: DedupConfig) -> tuple[Dataset, Dataset]:
    """Returns (survivors, exact_edges).

    survivors: doc schema, one per distinct text (the min-url member).
    exact_edges: (uid, url, winner_uid, winner_url) for every removed doc.
    """
    schema = docs.schema(fetch_if_missing=True)
    if schema is None or docs.count() == 0:
        # empty corpus: no schema can be inferred downstream — short-circuit
        import pyarrow as pa
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

    # keeper per content hash = min url (vectorized sort-based aggregation;
    # winner uid re-derived later by hashing winner_url since uid:=hash(url))
    import pyarrow as pa

    from .groupagg import sorted_aggregate

    keepers = sorted_aggregate(
        docs.select_columns(["text_hash", "url"]),
        ["text_hash"],
        {"winner_url": ("url", "min")},
        empty_types=dict(text_hash=pa.string(), winner_url=pa.string()),
    )
    doc_cols = docs.schema().names

    # ONE wide join, materialised once; survivors and loser edges are both
    # cheap map passes over it (a second consumer of the lazy join would
    # re-execute the whole shuffle).
    joined = docs.join(
        keepers,
        "inner",
        num_partitions=cfg.join_partitions(),
        on=("text_hash",),
    ).materialize()

    def keep_winners(batch):
        return batch.filter(
            pc.equal(batch.column("url"), batch.column("winner_url"))
        ).select(doc_cols)

    survivors = joined.map_batches(keep_winners, batch_format="pyarrow")

    def losers_to_edges(batch):
        # winner uid = hash of winner url (uid := hash_u64(url) by construction)
        import pyarrow as pa

        from ..hashing import hash_u64

        losers = batch.filter(
            pc.not_equal(batch.column("url"), batch.column("winner_url"))
        )
        return losers.select(["uid", "url", "winner_url"]).append_column(
            "winner_uid",
            pa.array(hash_u64(losers.column("winner_url").to_pylist()), type=pa.int64()),
        )

    exact_edges = joined.map_batches(losers_to_edges, batch_format="pyarrow")
    return survivors, exact_edges
