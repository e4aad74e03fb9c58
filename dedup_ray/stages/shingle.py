"""A1 prep — per-document shingling into (shingle, uid, tf) rows.

Web-text analogue of KMC k-mer counting (``/root/reference/dedup/
kmer_utilities.py:89-120``): each doc's text is hashed into k-char shingle
uint64s; we emit one row per *distinct* shingle per doc with its in-doc
occurrence count ``tf`` (the analogue of a kmer mapping to multiple positions
via bwa, ``kmer_utilities.py:181-226``).  Positions are NOT shipped through
shuffles — they are recomputed locally at annotation time (stages/annotate).

Document frequency df(shingle) = number of distinct docs containing it ==
Sum of per-batch partial distinct-doc counts (each doc lives in exactly one
batch), enabling map-side pre-aggregation before the big groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..hashing import shingle_hashes


def shingle_pairs_batch(batch: pa.Table, *, cfg: DedupConfig) -> pa.Table:
    """docs batch -> (shingle:uint64, uid:uint64, tf:int32) distinct per doc.

    Shingle hashing dispatches on ``cfg.tokenizer`` (char k-grams or word
    n-grams) via :meth:`DedupConfig.shingles`."""
    uids = batch.column("uid").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    sh_parts: list[np.ndarray] = []
    uid_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    for uid, text in zip(uids, texts):
        h = cfg.shingles(text)
        if len(h) == 0:
            continue
        distinct, counts = np.unique(h, return_counts=True)
        sh_parts.append(distinct)
        uid_parts.append(np.full(len(distinct), uid, dtype=np.int64))
        tf_parts.append(counts.astype(np.int32))
    if not sh_parts:
        return pa.table(
            {
                "shingle": pa.array([], type=pa.int64()),
                "uid": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int32()),
            }
        )
    return pa.table(
        {
            "shingle": pa.array(np.concatenate(sh_parts), type=pa.int64()),
            "uid": pa.array(np.concatenate(uid_parts), type=pa.int64()),
            "tf": pa.array(np.concatenate(tf_parts), type=pa.int32()),
        }
    )


def shingle_pairs_local(
    batch: pa.Table, *, cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Block-local posting arrays: (shingle:int64, uidx:int32, tf:int32,
    uid_lut:int64).

    ``uidx`` indexes ``uid_lut`` (one entry per emitting doc of this block)
    instead of carrying the 8-byte uid hash per posting — the exchange ships
    the narrow index plus the tiny lut and reconstructs global uids only for
    the df>=2 survivors (stages/df.shingle_df_classify).  Semantically
    identical to :func:`shingle_pairs_batch` (same rows, same order)."""
    uids = batch.column("uid").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    sh_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    n_per_doc: list[int] = []
    lut: list[int] = []
    for uid, text in zip(uids, texts):
        h = cfg.shingles(text)
        if len(h) == 0:
            continue
        distinct, counts = np.unique(h, return_counts=True)
        sh_parts.append(distinct)
        tf_parts.append(counts.astype(np.int32))
        n_per_doc.append(len(distinct))
        lut.append(uid)
    if not sh_parts:
        e64 = np.empty(0, dtype=np.int64)
        return e64, np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int32), e64
    uidx = np.repeat(
        np.arange(len(lut), dtype=np.int32), np.asarray(n_per_doc, dtype=np.int64)
    )
    return (
        np.concatenate(sh_parts),
        uidx,
        np.concatenate(tf_parts),
        np.asarray(lut, dtype=np.int64),
    )


def df_partials_batch(batch: pa.Table) -> pa.Table:
    """(shingle, uid, tf) batch -> (shingle, n) partial distinct-doc counts.

    Map-side combiner for the DF groupby (SURVEY.md §4.2: pre-aggregate before
    the wide shuffle).  Rows are already distinct per (shingle, uid).
    """
    sh = batch.column("shingle").to_numpy(zero_copy_only=False)
    distinct, counts = np.unique(sh, return_counts=True)
    return pa.table(
        {
            "shingle": pa.array(distinct, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def make_shingle_pairs(docs, cfg: DedupConfig):
    return docs.select_columns(["uid", "text"]).map_batches(
        lambda b: shingle_pairs_batch(b, cfg=cfg),
        batch_format="pyarrow",
        batch_size=cfg.shingle_batch_size,
    )
