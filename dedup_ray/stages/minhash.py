"""T1 — MinHash signatures over each doc's duplicated-shingle set.

Reference: ``datasketch.MinHash`` (128 perms) over ``homo_dup_kmers``
(``/root/reference/dedup/dedup.py:310-316``), computed in a process pool
(``:337-339``).  Here: a two-phase mergeable aggregation that never builds a
per-doc Python object:

  phase 1 (map_batches, actor pool): for each block of classified dup rows
    (uid, shingle, df), compute a PARTIAL signature per uid present in the
    block — sig_p = min over shingles of perm_p(shingle) — vectorized with a
    (rows x num_perm) hash matrix and ``np.minimum.reduceat``.
  phase 2 (groupby(uid)): merge partials with native Min aggregates per
    signature component (MinHash of a union = elementwise min — sketches are
    mergeable, SURVEY.md §4.2), plus Sum of distinct/posting counts.

The permutation family is perm_p(h) = splitmix64(h XOR seed_p) with fixed
seeds — a deterministic pseudo-permutation per component (public construction;
same role as datasketch's (a*h+b) mod prime family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ..config import DedupConfig
from ..hashing import splitmix64, to_i63
from .df import filter_dup_band


def perm_seeds(num_perm: int) -> np.ndarray:
    """Fixed deterministic seeds for the permutation family."""
    return splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


class MinHashPartial:
    """Actor-pool stage: classified dup rows -> per-uid partial signatures.

    State (the seed matrix) is built once per actor (__init__), mirroring the
    reference's reuse of one MinHash permutation set across contigs.
    """

    def __init__(self, num_perm: int, dup_lower: int, dup_upper: int):
        self.seeds = perm_seeds(num_perm)
        self.num_perm = num_perm
        self.lo = dup_lower
        self.hi = dup_upper

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = filter_dup_band(batch, self.lo, self.hi)
        uids = batch.column("uid").to_numpy(zero_copy_only=False)
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        if len(uids) == 0:
            cols = {"uid": pa.array([], type=pa.int64())}
            for p in range(self.num_perm):
                cols[f"s{p:03d}"] = pa.array([], type=pa.int64())
            cols["n_dup_distinct"] = pa.array([], type=pa.int64())
            cols["n_dup_postings"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        order = np.argsort(uids)  # min/sum reduceat: order-invariant
        uids_s = uids[order]
        sh_s = sh[order]
        tf_s = tf[order]
        # group boundaries per uid
        starts = np.flatnonzero(np.r_[True, uids_s[1:] != uids_s[:-1]])
        with np.errstate(over="ignore"):
            m = to_i63(
                splitmix64(sh_s.astype(np.uint64)[:, None] ^ self.seeds[None, :])
            )  # (rows, P) int64
        sigs = np.minimum.reduceat(m, starts, axis=0)  # (groups, P)
        n_distinct = np.diff(np.r_[starts, len(uids_s)])
        n_postings = np.add.reduceat(tf_s.astype(np.int64), starts)
        cols = {"uid": pa.array(uids_s[starts], type=pa.int64())}
        for p in range(self.num_perm):
            cols[f"s{p:03d}"] = pa.array(sigs[:, p], type=pa.int64())
        cols["n_dup_distinct"] = pa.array(n_distinct.astype(np.int64))
        cols["n_dup_postings"] = pa.array(n_postings)
        return pa.table(cols)


def signatures(matched: Dataset, cfg: DedupConfig) -> Dataset:
    """Classified (uid, shingle, tf, df) rows -> one signature row per doc.

    Output: (uid, s000..s127, n_dup_distinct, n_dup_postings).
    """
    partials = matched.map_batches(
        MinHashPartial,
        fn_constructor_kwargs={
            "num_perm": cfg.num_perm,
            "dup_lower": cfg.duplicate_df_lower,
            "dup_upper": cfg.duplicate_df_upper,
        },
        batch_format="pyarrow",
        batch_size=cfg.minhash_batch_size,
        concurrency=(1, 8),
    )
    from .groupagg import sorted_aggregate

    aggs = {f"s{p:03d}": (f"s{p:03d}", "min") for p in range(cfg.num_perm)}
    aggs["n_dup_distinct"] = ("n_dup_distinct", "sum")
    aggs["n_dup_postings"] = ("n_dup_postings", "sum")
    return sorted_aggregate(partials, ["uid"], aggs)
