"""Mergeable cardinality sketches.

KMV / bottom-k (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07): keep the k
smallest distinct hash values of a set; the k-th smallest order statistic
estimates the cardinality as (k-1) / normalized(h_k).  Bottom-k partials
merge by concat + dedupe + re-truncate, so the distributed plan is per-block
partials (raw tasks) + one tiny driver merge of O(blocks x k) values — never
a shuffle, never O(rows) driver state.  The estimator is exchangeable with
HyperLogLog at the same memory budget; KMV is exact-arithmetic (integer
order statistics + one IEEE division), which lets DuckDB reproduce the
estimate bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bottom_k_merge(parts: list[np.ndarray], k: int) -> np.ndarray:
    """Merge per-block bottom-k partials: concat, dedupe, keep k smallest."""
    if not parts:
        return np.empty(0, dtype=np.uint64)
    allv = np.unique(np.concatenate(parts))
    return allv[:k]


def kmv_estimate(bottom: np.ndarray, k: int, *, hash_bits: int) -> tuple[int, int, float]:
    """(k_used, kth_hash, estimate) from a merged bottom-k array.

    estimate = (k_used - 1) * 2**hash_bits / kth_hash — one IEEE multiply +
    one divide on exact doubles, so any engine computing the same integers
    matches bitwise.  A sketch that never filled (fewer than k distinct
    values) saw the whole set: the estimate is its own exact size (the
    textbook KMV small-set branch)."""
    k_used = min(k, len(bottom))
    if k_used < k:
        return k_used, int(bottom[-1]) if k_used else 0, float(k_used)
    kth = int(bottom[k_used - 1])
    return k_used, kth, (float(k_used - 1) * float(2**hash_bits)) / float(kth)


def block_bottom_k(hashes: np.ndarray, k: int) -> np.ndarray:
    """Per-block partial: k smallest DISTINCT hash values of one block."""
    return np.unique(hashes)[:k]


def mg_from_counts(
    keys: np.ndarray, counts: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce exact (key, count) pairs to a Misra-Gries summary of at most
    ``m`` counters by subtracting the (m+1)-th largest count from every
    counter and dropping non-positives (Misra & Gries 1982; mergeable-
    summaries form per Agarwal et al. PODS'12).  Undercount introduced by
    one reduction <= that (m+1)-th largest value; summed over any merge
    tree the total undercount is <= N/(m+1) for N total occurrences."""
    if len(keys) <= m:
        return keys, counts
    kth = np.partition(counts, len(counts) - m - 1)[len(counts) - m - 1]
    c2 = counts - kth
    keep = c2 > 0
    return keys[keep], c2[keep]


def mg_merge(
    parts: list[tuple[np.ndarray, np.ndarray]], m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge Misra-Gries summaries: sum counters by key, re-reduce to m."""
    if not parts:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    keys = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.bincount(inv, weights=cnts).astype(np.int64)
    return mg_from_counts(uk, summed, m)
