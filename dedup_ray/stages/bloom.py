"""Sharded Bloom-filter membership for incremental (base-vs-incoming) dedup.

Classic design from public literature: Bloom (1970) bit arrays with
Kirsch-Mitzenmacher (2006) double hashing (k probe positions derived from two
splitmix64-mixed 64-bit hashes), the standard trick used by large-scale
dedup systems to avoid an all-to-all join when most incoming records are new.

The filter is BUILD-side distributed: every input block contributes a local
bitmap as a raw Ray task and the fixed-size bitmaps are OR-merged (bitmap
size depends only on the configured capacity, never on the corpus).  At
multi-node scale the same build shards by ``hash % n_shards`` so each shard's
bitmap stays a few MiB; this module keeps one logical shard and lets callers
shard by partitioning the input (the probe side is embarrassingly parallel
either way).  Bloom answers are one-sided (no false negatives), so callers
must confirm positives exactly — see ``pipelines/curate.py``.
"""

from __future__ import annotations

import numpy as np

from ..hashing import splitmix64

_K = 8  # probes; with 16 bits/key -> fp ~= 6e-4


def bloom_params(n_keys: int) -> int:
    """Bitmap size in bits (power of two, >= 16 bits/key, >= 2^13)."""
    bits = max(16 * max(n_keys, 1), 1 << 13)
    return 1 << int(bits - 1).bit_length()


def _probe_offsets(h: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """K probe bit-positions per key (Kirsch-Mitzenmacher double hashing)."""
    h = h.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h1 = splitmix64(h)
        h2 = splitmix64(h1) | np.uint64(1)
        mask = np.uint64(m_bits - 1)  # m_bits is a power of two
        return [(h1 + np.uint64(j) * h2) & mask for j in range(_K)]


def bloom_bitmap(h: np.ndarray, m_bits: int) -> np.ndarray:
    """uint64-word bitmap with all probe bits of ``h`` set."""
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(h):
        for pos in _probe_offsets(h, m_bits):
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return words


def bloom_contains(words: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Boolean mask: possibly-present (no false negatives)."""
    if not len(h):
        return np.zeros(0, dtype=bool)
    m_bits = len(words) << 6
    hit = np.ones(len(h), dtype=bool)
    one = np.uint64(1)
    for pos in _probe_offsets(h, m_bits):
        bits = words[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= ((bits >> (pos & np.uint64(63))) & one).astype(bool)
    return hit


def build_bloom_distributed(mat_ds, key_fn, m_bits: int) -> np.ndarray:
    """OR-merge per-block bitmaps of ``key_fn(block) -> uint64 keys`` built as
    raw Ray tasks over a MATERIALISED dataset's blocks.  Driver holds only the
    fixed-size merged bitmap (m_bits/8 bytes, independent of row count)."""
    import ray

    from ..util import map_blocks

    def part(block):
        return bloom_bitmap(key_fn(block), m_bits)

    parts = ray.get(map_blocks(part, mat_ds))
    out = np.zeros(m_bits >> 6, dtype=np.uint64)
    for p in parts:
        out |= p
    return out
