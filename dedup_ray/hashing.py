"""Vectorized shingle hashing.

The reference tokenises documents into fixed-length character k-mers and
counts them with external KMC databases (``/root/reference/dedup/
kmer_utilities.py:89-120``).  We never materialise shingle strings: each
k-character window is hashed to a ``uint64`` with a polynomial rolling hash
(mod 2^64) followed by a splitmix64 finalizer, all numpy-vectorized.

Character (not byte) positions: text is decoded to one uint32 codepoint per
character (UTF-32LE) so shingle positions index directly into Python string
slices — required for the trim stage's character-interval semantics
(``contig.py:134-191`` analogue).
"""

from __future__ import annotations

import numpy as np

_BASE = np.uint64(0x100000001B3)          # odd => invertible mod 2^64 (FNV prime)
_BASE_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))

# All emitted hash values are masked to 63 bits and carried as int64: Ray
# Data's sort-based aggregates round-trip group keys/values through Python
# ints + pyarrow inference, which breaks on uint64 above int64-max; a 63-bit
# space keeps ordering identical between numpy and Arrow and costs nothing
# for MinHash/dedup quality.
MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def to_i63(x: np.ndarray) -> np.ndarray:
    """uint64 -> masked 63-bit int64 (the engine's wire format for hashes)."""
    return (x & MASK63).astype(np.int64)

# Growing power caches, one per process (cheap; rebuilt lazily).
_POW = np.ones(1, dtype=np.uint64)
_POW_INV = np.ones(1, dtype=np.uint64)


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    global _POW, _POW_INV
    if len(_POW) < n:
        m = max(n, 2 * len(_POW))
        pw = np.empty(m, dtype=np.uint64)
        pwi = np.empty(m, dtype=np.uint64)
        pw[0] = 1
        pwi[0] = 1
        with np.errstate(over="ignore"):
            for i in range(1, m):   # one-time per process; amortised
                pw[i] = pw[i - 1] * _BASE
                pwi[i] = pwi[i - 1] * _BASE_INV
        _POW, _POW_INV = pw, pwi
    return _POW, _POW_INV


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Standard splitmix64 finalizer (public domain constants)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def codepoints(text: str) -> np.ndarray:
    """One uint32 per character (so indices == Python string indices)."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """63-bit int64 hash per k-character window; length max(0, len(text)-k+1).

    Position ``i`` hashes ``text[i:i+k]`` — the analogue of a k-mer starting
    at position ``i`` (``kmer_utilities.py:89-120`` semantics, no external DB).
    """
    cp = codepoints(text).astype(np.uint64)
    n = len(cp)
    if n < k:
        return np.empty(0, dtype=np.int64)
    pw, pwi = _powers(n + 1)
    with np.errstate(over="ignore"):
        # S[i] = sum_{j<=i} c[j] * BASE^(n-1-j)  (mod 2^64)
        contrib = cp * pw[n - 1 :: -1][:n]
        s = np.cumsum(contrib, dtype=np.uint64)
        w = s[k - 1 :].copy()
        w[1:] -= s[: n - k]
        # canonical window hash h_i = W_i * BASE^-(n-k-i)
        h = w * pwi[n - k :: -1][: n - k + 1]
        return to_i63(splitmix64(h))


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """63-bit int64 hash per word n-gram (split on single space — the same
    tokenisation DuckDB's ``string_split(text, ' ')`` performs, which keeps
    the word-tokenizer pipeline config DuckDB-oracle-checkable).

    Position ``i`` hashes tokens ``w[i:i+n]`` joined as one gram.  Per-token
    blake2b + vectorised order-sensitive combine over the n-gram windows.
    """
    w = text.split(" ")
    if len(w) < n:
        return np.empty(0, dtype=np.int64)
    wh = hash_u64(w)
    m = len(w) - n + 1
    acc = wh[:m]
    for j in range(1, n):
        acc = combine_u64(acc, wh[j : j + m])
    return acc


def hash_u64(values) -> np.ndarray:
    """Deterministic strong 63-bit int64 hash of strings/bytes (url ids).

    blake2b 8-byte digests masked to 63 bits: collision probability at 10^12
    keys ~ 5e-5 over the whole corpus — acceptable for doc ids; content
    hashes for exact dedup use :func:`hash_hex128` (blake2b-16) instead.
    """
    from hashlib import blake2b

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v.encode() if isinstance(v, str) else bytes(v)
        out[i] = int.from_bytes(blake2b(b, digest_size=8).digest(), "little")
    return to_i63(out)


def hash_hex128(values) -> list[str]:
    """blake2b-16 hex digests (exact-dedup content keys; collision-safe)."""
    from hashlib import blake2b

    return [
        blake2b(v.encode() if isinstance(v, str) else bytes(v), digest_size=16).hexdigest()
        for v in values
    ]


def combine_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hash-combine two int64/uint64 arrays (order-sensitive) -> 63-bit int64."""
    au = a.astype(np.uint64, copy=False)
    bu = b.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        return to_i63(splitmix64(au * np.uint64(0xC2B2AE3D27D4EB4F) + splitmix64(bu)))
