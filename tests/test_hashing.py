import numpy as np

from dedup_ray.hashing import (
    codepoints,
    combine_u64,
    hash_hex128,
    hash_u64,
    shingle_hashes,
    splitmix64,
    to_i63,
)


def _naive_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Reference implementation: hash each window independently."""
    BASE = 0x100000001B3
    cp = [ord(c) for c in text]
    n = len(cp)
    if n < k:
        return np.empty(0, dtype=np.int64)
    out = []
    for i in range(n - k + 1):
        h = 0
        for c in cp[i : i + k]:
            h = (h * BASE + c) % (1 << 64)
        out.append(h)
    return to_i63(splitmix64(np.array(out, dtype=np.uint64)))


def test_rolling_matches_naive():
    text = "the quick brown fox jumps over the lazy dog repeatedly and often"
    for k in (3, 5, 17):
        got = shingle_hashes(text, k)
        want = _naive_shingle_hashes(text, k)
        assert got.dtype == np.int64
        assert (got >= 0).all()
        np.testing.assert_array_equal(got, want)


def test_rolling_non_ascii_char_positions():
    text = "héllo wörld ünïcode ábc déf ghî"
    got = shingle_hashes(text, 5)
    want = _naive_shingle_hashes(text, 5)
    assert len(got) == len(text) - 4
    np.testing.assert_array_equal(got, want)


def test_equal_windows_equal_hashes():
    text = "abcabcabcabc"
    h = shingle_hashes(text, 3)
    assert h[0] == h[3] == h[6]
    assert h[0] != h[1]


def test_short_text_empty():
    assert len(shingle_hashes("ab", 17)) == 0
    assert len(shingle_hashes("", 3)) == 0


def test_exact_length_one_shingle():
    h = shingle_hashes("abc", 3)
    assert len(h) == 1


def test_codepoints_indexing():
    t = "aéb"
    cp = codepoints(t)
    assert len(cp) == 3
    assert cp[1] == ord("é")


def test_hash_u64_deterministic_distinct():
    a = hash_u64(["https://a.example/1", "https://a.example/2", "https://a.example/1"])
    assert a[0] == a[2]
    assert a[0] != a[1]


def test_hash_hex128():
    h = hash_hex128(["abc", "abd", "abc"])
    assert h[0] == h[2] and h[0] != h[1] and len(h[0]) == 32


def test_combine_u64_order_sensitive():
    a = np.array([1, 2], dtype=np.uint64)
    b = np.array([2, 1], dtype=np.uint64)
    c1 = combine_u64(a, b)
    c2 = combine_u64(b, a)
    assert c1[0] != c2[0]
