"""Unit tests for the round-3 curation operators: Gopher-style repetition
stats (doc-local, no shuffle) and the decontamination semi-join
(semi_join_by_key: sorted-bucket flag propagation with block-edge heal)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_repetition(doc_id, text, n_chars):
    """Reference implementation: dict-of-counts per doc."""
    w = text.split(" ")
    if len(w) < 2:
        return None
    grams = [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]
    from collections import Counter

    c = Counter(grams)
    top = min((g for g in c if c[g] == max(c.values())))
    dup = sum(c[g] * len(g) for g in c if c[g] >= 2)
    return {
        "doc_id": doc_id,
        "top_bigram": top,
        "top_bigram_count": max(c.values()),
        "top_bigram_frac": float(c[top] * len(top)) / n_chars,
        "dup_bigram_frac": float(dup) / n_chars,
    }


ADVERSARIAL_DOCS = [
    "a",                              # single word: no bigram, excluded
    "a a",                            # one bigram
    "a a a a a a",                    # all-identical bigrams
    "x y x y x y x",                  # alternating: 'x y' vs 'y x' tie counts
    "b a b a a b",                    # tie between distinct grams -> lexicographic
    "一二 一二 三",  # CJK words, codepoint lengths
    "word " * 30 + "end",             # long repeated run
    "u v w x y z",                    # all unique bigrams (cnt=1 everywhere)
]


def test_repetition_stats_matches_brute(ray_session):
    from dedup_ray.functions.text import repetition_stats_batch

    texts = ADVERSARIAL_DOCS
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    got = repetition_stats_batch(batch).to_pylist()
    want = [
        r
        for i, t in enumerate(texts)
        if (r := _brute_repetition(i, t, len(t))) is not None
    ]
    assert got == want


def test_repetition_stats_empty_batch(ray_session):
    from dedup_ray.functions.text import repetition_stats_batch

    batch = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    out = repetition_stats_batch(batch)
    assert out.num_rows == 0
    assert out.column_names == [
        "doc_id", "top_bigram", "top_bigram_count", "top_bigram_frac",
        "dup_bigram_frac",
    ]


def _brute_semi(keys, ids, flags):
    by_key = {}
    for k, i, f in zip(keys, ids, flags):
        by_key.setdefault(k, []).append((i, f))
    out = []
    for k, rows in by_key.items():
        if any(f for _, f in rows):
            out.extend(i for i, f in rows if not f)
    return sorted(out)


@pytest.mark.parametrize("n_blocks", [1, 16])
def test_semi_join_by_key_matches_brute(ray_session, n_blocks):
    """Many rows per key across many blocks: the sorted-bucket scan plus the
    block-edge heal must together reproduce the exact semi-join, including
    keys whose bucket straddles a block boundary."""
    import ray.data as rd

    from dedup_ray.stages.bucketjoin import semi_join_by_key

    rng = np.random.RandomState(7)
    n = 4000
    keys = [f"k{rng.randint(0, 120):03d}" for _ in range(n)]
    ids = rng.randint(0, 10_000, size=n)
    flags = rng.rand(n) < 0.05
    # distinct (key, id, flag) rows — a doc is train or eval, never both
    seen, rows = set(), []
    for k, i, f in zip(keys, ids, flags):
        sig = (k, int(i))
        if sig in seen:
            continue
        seen.add(sig)
        rows.append((k, int(i), bool(f)))
    t = pa.table(
        {
            "g": pa.array([r[0] for r in rows], type=pa.string()),
            "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ev": pa.array([r[2] for r in rows], type=pa.bool_()),
        }
    )
    ds = rd.from_arrow(t).repartition(n_blocks)
    got = sorted(
        semi_join_by_key(ds, "g", "doc_id", "ev").to_pandas()["id"].tolist()
    )
    want = _brute_semi(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
    )
    assert got == want


def test_semi_join_by_key_no_flags(ray_session):
    import ray.data as rd

    from dedup_ray.stages.bucketjoin import semi_join_by_key

    t = pa.table(
        {
            "g": pa.array(["a", "a", "b"], type=pa.string()),
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "ev": pa.array([False, False, False]),
        }
    )
    out = semi_join_by_key(rd.from_arrow(t), "g", "doc_id", "ev")
    assert out.count() == 0
