"""Unit tests for embedding ops, multimodal stubs, spectrum fit, text fns."""

import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.functions.multimodal import BinaryFeatureExtractor
from dedup_ray.functions.simhash import simhash_text
from dedup_ray.functions.text import fingerprint_batch, quality_batch
from dedup_ray.stages.spectrum import fit_bimodal, gauss, homozygous_bounds


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "the quick brown fox jumps over the lazy cat again and again ok"
    c = "completely different content with nothing shared at all zzz qqq"
    ha, hb, hc = (simhash_text(t, 5) for t in (a, b, c))
    d_ab = bin(ha ^ hb).count("1")
    d_ac = bin(ha ^ hc).count("1")
    assert d_ab < d_ac
    assert simhash_text(a, 5) == ha  # deterministic


def test_simhash_empty():
    assert simhash_text("", 5) == 0


def test_fingerprint_identical_and_shifted():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "shared winnowing fingerprint content block here",
                    "shared winnowing fingerprint content block here",
                    "totally different text with other words inside",
                ]
            ),
        }
    )
    out = fingerprint_batch(t, k=8, window=4)
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_quality_batch():
    t = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["Hello world, THIS is a test!"]),
        }
    )
    out = quality_batch(t)
    r = out.to_pylist()[0]
    assert r["n_chars"] == 28
    assert r["n_tokens"] == 6
    assert r["n_punct"] == 2
    assert r["n_upper"] == 5  # H + T,H,I,S


def test_multimodal_fake_decoder_deterministic():
    ex = BinaryFeatureExtractor(dim=8, decoder="fake")
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array([b"abc", b"abc"], type=pa.large_binary()),
        }
    )
    out = ex(t)
    f = out.column("features").to_pylist()
    assert f[0] == f[1] and len(f[0]) == 8
    assert out.column("n_bytes").to_pylist() == [3, 3]


def test_multimodal_strict_decoder_rejects_unknown_magic():
    # strict now REALLY decodes PPM/BMP/WAV (test_multimodal_decode.py);
    # unknown container magic is still a hard error (external-codec slot)
    ex = BinaryFeatureExtractor(dim=8, decoder="strict")
    t = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([b"x...unknown..."], type=pa.large_binary()),
        }
    )
    with pytest.raises(ValueError, match="unknown payload magic"):
        ex(t)


def test_spectrum_bimodal_fit():
    x = np.arange(100, dtype=np.float64)
    hist = 5.0 * gauss(x, 25, 4) + 2.0 * gauss(x, 60, 8)
    fit = fit_bimodal(hist)
    assert abs(fit["mu1"] - 25) <= 2
    assert abs(fit["mu2"] - 60) <= 3


def test_spectrum_bounds():
    x = np.arange(120, dtype=np.float64)
    hist = (1000 * gauss(x, 30, 5) + 400 * gauss(x, 70, 9)).astype(np.float64)
    lower, upper = homozygous_bounds(hist, min_depth=10, max_depth=119)
    assert 30 < lower < 70          # minimum between the peaks
    assert upper >= 2 * 70          # 2*mu2 + 2*sigma2


def test_embed_cosine_pairs(ray_session):
    import ray.data as rd

    from dedup_ray.functions.embed import cosine_dup_pairs

    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 8))
    base[5] = base[3] + 0.01 * rng.normal(size=8)  # planted near-dup
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(20), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in base], type=pa.list_(pa.float32())),
        }
    )
    out = cosine_dup_pairs(rd.from_arrow(t), threshold=0.99)
    pairs = {(r["vec_a"], r["vec_b"]) for r in out.take_all()}
    assert (3, 5) in pairs


def test_embed_ivf_topk(ray_session):
    import ray.data as rd

    from dedup_ray.functions.embed import ivf_topk

    rng = np.random.default_rng(1)
    m = rng.normal(size=(200, 16))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
        }
    )
    out = ivf_topk(rd.from_arrow(t), n_queries=5, k=3, n_centroids=8, n_probe=8)
    rows = out.to_pylist()
    assert rows
    # n_probe == n_centroids -> exhaustive -> equals brute force top-1
    m64 = m / np.linalg.norm(m, axis=1, keepdims=True)
    got_top1 = {r["query_id"]: r["neighbor_id"] for r in rows if r["rnk"] == 1}
    for q in range(5):
        sims = m64 @ m64[q]
        sims[q] = -np.inf
        assert got_top1[q] == int(np.argmax(sims))


def test_bpe_token_count_matches_re_findall():
    """The vectorised run-head count must equal len(re.findall(pattern)) —
    the pattern's alternatives are disjoint classes, so maximal runs are
    single matches; pinned on edge strings (empty docs, class boundaries at
    doc starts, non-ASCII letters and unicode whitespace as 'other')."""
    import random
    import re

    from dedup_ray.functions.text import BPE_TOKEN_PATTERN, bpe_token_count_batch

    pat = re.compile(BPE_TOKEN_PATTERN)
    rng = random.Random(9)
    texts = [
        "", "a", " ", "\t\n\f\r ", "abc123!?x", "héllo wörld 42",
        "a b",  # unicode nbsp: 'other' in all three engines
        "a" * 50 + "9" * 3 + "...", "9abc", "abc9",
    ]
    texts += [
        "".join(rng.choice("ab1 .\tZé") for _ in range(rng.randrange(0, 60)))
        for _ in range(100)
    ]
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = bpe_token_count_batch(b).column("n_bpe_tokens").to_pylist()
    assert got == [len(pat.findall(t)) for t in texts]


def test_kmv_sketch_merge_and_accuracy():
    """Bottom-k partial merge must equal the whole-set bottom-k, and the
    estimator must land within 5 sigma (~5/sqrt(k)) of the true cardinality;
    a sketch that never filled returns the exact count."""
    import numpy as np

    from dedup_ray.functions.sketch import (
        block_bottom_k,
        bottom_k_merge,
        kmv_estimate,
    )
    from dedup_ray.hashing import splitmix64

    k = 128
    n_true = 20_000
    hv = splitmix64(np.arange(1, n_true + 1, dtype=np.uint64)) >> np.uint64(1)
    # split into odd-sized "blocks" with duplicates across blocks
    parts = [
        block_bottom_k(hv[: n_true // 2], k),
        block_bottom_k(hv[n_true // 3 :], k),
        block_bottom_k(hv[::7], k),
    ]
    merged = bottom_k_merge(parts, k)
    whole = block_bottom_k(hv, k)
    assert (merged == whole).all()
    k_used, kth, est = kmv_estimate(merged, k, hash_bits=63)
    assert k_used == k and kth == int(whole[k - 1])
    sigma = n_true / np.sqrt(k)
    assert abs(est - n_true) < 5 * sigma
    # small-set branch: fewer distinct values than k -> exact
    small = block_bottom_k(hv[:50], k)
    k_used, _, est = kmv_estimate(small, k, hash_bits=63)
    assert k_used == 50 and est == 50.0


def test_misra_gries_recall_guarantee():
    """With vocab >> m the summaries actually reduce; every key with true
    count >= N/(m+1) must survive the block-partial + merge pipeline, and
    surviving counters never overcount."""
    import numpy as np

    from dedup_ray.functions.sketch import mg_from_counts, mg_merge

    rng = np.random.default_rng(7)
    # zipf-ish stream: few heavy keys + a long tail, vocab ~ 3000 >> m = 64
    heavy = np.repeat([f"h{i}" for i in range(8)], 500)
    tail = np.array([f"t{i}" for i in rng.integers(0, 3000, size=4000)])
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    n = len(stream)
    m = 64
    # split into ragged blocks, build per-block exact->MG partials
    parts = []
    for blk in np.array_split(stream, 13):
        uk, cnt = np.unique(blk.astype(object), return_counts=True)
        parts.append(mg_from_counts(uk, cnt.astype(np.int64), m))
    keys, cnts = mg_merge(parts, m)
    assert len(keys) <= m
    exact = {k: c for k, c in zip(*np.unique(stream.astype(object), return_counts=True))}
    guarantee = n / (m + 1)
    surv = dict(zip(keys.tolist(), cnts.tolist()))
    for k, c in exact.items():
        if c >= guarantee:
            assert k in surv, f"heavy key {k} (count {c}) lost"
    for k, c in surv.items():
        assert c <= exact[k], f"{k} overcounted: {c} > {exact[k]}"
        assert exact[k] - c <= guarantee + 1e-9


def test_kmeans_offset_vec_ids_seed_k_clusters(ray_session):
    # ADVICE r3: seeding must find k seeds even when vec_ids are sparse /
    # offset (e.g. a filtered embedding subset) — `vec_id < k` finds none here.
    import ray.data as rd

    from dedup_ray.functions.embed import kmeans_assign

    rng = np.random.default_rng(7)
    k = 4
    # 4 well-separated blobs, ids offset to 10_000+ and strided by 7
    centers = rng.normal(scale=20.0, size=(k, 6))
    # interleave blobs (row i belongs to blob i % k) so the k smallest ids
    # seed one centroid per blob
    blob_of = np.arange(25 * k) % k
    vecs = centers[blob_of] + rng.normal(scale=0.1, size=(25 * k, 6))
    ids = 10_000 + 7 * np.arange(len(vecs), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in vecs], type=pa.list_(pa.float32())),
        }
    )
    out = kmeans_assign(rd.from_arrow(t).repartition(4), k=k, iters=4).take_all()
    assert len(out) == len(vecs)
    labels = {r["vec_id"]: r["cluster"] for r in out}
    # all k clusters are used (the old vec_id<k seeding would collapse to 0 seeds
    # and fall back to a driver take_all; worse, on multi-block sparse ids it
    # under-seeded) and each blob is internally consistent
    assert len(set(labels.values())) == k
    for blob in range(k):
        blob_ids = ids[blob_of == blob]
        assert len({labels[i] for i in blob_ids}) == 1


def test_simhash_slab_boundary_parity(monkeypatch):
    # slab-bounded batch path must equal the per-doc reference even when docs
    # straddle slab boundaries (force tiny slabs)
    import dedup_ray.functions.simhash as sh

    monkeypatch.setattr(sh, "_SIMHASH_SLAB", 7)
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b",
        "",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "x" * 3,
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = sh.simhash_batch(t, k=5)
    got = out.column("simhash").to_pylist()
    want = [sh.simhash_text(s, 5) for s in texts]
    assert got == want
