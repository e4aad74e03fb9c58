"""Property tests (FIXTURES.md §4/§6): partition-count invariance,
trim idempotence, exact-dup clustering invariants."""

import numpy as np
import pytest

from dedup_ray.config import TEST_CONFIG
from dedup_ray.stages.trim import trim_text


@pytest.fixture(scope="module")
def tiny_pages(small_corpus):
    pages, _ = small_corpus
    return pages.slice(0, 100)


def _verified_pairs(pages, num_blocks):
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    docs = (
        rd.from_arrow(pages)
        .repartition(num_blocks)
        .map_batches(extract_batch, batch_format="pyarrow")
    )
    r = near_dedup_pipeline(docs, TEST_CONFIG, through="verified")
    return {
        (x["url_a"], x["url_b"]) for x in r["verified"].select_columns(["url_a", "url_b"]).take_all()
    }


def test_partition_count_invariance(ray_session, tiny_pages):
    """Identical verified pairs for 1, 4, and 16 input blocks."""
    p1 = _verified_pairs(tiny_pages, 1)
    p4 = _verified_pairs(tiny_pages, 4)
    p16 = _verified_pairs(tiny_pages, 16)
    assert p1 == p4 == p16
    assert p1  # non-degenerate


def test_trim_idempotent():
    """trim(trim(x)) == trim(x) for edge-touching intervals."""
    rng = np.random.default_rng(0)
    E = np.empty(0, dtype=np.int64)
    for _ in range(200):
        n = int(rng.integers(5, 60))
        text = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))
        kind = rng.integers(0, 3)
        if kind == 0:
            iv = [(0, int(rng.integers(1, n + 1)))]
        elif kind == 1:
            iv = [(int(rng.integers(0, n)), n)]
        else:
            iv = [(0, int(rng.integers(1, n))), (int(rng.integers(1, n)), n)]
        kept, _ = trim_text(text, iv, E, E, 0)
        kept2, _ = trim_text(kept, [], E, E, 0)
        assert kept2 == kept


def test_trim_never_grows():
    E = np.empty(0, dtype=np.int64)
    kept, _ = trim_text("abcdefgh", [(0, 3)], E, E, 0)
    assert len(kept) <= 8 and kept == "defgh"


def test_exact_dups_always_cluster(ray_session, small_corpus):
    """Every pair of byte-identical docs shares a cluster id."""
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    pages, _ = small_corpus
    sub = pages.slice(0, 200)
    docs = rd.from_arrow(sub).map_batches(extract_batch, batch_format="pyarrow")
    r = near_dedup_pipeline(docs, TEST_CONFIG, through="verified")
    clusters = {x["uid"]: x["cluster_id"] for x in r["clusters"].take_all()}
    from dedup_ray.hashing import hash_u64

    urls = sub.column("url").to_pylist()
    texts = sub.column("text").to_pylist()
    uid_of = dict(zip(urls, hash_u64(urls).tolist()))
    by_text = {}
    for u, t in zip(urls, texts):
        by_text.setdefault(t, []).append(u)
    for t, us in by_text.items():
        if len(us) > 1:
            cids = {clusters.get(uid_of[u]) for u in us}
            assert len(cids) == 1 and None not in cids, us
