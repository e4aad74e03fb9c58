"""End-to-end golden test: engine candidate/verified pairs vs a brute-force
O(n^2) oracle implementing the reference containment math exactly
(FIXTURES.md §4: dup-pair recall >= 0.99, precision reported)."""

import numpy as np
import pytest

from dedup_ray.config import TEST_CONFIG
from dedup_ray.hashing import shingle_hashes


def _oracle_pairs(url_texts: dict[str, str], cfg):
    """Brute-force pairs per /root/reference/dedup/dedup.py:362-369 math,
    over post-exact-dedup survivors with DF-band classification."""
    per_doc = {}
    for url, text in url_texts.items():
        h = shingle_hashes(text, cfg.shingle_k)
        distinct, counts = np.unique(h, return_counts=True)
        per_doc[url] = (distinct, counts)
    # document frequency
    all_sh = np.concatenate([d for d, _ in per_doc.values()]) if per_doc else np.empty(0)
    sh_vals, sh_df = np.unique(all_sh, return_counts=True)
    df_map = dict(zip(sh_vals.tolist(), sh_df.tolist()))
    lo, hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper
    dup_sets = {}
    n_post = {}
    for url, (distinct, counts) in per_doc.items():
        dfs = np.array([df_map[s] for s in distinct.tolist()])
        mask = (dfs >= lo) & (dfs <= hi)
        dup_sets[url] = distinct[mask]
        n_post[url] = int(counts[mask].sum())
    urls = sorted(url_texts)
    out = set()
    thr = cfg.containment_threshold
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            a, b = urls[i], urls[j]
            common = len(np.intersect1d(dup_sets[a], dup_sets[b], assume_unique=True))
            if common == 0:
                continue
            if common / (n_post[a] + 1) > thr or common / (n_post[b] + 1) > thr:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def pipeline_result(ray_session, small_corpus):
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    pages, truth = small_corpus
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    result = near_dedup_pipeline(docs, TEST_CONFIG)
    return pages, truth, result


def test_exact_dedup(pipeline_result):
    pages, _, result = pipeline_result
    texts = pages.column("text").to_pylist()
    urls = pages.column("url").to_pylist()
    n_distinct = len(set(texts))
    survivors = result["survivors"].select_columns(["url", "text"]).take_all()
    assert len(survivors) == n_distinct
    # survivor per text = min url
    by_text = {}
    for u, t in zip(urls, texts):
        by_text.setdefault(t, []).append(u)
    want_survivors = {min(v) for v in by_text.values()}
    assert {r["url"] for r in survivors} == want_survivors
    # edges: every non-survivor points at its text's winner
    edges = result["exact_edges"].take_all()
    assert len(edges) == len(urls) - n_distinct
    for e in edges:
        assert e["winner_url"] == min(by_text[dict(zip(urls, texts))[e["url"]]])


def test_verified_pairs_match_oracle(pipeline_result):
    pages, _, result = pipeline_result
    texts = pages.column("text").to_pylist()
    urls = pages.column("url").to_pylist()
    by_text = {}
    for u, t in zip(urls, texts):
        by_text.setdefault(t, []).append(u)
    survivors = {min(v): t for t, v in ((t, v) for t, v in by_text.items() for _ in [0])}
    survivor_texts = {min(v): t for t, v in by_text.items()}
    oracle = _oracle_pairs(survivor_texts, TEST_CONFIG)
    got = {
        (r["url_a"], r["url_b"])
        for r in result["verified"].select_columns(["url_a", "url_b"]).take_all()
    }
    assert oracle, "oracle found no pairs — corpus degenerate"
    missed = oracle - got
    extra = got - oracle
    recall = 1 - len(missed) / len(oracle)
    assert recall >= 0.99, f"recall {recall}: missed {sorted(missed)[:5]}"
    assert not extra, f"false positives (V1 is exact — must be none): {sorted(extra)[:5]}"


def test_planted_near_pairs_found(pipeline_result):
    """Planted near/containment pairs between survivors must be verified."""
    pages, truth, result = pipeline_result
    got = {
        (r["url_a"], r["url_b"])
        for r in result["verified"].select_columns(["url_a", "url_b"]).take_all()
    }
    survivor_urls = {r["url"] for r in result["survivors"].select_columns(["url"]).take_all()}
    want = [
        (min(a, b), max(a, b))
        for a, b, k in zip(
            truth.column("url_a").to_pylist(),
            truth.column("url_b").to_pylist(),
            truth.column("kind").to_pylist(),
        )
        if k in ("near", "contain") and a in survivor_urls and b in survivor_urls
    ]
    assert want
    found = sum(1 for p in want if p in got)
    assert found / len(want) >= 0.99, f"planted recall {found}/{len(want)}"


def test_clusters(pipeline_result):
    pages, _, result = pipeline_result
    clusters = {r["uid"]: r["cluster_id"] for r in result["clusters"].take_all()}
    # every exact-dup loser clusters with its winner
    for e in result["exact_edges"].take_all():
        assert clusters[e["uid"]] == clusters[e["winner_uid"]]
    # every verified pair shares a cluster
    for r in result["verified"].select_columns(["uid_a", "uid_b"]).take_all():
        assert clusters[r["uid_a"]] == clusters[r["uid_b"]]
    # cluster id is the min uid of the component
    comp = {}
    for uid, cid in clusters.items():
        comp.setdefault(cid, []).append(uid)
    for cid, members in comp.items():
        assert cid == min(members)


def test_word_tokenizer_rejected_past_verified(ray_session):
    """Word-gram positions are gram indices; span/trim stages are char-space.
    The pipeline must reject the mix instead of producing wrong trims."""
    import pytest
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.corpus import build_corpus
    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    pages, _ = build_corpus(20, seed=3)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    cfg = DedupConfig(tokenizer="word", min_doc_len=10)
    with pytest.raises(ValueError, match="tokenizer='word'"):
        near_dedup_pipeline(docs, cfg, through="output")
