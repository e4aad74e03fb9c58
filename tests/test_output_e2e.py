"""E2E tests for the decision/trim/output tail of the pipeline."""

import numpy as np
import pytest

from dedup_ray.config import TEST_CONFIG


@pytest.fixture(scope="module")
def result(ray_session, small_corpus):
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    pages, truth = small_corpus
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    r = near_dedup_pipeline(docs, TEST_CONFIG)
    return pages, truth, r, r["output"].take_all()


def test_output_covers_every_doc(result):
    pages, _, _, rows = result
    assert len(rows) == pages.num_rows
    assert {r["url"] for r in rows} == set(pages.column("url").to_pylist())


def test_exact_losers_removed(result):
    pages, _, r, rows = result
    by_url = {x["url"]: x for x in rows}
    for e in r["exact_edges"].take_all():
        loser = by_url[e["url"]]
        assert loser["kept"] is False
        assert loser["text_kept"] == ""
        winner = by_url[e["winner_url"]]
        assert loser["cluster_id"] == winner["cluster_id"]
        # full-removal stats: removed == total (dedup.py:166 analogue)
        assert loser["removed_dup"] == loser["total_dup"]


def test_trimmed_text_is_substring(result):
    pages, _, _, rows = result
    texts = dict(zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()))
    for x in rows:
        if x["kept"]:
            assert x["text_kept"] in texts[x["url"]]
            if not x["removed_spans"]:
                assert x["text_kept"] == texts[x["url"]]


def test_decisions_touch_edges(result):
    """D1 only emits full/head/tail — every interval touches a doc edge."""
    _, _, r, rows = result
    for d in r["decisions"].take_all():
        assert d["kind"] in ("full", "head", "tail")
        if d["kind"] in ("full", "head"):
            assert d["start"] == 0
        # score of the best alignment must be positive (alignment.py:105)
        assert d["score"] > 0


def test_stats_ratios_consistent(result):
    _, _, _, rows = result
    for x in rows:
        assert 0 <= x["removed_dup"] <= x["total_dup"]
        assert 0 <= x["removed_ndup"] <= x["total_ndup"]
        assert x["ratio_dup"] == pytest.approx(
            x["removed_dup"] / (x["total_dup"] + 1e-6)
        )


def test_near_pairs_produce_removals(result):
    """Planted near-duplicate pairs should mostly resolve to a removal or
    trim on one side (high containment + edge-touching spans)."""
    pages, truth, r, rows = result
    decided_losers = {d["loser_url"] for d in r["decisions"].take_all()}
    near = [
        (a, b)
        for a, b, k in zip(
            truth.column("url_a").to_pylist(),
            truth.column("url_b").to_pylist(),
            truth.column("kind").to_pylist(),
        )
        if k == "near"
    ]
    hit = sum(1 for a, b in near if a in decided_losers or b in decided_losers)
    assert hit / len(near) > 0.5, f"{hit}/{len(near)} near pairs produced a decision"


def _run_rows(pages, cfg):
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    r = near_dedup_pipeline(docs, cfg)
    return sorted(
        (
            x["url"], x["text_kept"], x["kept"], x["cluster_id"],
            x["removed_dup"], x["total_dup"], x["removed_ndup"], x["total_ndup"],
            tuple((s["start"], s["end"]) for s in x["removed_spans"]),
        )
        for x in r["output"].take_all()
    )


def test_patch_path_matches_broadcast(ray_session, monkeypatch, result):
    """Forcing the sets table over the broadcast gate must not change the
    output: the trimmed-doc patch path (raw tasks over the sets blocks) and
    the hash-join fallback both equal the default broadcast path row-for-row."""
    import dedup_ray.stages.output as out_mod

    pages, _, _, _ = result
    base = _run_rows(pages, TEST_CONFIG)

    orig = out_mod._collect_lookup

    def no_sets_lookup(ds, cols, cfg):
        return None if "dup_shingles" in cols else orig(ds, cols, cfg)

    monkeypatch.setattr(out_mod, "_collect_lookup", no_sets_lookup)
    patched = _run_rows(pages, TEST_CONFIG)
    assert patched == base

    # text gate fails too -> the old join fallback must still be intact
    monkeypatch.setattr(out_mod, "_patch_trimmed", lambda *a, **k: None)
    joined = _run_rows(pages, TEST_CONFIG)
    assert joined == base


def test_idempotent_rerun(ray_session, small_corpus):
    """Determinism: running the pipeline twice yields identical outputs."""
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    pages, _ = small_corpus
    sub = pages.slice(0, 120)
    outs = []
    for _ in range(2):
        docs = rd.from_arrow(sub).map_batches(extract_batch, batch_format="pyarrow")
        r = near_dedup_pipeline(docs, TEST_CONFIG)
        rows = sorted(
            (
                (x["url"], x["text_kept"], x["kept"], x["cluster_id"], x["total_dup"])
                for x in r["output"].take_all()
            )
        )
        outs.append(rows)
    assert outs[0] == outs[1]
