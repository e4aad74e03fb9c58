"""Resume tests (FIXTURES.md §4): phase checkpoints produce byte-identical
outputs on rerun; invalidated checkpoints recompute; stale keys are ignored."""

import json
import os
import shutil

import pytest

from dedup_ray.config import TEST_CONFIG
from dedup_ray.state.checkpoint import CheckpointManager, corpus_fingerprint


def _run(pages, ckpt_dir):
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    ckpt = CheckpointManager(ckpt_dir, {"cfg": TEST_CONFIG.__dict__, "corpus": "t"})
    r = near_dedup_pipeline(docs, TEST_CONFIG, ckpt=ckpt)
    rows = sorted(
        (x["url"], x["text_kept"], x["kept"], x["cluster_id"], x["total_dup"])
        for x in r["output"].take_all()
    )
    return rows, ckpt


@pytest.fixture(scope="module")
def corpus(small_corpus):
    pages, _ = small_corpus
    return pages.slice(0, 150)


def test_checkpoint_and_resume_identical(ray_session, corpus, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    rows1, ckpt1 = _run(corpus, ckpt_dir)
    assert {m["phase"] for m in ckpt1.metrics if m["source"] == "computed"} >= {
        "survivors", "df_multi", "matched", "candidates", "verified", "output",
    }
    # resume: all phases load from checkpoint, outputs identical
    rows2, ckpt2 = _run(corpus, ckpt_dir)
    assert rows1 == rows2
    computed = [m["phase"] for m in ckpt2.metrics if m["source"] == "computed"]
    assert computed == [], f"recomputed on resume: {computed}"
    # metrics file exists with lineage
    with open(os.path.join(ckpt_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["phases"]


def test_partial_resume_after_phase_loss(ray_session, corpus, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt2"))
    rows1, _ = _run(corpus, ckpt_dir)
    # simulate a crash that lost the later phases
    for phase in ("verified", "decisions", "clusters", "output"):
        shutil.rmtree(os.path.join(ckpt_dir, phase), ignore_errors=True)
        mf = os.path.join(ckpt_dir, f"{phase}.manifest.json")
        if os.path.exists(mf):
            os.remove(mf)
    rows2, ckpt2 = _run(corpus, ckpt_dir)
    assert rows1 == rows2
    computed = {m["phase"] for m in ckpt2.metrics if m["source"] == "computed"}
    loaded = {m["phase"] for m in ckpt2.metrics if m["source"] == "checkpoint"}
    assert "survivors" in loaded and "matched" in loaded
    assert "verified" in computed and "output" in computed


def test_stale_key_not_reused(ray_session, corpus, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt3"))
    _run(corpus, ckpt_dir)
    # different config -> different key -> everything recomputes
    import ray.data as rd

    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch

    cfg2 = TEST_CONFIG.replace(containment_threshold=0.5)
    docs = rd.from_arrow(corpus).map_batches(extract_batch, batch_format="pyarrow")
    ckpt = CheckpointManager(ckpt_dir, {"cfg": cfg2.__dict__, "corpus": "t"})
    near_dedup_pipeline(docs, cfg2, ckpt=ckpt)
    computed = {m["phase"] for m in ckpt.metrics if m["source"] == "computed"}
    assert "survivors" in computed


def test_corrupted_partition_invalidates(ray_session, corpus, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt4"))
    _, ckpt1 = _run(corpus, ckpt_dir)
    # truncate a partition file of 'matched'
    mdir = os.path.join(ckpt_dir, "matched")
    part = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, part), "w") as f:
        f.write("corrupt")
    mgr = CheckpointManager(ckpt_dir, {"cfg": TEST_CONFIG.__dict__, "corpus": "t"})
    assert not mgr.valid("matched")
    assert mgr.valid("survivors")


def test_corpus_fingerprint(tmp_path):
    p1 = tmp_path / "a.parquet"
    p1.write_bytes(b"xxx")
    f1 = corpus_fingerprint([str(p1)])
    p1.write_bytes(b"yyyy")
    assert corpus_fingerprint([str(p1)]) != f1
