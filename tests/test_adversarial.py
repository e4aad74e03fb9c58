"""Adversarial inputs: corpus-wide boilerplate (hot-shingle skew) and
degenerate documents must neither crash nor blow up candidate counts."""

import numpy as np
import pyarrow as pa


def _docs_ds(texts):
    import ray.data as rd

    from dedup_ray.stages.extract import docs_from_text_batch

    t = pa.table(
        {
            "url": [f"doc://{i:08d}" for i in range(len(texts))],
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t).map_batches(
        docs_from_text_batch, batch_format="pyarrow"
    )


def test_boilerplate_skew_bounds_candidates(ray_session):
    """Every doc shares one boilerplate line.  Its shingles have df == n_docs
    (way above duplicate_df_upper), so they must be excluded by the band and
    candidate pairs must stay bounded — NOT O(n^2)."""
    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import near_dedup_pipeline

    rng = np.random.default_rng(3)
    n = 600
    boiler = "all rights reserved contact us terms of service " * 4
    texts = [
        boiler + " " + " ".join(rng.choice(list("abcdefgh"), 40)) + f" unique{i}" * 5
        for i in range(n)
    ]
    # plant one true near-dup pair so the pipeline has real work
    texts[10] = texts[11][: len(texts[11]) // 2] + " tail" + str(10)

    cfg = DedupConfig(num_partitions=8, min_doc_len=10, end_buffer=10,
                      alignment_max_gap=50)
    r = near_dedup_pipeline(_docs_ds(texts), cfg, through="verified")
    n_cand = r["candidates"].count()
    # bound: df band [2,4] caps each bucket at 4 docs -> pairs per bucket <= 6;
    # with the boilerplate excluded the candidate count must be tiny relative
    # to n^2 (=179,700 pairs)
    assert n_cand < 5_000, n_cand
    assert r["verified"].count() >= 0  # completes


def test_degenerate_docs_survive_pipeline(ray_session):
    """Empty, whitespace-only, single-char, and exact-duplicate rows flow
    through the full pipeline (output keeps every url exactly once)."""
    from dedup_ray.config import TEST_CONFIG
    from dedup_ray.pipelines.dedup import near_dedup_pipeline

    texts = ["", " ", "x", "hello world " * 30, "hello world " * 30, "\n\n", "y z"]
    r = near_dedup_pipeline(_docs_ds(texts), TEST_CONFIG)
    out = r["output"].to_pandas()
    assert len(out) == len(texts)
    assert out["url"].is_unique
    # the exact duplicate lost to its twin
    assert (~out["kept"]).sum() >= 1
