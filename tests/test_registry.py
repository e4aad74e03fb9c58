"""User-extension surface (SURVEY §2.10): named stage registry + pipeline
hook points."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def test_register_and_apply(ray_session):
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.stages.registry import apply_stages, get_stage, register_stage

    @register_stage("drop_short")
    def drop_short(ds, cfg):
        return ds.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n_chars"), 100)),
            batch_format="pyarrow",
        )

    assert get_stage("drop_short") is drop_short
    with pytest.raises(KeyError):
        get_stage("nope")

    cfg = DedupConfig(user_stages=(("docs", "drop_short"),))
    ds = rd.from_arrow(
        pa.table({"n_chars": pa.array([50, 150, 200], type=pa.int64())})
    )
    out = apply_stages(ds, cfg, "docs")
    assert out.count() == 2
    # other hook points untouched
    assert apply_stages(ds, cfg, "output").count() == 3


def test_pipeline_hook_points(ray_session):
    import ray.data as rd

    from dedup_ray.config import TEST_CONFIG
    from dedup_ray.corpus import build_corpus
    from dedup_ray.pipelines.dedup import near_dedup_pipeline
    from dedup_ray.stages.extract import extract_batch
    from dedup_ray.stages.registry import register_stage

    @register_stage("halve_docs")
    def halve_docs(ds, cfg):
        return ds.map_batches(
            lambda b: b.filter(pc.equal(pc.bit_wise_and(b.column("uid"), 1), 0)),
            batch_format="pyarrow",
        )

    @register_stage("kept_only")
    def kept_only(ds, cfg):
        return ds.map_batches(
            lambda b: b.filter(b.column("kept")), batch_format="pyarrow"
        )

    pages, _ = build_corpus(200, seed=5)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    base = near_dedup_pipeline(docs, TEST_CONFIG)
    n_base = base["output"].count()

    import dataclasses

    cfg = dataclasses.replace(
        TEST_CONFIG,
        user_stages=(("docs", "halve_docs"), ("output", "kept_only")),
    )
    docs2 = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    hooked = near_dedup_pipeline(docs2, cfg)
    out = hooked["output"].to_pandas()
    # docs hook halved the corpus; output hook dropped non-kept rows
    assert 0 < len(out) < n_base
    assert out["kept"].all()
