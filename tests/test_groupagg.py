import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.stages.groupagg import sorted_aggregate


@pytest.fixture(scope="module")
def rdata(ray_session):
    import ray.data as rd

    return rd


def test_sorted_aggregate_matches_numpy(rdata):
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 5000, 100_000).astype(np.int64)
    vals = rng.integers(0, 100, 100_000).astype(np.int64)
    t = pa.table({"k": keys, "v": vals})
    ds = rdata.from_arrow(t).repartition(16)
    out = sorted_aggregate(
        ds, ["k"], {"s": ("v", "sum"), "mn": ("v", "min"), "n": ("v", "count")}
    )
    rows = {r["k"]: (r["s"], r["mn"], r["n"]) for r in out.take_all()}
    # numpy reference
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    sums = np.add.reduceat(vs, starts)
    mins = np.minimum.reduceat(vs, starts)
    cnts = np.diff(np.r_[starts, len(ks)])
    assert len(rows) == len(starts)
    for k, s, mn, n in zip(ks[starts], sums, mins, cnts):
        assert rows[k] == (s, mn, n), k


def test_sorted_aggregate_multikey(rdata):
    t = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "b": pa.array([1, 1, 2, 1, 1, 1], type=pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
        }
    )
    ds = rdata.from_arrow(t).repartition(3)
    out = sorted_aggregate(ds, ["a", "b"], {"s": ("v", "sum")})
    rows = {(r["a"], r["b"]): r["s"] for r in out.take_all()}
    assert rows == {(1, 1): 30, (1, 2): 30, (2, 1): 90, (3, 1): 60}


def test_sorted_aggregate_string_min(rdata):
    t = pa.table(
        {
            "k": pa.array(["x", "x", "y"], type=pa.string()),
            "url": pa.array(["b", "a", "c"], type=pa.string()),
        }
    )
    out = sorted_aggregate(rdata.from_arrow(t), ["k"], {"mn": ("url", "min")})
    rows = {r["k"]: r["mn"] for r in out.take_all()}
    assert rows == {"x": "a", "y": "c"}


def test_sorted_aggregate_hot_key_spanning_blocks(rdata):
    # one key dominating: spans every block after sort
    keys = np.concatenate([np.zeros(5000, dtype=np.int64), np.arange(1, 100, dtype=np.int64)])
    vals = np.ones(len(keys), dtype=np.int64)
    ds = rdata.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)
    out = sorted_aggregate(ds, ["k"], {"n": ("v", "sum")})
    rows = {r["k"]: r["n"] for r in out.take_all()}
    assert rows[0] == 5000
    assert all(rows[k] == 1 for k in range(1, 100))


def test_fused_exchange_matches_sort_path(ray_session):
    """The acero hash-grouped reduce (shingle_df_classify) must produce
    exactly the (shingle, df) table and classified postings of the
    independent Dataset.sort path (df_table + df_multi + classify_pairs)."""
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.corpus import build_corpus
    from dedup_ray.stages.df import (
        classify_pairs,
        df_multi,
        df_table,
        shingle_df_classify,
    )
    from dedup_ray.stages.exact import exact_dedup
    from dedup_ray.stages.extract import extract_batch
    from dedup_ray.stages.shingle import make_shingle_pairs

    pages, _ = build_corpus(300, seed=7)
    cfg = DedupConfig(num_partitions=16, min_doc_len=10)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    survivors, _ = exact_dedup(docs, cfg)

    multi_f, matched_f = shingle_df_classify(survivors, cfg)

    pairs = make_shingle_pairs(survivors, cfg)
    multi_s = df_multi(df_table(pairs, cfg), cfg)
    matched_s = classify_pairs(pairs, multi_s, cfg)

    def multi_rows(ds):
        return sorted((r["shingle"], r["df"]) for r in ds.take_all())

    def matched_rows(ds):
        return sorted(
            (r["shingle"], r["uid"], r["tf"], r["df"]) for r in ds.take_all()
        )

    assert multi_rows(multi_f) == multi_rows(multi_s)
    mf = matched_rows(matched_f)
    assert mf == matched_rows(matched_s)
    assert len(mf) > 0


def test_sorted_aggregate_empty_input_keeps_schema(ray_session):
    """Degenerate empty input without empty_types must still yield a typed
    dataset (keys + agg outputs), not a schema-less zero-column one."""
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.groupagg import sorted_aggregate

    empty = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], type=pa.string()),
                "v": pa.array([], type=pa.int64()),
            }
        )
    )
    out = sorted_aggregate(empty, ["k"], {"total": ("v", "sum"), "n": ("v", "count")})
    sch = out.schema()
    assert set(sch.names) == {"k", "total", "n"}
    # downstream consumption that previously crashed on zero-column output
    assert out.select_columns(["k", "total"]).take_all() == []


def test_fused_exchange_multi_round_parity(ray_session, monkeypatch):
    """Bounded-memory rounds (DEDUP_RAY_EXCHANGE_ROUNDS>1) must reproduce the
    single-round exchange exactly — same (shingle, df) table and classified
    postings — since rounds only change WHEN partitions ship, not their
    contents."""
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.corpus import build_corpus
    from dedup_ray.stages.df import shingle_df_classify
    from dedup_ray.stages.exact import exact_dedup
    from dedup_ray.stages.extract import extract_batch

    pages, _ = build_corpus(300, seed=7)
    cfg = DedupConfig(num_partitions=16, min_doc_len=10)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    survivors, _ = exact_dedup(docs, cfg)

    monkeypatch.delenv("DEDUP_RAY_EXCHANGE_ROUNDS", raising=False)
    multi_1, matched_1 = shingle_df_classify(survivors, cfg)
    monkeypatch.setenv("DEDUP_RAY_EXCHANGE_ROUNDS", "4")
    multi_4, matched_4 = shingle_df_classify(survivors, cfg)

    def rows(ds, cols):
        return sorted(tuple(r[c] for c in cols) for r in ds.take_all())

    assert rows(multi_1, ("shingle", "df")) == rows(multi_4, ("shingle", "df"))
    m1 = rows(matched_1, ("shingle", "uid", "tf", "df"))
    assert m1 == rows(matched_4, ("shingle", "uid", "tf", "df"))
    assert len(m1) > 0


def test_doc_partials_match_matched_scans(ray_session):
    """The fused exchange's per-uid combiner partials must reproduce the
    doc_scalars / doc_stats results of the full matched-table scans exactly."""
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.corpus import build_corpus
    from dedup_ray.stages.df import shingle_df_classify
    from dedup_ray.stages.exact import exact_dedup
    from dedup_ray.stages.extract import extract_batch
    from dedup_ray.stages.lsh import candidate_pairs_dup_index
    from dedup_ray.stages.output import doc_stats
    from dedup_ray.stages.verify import candidate_uids, doc_scalars

    pages, _ = build_corpus(300, seed=11)
    cfg = DedupConfig(num_partitions=16, min_doc_len=10)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    survivors, _ = exact_dedup(docs, cfg)
    multi, matched, partials = shingle_df_classify(
        survivors, cfg, with_doc_partials=True
    )

    def rows(ds, cols):
        return sorted(tuple(r[c] for c in cols) for r in ds.take_all())

    s_cols = ("uid", "n_multi_postings", "n_dup_postings")
    assert rows(doc_stats(matched, cfg), s_cols) == rows(
        doc_stats(matched, cfg, partials=partials), s_cols
    )

    cand = candidate_pairs_dup_index(matched, cfg)
    cu = candidate_uids(cand, cfg)
    d_cols = ("uid", "url", "n_chars", "n_dup_distinct", "n_dup_postings")
    scan = rows(doc_scalars(matched, cu, survivors, cfg), d_cols)
    fused = rows(doc_scalars(matched, cu, survivors, cfg, partials=partials), d_cols)
    assert scan == fused
    assert len(scan) > 0


def test_fused_pair_partials_match_standalone(ray_session):
    """Pair rows emitted inside the exchange reduce (with_pair_partials) must
    aggregate to exactly the candidate set candidate_pairs_dup_index produces
    from the same matched table."""
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.corpus import build_corpus
    from dedup_ray.stages.df import shingle_df_classify
    from dedup_ray.stages.exact import exact_dedup
    from dedup_ray.stages.extract import extract_batch
    from dedup_ray.stages.groupagg import sorted_aggregate
    from dedup_ray.stages.lsh import candidate_pairs_dup_index

    pages, _ = build_corpus(300, seed=23)
    cfg = DedupConfig(num_partitions=16, min_doc_len=10)
    docs = rd.from_arrow(pages).map_batches(extract_batch, batch_format="pyarrow")
    survivors, _ = exact_dedup(docs, cfg)
    multi, matched, partials, pair_raw = shingle_df_classify(
        survivors, cfg, with_doc_partials=True, with_pair_partials=True
    )
    fused = sorted_aggregate(
        pair_raw, ["ua", "ub"], {"n_buckets": ("ua", "count")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )
    standalone = candidate_pairs_dup_index(matched, cfg, shingle_partitioned=True)

    def rows(ds):
        return sorted(
            (r["ua"], r["ub"], r["n_buckets"]) for r in ds.take_all()
        )

    f, s = rows(fused), rows(standalone)
    assert f == s
    assert len(f) > 0
    assert all(a < b for a, b, _ in f)


def test_hash_sum_aggregate_matches_sorted(ray_session):
    """hash_sum_aggregate == sorted_aggregate (sum-only) up to row order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.groupagg import hash_sum_aggregate, sorted_aggregate

    rng = np.random.default_rng(11)
    n = 20000
    t = pa.table(
        {
            "uid": pa.array(rng.integers(0, 3000, n, dtype=np.int64)),
            "a": pa.array(rng.integers(0, 100, n, dtype=np.int64)),
            "b": pa.array(rng.integers(0, 10, n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(t).repartition(13)
    want = (
        sorted_aggregate(
            ds, ["uid"], {"sa": ("a", "sum"), "sb": ("b", "sum")},
            empty_types=dict(uid=pa.int64(), sa=pa.int64(), sb=pa.int64()),
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    got = (
        hash_sum_aggregate(
            ds, "uid", {"sa": "a", "sb": "b"}, num_parts=7,
            empty_types=dict(uid=pa.int64(), sa=pa.int64(), sb=pa.int64()),
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    assert got.equals(want[list(got.columns)].reset_index(drop=True))


def test_hash_sum_aggregate_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.groupagg import hash_sum_aggregate

    ds = rd.from_arrow(
        pa.table({"uid": pa.array([], pa.int64()), "a": pa.array([], pa.int64())})
    )
    out = hash_sum_aggregate(
        ds, "uid", {"sa": "a"}, empty_types=dict(uid=pa.int64(), sa=pa.int64())
    )
    assert out.count() == 0
