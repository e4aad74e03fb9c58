"""Tests for pipelines/curate.py: Bloom membership, CCNet-style segment
dedup (broadcast AND sorted-fallback paths), Bloom-gated incremental dedup
(including the above-gate semi-join fallback), top-k n-grams tie-breaking,
and PII redaction on planted PII — each against a brute-force or DuckDB
reference over the same parquet."""

import collections

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "source": pa.array([r[3] for r in rows], type=pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _ds_rows(result):
    df = result.to_pandas()
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].itertuples(index=False))), cols


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp():
    from dedup_ray.stages.bloom import bloom_bitmap, bloom_contains, bloom_params

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    m = bloom_params(len(keys))
    words = bloom_bitmap(keys, m)
    assert bloom_contains(words, keys).all()  # one-sided
    probe = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bloom_contains(words, fresh).mean()
    assert fp < 0.01
    assert bloom_contains(words, np.empty(0, dtype=np.uint64)).shape == (0,)


def test_bloom_empty_build():
    from dedup_ray.stages.bloom import bloom_bitmap, bloom_contains, bloom_params

    m = bloom_params(0)
    words = bloom_bitmap(np.empty(0, dtype=np.uint64), m)
    assert not bloom_contains(words, np.arange(10, dtype=np.uint64)).any()


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def _brute_line_dedup(rows, seg_words=10):
    segs_by_doc = {}
    c = collections.Counter()
    for doc_id, text, *_ in rows:
        w = text.split(" ")
        segs = [
            " ".join(w[j : j + seg_words]) for j in range(0, len(w), seg_words)
        ]
        segs_by_doc[doc_id] = segs
        c.update(segs)
    dup = {s for s, v in c.items() if v >= 2}
    out = []
    for doc_id in sorted(segs_by_doc):
        segs = segs_by_doc[doc_id]
        kept = [s for s in segs if s not in dup]
        out.append(
            (
                " ".join(kept),
                doc_id,
                len(segs) - len(kept),
                len(segs),
            )
        )
    return sorted(out)


BOILER = " ".join(f"boiler{i}" for i in range(10))  # one exact 10-word segment


def _line_corpus():
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    return [
        (0, BOILER + " " + uniq("a", 13), "en", "s0"),
        (1, uniq("b", 7) + " tail", "en", "s0"),   # short doc, 1 segment
        (2, BOILER, "fr", "s1"),                    # doc == the dup segment
        (3, uniq("c", 25) + " " + BOILER, "en", "s1"),
        (4, BOILER + " " + BOILER, "de", "s0"),     # dup segment twice in-doc
        (5, "solo", "en", "s2"),
        (6, uniq("d", 40), "es", "s2"),
    ]


@pytest.mark.parametrize("gate", [None, 0])
def test_line_dedup_both_paths_match_brute(ray_session, tmp_path, gate):
    from dedup_ray.pipelines.curate import q_line_dedup

    rows = _line_corpus()
    sf = _write_documents(tmp_path, rows)
    kwargs = {} if gate is None else {"_broadcast_row_gate": gate}
    got, cols = _ds_rows(q_line_dedup(sf, **kwargs))
    assert cols == ["clean_text", "doc_id", "n_removed", "n_segs"]
    assert got == _brute_line_dedup(rows)
    # doc 2 is entirely boilerplate -> clean_text becomes ''
    by_id = {r[1]: r for r in got}
    assert by_id[2][0] == ""
    assert by_id[4][2] == 2  # in-doc repeat removed twice


def test_line_dedup_empty_corpus(ray_session, tmp_path):
    from dedup_ray.pipelines.curate import q_line_dedup

    sf = _write_documents(tmp_path, [])
    got, _ = _ds_rows(q_line_dedup(sf))
    assert got == []


def test_line_dedup_fallback_matches_oracle_sql(ray_session, tmp_path):
    """Fallback path vs the registered DuckDB oracle on a corpus big enough
    for multi-bucket blocks."""
    from dedup_ray.pipelines.curate import CURATE_SQL, q_line_dedup

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        n = int(rng.integers(5, 60))
        text = " ".join(rng.choice(vocab, size=n))
        if i % 7 == 0:
            text = BOILER + " " + text
        rows.append((i, text, "en", "s0"))
    sf = _write_documents(tmp_path, rows)
    got, _ = _ds_rows(q_line_dedup(sf, _broadcast_row_gate=0))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want_df = con.execute(CURATE_SQL["line_dedup"]).fetchdf()
    cols = sorted(want_df.columns)
    want = sorted(map(tuple, want_df[cols].itertuples(index=False)))
    assert got == want


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


def _incremental_corpus():
    rows = []
    for i in range(60):
        rows.append((i, f"base text {i // 2}", "en", "s0"))
    # doc_ids 2k/2k+1 share "base text k": every odd doc duplicates a base doc
    rows.append((100, "totally new content alpha", "en", "s1"))  # even: base
    rows.append((101, "totally new content beta", "en", "s1"))   # odd: new
    rows.append((103, "another fresh incoming doc", "fr", "s1"))
    return rows


@pytest.mark.parametrize("gate", [None, 0])
def test_incremental_dedup_planted(ray_session, tmp_path, gate):
    from dedup_ray.pipelines.curate import CURATE_SQL, q_incremental_dedup

    rows = _incremental_corpus()
    sf = _write_documents(tmp_path, rows)
    kwargs = {} if gate is None else {"_broadcast_row_gate": gate}
    got, cols = _ds_rows(q_incremental_dedup(sf, **kwargs))
    assert cols == ["doc_id", "lang"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want_df = con.execute(CURATE_SQL["incremental_dedup"]).fetchdf()
    want = sorted(map(tuple, want_df[sorted(want_df.columns)].itertuples(index=False)))
    assert got == want
    # the planted truth: every odd doc < 60 is a duplicate; 101 and 103 are new
    assert [r[0] for r in got] == [101, 103]


def test_incremental_dedup_no_incoming(ray_session, tmp_path):
    from dedup_ray.pipelines.curate import q_incremental_dedup

    sf = _write_documents(tmp_path, [(0, "only base", "en", "s0")])
    got, _ = _ds_rows(q_incremental_dedup(sf))
    assert got == []


# ---------------------------------------------------------------------------
# top_ngrams
# ---------------------------------------------------------------------------


def test_top_ngrams_ties_and_boundaries(ray_session, tmp_path):
    from dedup_ray.pipelines.curate import q_top_ngrams

    rows = [
        (0, "a b a b c", "en", "s0"),     # 'a b' x2, 'b a' x1, 'b c' x1
        (1, "b c a b", "en", "s0"),       # no bigram may span docs 0|1
        (2, "z", "en", "s0"),             # single word: no bigrams
        (3, "c a", "en", "s0"),
    ]
    sf = _write_documents(tmp_path, rows)
    t = q_top_ngrams(sf, k=3)
    brute = collections.Counter()
    for _, text, *_ in rows:
        w = text.split(" ")
        brute.update(f"{w[i]} {w[i+1]}" for i in range(len(w) - 1))
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(t.column("g").to_pylist(), t.column("cnt").to_pylist())) == want


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------


def test_pii_redact_planted(ray_session, tmp_path):
    from dedup_ray.pipelines.curate import CURATE_SQL, q_pii_redact

    rows = [
        (0, "reach me at jane.doe+x@example.co.uk or 192.168.0.1 ok", "en", "s0"),
        (1, "no pii at all", "en", "s0"),
        (2, "a@b.io b@c.net 10.0.0.255 8.8.8.8", "en", "s1"),
        (3, "", "en", "s1"),
        (4, "not-an-ip 999.1 and half@email@double.com case", "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    got, cols = _ds_rows(q_pii_redact(sf))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want_df = con.execute(CURATE_SQL["pii_redact"]).fetchdf()
    want = sorted(map(tuple, want_df[sorted(want_df.columns)].itertuples(index=False)))
    assert got == want
    by_id = {r[1]: r for r in got}  # cols sorted: clean_text, doc_id, ...
    assert "<EMAIL>" in by_id[0][0] and "<IP>" in by_id[0][0]
    assert by_id[2][2] == 2 and by_id[2][3] == 2  # n_emails, n_ips


# ---------------------------------------------------------------------------
# near_dup_dedup (consistency vs the clusters-oracle labels)
# ---------------------------------------------------------------------------


def test_near_dup_dedup_consistent_with_clusters(ray_session):
    from dedup_ray.pipelines.curate import q_near_dup_dedup
    from dedup_ray.pipelines.queries import q_near_dup_clusters_oracle

    sf = "/root/testdata/sf0.001"
    kept = {r[0] for r in _ds_rows(q_near_dup_dedup(sf))[0]}  # doc_id first
    lbl = q_near_dup_clusters_oracle(sf)
    dropped = {
        int(u[-8:])
        for u, c in zip(
            lbl.column("url").to_pylist(), lbl.column("cluster_url").to_pylist()
        )
        if u != c
    }
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    all_ids = set(t.column("doc_id").to_pylist())
    assert kept == all_ids - dropped
    assert dropped and kept


# ---------------------------------------------------------------------------
# annotate_bucket_size + salient_terms
# ---------------------------------------------------------------------------


def test_annotate_bucket_size_heals_block_edges(ray_session):
    import ray.data as rd

    from dedup_ray.stages.bucketjoin import annotate_bucket_size

    # many tiny blocks so buckets straddle block edges after the sort
    keys = ["k%02d" % (i % 7) for i in range(200)]
    vals = list(range(200))
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, type=pa.int64())})
    ).repartition(23)
    out = annotate_bucket_size(ds, "k", out_col="n").to_pandas()
    want = collections.Counter(keys)
    assert len(out) == 200
    assert all(out.n[i] == want[out.k[i]] for i in range(len(out)))
    # every input row survives exactly once
    assert sorted(out.v) == vals


def _brute_salient(rows, k=3):
    tf = {}
    for doc_id, text, *_ in rows:
        c = collections.Counter(text.split(" "))
        for t, n in c.items():
            tf[(doc_id, t)] = n
    df = collections.Counter(t for (_, t) in tf)
    out = []
    bydoc = collections.defaultdict(list)
    for (d, t), n in tf.items():
        bydoc[d].append((t, n, df[t]))
    for d, terms in bydoc.items():
        terms.sort(key=lambda x: (-(x[1] / x[2]), x[0]))
        for r, (t, n, dfx) in enumerate(terms[:k], 1):
            out.append((dfx, d, r, t, n))  # sorted cols: df, doc_id, rnk, term, tf
    return sorted(out)


def test_salient_terms_matches_brute(ray_session, tmp_path):
    from dedup_ray.pipelines.curate import q_salient_terms

    rows = [
        (0, "apple banana apple cherry", "en", "s0"),
        (1, "banana banana date", "en", "s0"),
        (2, "apple date date date", "en", "s0"),
        (3, "unique", "en", "s0"),
        (4, "x y", "en", "s0"),
    ]
    sf = _write_documents(tmp_path, rows)
    got, cols = _ds_rows(q_salient_terms(sf))
    assert cols == ["df", "doc_id", "rnk", "term", "tf"]
    assert got == _brute_salient(rows)


# ---------------------------------------------------------------------------
# events_sliding (trailing 3-hour window per event_type)
# ---------------------------------------------------------------------------


def test_events_sliding_heals_block_edges(ray_session, tmp_path):
    import pyarrow.parquet as pqw

    from dedup_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(5)
    n = 4000
    HOUR = 3_600_000_000
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 50 * HOUR, size=n)
    et = rng.choice(["a", "bb", "ccc"], size=n)
    t = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 20, n), type=pa.int64()),
            "event_type": pa.array(et.tolist(), type=pa.string()),
            "value": pa.array(rng.random(n)),
        }
    )
    pqw.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["events_sliding"](str(tmp_path)).to_pandas()
    c = collections.Counter((e, x // HOUR) for e, x in zip(et, ts))
    want = {}
    for (e, h), cnt in c.items():
        want[(e, h)] = (cnt, sum(v for (e2, h2), v in c.items() if e2 == e and h - 2 <= h2 <= h))
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        h = int(r.window_start.timestamp() * 1_000_000) // HOUR
        assert (r.n_events, r.n_3h) == want[(r.event_type, h)]


def test_doc_chunks_edges(ray_session, tmp_path):
    """Chunking edge cases the sf tables never hit: empty text (one empty
    chunk), text shorter than the stride (one chunk), text exactly at a
    window boundary (no phantom trailing chunk)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.queries import q_doc_chunks

    tab = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["", "ab", "x" * 90, "y" * 200], pa.string()),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([0, 2, 90, 200], pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    out = q_doc_chunks(str(tmp_path), chunk=120, stride=90).to_pandas()
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_len)
        for r in out.itertuples()
    }
    assert got == {
        (1, 0): ("", 0),
        (2, 0): ("ab", 2),
        (3, 0): ("x" * 90, 90),
        (4, 0): ("y" * 120, 120),
        (4, 1): ("y" * 110, 110),
        (4, 2): ("y" * 20, 20),
    }


def test_quality_gate_threshold(ray_session, tmp_path):
    """The gate keeps exactly the docs at/above the rank-select threshold,
    ties included."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.queries import q_quality_gate

    lens = [10, 10, 20, 30, 40, 50, 60, 70]  # P25 rank = floor(7*0.25)=1 -> 10
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(lens)), pa.int64()),
            "text": pa.array(["z" * n for n in lens], pa.string()),
            "lang": pa.array(["en"] * len(lens)),
            "source": pa.array(["s"] * len(lens)),
            "n_chars": pa.array(lens, pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    out = q_quality_gate(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == list(range(8))  # thr=10, ties kept
    out2 = q_quality_gate(str(tmp_path), pct=0.5).to_pandas()
    # rank floor(7*0.5)=3 -> value 30
    assert sorted(out2.n_chars) == [30, 40, 50, 60, 70]


def test_source_balance_sample_skew(ray_session, tmp_path):
    """On a skewed corpus the flattening sampler keeps everything from the
    smallest source and hash-thins the rest at exactly min/count(s) —
    the production (splitmix63) path checked against an independent numpy
    recompute, the md5 fixture twin against an independent hashlib one."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.hashing import MASK63, splitmix64
    from dedup_ray.pipelines.queries import (
        q_source_balance_sample,
        q_source_balance_sample_oracle,
    )

    srcs = ["tiny"] * 5 + ["mid"] * 50 + ["big"] * 500
    ids = list(range(len(srcs)))
    tab = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["t"] * len(ids)),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(srcs),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    cnt = {"tiny": 5, "mid": 50, "big": 500}

    out = q_source_balance_sample(str(tmp_path)).to_pandas()
    thr63 = {
        s: int(np.floor((9223372036854775808.0 * 5) / c)) for s, c in cnt.items()
    }
    keys = splitmix64(np.asarray(ids, dtype=np.uint64)) & MASK63
    want = {i for i, s in zip(ids, srcs) if int(keys[i]) < thr63[s]}
    assert set(out.doc_id) == want
    assert set(out[out.source == "tiny"].doc_id) == set(range(5))  # rate 1.0
    assert 0 < len(out[out.source == "big"]) < 500  # actually thinned

    out_md5 = q_source_balance_sample_oracle(str(tmp_path)).to_pandas()
    thr24 = {s: int(np.floor((16777216.0 * 5) / c)) for s, c in cnt.items()}
    want_md5 = {
        i
        for i, s in zip(ids, srcs)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) < thr24[s]
    }
    assert set(out_md5.doc_id) == want_md5
    assert set(out_md5[out_md5.source == "tiny"].doc_id) == set(range(5))


def test_new_ops_empty_corpus(ray_session, tmp_path):
    """All round-3-late operators handle a zero-row documents table without
    crashing (schema-stable empty or trivially-empty output)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.queries import QUERIES

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(empty, tmp_path / "documents.parquet")
    for name in [
        "doc_chunks",
        "quality_gate",
        "lang_source_share",
        "source_balance_sample",
        "gram_novelty",
    ]:
        r = QUERIES[name](str(tmp_path))
        n = r.count() if not isinstance(r, pa.Table) else r.num_rows
        assert n == 0, name


def test_line_dedup_sorted_heal_keeps_trailing_empty_segment(ray_session):
    """ADVICE r3: a doc whose text ends in a space has a final EMPTY segment;
    when that doc straddles rebuild blocks, the heal must not conflate 'kept
    empty segment' with 'all segments removed' — the trailing separator must
    survive, as the broadcast path and brute reference produce."""
    import ray.data as rd

    from dedup_ray.pipelines.curate import _line_dedup_sorted

    long_words = " ".join(f"u{i}" for i in range(300))
    rows = [
        (0, long_words + " ", "en", "s0"),  # 30 full segments + [""] (all unique)
        (1, BOILER + " " + "v0 v1", "en", "s0"),
        (2, BOILER, "en", "s0"),
        (3, "w0 w1 w2", "en", "s0"),
        (4, "x0", "en", "s0"),
        (5, "y0 y1", "en", "s0"),
    ]
    # one single-row Arrow table per doc -> many input blocks -> the long doc
    # straddles several sorted rebuild blocks
    tables = [
        pa.table(
            {
                "doc_id": pa.array([r[0]], type=pa.int64()),
                "text": pa.array([r[1]], type=pa.string()),
            }
        )
        for r in rows
    ]
    import ray as _ray

    ds = rd.from_arrow_refs([_ray.put(t) for t in tables])
    got, cols = _ds_rows(_line_dedup_sorted(ds))
    assert cols == ["clean_text", "doc_id", "n_removed", "n_segs"]
    assert got == _brute_line_dedup(rows)
    by_id = {r[1]: r for r in got}
    assert by_id[0][0] == long_words + " "  # trailing space preserved
    assert by_id[0][3] == 31                # 30 full + 1 empty segment


def test_merge_partial_docs_empty_kept_segment_contributes_separator():
    """Unit pin of the heal itself: doc 7 is split into two partials, the
    second holding only its kept final EMPTY segment — the merge must emit
    'u0 ... u9 ' (trailing separator), not 'u0 ... u9'."""
    from dedup_ray.pipelines.curate import _merge_partial_docs

    ten = " ".join(f"u{i}" for i in range(10))
    boundary = pa.table(
        {
            "doc_id": pa.array([7, 7, 8], type=pa.int64()),
            "clean_text": pa.array([ten, "", ""], type=pa.string()),
            "n_segs": pa.array([1, 1, 2], type=pa.int64()),
            "n_removed": pa.array([0, 0, 2], type=pa.int64()),
            "n_kept": pa.array([1, 1, 0], type=pa.int64()),  # doc 8: all removed
            "first_idx": pa.array([0, 1, 0], type=pa.int64()),
        }
    )
    healed = _merge_partial_docs(boundary)
    rows = {r["doc_id"]: r for r in healed.to_pylist()}
    assert rows[7]["clean_text"] == ten + " "   # separator survives
    assert rows[7]["n_segs"] == 2 and rows[7]["n_removed"] == 0
    assert rows[8]["clean_text"] == ""          # genuinely all-removed doc
    assert rows[8]["n_segs"] == 2 and rows[8]["n_removed"] == 2
