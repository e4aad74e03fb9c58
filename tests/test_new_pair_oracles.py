"""Edge-case parity for the three pair queries added late in round 2
(minhash_band_pairs, simhash_hamming_pairs, exact_substring_pairs): degenerate
docs (empty text, single token, below-gram-length), planted structure (an
exact 40-char shared block, token-identical docs), and non-ASCII text must
all match the DuckDB oracle on a tiny local table."""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SHARED = "the quick brown fox jumps over the lazy dog " * 2  # > 40 chars


def _docs_table() -> pa.Table:
    texts = [
        "",                                      # empty
        "one",                                   # single token, < 3 words
        "two words",                             # < 3 words: no grams
        "alpha beta gamma delta",                # minimal gram-bearing doc
        "alpha beta gamma delta",                # token-identical twin
        "prefix " + SHARED + " tail one",        # shares the 40-char block
        "other lead-in " + SHARED + " tail two",  # with this one
        "café naïve résumé über tokens here now",  # non-ASCII
        "café naïve résumé über tokens here now",
        "completely unrelated filler content words nine",
        # >= 32-char shared prefix + small tail edits (edit-distance family)
        "shared thirty-two character prefix block aaa bbb ccc",
        "shared thirty-two character prefix block aaa bbb ddd",
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    pq.write_table(_docs_table(), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return c


def _rows(df):
    df = df[sorted(df.columns)]
    out = set()
    for t in df.itertuples(index=False):
        out.add(
            tuple(
                ("f", None if isinstance(v, float) and math.isnan(v) else v)
                if isinstance(v, float)
                else ("v", str(v))
                for v in t
            )
        )
    return out


@pytest.mark.parametrize(
    "name",
    [
        "minhash_band_pairs",
        "simhash_hamming_pairs",
        "exact_substring_pairs",
        "edit_distance_pairs",
        "setsim_prefix_pairs",
    ],
)
def test_edge_corpus_matches_oracle(ray_session, sf_dir, con, name):
    from dedup_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](sf_dir).to_pandas()
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want), f"{name}: {len(got)} vs {len(want)} rows"
    if name != "minhash_band_pairs":
        # planted structure must actually be found (the test isn't vacuous):
        # token-identical twins and the shared 40-char block
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        if name == "exact_substring_pairs":
            assert (5, 6) in pairs
        elif name == "edit_distance_pairs":
            # docs 3/4 are below the 32-char prefix minimum by design; the
            # non-ASCII twins and the shared-prefix tail-edit pair must hit
            assert (7, 8) in pairs and (10, 11) in pairs
        else:  # token-identical / simhash twins at hamming 0
            assert (3, 4) in pairs and (7, 8) in pairs


@pytest.fixture(scope="module")
def agg_sf_dir(tmp_path_factory):
    """Tiny documents table for the per-group aggregates: a single-doc lang
    (all quantiles collapse to one value), a source with fewer than k docs,
    and n_chars ties inside a group (tie-break must match the SQL)."""
    texts = ["x" * n for n in (10, 10, 10, 25, 25, 40, 7, 99, 99, 99, 3, 50)]
    langs = ["en"] * 6 + ["de"] * 5 + ["fr"]          # fr has ONE doc
    sources = ["s0"] * 3 + ["s1"] * 7 + ["s2"] * 2    # s2 has < 5 docs
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array([len(t_) for t_ in texts], type=pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("agg_sf")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["top_docs_per_source", "chars_quantiles_per_lang"])
def test_group_aggregates_edge_corpus(ray_session, agg_sf_dir, name):
    from dedup_ray.pipelines.queries import ORACLE_SQL, QUERIES

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{agg_sf_dir}/documents.parquet')"
    )
    got = QUERIES[name](agg_sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = c.execute(ORACLE_SQL[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want), f"{name}: {len(got)} vs {len(want)}"
    assert len(got) > 0


def test_source_overlap_join_fallback_matches_broadcast(ray_session):
    """Above the broadcast gate the doc->source lookup must fall back to the
    hash-join path with identical output."""
    from dedup_ray.pipelines.queries import q_source_overlap

    d = "/root/testdata/sf0.001"

    def rows(ds):
        return sorted(
            (r["source_a"], r["source_b"], r["n_pairs"]) for r in ds.take_all()
        )

    bcast = rows(q_source_overlap(d))
    joined = rows(q_source_overlap(d, _broadcast_row_gate=0))
    assert bcast == joined
    assert len(bcast) > 0


def test_orders_by_segment_join_fallback_matches_broadcast(ray_session):
    """Above the broadcast gate the customer lookup must fall back to the
    distributed hash join with identical (segment, count, max) output."""
    from dedup_ray.pipelines.queries import q_orders_by_segment

    d = "/root/testdata/sf0.001"

    def rows(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))

    bcast = rows(q_orders_by_segment(d))
    joined = rows(q_orders_by_segment(d, _broadcast_row_gate=0))
    assert bcast == joined
    assert len(bcast) > 0


def test_shared_prefix_hot_bucket_capped(ray_session, tmp_path):
    """VERDICT r3: a hot 64-char boilerplate prefix shared by m > bucket_cap
    docs must emit NO pairs (no O(m^2) fan-out), while cold prefixes keep
    their exact pair sets; the Ray result must equal the cap-mirroring
    DuckDB oracle."""
    from dedup_ray.pipelines.queries import ORACLE_SQL, QUERIES

    hot = ("H" * 64) + " unique-tail-{} filler"
    cold = ("c" * 64) + " tail-{}"
    texts = [hot.format(i) for i in range(300)]          # one prefix, 300 docs
    texts += [cold.format(i) for i in range(3)]          # cold prefix, 3 docs
    texts += ["short", ("z" * 64) + " solo"]             # below len; singleton
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    got = QUERIES["shared_prefix_pairs"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(ORACLE_SQL["shared_prefix_pairs"]).fetchdf()
    assert _rows(got) == _rows(want)
    # the planted truth: only the 3 cold docs pair up (ids 300,301,302)
    pairs = sorted(map(tuple, got[["doc_a", "doc_b"]].itertuples(index=False)))
    assert pairs == [(300, 301), (300, 302), (301, 302)]


def test_ngram_jaccard_fallback_matches_broadcast(ray_session):
    """VERDICT r3: the hot-gram set is no longer broadcast (in-place df
    annotate+filter) and the per-doc size table is row+byte gated — the
    above-gate hash-join path must produce the identical pair set."""
    from dedup_ray.pipelines.queries import q_ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    bc = q_ngram_jaccard_pairs(sf).to_pandas()
    hj = q_ngram_jaccard_pairs(sf, _broadcast_row_gate=0).to_pandas()
    assert _rows(bc) == _rows(hj)
    assert len(bc) > 0  # non-vacuous on the shared testdata
