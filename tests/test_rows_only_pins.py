"""Value pins for every rows-only (no-DuckDB-oracle) query at sf0.001.

These queries are approximate/binary/fit operators by nature, so the driver
only row-count-checks them — but each one is DETERMINISTIC (seeded
hyperplanes, xxhash-family signatures, fixed grid fits), so their exact
output at sf0.001 can be pinned.  A silent behavior change in any of them
now fails here instead of shipping unnoticed.

Pins regenerate with the obvious one-liner over ``queries()`` if an
INTENTIONAL semantic change lands; the normalization below (sorted columns,
sorted stringified rows, 9-dp float rounding, sha256 prefix) is the same
shape the driver's value-hash check uses.
"""

import hashlib
import math

SF = "/root/testdata/sf0.001"

# query -> (num_rows, sorted columns, sha256[:16] of normalised sorted rows)
PINS = {
    "ann_ivf_topk": (50, ["neighbor_id", "query_id", "rnk"], "1eae7a19da1cf22b"),
    "df_spectrum_band": (1, ["dup_lower", "dup_upper"], "e1250bcca551aceb"),
    "cluster_sample": (40, ["cluster", "vec_id"], "071ad53a23162599"),
    "embedding_kmeans": (500, ["cluster", "vec_id"], "bb18af32a3f90d51"),
    "embedding_lsh_pairs": (55, ["vec_a", "vec_b"], "bd2a492ac15f3a7c"),
    "exact_substring_spans": (
        56,
        ["doc_a", "doc_b", "end", "span_doc", "start"],
        "f93975e415a3a2db",
    ),
    "minhash_lsh_pairs": (204, ["common", "url_a", "url_b"], "29c4652f959651c5"),
    "semantic_dedup": (500, ["cluster", "kept", "vec_id"], "124baaccc97e196b"),
    "multimodal_decode": (
        500,
        ["doc_id", "features", "n_bytes"],
        "508225f08e3ce439",
    ),
    "multimodal_features": (
        500,
        ["doc_id", "features", "n_bytes"],
        "21a4f137c2ba00f4",
    ),
    # near_dup_pairs / near_dup_clusters graduated to DuckDB oracle rows in
    # round 4 (char-17 substr-gram CTEs); simhash / simhash_candidates /
    # fingerprints / minhash_signatures / distinct_shingles_kmv graduated in
    # round 4 too (pipelines/sqlhash.py replays the production splitmix64
    # hash family bitwise in DuckDB) — all checked by the oracle gate now
}


def _norm_hash(df):
    df = df[sorted(df.columns)]
    norm = []
    for tup in df.itertuples(index=False):
        norm.append(
            tuple(
                ("f", None if math.isnan(v) else round(v, 9))
                if isinstance(v, float)
                else ("v", str(v))
                for v in tup
            )
        )
    norm.sort(key=str)
    return hashlib.sha256("\n".join(map(str, norm)).encode()).hexdigest()[:16]


def test_rows_only_queries_are_pinned(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(PINS), (
        "rows-only query set changed; regenerate PINS for: "
        f"{sorted(rows_only ^ set(PINS))}"
    )
    failures = []
    for name, (n, cols, h) in sorted(PINS.items()):
        df = qs[name](SF).to_pandas()
        got = (len(df), sorted(df.columns), _norm_hash(df))
        if got != (n, cols, h):
            failures.append(f"{name}: got {got[:2]} hash {got[2]}")
    assert not failures, "\n".join(failures)
