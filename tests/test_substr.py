"""Suffix-array exact-substring spans: primitives vs brute force, the
winnowing candidate guarantee, and the distributed query end-to-end on a
planted corpus (reference V3 analogue — minimap2 homologous intervals,
/root/reference/dedup/dedup.py:437 — re-expressed as ExactSubstr spans)."""

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.hashing import shingle_hashes
from dedup_ray.stages.substr import (
    common_substring_spans,
    sa_and_adjacent_lcp,
    suffix_array,
    winnow_fingerprints,
)


def _arr(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def test_suffix_array_matches_sorted_suffixes():
    rng = random.Random(0)
    for _ in range(15):
        n = rng.randrange(0, 60)
        s = "".join(rng.choice("abc") for _ in range(n))
        assert list(suffix_array(_arr(s))) == sorted(range(n), key=lambda i: s[i:])


def test_adjacent_lcp_matches_brute():
    rng = random.Random(1)
    for _ in range(15):
        n = rng.randrange(1, 60)
        s = "".join(rng.choice("ab") for _ in range(n))
        sa, lcp = sa_and_adjacent_lcp(_arr(s))
        for i in range(n - 1):
            x, y = s[sa[i] :], s[sa[i + 1] :]
            exp = 0
            for cx, cy in zip(x, y):
                if cx != cy:
                    break
                exp += 1
            assert lcp[i] == exp


def _brute_spans(a: str, b: str, min_len: int):
    marks = np.zeros(len(a), dtype=bool)
    for i in range(len(a)):
        best = 0
        for length in range(min_len, len(a) - i + 1):
            if a[i : i + length] in b:
                best = length
            else:
                break
        if best >= min_len:
            marks[i : i + best] = True
    spans, i = [], 0
    while i < len(a):
        if marks[i]:
            j = i
            while j < len(a) and marks[j]:
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def test_common_substring_spans_matches_brute():
    rng = random.Random(2)
    for _ in range(25):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 80)))
        b = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 80)))
        ml = rng.choice([3, 4, 5])
        asp, bsp = common_substring_spans(a, b, ml)
        assert [tuple(r) for r in asp.tolist()] == _brute_spans(a, b, ml)
        assert [tuple(r) for r in bsp.tolist()] == _brute_spans(b, a, ml)


def test_seeded_common_spans_matches_sa_path():
    """The seed-based fast path must be byte-identical to the SA path (or
    defer to it by returning None): random small-alphabet texts (heavy
    k-gram repetition — the adversarial case for diagonal runs), planted
    long shared blocks, periodic strings, and identical texts."""
    from dedup_ray.hashing import shingle_hashes
    from dedup_ray.stages.spans import sort_state
    from dedup_ray.stages.substr import seeded_common_spans

    rng = random.Random(7)
    shared = "".join(rng.choice("abcdef") for _ in range(30))

    def gen():
        for _ in range(40):
            a = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 120)))
            b = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 120)))
            yield a, b
        base = "".join(rng.choice("xyzw") for _ in range(60))
        yield base + shared + "qq", "pp" + shared + base[:10]  # planted block
        yield "a" * 90, "a" * 70                               # periodic
        yield shared * 3, shared * 2                           # periodic block
        yield base, base                                       # identical
        yield "", base                                         # empty side

    for a, b in gen():
        for ml, k in ((6, 4), (10, 5), (8, 8)):
            ha, hb = shingle_hashes(a, k), shingle_hashes(b, k)
            got = seeded_common_spans(
                a, b, ml, k, ha, hb, sort_state(ha), sort_state(hb),
                max_seeds=4096,
            )
            want = common_substring_spans(a, b, ml)
            if got is None:
                continue  # deferred to SA — allowed, not wrong
            assert got[0].tolist() == want[0].tolist(), (a, b, ml, k)
            assert got[1].tolist() == want[1].tolist(), (a, b, ml, k)


def test_winnowing_guarantee_shared_fingerprint():
    """Two docs sharing a verbatim substring of length >= window + k - 1
    must share a selected fingerprint (the candidate-recall invariant)."""
    rng = random.Random(3)
    k, min_len = 8, 20
    window = min_len - k + 1
    for _ in range(20):
        shared = "".join(rng.choice("xyzw") for _ in range(min_len))
        a = "".join(rng.choice("abc") for _ in range(40)) + shared
        b = shared + "".join(rng.choice("def") for _ in range(40))
        fa = set(winnow_fingerprints(shingle_hashes(a, k), window))
        fb = set(winnow_fingerprints(shingle_hashes(b, k), window))
        assert fa & fb


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, ray_session):
    """documents.parquet with three planted verbatim-shared blocks."""
    rng = random.Random(7)

    def noise(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    shared1 = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN"
    shared2 = "PACK MY BOX WITH FIVE DOZEN LIQUOR JUGS RIGHT NOW PLEASE OK"
    texts = [noise(rng.randrange(100, 300)) for _ in range(60)]
    # docs 3 & 17 share shared1; docs 9 & 41 & 55 share shared2
    texts[3] = noise(80) + shared1 + noise(60)
    texts[17] = noise(40) + shared1 + noise(120)
    texts[9] = shared2 + noise(150)
    texts[41] = noise(90) + shared2
    texts[55] = noise(30) + shared2 + noise(30)
    d = tmp_path_factory.mktemp("substr")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(60), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d), texts, (shared1, shared2)


def test_exact_substring_spans_e2e(planted_dir):
    from dedup_ray.pipelines.queries import q_exact_substring_spans

    d, texts, (s1, s2) = planted_dir
    out = q_exact_substring_spans(d, min_len=40, k=16).take_all()
    got = {
        (r["doc_a"], r["doc_b"], r["span_doc"], r["start"], r["end"]) for r in out
    }
    expected = set()
    for a, b in [(3, 17), (9, 41), (9, 55), (41, 55)]:
        for doc, (x, y) in ((a, (texts[a], texts[b])), (b, (texts[b], texts[a]))):
            for st, en in _brute_spans(x, y, 40):
                expected.add((a, b, doc, st, en))
    assert got == expected
    # every planted block is covered by a discovered span
    for a, b, shared in [(3, 17, s1), (9, 41, s2), (9, 55, s2), (41, 55, s2)]:
        for doc in (a, b):
            st = texts[doc].index(shared)
            assert any(
                r[2] == doc and r[3] <= st and r[4] >= st + len(shared)
                for r in got
                if (r[0], r[1]) == (a, b)
            )


def test_exact_substring_spans_join_path_matches_broadcast(planted_dir, monkeypatch):
    """Force the above-gate two-join text attach and check identical rows."""
    from dedup_ray import config as cfg_mod
    from dedup_ray.pipelines.queries import q_exact_substring_spans

    d, _, _ = planted_dir
    broadcast = q_exact_substring_spans(d, min_len=40, k=16).take_all()
    monkeypatch.setattr(cfg_mod.DedupConfig, "broadcast_text_bytes", 0)
    joined = q_exact_substring_spans(d, min_len=40, k=16).take_all()
    key = lambda r: (r["doc_a"], r["doc_b"], r["span_doc"], r["start"], r["end"])
    assert sorted(map(key, broadcast)) == sorted(map(key, joined))


def test_exact_substring_dedup_applies_spans(planted_dir):
    """Losers (higher doc_id of each pair) get their duplicated spans
    removed; winners and unaffected docs pass through unchanged."""
    from dedup_ray.pipelines.queries import (
        q_exact_substring_dedup,
        q_exact_substring_spans,
    )

    d, texts, _ = planted_dir
    spans = q_exact_substring_spans(d, min_len=40, k=16).take_all()
    out = {r["doc_id"]: r for r in q_exact_substring_dedup(d, min_len=40, k=16).take_all()}
    assert set(out) == set(range(60))

    # reference removal: merged loser-side intervals applied per doc
    removal = {}
    for r in spans:
        if r["span_doc"] == r["doc_b"]:
            removal.setdefault(r["doc_b"], []).append((r["start"], r["end"]))
    for i, t in enumerate(texts):
        if i not in removal:
            assert out[i]["text_kept"] == t
            assert out[i]["n_removed"] == 0
        else:
            ivs = sorted(removal[i])
            merged = []
            for a, b in ivs:
                if merged and a <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], b))
                else:
                    merged.append((a, b))
            expect = ""
            prev = 0
            for a, b in merged:
                expect += t[prev:a]
                prev = b
            expect += t[prev:]
            assert out[i]["text_kept"] == expect, i
            assert out[i]["n_removed"] == sum(b - a for a, b in merged)
            assert out[i]["n_spans"] == len(merged)
    assert any(out[i]["n_removed"] > 0 for i in range(60))


def test_substring_hot_fingerprint_skew(ray_session, tmp_path):
    """A boilerplate block shared by more docs than bucket_cap must emit NO
    candidate pairs (the hot winnow-fingerprint bucket is skipped — no
    O(hot^2) fan-out), while a rare pair still dedups; and because the
    DuckDB faces mirror the cap (sqlhash.winnow_candidates_ctes), both
    production queries must still value-match their oracles on this corpus."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.queries import (
        ORACLE_SQL,
        q_dup_span_coverage,
        q_exact_substring_dedup,
    )

    rng = random.Random(11)

    def noise(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES AND EXCLUSIVE OFFERS " \
             "TERMS AND CONDITIONS APPLY SEE OUR PRIVACY POLICY FOR DETAILS"
    rare = "THE RARE SHARED PARAGRAPH THAT ONLY TWO DOCUMENTS CONTAIN VERBATIM"
    texts = []
    # 80 docs (> cap 64) all embedding the same boilerplate block
    for _ in range(80):
        texts.append(noise(rng.randrange(60, 120)) + boiler + noise(rng.randrange(40, 90)))
    # one rare pair
    texts.append(noise(70) + rare + noise(50))   # doc 80
    texts.append(rare + noise(110))              # doc 81
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    # candidate fan-out is trimmed: the hot fingerprint's own C(80,2) = 3160
    # pairs are skipped; only sub-cap partial-window buckets may still pair
    # a subset of the boilerplate docs (each bounded by C(64,2))
    from dedup_ray.pipelines.queries import q_exact_substring_spans
    from dedup_ray.stages.groupagg import sorted_aggregate

    spans = q_exact_substring_spans(str(tmp_path), min_len=40, k=16)
    pair_rows = spans.map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    ).to_pandas().drop_duplicates()
    assert len(pair_rows) < 3160

    out = {
        r["doc_id"]: r
        for r in q_exact_substring_dedup(str(tmp_path), min_len=40, k=16).take_all()
    }
    assert set(out) == set(range(82))
    # the rare pair still dedups (loser = 81)
    assert out[80]["n_removed"] == 0
    assert out[81]["n_removed"] >= len(rare)
    assert rare not in out[81]["text_kept"]

    cov = {
        r["doc_id"]: r for r in q_dup_span_coverage(str(tmp_path)).take_all()
    }
    assert cov[80]["covered"] >= len(rare) and cov[81]["covered"] >= len(rare)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    for qname, got in (
        ("exact_substring_dedup", out),
        ("dup_span_coverage", cov),
    ):
        want = con.execute(ORACLE_SQL[qname]).fetchdf()
        want_rows = {
            tuple(row[c] for c in sorted(want.columns))
            for row in want.to_dict("records")
        }
        got_rows = {
            tuple(r[c] for c in sorted(want.columns)) for r in got.values()
        }
        assert got_rows == want_rows, qname
