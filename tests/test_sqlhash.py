"""Bitwise parity of the DuckDB production-hash faces (pipelines/sqlhash.py)
against the numpy implementations, on adversarial unicode inputs the real
test tables don't exercise (non-ASCII, astral codepoints, short docs).

No Ray needed: these drive the SQL fragments and the numpy kernels directly.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.functions.simhash import simhash_text
from dedup_ray.functions.text import fingerprint_batch
from dedup_ray.hashing import shingle_hashes
from dedup_ray.pipelines.sqlhash import (
    fingerprints_select,
    rolling_hash_ctes,
    simhash_select,
)

TEXTS = [
    "",  # empty
    "ab",  # shorter than every k
    "hello world, hello world, hello world",
    "naïve café résumé — déjà vu ×17 naïve café résumé",
    "日本語のテキストの重複検出テスト、日本語のテキスト",
    "mixed ascii と 日本語 and emoji \U0001f600\U0001f680 tails",
    "a" * 40,  # degenerate run: every window identical
    "abcdefghij" * 5,
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
            "text": pa.array(TEXTS, type=pa.string()),
        }
    )
    c.register("documents", tbl)
    return c


@pytest.mark.parametrize("k", [2, 5, 17])
def test_rolling_hash_parity(con, k):
    sql = (
        "WITH docs AS (SELECT doc_id AS url, text FROM documents),\n"
        + rolling_hash_ctes(k)
        + "\nSELECT url, i, h FROM hs ORDER BY url, i"
    )
    df = con.execute(sql).fetchdf()
    for doc_id, text in enumerate(TEXTS):
        want = shingle_hashes(text, k)
        got = df[df.url == doc_id].sort_values("i").h.to_numpy()
        assert np.array_equal(want, got), f"k={k} doc={doc_id}"


def test_simhash_parity(con):
    df = con.execute(simhash_select(k=5)).fetchdf()
    got = {
        int(u.split("doc://")[1]): int(s) for u, s in zip(df.url, df.simhash)
    }
    for doc_id, text in enumerate(TEXTS):
        want = simhash_text(text, 5)
        # numpy sketch is uint64 (<2^63 here); SQL emits int64
        assert got[doc_id] == int(np.int64(np.uint64(want))), f"doc={doc_id}"


def test_fingerprints_parity(con):
    df = con.execute(fingerprints_select(k=8, window=16)).fetchdf()
    got = {
        int(u.split("doc://")[1]): (int(f), int(n))
        for u, f, n in zip(df.url, df.fingerprint, df.n_fingerprints)
    }
    batch = pa.table(
        {
            "url": pa.array([f"doc://{i:08d}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    want = fingerprint_batch(batch, k=8, window=16)
    for i in range(len(TEXTS)):
        w = (
            int(want.column("fingerprint")[i].as_py()),
            int(want.column("n_fingerprints")[i].as_py()),
        )
        assert got[i] == w, f"doc={i}"
