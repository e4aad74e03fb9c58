"""Unit parity for the two round-4 pair operators: the AllPairs prefix-filter
set-similarity join (stages/setsim.py) and the byte-exact Levenshtein
verifier (functions/editdist.py).

- levenshtein_bytes must equal DuckDB's levenshtein() on random unicode
  pairs (the oracle contract is byte-level).
- The prefix filter is LOSSLESS: with the hot-prefix cap disabled, the join
  must equal the brute-force token-jaccard join on a corpus with planted
  duplicates.
- prefix_rows' block-boundary heal: many tiny blocks == one block.
"""

import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_levenshtein_matches_duckdb():
    from dedup_ray.functions.editdist import levenshtein_bytes

    con = duckdb.connect()
    rng = random.Random(7)
    alphabet = "ab é❄ xyz"
    for _ in range(200):
        a = "".join(rng.choices(alphabet, k=rng.randint(0, 24)))
        b = "".join(rng.choices(alphabet, k=rng.randint(0, 24)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein_bytes(a.encode(), b.encode()) == want, (a, b)


def _planted_docs(n: int = 60, seed: int = 3) -> list[str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = [" ".join(rng.choices(vocab, k=rng.randint(5, 15))) for i in range(n)]
    # planted near-dup pairs: copy with one token appended / swapped
    for i in range(0, 20, 2):
        docs[i + 1] = docs[i] + " extra"
    docs[40] = docs[41]  # exact twin
    return docs


def _brute_jaccard_pairs(docs: list[str], t: float) -> set:
    sets = [set(d.split(" ")) for d in docs]
    out = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            c = len(sets[i] & sets[j])
            u = len(sets[i]) + len(sets[j]) - c
            if u and c / u >= t:
                out.add((i, j, c))
    return out


def test_prefix_filter_lossless(ray_session, tmp_path):
    from dedup_ray.pipelines.queries import q_setsim_prefix_pairs

    docs = _planted_docs()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = q_setsim_prefix_pairs(
        str(tmp_path), threshold=0.6, prefix_df_cap=1 << 20
    ).to_pandas()
    got_set = {
        (a, b, c)
        for a, b, c in zip(got["doc_a"], got["doc_b"], got["common"])
    }
    assert got_set == _brute_jaccard_pairs(docs, 0.6)
    assert (got["jaccard"] >= 0.6).all()


def test_prefix_rows_multiblock_heal(ray_session):
    import ray.data as rd

    from dedup_ray.stages.setsim import prefix_rows

    rng = random.Random(11)
    rows = []
    for d in range(30):
        for tok in {f"t{rng.randint(0, 25)}" for _ in range(rng.randint(1, 12))}:
            rows.append((d, tok))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "tok": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )

    def run(nblocks: int) -> set:
        ds = rd.from_arrow(t).repartition(nblocks)
        out = prefix_rows(ds, 0.6).to_pandas()
        return set(zip(out["doc_id"], out["tok"]))

    assert run(1) == run(13)


def test_prefix_length_rule():
    """plen = n - ceil(t*n) + 1 must keep >= 1 token and match the SQL
    CEIL(t::DOUBLE * n) rounding at the n-multiple-of-5 boundaries."""
    con = duckdb.connect()
    for n in range(1, 41):
        want = con.execute(
            "SELECT CAST(? - CEIL(0.6::DOUBLE * ?) + 1 AS BIGINT)", [n, n]
        ).fetchone()[0]
        got = int(n - np.ceil(0.6 * n) + 1)
        assert got == want and got >= 1, n


def test_edit_distance_pairs_brute(ray_session, tmp_path):
    from dedup_ray.functions.editdist import levenshtein_bytes
    from dedup_ray.pipelines.queries import q_edit_distance_pairs

    base = "this is a forty-plus character shared prefix line "
    docs = [
        base + "tail one two three",
        base + "tail one two four",
        base + "completely different continuation of the page",
        "unrelated short doc",
        base.replace("forty", "fifty") + "other family",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = q_edit_distance_pairs(str(tmp_path)).to_pandas()
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if len(docs[i]) < 32 or len(docs[j]) < 32:
                continue
            if docs[i][:32] != docs[j][:32]:
                continue
            d = levenshtein_bytes(docs[i].encode(), docs[j].encode())
            if d <= 64:
                want.add((i, j, d))
    got_set = {(a, b, d) for a, b, d in zip(got["doc_a"], got["doc_b"], got["dist"])}
    assert got_set == want and len(want) >= 2
