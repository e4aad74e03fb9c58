"""DuckDB SQL faces for the engine's production hash family.

The engine's shingle tokens are 63-bit hashes: a polynomial rolling hash over
character codepoints (base = FNV prime, mod 2**64) finished with splitmix64
and masked to 63 bits (``hashing.shingle_hashes``).  That arithmetic is pure
mod-2**64 integer math, so DuckDB can replay it bitwise with HUGEINT
arithmetic (for wrap-free mul/add) + UBIGINT xor/shift — no md5 stand-in
needed.  The generators below build the (large, machine-generated) SQL for:

  * ``rolling_hash_ctes``  — per-(doc, window) production shingle hashes
  * ``simhash_select``     — the 63-bit Charikar sketch (functions/simhash.py)
  * ``fingerprints_select``— winnowing fingerprints (functions/text.py)
  * ``minhash_signatures_select`` — splitmix-permutation MinHash signatures
                             (stages/minhash.py)
  * ``simhash_candidates_select`` — Manku rotated-prefix candidate pairs
  * ``kmv_select``         — bottom-k distinct-shingle cardinality sketch

Every fragment is validated end-to-end against the Ray implementations by
``tests/test_entry_oracle.py`` (value-hash identical at sf0.001) and by the
driver's sf0.01 correctness gate.  Reference semantics being faced: the k-mer
tokenisation of ``/root/reference/dedup/kmer_utilities.py:89-120`` and the
MinHash family of ``/root/reference/dedup/dedup.py:310-316``.
"""

from __future__ import annotations

M64 = 1 << 64
MASK63 = 1 << 63
BASE = 0x100000001B3  # hashing._BASE (FNV prime, odd => invertible mod 2^64)
SM_C1 = 0x9E3779B97F4A7C15
SM_C2 = 0xBF58476D1CE4E5B9
SM_C3 = 0x94D049BB133111EB


def _mm64(a: str, b: int) -> str:
    """(a * b) mod 2**64 for a HUGEINT expr in [0, 2**64) and a constant b.

    Split a into 32-bit halves so no intermediate exceeds HUGEINT range:
    a*b = (a_lo*b + ((a_hi*b mod 2**32) << 32)) mod 2**64.
    """
    return (
        f"((({a}) % 4294967296) * {b} + "
        f"(((({a}) // 4294967296) * {b}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616"
    )


def _x64(a: str, b: str) -> str:
    """Bitwise XOR of two HUGEINT exprs in [0, 2**64) via UBIGINT."""
    return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"


def sm64_ctes(prefix: str, src: str, carry: list[str], exprs: dict[str, str]) -> str:
    """CTE chain computing ``out = to_i63(splitmix64(in_expr))`` (a BIGINT in
    [0, 2**63)) for each ``out: in_expr`` in ``exprs``, reading from CTE
    ``src`` and carrying ``carry`` columns through.  Final CTE: ``{prefix}f``.

    One chained stage per splitmix step so each expression references plain
    columns of the previous stage (no exponential expression blow-up).
    """
    cols = ", ".join(carry)
    a = ", ".join(
        f"(({e}) + {SM_C1}) % 18446744073709551616 AS {o}_a" for o, e in exprs.items()
    )
    b = ", ".join(
        f"{_mm64(_x64(f'{o}_a', f'{o}_a // 1073741824'), SM_C2)} AS {o}_b"
        for o in exprs
    )
    c = ", ".join(
        f"{_mm64(_x64(f'{o}_b', f'{o}_b // 134217728'), SM_C3)} AS {o}_c"
        for o in exprs
    )
    f = ", ".join(
        f"CAST({_x64(f'{o}_c', f'{o}_c // 2147483648')} % 9223372036854775808 "
        f"AS BIGINT) AS {o}"
        for o in exprs
    )
    return (
        f"{prefix}a AS (SELECT {cols}, {a} FROM {src}),\n"
        f"{prefix}b AS (SELECT {cols}, {b} FROM {prefix}a),\n"
        f"{prefix}c AS (SELECT {cols}, {c} FROM {prefix}b),\n"
        f"{prefix}f AS (SELECT {cols}, {f} FROM {prefix}c)"
    )


def rolling_hash_ctes(k: int, key: str = "url", docs: str = "docs") -> str:
    """CTEs from ``{docs}(key, text)`` to ``hs(key, i, h)``: the production
    63-bit shingle hash of every k-character window (i = 1-based window
    start; only full windows).  Matches ``hashing.shingle_hashes`` bitwise.
    """
    pows = [pow(BASE, k - 1 - j, M64) for j in range(k)]
    terms = " + ".join(
        (f"cp * {p}" if j == 0 else f"lead(cp, {j}) OVER w * {p}")
        for j, p in enumerate(pows)
    )
    sm = sm64_ctes("sm_", "win", [key, "i"], {"h": "x0"})
    return f"""chars AS (
  SELECT {key}, unnest(cs) AS c, unnest(range(1, len(cs) + 1)) AS i
  FROM (SELECT {key}, regexp_split_to_array(text, '') AS cs FROM {docs})
),
cps AS (SELECT {key}, i, CAST(unicode(c) AS HUGEINT) AS cp FROM chars),
winraw AS (
  SELECT {key}, i, ({terms}) % 18446744073709551616 AS x0,
         lead(cp, {k - 1}) OVER w IS NOT NULL AS fullw
  FROM cps WINDOW w AS (PARTITION BY {key} ORDER BY i)
),
win AS (SELECT {key}, i, x0 FROM winraw WHERE fullw),
{sm},
hs AS (SELECT {key}, i, h FROM sm_f)"""


_DOCS_URL = (
    "docs AS (SELECT 'doc://' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url, "
    "text FROM documents)"
)


def simhash_sketch_ctes(k: int = 5) -> str:
    """CTEs docs→...→sk(url, simhash): the 63-bit simhash sketch, one row per
    doc (0 for docs shorter than k — same as ``simhash_batch``)."""
    bits = ", ".join(
        f"sum(CAST((CAST(h AS UBIGINT) >> {j}) & 1 AS BIGINT)) AS b{j}"
        for j in range(63)
    )
    sketch = " + ".join(f"CASE WHEN 2 * b{j} > nw THEN {1 << j} ELSE 0 END" for j in range(63))
    return f"""{_DOCS_URL},
{rolling_hash_ctes(k)},
votes AS (SELECT url, count(*) AS nw, {bits} FROM hs GROUP BY url),
sk0 AS (SELECT url, CAST({sketch} AS BIGINT) AS simhash FROM votes),
sk AS (
  SELECT d.url, COALESCE(sk0.simhash, 0) AS simhash
  FROM docs d LEFT JOIN sk0 USING (url)
)"""


def simhash_select(k: int = 5) -> str:
    return f"WITH {simhash_sketch_ctes(k)}\nSELECT url, simhash FROM sk"


def fingerprints_select(k: int = 8, window: int = 16) -> str:
    """Winnowing fingerprints (functions/text.py fingerprint_batch): min hash
    per sliding ``window`` of consecutive window-hashes, distinct per doc,
    XOR-combined; docs with no k-window emit (0, 0)."""
    return f"""WITH {_DOCS_URL},
{rolling_hash_ctes(k)},
wm AS (
  SELECT url,
         min(h) OVER (PARTITION BY url ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY url) AS m,
         row_number() OVER (PARTITION BY url ORDER BY i) AS rn
  FROM hs
),
sel AS (SELECT url, wmin FROM wm WHERE rn <= greatest(m - {window - 1}, 1)),
agg AS (
  SELECT url, bit_xor(DISTINCT wmin) AS fingerprint,
         count(DISTINCT wmin) AS n_fingerprints
  FROM sel GROUP BY url
)
SELECT d.url, COALESCE(a.fingerprint, 0) AS fingerprint,
       COALESCE(a.n_fingerprints, 0) AS n_fingerprints
FROM docs d LEFT JOIN agg a USING (url)"""


def winnow_sel_ctes(k: int = 16, window: int = 25) -> str:
    """CTE chain ``documents -> sel(doc_id, fp)``: each doc's distinct
    robust-winnowing fingerprints — the bitwise SQL face of
    ``winnow_fingerprints(shingle_hashes(text, k), window)``
    (stages/substr.py)."""
    return f"""docs AS (SELECT doc_id, text FROM documents),
{rolling_hash_ctes(k, key="doc_id", docs="docs")},
wm AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS m,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM hs
),
sel AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm
        WHERE rn <= greatest(m - {window - 1}, 1))"""


def winnow_candidates_ctes(k: int = 16, window: int = 25, cap: int = 64) -> str:
    """CTE chain ``documents -> cand(da, db)``: the candidate doc pairs that
    share at least one winnowing fingerprint whose global bucket holds
    between 2 and ``cap`` docs — the exact SQL face of
    ``pairs_by_key(fp_ds, bucket_cap=cap)`` over
    ``winnow_fingerprints(shingle_hashes(text, k), window)``
    (pipelines/queries.py q_exact_substring_spans).  With
    ``window = min_len - k + 1`` any pair sharing a verbatim substring of
    length >= min_len shares a fingerprint, so composing ``cand`` with a
    min_len-gram match reproduces the capped candidate stage bitwise."""
    return f"""{winnow_sel_ctes(k, window)},
bsz AS (SELECT fp, count(*) AS c FROM sel GROUP BY fp),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN bsz ON bsz.fp = a.fp WHERE bsz.c <= {cap}
)"""


def minhash_signatures_select(num_perm: int = 16, k: int = 17) -> str:
    """MinHash signatures (stages/minhash.py): s_p = min over a doc's shingle
    hashes of splitmix64(h XOR seed_p) masked to 63 bits, plus distinct /
    posting counts.  Docs shorter than k have no row (no shingles)."""
    import numpy as np

    from ..stages.minhash import perm_seeds

    seeds = perm_seeds(num_perm).astype(np.uint64)
    perm_exprs = {
        f"p{p:03d}": _x64("CAST(h AS HUGEINT)", str(int(seeds[p])))
        for p in range(num_perm)
    }
    sm = sm64_ctes("pm_", "hs", ["uid", "h"], perm_exprs)
    mins = ", ".join(f"min(p{p:03d}) AS s{p:03d}" for p in range(num_perm))
    return f"""WITH docs AS (SELECT doc_id AS uid, text FROM documents),
{rolling_hash_ctes(k, key="uid")},
{sm}
SELECT uid, {mins},
       count(DISTINCT h) AS n_dup_distinct,
       count(*) AS n_dup_postings
FROM pm_f GROUP BY uid"""


def simhash_candidates_select(
    k: int = 5, prefix_bits: int = 16, bucket_cap: int = 256
) -> str:
    """Manku rotated-prefix candidate pairs over the simhash sketch
    (functions/simhash.py hamming_candidates): 4 rotations of 16 bits; docs
    sharing a (rotation, prefix) bucket of size <= cap pair up; n = number of
    shared buckets.  Rotation r of the 63-bit-masked sketch runs in the
    64-bit domain exactly as the numpy code does: for r=0 a 64-bit shift by
    64 wraps to 0 on x86/numpy, making rotation 0 the identity."""
    rot_cases = ["CAST(simhash AS HUGEINT)"]
    for r in range(1, 4):
        s = 16 * r
        # (simhash << s) mod 2^64 and (simhash >> (64-s)) occupy disjoint
        # bits, so OR == addition; then mask to 63 bits
        rot_cases.append(
            f"((CAST(simhash AS HUGEINT) * {1 << s}) % 18446744073709551616 "
            f"+ CAST(simhash AS HUGEINT) // {1 << (64 - s)}) % 9223372036854775808"
        )
    case = " ".join(
        f"WHEN band = {r} THEN CAST(({e}) // {1 << (63 - prefix_bits)} AS BIGINT)"
        for r, e in enumerate(rot_cases)
    )
    return f"""WITH {simhash_sketch_ctes(k)},
bands AS (
  SELECT url, band, CASE {case} END AS prefix
  FROM sk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)
),
bkt AS (
  SELECT band, prefix FROM bands GROUP BY band, prefix
  HAVING count(*) BETWEEN 2 AND {bucket_cap}
),
pr AS (
  SELECT a.url AS id_a, b.url AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.prefix = b.prefix AND a.url < b.url
  JOIN bkt ON bkt.band = a.band AND bkt.prefix = a.prefix
)
SELECT id_a, id_b, count(*) AS n FROM pr GROUP BY id_a, id_b"""


def kmv_select(k: int = 256, shingle_k: int = 17) -> str:
    """Bottom-k (KMV) distinct-shingle cardinality sketch over the corpus's
    production char-shingle hashes (functions/sketch.py kmv_estimate,
    hash_bits=63): estimate = (k-1) * 2^63 / kth computed in the same IEEE
    operation order, so the doubles match bitwise."""
    return f"""WITH {_DOCS_URL},
{rolling_hash_ctes(shingle_k)},
sel AS (SELECT DISTINCT h FROM hs ORDER BY h LIMIT {k}),
agg AS (SELECT count(*) AS k_used, max(h) AS kth FROM sel)
SELECT k_used AS k,
       COALESCE(kth, 0) AS kth_hash,
       CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
            ELSE (CAST(k_used - 1 AS DOUBLE) * 9223372036854775808.0)
                 / CAST(kth AS DOUBLE) END AS estimate
FROM agg"""


def rademacher_lsh_select(
    n_tables: int = 16,
    n_bits: int = 5,
    dim: int = 64,
    quant: int = 1024,
    threshold: float = 0.4,
    cap: int = 1024,
) -> str:
    """DuckDB face of ``functions.embed.hyperplane_lsh_pairs`` with
    ``plane_kind="rademacher"``: replays the splitmix64 ±1 plane entries,
    the integer quantisation ``floor(x*quant + 0.5)`` and the exact int64
    projections bitwise, so the candidate buckets — and hence the verified
    (vec_a, vec_b) output — match the Ray pipeline value-for-value."""
    sm = sm64_ctes("rl_", "ixs", ["t", "b", "d"], {"h": "ix"})
    return f"""WITH v AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
), q AS (
  SELECT vec_id, d,
         CAST(floor(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT) AS qv
  FROM v
), ixs AS (
  SELECT t, b, d, CAST((t * {n_bits} + b) * {dim} + d AS HUGEINT) AS ix
  FROM range(0, {n_tables}) AS rt(t),
       range(0, {n_bits}) AS rb(b),
       range(0, {dim}) AS rd(d)
),
{sm},
signs AS (SELECT t, b, d, CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END AS s
          FROM rl_f),
proj AS (
  SELECT q.vec_id, s.t, s.b, SUM(q.qv * s.s) AS dot
  FROM q JOIN signs s USING (d) GROUP BY 1, 2, 3
), keys AS (
  SELECT vec_id, t,
         t * {1 << n_bits}
         + SUM(CASE WHEN dot > 0
               THEN (1::BIGINT << ({n_bits} - 1 - b)) ELSE 0 END) AS bucket
  FROM proj GROUP BY vec_id, t
), rk AS (
  SELECT bucket, vec_id,
         row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS r
  FROM keys
), cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM rk a JOIN rk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE a.r <= {cap} AND b.r <= {cap}
)
SELECT c.va AS vec_a, c.vb AS vec_b
FROM cand c JOIN embeddings ea ON ea.vec_id = c.va
            JOIN embeddings eb ON eb.vec_id = c.vb
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}"""
