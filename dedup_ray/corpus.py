"""Deterministic synthetic web-page corpus with planted duplicate structure.

Mirrors FIXTURES.md §1: one Parquet-shaped table
``(url, warc_ts, html, binary, text, lang)`` whose ``html`` wraps ``text`` so
that :func:`dedup_ray.stages.extract.extract_text` reproduces ``text``
byte-identically, plus a ``truth_pairs`` table of planted relations.

The planted groups exercise every reference decision branch
(``/root/reference/dedup/dedup.py:258-307``, ``contig.py:134-191``):
exact clusters, near dups, containment-asymmetric pairs, prefix/suffix
overlaps, long-shared-substring pairs, multi-interval docs, boilerplate-heavy
uniques, hot-bucket adversaries, singletons.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _vocab(rng: np.random.Generator, n: int = 600) -> list[str]:
    words = set()
    out = []
    while len(out) < n:
        ln = int(rng.integers(3, 9))
        w = "".join(rng.choice(_LETTERS, size=ln))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def _wrap_html(text: str, title: str) -> bytes:
    esc = lambda s: _html.escape(s, quote=False)
    paras = "".join(f"<p>{esc(p)}</p>" for p in text.split("\n"))
    doc = (
        "<html><head><title>"
        + esc(title)
        + '</title><script>var x = 1 < 2;</script></head><body>'
        + '<div class="nav">home | about | contact</div>'
        + paras
        + '<style>p { color: black; }</style>'
        + '<div class="footer">&copy; 2024 example</div>'
        + "</body></html>"
    )
    return doc.encode("utf-8")


class _Builder:
    def __init__(self, seed: int, n_docs: int = 1000, len_scale: float = 1.0):
        self.rng = np.random.default_rng(seed)
        # vocabulary scales with corpus size (~30*sqrt(n)) so ACCIDENTAL
        # cross-document shingle collisions stay a constant small rate, as in
        # natural web text; planted duplicate groups provide the real signal.
        n_vocab = max(600, int(30 * n_docs**0.5))
        self.vocab = np.array(_vocab(self.rng, n_vocab))
        self.len_scale = len_scale
        self.texts: list[str] = []
        self.kinds: list[str] = []
        self.pairs: list[tuple[int, int, str]] = []  # (i, j, kind) with i < j

    def words(self, n_chars: int, vocab: np.ndarray | None = None) -> str:
        n_chars = int(n_chars * self.len_scale)
        v = self.vocab if vocab is None else vocab
        out = []
        total = 0
        while total < n_chars:
            w = str(v[int(self.rng.integers(0, len(v)))])
            out.append(w)
            total += len(w) + 1
        txt = " ".join(out)
        return txt[:n_chars] if len(txt) > n_chars else txt

    def add(self, text: str, kind: str) -> int:
        self.texts.append(text)
        self.kinds.append(kind)
        return len(self.texts) - 1

    def pair(self, i: int, j: int, kind: str) -> None:
        self.pairs.append((min(i, j), max(i, j), kind))

    def doc_len(self, lo: int = 200, hi: int = 2000) -> int:
        return int(self.rng.integers(lo, hi))

    def perturb(self, text: str, frac: float) -> str:
        """Token-level edits: replace ~frac of words with fresh vocab words."""
        toks = text.split(" ")
        n_edit = max(1, int(len(toks) * frac))
        idx = self.rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
        for i in idx:
            toks[i] = str(self.vocab[int(self.rng.integers(0, len(self.vocab)))])
        return " ".join(toks)


def build_corpus(
    n_docs: int, seed: int = 42, *, len_scale: float = 1.0, url_offset: int = 0
) -> tuple[pa.Table, pa.Table]:
    """Returns (pages, truth_pairs).

    pages: url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
    truth_pairs: url_a, url_b, kind  (url_a < url_b lexicographically not guaranteed;
    pair order is by doc index — tests canonicalise).
    """
    b = _Builder(seed, n_docs, len_scale)
    rng = b.rng

    budget = n_docs
    # ~8% exact-dup cluster members
    while len(b.texts) < 0.08 * budget:
        size = int(rng.integers(2, 6))
        t = b.words(b.doc_len())
        members = [b.add(t, "exact") for _ in range(size)]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                b.pair(members[x], members[y], "exact")
    # ~8% near-dup members (copy + 1-5% token edits)
    while len(b.texts) < 0.16 * budget:
        base = b.words(b.doc_len())
        i = b.add(base, "near")
        j = b.add(b.perturb(base, float(rng.uniform(0.01, 0.05))), "near")
        b.pair(i, j, "near")
    # ~4% containment-asymmetric: B = A + 2x unrelated suffix
    while len(b.texts) < 0.20 * budget:
        base = b.words(b.doc_len(200, 800))
        i = b.add(base, "contain")
        j = b.add(base + " " + b.words(2 * len(base)), "contain")
        b.pair(i, j, "contain")
    # ~4% prefix/suffix overlap: B's head == A's tail (40%)
    while len(b.texts) < 0.24 * budget:
        a = b.words(b.doc_len(500, 1500))
        cut = int(len(a) * 0.6)
        shared = a[cut:]
        bdoc = shared + " " + b.words(int(len(a) * 0.9))
        i = b.add(a, "overlap")
        j = b.add(bdoc, "overlap")
        b.pair(i, j, "overlap")
    # ~4% long-shared-substring mid-document
    while len(b.texts) < 0.28 * budget:
        block = b.words(300)
        a = b.words(400) + " " + block + " " + b.words(400)
        c = b.words(350) + " " + block + " " + b.words(450)
        i = b.add(a, "substr")
        j = b.add(c, "substr")
        b.pair(i, j, "substr")
    # ~2% multi-interval: doc duplicated against two partners at both ends
    while len(b.texts) < 0.30 * budget:
        head = b.words(400)
        tail = b.words(400)
        mid = b.words(300)
        center = b.add(head + " " + mid + " " + tail, "multi")
        p1 = b.add(head + " " + b.words(600), "multi")
        p2 = b.add(b.words(600) + " " + tail, "multi")
        b.pair(center, p1, "multi")
        b.pair(center, p2, "multi")
    # ~8% boilerplate-heavy uniques (shared nav/footer word runs)
    boiler = b.words(120)
    while len(b.texts) < 0.38 * budget:
        b.add(boiler + " " + b.words(b.doc_len(300, 1200)) + " " + boiler, "boiler")
    # ~2% hot-bucket adversary: many near-empty docs, identical tiny shingle set
    tiny = b.words(40)
    while len(b.texts) < 0.40 * budget:
        b.add(tiny, "hot")
    # rest: singletons
    while len(b.texts) < budget:
        b.add(b.words(b.doc_len()), "single")

    n = len(b.texts)
    urls = [
        f"https://site{(url_offset + i) % 97}.example/p{url_offset + i}"
        for i in range(n)
    ]
    langs = [("en", "en", "en", "de", "fr")[i % 5] for i in range(n)]
    ts = [(_EPOCH.timestamp() + i * 997) for i in range(n)]
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array((np.array(ts) * 1e6).astype("int64"), type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "html": pa.array(
                [_wrap_html(t, f"page {i}") for i, t in enumerate(b.texts)], type=pa.binary()
            ),
            "text": pa.array(b.texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    truth = pa.table(
        {
            "url_a": pa.array([urls[i] for i, _, _ in b.pairs]),
            "url_b": pa.array([urls[j] for _, j, _ in b.pairs]),
            "kind": pa.array([k for _, _, k in b.pairs]),
        }
    )
    return pages, truth


def write_corpus(out_dir: str, n_docs: int, seed: int = 42, num_files: int = 8) -> str:
    """Write the corpus as partitioned parquet (idempotent: skip if manifest
    matches).  Returns the pages directory path."""
    import json
    import os

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "MANIFEST.json")
    want = {"n_docs": n_docs, "seed": seed, "num_files": num_files, "v": 4}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    pages, truth = build_corpus(n_docs, seed)
    os.makedirs(pages_dir, exist_ok=True)
    step = (pages.num_rows + num_files - 1) // num_files
    for f_idx, start in enumerate(range(0, pages.num_rows, step)):
        pq.write_table(pages.slice(start, step), os.path.join(pages_dir, f"part-{f_idx:04d}.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "truth_pairs.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir


def write_corpus_parallel(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    num_files: int = 64,
    len_scale: float = 1.0,
) -> str:
    """Parallel deterministic generation: one Ray task per chunk, each built
    with its own derived seed + url offset (globally unique urls; planted
    duplicate groups stay within a chunk).  Idempotent via manifest."""
    import json
    import os

    import ray

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "MANIFEST.json")
    want = {
        "n_docs": n_docs, "seed": seed, "num_files": num_files,
        "len_scale": len_scale, "v": 4, "parallel": True,
    }
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    os.makedirs(pages_dir, exist_ok=True)

    @ray.remote
    def gen_chunk(idx: int, count: int, offset: int) -> int:
        pages, _ = build_corpus(
            count, seed + 1000 * idx, len_scale=len_scale, url_offset=offset
        )
        pq.write_table(pages, os.path.join(pages_dir, f"part-{idx:04d}.parquet"))
        return pages.num_rows

    chunk = (n_docs + num_files - 1) // num_files
    futs = []
    offset = 0
    for idx in range(num_files):
        count = min(chunk, n_docs - offset)
        if count <= 0:
            break
        futs.append(gen_chunk.remote(idx, count, offset))
        offset += count
    ray.get(futs)
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir
