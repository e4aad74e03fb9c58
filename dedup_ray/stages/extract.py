"""M1 — HTML → text extraction (map_batches, stateless).

Web-text analogue of the reference's FASTA parse + Contig construction
(``/root/reference/dedup/dedup.py:498-511``, ``contig.py:20-51``): the
extracted ``text`` is the document "sequence" and must be byte-identical per
``url`` across runs (BASELINE.json invariant) — the function is pure.

Extraction semantics (deterministic, no external libs):
  * drop ``<script>``/``<style>`` elements entirely,
  * the document text is the concatenation of all ``<p>...</p>`` bodies in
    order, joined with ``"\\n"``,
  * HTML entities ``&amp; &lt; &gt; &quot; &#x27;`` are unescaped.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

from ..hashing import hash_hex128, hash_u64

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1>", re.S | re.I)
_P_RE = re.compile(rb"<p(?:\s[^>]*)?>(.*?)</p>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text(html: bytes) -> str:
    """Pure: html bytes -> extracted text (one line per <p>).  Accepts str
    too (JSONL/CSV sources carry html as utf-8 text, not binary)."""
    if html is None:
        return ""
    if isinstance(html, str):
        html = html.encode()
    body = _SCRIPT_RE.sub(b"", bytes(html))
    parts = []
    for m in _P_RE.finditer(body):
        inner = _TAG_RE.sub(b"", m.group(1))
        # real crawl data contains undeclared encodings; never crash the
        # batch on one bad page (replacement chars keep the row auditable)
        parts.append(_html.unescape(inner.decode("utf-8", errors="replace")))
    return "\n".join(parts)


def extract_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, lang) -> (uid, url, warc_ts, lang, text, n_chars, text_hash).

    Drops the wide ``html`` column immediately so downstream shuffles never
    carry it (SURVEY.md §7.3).
    """
    urls = batch.column("url").to_pylist()
    texts = [extract_text(h) for h in batch.column("html").to_pylist()]
    out = pa.table(
        {
            "uid": pa.array(hash_u64(urls), type=pa.int64()),
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, type=pa.large_string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
            "text_hash": pa.array(hash_hex128(texts)),
        }
    )
    return out


def docs_from_text_batch(batch: pa.Table, url_col: str = "url", text_col: str = "text") -> pa.Table:
    """Adapter for corpora that already carry extracted text (e.g. the
    driver's ``documents`` table): build the same doc schema, no html step."""
    urls = batch.column(url_col).to_pylist()
    texts = [t if t is not None else "" for t in batch.column(text_col).to_pylist()]
    cols = {
        "uid": pa.array(hash_u64(urls), type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
        "text": pa.array(texts, type=pa.large_string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        "text_hash": pa.array(hash_hex128(texts)),
    }
    for extra in ("warc_ts", "lang"):
        if extra in batch.column_names:
            cols[extra] = batch.column(extra)
    return pa.table(cols)
