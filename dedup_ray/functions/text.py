"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (rolling-hash winnowing).

All are stateless/actor map_batches stages over the doc tables; outputs are
integer-dominated so driver value-hash comparisons stay exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import shingle_hashes

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}
_LANGS = sorted(_STOPWORDS)


class LangId:
    """Actor stage: n-gram/stopword language heuristic.

    State (stopword lookup sets, CJK range) built once per actor.
    """

    def __init__(self):
        self.stopwords = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds, hits = [], []
        for t in texts:
            # CJK codepoint share decides zh before stopword voting
            n_cjk = sum(1 for c in t[:500] if "一" <= c <= "鿿")
            if n_cjk > 0.2 * min(len(t), 500) and len(t) > 0:
                preds.append("zh")
                hits.append(n_cjk)
                continue
            toks = t.lower().split(" ")
            best_lang, best_hits = "en", -1
            for lang in _LANGS:
                h = sum(1 for w in toks if w in self.stopwords[lang])
                if h > best_hits:
                    best_lang, best_hits = lang, h
            preds.append(best_lang)
            hits.append(best_hits)
        cols = {}
        if "doc_id" in batch.column_names:
            cols["doc_id"] = batch.column("doc_id")
        else:
            cols["url"] = batch.column("url")
        cols["pred_lang"] = pa.array(preds, type=pa.string())
        cols["stopword_hits"] = pa.array(np.array(hits, dtype=np.int64))
        if "lang" in batch.column_names:
            cols["lang"] = batch.column("lang")
        return pa.table(cols)


def lang_id_docs(docs):
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: length, token stats, punctuation/upper counts and a
    single-division token-length ratio."""
    texts = batch.column("text").to_pylist()
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    n_tokens = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
    n_punct = np.array(
        [sum(1 for c in t if c in ".,;:!?\"'()[]{}") for t in texts], dtype=np.int64
    )
    n_upper = np.array([sum(1 for c in t if c.isupper()) for t in texts], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_tok = n_chars.astype(np.float64) / n_tokens  # single division
    cols = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    else:
        cols["url"] = batch.column("url")
    cols.update(
        {
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_punct": pa.array(n_punct),
            "n_upper": pa.array(n_upper),
            "mean_token_len": pa.array(mean_tok, type=pa.float64()),
        }
    )
    return pa.table(cols)


def quality_docs(docs):
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table, *, k: int = 8, window: int = 16) -> pa.Table:
    """Winnowing fingerprint (Schleimer et al. robust winnowing, public
    algorithm): min shingle-hash per sliding window, deduplicated; the doc
    fingerprint is an order-insensitive hash-combine of the selected mins."""
    key_col = "doc_id" if "doc_id" in batch.column_names else "url"
    texts = batch.column("text").to_pylist()
    fps = np.zeros(len(texts), dtype=np.int64)
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = shingle_hashes(t, k)
        if len(h) == 0:
            continue
        if len(h) <= window:
            sel = np.array([h.min()])
        else:
            # sliding-window minimum via stride tricks
            sw = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = np.unique(sw.min(axis=1))
        counts[i] = len(sel)
        # order-insensitive combine: XOR of selected mins (int64-safe)
        fps[i] = np.bitwise_xor.reduce(sel)
    return pa.table(
        {
            key_col: batch.column(key_col),
            "fingerprint": pa.array(fps),
            "n_fingerprints": pa.array(counts),
        }
    )


def fingerprint_docs(docs, *, k: int = 8, window: int = 16):
    return docs.map_batches(
        lambda b: fingerprint_batch(b, k=k, window=window), batch_format="pyarrow"
    )
