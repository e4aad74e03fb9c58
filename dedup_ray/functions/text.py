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

    State (stopword -> language bitmask lookup, CJK range) built once per
    actor; the per-token vote is ONE dict lookup returning a bitmask over
    all languages instead of one set-membership test per language."""

    def __init__(self):
        self.lut: dict[str, int] = {}
        for bit, lang in enumerate(_LANGS):
            for w in _STOPWORDS[lang]:
                self.lut[w] = self.lut.get(w, 0) | (1 << bit)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # vectorised CJK counts over one concatenated codepoint array of the
        # first 500 chars of every doc (prefix-sum differences per doc)
        heads = [t[:500] for t in texts]
        lens = np.fromiter((len(h) for h in heads), dtype=np.int64, count=len(heads))
        codes = np.frombuffer("".join(heads).encode("utf-32-le"), dtype=np.uint32)
        cjk = (codes >= ord("一")) & (codes <= ord("鿿"))
        csum = np.r_[0, np.cumsum(cjk)]
        offs = np.r_[0, np.cumsum(lens)]
        n_cjk_all = csum[offs[1:]] - csum[offs[:-1]]
        lut = self.lut
        preds, hits = [], []
        for di, t in enumerate(texts):
            # CJK codepoint share decides zh before stopword voting
            n_cjk = int(n_cjk_all[di])
            if n_cjk > 0.2 * min(len(t), 500) and len(t) > 0:
                preds.append("zh")
                hits.append(n_cjk)
                continue
            counts = [0] * len(_LANGS)
            for w in t.lower().split(" "):
                m = lut.get(w, 0)
                while m:
                    bit = (m & -m).bit_length() - 1
                    counts[bit] += 1
                    m &= m - 1
            best_lang, best_hits = "en", -1
            for bit, lang in enumerate(_LANGS):
                if counts[bit] > best_hits:
                    best_lang, best_hits = lang, counts[bit]
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


_PUNCT_CODES = np.array(sorted(ord(c) for c in ".,;:!?\"'()[]{}"), dtype=np.uint32)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: length, token stats, punctuation/upper counts and a
    single-division token-length ratio.

    One concatenated codepoint array for the whole batch; per-doc counts are
    prefix-sum differences — no per-character Python.  ``isupper`` parity
    with Python: ASCII A-Z vectorised; the (rare) distinct non-ASCII
    codepoints are each tested once with ``str.isupper``."""
    texts = batch.column("text").to_pylist()
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    codes = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    offs = np.r_[0, np.cumsum(n_chars)]

    def per_doc(mask: np.ndarray) -> np.ndarray:
        cs = np.r_[0, np.cumsum(mask)]
        return (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)

    # " ".split counts separators + 1 (also for the empty string)
    n_tokens = per_doc(codes == ord(" ")) + 1
    n_punct = per_doc(np.isin(codes, _PUNCT_CODES))
    upper = (codes >= 65) & (codes <= 90)
    non_ascii = codes[codes >= 128]
    if len(non_ascii):
        for c in np.unique(non_ascii):
            if chr(c).isupper():
                upper |= codes == c
    n_upper = per_doc(upper)
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


# BPE-ish pre-tokenization (the GPT-2 pre-tokenizer shape, simplified to an
# RE2/Python-identical form with no lookahead):
#   token := [A-Za-z]+ | [0-9]+ | any single char outside letters/digits/WS
# where WS is the explicit 5-char class below (RE2's \s; Python's \s also
# matches unicode spaces, so the class is spelled out for exact parity).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]"
_BPE_WS = np.array([ord(c) for c in "\t\n\f\r "], dtype=np.uint32)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Per-doc count of BPE_TOKEN_PATTERN matches — fully vectorised: letter
    runs and digit runs count one token at each run head (a position in the
    class whose predecessor is not), every other non-whitespace char counts
    one.  Provably equal to ``len(re.findall(BPE_TOKEN_PATTERN, text))``
    because the alternatives are disjoint character classes (a maximal run
    of one class is always one match; regex alternation cannot split or
    merge runs across class boundaries)."""
    texts = batch.column("text").to_pylist()
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    codes = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    offs = np.r_[0, np.cumsum(n_chars)]
    is_alpha = ((codes >= 65) & (codes <= 90)) | ((codes >= 97) & (codes <= 122))
    is_digit = (codes >= 48) & (codes <= 57)
    is_ws = np.isin(codes, _BPE_WS)
    # run heads: first char of the batch-concat is a head; doc starts are
    # heads too (a run never spans docs — force a break at every doc start)
    prev_alpha = np.r_[False, is_alpha[:-1]]
    prev_digit = np.r_[False, is_digit[:-1]]
    if len(offs) > 1:
        doc_starts = offs[:-1][offs[:-1] < len(codes)]
        prev_alpha[doc_starts] = False
        prev_digit[doc_starts] = False
    tok = (
        (is_alpha & ~prev_alpha)
        | (is_digit & ~prev_digit)
        | (~is_alpha & ~is_digit & ~is_ws)
    )
    cs = np.r_[0, np.cumsum(tok)]
    n_bpe = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)
    key = "doc_id" if "doc_id" in batch.column_names else "url"
    return pa.table(
        {key: batch.column(key), "n_bpe_tokens": pa.array(n_bpe)}
    )


def bpe_token_count_docs(docs):
    return docs.map_batches(bpe_token_count_batch, batch_format="pyarrow")


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


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc word-bigram repetition metrics (Gopher repetition rules shape,
    Rae et al. 2021 §A1.1, public): the char fraction covered by the most
    frequent word 2-gram and by all duplicated word 2-grams.

    Doc-local by construction — no shuffle at any scale; the whole kernel is
    one dictionary-encode + one lexsort per batch (no per-row Python).  A
    bigram's char length counts its internal space (LENGTH(w1||' '||w2));
    occurrences are counted independently (overlaps not collapsed) so the
    definition is exactly SQL-expressible and oracle-checked.  Ties on the
    top count break to the lexicographically smallest bigram.  Docs with
    fewer than two words emit nothing (they have no bigrams).
    """
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    nch = batch.column("n_chars").to_numpy(zero_copy_only=False)
    words = pc.split_pattern(batch.column("text"), pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy().astype(np.int64)
    flat = words.values
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "top_bigram": pa.array([], type=pa.string()),
            "top_bigram_count": pa.array([], type=pa.int64()),
            "top_bigram_frac": pa.array([], type=pa.float64()),
            "dup_bigram_frac": pa.array([], type=pa.float64()),
        }
    )
    nwords = len(flat)
    if nwords == 0:
        return empty
    wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # bigram start positions: every word except each doc's last
    valid = np.ones(nwords, dtype=bool)
    last = offs[1:] - 1
    valid[last[offs[1:] > offs[:-1]]] = False
    pos = np.flatnonzero(valid)
    if len(pos) == 0:
        return empty
    per_doc = np.maximum(offs[1:] - offs[:-1] - 1, 0)
    docix = np.repeat(np.arange(len(ids), dtype=np.int64), per_doc)
    c1, c2 = codes[pos], codes[pos + 1]
    glen = wl[pos] + wl[pos + 1] + 1
    # group by (doc, bigram): one lexsort, then run-length counts
    order = np.lexsort((c2, c1, docix))
    d_s, a_s, b_s = docix[order], c1[order], c2[order]
    new = np.r_[True, (d_s[1:] != d_s[:-1]) | (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    r_start = np.flatnonzero(new)
    cnt = np.diff(np.r_[r_start, len(d_s)])
    r_doc = d_s[r_start]
    r_pos = pos[order][r_start]          # a representative occurrence per run
    r_glen = glen[order][r_start]
    # per-doc dup chars: sum cnt*glen over runs with cnt >= 2
    dup = cnt >= 2
    dup_chars = np.bincount(r_doc[dup], weights=(cnt[dup] * r_glen[dup]).astype(np.float64),
                            minlength=len(ids))
    # per-doc top run: max count, ties to the lexicographically smallest gram
    doc_new = np.r_[True, r_doc[1:] != r_doc[:-1]]
    d_start = np.flatnonzero(doc_new)
    out_doc = r_doc[d_start]             # docs with >=1 bigram, ascending
    max_cnt = np.maximum.reduceat(cnt, d_start)
    cand = cnt == np.repeat(max_cnt, np.diff(np.r_[d_start, len(r_doc)]))
    cp = r_pos[cand]
    cand_gram = pc.binary_join_element_wise(
        flat.take(pa.array(cp)), flat.take(pa.array(cp + 1)), " "
    ).to_numpy(zero_copy_only=False)
    cand_doc = r_doc[cand]
    o1 = np.argsort(cand_gram, kind="stable")
    o2 = np.argsort(cand_doc[o1], kind="stable")
    first = o1[o2][np.flatnonzero(np.r_[True, cand_doc[o1][o2][1:] != cand_doc[o1][o2][:-1]])]
    top_gram = cand_gram[first]
    top_glen = r_glen[cand][first]
    nch_out = nch[out_doc].astype(np.float64)
    return pa.table(
        {
            "doc_id": pa.array(ids[out_doc], type=pa.int64()),
            "top_bigram": pa.array(top_gram, type=pa.string()),
            "top_bigram_count": pa.array(max_cnt, type=pa.int64()),
            "top_bigram_frac": pa.array((max_cnt * top_glen).astype(np.float64) / nch_out),
            "dup_bigram_frac": pa.array(dup_chars[out_doc] / nch_out),
        }
    )


def repetition_stats_docs(docs):
    return docs.map_batches(repetition_stats_batch, batch_format="pyarrow")
