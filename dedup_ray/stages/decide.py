"""D1/D2 — pair dedup decision + per-doc span merge.

D1 re-expresses ``dedup_pair``'s decision tail (``/root/reference/dedup/
dedup.py:216-308``): pick the side with the larger aligned fraction (ties go
to the SECOND doc of the canonical pair — strict ``>`` at ``dedup.py:244``),
then:
  * fraction > full_duplication_threshold  -> remove whole doc (0, len)
  * span start < end_buffer                -> trim head (0, end)
  * span end > len - end_buffer            -> trim tail (start, len)
  * else                                   -> try the OTHER doc; else skip.
The reference worker hardcodes 0.9 / 25000 (``dedup.py:263-264``) regardless
of CLI; we honor the config (identical defaults).

D2 merges all decisions per loser doc into its interval list (the reference
appends every pair's interval, ``dedup.py:168``).
"""

from __future__ import annotations

from ..config import DedupConfig


def decide_pair(
    best: dict,
    n_chars_q: int,
    n_chars_t: int,
    cfg: DedupConfig,
) -> tuple[int, tuple[int, int], str] | None:
    """Returns (loser_idx 0|1, (start, end), kind) or None.

    loser_idx 0 = the q side (canonical url_a), 1 = the t side.
    kind in {"full", "head", "tail"}.
    """
    pct_q = (best["qend"] - best["qstart"]) / n_chars_q
    pct_t = (best["tend"] - best["tstart"]) / n_chars_t

    def attempt(idx: int):
        if idx == 0:
            pct, start, end, length = pct_q, best["qstart"], best["qend"], n_chars_q
        else:
            pct, start, end, length = pct_t, best["tstart"], best["tend"], n_chars_t
        if pct > cfg.full_duplication_threshold:
            return (idx, (0, length), "full")
        if start < cfg.end_buffer:
            return (idx, (0, end), "head")
        if end > length - cfg.end_buffer:
            return (idx, (start, length), "tail")
        return None

    first = 0 if pct_q > pct_t else 1  # tie -> t side (dedup.py:244-255)
    result = attempt(first)
    if result is None:
        result = attempt(1 - first)
    return result
