"""Text normalization + chunking math, shared by Spark-native
expressions and the eager oracle.

* dbc2sbc (full-width -> half-width): /root/reference/utils.py:573-585.
  Applied to PROMPTS only, never to document text
  (uie_predictor.py:238, 263) — parity-critical.
* cut_chinese_sent: /root/reference/utils.py:560-570.
* fixed-window chunking: /root/reference/uie_predictor.py:364-409
  (split_sentence=False path: plain max_text_len char windows).
"""

from __future__ import annotations

import math
import re
from typing import List, Tuple

# Full-width codepoints U+FF01..U+FF5E map to ASCII 0x21..0x7E.
# NB reference quirk (utils.py:577-584): the U+3000 ideographic-space
# branch maps it to 0x20, which then FAILS the 0x21..0x7E range check,
# so U+3000 actually passes through UNCHANGED — dead code we replicate
# by simply not mapping it.
DBC_FROM = "".join(chr(c) for c in range(0xFF01, 0xFF5F))
DBC_TO = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))
_DBC_TABLE = str.maketrans(DBC_FROM, DBC_TO)


def dbc2sbc(s: str) -> str:
    """Full-width to half-width normalization (prompt-only in the
    pipeline)."""
    return s.translate(_DBC_TABLE)


_SENT_RE_1 = re.compile(r"([。！？\?])([^”’])")
_SENT_RE_2 = re.compile(r"(\.{6})([^”’])")
_SENT_RE_3 = re.compile(r"(\…{2})([^”’])")
_SENT_RE_4 = re.compile(r"([。！？\?][”’])([^，。！？\?])")


def cut_chinese_sent(para: str) -> List[str]:
    """Chinese sentence splitter, identical regex chain to the
    reference (utils.py:560-570)."""
    para = _SENT_RE_1.sub(r"\1\n\2", para)
    para = _SENT_RE_2.sub(r"\1\n\2", para)
    para = _SENT_RE_3.sub(r"\1\n\2", para)
    para = _SENT_RE_4.sub(r"\1\n\2", para)
    para = para.rstrip()
    return para.split("\n")


def split_windows(text: str, max_text_len: int) -> List[str]:
    """Fixed-size char windows; an empty text yields one empty chunk
    (matches list-comprehension behavior at uie_predictor.py:394-397
    for the <=max case where the whole text is one chunk)."""
    if len(text) <= max_text_len:
        return [text]
    return [text[i : i + max_text_len] for i in range(0, len(text), max_text_len)]


def num_windows(n_chars: int, max_text_len: int) -> int:
    if n_chars <= max_text_len:
        return 1
    return math.ceil(n_chars / max_text_len)


def chunk_with_offsets(text: str, max_text_len: int) -> List[Tuple[int, str, int]]:
    """(chunk_idx, chunk_text, char_offset) — offset is the cumulative
    length of preceding chunks, i.e. chunk_idx * max_text_len for
    fixed windows (the reference accumulates len() per chunk,
    uie_predictor.py:551-565; all chunks but the last are full)."""
    chunks = split_windows(text, max_text_len)
    return [(i, c, i * max_text_len) for i, c in enumerate(chunks)]


MIN_PREDICT_WINDOW = 64


def max_predict_len(prompts: List[str], max_seq_len: int) -> int:
    """Reference quirk (uie_predictor.py:418): the window size deducts
    the length of the LEXICOGRAPHICALLY largest prompt (``max(...)`` on
    strings), not the longest prompt. Replicated for parity; Spark-side
    this is ``F.max(prompt)`` (also lexicographic) collected to the
    driver.

    Deviation (symmetric oracle+engine): when a prompt approaches
    max_seq_len the reference's char-window arithmetic degenerates
    (negative window -> empty/deranged chunk lists,
    uie_predictor.py:393-403). We clamp the window to
    MIN_PREDICT_WINDOW; over-long (prompt, chunk) pairs then get their
    text tail truncated identically on both sides by the tokenizer."""
    return max(max_seq_len - len(max(prompts)) - 3, MIN_PREDICT_WINDOW)
