"""Deterministic character-level tokenizer.

The reference uses HuggingFace BertTokenizerFast on (prompt, text)
pairs producing ``[CLS] prompt [SEP] text [SEP]`` with token_type_ids
0/1 and per-token (char_start, char_end) offset mappings
(/root/reference/uie_predictor.py:443-452). HF/transformers is not
available in this environment, so we use a char-level tokenizer with
identical *structural* semantics: one token per character, offsets
relative to each segment, [0,0] offsets for special/pad tokens. For
Chinese text BERT tokenization is per-character anyway; the offset
arithmetic downstream (prompt rebase, [SEP] bias, pairing) is exactly
the reference's.

Vocabulary is a pure function of the codepoint — no vocab file to
ship to executors.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
VOCAB_OFFSET = 3
VOCAB_CHARS = 29997  # ids 3 .. 29999
VOCAB_SIZE = VOCAB_OFFSET + VOCAB_CHARS


def char_ids(s: str) -> np.ndarray:
    """Codepoint -> stable token id in [VOCAB_OFFSET, VOCAB_SIZE)."""
    if not s:
        return np.zeros(0, dtype=np.int64)
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return VOCAB_OFFSET + (cp % VOCAB_CHARS)


def encode_pair(prompt: str, text: str, max_seq_len: int = 512):
    """Encode one (prompt, text) pair.

    Returns dict of 1-D arrays (unpadded length L):
      input_ids, token_type_ids, attention_mask : int64 (L,)
      offset_mapping : int64 (L, 2) — offsets relative to the segment
        the token came from ([CLS]/[SEP]/pad -> [0,0]), matching HF
        fast-tokenizer behavior the decode math depends on.

    If the pair exceeds max_seq_len the TEXT tail is truncated (the
    chunker normally prevents this; it can still trigger for prompts
    longer than the stage's lexicographic-max prompt, see
    textnorm.max_predict_len).
    """
    budget = max_seq_len - 3 - len(prompt)
    if budget < 0:
        prompt = prompt[: max_seq_len - 3]
        budget = 0
    text = text[:budget]

    lp, lt = len(prompt), len(text)
    L = 1 + lp + 1 + lt + 1
    ids = np.empty(L, dtype=np.int64)
    ids[0] = CLS_ID
    ids[1 : 1 + lp] = char_ids(prompt)
    ids[1 + lp] = SEP_ID
    ids[2 + lp : 2 + lp + lt] = char_ids(text)
    ids[L - 1] = SEP_ID

    tt = np.zeros(L, dtype=np.int64)
    tt[2 + lp :] = 1  # text segment + final [SEP]

    om = np.zeros((L, 2), dtype=np.int64)
    ar_p = np.arange(lp, dtype=np.int64)
    om[1 : 1 + lp, 0] = ar_p
    om[1 : 1 + lp, 1] = ar_p + 1
    ar_t = np.arange(lt, dtype=np.int64)
    om[2 + lp : 2 + lp + lt, 0] = ar_t
    om[2 + lp : 2 + lp + lt, 1] = ar_t + 1

    return {
        "input_ids": ids,
        "token_type_ids": tt,
        "attention_mask": np.ones(L, dtype=np.int64),
        "offset_mapping": om,
    }


def encode_batch(prompts: Sequence[str], texts: Sequence[str], max_seq_len: int = 512, pad_to: int | None = None):
    """Encode a batch, padding to the batch-longest (or ``pad_to``).

    Returns dict of arrays shaped (B, L) / (B, L, 2). Padding is
    per-batch 'longest' — the model is bitwise padding-invariant (see
    core.model), so batch composition does not affect results.
    """
    encs = [encode_pair(p, t, max_seq_len) for p, t in zip(prompts, texts)]
    L = max((e["input_ids"].shape[0] for e in encs), default=0)
    if pad_to is not None:
        L = max(L, pad_to)
    B = len(encs)
    out = {
        "input_ids": np.zeros((B, L), dtype=np.int64),
        "token_type_ids": np.zeros((B, L), dtype=np.int64),
        "attention_mask": np.zeros((B, L), dtype=np.int64),
        "offset_mapping": np.zeros((B, L, 2), dtype=np.int64),
    }
    for b, e in enumerate(encs):
        n = e["input_ids"].shape[0]
        out["input_ids"][b, :n] = e["input_ids"]
        out["token_type_ids"][b, :n] = e["token_type_ids"]
        out["attention_mask"][b, :n] = e["attention_mask"]
        out["offset_mapping"][b, :n] = e["offset_mapping"]
    return out
