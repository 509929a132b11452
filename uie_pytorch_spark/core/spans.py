"""Span-decode core: threshold -> start/end pairing -> char-offset
mapping -> span records.

Re-derived from the reference semantics (do-not-copy rule):

* threshold:   /root/reference/utils.py:125-151 (strictly greater than)
* pairing:     /root/reference/utils.py:77-122 (two-pointer; for each
               end token the LARGEST start <= end wins; each start is
               consumed once; ends without a remaining start <= them
               are dropped)
* offset map:  /root/reference/utils.py:539-557 (prompt tokens are
               rebased to negative char offsets; span probability is
               p_start * p_end)
* result conv: /root/reference/uie_predictor.py:331-362 (spans that
               straddle the prompt/text boundary are dropped; end < 0
               means a classification answer sliced from the prompt)

Documented deviation from the reference: within one example the span
list order here is canonical ``(start_token, end_token)`` ascending,
whereas the reference iterates a CPython ``set`` (hash order). The
span *set* is identical; only list order differs, which matters only
for the classification vote's first-element pick — our vote uses the
same canonical order on both the Spark and oracle sides.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# (start_tok, start_prob, end_tok, end_prob)
TokenSpan = Tuple[int, float, int, float]


def threshold_ids(probs: np.ndarray, limit: float = 0.5) -> np.ndarray:
    """Indices of the 1-D ``probs`` strictly greater than ``limit``.

    Vectorized equivalent of the reference's per-element loop
    (utils.py:143-151).
    """
    probs = np.asarray(probs)
    return np.nonzero(probs > limit)[0]


def pair_spans(
    start_ids: Sequence[int],
    start_probs: Sequence[float],
    end_ids: Sequence[int],
    end_probs: Sequence[float],
) -> List[TokenSpan]:
    """Pair thresholded start/end token indices into spans.

    Semantics (utils.py:77-122): walk both index lists in ascending
    order with two pointers. While the current start index is smaller
    than the current end index, the start is recorded for that end and
    the start pointer advances — so the last (largest) start <= end is
    kept. Equal indices pair and advance both pointers. A start index
    greater than the current end advances the end pointer; an end that
    never saw a start <= it produces no span. One span per distinct
    end token at most.

    Returns spans sorted by (start_tok, end_tok) — canonical order.
    """
    order_s = np.argsort(np.asarray(start_ids, dtype=np.int64), kind="stable")
    order_e = np.argsort(np.asarray(end_ids, dtype=np.int64), kind="stable")
    ss = [int(start_ids[i]) for i in order_s]
    sp = [float(start_probs[i]) for i in order_s]
    es = [int(end_ids[i]) for i in order_e]
    ep = [float(end_probs[i]) for i in order_e]

    paired = {}  # end position -> (start_tok, start_prob, end_prob)
    i = j = 0
    while i < len(ss) and j < len(es):
        if ss[i] == es[j]:
            paired[es[j]] = (ss[i], sp[i], ep[j])
            i += 1
            j += 1
        elif ss[i] < es[j]:
            paired[es[j]] = (ss[i], sp[i], ep[j])
            i += 1
        else:
            j += 1
    spans = [(s, p_s, e, p_e) for e, (s, p_s, p_e) in paired.items()]
    spans.sort(key=lambda t: (t[0], t[2]))
    return spans


def rebase_offset_mapping(offset_mapping: np.ndarray) -> Tuple[np.ndarray, int]:
    """Rebase prompt-token offsets to negative char offsets.

    ``offset_mapping`` is (L, 2) int: per-token (char_start, char_end),
    [0,0] for special/pad tokens. The prompt length in tokens is the
    run of non-[0,0] rows starting at index 1 (utils.py:540-545); those
    rows are shifted by -(prompt_len+1) so that prompt-anchored spans
    (classification answers) come out with negative char offsets
    (utils.py:547-549).

    Returns (rebased copy, prompt_token_len).
    """
    om = np.array(offset_mapping, dtype=np.int64, copy=True)
    nonzero = ~((om[:, 0] == 0) & (om[:, 1] == 0))
    prompt_len = 0
    for k in range(1, om.shape[0]):
        if nonzero[k]:
            prompt_len += 1
        else:
            break
    if prompt_len:
        om[1 : prompt_len + 1, :] -= prompt_len + 1
    return om, prompt_len


def spans_to_char_offsets(
    spans: List[TokenSpan], offset_mapping: np.ndarray
) -> List[Tuple[int, int, float]]:
    """Token spans -> (char_start, char_end, probability).

    probability = p_start * p_end (utils.py:553-557). ``offset_mapping``
    must already be rebased (see rebase_offset_mapping).
    """
    out = []
    for s_tok, p_s, e_tok, p_e in spans:
        out.append(
            (
                int(offset_mapping[s_tok, 0]),
                int(offset_mapping[e_tok, 1]),
                float(p_s) * float(p_e),
            )
        )
    return out


def char_spans_to_results(
    char_spans: List[Tuple[int, int, float]],
    text: str,
    prompt: str,
) -> List[dict]:
    """Slice spans out of ``text`` (or ``prompt`` for classification).

    Mirrors uie_predictor.py:331-362: a span with start<0 and end>=0
    straddles the [SEP] boundary and is discarded; end<0 is a
    classification answer sliced from the prompt after shifting both
    offsets by len(prompt)+1 (no start/end keys in the record); else a
    plain text span.
    """
    results = []
    plen = len(prompt)
    for start, end, prob in char_spans:
        if start < 0 and end >= 0:
            continue
        if end < 0:
            s = start + plen + 1
            e = end + plen + 1
            results.append({"text": prompt[s:e], "probability": prob})
        else:
            results.append(
                {
                    "text": text[start:end],
                    "start": start,
                    "end": end,
                    "probability": prob,
                }
            )
    return results


def decode_example(
    start_probs: np.ndarray,
    end_probs: np.ndarray,
    offset_mapping: np.ndarray,
    limit: float = 0.5,
) -> List[Tuple[int, int, float]]:
    """Full decode for one example row: threshold both prob vectors,
    pair, rebase offsets, return (char_start, char_end, prob) triples
    in canonical order."""
    s_idx = threshold_ids(start_probs, limit)
    e_idx = threshold_ids(end_probs, limit)
    spans = pair_spans(
        s_idx.tolist(),
        np.asarray(start_probs)[s_idx].tolist(),
        e_idx.tolist(),
        np.asarray(end_probs)[e_idx].tolist(),
    )
    om, _ = rebase_offset_mapping(offset_mapping)
    return spans_to_char_offsets(spans, om)
