"""TinyUIE — a seed-frozen, pure-NumPy stand-in for the UIE encoder.

The reference model is an ERNIE-style BERT encoder with two per-token
sigmoid pointer heads (/root/reference/model.py:75-77, 165-170). Torch
and pretrained weights are unavailable in this environment, so both
the Spark engine and the eager parity oracle share THIS deterministic
miniature of the same architecture: token+position+segment embeddings,
pre-computed from a fixed seed, N transformer layers (masked MHSA +
GELU FFN, post-LN), and sigmoid start/end heads. Swapping in a real
UIE checkpoint later only replaces this module's ``forward`` — every
other stage of the pipeline (tokenize, decode, join, vote, merge) is
model-agnostic.

Properties the pipeline depends on (unit-tested):

* Deterministic: weights are a pure function of ``seed``; every
  executor regenerates them locally (~8 MB) — nothing to ship.
* Bitwise batch-invariant via BUCKETED padding: BLAS reassociates
  reductions differently for different K (= padded sequence length),
  so plain longest-in-batch padding is NOT bitwise stable. Instead
  ``forward_bucketed`` pads every row to a length that is a pure
  function of the row itself (next multiple of PAD_BUCKET) and runs
  one forward per bucket; masked attention (additive -1e9, exp
  underflows to exactly 0.0) makes the bucket pad columns exact
  zeros. Result: a row's probabilities are byte-identical no matter
  how Spark's Arrow batching groups rows — unit-tested.
* Sparse firing: pointer-head biases are negative so only a small
  fraction of positions clear the 0.5 threshold — keeping synthetic
  extraction volumes realistic.
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

import numpy as np

from .tokenizer import VOCAB_SIZE

DEFAULT_SEED = 20240816
PAD_BUCKET = 32


class TinyUIE:
    def __init__(
        self,
        seed: int = DEFAULT_SEED,
        hidden: int = 64,
        layers: int = 2,
        # single head: same FLOPs as multi-head at equal hidden size,
        # but square GEMM shapes (dk=64 not 16) and 4x less softmax
        # memory traffic -> ~2.8x faster per row (measured); the
        # weight stream is head-count independent, and a real UIE
        # checkpoint swap replaces forward() wholesale anyway.
        heads: int = 1,
        ffn: int = 128,
        max_pos: int = 512,
        head_bias: float = -2.8,
    ):
        self.seed = seed
        self.h = hidden
        self.layers = layers
        self.heads = heads
        self.dk = hidden // heads
        rng = np.random.default_rng(seed)

        def w(*shape, scale=0.05):
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        self.tok_emb = w(VOCAB_SIZE, hidden, scale=0.1)
        self.pos_emb = w(max_pos, hidden, scale=0.1)
        self.seg_emb = w(2, hidden, scale=0.1)
        self.blocks = []
        for _ in range(layers):
            self.blocks.append(
                {
                    "wq": w(hidden, hidden),
                    "wk": w(hidden, hidden),
                    "wv": w(hidden, hidden),
                    "wo": w(hidden, hidden),
                    "ln1_g": np.ones(hidden, dtype=np.float32),
                    "ln1_b": np.zeros(hidden, dtype=np.float32),
                    "w1": w(hidden, ffn),
                    "b1": np.zeros(ffn, dtype=np.float32),
                    "w2": w(ffn, hidden),
                    "b2": np.zeros(hidden, dtype=np.float32),
                    "ln2_g": np.ones(hidden, dtype=np.float32),
                    "ln2_b": np.zeros(hidden, dtype=np.float32),
                }
            )
        self.w_start = w(hidden, 1, scale=0.2)
        self.b_start = np.float32(head_bias)
        self.w_end = w(hidden, 1, scale=0.2)
        self.b_end = np.float32(head_bias)

    @staticmethod
    def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return ((x - mu) / np.sqrt(var + np.float32(1e-5))) * g + b

    @staticmethod
    def _gelu(x: np.ndarray) -> np.ndarray:
        c = np.float32(0.7978845608028654)  # sqrt(2/pi)
        return (
            np.float32(0.5)
            * x
            * (np.float32(1.0) + np.tanh(c * (x + np.float32(0.044715) * x * x * x)))
        )

    def forward(
        self,
        input_ids: np.ndarray,
        token_type_ids: np.ndarray,
        attention_mask: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, L) int64 inputs -> (start_prob, end_prob) float32 (B, L).

        Mirrors the reference forward contract (model.py:165-170):
        sigmoid per-token start/end probabilities.
        """
        B, L = input_ids.shape
        x = (
            self.tok_emb[input_ids]
            + self.pos_emb[:L][None, :, :]
            + self.seg_emb[token_type_ids]
        ).astype(np.float32)

        # additive key mask: 0 for real tokens, -1e9 for pads (exp -> 0.0)
        # shape (B, 1, 1, L) broadcasting over heads and query positions
        neg = np.where(
            attention_mask[:, None, None, :] == 0, np.float32(-1e9), np.float32(0.0)
        )

        inv_sqrt_dk = np.float32(1.0 / np.sqrt(self.dk))
        for blk in self.blocks:
            q = x @ blk["wq"]
            k = x @ blk["wk"]
            v = x @ blk["wv"]
            # (B, heads, L, dk)
            def split(t):
                return t.reshape(B, L, self.heads, self.dk).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            # softmax computed IN PLACE — the (B, heads, L, L) score
            # tensor dominates memory traffic at L=512; fresh arrays
            # per step would double DRAM bandwidth, which is what caps
            # many-core scaling of this kernel
            scores = qh @ kh.transpose(0, 1, 3, 2)
            scores *= inv_sqrt_dk
            scores += neg
            m = scores.max(axis=-1, keepdims=True)
            scores -= m
            np.exp(scores, out=scores)
            denom = scores.sum(axis=-1, keepdims=True)
            scores /= denom
            ctx = (scores @ vh).transpose(0, 2, 1, 3).reshape(B, L, self.h)
            x = self._ln(x + ctx @ blk["wo"], blk["ln1_g"], blk["ln1_b"])
            ff = self._gelu(x @ blk["w1"] + blk["b1"]) @ blk["w2"] + blk["b2"]
            x = self._ln(x + ff, blk["ln2_g"], blk["ln2_b"])

        start_prob = _sigmoid(x @ self.w_start[:, 0] + self.b_start)
        end_prob = _sigmoid(x @ self.w_end[:, 0] + self.b_end)
        # the reference never masks pad positions (its trailing-pad trim
        # at uie_predictor.py:501-504 is dead code); we zero them on BOTH
        # the Spark and oracle sides — documented symmetric deviation
        # that removes pad-garbage spans.
        mask = attention_mask.astype(np.float32)
        special = (input_ids == 1) | (input_ids == 2)  # CLS/SEP
        keep = mask * (~special).astype(np.float32)
        return (start_prob * keep).astype(np.float32), (end_prob * keep).astype(np.float32)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return (np.float32(1.0) / (np.float32(1.0) + np.exp(-x))).astype(np.float32)


def _bucket_len(n: int, max_pos: int) -> int:
    b = ((max(n, 1) + PAD_BUCKET - 1) // PAD_BUCKET) * PAD_BUCKET
    return min(b, max_pos)


def forward_bucketed(
    model: TinyUIE,
    input_ids: np.ndarray,
    token_type_ids: np.ndarray,
    attention_mask: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-invariant forward: rows are grouped by their bucketed
    length (next multiple of PAD_BUCKET of the row's real length) and
    each group is forwarded at exactly that length, so a row's output
    never depends on what else is in the Arrow batch. Inputs are
    (B, L) zero-padded arrays; outputs are (B, L) float32."""
    B, L = input_ids.shape
    real = attention_mask.sum(axis=1).astype(np.int64)
    max_pos = model.pos_emb.shape[0]
    buckets = np.array([_bucket_len(int(n), max_pos) for n in real])
    start = np.zeros((B, L), dtype=np.float32)
    end = np.zeros((B, L), dtype=np.float32)
    # bound the attention-score tensor (rows*heads*L*L floats) so one
    # sub-batch stays ~256 MB even at L=512 — the Spark analogue of the
    # reference's batch_size loop (uie_predictor.py:455-459). Sub-batch
    # splits are along M (rows) only, which BLAS computes row-
    # independently, so they never change the numbers.
    # ~2 MB of f32 scores per sub-batch: keeps the softmax element-wise
    # passes in per-core cache instead of streaming DRAM — measured to
    # be the difference between ~0.5 and ~0.8 scaling efficiency at
    # 8 -> 32 concurrent workers on one box
    score_budget = 500_000  # rows * L^2 elements
    for bl in np.unique(buckets):
        idx = np.nonzero(buckets == bl)[0]
        n = min(int(bl), L)
        if int(bl) > L:
            pad = int(bl) - L
            ids = np.pad(input_ids[idx], ((0, 0), (0, pad)))
            tt = np.pad(token_type_ids[idx], ((0, 0), (0, pad)))
            am = np.pad(attention_mask[idx], ((0, 0), (0, pad)))
        else:
            ids = input_ids[idx, : int(bl)]
            tt = token_type_ids[idx, : int(bl)]
            am = attention_mask[idx, : int(bl)]
        step = max(1, score_budget // (int(bl) * int(bl)))
        for lo in range(0, idx.shape[0], step):
            hi = lo + step
            s, e = model.forward(ids[lo:hi], tt[lo:hi], am[lo:hi])
            start[idx[lo:hi], :n] = s[:, :n]
            end[idx[lo:hi], :n] = e[:, :n]
    return start, end


_CACHE: Dict[int, TinyUIE] = {}
_LOCK = threading.Lock()


def get_model(seed: int = DEFAULT_SEED) -> TinyUIE:
    """Per-process lazy singleton — the Spark analogue of the
    reference's load-once predictor (uie_predictor.py:153-158); each
    executor Python worker builds the weights exactly once."""
    with _LOCK:
        m = _CACHE.get(seed)
        if m is None:
            m = TinyUIE(seed=seed)
            _CACHE[seed] = m
        return m
