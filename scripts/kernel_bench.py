#!/usr/bin/env python
"""Micro-benchmark + bitwise-equality check for TinyUIE.forward
(optimization round; guide §1 measure-first).

Compares the CURRENT forward() against a frozen copy of the round-5
reference implementation on representative bucket shapes, asserting
BYTE-identical outputs (the frozen goldens pin every probability, so
a rewrite that changes a single ULP is dead on arrival).

The round-6 rewrite flattens every (B, L, h) @ (h, *) projection into
one 2D GEMM over (B*L, h) rows — numpy's stacked matmul issues B
per-slice GEMM calls — and, for the heads == 1 default, drops the
heads axis (and its transposes) from the attention block. Both only
change the GEMM M dimension / memory layout, never the K-reduction
order, so outputs are bitwise-unchanged (verified here and by the
frozen-golden suite).

Run single-threaded (OMP pinned) like the executors do:
    python scripts/kernel_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# core's import-time pin sets thread counts AND OPENBLAS_CORETYPE
# before numpy first loads — keep this import ABOVE numpy's.
from uie_pytorch_spark.core.model import TinyUIE, _sigmoid  # noqa: E402

import numpy as np  # noqa: E402


def forward_ref(self, input_ids, token_type_ids, attention_mask):
    """Round-5 reference forward (stacked 3D/4D matmuls) — the
    bitwise oracle for the flattened rewrite."""
    B, L = input_ids.shape
    x = self.tok_emb[input_ids]
    x += self.pos_emb[:L][None, :, :]
    x += self.seg_emb[token_type_ids]

    neg = np.where(
        attention_mask[:, None, None, :] == 0, np.float32(-1e9), np.float32(0.0)
    )

    inv_sqrt_dk = np.float32(1.0 / np.sqrt(self.dk))
    for blk in self.blocks:
        q = x @ blk["wq"]
        k = x @ blk["wk"]
        v = x @ blk["wv"]

        def split(t):
            return t.reshape(B, L, self.heads, self.dk).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = qh @ kh.transpose(0, 1, 3, 2)
        scores *= inv_sqrt_dk
        scores += neg
        m = scores.max(axis=-1, keepdims=True)
        scores -= m
        np.exp(scores, out=scores)
        denom = scores.sum(axis=-1, keepdims=True)
        scores /= denom
        ctx = (scores @ vh).transpose(0, 2, 1, 3).reshape(B, L, self.h)
        r = ctx @ blk["wo"]
        r += x
        x = self._ln(r, blk["ln1_g"], blk["ln1_b"])
        ff = x @ blk["w1"]
        ff += blk["b1"]
        ff = self._gelu(ff) @ blk["w2"]
        ff += blk["b2"]
        ff += x
        x = self._ln(ff, blk["ln2_g"], blk["ln2_b"])

    start_prob = _sigmoid(x @ self.w_start[:, 0] + self.b_start)
    end_prob = _sigmoid(x @ self.w_end[:, 0] + self.b_end)
    mask = attention_mask.astype(np.float32)
    special = (input_ids == 1) | (input_ids == 2)
    keep = mask * (~special).astype(np.float32)
    return (start_prob * keep).astype(np.float32), (end_prob * keep).astype(
        np.float32
    )


def make_inputs(rng, B, L, vocab=8000):
    ids = rng.integers(3, vocab, size=(B, L), dtype=np.int64)
    ids[:, 0] = 1
    lens = rng.integers(max(2, L // 2), L + 1, size=B)
    am = np.zeros((B, L), dtype=np.int64)
    tt = np.zeros((B, L), dtype=np.int64)
    for i, n in enumerate(lens):
        am[i, :n] = 1
        ids[i, n - 1] = 2
        ids[i, n:] = 0
        tt[i, n // 2 : n] = 1
    return ids, tt, am


def bench(fn, model, inputs, reps=5):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(model, *inputs)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    model = TinyUIE()
    rng = np.random.default_rng(7)
    score_budget = 500_000
    print(f"{'L':>4} {'B':>5}  {'ref ms':>9} {'new ms':>9} {'speedup':>8}  bitwise")
    tot_ref = tot_new = 0.0
    ok = True
    for L in (32, 64, 96, 128, 192, 256, 384, 512):
        B = max(1, score_budget // (L * L))
        inputs = make_inputs(rng, B, L)
        t_ref, (s0, e0) = bench(forward_ref, model, inputs)
        t_new, (s1, e1) = bench(TinyUIE.forward, model, inputs)
        same = s0.tobytes() == s1.tobytes() and e0.tobytes() == e1.tobytes()
        ok &= same
        tot_ref += t_ref
        tot_new += t_new
        print(
            f"{L:>4} {B:>5}  {t_ref*1e3:>9.2f} {t_new*1e3:>9.2f}"
            f" {t_ref/t_new:>8.2f}  {same}"
        )
        if not same:
            d = np.abs(s0.astype(np.float64) - s1)
            print(f"     MISMATCH max |d| = {d.max():.3e}")
    print(
        f"total  ref {tot_ref*1e3:.1f} ms   new {tot_new*1e3:.1f} ms   "
        f"{tot_ref/tot_new:.2f}x"
    )

    # multi-head path (artifact-loaded models may carry heads > 1)
    mh = TinyUIE(heads=2)
    for L in (32, 128, 512):
        inputs = make_inputs(rng, 8, L)
        _, (s0, e0) = bench(forward_ref, mh, inputs, reps=1)
        _, (s1, e1) = bench(TinyUIE.forward, mh, inputs, reps=1)
        same = s0.tobytes() == s1.tobytes() and e0.tobytes() == e1.tobytes()
        ok &= same
        print(f"heads=2 L={L:<4} bitwise {same}")

    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
