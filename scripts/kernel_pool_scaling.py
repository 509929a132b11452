#!/usr/bin/env python
"""Kernel-only scaling evidence (no Spark): run the exact inference
kernel (tokenize -> TinyUIE forward -> decode) under a plain process
pool at N and 4N workers, each worker doing IDENTICAL work (weak
scaling), and report efficiency = t_N / t_4N.

This isolates what the 8->32 pair of bench.py cannot show on one box:
in local-mode Spark the single JVM's scheduling/Arrow/shuffle threads
compete with the 32 compute-bound python workers for the same 32
cores, so the measured Spark speedup understates a real cluster
(executors add NODES). The kernel pool is the transferable datapoint
for how the per-executor compute itself scales.

Usage: python scripts/kernel_pool_scaling.py [pairs]
  pairs default "2:8,8:32"; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from uie_pytorch_spark.core import pin_blas_single_thread  # noqa: E402

pin_blas_single_thread()

ROWS = 48          # (prompt, chunk) pairs per inner batch
REPEATS = 24       # inner batches per worker (~6-12 s per pool run)
CHUNK_CHARS = 480  # ~ the sf0.1 fixture's document scale


def _workload():
    from uie_pytorch_spark.sources.web_pages import generate_fixture_rows

    texts = [r[3] for r in generate_fixture_rows(n_docs=ROWS, seed=13)]
    chunks = [(t * (CHUNK_CHARS // max(len(t), 1) + 1))[:CHUNK_CHARS] for t in texts]
    prompts = ["subject entity"] * len(chunks)
    return prompts, chunks


def _worker(_i):
    pin_blas_single_thread()
    from uie_pytorch_spark.core.infer import infer_decode_batch
    from uie_pytorch_spark.core.model import get_model

    model = get_model()
    prompts, chunks = _workload()
    n = 0
    for _ in range(REPEATS):
        recs = infer_decode_batch(model, prompts, chunks)
        n += sum(len(r) for r in recs)
    return n


def _timed_pool(workers: int) -> float:
    with Pool(workers, initializer=pin_blas_single_thread) as pool:
        pool.map(_worker, range(workers))  # warm: model build + JIT
        t0 = time.monotonic()
        pool.map(_worker, range(workers))
        return time.monotonic() - t0


def main():
    pairs = [
        tuple(map(int, p.split(":")))
        for p in (sys.argv[1] if len(sys.argv) > 1 else "2:8,8:32").split(",")
    ]
    out = {"metric": "kernel_pool_weak_scaling", "rows_per_worker": ROWS * REPEATS}
    for small, big in pairs:
        ts = min(_timed_pool(small) for _ in range(2))
        tb = min(_timed_pool(big) for _ in range(2))
        out[f"pool{small}_sec"] = round(ts, 3)
        out[f"pool{big}_sec"] = round(tb, 3)
        # weak scaling: identical per-worker work, so ideal is t equal
        out[f"efficiency_{small}_to_{big}"] = round(ts / tb, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
