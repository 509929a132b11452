#!/usr/bin/env python
"""Side benchmark harness for optimization work (guide §1).

NOT the driver contract — bench.py stays frozen. This file exists to:
  * time each bench-path query in isolation through the noop sink
    (computes every column of every row; no sink cost, no count()
    column pruning),
  * capture .explain("formatted") for each query into plans/<tag>/,
  * label jobs so the (disabled-by-default) UI and event logs are
    readable.

Usage:
    python bench_extra.py [--tag r06_before] [--reps 2] [--plans-only]
                          [--queries name1,name2,...]

Prints one JSON line: {"tag": ..., "queries": {name: best_sec},
"samples": {name: [..]}, "steal_pct": {name: [..]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
REPO = os.path.dirname(os.path.abspath(__file__))


def _cpu_jiffies():
    try:
        with open("/proc/stat") as f:
            p = [int(x) for x in f.readline().split()[1:]]
        idle = p[3] + (p[4] if len(p) > 4 else 0)
        steal = p[7] if len(p) > 7 else 0
        return steal, sum(p) - idle, sum(p)
    except Exception:
        return 0, 0, 0


def _steal_pct(before, after) -> float:
    steal = after[0] - before[0]
    busy = after[1] - before[1]
    return round(100.0 * steal / max(busy, 1), 2)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_dataframes(spark):
    """The exact dataflows bench.py times, as name -> lazy DataFrame
    builder (bench.py wraps them in .count(); here we noop-sink them)."""
    from pyspark.sql import functions as F

    from uie_pytorch_spark.operators.similarity import ivf_topk, srp_topk
    from uie_pytorch_spark.queries import QUERIES

    builders = {}

    def flagship():
        from uie_pytorch_spark.engine import UIEConfig, UIEEngine

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        eng = UIEEngine(
            spark, {"subject entity": ["related fact"]}, UIEConfig(lang="en")
        )
        spans = eng.extract(docs)
        return UIEEngine.triples(spans), eng

    builders["uie_flagship_triples"] = flagship

    for name in (
        "agg_pricing_summary",
        "join_broadcast_dims",
        "double_dim_join",
        "minhash_signature",
        "lsh_candidate_pairs",
        "simhash_fingerprint",
        "doc_fingerprint",
        "window_cumulative_offset",
        "canonicalize_surface_forms",
    ):
        builders[name] = (
            lambda n=name: (QUERIES[n](spark, SF_DIR), None)
        )

    def ann_srp():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.select("vec_id").filter(F.col("vec_id") < 50)
        return srp_topk(emb, q, k=10, planes=8, dim=64), None

    def ann_ivf():
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.select("vec_id").filter(F.col("vec_id") < 50)
        return ivf_topk(emb, q, k=10, n_centroids=32, n_probe=4), None

    builders["ann_srp_topk"] = ann_srp
    builders["ann_ivf_topk"] = ann_ivf
    return builders


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="scratch")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    from uie_pytorch_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-extra-{args.tag}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 8),
    )
    builders = build_dataframes(spark)
    if args.queries:
        keep = args.queries.split(",")
        builders = {k: v for k, v in builders.items() if k in keep}

    plans_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    out = {"tag": args.tag, "queries": {}, "samples": {}, "steal_pct": {}}
    # tiny warm-up so the first timed query doesn't pay worker spawn
    spark.range(1000).selectExpr("sum(id)").collect()
    for name, build in builders.items():
        import contextlib
        import io

        df, eng = build()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        if eng is not None:
            eng.unpersist()
        if args.plans_only:
            continue
        samples, steals = [], []
        for _ in range(args.reps):
            df, eng = build()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            j0 = _cpu_jiffies()
            t0 = time.monotonic()
            _noop(df)
            dt = time.monotonic() - t0
            steals.append(_steal_pct(j0, _cpu_jiffies()))
            samples.append(round(dt, 3))
            if eng is not None:
                eng.unpersist()
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = min(samples)
        out["samples"][name] = samples
        out["steal_pct"][name] = steals
    print(json.dumps(out))


if __name__ == "__main__":
    main()
