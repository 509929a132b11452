#!/usr/bin/env python
"""North-rule launch-mechanism scaling evidence: run the REAL
``spark-submit --py-files`` CLI (cli.py — the production entrypoint,
not an in-process session) at N and 4N cores on the same generated
corpus and report throughput at both plus the scaling efficiency.

bench.py measures the same criterion with in-process sessions and far
more weather machinery (steal tiers, quiet-gated resamples, anomaly
guard); this script exists to evidence the rule's LITERAL mechanism —
"launched by spark-submit --py-files at N and 4N executors" — end to
end: zip the package, generate a web_pages corpus (replicated so model
compute dominates the fixed JVM seconds), submit twice, parse the
CLI's own JSON output. Each submission is a fresh JVM; per-run
hypervisor steal%% is sampled from /proc/stat and reported so a
contended window is visible in the artifact.

Usage:
    python scripts/submit_scaling.py [N] [replicate]
      N default 8 (pair = local[N] vs local[4N]); replicate default 6;
      buckets default 4 (checkpoint commit units — fewer buckets
      concentrate compute per commit, more exercise the resume chain).
Prints ONE JSON line with end-to-end AND extract-stage (lineage
wall_ms) times/efficiencies, so the serial fraction (JVM startup,
sequential commits, driver-synced CC canonicalization — fixed seconds
that vanish at real scale) is separated from compute scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SCHEMA = '{"subject entity": ["related fact"]}'


def _steal_window():
    with open("/proc/stat") as f:
        p = [int(x) for x in f.readline().split()[1:]]
    return p


def _steal_pct(a, b):
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot else 0.0


def _zip_pkg(tmp: str) -> str:
    zpath = os.path.join(tmp, "uie_pytorch_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(_REPO, "uie_pytorch_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, _REPO))
    return zpath


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        print(json.dumps({"error": "spark-submit not on PATH"}))
        return 1

    tmp = tempfile.mkdtemp(prefix="submit_scaling_")
    try:
        zpath = _zip_pkg(tmp)
        corpus = os.path.join(tmp, "pages")

        # corpus gen in a short-lived local session (not timed): the
        # bench-scale documents table (distinct real-length texts —
        # the tiny fixture_web_pages templates dedup away inside the
        # engine and leave only fixed job latency to measure) recast
        # into the input_hint web_pages shape; each replica perturbs
        # the text so (prompt, chunk) dedup keeps model work
        # proportional to corpus size (same trick as bench.py)
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        from uie_pytorch_spark.sources.web_pages import write_partitioned

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "8")
            .appName("submit-scaling-gen")
            .getOrCreate()
        )
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        reps = [
            base.select(
                F.concat(
                    F.lit(f"https://r{i}.example/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.lit(f"2024-01-{(i % 28) + 1:02d} 00:00:00")
                .cast("timestamp")
                .alias("warc_ts"),
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
                F.col("lang"),
            )
            for i in range(replicate)
        ]
        corpus_df = reps[0]
        for r in reps[1:]:
            corpus_df = corpus_df.unionByName(r)
        corpus_df = corpus_df.withColumn(
            "html",
            F.concat(
                F.lit(b"<html><body>"),
                F.encode(F.col("text"), "utf-8"),
                F.lit(b"</body></html>"),
            ),
        ).select("url", "warc_ts", "html", "text", "lang")
        write_partitioned(corpus_df, corpus)
        n_pages = corpus_df.count()
        spark.stop()

        out = {"pair": f"local[{n}] -> local[{4 * n}]",
               "n_pages": n_pages, "replicate": replicate,
               "buckets": buckets}
        times, triples, extract = {}, {}, {}
        for cores in (n, 4 * n):
            run_out = os.path.join(tmp, f"out{cores}")
            cmd = [
                spark_submit,
                "--master", f"local[{cores}]",
                # local mode: ONE JVM is driver AND executor — the
                # spark-submit default of 1g OOMs the canonicalization
                # aggregations (SparkOutOfMemoryError UNABLE_TO_ACQUIRE
                # at ~stage 280); any real deployment sizes this
                "--driver-memory", "8g",
                "--conf", "spark.ui.enabled=false",
                # keep shuffle/blockmgr files out of /tmp — this
                # sandbox reaps /tmp mid-run, which manifests as
                # temp_shuffle FileNotFound task failures (real
                # deployments set spark.local.dir anyway)
                "--conf", f"spark.local.dir={os.path.join(tmp, 'scratch')}",
                "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
                "--py-files", zpath,
                os.path.join(_REPO, "uie_pytorch_spark", "cli.py"),
                "--input", corpus, "--output", run_out,
                "--schema", SCHEMA, "--buckets", str(buckets),
                "--run-id", f"scale-{cores}", "--lang", "en",
            ]
            env = dict(os.environ, OMP_NUM_THREADS="1")
            w0 = _steal_window()
            t0 = time.time()
            errlog = os.path.join(tmp, f"stderr{cores}.log")
            with open(errlog, "w") as ef:
                proc = subprocess.run(
                    cmd, stdout=subprocess.PIPE, stderr=ef,
                    text=True, env=env, cwd=_REPO,
                )
            proc_stderr_tail = open(errlog).read()[-3000:]
            dt = time.time() - t0
            w1 = _steal_window()
            if proc.returncode != 0:
                keep = f"/tmp/submit_scaling_failed_{cores}.log"
                shutil.copyfile(errlog, keep)
                print(json.dumps({
                    "error": f"spark-submit local[{cores}] failed",
                    "stderr_log": keep,
                    "stderr_tail": proc_stderr_tail[-800:],
                }))
                return 1
            last = [
                l for l in proc.stdout.strip().splitlines()
                if l.startswith("{")
            ][-1]
            res = json.loads(last)
            times[cores] = round(dt, 2)
            triples[cores] = res["triples"]
            out[f"local{cores}_sec"] = round(dt, 2)
            out[f"local{cores}_steal_pct"] = _steal_pct(w0, w1)
            out[f"local{cores}_triples"] = res["triples"]
            out[f"local{cores}_triples_per_sec"] = round(res["triples"] / dt, 1)
            # the CLI's own per-partition lineage metrics (north-rule
            # feature) record each bucket's extract wall — use them to
            # separate COMPUTE scaling from the serial commit chain +
            # JVM startup (which are fixed seconds per run by design:
            # at 10^12 docs a bucket is hours of compute per seconds
            # of commit, so the serial fraction vanishes; on a toy
            # corpus it dominates end-to-end wall)
            import pyarrow.parquet as pq

            lin = pq.read_table(
                os.path.join(run_out, "lineage")
            ).to_pylist()
            extract[cores] = round(
                sum(r["wall_ms"] for r in lin) / 1000.0, 2
            )
            out[f"local{cores}_extract_sec"] = extract[cores]
        assert triples[n] == triples[4 * n], "triple counts must match"
        out["speedup"] = round(times[n] / times[4 * n], 3)
        out["efficiency_n_to_4n"] = round(times[n] / times[4 * n] / 4.0, 3)
        out["extract_speedup"] = round(extract[n] / extract[4 * n], 3)
        out["efficiency_extract_n_to_4n"] = round(
            extract[n] / extract[4 * n] / 4.0, 3
        )
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
