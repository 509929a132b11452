#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "triples_per_sec": ...,
     "scaling": {"local8_sec": ..., "local32_sec": ...,
                  "efficiency_n_to_4n": ...}}

The scaling block evidences the north rule's N->4N criterion
in-sandbox: the SAME flagship job at N vs 4N cores on the same input,
efficiency = (T_N / T_4N) / 4, measured under the ENGINE-DEFAULT
config. Pairs recorded (see the comment at the scaling loop):
2:8 default (primary), 4:16 (same criterion, half-length windows —
fits lulls a 155-s local2 sample cannot), 8:32 (single-box capped);
ALL pairs get their mandatory back-to-back window BEFORE any repair
budget is spent, so every pair always lands in the JSON and the
headline is not pair-shopped.

Weather robustness (rounds 4-5): this VM suffers hypervisor-steal
bursts that moved whole recorded rounds ±20-80%. Every sample records
its window's steal/busy %% from /proc/stat; the per-side point
estimate is the min over the QUIETEST steal tier with data. Round 5
made the repair loop ADAPTIVE and quiet-gated: after one mandatory
back-to-back window (the JSON always carries a ratio), every further
resample first PROBES for a lull — 1-s steal reads, sleeping through
bursts up to the budget line — and only measures inside one; a
knowingly-contended extra sample is never taken (a storm sample adds
nothing the first window didn't already record, while every second
spent probing is a chance to catch the lull that flips the tier to
quiet). Sides are picked by weakest quiet-tier evidence until both
hold two <=5%-steal samples. Each pair also records a steal-MATCHED
auxiliary ratio (both sides at the closest steal levels) since
cross-weather mins bias the headline ratio. The primary replicate
factor stays 5 so model compute dominates the fixed driver/scheduler
seconds.

Set SPARK_GRAFT_SKIP_SCALING=1 to skip the extra sessions.
"""

from __future__ import annotations

import json
import os
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

FLAGSHIP_SCHEMA = {"subject entity": ["related fact"]}


def _make_spark(cores: int):
    from uie_pytorch_spark.session import get_spark

    return get_spark(
        app_name=f"uie-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(int(cores), 8),
    )


def _flagship_run(spark, replicate: int = 1, bcast: bool = False):
    """The headline job: multi-stage extraction -> triples count.

    ``replicate`` unions shifted copies of the corpus (distinct
    doc_ids, so inference dedup cannot collapse them) to make the
    job compute-dominated for the scaling measurement.

    ``bcast`` forces a broadcast hint on the records join-back. At
    bench SF the decoded-record table is a few MB, so the hint removes
    two shuffles+sorts of the wide chunk table per stage — measured to
    recover most of the non-scaling overhead at 2-8 cores (0.65 ->
    ~0.9+ efficiency). At 32 cores the serial broadcast construction
    outweighs the saved shuffles, so the headline run keeps the AQE
    default (False) — which is also the correct 100 TB setting, where
    per-stage record sets outgrow any broadcast limit."""
    from pyspark.sql import functions as F

    from uie_pytorch_spark.engine import UIEConfig, UIEEngine

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    if replicate == 0:  # warm-up mode: small corpus, full code path
        base = base.limit(500)
        replicate = 1
    docs = base
    for i in range(1, replicate):
        docs = docs.unionByName(
            base.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                # perturb the text so (prompt, chunk) dedup keeps the
                # model work proportional to the corpus size
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
            )
        )
    eng = UIEEngine(
        spark,
        FLAGSHIP_SCHEMA,
        UIEConfig(lang="en", join_back_broadcast=bcast),
    )
    spans = eng.extract(docs)
    triples = UIEEngine.triples(spans)
    n = triples.count()
    eng.unpersist()
    return n


def _timed(fn, *a):
    t0 = time.monotonic()
    out = fn(*a)
    return time.monotonic() - t0, out


_CHILD = r"""
import os, sys, time, json
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
sys.path.insert(0, {repo!r}); os.chdir({repo!r})
from uie_pytorch_spark.session import get_spark
import bench
s = get_spark(app_name="scale{cores}", master="local[{cores}]",
              shuffle_partitions=max({cores}, 8))
bench._flagship_run(s, {warm_rep}, bcast={bcast})  # 0 = small-corpus warm-up
best, n = None, 0
for _ in range({inner}):
    t0 = time.monotonic()
    n = bench._flagship_run(s, {rep}, {bcast})
    t = time.monotonic() - t0
    best = t if best is None else min(best, t)
print("CHILD_RESULT " + json.dumps({{"t": best, "n": n}}))
s.stop()
"""


def _cpu_jiffies():
    """(steal, busy, total) jiffies from /proc/stat; (0, 0, 0) where
    unavailable (non-Linux) — steal guarding then degrades to off."""
    try:
        with open("/proc/stat") as f:
            p = [int(x) for x in f.readline().split()[1:]]
        idle = p[3] + (p[4] if len(p) > 4 else 0)
        steal = p[7] if len(p) > 7 else 0
        return steal, sum(p) - idle, sum(p)
    except Exception:
        return 0, 0, 0


def _steal_busy_pct(before, after) -> float:
    """Hypervisor steal as a % of the window's BUSY jiffies. Steal
    only accrues on runnable vCPUs, so normalizing by busy (not total,
    which is dominated by the 24+ idle cores) tracks how hard noisy
    neighbors actually hit OUR tasks. Calibrated on this host: a
    window reading ~20-25% here ran ~4% slower than idle; quiet
    windows read <2%."""
    steal = after[0] - before[0]
    busy = after[1] - before[1]
    return round(100.0 * steal / max(busy, 1), 2)


# steal/busy %% tiers for picking the per-side point estimate: prefer
# the min over quiet samples; fall back tier by tier so a chronically
# noisy box still reports (with the tier recorded for honesty).
_CLEAN_TIERS = (5.0, 15.0, float("inf"))


def _pick_min(samples):
    """samples: [(t, steal_busy_pct), ...] -> (min over the cleanest
    non-empty tier, tier used)."""
    for tier in _CLEAN_TIERS:
        clean = [t for t, s in samples if s <= tier]
        if clean:
            return min(clean), tier
    return None, None


def _scaling_sample(
    cores: int, rep: int, inner: int = 1, warm_rep: int = 0,
    bcast: bool = False,
):
    """min-of-``inner`` flagship timings in a FRESH python process +
    JVM, plus the window's steal/busy %% (contention signal). Fresh
    because a JVM that previously hosted a local[32] phase runs the
    same local[8] job ~35% slower (heap sizing/fragmentation + GC
    state). ``warm_rep``: 0 = small-corpus warm-up, 1 = one full
    untimed pass (the big side needs it — whole-stage codegen/JIT only
    reaches steady state after a real pass; the small side doesn't
    show the effect and a full pass there costs 4x more)."""
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    code = _CHILD.format(
        repo=repo, cores=cores, rep=rep, inner=inner, warm_rep=warm_rep,
        bcast=bcast,
    )
    j0 = _cpu_jiffies()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    steal = _steal_busy_pct(j0, _cpu_jiffies())
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            d = _json.loads(line[len("CHILD_RESULT "):])
            return d["t"], d["n"], steal
    raise RuntimeError(
        f"scaling child (cores={cores}) produced no result: "
        f"{proc.stderr[-500:]}"
    )


def _wait_for_quiet(
    deadline: float, thresh: float = 6.0, max_wait: float = 90.0
) -> bool:
    """Pre-sample guard: probe steal in 1-s windows and WAIT (up to
    ``max_wait`` s, never past ``deadline``) until a probe reads
    quiet before starting a multi-minute measurement. Waiting is
    nearly free — a sample taken inside a burst is worthless for the
    quiet tier, so on a stormy box the remaining budget is better
    spent PROBING for the next lull than measuring through the storm
    (the round-3/4/5 recorded-artifact failure was exactly samples
    that all landed inside multi-minute bursts while the 90-s wait
    cap forced measurement anyway). Returns whether the last probe
    read quiet."""
    t_end = min(time.monotonic() + max_wait, deadline)
    while True:
        j0 = _cpu_jiffies()
        time.sleep(1.0)
        if _steal_busy_pct(j0, _cpu_jiffies()) <= thresh:
            return True
        if time.monotonic() + 5.0 >= t_end:
            return False
        time.sleep(4.0)


def _take_sample(st: dict, c: int, deadline: float, require_quiet: bool):
    """Take one scaling sample for side ``c`` of pair-state ``st``.
    Mandatory samples (require_quiet=False) wait at most 45 s for a
    lull then measure regardless; repair samples probe for a lull up
    to the budget line and are NEVER taken knowingly contended (a
    storm sample adds nothing the mandatory window didn't record)."""
    wait_cap = (
        (deadline - time.monotonic() - (st["cost"][c] or 150.0))
        if require_quiet else 45.0
    )
    quiet = _wait_for_quiet(deadline, max_wait=max(wait_cap, 1.0))
    if require_quiet and not quiet:
        return False  # budget went to probing; storm never broke
    big_side = c == st["big"]
    t0 = time.monotonic()
    try:
        t, n, steal = _scaling_sample(
            c, st["rep"],
            inner=2 if big_side else 1,
            warm_rep=1 if big_side else 0,
            bcast=st["bcast"],
        )
    except Exception:
        return False  # a failed sample must not kill the bench
    st["cost"][c] = time.monotonic() - t0
    st["samples"][c].append((round(t, 3), steal))
    st["triples"][c] = n
    return True


def _est_window_cost(small: int, big: int, rep: int) -> float:
    """Rough wall cost (s) of one mandatory back-to-back window at
    ``rep`` on this box: the small side runs once timed, the big side
    warm-up + min-of-2 (3 passes), plus two JVM/python spawns. Used
    only to size reps so every pair's mandatory window fits."""
    per_rep = {2: 30.0, 4: 18.0, 8: 12.0, 16: 10.0, 32: 9.0}
    return (
        per_rep.get(small, 20.0) * rep
        + 3.0 * per_rep.get(big, 9.0) * rep
        + 40.0
    )


def main():
    results = {}
    spark = _make_spark(int(CPUS))

    # headline 1: flagship extraction pipeline (small-corpus warm-up
    # first so the timing isn't dominated by first-job JIT/worker
    # spawn — one-time costs a production backfill amortizes; min-of-3
    # timed runs: host weather inflates single runs ±20-80%, and the
    # recorded headline must survive a contended window)
    _flagship_run(spark, 0)
    t1, n_triples = _timed(_flagship_run, spark)
    t2, _ = _timed(_flagship_run, spark)
    t3, _ = _timed(_flagship_run, spark)
    t_flag = min(t1, t2, t3)
    results["uie_flagship_triples"] = round(t_flag, 3)

    # headline 2-6: representative operator queries
    from uie_pytorch_spark.queries import QUERIES

    bench_queries = [
        "agg_pricing_summary",
        "join_broadcast_dims",
        "double_dim_join",
        "minhash_signature",
        "lsh_candidate_pairs",
        "simhash_fingerprint",
        "doc_fingerprint",
        "window_cumulative_offset",
        "canonicalize_surface_forms",
    ]
    for name in bench_queries:
        t, _ = _timed(lambda: QUERIES[name](spark, SF_DIR).count())
        results[name] = round(t, 3)

    # similarity at bench scale uses the SRP bucket-join + in-bucket
    # exact rerank (the 100 TB path — candidates meet in buckets, no
    # cross join; the decimal brute-force variant exists for oracle
    # checking at sf0.01, it is deliberately O(n^2))
    def _ann_scale_path():
        from pyspark.sql import functions as F

        from uie_pytorch_spark.operators.similarity import srp_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.select("vec_id").filter(F.col("vec_id") < 50)
        return srp_topk(emb, q, k=10, planes=8, dim=64).count()

    t, _ = _timed(_ann_scale_path)
    results["ann_srp_topk"] = round(t, 3)

    def _ann_ivf_path():
        from pyspark.sql import functions as F

        from uie_pytorch_spark.operators.similarity import ivf_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.select("vec_id").filter(F.col("vec_id") < 50)
        return ivf_topk(emb, q, k=10, n_centroids=32, n_probe=4).count()

    t, _ = _timed(_ann_ivf_path)
    results["ann_ivf_topk"] = round(t, 3)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "uie_kg_pipeline_and_operators_wall",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / t_flag, 2) if t_flag else None,
    }

    # overall wall budget: stop ADDING scaling windows when exceeded so
    # the JSON line always prints with whatever samples exist (a driver
    # timeout mid-scaling would otherwise lose the whole result)
    deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "1000")
    )

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        spark.stop()
        # North-rule evidence: SAME job, SAME input, N vs 4N cores,
        # under the ENGINE-DEFAULT config (AQE decides the join-back).
        # The corpus is replicated so model compute dominates fixed
        # Spark overheads (scheduler, python worker spawn) — at a real
        # 100 TB scale the fixed costs amortize the same way.
        # Pair specs "small:big[:bcast]", primary first:
        #   2:8        default config — the clean N->4N reading (python
        #              workers own their cores); gets the bulk of the
        #              budget and adaptive contended-side resampling.
        #   4:16       default config — the same N->4N criterion at a
        #              ~2x shorter window (local4 ~75 s vs local2
        #              ~155 s at rep 5): on a stormy box a lull long
        #              enough for a quiet local2 sample may never
        #              come, while the 4:16 windows fit lulls half
        #              the length. ALL pairs are recorded with their
        #              weather labels — adding a pair is not pair-
        #              shopping, dropping one would be.
        #   8:32       default config — single-box capped: the local-
        #              mode JVM (scheduling, Arrow encode, shuffle)
        #              shares the SAME 32 cores with the 32 compute-
        #              bound python workers, so the measured speedup
        #              understates a real cluster, where executors add
        #              NODES (the kernel alone scales at ~0.82 to 32
        #              independent processes; BENCH.md); ALWAYS
        #              recorded — its mandatory window runs in phase 1
        #              before any repair budget is spent, with the
        #              replicate factor shrunk to fit what's left
        #              (round 4 lost this pair entirely to a contended
        #              primary window).
        # The broadcast-hint comparability pair (2:8:bcast, round-2's
        # tuned config) left the default list to fund the above; pass
        # SPARK_GRAFT_SCALING_PAIRS to re-add it.
        pairs = []
        for p in os.environ.get(
            "SPARK_GRAFT_SCALING_PAIRS", "2:8,4:16,8:32"
        ).split(","):
            parts = p.split(":")
            pairs.append((int(parts[0]), int(parts[1]),
                          len(parts) > 2 and parts[2] == "bcast"))
        out["scaling"] = {}
        rep_mult = int(os.environ.get("SPARK_GRAFT_SCALING_REP_MULT", "5"))
        max_per_side = int(os.environ.get("SPARK_GRAFT_SCALING_SAMPLES", "6"))

        # --- phase 1: one MANDATORY back-to-back window per pair,
        # BEFORE any budget goes to quiet-window repair. Round 4 lost
        # the 8:32 pair to a contended primary window, and a reserve-
        # based scheduler lost it again when an earlier pair's quiet-
        # gated probing ate the reserve — so mandatory windows now run
        # first for ALL pairs and repair only spends what is left.
        # Reps shrink (never below 1) when the leftover budget cannot
        # fit this pair's window plus the estimated windows of the
        # pairs still waiting.
        states = []
        for pair_idx, (small, big, bcast) in enumerate(pairs):
            if pair_idx == 0:
                # replicate scales the corpus so model compute dominates
                # the fixed driver/scheduler seconds (which do NOT scale
                # and dilute measured efficiency)
                rep = min(max(1, (big * rep_mult) // 8), 6)
            else:
                # as large as the mandatory phase affords: a small rep
                # dilutes the ratio with fixed driver/scheduler seconds
                # (rep-2 8:32 read 0.33 where rep-5 kernel-pool runs
                # read 0.75-0.82) — presence is already guaranteed by
                # phase 1, so spend the reserve on window LENGTH
                rep = 5 if pair_idx == 1 else 4
            later = sum(
                _est_window_cost(s2, b2, 1) for s2, b2, _ in
                [(p[0], p[1], p[2]) for p in pairs[pair_idx + 1:]]
            )
            left = deadline - time.monotonic()
            while rep > 1 and _est_window_cost(small, big, rep) > left - later:
                rep -= 1
            st = {
                "small": small, "big": big, "bcast": bcast, "rep": rep,
                "min_quiet": 2 if pair_idx == 0 else 1,
                "cap": max_per_side if pair_idx == 0 else 3,
                "samples": {small: [], big: []},
                "triples": {}, "cost": {small: None, big: None},
            }
            states.append(st)
            if left - later < _est_window_cost(small, big, 1) and pair_idx:
                continue  # truly out of budget: pair emits only if sampled
            for c in (small, big):
                _take_sample(st, c, deadline, require_quiet=False)

        # --- phase 1b: anomaly repair. A 4N-core run reading SLOWER
        # than the N-core run on the same input is physically
        # impossible for this job absent interference (observed: a
        # local32 window at 79.7 s whose immediate repeat read 25.1 s
        # — a neighbor burst that idled between the 1-s steal probes,
        # so the window was labeled "mixed"). Such a reading gets ONE
        # prioritized re-take of the slow side before any quiet-tier
        # repair budget is spent; if it stands, the output labels the
        # pair "anomalous" rather than letting a plausible-looking
        # weather tag dress up an impossible ratio.
        for st in states:
            small, big = st["small"], st["big"]
            if not (st["samples"][small] and st["samples"][big]):
                continue
            t_s = min(t for t, _ in st["samples"][small])
            t_b = min(t for t, _ in st["samples"][big])
            if t_b >= t_s and time.monotonic() < deadline - (
                st["cost"][big] or 150.0
            ):
                _take_sample(st, big, deadline, require_quiet=False)

        # --- phase 2: quiet-gated repair, primary pair first. Pick the
        # first side (in pair priority order) whose quiet-tier evidence
        # is below target and probe for a lull before each resample; a
        # storm that never breaks ends the phase with the budget spent
        # probing, not measuring noise.
        while True:
            target = None
            for st in states:
                for c in (st["small"], st["big"]):
                    sam = st["samples"][c]
                    nq = len([1 for _, s in sam if s <= _CLEAN_TIERS[0]])
                    if sam and nq < st["min_quiet"] and len(sam) < st["cap"]:
                        target = (st, c)
                        break
                if target:
                    break
            if not target:
                break
            st, c = target
            if time.monotonic() > deadline - (st["cost"][c] or 150.0):
                break
            if not _take_sample(st, c, deadline, require_quiet=True):
                break

        for st in states:
            small, big, bcast = st["small"], st["big"], st["bcast"]
            samples, triples, rep = st["samples"], st["triples"], st["rep"]
            if not (samples[small] and samples[big]):
                continue
            times, tiers = {}, {}
            for c, v in samples.items():
                times[c], tiers[c] = _pick_min(v)
            key = f"local{small}_to_local{big}" + ("_bcast" if bcast else "")
            out["scaling"][key] = {
                "config": (
                    "broadcast join-back hint"
                    if bcast
                    else "engine default (AQE join-back)"
                ),
                "replicate": rep,
                f"local{small}_sec": round(times[small], 3),
                f"local{big}_sec": round(times[big], 3),
                f"samples_local{small}": [t for t, _ in samples[small]],
                f"samples_local{big}": [t for t, _ in samples[big]],
                f"steal_pct_local{small}": [s for _, s in samples[small]],
                f"steal_pct_local{big}": [s for _, s in samples[big]],
                # steal/busy %% tier the per-side min was drawn from
                # (5 = quiet, 15 = mild, null-> inf = all-contended)
                "clean_tier_pct": {
                    str(small): None
                    if tiers[small] == float("inf") else tiers[small],
                    str(big): None
                    if tiers[big] == float("inf") else tiers[big],
                },
                # one-word trust label for the ratio: "clean" = both
                # sides measured in quiet windows; "mixed" = at most
                # mild contention; "contended" = at least one side had
                # NO window under 15% steal/busy — treat the ratio as
                # weather-distorted (a contended SMALL side inflates
                # it, a contended BIG side deflates it)
                # "anomalous" overrides the steal-based label when the
                # 4N side reads no faster than the N side — impossible
                # for this job absent interference the steal probes
                # missed; treat the ratio as untrusted
                "weather_quality": (
                    "anomalous"
                    if times[big] >= times[small]
                    else "clean"
                    if max(tiers[small], tiers[big]) <= _CLEAN_TIERS[0]
                    else "mixed"
                    if max(tiers[small], tiers[big]) <= _CLEAN_TIERS[1]
                    else "contended"
                ),
                "triples": triples[big],
                f"triples_per_sec_local{small}": round(triples[small] / times[small], 2),
                f"triples_per_sec_local{big}": round(triples[big] / times[big], 2),
                "speedup": round(times[small] / times[big], 3),
                "efficiency_n_to_4n": round((times[small] / times[big]) / 4, 3),
            }
            # auxiliary honesty reading: the per-side mins above can
            # come from very different weather (e.g. small side at 5%
            # steal, big side's best window 30%), which biases the
            # ratio. Pair the two samples whose steal %% MATCH most
            # closely — both sides distorted alike — and report that
            # ratio too. Secondary evidence, never the headline.
            m_s, m_b = min(
                ((a, b) for a in samples[small] for b in samples[big]),
                key=lambda ab: abs(ab[0][1] - ab[1][1]),
            )
            out["scaling"][key]["steal_matched"] = {
                f"local{small}_sec": m_s[0],
                f"local{big}_sec": m_b[0],
                "steal_pct": [m_s[1], m_b[1]],
                "efficiency_n_to_4n": round((m_s[0] / m_b[0]) / 4, 3),
            }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
