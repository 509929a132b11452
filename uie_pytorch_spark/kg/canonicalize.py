"""Entity canonicalization (∅J6 in SURVEY §2.3): map surface forms of
extracted entities to canonical ids.

Three tiers, composable:
  1. normalize: lower/trim/whitespace-collapse + full-width fold —
     exact-match tier, one salted groupBy;
  2. near-match: MinHash LSH over char shingles of the normalized
     surface (operators/dedup.py) -> candidate pairs with Jaccard
     verify;
  3. transitive closure: connected components over the verified-pair
     graph via alternating small-star/large-star label propagation
     (Kiveris et al., "Connected Components in MapReduce and Beyond",
     SOCC'14) — pyspark-only, no GraphFrames dependency, converges in
     O(log n) rounds for web-ish graphs.

Skew: hot surface forms (boilerplate entities like "北京") concentrate
on few keys; the exact tier pre-aggregates per (surface, salt) then
re-aggregates, bounding any single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.textnorm import DBC_FROM, DBC_TO
from ..operators import dedup as D


def normalize_surface(col):
    # full-width fold + ideographic space (the engine's dbc2sbc keeps
    # U+3000 for reference parity; canonicalization wants it folded)
    c = F.translate(col, DBC_FROM + "　", DBC_TO + " ")
    return F.trim(F.regexp_replace(F.lower(c), r"(?U)\s+", " "))


def exact_canonical(mentions: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """mentions(surface, mention_id) -> (surface_norm, canonical_id)
    where canonical_id = min mention_id per normalized surface.
    Two-phase salted aggregation: partial min per (surface, salt)
    bucket, then final min — a hot surface never lands on one reducer
    in phase one."""
    m = mentions.select(
        normalize_surface(F.col("surface")).alias("surface_norm"),
        F.col("mention_id"),
    ).withColumn(
        "salt", F.pmod(F.xxhash64("mention_id"), F.lit(salt_buckets))
    )
    partial = m.groupBy("surface_norm", "salt").agg(
        F.min("mention_id").alias("pmin")
    )
    return partial.groupBy("surface_norm").agg(
        F.min("pmin").alias("canonical_id")
    )


def near_match_edges(
    surfaces: DataFrame, jaccard_threshold: float = 0.6, shingle: int = 3
) -> DataFrame:
    """surfaces(sid, surface_norm) -> verified near-duplicate edges
    (src, dst): MinHash LSH candidates filtered by exact n-gram
    Jaccard. At scale the Jaccard verify runs ONLY on LSH candidates."""
    docs = surfaces.select(
        F.col("sid").alias("doc_id"), F.col("surface_norm").alias("text")
    )
    sig = D.minhash_sig_array(docs, width=shingle)
    cands = D.lsh_candidate_pairs(sig)
    verified = D.jaccard_pairs(
        docs, threshold=jaccard_threshold, width=shingle, candidates=cands
    )
    return verified.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )


def _ckpt_with_signature(df: DataFrame):
    """Eagerly localCheckpoint ``df`` and return (checkpointed_df,
    signature) where signature = (count, bit_xor of row hashes, min v)
    — an overflow-safe change detector (ids are xxhash64-scale, so
    arithmetic sums overflow ANSI). The signature rides the CHECKPOINT
    materialization itself via an in-plan ``observe`` (CollectMetrics
    is a row-level pass-through, so the checkpointed data is
    untouched): one Spark job per CC round where a separate
    ``agg().collect()`` used to cost a second driver-synced job —
    measured delivery works for the eager-checkpoint action."""
    from pyspark.sql import Observation

    obs = Observation()
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("s"),
        F.min("v").alias("m"),
    ).localCheckpoint(eager=True)
    m = obs.get
    return out, (m["n"], m["s"], m["m"])


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(src, dst) undirected edges -> (id, component) with component =
    min node id in the component. Alternating large-star / small-star;
    each round is two self-joins + groupBy min. Deterministic; loops
    terminate when the edge multiset stops changing (checked via a
    cheap aggregate signature collected BY the per-round checkpoint
    job — see _ckpt_with_signature)."""
    spark = edges.sparkSession
    # undirected -> ordered pairs u > v (parent candidates)
    e, prev_sig = _ckpt_with_signature(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        # the checkpoint cuts the upstream DAG once — edge construction
        # may sit on an expensive lineage (model inference); every CC
        # round would otherwise recompute it. Its observed count also
        # answers the emptiness probe (one job where round 5 paid a
        # checkpoint AND an isEmpty).
    )
    if prev_sig[0] == 0:
        return spark.createDataFrame([], "id: long, component: long")

    # Seeding prev_sig with the INITIAL edge signature adds one extra
    # exit opportunity (an already-converged star graph breaks after
    # round 1 instead of 2); the round map is a deterministic function
    # of e, so breaking on e_k == e_{k-1} yields the same final e.
    for _ in range(max_iterations):
        # large-star: every neighbor w of u with w > u links to
        # min(neighbors(u) ∪ {u})
        nbrs = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: neighbors w <= u link to the min neighbor
        small = (
            nbrs.filter(F.col("v") <= F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
        # the checkpoint truncates lineage each round — iterative
        # self-joins otherwise grow the logical plan exponentially —
        # and its observe carries the convergence signature for free
        e, sig = _ckpt_with_signature(
            large.union(small)
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
        )
        if sig == prev_sig:
            break
        prev_sig = sig

    comp = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    comp = comp.groupBy("id").agg(F.min("component").alias("component"))
    roots = comp.select(F.col("component").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return comp.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def canonicalize_mentions(
    mentions: DataFrame, jaccard_threshold: float = 0.6
) -> DataFrame:
    """Full pipeline: mentions(mention_id, surface) ->
    (mention_id, surface, surface_norm, canonical_surface_id) where
    near-duplicate normalized surfaces share one canonical id."""
    m = mentions.select(
        "mention_id",
        "surface",
        normalize_surface(F.col("surface")).alias("surface_norm"),
    ).persist()
    surfaces = (
        m.select("surface_norm")
        .distinct()
        .withColumn("sid", F.xxhash64("surface_norm"))
        .persist()
    )
    edges = near_match_edges(surfaces, jaccard_threshold)
    comps = connected_components(edges)
    canon = surfaces.join(
        comps, surfaces.sid == comps.id, "left"
    ).select(
        "surface_norm",
        F.coalesce(F.col("component"), F.col("sid")).alias("canonical_surface_id"),
    )
    return m.join(canon, "surface_norm")
