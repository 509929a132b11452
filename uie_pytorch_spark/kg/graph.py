"""KG edge-table materialization (north rule: "materialization of
(subj, pred, obj) triples plus entity/edge tables"): collapse the
mention-level triple table onto canonical entity ids and aggregate one
row per (subj_id, pred, obj_id) graph edge.

The canonical map is whatever canonicalization tier produced it —
exact normalization (canonicalize.exact_canonical), or the full
normalize + MinHash-LSH + connected-components pipeline
(canonicalize.canonicalize_mentions) — this module only requires
(surface, canonical_id) rows, one per distinct surface.

Scale shape: two keyed equi-joins (surface -> id on each endpoint; the
canonical map shuffles once per side, AQE broadcasts it when small)
followed by ONE map-side-combinable groupBy on (subj_id, pred,
obj_id). Edge weights aggregate partial, so a hot edge (boilerplate
relation) never concentrates rows on a single reducer beyond the
final combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_edges(triples: DataFrame, canon: DataFrame) -> DataFrame:
    """triples(subj_text, pred, obj_text, obj_prob, doc_id, ...) x
    canon(surface, canonical_id) -> edge table
    (subj_id, pred, obj_id, n_mentions, n_docs, mean_obj_prob).

    Surfaces missing from the canonical map are dropped (inner join):
    an unmapped mention has no node to attach to — materialize the map
    from the same triple table's surfaces to keep every edge."""
    s = canon.select(
        F.col("surface").alias("subj_text"),
        F.col("canonical_id").alias("subj_id"),
    )
    o = canon.select(
        F.col("surface").alias("obj_text"),
        F.col("canonical_id").alias("obj_id"),
    )
    return (
        triples.join(s, "subj_text")
        .join(o, "obj_text")
        .groupBy("subj_id", "pred", "obj_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.avg("obj_prob").alias("mean_obj_prob"),
        )
    )


def surface_canonical_map(mentions_canonical: DataFrame) -> DataFrame:
    """(mention_id, surface, surface_norm, canonical_surface_id) rows
    from canonicalize_mentions -> the distinct (surface, canonical_id)
    map entity_edges consumes."""
    return (
        mentions_canonical.select(
            "surface",
            F.col("canonical_surface_id").alias("canonical_id"),
        ).distinct()
    )


def entity_degrees(edges: DataFrame) -> DataFrame:
    """Node-level degree/strength profile of the KG from its edge
    table (subj_id, pred, obj_id, n_mentions, ...): per canonical
    entity the distinct out/in neighbor counts, distinct predicate
    count, and mention-weighted strength. The hub report driving
    skew decisions downstream (a 10^7-degree hub node is exactly the
    key you salt or cap before any per-entity join).

    Shape: two partial aggregations (one per direction) union-merged
    and re-aggregated — every stage map-side combinable, no window,
    no self-join; linear in |E| at any scale.
    """
    out_side = edges.groupBy(F.col("subj_id").alias("entity_id")).agg(
        F.countDistinct("obj_id").alias("out_degree"),
        F.lit(0).cast("long").alias("in_degree"),
        F.collect_set("pred").alias("__preds"),
        F.sum("n_mentions").alias("strength"),
    )
    in_side = edges.groupBy(F.col("obj_id").alias("entity_id")).agg(
        F.lit(0).cast("long").alias("out_degree"),
        F.countDistinct("subj_id").alias("in_degree"),
        F.collect_set("pred").alias("__preds"),
        F.sum("n_mentions").alias("strength"),
    )
    return (
        out_side.unionByName(in_side)
        .groupBy("entity_id")
        .agg(
            F.sum("out_degree").cast("long").alias("out_degree"),
            F.sum("in_degree").cast("long").alias("in_degree"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("__preds")))
            ).cast("long").alias("n_preds"),
            F.sum("strength").cast("long").alias("strength"),
        )
    )
