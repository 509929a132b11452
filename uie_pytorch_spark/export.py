"""Result export (SURVEY A6 / S6): reconstruct the reference's nested
per-document result shape from the flat span table — ONLY at export
time (the engine never shuffles nested structures). Depth-2 (root
spans + their relations), which covers every README schema; deeper
trees export as additional levels of the flat triple table.

Reference shape (uie_predictor.py:273-313, README.md:241-268):
    {node_name: [ {text, start, end, probability,
                   relations: {child_name: [ {...} ]}} ]}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_struct(prefix: str = ""):
    c = lambda n: F.col(prefix + n) if prefix else F.col(n)  # noqa: E731
    return F.struct(
        c("text").alias("text"),
        c("start").alias("start"),
        c("end").alias("end"),
        c("prob").alias("probability"),
    )


def nested_results(spans: DataFrame) -> DataFrame:
    """Flat span table (engine.RESULT_COLS) -> one row per doc with a
    JSON string in the reference's nested format (depth 2)."""
    roots = spans.filter(F.col("parent_path").isNull())
    children = spans.filter(F.col("parent_path").isNotNull())

    child_groups = children.groupBy(
        "doc_id",
        "parent_path",
        "parent_text",
        "parent_start",
        "parent_end",
        "node_name",
    ).agg(F.sort_array(F.collect_list(_span_struct())).alias("child_spans"))

    rel_maps = child_groups.groupBy(
        "doc_id", "parent_path", "parent_text", "parent_start", "parent_end"
    ).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("node_name"), F.col("child_spans")))
            )
        ).alias("relations")
    )

    r = roots.select(
        "doc_id", "node_path", "node_name", "text", "start", "end", "prob"
    ).alias("r")
    g = rel_maps.alias("g")
    enriched = r.join(
        g,
        on=(
            (F.col("r.doc_id") == F.col("g.doc_id"))
            & (F.col("r.node_path") == F.col("g.parent_path"))
            & (F.col("r.text") == F.col("g.parent_text"))
            & F.col("r.start").eqNullSafe(F.col("g.parent_start"))
            & F.col("r.end").eqNullSafe(F.col("g.parent_end"))
        ),
        how="left",
    ).select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.node_name").alias("node_name"),
        F.struct(
            F.col("r.text").alias("text"),
            F.col("r.start").alias("start"),
            F.col("r.end").alias("end"),
            F.col("r.prob").alias("probability"),
            F.col("g.relations").alias("relations"),
        ).alias("span"),
    )

    # spans contain a map field -> not naturally orderable; sort with
    # an explicit comparator over (start, end, text) for deterministic
    # export
    def _cmp(a, b):
        key = lambda s: F.struct(  # noqa: E731
            F.coalesce(s["start"], F.lit(-1)).alias("s"),
            F.coalesce(s["end"], F.lit(-1)).alias("e"),
            s["text"].alias("t"),
        )
        return F.when(key(a) < key(b), -1).when(key(a) > key(b), 1).otherwise(0)

    per_node = enriched.groupBy("doc_id", "node_name").agg(
        F.array_sort(F.collect_list("span"), _cmp).alias("spans")
    )
    return per_node.groupBy("doc_id").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("node_name", "spans")),
                    lambda a, b: F.when(
                        a["node_name"] < b["node_name"], -1
                    ).when(a["node_name"] > b["node_name"], 1).otherwise(0),
                )
            )
        ).alias("result_json")
    )


def relation_class_report(triples: DataFrame) -> DataFrame:
    """F7 (debug eval): group relation prompts by their '的'-suffix
    predicate (utils.py:642-681: the fallback path splits on the LAST
    '的' — rsplit('的', 1) — and names with no '的' group as
    themselves). Re-expressed as a regexp groupBy: capture after the
    last '的', empty/no-match falls back to the whole predicate."""
    suffix = F.regexp_extract(F.col("pred"), "的([^的]+)$", 1)
    return (
        triples.withColumn(
            "relation_class", F.coalesce(F.nullif(suffix, F.lit("")), F.col("pred"))
        )
        .groupBy("relation_class")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj_text").alias("n_subjects"),
            F.avg("obj_prob").alias("mean_obj_prob"),
        )
    )
