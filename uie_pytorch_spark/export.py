"""Result export (SURVEY A6 / S6): reconstruct the reference's nested
per-document result shape from the flat span table — ONLY at export
time (the engine never shuffles nested structures). Arbitrary schema
depth: levels are attached bottom-up, one grouped aggregation + one
identity join per level (uie_predictor.py:285-313 attaches children
recursively the same way, eagerly).

Reference shape (uie_predictor.py:273-313, README.md:241-268):
    {node_name: [ {text, start, end, probability,
                   relations: {child_name: [ {...} ]}} ]}

Leaves carry no "relations" key (Spark's to_json omits null fields —
byte-identical to the reference's absent key).

Ordering contract (deterministic export; mirrored by the independent
eager renderer in tests/eager_export.py):
  * span arrays below the root sort by (text, start, end, probability)
    with null offsets as -1;
  * root span arrays sort by (start, end, text) with null offsets -1;
  * every relations/result map sorts its keys by node name.
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


def _by_name(a, b):
    return (
        F.when(a["node_name"] < b["node_name"], -1)
        .when(a["node_name"] > b["node_name"], 1)
        .otherwise(0)
    )


def _cmp_child(a, b):
    """(text, start, end, probability), null offsets -> -1. Explicit
    comparator because enriched spans contain a map field (not
    naturally orderable)."""
    key = lambda s: F.struct(  # noqa: E731
        s["text"].alias("t"),
        F.coalesce(s["start"], F.lit(-1)).alias("s"),
        F.coalesce(s["end"], F.lit(-1)).alias("e"),
        s["probability"].alias("p"),
    )
    return F.when(key(a) < key(b), -1).when(key(a) > key(b), 1).otherwise(0)


def _cmp_root(a, b):
    key = lambda s: F.struct(  # noqa: E731
        F.coalesce(s["start"], F.lit(-1)).alias("s"),
        F.coalesce(s["end"], F.lit(-1)).alias("e"),
        s["text"].alias("t"),
    )
    return F.when(key(a) < key(b), -1).when(key(a) > key(b), 1).otherwise(0)


def nested_results(spans: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Flat span table (engine.RESULT_COLS) -> one row per doc with a
    JSON string in the reference's nested format, to the full depth of
    the schema. ``max_depth``: number of levels in the deepest
    node_path; pass it when known (the engine's schema tree knows) to
    keep the export a single lazy DAG — None runs one tiny 1-row agg
    job over the span table to discover it."""
    depth_col = F.size(F.split(F.col("node_path"), "/"))
    spans = spans.withColumn("_depth", depth_col)
    if max_depth is None:
        max_depth = (
            spans.agg(F.max("_depth").alias("d")).collect()[0]["d"] or 1
        )

    # bottom-up: relations maps of level d+1 attach to spans of level d
    rel_of: DataFrame | None = None  # parent-identity -> relations map
    for d in range(max_depth, 1, -1):
        cur = spans.filter(F.col("_depth") == d)
        if rel_of is None:
            enriched = cur.withColumn("span", _span_struct())
        else:
            c = cur.alias("c")
            g = rel_of.alias("g")
            enriched = c.join(
                g,
                on=(
                    (F.col("c.doc_id") == F.col("g.p_doc_id"))
                    & (F.col("c.node_path") == F.col("g.p_path"))
                    & (F.col("c.text") == F.col("g.p_text"))
                    & F.col("c.start").eqNullSafe(F.col("g.p_start"))
                    & F.col("c.end").eqNullSafe(F.col("g.p_end"))
                ),
                how="left",
            ).select(
                *[F.col(f"c.{x}").alias(x) for x in (
                    "doc_id", "node_name",
                    "parent_path", "parent_text", "parent_start",
                    "parent_end",
                )],
                F.struct(
                    F.col("c.text").alias("text"),
                    F.col("c.start").alias("start"),
                    F.col("c.end").alias("end"),
                    F.col("c.prob").alias("probability"),
                    F.col("g.relations").alias("relations"),
                ).alias("span"),
            )
        child_groups = enriched.groupBy(
            "doc_id",
            "parent_path",
            "parent_text",
            "parent_start",
            "parent_end",
            "node_name",
        ).agg(
            F.array_sort(F.collect_list("span"), _cmp_child).alias(
                "child_spans"
            )
        )
        rel_of = child_groups.groupBy(
            "doc_id", "parent_path", "parent_text", "parent_start",
            "parent_end",
        ).agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("node_name", "child_spans")),
                    _by_name,
                )
            ).alias("relations")
        ).select(
            F.col("doc_id").alias("p_doc_id"),
            F.col("parent_path").alias("p_path"),
            F.col("parent_text").alias("p_text"),
            F.col("parent_start").alias("p_start"),
            F.col("parent_end").alias("p_end"),
            "relations",
        )

    roots = spans.filter(F.col("parent_path").isNull())
    r = roots.select(
        "doc_id", "node_path", "node_name", "text", "start", "end", "prob"
    ).alias("r")
    if rel_of is None:
        enriched = r.select(
            "doc_id",
            "node_name",
            F.struct(
                F.col("text"),
                F.col("start"),
                F.col("end"),
                F.col("prob").alias("probability"),
            ).alias("span"),
        )
    else:
        g = rel_of.alias("g")
        enriched = r.join(
            g,
            on=(
                (F.col("r.doc_id") == F.col("g.p_doc_id"))
                & (F.col("r.node_path") == F.col("g.p_path"))
                & (F.col("r.text") == F.col("g.p_text"))
                & F.col("r.start").eqNullSafe(F.col("g.p_start"))
                & F.col("r.end").eqNullSafe(F.col("g.p_end"))
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

    per_node = enriched.groupBy("doc_id", "node_name").agg(
        F.array_sort(F.collect_list("span"), _cmp_root).alias("spans")
    )
    return per_node.groupBy("doc_id").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("node_name", "spans")), _by_name
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


def ntriples_lines(
    triples: DataFrame,
    base: str = "http://kg.example",
    subj: str = "subj_id",
    pred: str = "pred",
    obj: str = "obj_id",
    conf: str | None = None,
) -> DataFrame:
    """Serialize canonical KG edges as N-Triples lines — the standard
    interchange the north rule's 'materialization of (subj, pred, obj)
    triples' ships to downstream graph stores (any RDF loader ingests
    N-Triples line-per-statement, so the parquet->text write needs no
    custom sink and stays embarrassingly parallel). Entity and
    predicate ids mint IRIs under ``base`` with non-IRI-safe chars
    folded to '_' — deterministic and dialect-neutral (no
    percent-encoding divergence between engines) but LOSSY: ids that
    differ only in folded characters ('san jose' vs 'san_jose') merge
    into one entity IRI, which is acceptable downstream of the
    canonicalization tier (folding-equivalent surfaces canonicalize
    together anyway) but NOT for raw ids — feed canonical ids. The
    reified statement IRI is the md5 of the raw (unfolded) terms, so
    confidence statements never collide even when entity IRIs fold
    together. When ``conf`` names a confidence column it is emitted as
    a second statement reifying the edge score as a double literal
    (integer-micro rendering — engine-independent tie rounding); a
    null confidence yields a NULL line, not a malformed literal.

    Shape: a pure projection (zero shuffles, whole-stage codegen);
    writing is ``df.write.text`` partition-parallel at any scale."""
    # a null id would make its concat() null and concat_ws would then
    # silently drop the term, emitting a malformed statement — drop
    # incomplete edges instead (an RDF statement needs all three terms)
    triples = triples.filter(
        F.col(subj).isNotNull()
        & F.col(pred).isNotNull()
        & F.col(obj).isNotNull()
    )
    safe = lambda c: F.regexp_replace(  # noqa: E731
        F.col(c).cast("string"), "[^0-9A-Za-z_.~-]", "_"
    )
    s_iri = F.concat(F.lit(f"<{base}/e/"), safe(subj), F.lit(">"))
    p_iri = F.concat(F.lit(f"<{base}/p/"), safe(pred), F.lit(">"))
    o_iri = F.concat(F.lit(f"<{base}/e/"), safe(obj), F.lit(">"))
    line = F.concat_ws(" ", s_iri, p_iri, o_iri, F.lit("."))
    cols = [
        F.col(subj).alias("subj_id"),
        F.col(pred).alias("pred"),
        F.col(obj).alias("obj_id"),
        line.alias("ntriple"),
    ]
    if conf:
        # statement IRI: md5 of the raw terms (US-separated) — the
        # folded readable form would let distinct edges collide on one
        # statement id ('a_b'+'c' vs 'a'+'b_c'), attaching conflicting
        # confidence literals to a single reified statement
        stmt = F.concat(
            F.lit(f"<{base}/stmt/"),
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col(subj).cast("string"),
                    F.col(pred).cast("string"),
                    F.col(obj).cast("string"),
                )
            ),
            F.lit(">"),
        )
        # PRECONDITION (ADVICE r5, documented rather than changed —
        # the oracle freezes this rendering): conf must lie in [0, 1].
        # A negative confidence would produce a malformed literal
        # (sign-preserving % lpads a negative remainder into the
        # fraction digits); extraction probabilities are sigmoid
        # outputs, so the range holds by construction upstream.
        # render the double via integer micro-units, not %f: printf
        # tie-rounding differs between engines (Java HALF_UP vs C
        # half-even), so '%.6f' of 0.0078125 is 0.007813 in Spark but
        # 0.007812 in DuckDB; round() agrees on positives in both
        micro = F.round(F.col(conf).cast("double") * 1_000_000).cast("long")
        score = F.concat(
            F.lit('"'),
            F.floor(micro / 1_000_000).cast("long").cast("string"),
            F.lit("."),
            F.lpad((micro % 1_000_000).cast("string"), 6, "0"),
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#double>'),
        )
        cols.append(
            # a null confidence must yield a NULL line (no statement),
            # not the string "null" inside an xsd:double literal
            F.when(
                F.col(conf).isNotNull(),
                F.concat_ws(
                    " ", stmt, F.lit(f"<{base}/p/confidence>"), score,
                    F.lit("."),
                ),
            ).alias("conf_ntriple")
        )
    return triples.select(*cols)
