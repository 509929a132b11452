"""Annotation readers + training-set compilation (SURVEY §2 S2-S4, J4,
E4-E7): doccano / Label Studio exports -> (content, prompt,
result_list) example tables, as distributed jobs.

Reference behavior re-expressed (not copied):
  * doccano dialect parsing  /root/reference/utils.py:845-897
  * entity-id -> entity join /root/reference/utils.py:903-910, 957-970
  * relation examples        /root/reference/utils.py:957-997
  * entity negatives         /root/reference/utils.py:684-715
  * full relation negatives  /root/reference/utils.py:755-774
  * Label Studio -> doccano  /root/reference/labelstudio2doccano.py:20-77

Exact Python-`random` sequence parity for sampled negatives is NOT a
goal (SURVEY §5.2/5); sampling here is seeded rand() with documented
cap semantics (count <= negative_ratio * positives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

ENTITY_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("start_offset", T.LongType()),
            T.StructField("end_offset", T.LongType()),
            T.StructField("label", T.StringType()),
        ]
    )
)
RELATION_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("from_id", T.LongType()),
            T.StructField("to_id", T.LongType()),
            T.StructField("type", T.StringType()),
        ]
    )
)

DOCCANO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("entities", ENTITY_T),
        T.StructField("relations", RELATION_T),
    ]
)


def read_doccano(spark: SparkSession, path: str) -> DataFrame:
    """doccano >=1.7 ext JSONL -> one row per doc with typed entity/
    relation arrays (S3)."""
    return spark.read.schema(DOCCANO_SCHEMA).json(path)


# the three legacy dialects parsed at utils.py:845-897:
#   {"data": ..., "label": [[start, end, label], ...]}      (<1.7)
#   {"data": ..., "label": {"entities": [[s,e,l]...]}}      (mixed)
#   {"text": ..., "label": [[start, end, label], ...]}
_LEGACY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("data", T.StringType()),
        T.StructField("label", T.StringType()),  # raw JSON, dialect-dependent
        T.StructField("entities", ENTITY_T),
        T.StructField("relations", RELATION_T),
    ]
)


def read_doccano_any(spark: SparkSession, path: str) -> DataFrame:
    """S3 with dialect unification: coalesce text/data, parse legacy
    [[start, end, label]] lists (bare or under label.entities) into
    the modern typed entity array; modern rows pass through."""
    raw = spark.read.schema(_LEGACY_SCHEMA).json(path)
    triple_arr = T.ArrayType(T.ArrayType(T.StringType()))
    legacy_list = F.coalesce(
        F.from_json(F.col("label"), triple_arr),
        F.from_json(F.get_json_object(F.col("label"), "$.entities"), triple_arr),
    )
    parsed_legacy = F.transform(
        legacy_list,
        lambda x, i: F.struct(
            (i + 1).cast("long").alias("id"),
            x.getItem(0).cast("long").alias("start_offset"),
            x.getItem(1).cast("long").alias("end_offset"),
            x.getItem(2).alias("label"),
        ),
    )
    return raw.select(
        F.coalesce(F.col("id"), F.lit(0)).alias("id"),
        F.coalesce(F.col("text"), F.col("data")).alias("text"),
        F.coalesce(F.col("entities"), parsed_legacy).alias("entities"),
        F.col("relations"),
    )


def entity_examples(docs: DataFrame) -> DataFrame:
    """Positive entity examples: prompt = label, result = span
    (utils.py:924-948). One row per (doc, entity)."""
    e = docs.select(
        F.col("id").alias("doc_id"),
        F.col("text").alias("content"),
        F.explode("entities").alias("ent"),
    )
    return e.select(
        "doc_id",
        "content",
        F.col("ent.label").alias("prompt"),
        F.struct(
            F.expr("substring(content, ent.start_offset + 1, ent.end_offset - ent.start_offset)").alias("text"),
            F.col("ent.start_offset").alias("start"),
            F.col("ent.end_offset").alias("end"),
        ).alias("result"),
    )


def relation_examples(docs: DataFrame) -> DataFrame:
    """Positive relation examples via the double entity-id join (J4):
    prompt = subject_text + '的' + relation_type, result = object span
    (utils.py:957-997)."""
    ents = docs.select(
        F.col("id").alias("doc_id"),
        F.col("text").alias("content"),
        F.explode("entities").alias("ent"),
    ).select(
        "doc_id",
        "content",
        F.col("ent.id").alias("ent_id"),
        F.expr(
            "substring(content, ent.start_offset + 1, ent.end_offset - ent.start_offset)"
        ).alias("ent_text"),
        F.col("ent.start_offset").alias("ent_start"),
        F.col("ent.end_offset").alias("ent_end"),
    )
    rels = docs.select(
        F.col("id").alias("doc_id"), F.explode("relations").alias("rel")
    ).select(
        "doc_id",
        F.col("rel.from_id").alias("from_id"),
        F.col("rel.to_id").alias("to_id"),
        F.col("rel.type").alias("rel_type"),
    )
    subj = ents.select(
        "doc_id",
        F.col("ent_id").alias("from_id"),
        F.col("ent_text").alias("subj_text"),
    )
    obj = ents.select(
        "doc_id",
        F.col("ent_id").alias("to_id"),
        F.col("ent_text").alias("obj_text"),
        F.col("ent_start").alias("obj_start"),
        F.col("ent_end").alias("obj_end"),
        "content",
    )
    return (
        rels.join(subj, ["doc_id", "from_id"])
        .join(obj, ["doc_id", "to_id"])
        .select(
            "doc_id",
            "content",
            F.concat(F.col("subj_text"), F.lit("的"), F.col("rel_type")).alias("prompt"),
            F.struct(
                F.col("obj_text").alias("text"),
                F.col("obj_start").alias("start"),
                F.col("obj_end").alias("end"),
            ).alias("result"),
        )
    )


def entity_negatives(
    docs: DataFrame, negative_ratio: int = 5, seed: int = 1000
) -> DataFrame:
    """E4: per doc, labels NOT annotated in it (anti-join against the
    distinct label dim), sampled to <= negative_ratio * n_positives
    with a seeded deterministic order."""
    doc_labels = docs.select(
        F.col("id").alias("doc_id"),
        F.col("text").alias("content"),
        F.explode_outer(F.col("entities.label")).alias("label"),
    )
    label_dim = doc_labels.select("label").filter(
        F.col("label").isNotNull()
    ).distinct()
    pos_count = doc_labels.filter(F.col("label").isNotNull()).groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("n_pos"))
    all_pairs = doc_labels.select("doc_id", "content").distinct().crossJoin(
        F.broadcast(label_dim)
    )
    negs = all_pairs.join(
        doc_labels.select("doc_id", "label"), ["doc_id", "label"], "left_anti"
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.xxhash64(F.lit(seed), "doc_id", "label")
    )
    return (
        negs.join(pos_count, "doc_id", "left")
        .withColumn("n_pos", F.coalesce("n_pos", F.lit(1)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= negative_ratio * F.col("n_pos"))
        .select(
            "doc_id",
            "content",
            F.col("label").alias("prompt"),
            F.lit(None)
            .cast("struct<text:string,start:long,end:long>")
            .alias("result"),
        )
    )


def relation_full_negatives(docs: DataFrame) -> DataFrame:
    """E6 (eval mode): every subject x predicate prompt not among the
    positives (cross join + anti join; utils.py:755-774)."""
    pos = relation_examples(docs).select("doc_id", "content", "prompt")
    subjects = entity_examples(docs).select(
        "doc_id", "content", F.col("result.text").alias("subj_text")
    ).distinct()
    predicates = docs.select(
        F.explode_outer(F.col("relations.type")).alias("rel_type")
    ).filter(F.col("rel_type").isNotNull()).distinct()
    universe = subjects.crossJoin(F.broadcast(predicates)).select(
        "doc_id",
        "content",
        F.concat(F.col("subj_text"), F.lit("的"), F.col("rel_type")).alias("prompt"),
    )
    return universe.join(pos, ["doc_id", "prompt"], "left_anti").select(
        "doc_id",
        "content",
        "prompt",
        F.lit(None).cast("struct<text:string,start:long,end:long>").alias("result"),
    )


def labelstudio_to_doccano(spark: SparkSession, path: str) -> DataFrame:
    """S4: Label Studio JSON export -> doccano-shaped rows
    (labelstudio2doccano.py:20-77). Handles the NER annotation result
    layout: annotations[0].result[].value{start,end,labels[0]}."""
    raw = spark.read.option("multiLine", "true").json(path)
    ann = raw.select(
        F.col("id").cast("long").alias("id"),
        F.col("data.text").alias("text"),
        F.explode_outer(F.element_at("annotations", 1)["result"]).alias("r"),
    )
    ents = ann.filter(F.col("r").isNotNull()).select(
        "id",
        "text",
        F.col("r.value.start").cast("long").alias("start_offset"),
        F.col("r.value.end").cast("long").alias("end_offset"),
        F.element_at(F.col("r.value.labels"), 1).alias("label"),
    )
    w = Window.partitionBy("id").orderBy("start_offset", "end_offset")
    ents = ents.withColumn("ent_id", F.row_number().over(w).cast("long"))
    return (
        ents.groupBy("id", "text")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("ent_id").alias("id"),
                    "start_offset",
                    "end_offset",
                    "label",
                )
            ).alias("entities")
        )
        .withColumn("relations", F.lit(None).cast(RELATION_T))
    )
