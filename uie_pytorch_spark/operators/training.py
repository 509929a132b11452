"""Training-data compilation operators (SURVEY §2.10 / A3-train / E1 /
E5 / E7): the reference's single-process example pipeline re-expressed
as distributed transforms.

* window re-chunk (train): /root/reference/utils.py:345-422 — split
  long `content` into windows of max_seq_len - len(prompt) - 3 chars,
  MOVING the boundary left when a gold span straddles it, re-basing
  result offsets per window.
* label encoding: /root/reference/utils.py:289-332 — (content,
  prompt, result_list) -> padded token ids + multi-hot start/end
  vectors; offsets mapped through the [SEP] bias (map_offset,
  utils.py:335-342).
* 3-pool relation negatives (train): /root/reference/utils.py:
  718-752, 1014-1080 — inverse relations, non-subject entities x
  random predicate, subject x absent entity labels; each pool capped
  at negative_ratio // 3 per doc (property parity, not RNG-sequence
  parity; SURVEY §5.2/5).
* aspect-level cls examples: /root/reference/utils.py:777-789,
  912-922 — '实体##标签' annotations -> prompt '实体的<prefix>[opts]'
  with the answer span at negative offsets inside the prompt.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

RESULT_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
        ]
    )
)

TRAIN_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType()),
        T.StructField("prompt", T.StringType()),
        T.StructField("result_list", RESULT_T),
    ]
)


def read_train_jsonl(spark, path: str) -> DataFrame:
    """S2: the (content, prompt, result_list) JSONL reader."""
    return spark.read.schema(TRAIN_SCHEMA).json(path)


def _rechunk_row(content: str, prompt: str, results: List[dict], max_seq_len: int):
    """Pure-python replica of the reference reader's windowing
    (utils.py:345-422): yields (content, result_list) windows. The
    boundary moves LEFT to the straddling span's start; offsets
    re-base per window. Prompt-anchored results (end <= 0 — cls
    answers at negative offsets inside the prompt) are copied into
    EVERY window UN-shifted, mirroring the reference's end<=0 branch
    (utils.py:382-388, 401-403); the reference's behavior for lists
    MIXING negative and positive offsets is order-dependent garbage
    that real data never produces — we split the two kinds instead."""
    max_content_len = max_seq_len - len(prompt) - 3
    if max_content_len <= 0:
        raise ValueError("max_seq_len too small for prompt")
    if len(content) <= max_content_len:
        yield content, results
        return
    anchored = [dict(r) for r in results if r["end"] <= 0]
    res = [dict(r) for r in results if r["end"] > 0]
    res.sort(key=lambda r: (r["start"], r["end"]))
    cur_limit = max_content_len
    out = []
    while True:
        for r in res:
            if r["start"] + 1 <= cur_limit < r["end"]:
                cur_limit = r["start"]
                break
        cur_content = content[:cur_limit]
        rest = content[cur_limit:]
        cur_results = [r for r in res if 0 <= r["start"] and r["end"] <= cur_limit]
        out.append((cur_content, cur_results + anchored))
        res = [
            {"text": r["text"], "start": r["start"] - cur_limit, "end": r["end"] - cur_limit}
            for r in res
            if r["end"] > cur_limit
        ]
        content = rest
        cur_limit = max_content_len
        if len(content) == 0:
            break
        if len(content) < cur_limit:
            out.append((content, res + anchored))
            break
    yield from out


def rechunk_train_examples(df: DataFrame, max_seq_len: int = 512) -> DataFrame:
    """A3 (train side) as mapInPandas: one row per window, offsets
    re-based; pure function of each row -> no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, prompts, resultss = [], [], []
            # itertuples, not iterrows: no per-row Series construction
            # (~5-10x less per-row overhead; same outputs)
            for row in pdf.itertuples(index=False):
                raw = row.result_list
                raw = [] if raw is None else list(raw)
                rl = [
                    {"text": r["text"], "start": int(r["start"]), "end": int(r["end"])}
                    for r in raw
                ]
                for content, results in _rechunk_row(
                    row.content, row.prompt, rl, max_seq_len
                ):
                    contents.append(content)
                    prompts.append(row.prompt)
                    resultss.append(
                        [
                            {"text": r["text"], "start": r["start"], "end": r["end"]}
                            for r in results
                        ]
                    )
            yield pd.DataFrame(
                {"content": contents, "prompt": prompts, "result_list": resultss}
            )

    return df.mapInPandas(run, schema=TRAIN_SCHEMA)


ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("input_ids", T.ArrayType(T.LongType())),
        T.StructField("token_type_ids", T.ArrayType(T.LongType())),
        T.StructField("attention_mask", T.ArrayType(T.LongType())),
        T.StructField("start_ids", T.ArrayType(T.LongType())),
        T.StructField("end_ids", T.ArrayType(T.LongType())),
    ]
)


def encode_train_examples(df: DataFrame, max_seq_len: int = 512) -> DataFrame:
    """E1: label encoding — char offsets -> token positions through
    the [SEP] bias (utils.py:289-332; bias = prompt tokens + 2 summary
    tokens in our char tokenizer), multi-hot start/end vectors, padded
    to max_seq_len."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from uie_pytorch_spark.core.tokenizer import encode_pair

        for pdf in batches:
            rows = {k: [] for k in ENCODED_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                enc = encode_pair(row.prompt, row.content, max_seq_len)
                L = enc["input_ids"].shape[0]
                ids = np.zeros(max_seq_len, dtype=np.int64)
                tt = np.zeros(max_seq_len, dtype=np.int64)
                am = np.zeros(max_seq_len, dtype=np.int64)
                ids[:L] = enc["input_ids"]
                tt[:L] = enc["token_type_ids"]
                am[:L] = enc["attention_mask"]
                start_ids = np.zeros(max_seq_len, dtype=np.int64)
                end_ids = np.zeros(max_seq_len, dtype=np.int64)
                bias = len(row.prompt) + 2  # [CLS] + prompt + [SEP]
                raw = row.result_list
                for r in ([] if raw is None else list(raw)):
                    s_tok = int(r["start"]) + bias
                    e_tok = int(r["end"]) - 1 + bias
                    if 0 <= s_tok < max_seq_len:
                        start_ids[s_tok] = 1
                    if 0 <= e_tok < max_seq_len:
                        end_ids[e_tok] = 1
                rows["input_ids"].append(ids.tolist())
                rows["token_type_ids"].append(tt.tolist())
                rows["attention_mask"].append(am.tolist())
                rows["start_ids"].append(start_ids.tolist())
                rows["end_ids"].append(end_ids.tolist())
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=ENCODED_SCHEMA)


def relation_train_negatives(
    docs: DataFrame, negative_ratio: int = 3, seed: int = 1000
) -> DataFrame:
    """E5: the three train-mode negative pools (reference
    utils.py:1014-1080 + add_relation_negative_example:718-752):
      pool 1 — inverse relations: object + '的' + predicate;
      pool 2 — non-subject entities x an existing predicate;
      pool 3 — subject x entity labels that are not predicates.
    Per-pool cap = (negative_ratio // 3) * num_positives; pools'
    LEFTOVERS then top the total back up to negative_ratio *
    num_positives (utils.py:1067-1075) — so total negatives per doc =
    min(negative_ratio * num_positives, union pool size). Docs with
    zero positives take ALL pool rows uncapped (utils.py:722-726).
    Property parity, not RNG-sequence parity (SURVEY §5.2/5):
    deterministic seeded sampling via hash-ordered row_number."""
    from ..sources.annotations import entity_examples, relation_examples

    per_n = negative_ratio // 3
    pos = relation_examples(docs).select(
        "doc_id", "content", "prompt"
    )
    ents = entity_examples(docs).select(
        "doc_id",
        "content",
        F.col("result.text").alias("ent_text"),
        F.col("prompt").alias("ent_label"),
    )
    rels = docs.select(
        F.col("id").alias("doc_id"), F.explode("relations").alias("rel")
    ).select("doc_id", F.col("rel.type").alias("predicate")).distinct()
    ents_with_id = docs.select(
        F.col("id").alias("doc_id"),
        F.col("text").alias("content"),
        F.explode("entities").alias("ent"),
    ).select(
        "doc_id",
        F.col("ent.id").alias("ent_id"),
        F.expr(
            "substring(content, ent.start_offset + 1, ent.end_offset - ent.start_offset)"
        ).alias("ent_text"),
    )
    subjects = (
        docs.select(F.col("id").alias("doc_id"), F.explode("relations").alias("rel"))
        .select("doc_id", F.col("rel.from_id").alias("ent_id"))
        .join(ents_with_id, ["doc_id", "ent_id"])
        .select("doc_id", F.col("ent_text").alias("subj_text"))
        .distinct()
    )

    # pool 1: inverse relations (object side of a positive as subject)
    objs = relation_examples(docs).select(
        "doc_id", "content", F.col("result.text").alias("obj_text")
    )
    pool1 = objs.join(rels, "doc_id").select(
        "doc_id",
        "content",
        F.concat("obj_text", F.lit("的"), F.col("predicate")).alias("prompt"),
        F.lit(1).alias("pool"),
    )
    # pool 2: non-subject entities x predicate
    non_subj = ents.join(
        subjects.withColumnRenamed("subj_text", "ent_text"),
        ["doc_id", "ent_text"],
        "left_anti",
    )
    pool2 = non_subj.join(rels, "doc_id").select(
        "doc_id",
        "content",
        F.concat("ent_text", F.lit("的"), F.col("predicate")).alias("prompt"),
        F.lit(2).alias("pool"),
    )
    # pool 3: subject x entity labels that are not predicates
    labels = ents.select("doc_id", "ent_label").distinct().join(
        rels.withColumnRenamed("predicate", "ent_label"),
        ["doc_id", "ent_label"],
        "left_anti",
    )
    pool3 = subjects.join(labels, "doc_id").join(
        docs.select(F.col("id").alias("doc_id"), F.col("text").alias("content")),
        "doc_id",
    ).select(
        "doc_id",
        "content",
        F.concat("subj_text", F.lit("的"), F.col("ent_label")).alias("prompt"),
        F.lit(3).alias("pool"),
    )

    all_pools = pool1.unionByName(pool2).unionByName(pool3)
    negs = all_pools.join(pos, ["doc_id", "prompt"], "left_anti").dropDuplicates(
        ["doc_id", "prompt", "pool"]
    )
    n_pos = pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("np"))
    negs = negs.join(n_pos, "doc_id", "left").withColumn(
        "np", F.coalesce(F.col("np"), F.lit(0))
    )
    h = F.xxhash64(F.lit(seed), "doc_id", "prompt")
    w_pool = Window.partitionBy("doc_id", "pool").orderBy(h)
    negs = negs.withColumn("rn", F.row_number().over(w_pool)).withColumn(
        "added",
        (F.col("np") == 0) | (F.col("rn") <= F.lit(per_n) * F.col("np")),
    )
    # leftover top-up: rank the rest per doc, take enough to reach
    # negative_ratio * num_positives in total
    w_doc = Window.partitionBy("doc_id")
    w_rest = Window.partitionBy("doc_id", "added").orderBy(h)
    negs = (
        negs.withColumn(
            "added_cnt",
            F.sum(F.when(F.col("added"), 1).otherwise(0)).over(w_doc),
        )
        .withColumn("rest_rn", F.row_number().over(w_rest))
        .withColumn(
            "num_sup",
            F.lit(negative_ratio) * F.col("np") - F.col("added_cnt"),
        )
    )
    return (
        negs.filter(
            F.col("added")
            | (F.col("rest_rn") <= F.greatest(F.col("num_sup"), F.lit(0)))
        )
        .select(
            "doc_id",
            "content",
            "prompt",
            "pool",
            F.lit(None).cast("struct<text:string,start:long,end:long>").alias("result"),
        )
    )


def aspect_cls_examples(docs: DataFrame, prefix: str = "情感倾向", options=("正向", "负向")) -> DataFrame:
    """E7: '实体##标签' aspect annotations -> classification examples
    whose answer span lives INSIDE the prompt at negative offsets
    (utils.py:777-789, 912-922). Input rows: (doc_id, text, aspect
    entity label like '店面##正向')."""
    opts = "[" + ",".join(options) + "]"
    e = docs.select(
        F.col("id").alias("doc_id"),
        F.col("text").alias("content"),
        F.explode("entities").alias("ent"),
    ).filter(F.col("ent.label").contains("##"))
    parts = e.select(
        "doc_id",
        "content",
        F.expr(
            "substring(content, ent.start_offset + 1, ent.end_offset - ent.start_offset)"
        ).alias("aspect"),
        F.split(F.col("ent.label"), "##").getItem(1).alias("answer"),
    )
    prompt = F.concat(F.col("aspect"), F.lit("的" + prefix + opts))
    # the answer span sits inside the prompt: negative offsets relative
    # to the prompt end (reference generate_cls_example semantics)
    opts_str = F.lit(opts)
    ans_pos_in_opts = F.instr(opts_str, F.col("answer"))  # 1-based
    prompt_len = F.length(prompt)
    opts_len = F.length(opts_str)
    start_in_prompt = prompt_len - opts_len + ans_pos_in_opts - 1
    return parts.select(
        "doc_id",
        "content",
        prompt.alias("prompt"),
        F.struct(
            F.col("answer").alias("text"),
            (start_in_prompt - prompt_len - 1).cast("long").alias("start"),
            (start_in_prompt + F.length("answer") - prompt_len - 1)
            .cast("long")
            .alias("end"),
        ).alias("result"),
    )
