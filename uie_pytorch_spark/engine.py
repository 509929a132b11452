"""Distributed multi-stage UIE extraction engine.

Re-expresses the reference's eager BFS dataflow
(/root/reference/uie_predictor.py:212-329) as a driver-side loop over
schema-tree nodes, where each node stage is pure DataFrame algebra
around ONE Arrow-vectorized inference UDF:

    examples --(native chunk explode)--> chunks
            --(distinct (prompt, chunk))--> unique model inputs
            --(mapInArrow: tokenize+forward+decode)--> span records
            --(join back, shift by chunk offset)--> span results
            --(groupBy vote for classification items)--> cls results
            --(prompt-expansion join)--> next stage's examples

Design notes for 100 TB scale:
  * Inference is the dominant cost; identical (prompt, chunk) pairs
    are deduplicated BEFORE the UDF (web corpora repeat boilerplate),
    keyed by xxhash64 — results join back to all owners.
  * The only shuffles per stage are the dedup distinct, the join back
    (AQE decides broadcast vs shuffle; the unique-inputs side is
    usually far smaller), and a tiny groupBy for classification votes.
    Span results never need a groupBy — offsets are computed from the
    chunk index natively.
  * Only (prompt, chunk_text, key) columns enter Python; document
    blobs (html) never cross the Arrow boundary (column pruning).
  * Every stage output carries its parent span's identity columns, so
    (subj, pred, obj) triples materialize as plain projections — no
    nested structures are ever shuffled.
  * Deterministic everywhere: example ids are content hashes, vote
    sums are computed in chunk order via sort_array + aggregate, and
    the model is bitwise batch-invariant — so results are identical
    across retries, partitionings, and parallelism levels (the
    checkpoint/resume layer in kg/lineage.py depends on this).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core.textnorm import DBC_FROM, DBC_TO, dbc2sbc
from .schema import SchemaNode, build_tree

_INFER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("key2", T.LongType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("rtext", T.StringType()),
        T.StructField("rstart", T.LongType()),
        T.StructField("rend", T.LongType()),
        T.StructField("prob", T.DoubleType()),
        T.StructField("is_cls", T.BooleanType()),
    ]
)

RESULT_COLS = [
    "doc_id",
    "ex_id",
    "node_path",
    "node_name",
    "text",
    "start",
    "end",
    "prob",
    "is_cls",
    "parent_path",
    "parent_text",
    "parent_start",
    "parent_end",
    "parent_prob",
]


def _dbc2sbc_col(col: Column) -> Column:
    """Full-width -> half-width on a column; same mapping table as
    core.textnorm.dbc2sbc (reference utils.py:573-585 incl. the dead
    U+3000 branch)."""
    return F.translate(col, DBC_FROM, DBC_TO)


def _make_infer_udf(
    seed: int,
    max_seq_len: int,
    position_prob: float,
    acc_rows=None,
    acc_spans=None,
    model_path: Optional[str] = None,
    backend: str = "numpy",
    tokenizer: str = "char",
):
    """mapInArrow kernel: unique (key, prompt, chunk_text) rows in,
    one row per decoded span record out. Arrow RecordBatches directly
    (mapInArrow) — measured ~1.5x faster than mapInPandas for this
    string-heavy workload (no pandas Series materialization on either
    side). The model is a per-worker lazy singleton (reference loads
    weights once per process, uie_predictor.py:153-158).

    ``acc_rows``/``acc_spans`` are optional Spark accumulators counting
    model inputs and emitted spans — free ops metrics (approximate
    under task retries)."""

    def infer(batches):
        # late imports: run inside the executor Python worker
        import pyarrow as pa

        from uie_pytorch_spark.core.infer import infer_decode_batch
        from uie_pytorch_spark.core.model import get_model

        model = get_model(seed, model_path=model_path, backend=backend)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if acc_rows is not None:
                acc_rows.add(rb.num_rows)
            records = infer_decode_batch(
                model,
                rb.column("prompt").to_pylist(),
                rb.column("chunk_text").to_pylist(),
                max_seq_len=max_seq_len,
                position_prob=position_prob,
                tokenizer=tokenizer,
            )
            keys, keys2, ords, texts, starts, ends, probs, clss = (
                [], [], [], [], [], [], [], [],
            )
            for key, key2, recs in zip(
                rb.column("key").to_pylist(),
                rb.column("key2").to_pylist(),
                records,
            ):
                for r in recs:
                    keys.append(key)
                    keys2.append(key2)
                    ords.append(r["ord"])
                    texts.append(r["text"])
                    starts.append(r["start"])
                    ends.append(r["end"])
                    probs.append(r["prob"])
                    clss.append(r["is_cls"])
            if acc_spans is not None:
                acc_spans.add(len(keys))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keys, pa.int64()),
                    pa.array(keys2, pa.int64()),
                    pa.array(ords, pa.int32()),
                    pa.array(texts, pa.string()),
                    pa.array(starts, pa.int64()),
                    pa.array(ends, pa.int64()),
                    pa.array(probs, pa.float64()),
                    pa.array(clss, pa.bool_()),
                ],
                names=[
                    "key", "key2", "ord", "rtext", "rstart", "rend",
                    "prob", "is_cls",
                ],
            )

    return infer


@dataclass
class UIEConfig:
    seed: int = 20240816
    max_seq_len: int = 512
    position_prob: float = 0.5
    lang: str = "zh"
    split_sentence: bool = False
    # DEPRECATED no-op, kept for API compat: identical (prompt, chunk)
    # rows are ALWAYS deduplicated before inference — with duplicates
    # present, the key join-back would multiply span records per owner
    # row (each duplicate's records attach to every duplicate).
    dedupe_inference: bool = True
    # partitions for the inference stage; None -> leave to AQE
    infer_partitions: Optional[int] = None
    # model artifact seam: path to a saved .npz (core.model.save_weights)
    # shipped to executors via sc.addFile / --files / spark.archives;
    # None -> regenerate TinyUIE from `seed` in-process.
    model_path: Optional[str] = None
    # execution backend inside the UDF: numpy (always available) |
    # torch (GPU slot-in) | onnx — torch/onnx are import-guarded
    # (reference uie_predictor.py:78-117, 149-198).
    backend: str = "numpy"
    # tokenization inside the UDF: 'char' (default; exact for zh — the
    # reference's BERT tokenizer is per-character for Chinese),
    # 'wordpiece-en' (BERT-style basic split + greedy longest-match
    # sub-word pieces with real multi-char offsets; see tokenizer.py),
    # or 'wordpiece-en@<vocab-path>' (REAL vocab file with HF WordPiece
    # semantics, shipped to executors via sc.addFile / --files like a
    # model artifact).
    tokenizer: str = "char"
    # force a broadcast hint on the records join-back (decoded spans
    # are orders of magnitude smaller than the chunk table). Default
    # False = let AQE decide from runtime stats — correct at 100 TB
    # where per-stage record sets outgrow the broadcast limit; set
    # True for static-plan (AQE-off) runs at bench scale, where it
    # removes two shuffles+sorts of the wide chunk table per stage.
    join_back_broadcast: bool = False


class UIEEngine:
    """Schema-driven distributed extraction.

    ``extract(docs)`` takes a DataFrame with (doc_id: long,
    text: string) and returns a flat span table covering every schema
    node, from which ``triples()`` / ``entities()`` are projections.
    """

    def __init__(self, spark: SparkSession, schema, config: UIEConfig | None = None):
        self.spark = spark
        self.config = config or UIEConfig()
        if not self.config.dedupe_inference:
            import warnings

            warnings.warn(
                "UIEConfig.dedupe_inference=False is ignored: identical "
                "(prompt, chunk) rows are ALWAYS deduplicated before "
                "inference (duplicates would multiply span records "
                "through the key join-back).",
                DeprecationWarning,
                stacklevel=2,
            )
        self.tree = build_tree(schema)
        # ops metrics (north rule: lineage + METRICS): accumulators
        # tick as inference tasks run — zero-cost observability of the
        # dominant stage; approximate under task retries.
        sc = spark.sparkContext
        # kernel-determinism + speed: Python workers must load OpenBLAS
        # with one thread and the pinned kernel family (core.blas_env_vars)
        # no matter WHO built the SparkSession (an external harness's
        # session won't have gone through our session.get_spark).
        # sc.environment is captured into the Python function's envVars
        # when mapInArrow is invoked, and worker daemons are keyed by
        # those envVars — so mutating it here, BEFORE extract() builds
        # the inference UDF, guarantees fresh workers see the vars
        # before their first numpy import. setdefault semantics: an
        # explicitly configured environment wins.
        from .core import blas_env_vars

        for _k, _v in blas_env_vars().items():
            sc.environment.setdefault(_k, _v)
        self.acc_infer_rows = sc.accumulator(0)
        self.acc_spans_out = sc.accumulator(0)
        self._infer_udf = _make_infer_udf(
            self.config.seed,
            self.config.max_seq_len,
            self.config.position_prob,
            acc_rows=self.acc_infer_rows,
            acc_spans=self.acc_spans_out,
            model_path=self.config.model_path,
            backend=self.config.backend,
            tokenizer=self.config.tokenizer,
        )
        self._stage_caches: List[DataFrame] = []

    @property
    def metrics(self) -> dict:
        """Cumulative ops counters (valid after actions have run)."""
        return {
            "inference_rows": self.acc_infer_rows.value,
            "decoded_spans": self.acc_spans_out.value,
        }

    # ---------- public API ----------

    def extract(self, docs: DataFrame) -> DataFrame:
        """All spans for all schema nodes; see RESULT_COLS."""
        docs = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
        self._stage_caches: List[DataFrame] = []
        all_results: List[DataFrame] = []
        cached: List[DataFrame] = []
        # frontier: node -> result DF of that node's stage
        queue: List[tuple] = [(c, None) for c in self.tree.children]
        while queue:
            node, parent_results = queue.pop(0)
            examples = self._with_mpl(
                self._build_examples(node, docs, parent_results),
                node,
                parent_results,
            )
            results = self._run_stage(node, examples)
            if node.children:
                results = results.persist()
                cached.append(results)
                self._stage_caches.append(results)
            all_results.append(results)
            for child in node.children:
                queue.append((child, results))
        out = all_results[0]
        for df in all_results[1:]:
            out = out.unionByName(df)
        return out

    def unpersist(self) -> None:
        """Release stage caches after the extraction output has been
        consumed (written / collected)."""
        for df in self._stage_caches:
            df.unpersist()
        self._stage_caches = []

    @staticmethod
    def triples(spans: DataFrame) -> DataFrame:
        """(subj, pred, obj) edge projection — every parent->child
        stage edge (the KG-native output; FIXTURES.md §3)."""
        return spans.filter(F.col("parent_path").isNotNull()).select(
            "doc_id",
            F.col("parent_text").alias("subj_text"),
            F.col("parent_start").alias("subj_start"),
            F.col("parent_end").alias("subj_end"),
            F.col("node_name").alias("pred"),
            F.col("text").alias("obj_text"),
            F.col("start").alias("obj_start"),
            F.col("end").alias("obj_end"),
            F.col("parent_prob").alias("subj_prob"),
            F.col("prob").alias("obj_prob"),
        )

    @staticmethod
    def entities(spans: DataFrame) -> DataFrame:
        return spans.filter(F.col("parent_path").isNull()).select(
            "doc_id", "node_name", "text", "start", "end", "prob"
        )

    # ---------- stage construction ----------

    def _child_prompt_col(self, node: SchemaNode) -> Column:
        parent_text = F.col("text")
        if self.config.lang == "en":
            prefix, suffix = node.en_prompt_parts()
            if suffix:
                raw = F.concat(F.lit(prefix + " of "), parent_text, F.lit(suffix))
            else:
                raw = F.concat(F.lit(node.name + " of "), parent_text)
        else:
            raw = F.concat(parent_text, F.lit("的" + node.name))
        return _dbc2sbc_col(raw)

    def _build_examples(
        self, node: SchemaNode, docs: DataFrame, parent_results: Optional[DataFrame]
    ) -> DataFrame:
        """examples: (doc_id, ex_id, prompt, text, parent_*)."""
        if parent_results is None:
            return docs.select(
                "doc_id",
                F.xxhash64(F.lit(node.path), F.col("doc_id")).alias("ex_id"),
                F.lit(dbc2sbc(node.name)).alias("prompt"),
                "text",
                F.lit(None).cast("string").alias("parent_path"),
                F.lit(None).cast("string").alias("parent_text"),
                F.lit(None).cast("long").alias("parent_start"),
                F.lit(None).cast("long").alias("parent_end"),
                F.lit(None).cast("double").alias("parent_prob"),
            )
        # one example per parent span (prompt-expansion join, the
        # subject->predicate step; reference uie_predictor.py:315-328).
        # Parent results join back to docs to recover the full text —
        # results deliberately don't carry the text column around.
        parents = parent_results.select(
            "doc_id",
            F.col("ex_id").alias("parent_ex"),
            F.col("node_path").alias("parent_path"),
            F.col("text").alias("parent_text"),
            F.col("start").alias("parent_start"),
            F.col("end").alias("parent_end"),
            F.col("prob").alias("parent_prob"),
            self._child_prompt_col(node).alias("prompt"),
        )
        return parents.join(docs, "doc_id").select(
            "doc_id",
            F.xxhash64(
                F.col("parent_ex"),
                F.lit(node.path),
                F.col("parent_text"),
                F.coalesce(F.col("parent_start"), F.lit(-1)),
                F.coalesce(F.col("parent_end"), F.lit(-1)),
            ).alias("ex_id"),
            "prompt",
            "text",
            "parent_path",
            "parent_text",
            "parent_start",
            "parent_end",
            "parent_prob",
        )

    def _with_mpl(
        self,
        examples: DataFrame,
        node: SchemaNode,
        parent_results: Optional[DataFrame],
    ) -> DataFrame:
        """Attach the stage window size as an ``mpl`` column WITHOUT a
        driver-side job.

        Reference quirk (uie_predictor.py:418): the window deducts the
        length of the LEXICOGRAPHICALLY max prompt (Spark string max is
        binary-collation UTF-8 order == Python code-point order).

        * Root stage: the prompt is a literal -> mpl is a literal. No
          Spark job at all (round 1 ran a full scan of docs here).
        * Child stage: max(prompt) depends only on parent span texts,
          so it is computed from the (persisted) parent results as a
          1-row agg cross-joined back as a broadcast — a scalar
          subquery. The whole extraction stays one lazy DAG; round 1's
          per-stage collect() + examples-subtree recompute (2 extra
          passes incl. a docs re-join per stage) is gone.
        """
        from .core.textnorm import MIN_PREDICT_WINDOW, max_predict_len

        msl = self.config.max_seq_len
        if parent_results is None:
            mpl = max_predict_len([dbc2sbc(node.name)], msl)
            return examples.withColumn("mpl", F.lit(mpl))
        mpl_df = (
            parent_results.select(self._child_prompt_col(node).alias("p"))
            .agg(F.max("p").alias("maxp"))
            .select(
                F.greatest(
                    # empty stage -> maxp NULL -> fall back to msl-3
                    # BEFORE the greatest (any window works: there are
                    # no rows to chunk)
                    F.coalesce(
                        F.lit(msl) - F.length("maxp") - F.lit(3),
                        F.lit(msl - 3),
                    ),
                    F.lit(MIN_PREDICT_WINDOW),
                )
                .cast("int")
                .alias("mpl")
            )
        )
        return examples.crossJoin(F.broadcast(mpl_df))

    def _chunk(self, examples: DataFrame) -> DataFrame:
        """Native chunk explode. Fixed windows: chunk k covers chars
        [k*mpl, (k+1)*mpl); its char offset is exactly k*mpl
        (uie_predictor.py:364-409, 551-565). Sentence mode replays the
        reference regex chain then windows each sentence; offsets are
        a running sum of chunk lengths. The window size is the ``mpl``
        column attached by _with_mpl (literal or broadcast scalar)."""
        mpl = F.col("mpl")
        if not self.config.split_sentence:
            n = F.when(F.length("text") <= mpl, F.lit(1)).otherwise(
                F.ceil(F.length("text") / mpl)
            )
            chunks = examples.select(
                "*",
                F.posexplode(F.sequence(F.lit(0), n - 1)).alias("pos", "_i"),
            )
            return chunks.select(
                "*",
                F.substring(
                    F.col("text"), F.col("pos") * mpl + 1, mpl
                ).alias("chunk_text"),
                (F.col("pos").cast("long") * mpl).alias("chunk_off"),
            ).drop("_i")
        # sentence split: identical regex chain to utils.py:560-570
        sent = examples.withColumn(
            "_para",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("text"), r"([。！？\?])([^”’])", "$1\n$2"
                        ),
                        r"(\.{6})([^”’])",
                        "$1\n$2",
                    ),
                    r"(\…{2})([^”’])",
                    "$1\n$2",
                ),
                r"([。！？\?][”’])([^，。！？\?])",
                "$1\n$2",
            ),
        ).withColumn("_para", F.regexp_replace("_para", r"(?U)\s+$", ""))
        sent = sent.select(
            "*", F.posexplode(F.split("_para", "\n")).alias("sent_idx", "sent")
        ).drop("_para")
        n = F.when(F.length("sent") <= mpl, F.lit(1)).otherwise(
            F.ceil(F.length("sent") / F.lit(mpl))
        )
        chunks = sent.select(
            "*", F.posexplode(F.sequence(F.lit(0), n - 1)).alias("win_idx", "_i")
        ).drop("_i")
        chunks = chunks.withColumn(
            "chunk_text",
            F.substring(F.col("sent"), F.col("win_idx") * mpl + 1, mpl),
        )
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy("ex_id")
            .orderBy("sent_idx", "win_idx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        chunks = chunks.withColumn(
            "chunk_off",
            F.coalesce(F.sum(F.length("chunk_text")).over(w), F.lit(0)).cast("long"),
        )
        w2 = Window.partitionBy("ex_id").orderBy("sent_idx", "win_idx")
        return chunks.withColumn(
            "pos", F.row_number().over(w2) - 1
        ).drop("sent", "sent_idx", "win_idx")

    def _run_stage(self, node: SchemaNode, examples: DataFrame) -> DataFrame:
        # (key, key2) is the join identity between owner chunks and
        # decoded records: two independent 64-bit hashes (different
        # field orders -> different byte streams) give ~2^-128 birthday
        # collision odds at billions of unique chunks, where a single
        # xxhash64 would silently cross-attach spans (~50% at ~4.3e9).
        chunks = (
            self._chunk(examples)
            .withColumn("key", F.xxhash64("prompt", "chunk_text"))
            .withColumn("key2", F.xxhash64("chunk_text", "prompt"))
        )

        # ALWAYS dedupe identical (prompt, chunk) rows before the model:
        # web corpora repeat boilerplate, and the join-back would
        # multiply records if duplicates survived here.
        infer_in = chunks.select(
            "key", "key2", "prompt", "chunk_text"
        ).dropDuplicates(["key", "key2"])
        # ALWAYS repartition before the model UDF: the inference stage
        # is compute-bound, not size-bound — AQE's size-based
        # coalescing would shrink the tiny post-distinct shuffle to 1
        # partition and serialize all model work on one core.
        # Round 6: default dropped from 2x to 1x defaultParallelism —
        # one task wave instead of two. Rows are spread evenly by the
        # 64-bit dedup hash and the bucketed kernel bounds per-row cost
        # variance, so the finer 2x granularity bought no balance but
        # paid an extra wave of task/scheduling overhead and more
        # cache-lock contention between AQE's concurrent stage jobs
        # (measured 9.2 s -> 7.4 s on the sf0.1 flagship at 32 cores;
        # stragglers from slow NODES are speculative execution's job,
        # not the partition count's).
        n_parts = self.config.infer_partitions or (
            self.spark.sparkContext.defaultParallelism
        )
        infer_in = infer_in.repartition(n_parts, "key")
        records = infer_in.mapInArrow(self._infer_udf, schema=_INFER_SCHEMA)
        # both the span branch and the cls-vote branch scan `records`;
        # without a persist the model would run TWICE per stage
        # (DataFrame unions don't share subtrees). Far cheaper to cache
        # the decoded spans (tiny vs the inference that made them).
        records = records.persist()
        self._stage_caches.append(records)
        # Round 6: probe the persisted records ONCE per stage and skip
        # the whole classification-vote subtree when the model decoded
        # no cls answers (span-only schemas — the flagship — pay three
        # aggregation stages + their AQE scheduling for provably-empty
        # output otherwise). The probe's isEmpty also materializes the
        # inference stage by itself, so the downstream branch jobs read
        # the cache instead of racing to build it. Output is identical
        # by construction: an empty cls input aggregates to zero rows.
        has_cls = not records.filter(F.col("is_cls")).isEmpty()

        right = (
            F.broadcast(records)
            if self.config.join_back_broadcast
            else records
        )
        joined = chunks.drop("prompt", "chunk_text", "text", "mpl").join(
            right, ["key", "key2"]
        )

        span_rows = joined.filter(~F.col("is_cls")).select(
            "doc_id",
            "ex_id",
            F.lit(node.path).alias("node_path"),
            F.lit(node.name).alias("node_name"),
            F.col("rtext").alias("text"),
            (F.col("rstart") + F.col("chunk_off")).alias("start"),
            (F.col("rend") + F.col("chunk_off")).alias("end"),
            "prob",
            F.col("is_cls"),
            "parent_path",
            "parent_text",
            "parent_start",
            "parent_end",
            "parent_prob",
        )

        if not has_cls:
            return span_rows.select(RESULT_COLS)

        # classification vote (uie_predictor.py:529-550): per chunk
        # only the FIRST cls record counts; per example the winner is
        # max by (count, prob sum), ties -> earliest chunk; reported
        # probability is the mean. Sums run in chunk order (in-order
        # fold) for bitwise determinism.
        # Round 6: ONE exchange for the whole vote chain — hash
        # partitioning by (doc_id, ex_id) satisfies the clustering
        # requirement of all three groupBys ((doc,ex,pos), (doc,ex,
        # rtext), (doc,ex) are supersets), so the two downstream
        # aggregations run exchange-free where the old chain paid
        # three shuffles (guide §2.4: establish the partitioning once).
        cls_in = joined.filter(F.col("is_cls")).repartition(
            "doc_id", "ex_id"
        )
        cls_first = (
            cls_in
            .groupBy("doc_id", "ex_id", "pos")
            .agg(
                F.min_by(
                    F.struct("rtext", "prob"), F.col("ord")
                ).alias("first_rec"),
                F.first("parent_path", ignorenulls=False).alias("parent_path"),
                F.first("parent_text").alias("parent_text"),
                F.first("parent_start").alias("parent_start"),
                F.first("parent_end").alias("parent_end"),
                F.first("parent_prob").alias("parent_prob"),
            )
            .select(
                "doc_id",
                "ex_id",
                "pos",
                F.col("first_rec.rtext").alias("rtext"),
                F.col("first_rec.prob").alias("prob"),
                "parent_path",
                "parent_text",
                "parent_start",
                "parent_end",
                "parent_prob",
            )
        )
        per_option = cls_first.groupBy("doc_id", "ex_id", "rtext").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "prob"))),
                F.lit(0.0),
                lambda acc, x: acc + x["prob"],
            ).alias("sum_prob"),
            F.min("pos").alias("first_pos"),
            F.first("parent_path").alias("parent_path"),
            F.first("parent_text").alias("parent_text"),
            F.first("parent_start").alias("parent_start"),
            F.first("parent_end").alias("parent_end"),
            F.first("parent_prob").alias("parent_prob"),
        )
        cls_rows = (
            per_option.groupBy("doc_id", "ex_id")
            .agg(
                F.max_by(
                    F.struct(
                        "rtext", "cnt", "sum_prob",
                        "parent_path", "parent_text", "parent_start",
                        "parent_end", "parent_prob",
                    ),
                    F.struct(
                        F.col("cnt"), F.col("sum_prob"), (-F.col("first_pos"))
                    ),
                ).alias("w")
            )
            .select(
                "doc_id",
                "ex_id",
                F.lit(node.path).alias("node_path"),
                F.lit(node.name).alias("node_name"),
                F.col("w.rtext").alias("text"),
                F.lit(None).cast("long").alias("start"),
                F.lit(None).cast("long").alias("end"),
                (F.col("w.sum_prob") / F.col("w.cnt")).alias("prob"),
                F.lit(True).alias("is_cls"),
                F.col("w.parent_path").alias("parent_path"),
                F.col("w.parent_text").alias("parent_text"),
                F.col("w.parent_start").alias("parent_start"),
                F.col("w.parent_end").alias("parent_end"),
                F.col("w.parent_prob").alias("parent_prob"),
            )
        )
        return span_rows.select(RESULT_COLS).unionByName(
            cls_rows.select(RESULT_COLS)
        )
