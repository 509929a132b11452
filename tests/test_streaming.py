"""Incremental ingestion: files are processed exactly once across
stream restarts, and streamed triples equal the batch run."""

from __future__ import annotations

from pyspark.sql import functions as F

from uie_pytorch_spark.engine import UIEConfig, UIEEngine
from uie_pytorch_spark.sources.web_pages import fixture_web_pages
from uie_pytorch_spark.streaming import stream_extract

SCHEMA = {"竞赛名称": ["主办方"]}


def _triple_set(df):
    return {
        (r["doc_id"], r["subj_text"], r["subj_start"], r["pred"],
         r["obj_text"], r["obj_start"])
        for r in df.collect()
    }


def test_stream_matches_batch_and_is_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = fixture_web_pages(spark, n_docs=14, seed=21)
    first.write.mode("overwrite").parquet(inp)

    stream_extract(spark, inp, out, ckpt, SCHEMA)
    got1 = spark.read.parquet(out)

    eng = UIEEngine(spark, SCHEMA, UIEConfig())
    batch1 = UIEEngine.triples(
        eng.extract(first.select(F.xxhash64("url").alias("doc_id"), "text"))
    )
    assert _triple_set(got1) == _triple_set(batch1)

    # second wave of files: only the NEW docs are processed
    second = fixture_web_pages(spark, n_docs=30, seed=21).filter(
        ~F.col("url").isin([r["url"] for r in first.select("url").collect()])
    )
    second.write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt, SCHEMA)

    got2 = spark.read.parquet(out)
    batch2 = UIEEngine.triples(
        UIEEngine(spark, SCHEMA, UIEConfig()).extract(
            second.select(F.xxhash64("url").alias("doc_id"), "text")
        )
    )
    assert _triple_set(got2) == _triple_set(batch1) | _triple_set(batch2)
    # exactly-once: re-running with nothing new appends nothing
    stream_extract(spark, inp, out, ckpt, SCHEMA)
    assert spark.read.parquet(out).count() == got2.count()
