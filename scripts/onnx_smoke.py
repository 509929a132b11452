#!/usr/bin/env python
"""Real-deployment smoke for the ONNX backend (run where onnxruntime
exists — it is NOT installed in the build sandbox; the wiring below is
covered there by tests/test_backends.py's fake-ort suite).

What it proves on a real machine/cluster:
  1. an .onnx artifact resolves locally or via SparkFiles and loads in
     the executor-side singleton (core.model.get_model backend='onnx');
  2. the flagship extraction runs end-to-end under
     UIEConfig(backend='onnx') on a fixture corpus;
  3. when --compare-numpy is set, the ONNX triples are compared
     row-for-row against the numpy backend (the reference validates
     ORT vs torch at atol 1e-5, export_model.py:31-117; here the
     decode threshold makes equal span SETS the meaningful check).

Usage:
  spark-submit --py-files uie_pytorch_spark.zip \
      --files /path/uie.onnx scripts/onnx_smoke.py \
      --model-path uie.onnx [--compare-numpy] [--n-docs 50]
"""

from __future__ import annotations

import argparse
import json


def _triples(spark, docs, config):
    from uie_pytorch_spark.engine import UIEEngine

    eng = UIEEngine(spark, {"subject entity": ["related fact"]}, config)
    out = UIEEngine.triples(eng.extract(docs))
    rows = {
        (r["doc_id"], r["subj_text"], r["subj_start"], r["pred"],
         r["obj_text"], r["obj_start"])
        for r in out.collect()
    }
    eng.unpersist()
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True, help=".onnx artifact")
    ap.add_argument("--n-docs", type=int, default=50)
    ap.add_argument("--compare-numpy", action="store_true")
    ap.add_argument("--lang", default="en")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from uie_pytorch_spark.engine import UIEConfig
    from uie_pytorch_spark.sources.web_pages import fixture_web_pages

    spark = SparkSession.builder.appName("uie-onnx-smoke").getOrCreate()
    import os

    if os.path.exists(args.model_path):
        spark.sparkContext.addFile(args.model_path)

    from pyspark.sql import functions as F

    docs = fixture_web_pages(spark, n_docs=args.n_docs, seed=7).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    onnx_rows = _triples(
        spark, docs,
        UIEConfig(lang=args.lang, backend="onnx", model_path=args.model_path),
    )
    result = {"backend": "onnx", "triples": len(onnx_rows)}
    if args.compare_numpy:
        np_rows = _triples(spark, docs, UIEConfig(lang=args.lang))
        result["numpy_triples"] = len(np_rows)
        result["identical"] = onnx_rows == np_rows
        result["only_onnx"] = len(onnx_rows - np_rows)
        result["only_numpy"] = len(np_rows - onnx_rows)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
