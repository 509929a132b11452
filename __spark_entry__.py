"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-stage UIE extraction over the
sf0.001 documents table and returns the triple table.
``queries()`` / ``oracle_sql()`` expose every SQL-expressible operator
from SURVEY.md §2 plus the training-data-pipeline additions (dedup /
similarity / text analysis); implementations live in
uie_pytorch_spark/queries.py. Non-SQL-expressible entries (the model
inference pipeline itself) have no oracle -> driver records the
weaker rows-only check; their real correctness gate is the exact
engine-vs-oracle parity suite in tests/test_engine_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_SCHEMA = {"subject entity": ["related fact"]}


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from uie_pytorch_spark.engine import UIEConfig, UIEEngine

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    engine = UIEEngine(spark, FLAGSHIP_SCHEMA, UIEConfig(lang="en"))
    spans = engine.extract(docs)
    return UIEEngine.triples(spans).orderBy(
        "doc_id", "subj_start", "pred", "obj_start", "obj_text"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: schema-driven (subject -> relation) triple extraction
    on /root/testdata/sf0.001 documents."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from uie_pytorch_spark.queries import QUERIES

    out = dict(QUERIES)
    out["uie_flagship_triples"] = _flagship
    return out


def oracle_sql() -> dict[str, str]:
    from uie_pytorch_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
