"""The north-rule input table: Common-Crawl-style web pages
(url, warc_ts, html, text, lang) — BASELINE.json input_hint — plus a
deterministic fixture generator and the byte-identical text-extraction
stage.

At production scale this is an Iceberg table partitioned by
days(warc_ts) and bucket(url); in-sandbox we read/write parquet with
the same layout. The html column is BINARY and must never ship into a
Python UDF — extraction is native Spark expressions only, and the
per-url invariant `extract_text(html) == text` is what the north rule
calls "byte-identical extracted text per url".
"""

from __future__ import annotations

import datetime as dt
import random
from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_ZH_SENTENCES = [
    "2022语言与智能技术竞赛由中国中文信息学会和中国计算机学会联合主办。",
    "北京时间昨天晚上，选手王小明获得了全国编程大赛冠军。",
    "该赛事已举办十届，承办方为北京大学。",
    "地震造成了严重的损失，震源深度约十千米。",
    "这家店的味道还不错，但是服务态度比较差。",
    "公司第三季度营收同比增长百分之二十。",
    "他说：“我们明天出发。”然后就挂了电话。",
    "本次会议的主办方是ＡＢＣ公司，时间是２０２３年！",
]
_EN_SENTENCES = [
    "John Smith is the chief executive officer of Acme Corporation.",
    "The annual conference was hosted by the National Science Society.",
    "An earthquake of magnitude 6.2 struck the coastal region yesterday.",
    "Revenue grew by twenty percent in the third quarter.",
    "The restaurant's food was decent but the service was slow.",
    "Alice Johnson won the international chess championship in 2021.",
]

_HOT_DOMAIN = "hot.example.com"
_DOMAINS = ["alpha.example.org", "beta.example.net", "gamma.example.io"]


def generate_fixture_rows(n_docs: int = 120, seed: int = 42) -> List[tuple]:
    """Deterministic synthetic corpus per FIXTURES.md §1: zh + en
    sentences, full-width chars, ~8% long docs (>512 chars, exercises
    chunking), and a hot domain holding ~35% of urls (exercises
    salting/skew handling)."""
    rng = random.Random(seed)
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(n_docs):
        zh = rng.random() < 0.6
        pool = _ZH_SENTENCES if zh else _EN_SENTENCES
        n_sents = rng.randint(1, 4)
        if rng.random() < 0.08:  # long doc -> multiple chunks
            n_sents = rng.randint(12, 20)
        text = ("" if zh else " ").join(
            rng.choice(pool) for _ in range(n_sents)
        )
        domain = _HOT_DOMAIN if rng.random() < 0.35 else rng.choice(_DOMAINS)
        url = f"https://{domain}/page/{i}"
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        ts = t0 + dt.timedelta(minutes=i * 7)
        rows.append((url, ts, html, text, "zh" if zh else "en"))
    return rows


def fixture_web_pages(spark: SparkSession, n_docs: int = 120, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(
        generate_fixture_rows(n_docs, seed), WEB_PAGES_SCHEMA
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """Byte-identical text extraction from the html blob — native
    expressions only (no Python): decode utf-8, strip the body
    wrapper. The per-url invariant (BASELINE.json input_hint) is
    `extracted == text` for every row; test_web_pages asserts it."""
    return pages.withColumn(
        "extracted",
        F.regexp_extract(
            F.decode(F.col("html"), "UTF-8"),
            r"(?s)<body>(.*)</body>",
            1,
        ),
    )


def docs_view(pages: DataFrame) -> DataFrame:
    """(doc_id, text) view for the engine; doc_id is a deterministic
    content-independent key derived from the url so results are stable
    across runs and partitionings."""
    return pages.select(
        F.xxhash64("url").alias("doc_id"), F.col("text"), F.col("url")
    )


def write_partitioned(pages: DataFrame, path: str) -> None:
    """Production layout: partition by crawl day; at Iceberg scale this
    is days(warc_ts) + bucket(url) hidden partitioning."""
    (
        pages.withColumn("crawl_date", F.to_date("warc_ts"))
        .repartition("crawl_date")
        .write.mode("overwrite")
        .partitionBy("crawl_date")
        .parquet(path)
    )


def read_web_pages(spark: SparkSession, source: str) -> DataFrame:
    """Format-gated source: 'iceberg:<catalog.db.table>' loads through
    the Iceberg DataSource (snapshot isolation + hidden partition
    pruning on days(warc_ts)/bucket(url)); anything else is a parquet
    path with the same schema. The engine is storage-agnostic — the
    sandbox has no Iceberg runtime jar, so tests exercise the parquet
    branch and the Iceberg branch is a thin format swap."""
    if source.startswith("iceberg:"):
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    return spark.read.parquet(source)


def write_triples(df: DataFrame, target: str) -> None:
    """Format-gated sink: Iceberg append (atomic snapshot commit per
    partition batch — what kg/lineage.py's per-partition parquet
    writes model in-sandbox) or parquet append."""
    if target.startswith("iceberg:"):
        df.writeTo(target[len("iceberg:"):]).append()
    else:
        df.write.mode("append").parquet(target)


# Tracking query parameters stripped by canonical_url (the usual
# Common-Crawl / mirror-detection hygiene set).
TRACKING_PARAM_RE = r"(utm_[A-Za-z]+|fbclid|gclid|ref)=[^&]*&?"


def canonical_url(url) -> F.Column:
    """URL canonicalization for web-corpus dedup: lowercase
    scheme+host, drop a leading 'www.', strip the fragment, remove
    tracking query parameters (TRACKING_PARAM_RE) and dangling
    '?'/'&', and trim trailing slashes. Pure native regexp
    expressions (whole-stage codegen; explicit char classes only so a
    DuckDB oracle replays it byte-for-byte) — two mirror urls that
    differ only in tracking noise canonicalize equal, which is what
    makes url-level dedup meaningful BEFORE content hashing."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.regexp_replace(
        F.lower(
            F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
        ),
        r"^www\.",
        "",
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1
    )
    rest = F.regexp_replace(rest, TRACKING_PARAM_RE, "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+\?", "?")  # path/?q -> path?q
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(scheme, F.lit("://"), host, rest)
