"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the corpus-prep layer a 100 TB web-text pipeline runs before
extraction (boilerplate/mirror removal).

Scale design:
  * exact dedup: one hash-groupBy, map-side combinable.
  * minhash: shingle explode -> per-(doc, permutation) min — a single
    partial-aggregatable groupBy; banding turns candidate search into
    an equi-join on (band_id, band_hash) instead of O(n^2) pairs.
  * pairwise Jaccard runs ONLY on LSH candidates at scale; the
    all-pairs variant here is for oracle verification at test SF.
  * skew: boilerplate shingles hash-bucket evenly by construction
    (keys are hashes); hot bands are handled by AQE skew-join.

Oracle-compatible hashing throughout (md5-derived h60; see hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import h60

DEFAULT_K = 12       # minhash permutations
DEFAULT_BANDS = 4    # LSH bands (rows per band = K / BANDS)
DEFAULT_SHINGLE = 5  # char-shingle width


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicates by content hash: returns (content_hash,
    n_dups, canonical_doc_id=min) for groups with >1 member."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", width: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct char shingles per doc via native sequence+transform
    explode (no Python)."""
    t = F.col(text_col)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (width - 1), F.lit(1)))
    sh = F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(width))))
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    width: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(doc_id, perm, minhash): k permutations realised as salted
    md5 hashes (portable to the DuckDB oracle); one groupBy, fully
    map-side combinable."""
    sh = shingles(docs, text_col, width)
    perms = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("perm")
    salted = sh.select("doc_id", "shingle", perms).withColumn(
        "h", h60(F.concat(F.col("perm").cast("string"), F.lit("#"), F.col("shingle")))
    )
    return salted.groupBy("doc_id", "perm").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Band the signature, bucket-join docs sharing a band hash.
    Returns distinct (doc_a < doc_b) candidate pairs."""
    rows_per_band = k // bands
    banded = (
        signatures.withColumn(
            "band", F.floor(F.col("perm") / F.lit(rows_per_band)).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",", F.array_sort(F.collect_list(F.col("minhash").cast("string")))
                )
            ).alias("band_hash")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    width: int = DEFAULT_SHINGLE,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram (char-shingle) Jaccard similarity pairs >= threshold.
    With ``candidates`` given, the intersection is computed by joining
    the candidate PAIR LIST to the per-doc shingle sets (work is
    O(|candidates| * shingles-per-doc) — the all-pairs co-shingle
    blow-up never happens, and shingles of non-candidate docs are
    semi-joined away before any wide join). Without ``candidates``:
    all pairs sharing >=1 shingle (oracle/test path, O(n^2) by
    design)."""
    sh = shingles(docs, text_col, width)
    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b")
        cand_docs = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        # prune shingles (and sizes) to candidate docs BEFORE any join
        sh = sh.join(cand_docs, "doc_id", "left_semi")
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sha, "doc_a")
            .join(shb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
    )
    return out


def near_dup_canonical(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    width: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """End-to-end near-duplicate document canonicalization — the
    corpus-dedup composition a web-text pipeline runs before training:
    MinHash -> LSH banding (candidates) -> exact Jaccard verify (on
    candidates ONLY) -> connected components over verified edges ->
    (doc_id, canonical_doc_id = min doc id of the near-dup cluster;
    docs in no cluster map to themselves). Keeping `WHERE doc_id =
    canonical_doc_id` yields the deduplicated corpus.

    Scale shape: every step is the audited scale path (banded
    equi-join, candidate-pushdown Jaccard, small/large-star CC with
    per-round lineage cuts); no all-pairs work anywhere."""
    from ..kg.canonicalize import connected_components  # local: avoids cycle

    sig = minhash_signature(docs, text_col, width=width)
    cands = lsh_candidate_pairs(sig)
    verified = jaccard_pairs(
        docs, threshold=threshold, text_col=text_col, width=width,
        candidates=cands,
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comps = connected_components(verified)
    return (
        docs.select("doc_id")
        .join(comps, docs["doc_id"] == comps["id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias(
                "canonical_doc_id"
            ),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 60) -> DataFrame:
    """60-bit SimHash over whitespace tokens weighted by term
    frequency: bit j of the fingerprint is set when the tf-weighted
    sum of (+1 / -1) for that bit over all tokens is positive."""
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(r"[\S]+"), 0)).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("h", h60(F.col("tok")))
    bitrows = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    ).withColumn(
        # shiftright with a COLUMN bit count needs the SQL form
        "contrib",
        F.expr(
            "tf * (CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END)"
        ),
    )
    return (
        bitrows.groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
                    "ELSE CAST(0 AS BIGINT) END"
                )
            ).alias("simhash")
        )
    )
