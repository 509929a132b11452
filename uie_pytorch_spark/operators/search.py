"""Corpus retrieval tier: TF-IDF keyword extraction, BM25 ranked
retrieval, and a positional inverted index with phrase matching.

A web-scale KG pipeline needs lightweight lexical retrieval next to
the ANN tier (operators/similarity.py): keyword extraction feeds
entity candidate generation and document routing, BM25 answers
"which pages discuss X" without embeddings, and the positional
inverted index is the classic phrase/proximity primitive. All four
operators are pure DataFrame algebra — tokenize with a native
``regexp_extract_all`` (whole-stage codegen, no Python), aggregate
with map-side-combinable groupBys, and ship corpus-level scalars
(document count, average doc length) through single-row broadcast
joins, never as join keys.

Scale shape at 100 TB:
  * the (doc, term) frequency table is one combinable groupBy of the
    token stream — the same shuffle a word count does;
  * document frequency aggregates the tf table (rows = distinct
    (doc, term), far smaller than the token stream);
  * corpus scalars (N, avgdl) enter via ``F.broadcast`` of one-row
    aggregates, so no stage keys a shuffle on a constant;
  * BM25 filters the token stream to the query's terms BEFORE any
    aggregation (predicate pushdown to the scan), so cost is
    proportional to postings touched, not corpus size;
  * phrase match joins per-term posting lists on (doc_id, position)
    equi-keys — the Spark plan is a hash join per phrase gap, never
    a theta-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# same token rule as operators/textstats.py unigram_logprob — both
# engines replay it with their native regexp_extract_all
TOKEN_RE = r"[a-z0-9]+"


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok) token stream, lowercased alnum runs."""
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
            )
        ).alias("tok"),
    )


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok, pos) with 1-based token positions — the
    positional posting rows. posexplode keeps the array order the
    regexp produced, so positions are the in-document token index."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
            )
        ).alias("pos0", "tok"),
    ).select(
        "doc_id", "tok", (F.col("pos0") + 1).cast("int").alias("pos")
    )


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok, tf) — one combinable groupBy of the token
    stream."""
    return (
        tokens(docs, text_col)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf_top_terms(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF:
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's smooth-idf) —
    the standard keyword-extraction signal for entity candidate
    generation and topic routing.

    Output: (doc_id, rank, term, tf, df, tf_idf). Determinism: ties
    break on term ASC; equal scores only arise from identical
    (tf, df), so the ordering is total on both engines."""
    tf = term_frequencies(docs, text_col)
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n))
        .withColumn(
            "tf_idf",
            F.col("tf")
            * (
                F.log(
                    (F.col("n_corpus") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf_idf"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("tok").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("tf_idf").cast("double").alias("tf_idf"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Lucene form):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    The token stream is filtered to the query's terms BEFORE the tf
    groupBy (postings-proportional cost; the filter pushes into the
    scan), while dl/avgdl come from a separate full-stream length agg
    — N and avgdl enter as a broadcast one-row join. Output:
    (rank, doc_id, n_terms_hit, score); ties break on doc_id ASC.

    Query terms are normalized with the CORPUS token rule (lowercase +
    TOKEN_RE split, same as phrase_match), so a punctuated or
    multi-word term ('U.S.', 'hash table') contributes its
    constituent corpus tokens instead of silently matching nothing
    (round-6 fix from ADVICE; identity for terms that already are
    single corpus-rule tokens)."""
    import re

    toks = tokens(docs, text_col)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        (
            F.sum("dl").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    qt = sorted({
        tok for t in query_terms for tok in re.findall(TOKEN_RE, t.lower())
    })
    if not qt:
        raise ValueError("query_terms contain no tokens under the corpus rule")
    tf = (
        toks.filter(F.col("tok").isin(qt))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.join(F.broadcast(stats)).select(
        "tok",
        "avgdl",
        F.log(
            F.lit(1.0)
            + (
                F.col("n_corpus").cast("double")
                - F.col("df").cast("double")
                + F.lit(0.5)
            )
            / (F.col("df").cast("double") + F.lit(0.5))
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("dl").cast("double")
                        / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("s").alias("score"),
    )
    # global top-k WITHOUT an unpartitioned window (which would drain
    # every scored doc to one partition): sort+limit compiles to
    # TakeOrderedAndProject — per-partition partial top-k merged on
    # the driver — and only the k survivors get ranked.
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        F.col("score").cast("double").alias("score"),
    )


def phrase_match(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact phrase occurrences via the positional inverted index:
    tokenize the phrase with the corpus rule, then equi-join each
    term's postings on (doc_id, pos + gap). Output one row per
    occurrence: (doc_id, start_pos) — the classic phrase-query plan
    a positional index exists for.

    Scale shape: per phrase gap one hash equi-join of two term-
    filtered posting sets (each pushed down to a scan filter); no
    window, no theta-join. A one-term phrase degenerates to the
    term's postings."""
    import re

    terms = re.findall(TOKEN_RE, phrase.lower())
    if not terms:
        raise ValueError("phrase has no tokens under the corpus rule")
    pos = token_positions(docs, text_col)
    out = (
        pos.filter(F.col("tok") == terms[0])
        .select("doc_id", F.col("pos").alias("start_pos"))
    )
    for gap, term in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("tok") == term).select(
            "doc_id", (F.col("pos") - gap).alias("start_pos")
        )
        out = out.join(nxt, ["doc_id", "start_pos"])
    return out.select(
        "doc_id", F.col("start_pos").cast("int").alias("start_pos")
    )
