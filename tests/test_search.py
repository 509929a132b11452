"""Unit semantics for the lexical retrieval tier
(operators/search.py) on controlled mini corpora — the oracle suite
(test_queries_oracle) pins the fixture-scale behavior; these pin the
edge cases the fixture cannot reach."""

from __future__ import annotations

import pytest

from uie_pytorch_spark.operators import search as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tf_idf_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        [
            (1, "common common common zebra"),
            (2, "common words here"),
            (3, "common words again"),
        ],
    )
    top = {
        r["doc_id"]: r["term"]
        for r in S.tf_idf_top_terms(docs, k=1).collect()
    }
    # tf dominance: common = 3*(ln(4/4)+1) = 3.0 beats
    # zebra = 1*(ln(4/2)+1) ~= 1.69
    assert top[1] == "common"
    docs2 = _docs(
        spark,
        [
            (1, "zebra common"),
            (2, "common words"),
            (3, "common again"),
        ],
    )
    top2 = {
        r["doc_id"]: r["term"]
        for r in S.tf_idf_top_terms(docs2, k=1).collect()
    }
    # equal tf=1: the df=1 term wins over the df=3 term
    assert top2[1] == "zebra"


def test_tf_idf_rank_is_dense_per_doc_and_capped(spark):
    docs = _docs(spark, [(1, "a b c d e f g"), (2, "a b")])
    out = S.tf_idf_top_terms(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    assert sorted(by_doc[1]) == [1, 2, 3]
    assert sorted(by_doc[2]) == [1, 2]


def test_bm25_more_query_terms_rank_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "spark shuffle join filler filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "nothing relevant at all here whatsoever"),
        ],
    )
    out = S.bm25_topk(docs, ["spark", "shuffle", "join"], k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
    assert 3 not in ranks  # zero matching terms -> absent
    assert ranks[1] == 1 and ranks[2] == 2
    assert hits[1] == 3 and hits[2] == 1


def test_bm25_query_casefolds(spark):
    docs = _docs(spark, [(1, "Spark rocks")])
    out = S.bm25_topk(docs, ["SPARK"], k=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_phrase_match_positions_and_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a"),  # 'a b a' occurs at 1 and 3 (overlap)
            (2, "a b c"),
            (3, "b a b"),
        ],
    )
    out = {
        (r["doc_id"], r["start_pos"])
        for r in S.phrase_match(docs, "a b a").collect()
    }
    assert out == {(1, 1), (1, 3)}


def test_phrase_match_single_term_is_postings(spark):
    docs = _docs(spark, [(1, "x y x"), (2, "y")])
    out = {
        (r["doc_id"], r["start_pos"])
        for r in S.phrase_match(docs, "x").collect()
    }
    assert out == {(1, 1), (1, 3)}


def test_phrase_match_tokenizes_phrase_like_corpus(spark):
    # punctuation in the phrase is stripped by the corpus token rule
    docs = _docs(spark, [(1, "hello world again")])
    out = S.phrase_match(docs, "Hello, WORLD!").collect()
    assert [(r["doc_id"], r["start_pos"]) for r in out] == [(1, 1)]


def test_phrase_match_empty_phrase_raises(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        S.phrase_match(docs, "!!! ...")


def test_token_positions_are_one_based_in_order(spark):
    docs = _docs(spark, [(7, "Alpha beta gamma")])
    rows = sorted(
        S.token_positions(docs).collect(), key=lambda r: r["pos"]
    )
    assert [(r["tok"], r["pos"]) for r in rows] == [
        ("alpha", 1), ("beta", 2), ("gamma", 3)
    ]
