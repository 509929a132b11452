"""Wordpiece-en tokenizer mode (VERDICT r1 item 10): BERT-style basic
split + greedy longest-match sub-word pieces with real multi-char
offsets, behind the same encode contract. The reference emits
multi-char sub-word tokens for English (HF BertTokenizerFast,
uie_predictor.py:443-452); char mode stays exact for zh.
"""

from __future__ import annotations

import numpy as np

from uie_pytorch_spark.core.tokenizer import (
    basic_spans,
    encode_pair,
    encode_pair_wp,
    wordpiece_spans,
)


def test_basic_spans_words_punct_cjk():
    s = "Steve Jobs founded Apple, Inc. 在北京"
    spans = [(a, b, s[a:b]) for a, b in basic_spans(s)]
    texts = [t for _, _, t in spans]
    assert "Steve" in texts and "Jobs" in texts and "," in texts
    assert "在" in texts and "北" in texts and "京" in texts  # CJK per-char
    # spans tile the non-space text exactly
    for a, b, t in spans:
        assert s[a:b] == t and b > a


def test_wordpiece_greedy_longest_match():
    # 'founded' -> 'founded'? not in vocab; greedy: 'f','o','u','n','d','ed'
    # check a word with a known suffix: 'playing' ends with 'ing'
    s = "playing"
    pieces = [(a, b, s[a:b]) for a, b, _ in wordpiece_spans(s)]
    assert pieces[-1][2] == "ing"
    # pieces reconstruct the word contiguously
    assert pieces[0][0] == 0 and pieces[-1][1] == len(s)
    for (_, b1, _), (a2, _, _) in zip(pieces, pieces[1:]):
        assert b1 == a2
    # continuation flags: first piece is not a continuation
    flags = [c for _, _, c in wordpiece_spans(s)]
    assert flags[0] is False and all(flags[1:])


def test_wordpiece_fewer_tokens_than_chars_for_english():
    s = "the international transformation was absolutely unbelievable"
    assert len(wordpiece_spans(s)) < len(s.replace(" ", ""))


def test_encode_pair_wp_contract_and_offsets():
    prompt, text = "Person", "Steve Jobs founded Apple"
    e = encode_pair_wp(prompt, text, max_seq_len=64)
    L = e["input_ids"].shape[0]
    assert e["offset_mapping"].shape == (L, 2)
    assert e["input_ids"][0] == 1  # CLS
    # find the prompt/text boundary: first [0,0] row after index 1
    om = e["offset_mapping"]
    lp = 0
    for k in range(1, L):
        if om[k, 0] == 0 and om[k, 1] == 0:
            break
        lp += 1
    # every text-piece offset slices the text to a non-empty substring
    for k in range(lp + 2, L - 1):
        a, b = int(om[k, 0]), int(om[k, 1])
        assert 0 <= a < b <= len(text)
        assert text[a:b].strip() != ""
    # char mode still the default contract
    ec = encode_pair(prompt, text, max_seq_len=64)
    assert ec["input_ids"].shape[0] == 1 + len(prompt) + 1 + len(text) + 1


def test_encode_pair_wp_truncates_text_tail():
    e = encode_pair_wp("p", "word " * 600, max_seq_len=64)
    assert e["input_ids"].shape[0] <= 64


def test_piece_ids_deterministic_across_calls():
    a = encode_pair_wp("Person", "running quickly", 64)["input_ids"]
    b = encode_pair_wp("Person", "running quickly", 64)["input_ids"]
    assert np.array_equal(a, b)


_TOY_VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    + ["the", "of", "person", "company", "play", "found"]
    + ["##ing", "##ed", "##er", "##s", "##ation"]
    + [c for c in "abcdefghijklmnopqrstuvwxyz0123456789'"]
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789'"]
    + [",", ".", "!", "?"]
)


def _write_vocab(tmp_path, name="uie_vocab_test.txt"):
    p = tmp_path / name
    p.write_text("\n".join(_TOY_VOCAB) + "\n", encoding="utf-8")
    return p


def test_vocab_wordpiece_semantics(tmp_path):
    """Real-vocab mode follows HF WordPiece: longest-match-first
    against the FILE's tokens, '##' continuation lookups, and a word
    with no coverable remainder becomes ONE [UNK] spanning the word."""
    from uie_pytorch_spark.core.tokenizer import (
        WordpieceVocab,
        load_vocab,
        wordpiece_spans_vocab,
    )

    vocab = load_vocab(str(_write_vocab(tmp_path)))
    assert isinstance(vocab, WordpieceVocab)
    # 'playing' -> 'play' + '##ing' (longest match, continuation id)
    s = "playing"
    pieces = [(a, b, s[a:b], t) for a, b, t in wordpiece_spans_vocab(s, vocab)]
    assert [(p[2]) for p in pieces] == ["play", "ing"]
    assert pieces[0][3] == _TOY_VOCAB.index("play")
    assert pieces[1][3] == _TOY_VOCAB.index("##ing")
    # CJK char absent from the vocab -> whole-'word' [UNK] with the
    # word's span as offsets
    s2 = "play 北"
    got = wordpiece_spans_vocab(s2, vocab)
    assert got[-1] == (5, 6, _TOY_VOCAB.index("[UNK]"))
    # every ascii word is coverable via single-char fallbacks
    s3 = "zzyzx"
    got3 = wordpiece_spans_vocab(s3, vocab)
    assert [s3[a:b] for a, b, _ in got3] == list(s3)
    assert got3[1][2] == _TOY_VOCAB.index("##z")


def test_vocab_load_cached_and_sparkfiles_fallback(tmp_path, monkeypatch):
    from uie_pytorch_spark.core import tokenizer as TK

    p = _write_vocab(tmp_path)
    v1 = TK.load_vocab(str(p))
    assert TK.load_vocab(str(p)) is v1  # per-process cache
    # non-local path resolves through SparkFiles staging
    import pyspark

    monkeypatch.setattr(
        pyspark.SparkFiles, "get", staticmethod(lambda n: str(tmp_path / n))
    )
    v2 = TK.load_vocab("/not/a/real/dir/uie_vocab_test.txt")
    assert v2.index == v1.index


def test_engine_vocab_file_matches_oracle_via_sparkfiles(spark, tmp_path):
    """The vocab-file seam end-to-end: vocab shipped with sc.addFile,
    engine configured with a NON-local path (forcing executor-side
    SparkFiles resolution), output equal to the eager oracle reading
    the local file — same suite green with a real vocab slotted in."""
    from oracle_uie import OracleUIE, flat_spans
    from uie_pytorch_spark.engine import UIEConfig, UIEEngine
    from uie_pytorch_spark.sources.web_pages import generate_fixture_rows

    p = _write_vocab(tmp_path)
    spark.sparkContext.addFile(str(p))

    rows = generate_fixture_rows(n_docs=15, seed=29)
    texts = [r[3] for r in rows]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    schema = {"Person": ["Company"]}
    o = flat_spans(
        OracleUIE(
            schema, lang="en", tokenizer=f"wordpiece-en@{p}"
        ).extract(texts)
    )
    eng = UIEEngine(
        spark,
        schema,
        UIEConfig(lang="en", tokenizer="wordpiece-en@uie_vocab_test.txt"),
    )
    s = {
        (r["doc_id"], r["node_path"], r["text"], r["start"], r["end"],
         round(r["prob"], 6))
        for r in eng.extract(docs).collect()
    }
    assert s == o and s


def test_engine_wordpiece_matches_oracle(spark):
    """Distributed engine == eager oracle under wordpiece-en, including
    the slicing invariant (spans snap to piece boundaries)."""
    from oracle_uie import OracleUIE, flat_spans
    from uie_pytorch_spark.engine import UIEConfig, UIEEngine
    from uie_pytorch_spark.sources.web_pages import generate_fixture_rows

    rows = generate_fixture_rows(n_docs=18, seed=29)
    texts = [r[3] for r in rows]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    schema = {"Person": ["Company"]}
    o = flat_spans(
        OracleUIE(schema, lang="en", tokenizer="wordpiece-en").extract(texts)
    )
    eng = UIEEngine(
        spark, schema, UIEConfig(lang="en", tokenizer="wordpiece-en")
    )
    got = eng.extract(docs)
    s = set()
    for r in got.collect():
        s.add((r["doc_id"], r["node_path"], r["text"], r["start"], r["end"],
               round(r["prob"], 6)))
        if r["start"] is not None:
            assert texts[r["doc_id"]][r["start"]:r["end"]] == r["text"]
    assert s == o


def test_wordpiece_offsets_survive_length_changing_lowercase():
    """Unicode chars whose str.lower() changes length ('İ' -> 'i̇',
    'ẞ' -> 'ss') must not shift piece offsets: every span indexes the
    ORIGINAL string and stays inside its word (ADVICE r3)."""
    from uie_pytorch_spark.core.tokenizer import (
        WordpieceVocab,
        wordpiece_spans_vocab,
    )

    for s in ["İstanbul is big", "STRAẞE crossing", "İİİ ẞẞ mix"]:
        for a, b, _c in wordpiece_spans(s):
            assert 0 <= a < b <= len(s)
            assert not s[a:b].isspace()
        vocab = WordpieceVocab(["[UNK]", "istanbul", "is", "big", "s", "##s"])
        for a, b, _t in wordpiece_spans_vocab(s, vocab):
            assert 0 <= a < b <= len(s)
    # spans still tile each word contiguously
    s = "İstanbul"
    pieces = wordpiece_spans(s)
    assert pieces[0][0] == 0 and pieces[-1][1] == len(s)
    for (_, b1, _), (a2, _, _) in zip(pieces, pieces[1:]):
        assert b1 == a2


def test_vocab_larger_than_embedding_rows_warns():
    """A 30k+ real vocab aliases ids under the TinyUIE fold — loading
    one must warn instead of colliding silently (ADVICE r3)."""
    import warnings

    from uie_pytorch_spark.core.tokenizer import VOCAB_CHARS, WordpieceVocab

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        WordpieceVocab([f"tok{i}" for i in range(VOCAB_CHARS + 5)])
    assert any("alias" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        WordpieceVocab(["[UNK]", "a", "b"])
    assert not w
