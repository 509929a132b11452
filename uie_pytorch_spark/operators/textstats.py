"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.
All native Spark expressions (whole-stage codegen; no Python UDFs) and
all value-checkable against a DuckDB oracle (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60

# CJK unified ideographs (the dominant block; heuristic langid)
CJK_RE = r"[一-鿿]"
# latin letters
LATIN_RE = r"[A-Za-z]"
TOKEN_RE = r"[\S]+"
STOPWORDS = ("the", "of", "and", "to", "a", "in", "is", "it", "that", "for")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free char-class heuristic: a document is 'zh' when >30%
    of its characters are CJK ideographs, else 'en' when >30% latin,
    else 'other'. (The reference has no langid; this is the
    training-pipeline addition the north rule's corpus prep needs.)"""
    t = F.col(text_col)
    n = F.length(t)
    cjk = n - F.length(F.regexp_replace(t, CJK_RE, ""))
    latin = n - F.length(F.regexp_replace(t, LATIN_RE, ""))
    pred = (
        F.when(n == 0, F.lit("other"))
        .when(cjk / n > 0.3, F.lit("zh"))
        .when(latin / n > 0.3, F.lit("en"))
        .otherwise(F.lit("other"))
    )
    return docs.select(
        "doc_id",
        (cjk.cast("double") / F.greatest(n, F.lit(1))).alias("cjk_ratio"),
        (latin.cast("double") / F.greatest(n, F.lit(1))).alias("latin_ratio"),
        pred.alias("pred_lang"),
    )


# BPE-ish pre-tokenization regex (GPT-2-style segmentation, simplified
# to explicit char classes so Spark's Java regex and DuckDB's RE2 agree
# leftmost-first): latin word runs / digit runs with an optional
# leading space, CJK per character (BPE tokenizers emit ~1 token per
# ideograph), punctuation runs. Whitespace itself is not a token.
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+|[一-鿿]| ?[^\sA-Za-z0-9一-鿿]+"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, a BPE-ish REGEX token count (GPT-2-style
    segmentation; the pre-tokenizer pass every byte-BPE runs, so it
    tracks real tokenizer token counts far better than len/4), the
    crude len/4 subword estimate, and char count."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)).alias("bpe_tokens"),
        F.ceil(F.length(t) / 4).cast("long").alias("subword_est"),
        F.length(t).alias("n_chars_computed"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score: length band,
    punctuation ratio, stopword ratio, mean word length. Deterministic
    arithmetic only."""
    t = F.col(text_col)
    n = F.length(t)
    words = F.regexp_extract_all(F.lower(t), F.lit(r"[a-z]+"), 0)
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    punct = n - F.length(F.regexp_replace(t, r"[\.,;:!\?。！？，；：]", ""))
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = punct.cast("double") / F.greatest(n, F.lit(1))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    score = (
        F.when((n >= 50) & (n <= 2000), 0.4).otherwise(0.0)
        + F.when((punct_ratio > 0.005) & (punct_ratio < 0.2), 0.3).otherwise(0.0)
        + F.when(stop_ratio > 0.05, 0.3).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality"),
    )


def corpus_filter(
    docs: DataFrame, text_col: str = "text", min_bpe_tokens: int = 4
) -> DataFrame:
    """The composite keep/drop gate a pre-training corpus pipeline
    applies: language known (zh/en), enough tokens, sane punctuation
    density, and not a non-canonical exact duplicate. One pass over
    the corpus: the langid/token/quality features are all computed in
    a single projection (whole-stage codegen), the dup check is one
    hash groupBy — no Python anywhere.

    The token budget gate thresholds on ``bpe_tokens`` (the GPT-2-
    style pre-tokenization count — the number that actually tracks
    training cost) rather than only the whitespace count, which
    under-counts CJK text by orders of magnitude (no spaces)."""
    from .dedup import exact_dup_groups

    li = lang_id(docs, text_col)
    tc = token_count(docs, text_col)
    qs = quality_score(docs, text_col)
    hashes = docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    dup = exact_dup_groups(docs, text_col)
    is_dup = (
        hashes.join(dup, "content_hash", "left")
        .select(
            "doc_id",
            (
                F.col("canonical_doc_id").isNotNull()
                & (F.col("doc_id") != F.col("canonical_doc_id"))
            ).alias("is_dup"),
        )
    )
    joined = (
        li.select("doc_id", "pred_lang")
        .join(tc.select("doc_id", "ws_tokens", "bpe_tokens"), "doc_id")
        .join(qs.select("doc_id", "punct_ratio"), "doc_id")
        .join(is_dup, "doc_id")
    )
    keep = (
        F.col("pred_lang").isin("zh", "en")
        & (F.col("ws_tokens") >= 2)
        & (F.col("bpe_tokens") >= min_bpe_tokens)
        & (F.col("punct_ratio") < 0.2)
        & ~F.col("is_dup")
    )
    return joined.select(
        "doc_id", "pred_lang", "ws_tokens", "bpe_tokens", "punct_ratio",
        "is_dup", keep.alias("keep"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-independent 60-bit document fingerprint: bit_xor of the
    md5-derived hashes of the document's distinct whitespace tokens.
    (xor-agg is reorder-safe, so it is shuffle/partitioning-invariant
    at any scale — unlike a polynomial rolling hash.)

    Round 6: measured with and without a ``spread`` parallelism
    floor — the per-token work here is light enough that the extra
    exchange LOST ~0.1 s at bench scale, so the plain scan stays."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0))).alias("tok"),
    )
    return (
        toks.withColumn("h", h60(F.col("tok")))
        .groupBy("doc_id")
        .agg(
            F.expr("bit_xor(h)").alias("fingerprint"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
        )
    )


# -- PII redaction (training-data hygiene) ----------------------------
# Patterns deliberately use explicit char classes only, so Spark's
# Java regex and DuckDB's RE2 agree byte-for-byte (the oracle replays
# the redaction).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 -]{6,}[0-9]"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails and phone-like digit runs from the corpus — the
    standard pre-training redaction pass. One projection, whole-stage
    codegen, no Python: counts come from regexp_extract_all BEFORE
    replacement (emails first, so their digits can't double-count as
    phones in the redacted text)."""
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(
            F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0)
        ).alias("n_phones"),
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>").alias(
            "text_redacted"
        ),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition features (the Gopher/C4-style
    repetitious-text filter signal): total vs distinct token counts,
    the duplicate-token ratio, and the most frequent token with its
    frequency share. Shape is one explode + one partial-aggregatable
    (doc, token) groupBy + one per-doc window — the same skeleton as
    fingerprint(), linear in corpus size at any scale. Docs with zero
    tokens have no repetition signal and are absent from the output
    (gate them on length instead)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(r"[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("tok").asc()
    )
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_token"), "tf")
    )
    return agg.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens")).alias(
            "dup_token_ratio"
        ),
        "top_token",
        (F.col("tf") / F.col("n_tokens")).alias("top_token_frac"),
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-trained unigram log-probability per document — the
    cheap perplexity proxy (CCNet-style) used to rank documents by
    "ordinariness": avg over tokens of ln(tf_corpus / N). Low scores
    flag gibberish / rare-token soup; high scores flag boilerplate.

    Shape at 100 TB: one combinable (token) groupBy builds the
    frequency table, one equi-join scores tokens, one per-doc agg —
    and the corpus-total N enters as ``avg(ln tf) - ln N`` so it is a
    single broadcast scalar, never a skewed join key. Zero-token docs
    are absent (gate on length elsewhere)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(r"[a-z0-9]+"), 0)
        ).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = freq.agg(F.sum("tf").alias("n"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log("tf")).alias("_avg_ln_tf"),
        )
    )
    return per_doc.join(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        (F.col("_avg_ln_tf") - F.log("n")).alias("avg_logprob"),
    )


def salted_group_stats(
    docs: DataFrame,
    key: str = "source",
    salt_buckets: int = 8,
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-key corpus profile (doc count, total/avg size, share of
    corpus) computed SKEW-SAFELY: a web corpus's domain distribution
    is Zipfian — one hot domain can hold 30%+ of all rows, and a
    plain groupBy(key) sends that whole key to one reduce task.

    Shape: phase 1 pre-aggregates on (key, salt) where salt is a
    deterministic per-row bucket — the hot key's rows split across
    ``salt_buckets`` combiners; phase 2 merges the tiny per-salt
    partials on key alone. All sums/counts are algebraic, so the
    result is EXACTLY the unsalted groupBy's (the oracle runs the
    plain GROUP BY); the corpus total joins back as a broadcast
    scalar, never a join key.
    """
    salt = (h60(F.concat_ws("|", F.col("doc_id").cast("string")))
            % salt_buckets)
    partial = (
        docs.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(size_col).alias("__sz"),
        )
    )
    merged = partial.groupBy(key).agg(
        F.sum("__n").cast("long").alias("n_docs"),
        F.sum("__sz").cast("long").alias("total_chars"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("__total"))
    return merged.join(F.broadcast(total)).select(
        key,
        "n_docs",
        "total_chars",
        (F.col("total_chars") / F.col("n_docs")).alias("avg_chars"),
        (F.col("n_docs") / F.col("__total")).alias("corpus_share"),
    )


def length_quantiles(
    docs: DataFrame, key: str = "source", size_col: str = "n_chars"
) -> DataFrame:
    """Per-key exact length quantiles (p50/p90/p99) + max — the
    length-distribution report behind chunk-size / maxPartitionBytes
    tuning. Uses the exact ``percentile`` aggregate (linear
    interpolation, ANSI semantics — identical to DuckDB's
    quantile_cont) which computes all three quantiles in ONE
    aggregation pass; at 100 TB swap in approx_percentile with a
    bounded error for a sketch-merge plan, same query shape."""
    return docs.groupBy(key).agg(
        F.percentile(F.col(size_col), F.lit(0.5)).alias("p50_chars"),
        F.percentile(F.col(size_col), F.lit(0.9)).alias("p90_chars"),
        F.percentile(F.col(size_col), F.lit(0.99)).alias("p99_chars"),
        F.max(size_col).cast("long").alias("max_chars"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


def _id_bucket(id_col: str, seed: str, mod: int) -> Column:
    """The shared id-keyed bucket expression behind hash_split and
    corpus_mix_sample: ``h60(id || '|' || seed) % mod``. One helper so
    the leakage-safety argument (near-dup variants of one id always
    land together) rests on a single keying scheme that cannot
    silently diverge between the two operators.

    Null-id behavior (ADVICE r5, documented rather than changed — the
    oracle freezes concat_ws semantics): concat_ws skips NULLs, so
    every null-id doc hashes to h60(seed) and shares ONE bucket —
    corpus_mix_sample/hash_split keep or drop all of them together
    instead of sampling at the target rate. Supply non-null ids (or
    pre-assign surrogates) when null ids are possible."""
    return h60(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed))
    ) % mod


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash bucket: h60(id || seed) % 100 -> [0, train) train,
    [train, train+val) val, rest test. Stable across runs, partitions
    and cluster sizes (pure projection — zero shuffles), and
    re-shardable by changing ``seed`` only. The standard leakage-safe
    split for training-data pipelines (id-keyed, so near-dup variants
    of one id always land in the same shard)."""
    bucket = _id_bucket(id_col, seed, 100)
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return docs.withColumn("split_bucket", bucket.cast("int")).withColumn(
        "split", split
    )


def corpus_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: str = "mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified downsampling to per-stratum target
    rates — the corpus-mixing step that rebalances a crawl before
    training (e.g. keep 100% of zh, 25% of en, drop the rest). A doc
    is kept iff ``h60(id || seed) % 1_000_000 < rate * 1_000_000``, so
    membership is a pure projection: content-independent, stable
    across runs / partitionings / cluster sizes, re-drawable by
    changing ``seed`` only, and id-keyed so near-dup variants sharing
    an id stay together (same leakage-safety argument as hash_split).

    Strata absent from ``rates`` get ``default_rate``. Rates are
    applied through an exact integer threshold (round of rate * 1e6)
    so Spark and any SQL oracle agree bit-for-bit.

    Scale shape: ONE broadcast join against the tiny rate dim + a
    filter — zero shuffles of the corpus; the expected kept fraction
    per stratum converges to its rate by the uniformity of the hash."""
    # round, don't truncate: int(0.29 * 1e6) is 289999 because the
    # binary double sits just below the decimal product — round()
    # recovers the exact integer threshold the docstring promises
    rate_rows = [
        (k, int(round(float(v) * 1_000_000))) for k, v in sorted(rates.items())
    ]
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        rate_rows, f"{stratum_col}: string, __thresh: long"
    )
    bucket = _id_bucket(id_col, seed, 1_000_000)
    dflt = int(round(float(default_rate) * 1_000_000))
    return (
        docs.join(F.broadcast(dim), stratum_col, "left")
        .withColumn("__bucket", bucket)
        .filter(
            F.col("__bucket")
            < F.coalesce(F.col("__thresh"), F.lit(dflt))
        )
        # re-select the input columns: a USING join moves the join key
        # first, and this operator's contract is a pure FILTER over
        # the input (schema preserved, order included)
        .select(*docs.columns)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one token ``n``-gram with an evaluation set — the
    standard pre-training hygiene pass (GPT-3 App. C / PaLM style:
    8-gram overlap) that keeps eval answers out of the training
    corpus. Returns (id_col, n_contaminated_ngrams) for flagged docs;
    anti-join the result against the corpus to drop them (kept
    separate so callers can audit before deleting).

    Tokenization is lowercase whitespace splitting on both sides —
    deterministic and language-agnostic; n-grams are joined with a
    single space so differing whitespace runs cannot defeat the match.

    Scale shape: the eval side (benchmarks are ~10^5-10^6 n-grams) is
    DISTINCT-collapsed and broadcast; the corpus side explodes token
    windows as a pure projection (F.transform over F.sequence — no
    Python, no shuffle) straight into the broadcast inner join, and
    the per-doc DISTINCT count happens AFTER the join — so the only
    shuffle of corpus-derived rows carries the MATCHED (contaminated)
    n-grams, never the corpus n-gram stream itself. Output is bounded
    by the contaminated docs."""

    def _ngrams(df: DataFrame, id_cols: list, text: str) -> DataFrame:
        toks = F.split(F.trim(F.lower(F.col(text))), r"\s+")
        # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of
        # returning empty, so short docs need an explicit empty list
        idx = F.when(
            F.size(toks) >= n,
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
        )
        return df.select(*id_cols, F.explode(grams).alias("ngram"))

    ev = (
        _ngrams(eval_docs.filter(F.col(eval_text_col).isNotNull()), [], eval_text_col)
        .distinct()
    )
    d = _ngrams(
        docs.filter(F.col(text_col).isNotNull()), [F.col(id_col)], text_col
    )
    return (
        d.join(F.broadcast(ev), "ngram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("ngram").cast("long").alias("n_contaminated_ngrams")
        )
    )
