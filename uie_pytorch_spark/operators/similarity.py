"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force top-k / near-dup over EXACT DECIMAL dot products —
    decimal arithmetic is associative, so results are bitwise
    identical across Spark partitionings AND across engines (the
    DuckDB oracle computes the same decimals). This is the
    correctness baseline.
  * float fast path (zip_with dot product, native codegen) for
    benchmarking, plus an LSH-bucketed variant (sign-random-
    projection by deterministic hash planes) as the 100 TB scale
    path: candidates meet in buckets, exact rerank within bucket.

Near-dup by cosine >= tau is expressed without sqrt:
    dot > 0  AND  dot^2 >= tau^2 * |a|^2 * |b|^2
which stays in exact decimal arithmetic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import spread

DEC = "decimal(9,6)"


def _pairs_with_dot(emb: DataFrame, dim_limit: int | None = None) -> DataFrame:
    """All (a < b) pairs with exact decimal dot product and squared
    norms. Oracle/test path (O(n^2) — production uses lsh_buckets)."""
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).withColumn("xd", F.col("x").cast(DEC))
    norms = flat.groupBy("vec_id").agg(
        F.sum(F.col("xd") * F.col("xd")).alias("norm2")
    )
    a = flat.alias("a")
    b = flat.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .agg(F.sum(F.col("a.xd") * F.col("b.xd")).alias("dot"))
    )
    return (
        dots.join(norms.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("norm2", "norm2_a"), "vec_a")
        .join(norms.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("norm2", "norm2_b"), "vec_b")
    )


def cosine_near_dup(emb: DataFrame, tau: float = 0.95) -> DataFrame:
    """Pairs with cosine >= tau, decided in exact decimal arithmetic."""
    p = _pairs_with_dot(emb).select(
        "vec_a",
        "vec_b",
        F.col("dot").cast("double").alias("dotd"),
        F.col("norm2_a").cast("double").alias("n2a"),
        F.col("norm2_b").cast("double").alias("n2b"),
    )
    return p.filter(
        F.col("dotd") / F.sqrt(F.col("n2a") * F.col("n2b")) >= tau
    ).select("vec_a", "vec_b")


def topk_by_dot(emb: DataFrame, queries: DataFrame, k: int = 3) -> DataFrame:
    """Exact top-k neighbors by decimal dot product for the given
    query vec_ids; ties broken by neighbor id (deterministic)."""
    flat = emb.select("vec_id", F.posexplode("embedding").alias("i", "x")).withColumn(
        "xd", F.col("x").cast(DEC)
    )
    q = flat.join(queries, "vec_id").select(
        F.col("vec_id").alias("query_id"), "i", F.col("xd").alias("qx")
    )
    dots = (
        q.join(flat, "i")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum(F.col("qx") * F.col("xd")).cast("double").alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_topk_float(emb: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Float fast path: native zip_with/aggregate dot product + norms.
    No oracle (float summation order is engine-specific); used by
    bench and as the brute-force ANN baseline."""
    qv = queries.join(emb, "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = qv.crossJoin(emb.select("vec_id", "embedding")).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with("qe", "embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nq = F.sqrt(F.aggregate(F.transform("qe", lambda x: x * x), F.lit(0.0), lambda a, v: a + v))
    nv = F.sqrt(F.aggregate(F.transform("embedding", lambda x: x * x), F.lit(0.0), lambda a, v: a + v))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (nq * nv)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _flat_micro(emb: DataFrame) -> DataFrame:
    """(vec_id, i, xi) with xi = round(x * 1e6) as bigint — integer
    micro-units. Float->decimal(9,6) casts round DIFFERENTLY in Spark
    vs DuckDB at the 7th decimal (observed ~1e-8 dot drift), but
    float->double widening, *1e6 in IEEE double, and half-away-from-
    zero rounding agree bit-for-bit, so integer dots are cross-engine
    exact. Dot products fit comfortably: |xi| <= 1e6, dim 64 ->
    |dot| <= 6.4e13 << 2^63.

    Long format kept for the DuckDB oracle rendering; the Spark scale
    paths below use the ARRAY form (_micro_col) so dots run as one
    codegen'd zip_with/aggregate per pair instead of a dim-way explode
    + equi-join + hash agg (round-6 rework: same integer values —
    bigint addition is associative — at dim x fewer shuffled rows)."""
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("xi"),
    )


def _micro_col(col) -> Column:
    """array<long> of integer micro-units from an array<float/double>
    embedding column — the array twin of _flat_micro (identical
    element values: double widening, *1e6, half-away-from-zero)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c,
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"),
    )


def _zl() -> Column:
    """bigint 0 literal (built lazily — F.lit needs an active session)."""
    return F.lit(0).cast("long")


def _dot_arr(a: Column, b: Column) -> Column:
    """Exact integer dot of two micro-unit arrays with the SAME
    semantics as the old flat equi-join on index i: an index
    contributes only when present AND non-null on both sides
    (zip_with pads the shorter array with null; null products fold
    to 0, exactly like the join dropping that index). Bigint addition
    is associative, so the left-to-right fold equals the old
    shuffle-order SUM bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.coalesce(x * y, _zl())),
        _zl(),
        lambda acc, v: acc + v,
    )


def _has_vec(col) -> Column:
    """Rows the old posexplode path would KEEP: non-null, non-empty
    embedding arrays (explode of null/empty emitted no rows, dropping
    the vector from every downstream table)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.size(c) > 0)


def _plane_sign(seed: int, plane: int, i: int) -> int:
    """+-1 plane component: parity of the cross-engine h60 hash of
    'seed#plane#i' (hashing.py contract — hashlib.md5 == Spark md5 ==
    DuckDB md5 on the same UTF-8 bytes)."""
    import hashlib

    h = int(hashlib.md5(f"{seed}#{plane}#{i}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def _bucket_expr(planes: int, seed: int, dim: int) -> Column:
    """The whole bucket id as ONE parsed SQL expression: building the
    planes x dim sign literals through the Python Column API costs
    ~0.3 s of py4j round-trips per query construction, while parsing
    the equivalent expression string is ~5 ms (measured) — same
    Catalyst expressions either way, so values are identical."""
    zero = "CAST(0 AS BIGINT)"
    terms = []
    for p in range(planes):
        signs = ",".join(str(_plane_sign(seed, p, i)) for i in range(dim))
        proj = (
            f"aggregate(zip_with(_mv, array({signs}), "
            f"(x, s) -> coalesce(x * s, {zero})), {zero}, "
            "(acc, v) -> acc + v)"
        )
        terms.append(
            f"(CASE WHEN ({proj}) > 0 THEN CAST({1 << p} AS BIGINT) "
            f"ELSE {zero} END)"
        )
    return F.expr(" + ".join(terms))


def _buckets_from(
    base: DataFrame, planes: int, seed: int, dim: int
) -> DataFrame:
    """(vec_id, bucket) from an already-spread (vec_id, embedding)
    frame — shared by srp_buckets and srp_topk so the topk path pays
    one spread/scan subtree for both the bucket and rerank sides."""
    return base.select(
        "vec_id", _micro_col("embedding").alias("_mv")
    ).select("vec_id", _bucket_expr(planes, seed, dim).alias("bucket"))


def srp_buckets(
    emb: DataFrame, planes: int = 8, seed: int = 11, dim: int = 64
) -> DataFrame:
    """Sign-random-projection LSH bucket per vector: bit p of the
    bucket id is the sign of dot(v, plane_p), where plane components
    are deterministic +-1 derived from the cross-engine md5 hash
    (hashing.h60), so bucket membership is oracle-checkable in DuckDB.
    Projections run in exact decimal arithmetic — the sign test is
    bitwise identical across engines and partitionings (float sums
    near zero could flip a bucket bit between engines).

    Scale shape (round-6 rework): ZERO shuffles — the sign matrix is
    computed driver-side with hashlib.md5 (bit-identical to Spark's
    md5 and DuckDB's) and inlined as literal arrays, so each plane's
    projection is one codegen'd zip_with/aggregate over the micro-unit
    array and the bucket id is a pure per-row projection. The earlier
    shape (posexplode to dim rows -> broadcast sign join -> two
    partial-agg groupBys) shuffled dim x planes rows per vector for
    what is per-row arithmetic. Projections stay exact integer
    micro-unit sums (bigint addition is associative -> identical
    values), so the sign test never straddles a float boundary."""
    base = spread(
        emb.filter(_has_vec("embedding")).select("vec_id", "embedding")
    )
    return _buckets_from(base, planes, seed, dim)


def srp_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    seed: int = 11,
    dim: int = 64,
    probes: int = 0,
) -> DataFrame:
    """The 100 TB ANN path: SRP bucket equi-join + exact in-bucket
    rerank. Candidates for a query are ONLY the vectors sharing its
    bucket (an equi-join on bucket id — never a cross join); the
    rerank computes exact integer micro-unit dot products on candidate
    pairs by joining the pair list to the micro-unit ARRAY vectors
    (one row per pair, dot as a codegen'd zip_with/aggregate — round-6
    rework of the dim-way flat join), so the per-pair work is O(dim)
    and total work is O(sum of bucket sizes squared / buckets)
    instead of O(n^2).

    ``probes`` > 0 enables multi-probe: each query also looks in the
    buckets at Hamming distance 1 on its first ``probes`` planes (the
    standard SRP recall lever — a vector near a hyperplane lands on
    either side, so flipping one sign bit recovers most cross-boundary
    neighbors at probes x the bucket work, still never all-pairs).

    Returns (query_id, neighbor_id, dot, rank) with rank <= k, ties by
    neighbor_id — deterministic and DuckDB-oracle-checkable (planes
    are md5-derived, projections exact decimal)."""
    base = spread(
        emb.filter(_has_vec("embedding")).select("vec_id", "embedding")
    )
    buckets = _buckets_from(base, planes, seed, dim)
    qb = buckets.join(queries, "vec_id").select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    if probes > 0:
        flips = F.array(
            F.lit(0),
            *[F.shiftleft(F.lit(1), p).cast("long") for p in range(min(probes, planes))],
        )
        qb = qb.select(
            "query_id",
            F.explode(
                F.transform(flips, lambda m: F.col("bucket").bitwiseXOR(m))
            ).alias("bucket"),
        ).distinct()
    cand = qb.join(buckets, "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", F.col("vec_id").alias("neighbor_id")).distinct()

    mve = base.select("vec_id", _micro_col("embedding").alias("mv"))
    qf = mve.select(
        F.col("vec_id").alias("query_id"), F.col("mv").alias("qv")
    ).join(queries.select(F.col("vec_id").alias("query_id")), "query_id")
    nf = mve.select(
        F.col("vec_id").alias("neighbor_id"), F.col("mv").alias("nv")
    )
    dots = (
        cand.join(qf, "query_id")
        .join(nf, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot_arr(F.col("qv"), F.col("nv")).cast("double") / F.lit(1e12))
            .alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    assign_metric: str = "dot",
) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize every vector to its nearest
    centroid (one inverted list per centroid), probe each query's
    ``n_probe`` nearest lists, exact-rerank only the candidates met
    there — the other standard web-scale ANN layout next to SRP
    (faiss's IVF family).

    Scale shape (round-6 rework): the centroid table is tiny and
    BROADCAST as micro-unit ARRAYS, so the assignment is one map-side
    nested-loop join producing n x C compact rows whose scores are
    codegen'd zip_with/aggregate dots (the earlier shape exploded the
    corpus to n x dim rows and equi-joined C x dim centroid rows on
    the index — n x dim x C intermediate rows and a giant hash agg);
    the per-vector argmax is one partial-agg groupBy via struct MAX
    (same (score DESC, cent_id ASC) winner as the old row_number
    window, without the per-vector sort); candidates meet through the
    (centroid -> members) equi-join — never a cross join; rerank is
    the same pair-list x micro-array pattern as srp_topk, O(dim) per
    candidate pair.

    ``centroids``: pass a trained coarse quantizer as (vec_id,
    embedding) — e.g. pyspark.ml.clustering.KMeans cluster centers —
    for production recall. Default (None) seeds the quantizer with the
    first ``n_centroids`` vectors by vec_id: deterministic, and
    expressible in the DuckDB oracle (k-means is not), which is what
    makes this operator value-checkable. All distances are exact
    integer micro-unit dots (cross-engine identical); ties break to
    the smaller centroid / neighbor id.

    ``assign_metric``: how vectors/queries pick their lists. "dot"
    (default, the oracle-checked setting) ranks lists by max x·c;
    "l2" ranks by min ||x - c||² — the CONSISTENT pairing for
    KMeans-trained centroids (pyspark.ml trains in L2), implemented
    exactly as argmax(2·x·c - ||c||²) in the same integer micro-units
    (the ||x||² term is constant per vector and drops out). Measured
    on the sf0.01 embeddings with real KMeans centers, same n_probe=4
    budget: recall 0.59 (dot) -> 0.71 ("l2") vs brute force
    (test_operators). The final rerank is always the exact dot — the
    operator's contract."""
    if assign_metric not in ("dot", "l2"):
        raise ValueError(
            f"assign_metric must be 'dot' or 'l2', got {assign_metric!r}"
        )
    mve = spread(
        emb.filter(_has_vec("embedding")).select("vec_id", "embedding")
    ).select("vec_id", _micro_col("embedding").alias("mv"))
    cent = centroids if centroids is not None else emb.filter(
        F.col("vec_id") < n_centroids
    )
    carr = F.broadcast(
        cent.select("vec_id", "embedding")
        .filter(_has_vec("embedding"))
        .select(
            F.col("vec_id").alias("cent_id"),
            _micro_col("embedding").alias("cv"),
        )
    )
    # cnorm2 mirrors the old flat-join semantics exactly: centroid
    # components count only at indices ALSO present (non-null) in the
    # vector (the index equi-join's intersection) — for equal-dim
    # vectors this IS ||c||^2.
    score_cols = [_dot_arr(F.col("mv"), F.col("cv")).alias("cdot")]
    if assign_metric == "l2":
        score_cols.append(
            F.aggregate(
                F.zip_with(
                    F.col("mv"),
                    F.col("cv"),
                    lambda x, c: F.when(
                        x.isNull() | c.isNull(), _zl()
                    ).otherwise(c * c),
                ),
                _zl(),
                lambda acc, v: acc + v,
            ).alias("cnorm2")
        )
    scored = mve.crossJoin(carr).select("vec_id", "cent_id", *score_cols)
    # "l2": argmin ||x-c||^2 == argmax (2 x.c - ||c||^2), all integer
    # micro-unit^2 terms -> exact, no float ties (fits ANSI bigint:
    # |2 cdot| + cnorm2 < dim * 2^41 << 2^63)
    list_score = (
        F.col("cdot")
        if assign_metric == "dot"
        else F.lit(2) * F.col("cdot") - F.col("cnorm2")
    )
    # per-vector argmax with the SAME tiebreak as a (score DESC,
    # cent_id ASC) row_number: struct max is lexicographic, so the
    # winner has max score, then max(-cent_id) = min cent_id. One
    # partial-agg groupBy instead of a full-corpus window sort.
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    list_score.alias("s"), (-F.col("cent_id")).alias("nc")
                )
            ).alias("m")
        )
        .select("vec_id", (-F.col("m.nc")).alias("cent_id"))
    )
    # top-n_probe lists are needed for QUERY vectors only — rank after
    # the semi-join so the window sorts |queries| x C rows, not n x C.
    probes = (
        scored.join(queries.select("vec_id"), "vec_id", "left_semi")
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    list_score.desc(), F.col("cent_id").asc()
                )
            ),
        )
        .filter(F.col("crank") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    cand = (
        probes.join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )

    qf = mve.select(
        F.col("vec_id").alias("query_id"), F.col("mv").alias("qv")
    ).join(queries.select(F.col("vec_id").alias("query_id")), "query_id")
    nf = mve.select(
        F.col("vec_id").alias("neighbor_id"), F.col("mv").alias("nv")
    )
    dots = (
        cand.join(qf, "query_id")
        .join(nf, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot_arr(F.col("qv"), F.col("nv")).cast("double") / F.lit(1e12))
            .alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )
