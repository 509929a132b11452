"""Temporal joins: as-of join (latest right row at-or-before each
left row's time, per key) — the standard event-to-state attachment
(prices, profiles, config versions) that plain equi-joins cannot
express and naive range joins explode on.

Spark-first shape (the scalable pattern, not a per-key loop): UNION
the tagged sides, ONE shuffle+sort by (key, time, tag), and a
running ``last(ignorenulls)`` window carries the most recent right
payload forward onto each left row. Cost is a single exchange +
sort — O(n log n) per key group, no range-join blowup, AQE-skew-
handleable like any other sort-merge shape. (A per-key hot spot can
additionally be range-bucketed by time before the union; the window
then runs per (key, bucket) with a carried boundary row.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    suffix: str = "_right",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row whose ``on``
    time is <= the left row's (per ``by`` key). Left join semantics:
    left rows with no prior right row keep nulls. Right columns that
    clash with left names get ``suffix``; the matched right time is
    always emitted as ``{on}{suffix}``.

    ``tolerance``: optional max age in the units of ``on`` (seconds
    for timestamps) — an older match is nulled out, matching pandas
    ``merge_asof(tolerance=...)``.

    Ties: a right row AT the left row's exact time matches (>=
    semantics, same as DuckDB ASOF JOIN — the oracle replays this
    operator 1:1).
    """
    keys: List[str] = [by] if isinstance(by, str) else list(by or [])
    lcols = left.columns
    rpayload = [c for c in right.columns if c not in keys]

    lstruct = F.struct(*[F.col(c) for c in lcols]).alias("__l")
    rfields = []
    for c in rpayload:
        out_name = f"{c}{suffix}" if (c in lcols or c == on) else c
        rfields.append(F.col(c).alias(out_name))
    rstruct = F.struct(*rfields).alias("__r")

    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        lstruct,
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        rstruct,
    )
    ltype = dict(zip(lt.columns, (f.dataType for f in lt.schema)))["__l"]
    rtype = dict(zip(rt.columns, (f.dataType for f in rt.schema)))["__r"]
    u = lt.withColumn("__r", F.lit(None).cast(rtype)).unionByName(
        rt.withColumn("__l", F.lit(None).cast(ltype))
    )

    # right rows (__tag 0) sort BEFORE left rows at the same time ->
    # >= match semantics; last(ignorenulls) carries the newest right
    # payload forward within the key group
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if keys
        else Window.orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance is not None:
        age = F.col("__t").cast("double") - matched[f"{on}{suffix}"].cast(
            "double"
        )
        matched = F.when(age <= tolerance, matched)
    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__tag") == 1)
        .select("__l.*", *[F.col(f"__m.{f.name}") for f in rtype.fields])
    )
    return out
