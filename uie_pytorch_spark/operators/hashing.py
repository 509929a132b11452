"""Cross-engine deterministic hashing.

Spark's xxhash64/hash and DuckDB's hash() disagree, so every operator
that must be oracle-checkable derives integer hashes from md5 hex
strings, which both engines compute identically:

    Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
    DuckDB: ('0x' || substr(md5(s), 1, 15)) :: bigint

15 hex digits = 60 bits, so the value is always non-negative and fits
a signed 64-bit integer in both engines. For production-scale paths
where no oracle is needed (e.g. inference dedup keys) we use the
cheaper native xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column | str) -> Column:
    """60-bit non-negative hash of a string column, oracle-compatible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """The DuckDB-side rendering of h60 for oracle SQL strings."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


# MinHash permutations: classic (a*h32 + b) mod p universal hashing
# over the LOW 32 BITS of the md5-derived base hash. One base hash per
# shingle + k cheap affine mixes replaces k md5 calls per shingle (the
# round-2 scheme) — ~k x less hashing and a k-times-smaller shuffle.
#
# Overflow contract (Spark 4 ANSI mode: bigint overflow THROWS):
#   h32 < 2^32, a < 2^31, b < 2^31  =>  a*h32 + b < 2^63. Both engines
# evaluate the expression in exact signed-64 arithmetic.
MINHASH_PRIME = 4294967311  # smallest prime > 2^32

# Fixed literals (random.Random(20260816)) so Spark, DuckDB oracle SQL
# and the eager Python oracle inline the SAME constants.
MINHASH_COEFFS = [
    (1864550318, 2014205137),
    (751060713, 2002287815),
    (616008998, 40920674),
    (1595354702, 1609944094),
    (1542395096, 1727607202),
    (316175860, 1540964996),
    (1041917222, 1408451663),
    (1923919257, 1995855315),
    (857565296, 843102230),
    (133847858, 953394251),
    (277455873, 1628151810),
    (382193402, 1483498833),
    (2049709813, 1249365397),
    (1256990088, 1765669222),
    (235210066, 620635567),
    (42998692, 1193949114),
]
