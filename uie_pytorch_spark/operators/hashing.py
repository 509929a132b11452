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


# Parameters of the k independent minhash permutations: classic
# (a*h + b) mod p universal hashing over the 60-bit base hash.
MINHASH_PRIME = 2305843009213693951  # 2^61 - 1 (Mersenne)


def minhash_params(k: int, seed: int = 7):
    """Deterministic (a, b) pairs — small odd multipliers derived from
    a linear congruence so both engines can inline them as literals."""
    params = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    x = seed
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 61)
        a_i = (x | 1) % MINHASH_PRIME
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 61)
        b_i = x % MINHASH_PRIME
        params.append((a_i, b_i))
    return params
