"""Eager single-process oracle for the KG canonicalization tier —
replicates kg/canonicalize.canonicalize_mentions (normalize -> MinHash
LSH -> Jaccard verify -> connected components -> canonical id) in
plain Python, with the SAME hash contracts the distributed code uses
(md5-derived h60 for minhash/banding, XXH64 seed 42 for surface ids),
so frozen goldens are fully independent of Spark execution.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Set, Tuple

from xxh64 import xxh64_str

from uie_pytorch_spark.core.textnorm import DBC_FROM, DBC_TO
from uie_pytorch_spark.operators.hashing import MINHASH_COEFFS, MINHASH_PRIME

_NORM_TABLE = str.maketrans(DBC_FROM + "　", DBC_TO + " ")
_WS = re.compile(r"\s+")

K_PERMS = 12
BANDS = 4
SHINGLE_W = 3


def normalize_surface(s: str) -> str:
    return _WS.sub(" ", s.translate(_NORM_TABLE).lower()).strip()


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def shingles(s: str, width: int = SHINGLE_W) -> Set[str]:
    n = len(s)
    return {s[i : i + width] for i in range(max(n - (width - 1), 1))}


def minhash_sig(sh: Set[str], k: int = K_PERMS) -> List[int]:
    """Affine permutations over the low 32 bits of h60 — the same
    (a*h32 + b) % P scheme (and the same fixed coefficients) as
    operators/dedup.minhash_sig_array."""
    hs = [h60(g) & 0xFFFFFFFF for g in sh]
    return [
        min((a * h + b) % MINHASH_PRIME for h in hs)
        for (a, b) in MINHASH_COEFFS[:k]
    ]


def lsh_pairs(sigs: Dict[int, List[int]]) -> Set[Tuple[int, int]]:
    """sid -> signature; returns candidate (a < b) pairs sharing a
    band hash (band hash = md5 of the PERM-ORDER string forms,
    matching operators/dedup.band_hashes)."""
    rows = K_PERMS // BANDS
    buckets: Dict[Tuple[int, str], List[int]] = {}
    for sid, sig in sigs.items():
        for band in range(BANDS):
            key = ",".join(str(m) for m in sig[band * rows : (band + 1) * rows])
            bh = hashlib.md5(key.encode()).hexdigest()
            buckets.setdefault((band, bh), []).append(sid)
    out: Set[Tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def canonicalize_surfaces(surfaces: List[str], jaccard_threshold: float = 0.6):
    """Distinct ORIGINAL surfaces -> list of (surface, surface_norm,
    canonical_surface_id) rows, mirroring the query's projection."""
    norm_of = {s: normalize_surface(s) for s in surfaces}
    norms = sorted(set(norm_of.values()))
    sid_of = {n: xxh64_str(n) for n in norms}
    sh_of = {n: shingles(n) for n in norms}
    sigs = {sid_of[n]: minhash_sig(sh_of[n]) for n in norms}
    norm_by_sid = {sid_of[n]: n for n in norms}

    edges = []
    for a, b in lsh_pairs(sigs):
        sa, sb = sh_of[norm_by_sid[a]], sh_of[norm_by_sid[b]]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= jaccard_threshold:
            edges.append((a, b))

    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: Dict[int, int] = {}
    for n in norms:
        sid = sid_of[n]
        root = find(sid)
        comp_min[root] = min(comp_min.get(root, sid), sid)
    canon = {n: comp_min[find(sid_of[n])] for n in norms}
    return [(s, norm_of[s], canon[norm_of[s]]) for s in sorted(set(surfaces))]
