"""Jaro-Winkler similarity — the north rule's tie-breaker.

The reference has no string-distance function (its near-miss handling is
the road-number boost (1/⁴√(|Δ|+1))·2, /root/reference/core/similarity.go:
305-316); the north rule adds Jaro-Winkler for borderline pairs. Exposed as
an Arrow-batched pandas UDF (never row-at-a-time Python) and applied only
to the borderline cosine band, so its O(len²) cost touches a tiny fraction
of pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Plain-Python Jaro-Winkler in [0, 1] (1 = identical)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = np.zeros(len1, dtype=bool)
    flags2 = np.zeros(len2, dtype=bool)
    a1 = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)

    matches = 0
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        window = a2[lo:hi]
        cand = np.nonzero((window == a1[i]) & ~flags2[lo:hi])[0]
        if cand.size:
            j = lo + int(cand[0])
            flags1[i] = True
            flags2[j] = True
            matches += 1
    if matches == 0:
        return 0.0

    m1 = a1[flags1]
    m2 = a2[flags2]
    transpositions = int(np.count_nonzero(m1 != m2)) // 2

    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0
    # common prefix, up to 4 chars
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def make_jw_udf(prefix_chars: int = 512):
    """pandas UDF (string, string) → double, comparing only the first
    ``prefix_chars`` characters (bounds the O(len²) inner loop)."""

    @F.pandas_udf(T.DoubleType())
    def jw_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for s1, s2 in it:
            t1 = s1.fillna("").str.slice(0, prefix_chars)
            t2 = s2.fillna("").str.slice(0, prefix_chars)
            yield pd.Series(
                [jaro_winkler(x, y) for x, y in zip(t1, t2)], dtype="float64"
            )

    return jw_udf
