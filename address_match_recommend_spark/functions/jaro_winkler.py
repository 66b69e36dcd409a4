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


def jaro_winkler_batch(
    s1s: "list[str]", s2s: "list[str]", prefix_weight: float = 0.1
) -> np.ndarray:
    """Batch-vectorized Jaro-Winkler — exactly :func:`jaro_winkler` per
    row (pinned by a hypothesis equivalence test), evaluated with the
    position loop run ONCE per column and every numpy op spanning the
    whole batch. Two constant-factor tricks on top of the transpose:

    - **sentinel consumption**: instead of a boolean ``flags2`` mask
      re-ANDed every iteration, consumed positions of a working copy of
      the right-hand strings are overwritten with a value no real
      character takes (255 in the uint8 fast path — used only when every
      char < 255 — else 2³²−1, above the Unicode max), so per-position
      eligibility is a single equality compare; ``flags2`` is recovered
      at the end as ``working != original``.
    - **uint8 narrowing** when the batch is pure 8-bit text (the common
      case for transcript prefixes): 4× less memory traffic.

    Measured ~84 µs/pair on 512-char near-duplicate prefixes vs
    ~1,385 µs for the scalar loop (16×) — this kernel is what makes the
    borderline band affordable when it is NOT a small fraction of pairs
    (the 50k scaling corpus puts 74% of scored pairs in [tau_lo,
    tau_hi); scripts/scoring_probe.py)."""
    B = len(s1s)
    out = np.zeros(B, dtype=np.float64)
    if B == 0:
        return out
    l1 = np.fromiter((len(a) for a in s1s), dtype=np.int64, count=B)
    l2 = np.fromiter((len(b) for b in s2s), dtype=np.int64, count=B)
    eq = np.fromiter((a == b for a, b in zip(s1s, s2s)), dtype=bool, count=B)
    out[eq] = 1.0
    live = ~eq & (l1 > 0) & (l2 > 0)
    if not live.any():
        return out
    idx = np.nonzero(live)[0]
    n = idx.size
    L1 = l1[idx]
    L2 = l2[idx]
    Lmax1 = int(L1.max())
    Lmax2 = int(L2.max())
    A1 = np.zeros((n, Lmax1), dtype=np.uint32)
    A2 = np.zeros((n, Lmax2), dtype=np.uint32)
    for r, i in enumerate(idx):
        A1[r, : L1[r]] = np.frombuffer(s1s[i].encode("utf-32-le"), dtype=np.uint32)
        A2[r, : L2[r]] = np.frombuffer(s2s[i].encode("utf-32-le"), dtype=np.uint32)
    if A1.max(initial=0) < 255 and A2.max(initial=0) < 255:
        A1 = A1.astype(np.uint8)
        A2 = A2.astype(np.uint8)
        sent = np.uint8(255)
    else:
        sent = np.uint32(0xFFFFFFFF)
    w = np.maximum(np.maximum(L1, L2) // 2 - 1, 0)
    col2 = np.arange(Lmax2)
    W2 = A2.copy()
    W2[col2 >= L2[:, None]] = sent  # beyond-length positions never match
    flags1 = np.zeros((n, Lmax1), dtype=bool)
    wmax = int(w.max())
    rows = np.arange(n)
    # equal-window batches (equal-ish string lengths — the near-dup norm)
    # skip the per-row window mask: the column slice IS the window
    uniform = bool((w == wmax).all())
    lmin1 = int(L1.min())
    for i in range(Lmax1):
        lo = max(0, i - wmax)
        hi = min(Lmax2, i + wmax + 1)
        if hi <= lo:
            continue
        seg = slice(lo, hi)
        eligible = W2[:, seg] == A1[:, i][:, None]
        if not uniform:
            cols = col2[seg]
            eligible &= (cols >= (i - w)[:, None]) & (cols < (i + w + 1)[:, None])
        if i >= lmin1:
            eligible &= (i < L1)[:, None]
        found = eligible.any(axis=1)
        if not found.any():
            continue
        j = eligible.argmax(axis=1) + lo
        fr = rows[found]
        W2[fr, j[found]] = sent
        flags1[fr, i] = True
    flags2 = W2 != A2
    flags2[col2 >= L2[:, None]] = False
    matches = flags1.sum(axis=1)
    has = matches > 0
    jaro = np.zeros(n, dtype=np.float64)
    if has.any():
        # matched chars in positional order, scattered by per-row rank
        mmax = int(matches.max())
        M1 = np.zeros((n, mmax), dtype=A1.dtype)
        M2 = np.zeros((n, mmax), dtype=A2.dtype)
        r1 = np.cumsum(flags1, axis=1) - 1
        r2 = np.cumsum(flags2, axis=1) - 1
        rr, cc = np.nonzero(flags1)
        M1[rr, r1[rr, cc]] = A1[rr, cc]
        rr, cc = np.nonzero(flags2)
        M2[rr, r2[rr, cc]] = A2[rr, cc]
        both = np.arange(mmax) < matches[:, None]
        trans = ((M1 != M2) & both).sum(axis=1) // 2
        m = matches.astype(np.float64)
        jaro = np.where(
            has,
            (m / L1 + m / L2 + (m - trans) / np.where(m > 0, m, 1)) / 3.0,
            0.0,
        )
    pmax = min(4, Lmax1, Lmax2)
    if pmax > 0:
        peq = (A1[:, :pmax] == A2[:, :pmax]) & (
            np.arange(pmax) < np.minimum(L1, L2)[:, None]
        )
        prefix = np.where(
            peq.all(axis=1), peq.sum(axis=1), peq.argmin(axis=1)
        ).astype(np.float64)
    else:
        prefix = np.zeros(n)
    out[idx] = np.where(has, jaro + prefix * prefix_weight * (1.0 - jaro), 0.0)
    return out


def make_jw_udf(prefix_chars: int = 512):
    """pandas UDF (string, string) → double, comparing only the first
    ``prefix_chars`` characters (bounds the O(len²) inner loop). Each
    Arrow batch runs through :func:`jaro_winkler_batch`."""

    @F.pandas_udf(T.DoubleType())
    def jw_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for s1, s2 in it:
            t1 = s1.fillna("").str.slice(0, prefix_chars)
            t2 = s2.fillna("").str.slice(0, prefix_chars)
            yield pd.Series(
                jaro_winkler_batch(t1.tolist(), t2.tolist()), dtype="float64"
            )

    return jw_udf
