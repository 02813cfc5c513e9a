"""Scalar gap functions as vectorized pandas UDFs.

Implement the reference's string-similarity and math functions that Spark
lacks (reference registry src/core_functions/function_list.cpp: jaccard,
hamming, damerau_levenshtein, jaro_winkler_similarity, gamma, lgamma,
gcd, lcm).  Semantics verified cell-by-cell against DuckDB 1.0 in
tests/test_functions.py.

Arrow-batched (pandas_udf), so the per-row Python cost is amortized per
batch — these are still the slow path; keep them off the 100 TB hot path
and prefer the built-in `levenshtein`, `soundex`, etc. where possible.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _jaccard(s1: str, s2: str) -> float:
    """Character-set Jaccard similarity (DuckDB semantics: jaccard('duck',
    'luck') = 0.6)."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def _hamming(s1: str, s2: str) -> int:
    """Positional mismatch count; same-length inputs required (DuckDB
    errors on length mismatch — we return -1 as the vectorized-safe
    sentinel)."""
    if len(s1) != len(s2):
        return -1
    return sum(c1 != c2 for c1, c2 in zip(s1, s2))


def _damerau_levenshtein(s1: str, s2: str) -> int:
    """Unrestricted Damerau-Levenshtein edit distance (insert/delete/
    substitute/transpose)."""
    # Classic DP over (len1+2) x (len2+2) with last-occurrence tracking.
    da: dict[str, int] = {}
    maxdist = len(s1) + len(s2)
    d = [[0] * (len(s2) + 2) for _ in range(len(s1) + 2)]
    d[0][0] = maxdist
    for i in range(len(s1) + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(len(s2) + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, len(s1) + 1):
        db = 0
        for j in range(1, len(s2) + 1):
            k = da.get(s2[j - 1], 0)
            length = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][length] + (i - k - 1) + 1 + (j - length - 1),  # transposition
            )
        da[s1[i - 1]] = i
    return d[len(s1) + 1][len(s2) + 1]


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1_flags = [False] * l1
    m2_flags = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2_flags[j] and s2[j] == c:
                m1_flags[i] = m2_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1_flags[i]:
            while not m2_flags[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def _jaro_winkler(s1: str, s2: str, p: float = 0.1, threshold: float = 0.7) -> float:
    j = _jaro(s1, s2)
    if j <= threshold:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


def _pair_str_udf(fn, ret):
    @F.pandas_udf(ret)
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else fn(x, y)
                for x, y in zip(a, b)
            ]
        )

    return udf


jaccard = _pair_str_udf(_jaccard, T.DoubleType())
hamming = _pair_str_udf(_hamming, T.LongType())
damerau_levenshtein = _pair_str_udf(_damerau_levenshtein, T.LongType())
jaro_winkler = _pair_str_udf(_jaro_winkler, T.DoubleType())


@F.pandas_udf(T.DoubleType())
def gamma_udf(x: pd.Series) -> pd.Series:
    return x.map(lambda v: None if v is None else math.gamma(v))


@F.pandas_udf(T.DoubleType())
def lgamma_udf(x: pd.Series) -> pd.Series:
    return x.map(lambda v: None if v is None else math.lgamma(v))


@F.pandas_udf(T.LongType())
def gcd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if (x is None or y is None) else math.gcd(int(x), int(y))
            for x, y in zip(a, b)
        ],
        dtype="Int64",
    )


@F.pandas_udf(T.LongType())
def lcm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if (x is None or y is None) else math.lcm(int(x), int(y))
            for x, y in zip(a, b)
        ],
        dtype="Int64",
    )
