"""Batched string-similarity UDFs (the Arrow slow-path, used only on short strings).

Levenshtein is a Spark built-in (`F.levenshtein`) and stays JVM-side; Jaro-Winkler has
no built-in, so it is a pandas UDF over Arrow batches — called only on path *stems*
(short strings), never on content. Mirrors the reference's pairwise string features
fed to its classifier (``am_combiner/combiners/ml.py:274-345``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(i + match_window + 1, len2)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler_py(s1: str, s2: str, scaling: float = 0.1) -> float:
    """Jaro-Winkler similarity (standard prefix boost up to 4 chars)."""
    j = _jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * scaling * (1 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    return pd.Series([jaro_winkler_py(x, y) for x, y in zip(av, bv)])


def levenshtein_sim(a: Column, b: Column) -> Column:
    """Normalized Levenshtein similarity 1 - dist/max_len — pure JVM expression."""
    max_len = F.greatest(F.length(a), F.length(b))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b).cast("double") / max_len
    )
