"""Sparse-vector TF-IDF + cosine over hashed terms.

The reference stacks per-record scipy csr rows and calls sklearn
``cosine_similarity`` block-locally (``am_combiner/combiners/tfidf.py:199-217``);
here the TF-IDF weighting is a pure DataFrame computation (explode → tf, df, idf —
all JVM aggregations) and the per-pair cosine is a batched Arrow UDF doing a
C-level ``np.intersect1d`` merge of the two sorted term arrays (no per-row Python
interpretation of vector elements).

Vectors are stored as two parallel sorted arrays per record:
``terms array<long>`` (xxhash64 of the term) and ``weights array<double>``
(L2-normalized tf-idf) — compact over Arrow, schema-stable, Iceberg-friendly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "unique_id",
    term_col: str = "shingles",
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """(id, array<string> terms) → (id, terms array<long>, weights array<double>).

    idf = ln((N+1)/(df+1)) + 1 (sklearn ``smooth_idf`` convention, matching the
    reference's TfidfVectorizer defaults at ``am_combiner/dataloop.py:33-36``);
    weights L2-normalized so pair cosine == dot product.
    ``min_df``/``max_df_frac`` prune ubiquitous/rare terms (the reference's
    ``min_df=5, max_df=0.95``) — this is also the posting-list-cap defense against
    skewed shingles (license headers).
    """
    n_docs = docs.select(id_col).distinct().count()
    tf = (
        docs.select(F.col(id_col).alias("_id"), F.explode(F.col(term_col)).alias("_t"))
        .groupBy("_id", "_t")
        .agg(F.count("*").alias("_tf"))
    )
    df_ = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    if max_df_frac < 1.0:
        df_ = df_.where(F.col("_df") <= int(max_df_frac * n_docs))
    if min_df > 1:
        df_ = df_.where(F.col("_df") >= min_df)
    idf = df_.select(
        "_t",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1)) + 1.0).alias("_idf"),
    )
    weighted = tf.join(idf, "_t").select(
        "_id", F.xxhash64("_t").alias("_th"), (F.col("_tf") * F.col("_idf")).alias("_w")
    )
    vec = (
        weighted.groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("_th", "_w"))).alias("_tw"),
            F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_tw._th").alias("terms"),
            F.transform("_tw", lambda s: s["_w"] / F.col("_norm")).alias("weights"),
        )
    )
    return vec


@F.pandas_udf(DoubleType())
def cosine_sorted_udf(
    ta: pd.Series, wa: pd.Series, tb: pd.Series, wb: pd.Series
) -> pd.Series:
    """Cosine of two L2-normalized sparse vectors given as sorted term/weight arrays.

    Arrow hands each array column as a Series of numpy arrays; the merge per pair is
    a single C-level ``np.intersect1d`` — batched, no Python-level element loops.
    """
    out = np.zeros(len(ta), dtype=np.float64)
    for i in range(len(ta)):
        a_t, b_t = ta.iloc[i], tb.iloc[i]
        if a_t is None or b_t is None or len(a_t) == 0 or len(b_t) == 0:
            continue
        a_t = np.asarray(a_t, dtype=np.int64)
        b_t = np.asarray(b_t, dtype=np.int64)
        _, ia, ib = np.intersect1d(a_t, b_t, assume_unique=True, return_indices=True)
        if len(ia):
            a_w = np.asarray(wa.iloc[i], dtype=np.float64)
            b_w = np.asarray(wb.iloc[i], dtype=np.float64)
            out[i] = float(np.dot(a_w[ia], b_w[ib]))
    return pd.Series(out)


def array_jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over two distinct-element array columns — pure JVM expression."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def cosine_array_cols(a: Column, b: Column) -> Column:
    """Dense-vector cosine via higher-order functions (JVM): for array<float/double>.

    Used by the embedding similarity operators; zip_with for the dot product,
    aggregate for the norms.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
