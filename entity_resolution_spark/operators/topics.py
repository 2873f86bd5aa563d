"""Topic-model visitors (reference ``TopicVisitor`` / ``TopicTfidfConcatVisitor``).

Reference: ``am_combiner/features/topic_model/topic_model.py:20-119`` — a
pretrained gensim LDA (20 topics) is applied per article: the output is the
set of topic ids the article touches (gensim reports topics above its
``minimum_probability`` = 0.01) plus the dense topic-probability vector
(missing topics zero-filled — ``missing_topics``). ``topic_tfidf_concat.py:8-62``
then hstacks the TF-IDF vector with the topic distribution.

Spark form: the model is Spark MLlib's ``LDA`` (online variational by default
here, seeded) over ``CountVectorizer`` counts — training is a first-class
in-repo operation (the reference trains offline in
``train_topic_model.py`` and ships artifacts via S3; this environment has no
artifact store, so ``fit_topic_model`` IS the trainer and the fitted models
can be ``save()``d/``load()``ed with MLlib's native persistence). Inference is
``transform`` — executor-side, scales with partitions. Determinism: fixed
``seed`` makes refits reproducible for a fixed input partitioning (document
the caveat: MLlib's online LDA, like gensim's, is not partition-order
invariant; pin ``docs.repartition(n)`` upstream when bit-stable refits are
required — inference on a FITTED model is deterministic row-wise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_topic_model(
    docs: DataFrame,
    tokens_col: str,
    k: int = 20,
    vocab_size: int = 1 << 16,
    min_df: int = 2,
    seed: int = 20,
    max_iter: int = 20,
):
    """Fit CountVectorizer + LDA over a token-array column. Returns
    (cv_model, lda_model) — both MLlib-persistable."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    cv = CountVectorizer(
        inputCol=tokens_col, outputCol="_tf_vec", vocabSize=vocab_size, minDF=float(min_df)
    )
    cv_model = cv.fit(docs)
    counts = cv_model.transform(docs)
    lda = LDA(k=k, seed=seed, maxIter=max_iter, featuresCol="_tf_vec")
    lda_model = lda.fit(counts)
    return cv_model, lda_model


def topic_features(
    docs: DataFrame,
    cv_model,
    lda_model,
    tokens_col: str,
    id_col: str = "unique_id",
    min_probability: float = 0.01,
) -> DataFrame:
    """(id, tokens) → (id, topic_ids array<int>, topic_distribution array<double>).

    ``topic_ids`` = topics with probability > ``min_probability`` (gensim's
    ``minimum_probability`` default, topic_model.py:108-110); the distribution
    is the full dense k-vector (missing topics are literally zero — MLlib's
    ``topicDistribution`` is already dense, which is the reference's
    ``missing_topics`` zero-fill made unnecessary)."""
    from pyspark.ml.functions import vector_to_array

    counts = cv_model.transform(docs.select(id_col, tokens_col))
    out = lda_model.transform(counts)
    dist = vector_to_array(F.col("topicDistribution"))
    withd = out.select(id_col, dist.alias("topic_distribution"))
    return withd.select(
        id_col,
        F.filter(
            F.transform(
                "topic_distribution",
                lambda p, i: F.when(p > min_probability, i).otherwise(F.lit(-1)),
            ),
            lambda i: i >= 0,
        ).cast("array<int>").alias("topic_ids"),
        "topic_distribution",
    )


def concat_distribution(tfidf_col: Column | str, dist_col: Column | str) -> Column:
    """TopicTfidfConcatVisitor (topic_tfidf_concat.py:8-62): hstack the TF-IDF
    weight vector with the topic distribution — one array concat, JVM-side."""
    a = F.col(tfidf_col) if isinstance(tfidf_col, str) else tfidf_col
    b = F.col(dist_col) if isinstance(dist_col, str) else dist_col
    return F.concat(a.cast("array<double>"), b.cast("array<double>"))
