"""Topic visitors — MLlib LDA train/apply + concat (reference
features/topic_model/topic_model.py, topic_tfidf_concat.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.topics import (
    concat_distribution,
    fit_topic_model,
    topic_features,
)


@pytest.fixture(scope="module")
def fitted(spark):
    rows = []
    for i in range(12):
        rows.append((f"db{i}", "select insert table index query join".split()))
    for i in range(12):
        rows.append((f"ml{i}", "model train loss gradient epoch tensor".split()))
    docs = spark.createDataFrame(rows, ["unique_id", "toks"]).repartition(2, "unique_id")
    # FIT on one partition: online LDA is not partition-order invariant
    # (operator docstring — the reference's gensim fit is single-process too),
    # and a 24-doc fit across executor threads flakes on scheduling order.
    # Inference (topic_features) stays distributed over the 2-partition frame.
    cv_model, lda_model = fit_topic_model(docs.coalesce(1), "toks", k=2, min_df=2, seed=20)
    return docs, cv_model, lda_model


def test_topic_distribution_is_dense_probability(fitted):
    docs, cv_model, lda_model = fitted
    out = topic_features(docs, cv_model, lda_model, "toks").collect()
    assert len(out) == 24
    for r in out:
        dist = r["topic_distribution"]
        assert len(dist) == 2
        assert abs(sum(dist) - 1.0) < 1e-6
        # topic_ids = topics above gensim's minimum_probability (0.01)
        assert set(r["topic_ids"]) == {i for i, p in enumerate(dist) if p > 0.01}


def test_topics_separate_the_two_corpora(fitted):
    docs, cv_model, lda_model = fitted
    out = {r["unique_id"]: r["topic_distribution"]
           for r in topic_features(docs, cv_model, lda_model, "toks").collect()}
    # all db docs share a dominant topic, all ml docs share the other
    db_top = {max(range(2), key=lambda i: out[f"db{i_}"][i]) for i_ in range(12)}
    ml_top = {max(range(2), key=lambda i: out[f"ml{i_}"][i]) for i_ in range(12)}
    assert len(db_top) == 1 and len(ml_top) == 1
    assert db_top != ml_top


def test_inference_deterministic(fitted):
    docs, cv_model, lda_model = fitted
    a = sorted(map(tuple, topic_features(docs, cv_model, lda_model, "toks")
                   .select("unique_id", "topic_ids").collect()))
    b = sorted(map(tuple, topic_features(docs, cv_model, lda_model, "toks")
                   .select("unique_id", "topic_ids").collect()))
    assert a == b


def test_concat_distribution(spark):
    df = spark.createDataFrame([([0.5, 0.5], [0.9, 0.1])], ["tfidf", "dist"])
    row = df.select(concat_distribution("tfidf", "dist").alias("v")).first()
    assert row["v"] == [0.5, 0.5, 0.9, 0.1]
