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


def test_simple_tokens_gensim_semantics(spark):
    from entity_resolution_spark.operators.topics import simple_tokens

    df = spark.createDataFrame(
        [("Hello, Wörld_1 ab c supercalifragilisticexpialidocious x9y",)],
        "t string",
    )
    got = df.select(simple_tokens("t").alias("tk")).collect()[0]["tk"]
    # "wörld_1" deaccents to world_, digit splits the run; 1-char "c"/"x"/"y"
    # dropped; the 34-char token DROPPED (not truncated) — gensim's 2..15 rule
    assert got == ["hello", "world_", "ab"]


def test_remove_stopword_tokens_order_and_multiplicity(spark):
    from entity_resolution_spark.operators.topics import remove_stopword_tokens

    df = spark.createDataFrame(
        [(["the", "quick", "from", "use", "fox", "quick", "shan't"],)],
        "tk array<string>",
    )
    got = df.select(remove_stopword_tokens("tk").alias("o")).collect()[0]["o"]
    # order preserved, duplicate "quick" preserved (array_except would dedup)
    assert got == ["quick", "fox", "quick"]


def test_fit_bigram_phrases_hand_golden(spark):
    from entity_resolution_spark.operators.topics import fit_bigram_phrases

    docs = spark.createDataFrame(
        [
            (["new", "york", "is", "big"],),
            (["new", "york", "city"],),
            (["in", "new", "york", "new", "york"],),
            (["big", "city"],),
            (["new", "york"],),
        ],
        "tk array<string>",
    )
    # unigrams: new 5, york 5, is 1, big 2, city 2, in 1 → 6 distinct
    # adjacent bigrams: (new,york) ×5 plus 6 singletons → 7 distinct
    # vocab_len = 13; score(new,york) = (5-2)·13/(5·5) = 1.56
    rows = fit_bigram_phrases(docs, "tk", min_count=2, threshold=1.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["word_a"], r["word_b"]) == ("new", "york")
    assert (r["cnt_a"], r["cnt_b"], r["cnt_ab"], r["vocab_len"]) == (5, 5, 5, 13)
    assert r["qualifies"] == 1  # 1.56 > 1.5
    rows2 = fit_bigram_phrases(docs, "tk", min_count=2, threshold=2.0).collect()
    assert rows2[0]["qualifies"] == 0  # 1.56 < 2.0


def test_apply_bigram_phrases_greedy(spark):
    from entity_resolution_spark.operators.topics import apply_bigram_phrases

    df = spark.createDataFrame(
        [
            (["in", "new", "york", "new", "york"],),
            (["a", "a", "a"],),
            (["no", "phrases", "here"],),
            ([],),
        ],
        "tk array<string>",
    )
    out = [
        r["o"]
        for r in df.select(
            apply_bigram_phrases("tk", [("new", "york"), ("a", "a")]).alias("o")
        ).collect()
    ]
    assert out[0] == ["in", "new_york", "new_york"]
    # greedy non-overlap: gensim pairs 0-1 then leaves the third alone
    assert out[1] == ["a_a", "a"]
    assert out[2] == ["no", "phrases", "here"]
    assert out[3] == []
