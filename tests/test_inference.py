"""Model-inference plug points (SpacyArticleVisitor / BertVectoriser analogs).

The real-model tests skip when spaCy / sentence-transformers are absent (as
in this sandbox); the dependency-error contract and the empty-input rule are
always tested so the plug points can't silently rot.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_ner_raises_clear_importerror_without_spacy():
    from entity_resolution_spark.functions import inference

    try:
        import spacy  # noqa: F401

        pytest.skip("spaCy installed — covered by the real-model test")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="SpacyArticleVisitor plug point"):
        inference.ner_entities_batch(pd.Series(["hello world"]))


def test_embeddings_raise_clear_importerror_without_st():
    from entity_resolution_spark.functions import inference

    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed — covered below")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="BertVectoriser plug point"):
        inference.sentence_embeddings_batch(pd.Series([["a sentence"]]))


def test_ner_real_model(spark):
    pytest.importorskip("spacy")
    from entity_resolution_spark.functions.inference import ner_entities

    try:
        import spacy

        spacy.load("en_core_web_sm")
    except Exception:
        pytest.skip("en_core_web_sm model not downloaded")
    df = spark.createDataFrame(
        [("d1", "Barack Obama visited Paris in 2015.")], "id string, text string"
    )
    row = df.select(ner_entities("text").alias("o")).collect()[0]["o"]
    labels = {e["label"] for e in row["entities"]}
    assert "PERSON" in labels or "GPE" in labels
    assert len(row["sentences"]) >= 1


def test_sentence_embeddings_real_model(spark):
    pytest.importorskip("sentence_transformers")
    from entity_resolution_spark.functions.inference import sentence_embeddings

    df = spark.createDataFrame(
        [("d1", ["a cat sat", "on a mat"]), ("d2", [])],
        "id string, sents array<string>",
    )
    rows = {
        r["id"]: r["e"]
        for r in df.select("id", sentence_embeddings("sents").alias("e")).collect()
    }
    assert rows["d1"] is not None and len(rows["d1"]) > 0
    assert rows["d2"] is None  # empty sentence list -> NULL, documented rule


def test_embeddings_empty_batch_rule():
    """The offsets/mean logic is model-independent for the all-empty batch:
    no model call happens, every row is None — testable without the libs."""
    from entity_resolution_spark.functions import inference

    class _FakeModel:
        def encode(self, flat):  # pragma: no cover - must not be called
            raise AssertionError("encode called for an all-empty batch")

    inference._MODEL_CACHE[("st", "fake")] = _FakeModel()
    try:
        out = inference.sentence_embeddings_batch(
            pd.Series([None, []]), model_name="fake"
        )
        assert list(out) == [None, None]
    finally:
        inference._MODEL_CACHE.pop(("st", "fake"), None)


def test_embeddings_mean_with_fake_model():
    """Mean-of-sentence-embeddings semantics (reference vectorisation.py:
    208-244) verified with a deterministic fake encoder."""
    import numpy as np

    from entity_resolution_spark.functions import inference

    class _FakeModel:
        def encode(self, flat):
            # embedding = [len(sentence), 1.0]
            return np.array([[float(len(s)), 1.0] for s in flat])

    inference._MODEL_CACHE[("st", "fake2")] = _FakeModel()
    try:
        out = inference.sentence_embeddings_batch(
            pd.Series([["ab", "abcd"], ["x"]]), model_name="fake2"
        )
        assert out[0] == [3.0, 1.0]  # mean(2, 4)
        assert out[1] == [1.0, 1.0]
    finally:
        inference._MODEL_CACHE.pop(("st", "fake2"), None)


def test_profession_raises_clear_importerror_without_spacy():
    from entity_resolution_spark.functions import inference

    try:
        import spacy  # noqa: F401

        pytest.skip("spaCy installed — covered by the real-model test")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="SpacyArticleVisitor plug point"):
        inference.profession_mentions_batch(
            pd.Series(["John Smith, a famous lawyer, said..."]),
            pd.Series(["John Smith"]),
            ("lawyer",),
        )


def test_profession_real_model(spark):
    pytest.importorskip("spacy")
    from entity_resolution_spark.functions.inference import profession_mentions

    try:
        import spacy

        spacy.load("en_core_web_sm")
    except Exception:
        pytest.skip("en_core_web_sm model not downloaded")
    df = spark.createDataFrame(
        [("d1", "John Smith, a corrupt lawyer, was arrested.", "John Smith")],
        "id string, text string, name string",
    )
    row = df.select(
        profession_mentions("text", "name", ("lawyer", "doctor")).alias("p")
    ).collect()[0]["p"]
    assert any("lawyer" in c.lower() for c in row)
