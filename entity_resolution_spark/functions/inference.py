"""Reference model-inference UDFs for the two visitor plug points that need a
real model at production deploy time (VERDICT r3 ask #9).

The sandbox has no spaCy / sentence-transformers, so the engine ships the
EXACT ``pandas_udf`` pattern a deploy fills in — Arrow-batched, one model
load per Python worker process, never per row — with the reference's
semantics documented against its source:

- :func:`ner_entities` ↔ ``SpacyArticleVisitor``
  (``am_combiner/features/common.py:65-136``): truncate to
  ``MAX_ARTICLE_LEN``, run the pipeline once per document, emit
  (label, stripped text) per entity, optional lowercasing, plus the
  sentence split the BERT vectoriser consumes.
- :func:`sentence_embeddings` ↔ ``BertVectoriser``
  (``am_combiner/features/vectorisation.py:208-244``): encode the sentence
  list with a SentenceTransformer and mean the sentence embeddings into one
  document vector. The reference raises on an empty sentence list; the
  vectorized kernel emits NULL instead (a raise would kill the whole Arrow
  batch — callers filter ``isNotNull`` exactly like they filter the
  reference's error rows).
- :func:`profession_mentions` ↔ ``ProfessionVisitor`` /
  ``ProfessionFeatureExtractor`` (``am_combiner/features/profession.py``):
  sentences containing an entity-name token are scanned for noun chunks
  whose root dependency is ``nsubj`` (chunk must also mention a name token
  and an occupation word) or ``appos`` (occupation word only). Documented
  divergences: the document is parsed ONCE (the reference re-parses each
  kept sentence as its own doc — an accident of its notebook shape that can
  shift dependency labels at sentence boundaries), and matches emit in
  chunk order rather than all-nsubj-then-all-appos per sentence. The
  lexicon-only analog (no parser needed) lives in ``functions/text.py``.

Model-cache discipline: Python workers are forked per executor and REUSED
across batches, so a module-level cache keyed by model name loads each model
once per worker — the same pattern as ``fast_text``'s UDF caches. Broadcast
is wrong for torch models (non-picklable device state); per-worker lazy load
is the standard deploy shape.

Until the libraries are installed these UDFs raise ``ImportError`` with the
exact dependency at first use; tests skip themselves when the import is
absent, so the suite stays green in the sandbox and starts covering the real
path the moment the model libs land.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

MAX_ARTICLE_LEN = 1_000_000  # reference features/common.py MAX_ARTICLE_LEN

_MODEL_CACHE: dict[tuple, object] = {}


def _load_spacy(model_name: str):
    key = ("spacy", model_name)
    nlp = _MODEL_CACHE.get(key)
    if nlp is None:
        try:
            import spacy
        except ImportError as e:  # pragma: no cover - exercised in sandbox
            raise ImportError(
                "ner_entities needs spaCy (pip install spacy && python -m "
                f"spacy download {model_name}) — this is the "
                "SpacyArticleVisitor plug point"
            ) from e
        nlp = spacy.load(model_name)
        _MODEL_CACHE[key] = nlp
    return nlp


def _load_sentence_transformer(model_name: str):
    key = ("st", model_name)
    model = _MODEL_CACHE.get(key)
    if model is None:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - exercised in sandbox
            raise ImportError(
                "sentence_embeddings needs sentence-transformers (pip "
                "install sentence-transformers) — this is the BertVectoriser "
                "plug point"
            ) from e
        model = SentenceTransformer(model_name)
        _MODEL_CACHE[key] = model
    return model


def ner_entities_batch(
    texts: pd.Series,
    model_name: str = "en_core_web_sm",
    lower: bool = False,
) -> pd.DataFrame:
    """One spaCy pass per document → (entities, sentences) per row.

    entities: list of {"label", "text"} dicts (reference: stripped entity
    text, optional lowercase, keyed by spaCy label); sentences: the
    sentence split ``BertVectoriser`` consumes downstream. ``nlp.pipe``
    streams the whole Arrow batch through the model — never one doc per
    Python call.
    """
    nlp = _load_spacy(model_name)
    ents_out: list[list[dict]] = []
    sents_out: list[list[str]] = []
    docs = nlp.pipe(
        (t[:MAX_ARTICLE_LEN] if t else "" for t in texts), batch_size=64
    )
    for doc in docs:
        ents = []
        for e in doc.ents:
            txt = e.text.strip()
            ents.append({"label": e.label_, "text": txt.lower() if lower else txt})
        ents_out.append(ents)
        sents_out.append([s.text for s in doc.sents])
    return pd.DataFrame({"entities": ents_out, "sentences": sents_out})


def sentence_embeddings_batch(
    sentences: pd.Series, model_name: str = "bert-base-nli-max-tokens"
) -> pd.Series:
    """Sentence lists → mean sentence embedding per document (reference:
    ``np.mean(model.encode(sentences), axis=0)``). Empty/NULL lists emit
    None (the reference raises; see module docstring). The whole batch's
    sentences encode in ONE model call with per-row offsets."""
    import numpy as np

    model = _load_sentence_transformer(model_name)
    flat: list[str] = []
    lens: list[int] = []
    for row in sentences:
        row = list(row) if row is not None else []
        flat.extend(row)
        lens.append(len(row))
    if flat:
        emb = np.asarray(model.encode(flat))
    else:
        emb = np.empty((0, 0))
    out = []
    pos = 0
    for n in lens:
        if n == 0:
            out.append(None)
        else:
            out.append([float(x) for x in emb[pos : pos + n].mean(axis=0)])
        pos += n
    return pd.Series(out, dtype=object)


def profession_mentions_batch(
    texts: pd.Series,
    names: pd.Series,
    occupations: tuple[str, ...],
    model_name: str = "en_core_web_sm",
) -> pd.Series:
    """Per-document profession noun chunks (see module docstring for the
    reference mapping and divergences). One ``nlp.pipe`` pass per batch."""
    nlp = _load_spacy(model_name)
    occ = [o.lower() for o in occupations]
    out: list[list[str]] = []
    docs = nlp.pipe(
        (t[:MAX_ARTICLE_LEN] if t else "" for t in texts), batch_size=64
    )
    for doc, name in zip(docs, names):
        words = (name or "").split()
        profs: list[str] = []
        for chunk in doc.noun_chunks:
            if not any(w in chunk.sent.text for w in words):
                continue  # the check_words sentence gate
            ctext = chunk.text
            clower = ctext.lower()
            if (
                chunk.root.dep_ == "nsubj"
                and any(w in ctext for w in words)
                and any(o in clower for o in occ)
            ):
                profs.append(ctext)
            elif chunk.root.dep_ == "appos" and any(o in clower for o in occ):
                profs.append(ctext)
        out.append(profs)
    return pd.Series(out, dtype=object)


_udf_cache: dict[tuple, object] = {}


def ner_entities(text, model_name: str = "en_core_web_sm", lower: bool = False):
    """Struct(entities array<struct<label,text>>, sentences array<string>)
    column — the distributed ``SpacyArticleVisitor``. Built lazily like
    every other model-bearing UDF (pandas_udf needs an active session)."""
    key = ("ner", model_name, lower)
    if key not in _udf_cache:
        def _fn(texts: pd.Series) -> pd.DataFrame:
            return ner_entities_batch(texts, model_name, lower)

        _udf_cache[key] = F.pandas_udf(
            "entities array<struct<label:string,text:string>>, "
            "sentences array<string>"
        )(_fn)
    return _udf_cache[key](text)


def sentence_embeddings(sentences, model_name: str = "bert-base-nli-max-tokens"):
    """array<float> mean-sentence-embedding column — the distributed
    ``BertVectoriser``."""
    key = ("emb", model_name)
    if key not in _udf_cache:
        def _fn(rows: pd.Series) -> pd.Series:
            return sentence_embeddings_batch(rows, model_name)

        _udf_cache[key] = F.pandas_udf("array<float>")(_fn)
    return _udf_cache[key](sentences)


def profession_mentions(
    text,
    entity_name,
    occupations: tuple[str, ...],
    model_name: str = "en_core_web_sm",
):
    """array<string> profession-chunk column — the distributed
    ``ProfessionVisitor`` (occupation lexicon baked into the UDF closure,
    the CSV-load analog)."""
    key = ("prof", model_name, tuple(occupations))
    if key not in _udf_cache:
        def _fn(texts: pd.Series, names: pd.Series) -> pd.Series:
            return profession_mentions_batch(
                texts, names, tuple(occupations), model_name
            )

        _udf_cache[key] = F.pandas_udf("array<string>")(_fn)
    return _udf_cache[key](text, entity_name)
