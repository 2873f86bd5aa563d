"""Term extraction + entity-context text selection visitors.

Reference:
- ``am_combiner/features/terms.py:8-52`` (``ArticleTermVisitor``): pyate
  ``combo_basic`` term scoring over the article text, keep the top-n terms,
  lowercased. combo_basic (Astrakhantsev 2016) scores a multiword candidate t
  as ``|t|·log f(t) + 0.75·e(t) + 0.1·e'(t)`` where f is the candidate's
  frequency, e counts candidate SUPERsets containing t and e' counts candidate
  SUBsets of t. pyate/spaCy are not in this environment; the scorer below is
  that formula verbatim over regex-token n-gram candidates (1..3 tokens) — a
  deterministic per-document kernel, vectorized over Arrow batches (the
  reference also runs per article, terms.py:36-51);
- ``am_combiner/features/text_selector.py:6-81`` (``ArticleSelectedTextVisitor``
  / ``previous_and_next``): for every sentence mentioning the entity name,
  keep the window of ``pre`` sentences before and ``post`` after, deduplicate
  (first occurrence wins), join with spaces.

Spark form: ``selected_text`` is a pure JVM higher-order-function column — no
Python at all; window extraction, flatten and order-preserving dedup all run
inside whole-stage codegen. One divergence: a sentence repeated INSIDE one
window is kept once here (array_distinct), where the reference's seen-set is
only updated between windows — a duplicate sentence inside a single window is
the only case that differs.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def selected_text(
    sentences: Column | str, entity_name: Column | str, pre: int = 1, post: int = 1
) -> Column:
    """Sentences array + entity name → context string (text_selector.py:6-39).

    Sentences containing the name anchor a window [i-pre, i+post]; windows are
    concatenated in order, deduplicated first-occurrence-first, space-joined.
    """
    sents = F.col(sentences) if isinstance(sentences, str) else sentences
    name = F.col(entity_name) if isinstance(entity_name, str) else entity_name
    # bind to locals once: expressions inlined in HOF lambdas re-evaluate per
    # element (the engine's measured 374s→4.8s trap — PLANS.md)
    idx = F.transform(sents, lambda s, i: F.when(s.contains(name), i).otherwise(F.lit(-1)))
    hits = F.filter(idx, lambda i: i >= 0)
    windows = F.flatten(
        F.transform(
            hits,
            lambda i: F.slice(
                sents,
                F.greatest(F.lit(1), i + 1 - pre),
                F.least(F.size(sents), i + 1 + post)
                - F.greatest(F.lit(1), i + 1 - pre)
                + 1,
            ),
        )
    )
    return F.array_join(F.array_distinct(windows), " ")


def combo_basic_terms(
    text: str, n: int = 10, max_len: int = 3, min_len: int = 2
) -> list[str]:
    """Top-n combo_basic-scored token n-grams of one document (terms.py:46-51).

    Deterministic: ties broken by (score desc, term asc). Candidates are
    lowercase token n-grams of min_len..max_len tokens — multiword only by
    default, matching pyate combo_basic's ``have_single_word=False``.
    """
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return []
    cand: Counter[tuple[str, ...]] = Counter()
    for ln in range(min_len, max_len + 1):
        for i in range(len(toks) - ln + 1):
            cand[tuple(toks[i : i + ln])] += 1
    # superset / subset counts among candidate TYPES (combo_basic's e and e')
    sup: Counter[tuple[str, ...]] = Counter()
    sub: Counter[tuple[str, ...]] = Counter()
    by_len: dict[int, set[tuple[str, ...]]] = {}
    for t in cand:
        by_len.setdefault(len(t), set()).add(t)
    for t in cand:
        # distinct subset TYPES of t: e/e' count candidate TERMS, so a subset
        # occurring twice inside t (e.g. "a a" in "a a a") still counts once
        subs = {
            t[i : i + shorter_len]
            for shorter_len in range(min_len, len(t))
            for i in range(len(t) - shorter_len + 1)
        }
        for s in subs:
            if s in cand:
                sup[s] += 1   # t is a superset containing s
                sub[t] += 1   # s is a subset of t
    import math

    scored = [
        (
            len(t) * math.log(f) + 0.75 * sup.get(t, 0) + 0.1 * sub.get(t, 0),
            " ".join(t),
        )
        for t, f in cand.items()
    ]
    scored.sort(key=lambda p: (-p[0], p[1]))
    return [term for _, term in scored[:n]]


def top_terms(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "unique_id",
    n: int = 10,
    max_len: int = 3,
) -> DataFrame:
    """(id, text) → (id, terms array<string>) — the ArticleTermVisitor."""
    out_schema = T.StructType(
        [
            T.StructField("unique_id", T.StringType()),
            T.StructField("terms", T.ArrayType(T.StringType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "unique_id": pdf["_id"],
                    "terms": [combo_basic_terms(t or "", n, max_len) for t in pdf["_txt"]],
                }
            )

    base = docs.select(
        F.col(id_col).cast("string").alias("_id"), F.col(text_col).alias("_txt")
    )
    return base.mapInPandas(kernel, out_schema)
