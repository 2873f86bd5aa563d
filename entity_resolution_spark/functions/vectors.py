"""Sparse-vector TF-IDF + cosine over hashed terms.

The reference stacks per-record scipy csr rows and calls sklearn
``cosine_similarity`` block-locally (``am_combiner/combiners/tfidf.py:199-217``);
here the TF-IDF weighting is a pure DataFrame computation (explode → tf, df, idf —
all JVM aggregations) and the per-pair cosine is a batched Arrow UDF doing a
C-level ``np.intersect1d`` merge of the two sorted term arrays (no per-row Python
interpretation of vector elements).

Vectors are stored as two parallel sorted arrays per record:
``terms array<int>`` (31-bit hash of the term) and ``weights array<float>``
(L2-normalized tf-idf) — compact over Arrow, schema-stable, Iceberg-friendly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def typed_feature_tokens(
    scalar_cols: dict[str, Column | str] | None = None,
    array_cols: dict[str, Column | str] | None = None,
) -> Column:
    """Flatten extracted feature families into typed ``FAMILY-value`` tokens —
    the features-text document of ``get_features_from_article`` (reference
    ``combiners/tfidf.py:98-116``: ``feature_name.name + "-" + str(v)`` per
    value; the reference then ``"_-_"``-joins into one string because sklearn
    wants text — here the token ARRAY is the document and feeds
    :func:`tfidf_vectors` directly, which is what
    ``FullArticleFeaturesTextVectoriser`` computes).

    ``scalar_cols``: family name -> scalar column (one token per record);
    ``array_cols``:  family name -> array column (one token per value).
    Null scalars / null arrays contribute nothing.
    """
    parts = []
    for name, c in (scalar_cols or {}).items():
        c = F.col(c) if isinstance(c, str) else c
        tok = F.concat_ws("-", F.lit(name), c.cast("string"))
        parts.append(
            F.when(c.isNotNull(), F.array(tok)).otherwise(F.array().cast("array<string>"))
        )
    for name, c in (array_cols or {}).items():
        c = F.col(c) if isinstance(c, str) else c
        toks = F.transform(
            F.filter(F.coalesce(c, F.array()), lambda v: v.isNotNull()),
            lambda v: F.concat_ws("-", F.lit(name), v.cast("string")),
        )
        parts.append(toks)
    if not parts:
        return F.array().cast("array<string>")
    return F.concat(*parts)


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "unique_id",
    term_col: str = "shingles",
    min_df: int = 1,
    max_df_frac: float = 1.0,
    top_k: int | None = None,
    persisted: list | None = None,
    terms_distinct: bool = False,
    broadcast_vocab_rows: int = 4_000_000,
) -> DataFrame:
    """(id, array terms) → (id, terms array<int>, weights array<float>).

    idf = ln((N+1)/(df+1)) + 1 (sklearn ``smooth_idf`` convention, matching the
    reference's TfidfVectorizer defaults at ``am_combiner/dataloop.py:33-36``);
    weights L2-normalized so pair cosine == dot product.
    ``min_df``/``max_df_frac`` prune ubiquitous/rare terms (the reference's
    ``min_df=5, max_df=0.95``) — this is also the posting-list-cap defense against
    skewed shingles (license headers).

    ``terms_distinct=True`` declares that each row's term array is already
    duplicate-free (the Arrow tokenizer emits ``np.unique``'d shingles —
    ``fast_text.py:82``), so tf ≡ 1 and the ``groupBy(_id,_t)`` shuffle is
    skipped. This matters beyond the saved shuffle: it keeps the exploded rows
    doc-clustered, and when the post-``min_df`` vocabulary is small enough to
    broadcast (≤ ``broadcast_vocab_rows``), the idf join preserves that
    clustering, so the final ``collect_list`` partial-aggregate emits ~n_docs
    rows at ANY shuffle-partition count. The old shape (sort-merge join by term
    → groupBy id) scattered every doc across term partitions and emitted
    docs×partitions partial rows — measured 20.5M@32parts → 54.4M@128parts on a
    703k-file corpus, the dominant anti-scaling term in the 4→16-core bench.
    On a code corpus ~99% of shingles are hapax, so with ``min_df=2`` the
    surviving vocabulary is ~1% of terms (≈25 MB broadcast at 703k files); if
    it exceeds the cap the join falls back to the shuffle path unchanged.
    """
    # contract: id_col is unique per row (the pipeline's unique_id), so a plain
    # count avoids a full distinct shuffle before the plan even builds
    n_docs = docs.count()
    exploded = docs.select(
        F.col(id_col).alias("_id"), F.explode(F.col(term_col)).alias("_t")
    )
    if terms_distinct:
        # no persist either: explode is a narrow op over the (caller-cached)
        # docs frame — re-deriving it for the df pass is cheaper than caching
        # the full exploded row set (big caches cost GC; see BENCH notes)
        tf = exploded.withColumn("_tf", F.lit(1).cast("bigint"))
    else:
        tf = (
            exploded.groupBy("_id", "_t")
            .agg(F.count("*").alias("_tf"))
            # tf feeds BOTH the df aggregation and the weighting join; persist
            # so the explode+groupBy (the expensive half) runs once, not twice
            .persist()
        )
        if persisted is not None:
            persisted.append(tf)  # caller releases once downstream is materialized
    df_ = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    vocab_filtered = False
    if max_df_frac < 1.0:
        df_ = df_.where(F.col("_df") <= int(max_df_frac * n_docs))
        vocab_filtered = True
    if min_df > 1:
        df_ = df_.where(F.col("_df") >= min_df)
        vocab_filtered = True
    idf = df_.select(
        "_t",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1)) + 1.0).alias("_idf"),
    )
    if vocab_filtered:
        # size-gate the broadcast with a real count (the df agg runs anyway for
        # the join; persisting the small surviving vocab makes the count ~free)
        idf = idf.persist()
        if persisted is not None:
            persisted.append(idf)
        if idf.count() <= broadcast_vocab_rows:
            idf = F.broadcast(idf)
    # term ids re-hashed to int32: the pair join ships terms/weights through
    # the shuffle AND the Arrow boundary twice per pair — 4-byte terms halve
    # the dominant payload. Within-pair false-match P ≈ k²/2^32 ≈ 4e-6 at
    # k=128 (adds ≤ one w_a·w_b product to cosine for ~4-in-a-million pairs);
    # corpus-wide collisions only nudge df counts. Deterministic.
    weighted = tf.join(idf, "_t").select(
        "_id",
        F.xxhash64("_t").bitwiseAND(F.lit((1 << 31) - 1)).cast("int").alias("_th"),
        (F.col("_tf") * F.col("_idf")).alias("_w"),
    )
    # Truncate to the top_k highest-weight terms per doc and renormalize: per-row
    # payload is then bounded (the pair join ships these arrays — measured 12 GB
    # of untruncated arrays dominating the whole scoring stage). Deterministic:
    # ties break on term hash. Each derived array is bound to a column before the
    # next HOF uses it (no re-evaluation inside lambdas).
    agg = weighted.groupBy("_id").agg(
        F.collect_list(F.struct(F.col("_w"), F.col("_th"))).alias("_l")
    )
    by_weight_desc = F.reverse(F.array_sort("_l"))
    if top_k is not None:
        by_weight_desc = F.slice(by_weight_desc, 1, top_k)
    step1 = agg.select("_id", by_weight_desc.alias("_top"))
    step2 = step1.select(
        "_id",
        F.array_sort(
            F.transform("_top", lambda s: F.struct(s["_th"].alias("_th"), s["_w"].alias("_w")))
        ).alias("_tw"),
        F.sqrt(
            F.aggregate("_top", F.lit(0.0), lambda acc, s: acc + s["_w"] * s["_w"])
        ).alias("_norm"),
    )
    # The 31-bit re-hash can (P ≈ k²/2^32 per doc) map two distinct terms to one
    # _th; the scoring UDF's np.intersect1d(assume_unique=True) contract requires
    # duplicate-free term arrays, so drop all-but-the-last of any equal-_th run
    # (_tw is sorted by (_th, _w): the kept element is the max-weight one). The
    # dropped weight still participates in _norm — a ≤1-ulp-scale distortion for
    # ~4-in-a-million docs, vs undefined numpy behavior.
    step2 = step2.select(
        "_id",
        "_norm",
        F.filter(
            F.col("_tw"),
            lambda s, i: (i == F.size("_tw") - 1)
            | (s["_th"] != F.element_at(F.col("_tw"), i + 2)["_th"]),
        ).alias("_tw"),
    )
    return step2.select(
        F.col("_id").alias(id_col),
        F.col("_tw._th").alias("terms"),
        F.transform("_tw", lambda s: (s["_w"] / F.col("_norm")).cast("float")).alias("weights"),
    )


def _explode_batch(ts: pd.Series, ws: pd.Series):
    """Series-of-arrays → flat (row_idx, term, weight) numpy triple for one batch."""
    vals = ts.to_numpy()
    lens = np.fromiter(
        (0 if v is None else len(v) for v in vals), dtype=np.int64, count=len(vals)
    )
    rows = np.repeat(np.arange(len(vals), dtype=np.int64), lens)
    if lens.sum() == 0:
        return rows, np.empty(0, np.int64), np.empty(0, np.float64)
    terms = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in vals if v is not None and len(v)]
    )
    wvals = ws.to_numpy()
    weights = np.concatenate(
        [np.asarray(v, dtype=np.float64) for v in wvals if v is not None and len(v)]
    )
    return rows, terms, weights


def _batch_cosine_jaccard(
    ta: pd.Series, wa: pd.Series, tb: pd.Series, wb: pd.Series
) -> tuple[np.ndarray, np.ndarray]:
    """Batch-vectorized cosine AND jaccard over parallel term/weight arrays.

    Both sides of the whole Arrow batch are flattened to (row, term, weight)
    triples; terms are re-coded to dense ints with one ``np.unique`` over both
    sides, so each (row, term) becomes a single int64 composite key and the
    whole batch intersects with ONE sorted ``np.intersect1d`` (C-level, with
    ``return_indices`` recovering the weights). Per-row dot products and
    shared-term counts come from two ``np.bincount`` calls — no per-row Python.
    (Measured 1.65× faster than the previous pandas hash-merge on 2.6M pairs,
    which itself was ~30× faster than a per-pair intersect loop.)
    jaccard = |∩| / (|A| + |B| - |∩|) over the distinct term sets.
    Deterministic: per-row accumulation follows sorted composite-key order.
    """
    n = len(ta)
    if n == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    ra, terms_a, weights_a = _explode_batch(ta, wa)
    rb, terms_b, weights_b = _explode_batch(tb, wb)
    na = np.bincount(ra, minlength=n).astype(np.float64)
    nb = np.bincount(rb, minlength=n).astype(np.float64)
    if not len(terms_a) or not len(terms_b):
        return np.zeros(n, np.float64), np.zeros(n, np.float64)
    allt = np.concatenate([terms_a, terms_b])
    uniq, codes = np.unique(allt, return_inverse=True)
    ca = codes[: len(terms_a)]
    cb = codes[len(terms_a):]
    m = len(uniq)
    # composite key fits int64: row < 2^20 (Arrow batch), m < 2^40
    ka = ra * m + ca
    kb = rb * m + cb
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    mr = common // m
    prod = weights_a[ia] * weights_b[ib]
    dots = np.bincount(mr, weights=prod, minlength=n)[:n]
    shared = np.bincount(mr, minlength=n)[:n].astype(np.float64)
    union = na[:n] + nb[:n] - shared
    jac = np.divide(shared, union, out=np.zeros(n, np.float64), where=union > 0)
    return dots, jac


@F.pandas_udf(DoubleType())
def cosine_sorted_udf(
    ta: pd.Series, wa: pd.Series, tb: pd.Series, wb: pd.Series
) -> pd.Series:
    """Cosine of two L2-normalized sparse vectors (see _batch_cosine_jaccard)."""
    dots, _ = _batch_cosine_jaccard(ta, wa, tb, wb)
    return pd.Series(dots)


def _cosine_jaccard_fn(
    ta: pd.Series, wa: pd.Series, tb: pd.Series, wb: pd.Series
) -> pd.DataFrame:
    dots, jac = _batch_cosine_jaccard(ta, wa, tb, wb)
    return pd.DataFrame({"cosine": dots, "jaccard": jac})


_cosine_jaccard_udf_cache = None


def cosine_jaccard_udf(*cols):
    """Struct(cosine, jaccard) in one pass — the pair-scoring hot path uses this so
    the raw shingle arrays never enter the pair join (terms == hashed shingles).

    Built lazily: a struct-returning pandas_udf parses its DDL schema against the
    active SparkSession, so the decorator can't run at import time.
    """
    global _cosine_jaccard_udf_cache
    if _cosine_jaccard_udf_cache is None:
        _cosine_jaccard_udf_cache = F.pandas_udf("cosine double, jaccard double")(
            _cosine_jaccard_fn
        )
    return _cosine_jaccard_udf_cache(*cols)


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
