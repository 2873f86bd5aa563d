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
    skipped.

    Physical strategy (both produce identical output — same weights, same
    xxhash64-derived int32 term ids, same tie rules):

    - **vocab fits** (post-``min_df`` filter survives ≤ ``broadcast_vocab_rows``
      terms — on a code corpus ~99% of shingles are hapax, so ``min_df=2``
      keeps ~1%): the df aggregation still runs as one JVM shuffle, but the
      per-doc assembly is ONE Arrow kernel over the docs frame with the
      (term → idf) vocabulary broadcast as two numpy arrays — no explode, no
      join, no ``collect_list``. The previous JVM shape spent 540 executor-CPU-s
      (38% of the job) in ObjectHashAggregate partial/final building 137.9M
      per-row struct objects on the 703k-file corpus, and its GC (10s@4cores →
      165s@16cores) was the dominant anti-scaling term — object-heavy JVM
      aggregation contends in a shared heap, while Arrow workers are separate
      processes that scale with cores.
    - **vocab too large** (100 TB-scale vocabularies): shuffle path — explode →
      idf equi-join → top-k truncation via sorted-struct HOFs, everything
      JVM-side and shuffle-bounded.
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
        # size-gate with a real count; the surviving vocab is tiny relative to
        # the term stream, so persist + count is ~free
        idf = idf.persist()
        if persisted is not None:
            persisted.append(idf)
        if idf.count() <= broadcast_vocab_rows:
            out = _assemble_vectors_arrow(
                docs, id_col, term_col, idf, top_k, terms_distinct
            )
            idf.unpersist()
            if persisted is not None:
                persisted.remove(idf)
            return out
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


# xxhash64 of one little-endian long, seed 42 — bit-exact replica of Spark's
# F.xxhash64 on a LongType column (verified element-wise vs the JVM), so the
# Arrow assembly path emits the SAME int32 term ids as the shuffle path.
_XXP1 = np.uint64(11400714785074694791)
_XXP2 = np.uint64(14029467366897019727)
_XXP3 = np.uint64(1609587929392839161)
_XXP4 = np.uint64(9650029242287828579)
_XXP5 = np.uint64(2870177450012600261)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _xxhash64_long(v: np.ndarray, seed: int = 42) -> np.ndarray:
    x = v.astype(np.int64).view(np.uint64)
    h = np.uint64(seed) + _XXP5 + np.uint64(8)
    k = _rotl64(x * _XXP2, 31) * _XXP1
    h = _rotl64(h ^ k, 27) * _XXP1 + _XXP4
    h ^= h >> np.uint64(33)
    h *= _XXP2
    h ^= h >> np.uint64(29)
    h *= _XXP3
    h ^= h >> np.uint64(32)
    return h


def _assemble_vectors_arrow(
    docs: DataFrame,
    id_col: str,
    term_col: str,
    idf: DataFrame,
    top_k: int | None,
    terms_distinct: bool,
) -> DataFrame:
    """Per-doc TF-IDF assembly as one Arrow kernel pass over the docs frame.

    The (term → idf) vocabulary ships as two numpy arrays (sorted terms +
    aligned idf) in a Python broadcast; per batch everything is vectorized:
    flatten → searchsorted lookup → one 3-key lexsort for the (weight desc,
    term-hash desc) per-row top-k → segmented norms via reduceat → one more
    lexsort to the (term-hash asc) output order → consecutive-dup drop. Exactly
    the shuffle path's semantics: ties, the 31-bit xxhash64 re-hash, norms
    computed over the top-k INCLUDING any hash-collided duplicate, dedup keeps
    the max-weight element, docs with zero surviving terms emit no row.
    """
    import pyspark.sql.types as T

    spark = docs.sparkSession
    vocab_pd = idf.toArrow().to_pandas()
    vt = vocab_pd["_t"].to_numpy(dtype=np.int64)
    vi = vocab_pd["_idf"].to_numpy(dtype=np.float64)
    order = np.argsort(vt, kind="mergesort")
    bc = spark.sparkContext.broadcast((vt[order], vi[order]))
    k_cap = top_k

    id_field = docs.select(id_col).schema.fields[0]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("terms", T.ArrayType(T.IntegerType())),
            T.StructField("weights", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches):
        np.seterr(over="ignore")  # uint64 hash arithmetic wraps by design
        vterms, vidf = bc.value
        if len(vterms) == 0:
            return  # nothing survives min_df/max_df → no vectors at all
        for pdf in batches:
            vals = pdf[term_col].to_numpy()
            lens = np.fromiter(
                (0 if v is None else len(v) for v in vals),
                dtype=np.int64, count=len(vals),
            )
            if lens.sum() == 0:
                continue
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in vals if v is not None and len(v)]
            )
            rows = np.repeat(np.arange(len(vals), dtype=np.int64), lens)
            if not terms_distinct:
                # per (row, term) tf via sort + run-length (the shuffle path's
                # groupBy(_id, _t) count)
                o = np.lexsort((flat, rows))
                rows, flat = rows[o], flat[o]
                new = np.empty(len(flat), dtype=bool)
                new[0] = True
                np.not_equal(flat[1:], flat[:-1], out=new[1:])
                new[1:] |= rows[1:] != rows[:-1]
                starts = np.nonzero(new)[0]
                tf = np.diff(np.append(starts, len(flat))).astype(np.float64)
                rows, flat = rows[starts], flat[starts]
            else:
                tf = None
            pos = np.searchsorted(vterms, flat)
            pos[pos >= len(vterms)] = 0
            found = vterms[pos] == flat
            rows, flat, pos = rows[found], flat[found], pos[found]
            w = vidf[pos] if tf is None else vidf[pos] * tf[found]
            th = (_xxhash64_long(flat) & np.uint64(0x7FFFFFFF)).astype(np.int64)

            # top-k: row asc, weight desc, hash desc (ties on weight keep the
            # larger hash — reverse(array_sort(struct(_w,_th))) parity)
            o = np.lexsort((-th, -w, rows))
            rows, w, th = rows[o], w[o], th[o]
            seg_starts = np.nonzero(
                np.concatenate(([True], rows[1:] != rows[:-1]))
            )[0]
            seg_of = np.cumsum(np.concatenate(([True], rows[1:] != rows[:-1]))) - 1
            rank = np.arange(len(rows)) - seg_starts[seg_of]
            if k_cap is not None:
                keep = rank < k_cap
                rows, w, th = rows[keep], w[keep], th[keep]
                seg_starts = np.nonzero(
                    np.concatenate(([True], rows[1:] != rows[:-1]))
                )[0]
            if len(rows) == 0:
                continue
            norm = np.sqrt(np.add.reduceat(w * w, seg_starts))

            # output order: hash asc, weight asc; drop all-but-last of equal-
            # hash runs (the kept one is max-weight; norm already includes the
            # dropped weight — shuffle-path parity)
            o2 = np.lexsort((w, th, rows))
            rows, w, th = rows[o2], w[o2], th[o2]
            last_of_run = np.concatenate(
                ((th[1:] != th[:-1]) | (rows[1:] != rows[:-1]), [True])
            )
            rows, w, th = rows[last_of_run], w[last_of_run], th[last_of_run]
            seg_starts = np.nonzero(
                np.concatenate(([True], rows[1:] != rows[:-1]))
            )[0]
            seg_of = np.cumsum(np.concatenate(([True], rows[1:] != rows[:-1]))) - 1
            wn = (w / norm[seg_of]).astype(np.float32)

            row_ids = np.unique(rows)
            bounds = seg_starts[1:]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[row_ids],
                    "terms": [a.astype(np.int32) for a in np.split(th, bounds)],
                    "weights": list(np.split(wn, bounds)),
                }
            )

    return docs.select(id_col, term_col).mapInPandas(kernel, out_schema)


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
