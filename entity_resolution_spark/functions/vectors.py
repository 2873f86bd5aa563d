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
from pyspark.sql import types as T
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

    - **vocab ≤ broadcast_vocab_rows**: per-doc assembly is ONE Arrow kernel
      over the docs frame with the (term → idf) vocabulary broadcast as two
      numpy arrays — no explode, no join, no ``collect_list``. The JVM shape it
      replaces spent 540 executor-CPU-s (38% of the job) in ObjectHashAggregate
      partial/final building 137.9M per-row struct objects on the 703k-file
      corpus, and its GC (10s@4cores → 165s@16cores) was the dominant
      anti-scaling term — object-heavy JVM aggregation contends in a shared
      heap, while Arrow workers are separate processes that scale with cores.
    - **beyond** (the 703k-file corpus measures 27.6M surviving terms — too
      big for a driver collect; a file-distributed vocab was tried and
      measured 3× WORSE, per-worker loads dominating): stream path — ONE
      term-partitioned window ``count(*)`` fuses the df census, the
      min_df/max_df filter and the idf weighting into a single exchange +
      in-partition sort (the earlier shape here — a census exchange + a
      SHUFFLE_HASH idf join — paid three term-volume exchanges and per-task
      27.6M-entry JVM hash builds) → one repartition by doc + in-partition
      radix sort → an Arrow run-assembler, streaming. No ``collect_list``
      anywhere: the previous ObjectHashAggregate final cost 167 CPU-s and
      its docs×partitions partial inflation + boxed-struct GC were the
      anti-scaling terms. A cheap HLL distinct probe decides whether the
      exact census for the broadcast gate is worth running at all (within
      4× of the gate) or the corpus is clearly stream-sized.
    """
    # contract: id_col is unique per row (the pipeline's unique_id), so a plain
    # count avoids a full distinct shuffle before the plan even builds. The
    # total term-occurrence count rides the SAME aggregate: it upper-bounds the
    # surviving vocabulary, so most corpora resolve the broadcast-kernel gate
    # here without the separate full-volume HLL pass (one barrier, not two).
    _stats = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.coalesce(F.size(F.col(term_col)), F.lit(0))).alias("_occ"),
    ).first()
    n_docs = _stats["_n"]
    n_occurrences = int(_stats["_occ"] or 0)
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
    vocab_filtered = min_df > 1 or max_df_frac < 1.0
    if vocab_filtered:
        # Gate for the broadcast-kernel fast path, cheapest-evidence-first:
        # 1. total occurrences (free — it rode the n_docs aggregate) bound the
        #    raw-distinct vocabulary from above: ≤ 4× the gate means the exact
        #    census is affordable outright; > 16× (the 703k-file bench measures
        #    137.9M occurrences vs a 4M gate) means no plausible survival rate
        #    reaches the gate — stream directly, zero probe passes.
        # 2. only the band between runs the HLL raw-distinct probe (one
        #    map-side-combine pass, constant-size shuffle) before committing
        #    to the exact census — raw distinct bounds survival tighter than
        #    occurrences on repeat-heavy corpora.
        if n_occurrences <= 4 * broadcast_vocab_rows:
            approx_vocab = 0  # census affordable regardless of distribution
        elif n_occurrences > 16 * broadcast_vocab_rows:
            approx_vocab = n_occurrences  # clearly stream-sized
        else:
            approx_vocab = tf.agg(
                F.approx_count_distinct("_t", rsd=0.05).alias("_v")
            ).first()["_v"]
        if approx_vocab <= 4 * broadcast_vocab_rows:
            df_ = tf.groupBy("_t").agg(F.count("*").alias("_df"))
            if max_df_frac < 1.0:
                df_ = df_.where(F.col("_df") <= int(max_df_frac * n_docs))
            if min_df > 1:
                df_ = df_.where(F.col("_df") >= min_df)
            idf = df_.select(
                "_t",
                (
                    F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1)) + 1.0
                ).alias("_idf"),
            ).persist()
            small = idf.count() <= broadcast_vocab_rows
            if small:
                out = _assemble_vectors_arrow(
                    docs, id_col, term_col, idf, top_k, terms_distinct
                )
            idf.unpersist()
            if small:
                return out
    # Big-vocab stream path: ONE term-partitioned window count fuses the df
    # census, the min_df/max_df filter, the idf weighting and the int32
    # re-hash into a single exchange + in-partition Tungsten sort — replacing
    # the previous THREE term-volume exchanges (df census with its
    # ~distinct-per-map-task partial-agg emit, the exploded probe of a
    # SHUFFLE_HASH idf join, and the idf build side) and the per-task
    # 27.6M-entry JVM idf hash builds. All JVM: an Arrow-kernel variant of the
    # same fusion was measured 22s SLOWER at 16 cores — 137.9M rows crossing
    # the Python boundary twice costs more than the hash builds it saves
    # (unlike the per-doc assembly below, whose input is already Python-bound).
    #
    # The per-doc array assembly then streams through one repartition + in-
    # partition radix sort into an Arrow run-assembler, instead of a
    # collect_list ObjectHashAggregate (boxed struct buffers, 167 CPU-s
    # final pass, docs×partitions partial inflation, shared-heap GC that
    # anti-scales with cores). Tungsten binary sort + numpy assembly scale
    # with cores; output is bit-identical to the broadcast kernel (same
    # xxhash64-derived _th, same tie/dedup rules — parity-tested).
    #
    # term ids re-hashed to int32: the pair join ships terms/weights through
    # the shuffle AND the Arrow boundary twice per pair — 4-byte terms halve
    # the dominant payload. Within-pair false-match P ≈ k²/2^32 ≈ 4e-6 at
    # k=128; corpus-wide collisions only nudge df counts. Deterministic.
    from pyspark.sql import Window

    counted = tf.withColumn(
        "_df", F.count("*").over(Window.partitionBy("_t"))
    )
    # ship df (low-cardinality int, int32 when n_docs allows) through the doc
    # exchange instead of the derived double weight — ~20% narrower rows that
    # compress far better; the idf log/multiply is re-applied after the
    # exchange, bit-identically (same JVM expression, same integer df)
    df_narrow = "int" if n_docs < (1 << 31) else "bigint"
    pre = counted.where(
        (F.col("_df") >= min_df) & (F.col("_df") <= int(max_df_frac * n_docs))
    ).select(
        "_id",
        F.xxhash64("_t").bitwiseAND(F.lit((1 << 31) - 1)).cast("int").alias("_th"),
        *([] if terms_distinct else [F.col("_tf")]),
        F.col("_df").cast(df_narrow).alias("_df"),
    )
    idf_expr = F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1)) + 1.0
    w_expr = idf_expr if terms_distinct else F.col("_tf") * idf_expr
    weighted = pre.repartition("_id").select("_id", "_th", w_expr.alias("_w"))
    # In-partition Tungsten sort feeding a STREAMING Arrow run-assembler.
    # (The sort-free variant — whole-partition numpy accumulate + np.unique
    # grouping — was measured: it cuts JVM CPU 460→330s on this stage but the
    # JVM tasks then idle on the 16 Python workers and stage wall grows
    # 30.1→35.6s; the sorted stream also keeps worker memory O(batch), which
    # the accumulate variant loses.)
    stream = weighted.sortWithinPartitions("_id")
    id_field = docs.select(id_col).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("terms", T.ArrayType(T.IntegerType())),
            T.StructField("weights", T.ArrayType(T.FloatType())),
        ]
    )
    k_cap = top_k

    def _flush(ids, th, w):
        # ids arrive SORTED (in-partition radix sort): group codes are one
        # run-length pass — no lexsort over (possibly string-typed) raw ids
        new = np.concatenate(([True], ids[1:] != ids[:-1]))
        codes = np.cumsum(new) - 1
        firsts = ids[np.nonzero(new)[0]]
        gids, terms, weights = _assemble_group_arrays(
            codes.astype(np.int64), th, w, k_cap
        )
        return pd.DataFrame(
            {id_col: firsts[gids], "terms": terms, "weights": weights}
        )

    def run_assembler(batches):
        """Rows sorted by _id within the partition; a doc's run may span
        batches — carry the tail run forward and flush it with the next batch."""
        pend = None
        for pdf in batches:
            ids = pdf["_id"].to_numpy()
            th = pdf["_th"].to_numpy().astype(np.int64)
            w = pdf["_w"].to_numpy()
            if pend is not None:
                ids = np.concatenate([pend[0], ids])
                th = np.concatenate([pend[1], th])
                w = np.concatenate([pend[2], w])
                pend = None
            if len(ids) == 0:
                continue
            # hold back the (possibly incomplete) run of the last id
            cut = np.searchsorted(ids, ids[-1], side="left")
            if cut == 0:
                pend = (ids, th, w)
                continue
            pend = (ids[cut:], th[cut:], w[cut:])
            yield _flush(ids[:cut], th[:cut], w[:cut])
        if pend is not None and len(pend[0]):
            yield _flush(*pend)

    return stream.mapInPandas(run_assembler, out_schema)


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


def _assemble_group_arrays(gids: np.ndarray, th: np.ndarray, w: np.ndarray, k_cap):
    """The shared per-group assembly core (both physical strategies call it):
    (ascending-grouped int64 group keys, int64 term hashes, float64 weights) →
    (group keys, list of int32 term arrays, list of float32 weight arrays).

    Semantics are the engine's canonical ones: top-k by (weight desc, hash
    desc); L2 norm over the top-k INCLUDING any hash-collided duplicate;
    output sorted by (hash asc); equal-hash runs keep the max-weight element.
    """
    o = np.lexsort((-th, -w, gids))
    g, w, th = gids[o], w[o], th[o]
    new = np.concatenate(([True], g[1:] != g[:-1]))
    seg_starts = np.nonzero(new)[0]
    rank = np.arange(len(g)) - seg_starts[np.cumsum(new) - 1]
    if k_cap is not None:
        keep = rank < k_cap
        g, w, th = g[keep], w[keep], th[keep]
        seg_starts = np.nonzero(np.concatenate(([True], g[1:] != g[:-1])))[0]
    if len(g) == 0:
        return g, [], []
    norm = np.sqrt(np.add.reduceat(w * w, seg_starts))

    o2 = np.lexsort((w, th, g))
    g, w, th = g[o2], w[o2], th[o2]
    last_of_run = np.concatenate(((th[1:] != th[:-1]) | (g[1:] != g[:-1]), [True]))
    g, w, th = g[last_of_run], w[last_of_run], th[last_of_run]
    new = np.concatenate(([True], g[1:] != g[:-1]))
    seg_starts = np.nonzero(new)[0]
    wn = (w / norm[np.cumsum(new) - 1]).astype(np.float32)
    bounds = seg_starts[1:]
    return (
        g[seg_starts],
        [a.astype(np.int32) for a in np.split(th, bounds)],
        list(np.split(wn, bounds)),
    )


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

            out_rows, terms, weights = _assemble_group_arrays(rows, th, w, k_cap)
            if len(out_rows) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[out_rows],
                    "terms": terms,
                    "weights": weights,
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
