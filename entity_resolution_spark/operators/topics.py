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


# --- topic-model preprocessing (reference ``utils/topic_model_helpers.py``) ----
#
# ``sent_to_words``/``get_article_words`` (helpers:17-47) = gensim
# ``simple_preprocess(deacc=True)`` → ``simple_tokens``; ``remove_stopwords``
# (helpers:66-73) → ``remove_stopword_tokens``; ``get_ngram_model``
# (helpers:50-60, gensim ``Phrases(min_count=5, threshold=100)``) →
# ``fit_bigram_phrases`` (the phrase TABLE is the saved Phraser artifact);
# ``make_bigrams`` (helpers:76-81, greedy Phraser rewrite) →
# ``apply_bigram_phrases``. ``lemmatization`` (helpers:84-90) needs spaCy's
# tagger — absent by design; like the profession visitor's chunker, the
# lemma step is documented out of scope and the chain runs on surface tokens.

# Latin-1/latin-extended accent folding — the ASCII-complete core of gensim's
# ``deaccent`` (NFD + combining-mark strip). Pure ``translate``, codegen'd.
_DEACCENT_FROM = "àáâãäåāăąèéêëēĕėęěìíîïĩīĭįıòóôõöøōŏőùúûüũūŭůűųçćĉċčñńņňÿýśŝşšžźżğĝđðþß"
_DEACCENT_TO = "aaaaaaaaaeeeeeeeeeiiiiiiiiioooooooooouuuuuuuuuucccccnnnnyysssszzzggddtb"


def simple_tokens(col: Column | str) -> Column:
    """gensim ``simple_preprocess(doc, deacc=True)`` as a pure Column chain:
    lowercase → deaccent → alphabetic runs (letters/underscore; digits split,
    matching gensim's ``(?!\\d)\\w`` token pattern) → keep only tokens with
    2 ≤ len ≤ 15 (longer runs are DROPPED, not truncated). ASCII-exact vs
    gensim; non-latin scripts fold through the translate map only.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(F.lower(F.coalesce(c.cast("string"), F.lit(""))), _DEACCENT_FROM, _DEACCENT_TO)
    runs = F.regexp_extract_all(c, F.lit("[a-z_]+"), 0)
    return F.filter(runs, lambda t: (F.length(t) >= 2) & (F.length(t) <= 15))


# The NLTK English stopword list (public, stable since nltk 3.x) plus the
# reference's five extras (helpers:69: "from subject re edu use" — "from" is
# already in the NLTK list; the set below is the union).
NLTK_EN_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom", "this",
    "that", "that'll", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "having", "do", "does",
    "did", "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "further", "then", "once", "here", "there",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not", "only",
    "own", "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll", "m",
    "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn", "couldn't",
    "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn",
    "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn",
    "mightn't", "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't", "won",
    "won't", "wouldn", "wouldn't",
]
TOPIC_EXTRA_STOPWORDS = ["subject", "edu", "use"]


def remove_stopword_tokens(
    toks: Column | str, stop_words: list[str] | None = None
) -> Column:
    """Reference ``remove_stopwords`` (helpers:66-73): drop stopword tokens,
    preserving order and multiplicity (``array_except`` would dedup — wrong).
    One HOF filter against a literal set, JVM-side."""
    t = F.col(toks) if isinstance(toks, str) else toks
    if stop_words is None:
        stop_words = NLTK_EN_STOPWORDS + TOPIC_EXTRA_STOPWORDS
    lit = F.array(*[F.lit(w) for w in stop_words])
    return F.filter(t, lambda w: ~F.array_contains(lit, w))


def fit_bigram_phrases(
    docs: DataFrame,
    tokens_col: str,
    min_count: int = 5,
    threshold: float = 100.0,
) -> DataFrame:
    """gensim ``Phrases(min_count, threshold)`` collocation statistics
    (reference ``get_ngram_model``, helpers:50-60) as one relational plan —
    the returned phrase table IS the saved Phraser artifact.

    gensim's ``original_scorer`` (Mikolov et al. 2013):
    ``score = (cnt_ab − min_count) · vocab_len / (cnt_a · cnt_b)`` with
    ``vocab_len = |distinct unigrams| + |distinct adjacent bigrams|`` (the
    Phrases vocab dict holds both). ``qualifies`` is the integer-exact
    cross-multiplied form ``(cnt_ab − min_count)·vocab_len >
    threshold·cnt_a·cnt_b`` — no float in any output column. Candidates are
    bounded to ``cnt_ab ≥ min_count`` (a lower count cannot exceed a
    positive threshold).

    Shape at scale: one explode+groupBy per census (map-side combined), a
    broadcast of the 1-row vocab length, joins keyed on the word — no
    quadratic step anywhere.
    """
    tk = docs.select(F.col(tokens_col).alias("tk")).where(F.size("tk") > 0)
    uni = tk.select(F.explode("tk").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    pair_arr = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.struct(
                F.get("tk", i - 1).alias("wa"), F.get("tk", i).alias("wb")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<wa:string,wb:string>>"))
    big = (
        tk.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.wa").alias("word_a"), F.col("p.wb").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
    )
    vlen = (
        uni.agg(F.count(F.lit(1)).alias("_nu"))
        .crossJoin(big.agg(F.count(F.lit(1)).alias("_nb")))
        .select((F.col("_nu") + F.col("_nb")).alias("vocab_len"))
    )
    ua = uni.select(F.col("w").alias("word_a"), F.col("c").alias("cnt_a"))
    ub = uni.select(F.col("w").alias("word_b"), F.col("c").alias("cnt_b"))
    return (
        big.where(F.col("cnt_ab") >= min_count)
        .join(ua, "word_a")
        .join(ub, "word_b")
        .crossJoin(F.broadcast(vlen))
        .select(
            "word_a",
            "word_b",
            "cnt_a",
            "cnt_b",
            "cnt_ab",
            "vocab_len",
            (
                (F.col("cnt_ab") - F.lit(min_count)) * F.col("vocab_len")
                > F.lit(threshold) * F.col("cnt_a") * F.col("cnt_b")
            )
            .cast("bigint")
            .alias("qualifies"),
        )
    )


def apply_bigram_phrases(
    toks: Column | str,
    phrasegrams: list[tuple[str, str]],
    delimiter: str = "_",
) -> Column:
    """Greedy left-to-right Phraser rewrite (reference ``make_bigrams``,
    helpers:76-81; gensim ``analyze_sentence``): scan tokens; when the
    (current, next) pair is a phrase, emit ``current_next`` and CONSUME the
    next token (no overlap — ``[a,a,a]`` with phrase (a,a) → ``[a_a, a]``);
    otherwise emit the token alone.

    The sequential skip state rules out a stateless ``transform``; the fold
    is ``F.aggregate`` over positions with a (out, skip) struct — still
    entirely JVM-side. The phrase set is artifact-sized (the fitted table's
    qualifying rows), shipped as one literal array.
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    sep = "\x01"
    keys = sorted({a + sep + b for a, b in phrasegrams})
    karr = (
        F.array(*[F.lit(k) for k in keys])
        if keys
        else F.array().cast("array<string>")
    )
    idx = F.when(F.size(t) >= 1, F.sequence(F.lit(1), F.size(t))).otherwise(
        F.array().cast("array<int>")
    )
    state0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def _step(acc: Column, i: Column) -> Column:
        cur = F.get(t, i - 1)
        nxt = F.get(t, i)  # NULL past the end (ANSI-safe, unlike element_at)
        is_phrase = F.coalesce(
            F.array_contains(karr, F.concat(cur, F.lit(sep), nxt)), F.lit(False)
        )
        joined = F.concat(cur, F.lit(delimiter), nxt)
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_phrase,
                F.struct(
                    F.concat(acc["out"], F.array(joined)).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(idx, state0, _step, lambda acc: acc["out"])
