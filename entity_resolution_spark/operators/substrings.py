"""Cross-document repeated-substring detection — the distributed re-expression
of the suffix-array dedup family (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better"): find spans of ≥ ``n`` consecutive tokens
that occur verbatim in MORE THAN ONE document, per document.

Where the paper builds one giant suffix array, the Spark shape is a window
census: every ``n``-token window of every doc, one hash shuffle on the window
to count distinct documents, a join back (reusing the window partitioning),
and a gaps-and-islands pass per document to recover maximal repeated SPANS
from consecutive repeated window starts — a run of ``r`` consecutive repeated
windows is a duplicated span of ``r + n − 1`` tokens. At 100 TB the census
table is the working set (windows ≪ suffixes, and the count aggregate
combines map-side); windows travel as xxhash64 int64 surrogates (counting
over surrogates equals counting over strings up to the engine's accepted
64-bit collision class; the DuckDB oracles compare COUNTS, not keys, so
they stay exact).

Within-doc repetition is deliberately NOT counted (that is
``repetition_stats``); a window qualifies only when ≥ 2 DISTINCT docs carry
it. All outputs are integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolution_spark.operators.decontamination import ngram_windows


def repeated_window_stats(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "unique_id",
    n: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """(id, text) → per-doc cross-document repetition stats.

    Output (all bigint): (id, n_windows, repeated_positions, max_repeated_run)
    — ``n_windows`` = window starts in the doc; ``repeated_positions`` = how
    many of them begin a window found in ≥ ``min_docs`` distinct docs;
    ``max_repeated_run`` = the longest run of CONSECUTIVE repeated starts
    (longest duplicated span = max_repeated_run + n − 1 tokens; 0 if none).
    """
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    # census key = xxhash64 surrogate of each window (position order kept) —
    # the census exchange and the join back ship 8-byte keys instead of the
    # ~90-byte strings (same surrogate discipline and collision class as
    # decontamination.ngram_hash_array; the module docstring's "production
    # hashes them first" note, now the default)
    base = d.select(
        "_id",
        F.transform(
            ngram_windows(F.col("_t"), n), lambda w: F.xxhash64(w)
        ).alias("_ws"),
    )
    ex = base.select(
        "_id", F.posexplode("_ws").alias("_i", "_w")
    ).select("_id", (F.col("_i") + 1).alias("_pos"), "_w")

    census = (
        ex.groupBy("_w")
        .agg(F.count_distinct("_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_w")
    )
    rep = ex.join(census, "_w")  # same _w partitioning as the census shuffle

    # gaps-and-islands: consecutive repeated starts share (_pos − row_number)
    w = Window.partitionBy("_id").orderBy("_pos")
    runs = (
        rep.withColumn("_grp", F.col("_pos") - F.row_number().over(w))
        .groupBy("_id", "_grp")
        .agg(F.count("*").alias("_run"))
        .groupBy("_id")
        .agg(
            F.sum("_run").alias("repeated_positions"),
            F.max("_run").alias("max_repeated_run"),
        )
    )

    zero = F.lit(0).cast("bigint")
    return (
        base.select("_id", F.size("_ws").alias("n_windows"))
        .join(runs, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.coalesce(F.col("repeated_positions").cast("bigint"), zero).alias(
                "repeated_positions"
            ),
            F.coalesce(F.col("max_repeated_run").cast("bigint"), zero).alias(
                "max_repeated_run"
            ),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "content",
    group_col: str = "source",
    n: int = 13,
) -> DataFrame:
    """Cross-slice contamination audit: for every pair of corpus slices
    (sources, dumps, train/eval splits), how many distinct ``n``-token windows
    they share verbatim — the corpus-level view of the same window census
    :func:`repeated_window_stats` takes per document (the split-hygiene audit
    a training pipeline runs before mixing sources or trusting a held-out
    slice; same rule family as ``operators/decontamination.py``).

    Output: (source_a, source_b, shared_windows bigint), source_a < source_b,
    only pairs with ≥ 1 shared window (integer-only, oracle-hash safe).

    Scale shape: ONE aggregation exchange on the window — ``collect_set``
    gathers each window's slice set (map-side partial, so the dominant
    single-slice windows collapse before the shuffle) — then the pair
    expansion happens inside the row, bounded by the (small) slice count,
    never by document count; a boilerplate window shared by every slice
    costs |slices|² pair rows, not |docs|². The former shape (distinct +
    self-join on the window string) shuffled the long window strings three
    times; this shuffles them once.
    """
    d = docs.select(
        F.col(group_col).alias("_g"),
        # census key = xxhash64 surrogate of the window, not the ~90-byte
        # string — the one exchange here ships 8-byte keys (same surrogate
        # discipline and collision class as decontamination.ngram_hash_array)
        F.transform(
            ngram_windows(F.col(text_col), n), lambda w: F.xxhash64(w)
        ).alias("_ws"),
    )
    wsets = (
        d.select("_g", F.explode("_ws").alias("_w"))
        .groupBy("_w")
        .agg(F.array_sort(F.collect_set("_g")).alias("_gs"))
        .where(F.size("_gs") >= 2)
    )
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("_gs") - 1),
            lambda i: F.transform(
                F.slice("_gs", i + 1, F.size("_gs") - i),
                lambda g: F.struct(
                    F.get("_gs", i - 1).alias("source_a"), g.alias("source_b")
                ),
            ),
        )
    )
    return (
        wsets.select(F.explode(pair_arr).alias("_p"))
        .groupBy(F.col("_p.source_a").alias("source_a"), F.col("_p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_windows"))
    )
