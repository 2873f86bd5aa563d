"""Unigram-rarity document scoring — the corpus-statistics quality filter of
a pretraining pipeline (the CCNet/KenLM idea: score each document by how
surprising its tokens are under a model fit on the corpus itself; documents
of all-common tokens are boilerplate, documents of all-rare tokens are noise).

Instead of a float language model, the per-token surprisal is the
INTEGER-EXACT ``rarity(t) = floor(log2(n_docs / df(t)))`` — a unigram
self-information in whole bits, computed as ``length(bin(n_docs DIV df)) − 1``
so both engines produce bit-identical bigints (no ``log`` double ever enters
a hashed value; the `quality_stats_lang` lesson).

Scale shape: a TF-IDF-census-shaped two-pass plan —
1. df census: explode DISTINCT tokens per doc, one hash shuffle on token,
   count per token (map-side combined);
2. score join: the (token → rarity) table re-joins the exploded tokens and
   one hash aggregate on doc id recovers the document stats.
At 100 TB the census table is vocabulary-sized (≪ corpus); Spark's AQE picks
a broadcast for it when it fits, and the exploded corpus side never carries
the text column. The only driver action is one column-pruned ``count()`` to
fix ``n_docs`` (parquet answers it from footers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import ws_tokens


def unigram_rarity_stats(
    docs: DataFrame, text_col: str = "content", id_col: str = "unique_id"
) -> DataFrame:
    """(id, text) → (id, n_tokens, distinct_tokens, sum_rarity, max_rarity).

    - tokens: split(lower(text), /\\s+/), empties dropped;
    - df(t): number of DOCS containing t (distinct per doc);
    - rarity(t) = floor(log2(n_docs / df(t))) ≥ 0, in whole bits;
    - sum_rarity sums rarity over a doc's DISTINCT tokens (df weighting is
      per-type, as in a unigram LM fit on document frequency);
    - empty docs keep 0/0/0/0. All outputs bigint.
    """
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    base = d.select("_id", ws_tokens("_t").alias("_toks"))

    exploded = base.select(
        "_id",
        F.size("_toks").alias("n_tokens"),
        F.explode_outer(F.array_distinct("_toks")).alias("_tok"),
    )
    n_docs = docs.count()
    # floor(log2(n_docs DIV df)) as length(bin(v)) - 1: exact on both engines
    df_census = (
        exploded.where(F.col("_tok").isNotNull())
        .groupBy("_tok")
        .agg(F.count("*").alias("_df"))
        .select(
            "_tok",
            # integral DIV, not floor(double /): a double quotient can round
            # UP across a power of two for n_docs ≥ 2^53 and drift from the
            # oracle's `//` — same latent-overflow class as the sampling hash
            (
                F.length(F.bin(F.expr(f"CAST({int(n_docs)} AS BIGINT) DIV _df"))) - 1
            ).cast("bigint").alias("_rarity"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        exploded.join(df_census, "_tok", "left")
        .groupBy("_id")
        .agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.count("_tok").cast("bigint").alias("distinct_tokens"),
            F.coalesce(F.sum("_rarity"), zero).cast("bigint").alias("sum_rarity"),
            F.coalesce(F.max("_rarity"), zero).cast("bigint").alias("max_rarity"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "distinct_tokens",
            "sum_rarity",
            "max_rarity",
        )
    )
