"""Repetition-based document quality stats — the standard training-data
filters (duplicate-line fraction, duplicate-line character fraction, top
bigram character coverage) from the Gopher/C4 data-cleaning recipes
(Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2), applied to the engine's
document/code corpus.

Everything is computed relationally (explode → groupBy), never per-row
quadratic HOF scans — a doc with 100k lines costs one shuffle of its lines,
not 100k² comparisons. All outputs are INTEGER parts (counts and character
sums); consumers derive the fractions, and the driver oracle hashes only
integers (the `quality_stats_lang` lesson applied at design time).

Definitions (identical on both engines, documented for the oracle):
- lines: elements of split(text, '\\n'), space-trimmed, empties dropped;
- dup_lines  = Σ(count) − #distinct lines (occurrences beyond the first);
- dup_chars  = Σ count·len(line) over lines with count > 1 (ALL occurrences
  of a duplicated line count, the Gopher convention);
- line_chars = Σ count·len(line) (denominator for the char fraction);
- tokens: split(lower(text), /\\s+/), empties dropped;
- top_bigram_chars = max over bigrams of count·(len(bigram)−1) — the char
  coverage of the single best-covering bigram. Taking the max of coverage
  (not "coverage of the most frequent bigram") removes the frequency
  tie-break and keeps the statistic deterministic;
- tok_chars = Σ len(token) (denominator for bigram coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import ws_tokens


def repetition_stats(
    docs: DataFrame, text_col: str = "content", id_col: str = "unique_id"
) -> DataFrame:
    """(id, text) → integer repetition stats per document.

    Output: (id, n_lines, dup_lines, dup_chars, line_chars,
    top_bigram_chars, tok_chars) — all bigint, 0 for empty docs.
    """
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))

    lines = d.select(
        "_id",
        F.explode(
            F.filter(
                F.transform(F.split("_t", "\n"), lambda l: F.trim(l)),
                lambda l: F.length(l) > 0,
            )
        ).alias("_line"),
    )
    lc = lines.groupBy("_id", "_line").agg(F.count("*").alias("_c"))
    line_stats = lc.groupBy("_id").agg(
        F.sum("_c").alias("n_lines"),
        (F.sum("_c") - F.count("*")).alias("dup_lines"),
        F.sum(
            F.when(F.col("_c") > 1, F.col("_c") * F.length("_line")).otherwise(0)
        ).alias("dup_chars"),
        F.sum(F.col("_c") * F.length("_line")).alias("line_chars"),
    )

    toks = ws_tokens("_t")
    base = d.select("_id", toks.alias("_toks"))
    n = F.size("_toks")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_toks", 1, n - 1),
            F.slice("_toks", 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok_stats = base.select(
        "_id",
        F.aggregate(
            "_toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
        bigrams.alias("_bgs"),
    )
    bc = (
        tok_stats.select("_id", F.explode("_bgs").alias("_bg"))
        .groupBy("_id", "_bg")
        .agg(F.count("*").alias("_c"))
    )
    top = bc.groupBy("_id").agg(
        F.max(F.col("_c") * (F.length("_bg") - 1)).alias("top_bigram_chars")
    )

    zero = F.lit(0).cast("bigint")
    return (
        d.select("_id")
        .join(line_stats, "_id", "left")
        .join(tok_stats.select("_id", "tok_chars"), "_id", "left")
        .join(top, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            *[
                F.coalesce(F.col(c).cast("bigint"), zero).alias(c)
                for c in (
                    "n_lines", "dup_lines", "dup_chars", "line_chars",
                    "top_bigram_chars", "tok_chars",
                )
            ],
        )
    )
