"""Gopher document-level quality rules (Rae et al. 2021, appendix A1.1 —
the public "Gopher rules" used by MassiveText, RefinedWeb, Dolma and most
LLM-corpus recipes), computed as integer parts with a per-rule failure
bitmask.

The seven rules, each encoded division-free so every comparison is integer
arithmetic (identical on any engine — the ``quality_stats_lang`` lesson
applied at design time):

bit 0  word count outside [min_words, max_words]        (50, 100_000)
bit 1  mean word length outside [3, 10]                 3n ≤ chars ≤ 10n
bit 2  symbol-to-word ratio > 0.1 for EITHER symbol     10·hash > n OR 10·ell > n
bit 3  > 90% of lines start with a bullet               10·bullet > 9·lines
bit 4  > 30% of lines end with an ellipsis              10·ell > 3·lines
bit 5  < 80% of words contain an alphabetic char        5·alpha < 4·n
bit 6  fewer than 2 of the 8 Gopher stop words present

``keep = (fail_mask == 0)``, shipped as bigint 0/1 (no booleans in hashed
output, per the house oracle rules).

Definitions (documented for the DuckDB oracle, which mirrors them exactly):
- words: the shared corpus-prep tokenizer ``ws_tokens`` (split lowered text
  on /\\s+/, empties dropped);
- symbols: the paper's two symbol classes counted SEPARATELY — ``#``
  occurrences, and non-overlapping ``...`` plus ``…`` occurrences; the
  0.1 ratio applies to each class on its own ("either the hash symbol or
  the ellipsis", Rae et al. A1.1), not to their sum;
- lines: elements of split(text, '\\n'), space-trimmed, empties dropped
  (the same line convention as ``repetition_stats``);
- bullet line: trimmed line starts with one of ``- * • ‣ ▪``;
- ellipsis line: trimmed line ends with ``...`` or ``…``;
- alphabetic word: token containing at least one ``[a-z]`` (tokens are
  already lowered);
- stop words: the paper's fixed list {the, be, to, of, and, that, have,
  with}; the hit count is "how many of the 8 occur at least once",
  computed by filtering the CONSTANT 8-element list against the token
  array so both engines share one unambiguous semantics.

Scale shape (the 100 TB argument): ONE codegen'd projection — split + HOF
filters/aggregates, no explode, no shuffle, no Python. At 1000 executors
each task streams its parquet split once and emits integers; composing it
in front of dedup (`jobs/corpus_prep_job.py`) prunes documents before any
shuffle-bearing stage sees them.

Reference parity note: the reference repo has no corpus-quality stage (its
inputs are curated adverse-media articles); this operator belongs to the
training-data mandate, next to ``operators/repetition.py`` (same paper,
§A1.1 repetition rules) and ``operators/cleaning.py`` (C4 §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import ws_tokens

GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

BULLET_START_RE = r"^[-*•‣▪]"
ELLIPSIS_END_RE = r"(\.\.\.|…)$"


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "unique_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """(id, text) → Gopher-rule integer parts + ``fail_mask`` + ``keep``.

    Output (all bigint): (id, n_words, word_chars, n_alpha_words,
    n_hash_symbols, n_ellipsis_symbols, n_lines, n_bullet_lines,
    n_ellipsis_lines, n_stop_hits, fail_mask, keep).
    Pure projection — no shuffle, no UDF.
    """
    d = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    # let-bind tokens/lines: HOF lambdas re-evaluate embedded child
    # expressions per element (house rule — never inline the tokenizer)
    bound = d.select(
        "_id",
        "_t",
        ws_tokens("_t").alias("_tk"),
        F.filter(
            F.transform(F.split(F.coalesce("_t", F.lit("")), "\n"),
                        lambda ln: F.trim(ln)),
            lambda ln: F.length(ln) > 0,
        ).alias("_ln"),
    )
    zero = F.lit(0).cast("bigint")
    parts = bound.select(
        "_id",
        F.size("_tk").cast("bigint").alias("n_words"),
        F.aggregate(
            "_tk", zero, lambda acc, t: acc + F.length(t)
        ).alias("word_chars"),
        F.size(
            F.filter(F.col("_tk"), lambda t: t.rlike("[a-z]"))
        ).cast("bigint").alias("n_alpha_words"),
        F.regexp_count(F.coalesce("_t", F.lit("")), F.lit("#"))
        .cast("bigint").alias("n_hash_symbols"),
        (
            F.regexp_count(F.coalesce("_t", F.lit("")), F.lit(r"\.\.\."))
            + F.regexp_count(F.coalesce("_t", F.lit("")), F.lit("…"))
        ).cast("bigint").alias("n_ellipsis_symbols"),
        F.size("_ln").cast("bigint").alias("n_lines"),
        F.size(
            F.filter(F.col("_ln"), lambda ln: ln.rlike(BULLET_START_RE))
        ).cast("bigint").alias("n_bullet_lines"),
        F.size(
            F.filter(F.col("_ln"), lambda ln: ln.rlike(ELLIPSIS_END_RE))
        ).cast("bigint").alias("n_ellipsis_lines"),
        F.size(
            F.filter(
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                lambda w: F.array_contains("_tk", w),
            )
        ).cast("bigint").alias("n_stop_hits"),
    )
    n = F.col("n_words")
    bits = [
        (n < min_words) | (n > max_words),
        (F.col("word_chars") < 3 * n) | (F.col("word_chars") > 10 * n),
        (10 * F.col("n_hash_symbols") > n)
        | (10 * F.col("n_ellipsis_symbols") > n),
        10 * F.col("n_bullet_lines") > 9 * F.col("n_lines"),
        10 * F.col("n_ellipsis_lines") > 3 * F.col("n_lines"),
        5 * F.col("n_alpha_words") < 4 * n,
        F.col("n_stop_hits") < 2,
    ]
    mask = zero
    for i, b in enumerate(bits):
        mask = mask + F.when(b, F.lit(1 << i).cast("bigint")).otherwise(zero)
    out = parts.withColumn("fail_mask", mask)
    return out.select(
        F.col("_id").alias(id_col),
        "n_words", "word_chars", "n_alpha_words", "n_hash_symbols",
        "n_ellipsis_symbols", "n_lines",
        "n_bullet_lines", "n_ellipsis_lines", "n_stop_hits", "fail_mask",
        (F.col("fail_mask") == 0).cast("bigint").alias("keep"),
    )
