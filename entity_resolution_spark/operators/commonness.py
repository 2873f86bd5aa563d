"""Name-commonness scoring (reference ``name_commonness.py``).

Reference: ``am_combiner/name_commonness.py:57-120`` (``get_commonness_score``):
the corpus of entity names is tokenized into a (word_token, no_of_tokens)
frequency table; a name's commonness is the PRODUCT over its tokens of
``token_count / total_names`` — and 0 when any token is absent from the table
(the reference's ``len(df_temp) < len(name_token)`` guard, which also zeroes
names with a repeated token, since the frequency table contributes one row per
DISTINCT token). Used to de-weight matches on very common names.

Spark form: the frequency table is one explode + groupBy over the name corpus
(the Mongo export in the reference, ``name_commonness.py:19-54``); scoring is
an inner join of each name's distinct tokens against it, with ``F.product``
over the matched counts. Counts are integers, every partial product stays well
under 2^53, so the double product is EXACT and order-independent — the scoring
query exposes the integer numerator (product of counts) next to the double
score so cross-engine comparison needs no float hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_frequency_table(
    names: DataFrame, name_col: str = "name"
) -> DataFrame:
    """Corpus of names → (word_token, no_of_tokens) — the reference's
    pre-saved token-frequency export (``save_entity_tokens_to_csv``).

    A token counts once per NAME carrying it (the export writes each name's
    token set), not once per occurrence inside a name.
    """
    return (
        names.select(
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(name_col)), r"\s+"))
            ).alias("word_token")
        )
        .where(F.col("word_token") != "")
        .groupBy("word_token")
        .agg(F.count("*").alias("no_of_tokens"))
    )


def name_commonness_scores(
    names: DataFrame,
    freq: DataFrame,
    total_names: int,
    name_col: str = "name",
    id_col: str | None = None,
) -> DataFrame:
    """(id?, name) → commonness columns per name (``get_commonness_score``).

    Output: the input id/name columns plus
    - ``n_tokens``       — the name's token count WITH multiplicity;
    - ``commonness_num`` — ∏ matched distinct tokens' counts (bigint; 0 when
      any token is missing from the table, reference's zero guard);
    - ``commonness``     — the reference's score: ``commonness_num /
      total_names^n_tokens`` (0.0 under the same guard).
    """
    key_cols = [id_col] if id_col else []
    base = names.select(
        *key_cols,
        F.col(name_col).alias("_name"),
        F.filter(
            F.split(F.lower(F.col(name_col)), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    x = base.select(
        *key_cols, "_name", "_n",
        F.explode(F.array_distinct("_toks")).alias("word_token"),
    )
    matched = (
        x.join(freq, "word_token")
        .groupBy(*key_cols, "_name", "_n")
        .agg(
            F.count("*").alias("_m"),
            F.product(F.col("no_of_tokens").cast("double")).alias("_prod"),
        )
    )
    ok = F.col("_m") == F.col("_n")
    scored = matched.select(
        *key_cols, "_name", "_n",
        F.when(ok, F.col("_prod")).otherwise(F.lit(0.0)).alias("_num"),
    )
    # names with NO matched token dropped out of the inner join: restore at 0
    out = base.select(*key_cols, "_name", "_n").join(
        scored, [*key_cols, "_name", "_n"], "left"
    )
    num = F.coalesce(F.col("_num"), F.lit(0.0))
    return out.select(
        *key_cols,
        F.col("_name").alias(name_col),
        F.col("_n").cast("int").alias("n_tokens"),
        num.cast("bigint").alias("commonness_num"),
        (num / F.pow(F.lit(float(total_names)), F.col("_n"))).alias("commonness"),
    )
