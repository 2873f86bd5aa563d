"""Deterministic token-budget sampling — allocate a per-bucket token budget
(the data-mixing step of a pretraining pipeline: "take B tokens from each
source/domain") with a seeded, engine-independent shuffle order.

Instead of an RNG (non-reproducible across engines/partitionings), each doc
gets a Knuth multiplicative-hash rank ``(id · 2654435761) mod 2^32`` — a
fixed bijection on 32-bit ids, so the "random" order is deterministic,
uniform-ish, and expressible in ANSI SQL (the DuckDB oracle replays it
bit-for-bit). A doc is kept while the running token total of its bucket,
taken in rank order, has not yet reached the budget — the first doc that
crosses the budget is still kept (budgets are lower bounds in mixing
recipes: you stop AFTER covering B tokens).

Scale shape: one hash shuffle on the bucket column for the running-sum
window; the window is a single pass (no self-join), and the text column is
never shuffled — only (id, bucket, n_tokens). Skewed buckets are bounded by
the window's in-partition sort, which spills; for a pathological single
bucket at 100 TB, pre-aggregate to (bucket, rank-range) quantiles first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative-hash constant
_MOD = 1 << 32


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    bucket_col: str = "source",
    id_col: str = "unique_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, bucket, n_tokens) → sampling decision per doc.

    Output: (id, bucket, n_tokens, sample_rank, cum_tokens, kept) — all
    integer/boolean. ``cum_tokens`` is the bucket's running total INCLUDING
    this doc, in ``sample_rank`` order; ``kept`` is true while the total
    before this doc is under the budget.
    """
    # (id·K) mod 2^32 via 16-bit limbs — the naive bigint multiply overflows
    # int64 (a job-killing ANSI SparkArithmeticException) for ids ≥ ~3.46e9,
    # i.e. inside the documented 32-bit id domain. Only the low 32 bits of id
    # matter mod 2^32: lo·K < 2^48 and ((hi16·K) mod 2^16)·2^16 < 2^32, so
    # every intermediate fits comfortably in int64 for ANY bigint id.
    _id = F.col(id_col).cast("bigint")
    lo = _id.bitwiseAND(F.lit(0xFFFF))
    hi16 = F.shiftright(_id, 16).bitwiseAND(F.lit(0xFFFF))
    rank = (lo * _KNUTH + ((hi16 * _KNUTH) % F.lit(1 << 16)) * F.lit(1 << 16)) % F.lit(_MOD)
    w = (
        Window.partitionBy(bucket_col)
        .orderBy("sample_rank", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(bucket_col),
            F.col(n_tokens_col).cast("bigint").alias(n_tokens_col),
            rank.alias("sample_rank"),
        )
        .withColumn("cum_tokens", F.sum(n_tokens_col).over(w).cast("bigint"))
        .withColumn(
            "kept",
            (F.col("cum_tokens") - F.col(n_tokens_col)) < budget_tokens,
        )
    )


def name_letter_quotas(
    names: DataFrame, name_col: str = "name", sample_size: int = 1000
) -> DataFrame:
    """First-letter stratified sample-size planner — reference
    ``summarise_name_distribution`` (``data/data_loaders/
    fake_data_collection_es.py:17-52``): group names by lowered first
    letter, compute each stratum's share of the corpus and its quota
    ``round(prob · sample_size)``. The reference uses Python ``round`` —
    banker's (half-to-even) rounding — so the Spark side is ``F.bround``,
    not ``F.round`` (half-up): at 7.5/2.5 the two disagree.

    Output sorted by ``first_letter`` (the reference sorts so strata can be
    batch-indexed). One groupBy + a broadcast of the 1-row total — no
    driver collect, scales with distinct letters (bounded)."""
    letters = names.select(
        F.lower(F.substring(F.col(name_col).cast("string"), 1, 1)).alias(
            "first_letter"
        )
    )
    counts = letters.groupBy("first_letter").agg(
        F.count(F.lit(1)).alias("n_names")
    )
    total = counts.agg(F.sum("n_names").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "first_letter",
            "n_names",
            (F.col("n_names") / F.col("_total")).alias("prob"),
            F.bround(F.col("n_names") / F.col("_total") * sample_size)
            .cast("bigint")
            .alias("new_sample"),
        )
        .orderBy("first_letter")
    )


def temperature_budgets(
    docs: DataFrame,
    total_budget_tokens: int,
    alpha: float = 0.5,
    bucket_col: str = "source",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Alpha-scaled (temperature) mixture budgets — the multilingual/mixture
    sampling rule of XLM-R §3.1 / mT5 ("alpha sampling") and the "sampling
    temperature" knob of the Gopher/PaLM mixture tables: a bucket holding
    token share p_s samples with probability ∝ p_s^alpha, flattening the
    head and boosting the tail as alpha → 0 (alpha = 1 is proportional).

    Output: (bucket, bucket_tokens, budget_tokens) with
    ``budget_tokens = (total · w_s) DIV Σ w_t`` and ``w_s =
    bucket_tokens^alpha`` (the p^alpha normalizer cancels, so shares never
    need the corpus total).

    Engine-exactness: at the default ``alpha = 0.5`` the weights are the
    INTEGER square roots ``isqrt(bucket_tokens)`` (floor(sqrt) with a ±1
    correction, so a last-ulp libm difference can never change the value)
    and the whole computation is integer arithmetic — the DuckDB oracle
    hashes identically regardless of float-summation order. Any other alpha
    takes the float ``pow`` path, whose normalizer sum is
    association-order-dependent — fine for production mixing, not for a
    hash-compared oracle (documented, not hidden).

    Scale shape: ONE map-side-combining aggregate to |buckets| rows, one
    window over those rows — broadcast the result wherever it joins.
    """
    per = docs.groupBy(bucket_col).agg(
        F.sum(F.col(n_tokens_col).cast("bigint")).alias("bucket_tokens")
    )
    if alpha == 0.5:
        y0 = F.floor(F.sqrt(F.col("bucket_tokens").cast("double"))).cast("bigint")
        w = (
            F.when((y0 + 1) * (y0 + 1) <= F.col("bucket_tokens"), y0 + 1)
            .when(y0 * y0 > F.col("bucket_tokens"), y0 - 1)
            .otherwise(y0)
        )
        per = per.withColumn("_w", w)
        # total·w DIV Σw in decimal(38,0) integer arithmetic: the product
        # can reach ~1e13 budget · ~3e9 isqrt ≈ 3e22 — past BOTH the 2^53
        # double mantissa (where floor() goes off by one) and the 2^63
        # bigint cliff.  Spark's integral `div` on the decimal product and
        # DuckDB's HUGEINT `//` (oracle SQL) both produce the exact floor
        # quotient, so the hash parity holds at real LLM token budgets
        # (test_temperature_budgets_exact_past_2pow53).
        return per.select(
            bucket_col,
            "bucket_tokens",
            F.expr(
                f"CAST({int(total_budget_tokens)} AS DECIMAL(38,0)) * _w"
                " div SUM(_w) OVER ()"
            ).cast("bigint").alias("budget_tokens"),
        )
    w = F.pow(F.col("bucket_tokens").cast("double"), F.lit(float(alpha)))
    return per.select(
        bucket_col,
        "bucket_tokens",
        F.floor(
            F.lit(float(total_budget_tokens)) * w
            / F.sum(w).over(Window.partitionBy())
        ).cast("bigint").alias("budget_tokens"),
    )


def temperature_mixture_sample(
    docs: DataFrame,
    total_budget_tokens: int,
    alpha: float = 0.5,
    bucket_col: str = "source",
    id_col: str = "unique_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-weighted data mixing: :func:`temperature_budgets` decides
    each bucket's token budget, then the engine's deterministic Knuth-rank
    keep-while-under-budget rule (:func:`token_budget_sample`'s semantics,
    per-bucket budget instead of a constant) selects the documents.

    Output: (id, bucket, n_tokens, budget_tokens, sample_rank, cum_tokens,
    kept). The budgets frame is |buckets| rows — broadcast into the join, so
    the only shuffle is the per-bucket running-sum window.
    """
    budgets = temperature_budgets(
        docs, total_budget_tokens, alpha, bucket_col, n_tokens_col
    ).select(bucket_col, "budget_tokens")
    _id = F.col(id_col).cast("bigint")
    lo = _id.bitwiseAND(F.lit(0xFFFF))
    hi16 = F.shiftright(_id, 16).bitwiseAND(F.lit(0xFFFF))
    rank = (
        lo * _KNUTH + ((hi16 * _KNUTH) % F.lit(1 << 16)) * F.lit(1 << 16)
    ) % F.lit(_MOD)
    w = (
        Window.partitionBy(bucket_col)
        .orderBy("sample_rank", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(bucket_col),
            F.col(n_tokens_col).cast("bigint").alias(n_tokens_col),
            rank.alias("sample_rank"),
        )
        .join(F.broadcast(budgets), bucket_col)
        .withColumn("cum_tokens", F.sum(n_tokens_col).over(w).cast("bigint"))
        .withColumn(
            "kept",
            (F.col("cum_tokens") - F.col(n_tokens_col))
            < F.col("budget_tokens"),
        )
    )
