"""Sampled acceptance-score distribution + combiner improvement ratios.

Reference:
- ``am_combiner/qa/acceptance_metrics.py:36-75`` (``get_url_map`` /
  ``get_acceptance_scores``): per blocked name, sample ``⌊n_records·rate⌋``
  random record pairs, compare clustering agreement ("same cluster?") against
  ground-truth agreement, report accuracy + weighted-average
  precision/recall/F1 over the Yes/No classes;
- ``am_combiner/qa/quality_metrics.py:344-365`` (``check_acceptance_distribution``):
  repeat the sampled measurement ``number_of_runs`` times → a distribution of
  scores (the sampling-noise check);
- ``am_combiner/qa/utils.py:56-103`` (``calculate_improvements``): pairwise
  metric ratios between combiner report rows, with 0/0 → NaN and x/0 → inf.

Spark form: each run is a deterministic pseudo-random pair sample — records are
ranked inside a block by ``xxhash64(id, run)`` and consecutive ranks paired, so
the "random matching" is reproducible and partition-invariant (the reference
uses ``random.sample`` with global RNG state: order-dependent; the survey
excluded the op on those grounds — seeded hashing is the deterministic
re-expression). All per-run metrics are single JVM-side aggregates; runs are a
union of tiny plans, and the result is ``number_of_runs`` rows.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _run_scores(clusters: DataFrame, run: int, sampling_rate: float) -> DataFrame:
    """One sampled acceptance measurement → a 1-row frame.

    ``clusters``: (unique_id, blocking_key, cluster_id, ground_truth).
    """
    w = Window.partitionBy("blocking_key").orderBy("_h", "unique_id")
    ranked = clusters.select(
        "unique_id", "blocking_key", "cluster_id", "ground_truth",
        F.xxhash64("unique_id", F.lit(run)).alias("_h"),
    ).withColumn("_rk", F.row_number().over(w))
    n_blk = clusters.groupBy("blocking_key").agg(
        F.floor(F.count("*") * F.lit(sampling_rate)).alias("_n_pairs")
    )
    a = ranked.where(F.col("_rk") % 2 == 1).select(
        "blocking_key",
        ((F.col("_rk") + 1) / 2).cast("long").alias("_pair"),
        F.col("cluster_id").alias("_ca"), F.col("ground_truth").alias("_ga"),
    )
    b = ranked.where(F.col("_rk") % 2 == 0).select(
        "blocking_key",
        (F.col("_rk") / 2).cast("long").alias("_pair"),
        F.col("cluster_id").alias("_cb"), F.col("ground_truth").alias("_gb"),
    )
    pairs = (
        a.join(b, ["blocking_key", "_pair"])
        .join(n_blk, "blocking_key")
        .where(F.col("_pair") <= F.col("_n_pairs"))
        .select(
            (F.col("_ca") == F.col("_cb")).alias("pred"),
            (F.col("_ga") == F.col("_gb")).alias("actual"),
        )
    )
    agg = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred") & F.col("actual"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("actual"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("actual"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("actual"), 1).otherwise(0)).alias("tn"),
    )
    # weighted-average P/R/F over the two classes (sklearn average="weighted"
    # with labels {Yes, No} — acceptance_metrics.py:70-74): class Yes uses
    # (tp, fp, fn), class No mirrors with (tn, fn, fp); weights are actual
    # class supports.
    e = agg.select(
        F.lit(run).alias("run"), "n", "tp", "fp", "fn", "tn",
        (F.col("tp") + F.col("fn")).alias("_sy"),
        (F.col("tn") + F.col("fp")).alias("_sn"),
    )

    def _safe(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    p_yes = _safe(F.col("tp"), F.col("tp") + F.col("fp"))
    r_yes = _safe(F.col("tp"), F.col("tp") + F.col("fn"))
    p_no = _safe(F.col("tn"), F.col("tn") + F.col("fn"))
    r_no = _safe(F.col("tn"), F.col("tn") + F.col("fp"))
    f_yes = _safe(2 * p_yes * r_yes, p_yes + r_yes)
    f_no = _safe(2 * p_no * r_no, p_no + r_no)
    wy, wn = F.col("_sy") / F.col("n"), F.col("_sn") / F.col("n")
    return e.select(
        "run",
        F.col("n").alias("pairs_sampled"),
        _safe(F.col("tp") + F.col("tn"), F.col("n")).alias("accuracy"),
        (p_yes * wy + p_no * wn).alias("precision"),
        (r_yes * wy + r_no * wn).alias("recall"),
        (f_yes * wy + f_no * wn).alias("fscore"),
    )


def check_acceptance_distribution(
    clusters: DataFrame,
    sampling_rate: float = 0.2,
    number_of_runs: int = 20,
) -> DataFrame:
    """``number_of_runs`` seeded sampled acceptance measurements → one row each.

    Reference quality_metrics.py:344-365. Input: (unique_id, blocking_key,
    cluster_id, ground_truth).
    """
    # every run re-reads the same cluster table; materialize it once so the
    # (possibly expensive) upstream resolve/join subtree doesn't re-execute
    # number_of_runs times (ContextCleaner reclaims the checkpoint blocks)
    clusters = clusters.localCheckpoint(eager=True)
    out = _run_scores(clusters, 0, sampling_rate)
    for r in range(1, number_of_runs):
        out = out.unionByName(_run_scores(clusters, r, sampling_rate))
    return out


def calculate_improvements(
    report_frame: pd.DataFrame,
    improvements_against: list[str],
    combiners: list[str] | None = None,
) -> list[dict]:
    """Pairwise metric ratios between combiner rows (reference utils.py:56-103).

    ``report_frame``: one row per combiner (index = combiner name) — a tiny
    driver-side report, hence plain pandas like every other report formatter in
    the QA layer. 0/0 → NaN, x/0 → inf, non-numeric cells skipped.
    """
    combiners = list(report_frame.index) if combiners is None else combiners
    if "all" in improvements_against:
        improvements_against = combiners
    improvements: list[dict] = []
    for reference in improvements_against:
        for combiner in combiners:
            improvement = {"reference": reference, "combiner": combiner}
            for col in report_frame.columns:
                try:
                    numerator = report_frame.loc[combiner][col]
                    denominator = report_frame.loc[reference][col]
                    if not numerator and not denominator:
                        frac = math.nan
                    elif not denominator:
                        frac = math.inf
                    else:
                        frac = numerator / denominator
                except TypeError:
                    continue
                improvement[col] = round(frac, 2)
            improvements.append(improvement)
    return improvements
