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


def check_acceptance_distribution(
    clusters: DataFrame,
    sampling_rate: float = 0.2,
    number_of_runs: int = 20,
) -> DataFrame:
    """``number_of_runs`` seeded sampled acceptance measurements → one row each.

    Reference quality_metrics.py:344-365. Input: (unique_id, blocking_key,
    cluster_id, ground_truth).

    All runs run in ONE plan: records are exploded across run ids, ranked
    inside each (run, block) partition by ``xxhash64(id, run)``, and each
    odd-ranked record pairs with its window successor (``lead``) — the same
    (rank 2j−1, rank 2j) pairs the per-run formulation produced, without its
    two self-joins, and without ``number_of_runs`` driver-scheduled jobs (a
    20-run check was 20 plan unions; plan count IS serial cost — the engine's
    repeated scaling lesson).
    """
    w = Window.partitionBy("_run", "blocking_key").orderBy("_h", "unique_id")
    cnt_w = Window.partitionBy("_run", "blocking_key")
    ranked = (
        clusters.select("unique_id", "blocking_key", "cluster_id", "ground_truth")
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(number_of_runs - 1))).alias("_run"),
        )
        .withColumn("_h", F.xxhash64("unique_id", "_run"))
        .select(
            "*",
            F.row_number().over(w).alias("_rk"),
            F.count("*").over(cnt_w).alias("_n_rec"),
            F.lead("cluster_id").over(w).alias("_cb"),
            F.lead("ground_truth").over(w).alias("_gb"),
        )
    )
    pairs = ranked.where(
        (F.col("_rk") % 2 == 1)
        & F.col("_cb").isNotNull()
        & (
            (F.col("_rk") + 1) / 2
            <= F.floor(F.col("_n_rec") * F.lit(sampling_rate))
        )
    ).select(
        F.col("_run").alias("run"),
        (F.col("cluster_id") == F.col("_cb")).alias("pred"),
        (F.col("ground_truth") == F.col("_gb")).alias("actual"),
    )
    agg = pairs.groupBy("run").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred") & F.col("actual"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("actual"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("actual"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("actual"), 1).otherwise(0)).alias("tn"),
    )
    # a run whose every block floors to 0 sampled pairs must still report a
    # zeroed row (the reference appends a score row per run unconditionally)
    all_runs = clusters.sparkSession.range(number_of_runs).select(
        F.col("id").cast("int").alias("run")
    )
    agg = all_runs.join(agg, "run", "left").fillna(
        0, subset=["n", "tp", "fp", "fn", "tn"]
    )
    # weighted-average P/R/F over the two classes (sklearn average="weighted"
    # with labels {Yes, No} — acceptance_metrics.py:70-74): class Yes uses
    # (tp, fp, fn), class No mirrors with (tn, fn, fp); weights are actual
    # class supports.
    e = agg.select(
        "run", "n", "tp", "fp", "fn", "tn",
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
    # class weights guarded like every other ratio: a run whose every block
    # floors to 0 sampled pairs has n=0, and a bare division would raise
    # DIVIDE_BY_ZERO under ANSI mode instead of reporting the zeroed row
    wy = _safe(F.col("_sy"), F.col("n"))
    wn = _safe(F.col("_sn"), F.col("n"))
    return e.select(
        "run",
        F.col("n").alias("pairs_sampled"),
        _safe(F.col("tp") + F.col("tn"), F.col("n")).alias("accuracy"),
        (p_yes * wy + p_no * wn).alias("precision"),
        (r_yes * wy + r_no * wn).alias("recall"),
        (f_yes * wy + f_no * wn).alias("fscore"),
    )


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


def threshold_search(
    score_fn,
    t_min: float = 0.0,
    t_max: float = 1.0,
    hop_num: int = 5,
) -> tuple[list[float], list[float]]:
    """Binary search for the threshold minimizing ``score_fn`` (reference
    ``features/nn/helpers.py:48-142``).

    ``score_fn(t)`` is typically a full Spark evaluation (cluster at
    threshold ``t``, compute ``score_to_minimise``) — hop_num+2 evaluations
    total, recursing into the half adjacent to the lower endpoint score.
    Returns (tried_thresholds, tried_scores) in evaluation order, exactly the
    reference sequence. (The reference's mutable-default ``tried_x=[]``
    accumulator bug — state leaking across calls — is not reproduced.)
    """
    tried_x: list[float] = []
    tried_y: list[float] = []

    def rec(lo: float, hi: float, hops: int, y_lo, y_hi):
        if hops == 0:
            return
        if y_hi is None:
            y_hi = score_fn(hi)
            tried_x.append(hi)
            tried_y.append(y_hi)
        if y_lo is None:
            y_lo = score_fn(lo)
            tried_x.append(lo)
            tried_y.append(y_lo)
        mid = 0.5 * (lo + hi)
        y_mid = score_fn(mid)
        tried_x.append(mid)
        tried_y.append(y_mid)
        if y_lo < y_hi:
            rec(lo, mid, hops - 1, y_lo, y_mid)
        else:
            rec(mid, hi, hops - 1, y_mid, y_hi)

    rec(t_min, t_max, hop_num, None, None)
    return tried_x, tried_y


def cluster_distribution_summary(
    df,
    name_col: str = "blocking_key",
    cluster_col: str = "cluster_id",
    id_col: str = "unique_id",
):
    """Cluster-size distribution census (reference
    ``utils/distributions.py:56-130`` DataframeDistributionSummariser).

    Returns three DataFrames mirroring the reference's attributes:

    - ``clusters_per_name``: (name, n_clusters) — nunique clusters per name;
    - ``cluster_count_weights``: (n_clusters, n_names) — how many names have
      each cluster count (the reference's sampling-weight Counter);
    - ``weights_for_cluster_sizes``: (n_clusters, n_articles, weight) — for
      names with a given cluster count, the distribution of per-cluster
      article counts.

    The reference loops name-by-name over a pandas frame (O(names) scans);
    here each summary is one hash aggregation — two shuffles total on the
    name key, census-shaped at any corpus size.
    """
    per_name = df.groupBy(name_col).agg(
        F.countDistinct(cluster_col).alias("n_clusters")
    )
    cluster_count_weights = (
        per_name.groupBy("n_clusters")
        .agg(F.count("*").cast("long").alias("n_names"))
    )
    per_cluster = df.groupBy(name_col, cluster_col).agg(
        F.count(id_col).cast("long").alias("n_articles")
    )
    weights_for_cluster_sizes = (
        per_cluster.join(per_name, name_col)
        .groupBy("n_clusters", "n_articles")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    return per_name, cluster_count_weights, weights_for_cluster_sizes
