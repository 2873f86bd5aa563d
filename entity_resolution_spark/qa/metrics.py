"""Clustering-quality metrics as distributed groupBy jobs.

Reproduces the reference's QA module semantics:
- pairwise accuracy/precision/recall/F1 on labeled pairs — the acceptance metric the
  F1 ≥ 0.99 gate refers to (``am_combiner/qa/acceptance_metrics.py:7-74``), made
  exhaustive and deterministic instead of sampled;
- homogeneity / completeness / V-measure per block, averaged
  (``am_combiner/qa/quality_metrics.py:174-197`` — sklearn call, re-derived here from
  the contingency-table entropy definitions so no sklearn is needed);
- over/under-combination rates and the score-to-minimize
  (``am_combiner/qa/quality_metrics.py:200-319``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_confusion(
    labeled_pairs: DataFrame, clusters: DataFrame
) -> dict[str, int]:
    """Join predicted co-membership onto labeled pairs → TP/FP/FN/TN counts.

    labeled_pairs: (blocking_key, unique_id_a, unique_id_b, label)
    clusters:      (unique_id, cluster_id, ...)
    """
    ca = clusters.select(
        F.col("unique_id").alias("unique_id_a"), F.col("cluster_id").alias("_cid_a")
    )
    cb = clusters.select(
        F.col("unique_id").alias("unique_id_b"), F.col("cluster_id").alias("_cid_b")
    )
    j = labeled_pairs.join(ca, "unique_id_a").join(cb, "unique_id_b")
    pred = F.col("_cid_a") == F.col("_cid_b")
    row = j.agg(
        F.sum((F.col("label") & pred).cast("long")).alias("tp"),
        F.sum(((~F.col("label")) & pred).cast("long")).alias("fp"),
        F.sum((F.col("label") & (~pred)).cast("long")).alias("fn"),
        F.sum(((~F.col("label")) & (~pred)).cast("long")).alias("tn"),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("tp", "fp", "fn", "tn")}


def pairwise_f1(labeled_pairs: DataFrame, clusters: DataFrame) -> dict[str, float]:
    c = pairwise_confusion(labeled_pairs, clusters)
    tp, fp, fn, tn = c["tp"], c["fp"], c["fn"], c["tn"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    accuracy = (tp + tn) / max(tp + fp + fn + tn, 1)
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": accuracy,
        **{k: float(v) for k, v in c.items()},
    }


def _entropy_sum(counts: list[tuple[int, int]]) -> float:
    """Σ -(n/N)·ln(n/N) helper over (n, N) pairs."""
    out = 0.0
    for n, total in counts:
        if n > 0 and total > 0:
            p = n / total
            out -= p * math.log(p)
    return out


def homogeneity_completeness_v(
    truth_pred: DataFrame, truth_col: str = "ground_truth", pred_col: str = "cluster_id"
) -> dict[str, float]:
    """Global homogeneity/completeness/V from the (truth, pred) contingency table.

    Pure groupBy aggregation (three small aggregates collected to the driver — the
    contingency table is #truth-clusters × #pred-clusters, tiny relative to data).
    Matches sklearn's ``homogeneity_completeness_v_measure`` definitions.
    """
    n = truth_pred.count()
    if n == 0:
        return {"homogeneity": 1.0, "completeness": 1.0, "v_measure": 1.0}
    cont = (
        truth_pred.groupBy(truth_col, pred_col).agg(F.count("*").alias("nij")).collect()
    )
    t_tot: dict = {}
    p_tot: dict = {}
    for r in cont:
        t_tot[r[truth_col]] = t_tot.get(r[truth_col], 0) + r["nij"]
        p_tot[r[pred_col]] = p_tot.get(r[pred_col], 0) + r["nij"]
    h_c = _entropy_sum([(t, n) for t in t_tot.values()])          # H(C)
    h_k = _entropy_sum([(p, n) for p in p_tot.values()])          # H(K)
    # H(C|K) = Σ_k Σ_c -(n_ck/n)·ln(n_ck/n_k)
    h_c_given_k = 0.0
    h_k_given_c = 0.0
    for r in cont:
        nij = r["nij"]
        if nij > 0:
            h_c_given_k -= (nij / n) * math.log(nij / p_tot[r[pred_col]])
            h_k_given_c -= (nij / n) * math.log(nij / t_tot[r[truth_col]])
    homogeneity = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    completeness = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = (
        0.0
        if homogeneity + completeness == 0
        else 2 * homogeneity * completeness / (homogeneity + completeness)
    )
    return {"homogeneity": homogeneity, "completeness": completeness, "v_measure": v}


def oc_uc_report(
    truth_pred: DataFrame,
    block_col: str = "blocking_key",
    truth_col: str = "ground_truth",
    pred_col: str = "cluster_id",
) -> DataFrame:
    """Per-block over/under-combination report (ref: ``qa/quality_metrics.py:200-281``).

    A predicted cluster is OVER-combined if it touches >1 true cluster; a true
    cluster is UNDER-combined if it is spread over >1 predicted cluster.
    Output per block: oc_rate, uc_rate, n_pred_clusters, n_true_clusters.
    """
    per_pred = truth_pred.groupBy(block_col, pred_col).agg(
        F.countDistinct(truth_col).alias("_support")
    )
    oc = per_pred.groupBy(block_col).agg(
        F.avg((F.col("_support") > 1).cast("double")).alias("oc_rate"),
        F.count("*").alias("n_pred_clusters"),
    )
    per_true = truth_pred.groupBy(block_col, truth_col).agg(
        F.countDistinct(pred_col).alias("_spread")
    )
    uc = per_true.groupBy(block_col).agg(
        F.avg((F.col("_spread") > 1).cast("double")).alias("uc_rate"),
        F.count("*").alias("n_true_clusters"),
    )
    return oc.join(uc, block_col)


def score_to_minimize(report: DataFrame) -> DataFrame:
    """The reference's tuned objective (weights from ``qa/quality_metrics.py:312-317``):
    3.4·UC + 8.4·OC + 0.4·(pred/true clusters per OC proxy) + 0.8·excess-profiles."""
    excess = F.greatest(
        (F.col("n_pred_clusters") - F.col("n_true_clusters")).cast("double"), F.lit(0.0)
    ) / F.col("n_true_clusters")
    profiles_per_oc = F.when(
        F.col("oc_rate") > 0,
        F.col("n_pred_clusters").cast("double") / F.col("n_true_clusters"),
    ).otherwise(F.lit(0.0))
    return report.withColumn(
        "score_to_minimize",
        3.4 * F.col("uc_rate")
        + 8.4 * F.col("oc_rate")
        + 0.4 * profiles_per_oc
        + 0.8 * excess,
    )
