"""Clustering-quality metrics as distributed groupBy jobs.

Reproduces the reference's QA semantics exactly (validated against its golden
fixture — ``/root/reference/test/qa/test_quality_metrics.py:22-46`` expects
V 0.88 / OC 0.1 / UC 0.4 / profiles 3.5 / score 2.7):

- pairwise accuracy/precision/recall/F1 on labeled pairs — the acceptance metric
  behind the F1 ≥ 0.99 gate (``am_combiner/qa/acceptance_metrics.py:7-74``), made
  exhaustive/deterministic instead of sampled;
- per-block homogeneity/completeness/V from the contingency table, rounded to 2dp
  (``qa/quality_metrics.py:174-197`` calls sklearn; re-derived here from the
  entropy definitions — no sklearn, all Spark aggregations);
- per-predicted-cluster support / is_over / is_under
  (``qa/quality_metrics.py:200-244``): is_over ⇔ cluster touches >1 true cluster;
  is_under ⇔ some touched true cluster has members outside the predicted cluster;
- OC/UC rates, profiles-per-OC, score-to-minimize with the reference's weights
  (``qa/quality_metrics.py:247-319``), every intermediate rounded to 2dp exactly
  where the reference rounds;
- the final report = unweighted per-block column means
  (``qa/quality_control.py:7-85``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Pairwise acceptance metrics (the F1 gate)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# Per-block quality (reference-exact)
# --------------------------------------------------------------------------

def cluster_support_flags(
    truth_pred: DataFrame,
    block_col: str = "blocking_key",
    truth_col: str = "ground_truth",
    pred_col: str = "cluster_id",
) -> DataFrame:
    """Per (block, predicted cluster): support, is_over, is_under.

    support  = number of distinct true clusters touched (ref quality_metrics.py:232)
    is_over  ⇔ support > 1                              (ref :239)
    is_under ⇔ some touched true cluster has members outside this predicted
               cluster (ref :234-238 — "missing urls")
    """
    n_tp = truth_pred.groupBy(block_col, pred_col, truth_col).agg(
        F.count("*").alias("_n_tp")
    )
    n_t = truth_pred.groupBy(block_col, truth_col).agg(F.count("*").alias("_n_t"))
    joined = n_tp.join(n_t, [block_col, truth_col])
    return joined.groupBy(block_col, pred_col).agg(
        F.countDistinct(truth_col).alias("support"),
        (F.countDistinct(truth_col) > 1).alias("is_over"),
        F.max((F.col("_n_t") > F.col("_n_tp")).cast("int")).cast("boolean").alias("is_under"),
    )


def _per_block_entropy_scores(
    truth_pred: DataFrame, block_col: str, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-block homogeneity/completeness/V from entropies (matches sklearn's
    homogeneity_completeness_v_measure), each rounded to 2dp like the reference."""
    n_b = truth_pred.groupBy(block_col).agg(F.count("*").alias("_n"))
    n_t = truth_pred.groupBy(block_col, truth_col).agg(F.count("*").alias("_nt"))
    n_p = truth_pred.groupBy(block_col, pred_col).agg(F.count("*").alias("_np"))
    n_tp = truth_pred.groupBy(block_col, truth_col, pred_col).agg(
        F.count("*").alias("_ntp")
    )
    h_c = (
        n_t.join(n_b, block_col)
        .groupBy(block_col)
        .agg(
            (-F.sum((F.col("_nt") / F.col("_n")) * F.log(F.col("_nt") / F.col("_n"))))
            .alias("_h_c")
        )
    )
    h_k = (
        n_p.join(n_b, block_col)
        .groupBy(block_col)
        .agg(
            (-F.sum((F.col("_np") / F.col("_n")) * F.log(F.col("_np") / F.col("_n"))))
            .alias("_h_k")
        )
    )
    cond = (
        n_tp.join(n_t, [block_col, truth_col])
        .join(n_p, [block_col, pred_col])
        .join(n_b, block_col)
    )
    h_cond = cond.groupBy(block_col).agg(
        (-F.sum((F.col("_ntp") / F.col("_n")) * F.log(F.col("_ntp") / F.col("_np"))))
        .alias("_h_c_k"),
        (-F.sum((F.col("_ntp") / F.col("_n")) * F.log(F.col("_ntp") / F.col("_nt"))))
        .alias("_h_k_c"),
    )
    # v is computed from the UNROUNDED h/c (reference rounds h, c, v each
    # independently of one another, quality_metrics.py:195-197)
    return (
        h_c.join(h_k, block_col)
        .join(h_cond, block_col)
        .withColumn(
            "_hom",
            F.when(F.col("_h_c") == 0, F.lit(1.0)).otherwise(
                1.0 - F.col("_h_c_k") / F.col("_h_c")
            ),
        )
        .withColumn(
            "_com",
            F.when(F.col("_h_k") == 0, F.lit(1.0)).otherwise(
                1.0 - F.col("_h_k_c") / F.col("_h_k")
            ),
        )
        .select(
            block_col,
            F.round("_hom", 2).alias("homogeneity"),
            F.round("_com", 2).alias("completeness"),
            F.round(
                F.when((F.col("_hom") + F.col("_com")) == 0, F.lit(0.0)).otherwise(
                    2 * F.col("_hom") * F.col("_com") / (F.col("_hom") + F.col("_com"))
                ),
                2,
            ).alias("v_measure"),
        )
    )


def validate_blocks(
    truth_pred: DataFrame,
    block_col: str = "blocking_key",
    truth_col: str = "ground_truth",
    pred_col: str = "cluster_id",
) -> DataFrame:
    """Per-block quality frame — the distributed ``validate_name`` loop
    (``qa/quality_metrics.py:33-79`` iterates names; here one groupBy pipeline).

    Columns: homogeneity, completeness, v_measure, count, oc_rate, uc_rate,
    profiles_per_oc, profiles_created, profiles_true, score_to_minimize.
    """
    flags = cluster_support_flags(truth_pred, block_col, truth_col, pred_col)
    per_block = flags.groupBy(block_col).agg(
        F.count("*").alias("profiles_created"),
        F.round(
            F.sum(F.col("is_over").cast("int")) / F.count("*"), 2
        ).alias("oc_rate"),
        F.round(
            F.sum(F.col("is_under").cast("int")) / F.count("*"), 2
        ).alias("uc_rate"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("is_over"), F.col("support"))).cast("double")
                / F.sum(F.col("is_over").cast("int")),
                F.lit(0.0),
            ),
            2,
        ).alias("profiles_per_oc"),
    )
    sizes = truth_pred.groupBy(block_col).agg(
        F.count("*").alias("count"),
        F.countDistinct(truth_col).alias("profiles_true"),
    )
    hcv = _per_block_entropy_scores(truth_pred, block_col, truth_col, pred_col)
    out = per_block.join(sizes, block_col).join(hcv, block_col)
    score = F.round(
        3.4 * F.col("uc_rate")
        + 8.4 * F.col("oc_rate")
        + 0.4 * F.col("profiles_per_oc")
        + 0.8
        * F.greatest(
            F.col("profiles_created") - F.col("profiles_true"), F.lit(0)
        ).cast("double")
        / F.col("profiles_true"),
        2,
    )
    return out.withColumn("score_to_minimize", score)


REPORT_COLS = [
    "homogeneity",
    "completeness",
    "v_measure",
    "oc_rate",
    "uc_rate",
    "profiles_per_oc",
    "profiles_created",
    "profiles_true",
    "score_to_minimize",
]


def validation_report(
    truth_pred: DataFrame,
    block_col: str = "blocking_key",
    truth_col: str = "ground_truth",
    pred_col: str = "cluster_id",
    weights_col: str | None = None,
) -> dict[str, float]:
    """Per-block means — the reference's final report dict
    (``qa/quality_control.py:55-85``). ``weights_col`` names a column of the
    per-block quality frame (e.g. ``count`` to weight blocks by record count):
    the reference's ``np.average(data, weights=...)`` becomes Σ(x·w)/Σ(w) with
    null metric rows excluded per column, rounded to 2dp like the reference."""
    q = validate_blocks(truth_pred, block_col, truth_col, pred_col)
    if weights_col is None:
        aggs = [F.avg(c).alias(c) for c in REPORT_COLS]
    else:
        w = F.col(weights_col).cast("double")
        aggs = [
            (
                F.sum(F.when(F.col(c).isNotNull(), F.col(c) * w))
                / F.sum(F.when(F.col(c).isNotNull(), w))
            ).alias(c)
            for c in REPORT_COLS
        ]
    row = q.agg(*aggs).collect()[0]
    return {c: round(float(row[c]), 2) for c in REPORT_COLS}


def initial_name_checks(
    validation: DataFrame,
    clustering_results: DataFrame,
    block_col: str = "blocking_key",
) -> DataFrame:
    """Validation-vs-results block diagnostics — the reference's
    ``perform_initial_name_checks`` (``qa/quality_metrics.py:82-122``) as one
    full-outer aggregation join instead of driver-side value_counts loops.

    Per block: validation_count, actual_count, and a status —
    ``ok`` (counts match), ``count_mismatch``, ``missing_from_validation``
    (clustered block absent from the validation set — the reference prints and
    skips these), ``missing_from_results``.
    """
    v = validation.groupBy(block_col).agg(F.count("*").alias("validation_count"))
    a = clustering_results.groupBy(block_col).agg(F.count("*").alias("actual_count"))
    joined = v.join(a, block_col, "full_outer")
    status = (
        F.when(F.col("validation_count").isNull(), F.lit("missing_from_validation"))
        .when(F.col("actual_count").isNull(), F.lit("missing_from_results"))
        .when(
            F.col("validation_count") != F.col("actual_count"),
            F.lit("count_mismatch"),
        )
        .otherwise(F.lit("ok"))
    )
    return joined.select(
        block_col, "validation_count", "actual_count", status.alias("status")
    )


def homogeneity_completeness_v(
    truth_pred: DataFrame, truth_col: str = "ground_truth", pred_col: str = "cluster_id"
) -> dict[str, float]:
    """Global (single-block) H/C/V — convenience wrapper over the per-block job."""
    one = truth_pred.withColumn("_all", F.lit("all"))
    row = _per_block_entropy_scores(one, "_all", truth_col, pred_col).collect()
    if not row:
        return {"homogeneity": 1.0, "completeness": 1.0, "v_measure": 1.0}
    r = row[0]
    return {
        "homogeneity": r["homogeneity"],
        "completeness": r["completeness"],
        "v_measure": r["v_measure"],
    }
