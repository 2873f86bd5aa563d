"""Cross-validation / sensitivity analysis (reference ``qa/cross_validation.py``).

Reference:
- ``random_draw`` (13-36): draw ``ceil(n·ratio)`` elements without replacement
  (global numpy RNG — order-dependent, the reason the survey parked this
  module);
- ``get_name_sensitivity_analysis`` (38-67): resample the BLOCKS ``resamplings``
  times, re-compute the clustering-quality report per subsample → a frame of
  report rows whose spread is the block-level sensitivity;
- ``get_link_sensitivity_subsample`` (70-111): hold out a fraction of RECORDS
  (globally or per block) so the caller can re-resolve + re-validate — the
  record-level sensitivity.

Deterministic re-expression: a draw of ``ceil(n·ratio)`` without replacement
is a rank over ``xxhash64(key, run)`` truncated at the quota — seeded,
partition-invariant, and pure SQL (one window per run). The quality report
reuses :func:`entity_resolution_spark.qa.metrics.validation_report` — the same
entropy-derived per-block metrics the reference's ``ClusteringQualityReporter``
computes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolution_spark.qa.metrics import validation_report


def seeded_draw(
    df: DataFrame, key_col: str, holdout_ratio: float, run: int,
    per_block_col: str | None = None,
) -> DataFrame:
    """Keep ``ceil(n·ratio)`` rows, ranked by ``xxhash64(key, run)`` —
    ``random_draw`` (cross_validation.py:13-36) with a seeded hash in place of
    the global RNG. ``per_block_col`` draws the quota inside each block
    (``global_link_resampling=False``)."""
    if holdout_ratio <= 0 or holdout_ratio >= 1:
        raise ValueError("holdout_ratio must be strictly between 0 and 1")
    part = [per_block_col] if per_block_col else []
    w = Window.partitionBy(*part).orderBy(F.xxhash64(F.col(key_col), F.lit(run)), key_col)
    n = Window.partitionBy(*part)
    ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(n)
    )
    return ranked.where(
        F.col("_rk") <= F.ceil(F.col("_n") * F.lit(holdout_ratio))
    ).drop("_rk", "_n")


def name_sensitivity_analysis(
    truth_pred: DataFrame,
    resamplings: int,
    holdout_ratio: float,
    block_col: str = "blocking_key",
    weights_col: str | None = None,
) -> list[dict]:
    """Block-holdout sensitivity (cross_validation.py:38-67): per resample,
    keep a seeded fraction of blocks and recompute the validation report.
    Returns one report dict per resample (a tiny driver-side list, like the
    reference's DataFrame of reports)."""
    blocks = truth_pred.select(block_col).distinct()
    out = []
    for r in range(resamplings):
        kept = seeded_draw(blocks, block_col, holdout_ratio, r)
        sub = truth_pred.join(F.broadcast(kept), block_col)
        rep = validation_report(sub, block_col=block_col, weights_col=weights_col)
        rep["resample"] = r
        out.append(rep)
    return out


def link_sensitivity_subsample(
    records: DataFrame,
    holdout_ratio: float,
    run: int = 0,
    id_col: str = "unique_id",
    block_col: str = "blocking_key",
    global_link_resampling: bool = False,
) -> DataFrame:
    """Record-holdout subsample (cross_validation.py:70-111): the caller
    re-resolves and re-validates on the returned subset. ``global`` draws one
    corpus-wide quota; otherwise the quota is per block (the reference's two
    branches)."""
    return seeded_draw(
        records, id_col, holdout_ratio, run,
        per_block_col=None if global_link_resampling else block_col,
    )
