"""Cross-validation sensitivity analysis — reference semantics
(qa/cross_validation.py)."""

from __future__ import annotations

import math

import pytest

from entity_resolution_spark.qa.sensitivity import (
    link_sensitivity_subsample,
    name_sensitivity_analysis,
    seeded_draw,
)


def _clusters(spark, n_blocks=6, per_block=8):
    rows = []
    for b in range(n_blocks):
        for i in range(per_block):
            gt = f"b{b}e{i % 2}"
            rows.append((f"b{b}r{i}", f"blk{b}", gt, gt))
    return spark.createDataFrame(
        rows, ["unique_id", "blocking_key", "cluster_id", "ground_truth"]
    )


def test_seeded_draw_quota_and_determinism(spark):
    df = spark.createDataFrame([(f"r{i}",) for i in range(10)], ["unique_id"])
    d1 = {r["unique_id"] for r in seeded_draw(df, "unique_id", 0.3, run=1).collect()}
    d2 = {r["unique_id"] for r in seeded_draw(df, "unique_id", 0.3, run=1).collect()}
    d3 = {r["unique_id"] for r in seeded_draw(df, "unique_id", 0.3, run=2).collect()}
    assert d1 == d2                       # seeded → reproducible
    assert len(d1) == math.ceil(10 * 0.3)  # ceil(n·ratio), random_draw parity
    assert d1 != d3                       # different run → different subsample


def test_seeded_draw_rejects_bad_ratio(spark):
    df = spark.createDataFrame([("a",)], ["unique_id"])
    with pytest.raises(ValueError):
        seeded_draw(df, "unique_id", 0.0, 0)
    with pytest.raises(ValueError):
        seeded_draw(df, "unique_id", 1.0, 0)


def test_name_sensitivity_perfect_clustering(spark):
    reports = name_sensitivity_analysis(_clusters(spark), resamplings=3, holdout_ratio=0.5)
    assert len(reports) == 3
    for rep in reports:
        assert rep["homogeneity"] == 1.0
        assert rep["v_measure"] == 1.0
        assert rep["oc_rate"] == 0.0


def test_link_sensitivity_per_block_quota(spark):
    df = _clusters(spark, n_blocks=3, per_block=8)
    sub = link_sensitivity_subsample(df, 0.25, run=0)
    counts = {r["blocking_key"]: r["n"] for r in
              sub.groupBy("blocking_key").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"blk0", "blk1", "blk2"}
    assert all(v == 2 for v in counts.values())  # ceil(8·0.25) per block

    sub_g = link_sensitivity_subsample(df, 0.25, run=0, global_link_resampling=True)
    assert sub_g.count() == math.ceil(24 * 0.25)
