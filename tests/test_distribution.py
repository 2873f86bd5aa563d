"""Sampled acceptance distribution + improvements — reference-semantics tests
(qa/acceptance_metrics.py, qa/quality_metrics.py:344-365, qa/utils.py:56-103)."""

from __future__ import annotations

import math

import pandas as pd

from entity_resolution_spark.qa.distribution import (
    calculate_improvements,
    check_acceptance_distribution,
)


def _perfect_clusters(spark, n_blocks=4, per_block=10):
    rows = []
    for b in range(n_blocks):
        for i in range(per_block):
            gt = f"b{b}e{i % 2}"          # two true entities per block
            rows.append((f"b{b}r{i:02d}", f"blk{b}", gt, gt))
    return spark.createDataFrame(
        rows, ["unique_id", "blocking_key", "cluster_id", "ground_truth"]
    )


def test_perfect_clustering_scores_one(spark):
    df = _perfect_clusters(spark)
    out = check_acceptance_distribution(df, sampling_rate=0.4, number_of_runs=3)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["pairs_sampled"] > 0
        assert r["accuracy"] == 1.0
        assert abs(r["precision"] - 1.0) < 1e-12
        assert abs(r["recall"] - 1.0) < 1e-12
        assert abs(r["fscore"] - 1.0) < 1e-12


def test_runs_differ_but_are_deterministic(spark):
    """Different runs sample different pairs (distribution), but re-running the
    same check reproduces it exactly (seeded hashing, no RNG state)."""
    rows = [
        (f"r{i:02d}", "blk", "c0" if i < 10 else f"c{i}", "g0" if i < 12 else f"g{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, ["unique_id", "blocking_key", "cluster_id", "ground_truth"]
    )
    o1 = check_acceptance_distribution(df, 0.5, 4).collect()
    o2 = check_acceptance_distribution(df, 0.5, 4).collect()
    assert sorted(map(tuple, o1)) == sorted(map(tuple, o2))
    accs = {round(r["accuracy"], 6) for r in o1}
    assert len(accs) >= 2  # sampling noise is visible across runs


def test_zero_pair_runs_report_zeroed_rows(spark):
    """Blocks too small to floor to one sampled pair must still yield one row
    per run, zeroed — not a DIVIDE_BY_ZERO under ANSI mode (the class weights
    divide by the run's pair count)."""
    df = spark.createDataFrame(
        [("a", "b1", "c1", "g1"), ("b", "b1", "c1", "g1")],
        ["unique_id", "blocking_key", "cluster_id", "ground_truth"],
    )
    rows = check_acceptance_distribution(df, sampling_rate=0.1, number_of_runs=2).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["pairs_sampled"] == 0
        assert r["accuracy"] == 0.0
        assert r["precision"] == 0.0
        assert r["recall"] == 0.0
        assert r["fscore"] == 0.0


def test_calculate_improvements_reference_semantics():
    frame = pd.DataFrame(
        {"f1": [0.8, 0.4], "oc": [0.0, 0.2], "note": ["x", "y"]},
        index=["tfidf", "kmeans"],
    )
    out = calculate_improvements(frame, ["tfidf"], ["tfidf", "kmeans"])
    by = {(d["reference"], d["combiner"]): d for d in out}
    assert by[("tfidf", "kmeans")]["f1"] == 0.5
    assert by[("tfidf", "tfidf")]["f1"] == 1.0
    assert by[("tfidf", "kmeans")]["oc"] == math.inf   # x/0 → inf
    assert math.isnan(by[("tfidf", "tfidf")]["oc"])    # 0/0 → nan
    assert "note" not in by[("tfidf", "kmeans")]        # non-numeric skipped


def test_calculate_improvements_all_keyword():
    frame = pd.DataFrame({"f1": [1.0, 0.5]}, index=["a", "b"])
    out = calculate_improvements(frame, ["all"])
    assert len(out) == 4


def test_threshold_search_reference_sequence():
    # golden replay of the reference recursion (features/nn/helpers.py:48-142)
    from entity_resolution_spark.qa.distribution import threshold_search

    tx, ty = threshold_search(lambda t: (t - 0.3) ** 2)
    assert tx == [1.0, 0.0, 0.5, 0.25, 0.375, 0.3125, 0.28125]
    assert [round(y, 6) for y in ty] == [
        0.49, 0.09, 0.04, 0.0025, 0.005625, 0.000156, 0.000352,
    ]
    # hop_num + 2 evaluations, best probe near the optimum
    assert len(tx) == 5 + 2
    assert abs(tx[ty.index(min(ty))] - 0.3) < 0.05

    tx2, _ = threshold_search(lambda t: abs(t - 0.8), hop_num=4)
    assert tx2 == [1.0, 0.0, 0.5, 0.75, 0.875, 0.8125]
    # no state leaks between calls (the reference's mutable-default bug)
    tx3, _ = threshold_search(lambda t: abs(t - 0.8), hop_num=4)
    assert tx3 == tx2


def test_cluster_distribution_summary_reference_semantics(spark):
    # hand-computed DataframeDistributionSummariser attributes
    # (utils/distributions.py:56-130): name A has 2 clusters (sizes 2, 1),
    # name B has 1 cluster (size 3), name C has 2 clusters (sizes 1, 1)
    from entity_resolution_spark.qa.distribution import cluster_distribution_summary

    df = spark.createDataFrame(
        [
            ("A", "a1", "u1"), ("A", "a1", "u2"), ("A", "a2", "u3"),
            ("B", "b1", "u4"), ("B", "b1", "u5"), ("B", "b1", "u6"),
            ("C", "c1", "u7"), ("C", "c2", "u8"),
        ],
        ["blocking_key", "cluster_id", "unique_id"],
    )
    per_name, weights, per_size = cluster_distribution_summary(df)
    assert {r["blocking_key"]: r["n_clusters"] for r in per_name.collect()} == {
        "A": 2, "B": 1, "C": 2,
    }
    assert {r["n_clusters"]: r["n_names"] for r in weights.collect()} == {2: 2, 1: 1}
    got = {
        (r["n_clusters"], r["n_articles"]): r["weight"] for r in per_size.collect()
    }
    # names with 2 clusters contribute clusters of sizes {2,1} (A) and {1,1} (C)
    assert got == {(2, 2): 1, (2, 1): 3, (1, 3): 1}
