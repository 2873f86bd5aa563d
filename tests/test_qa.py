"""Golden QA tests: the reference's two-name fixture must reproduce its exact
report (V 0.88, OC 0.1, UC 0.4, profiles 3.5, score 2.7 —
/root/reference/test/qa/test_quality_metrics.py:22-46)."""

from __future__ import annotations

import pytest

from entity_resolution_spark.qa.metrics import (
    cluster_support_flags,
    pairwise_f1,
    validate_blocks,
    validation_report,
)

NAME = "Some Name"
OTHER = "Some OTHER Name"

# (block, unique_id, ground_truth, cluster_id) — the reference conftest fixture
FIXTURE = [
    (NAME, "url.1", 1, 1),
    (NAME, "url.2", 2, 2),
    (NAME, "url.3", 2, 3),
    (NAME, "url.4", 3, 1),
    (NAME, "url.5", 4, 4),
    (NAME, "url.6", 4, 4),
    (NAME, "url.7", 4, 5),
    (OTHER, "url.1", 1, 1),
    (OTHER, "url.2", 2, 2),
]


@pytest.fixture(scope="module")
def truth_pred(spark):
    return spark.createDataFrame(
        FIXTURE, "blocking_key string, unique_id string, ground_truth long, cluster_id long"
    )


def test_cluster_support_flags_golden(spark, truth_pred):
    flags = {
        (r["blocking_key"], r["cluster_id"]): (r["support"], r["is_over"], r["is_under"])
        for r in cluster_support_flags(truth_pred).collect()
    }
    # reference validate_name expectations (test_quality_metrics.py:49-90)
    assert flags[(NAME, 1)] == (2, True, False)
    assert flags[(NAME, 2)] == (1, False, True)
    assert flags[(NAME, 3)] == (1, False, True)
    assert flags[(NAME, 4)] == (1, False, True)
    assert flags[(NAME, 5)] == (1, False, True)
    assert flags[(OTHER, 1)] == (1, False, False)
    assert flags[(OTHER, 2)] == (1, False, False)


def test_validate_blocks_golden(spark, truth_pred):
    rows = {r["blocking_key"]: r.asDict() for r in validate_blocks(truth_pred).collect()}
    name = rows[NAME]
    assert name["homogeneity"] == 0.84
    assert name["completeness"] == 0.70
    assert name["v_measure"] == 0.76
    assert name["count"] == 7
    assert name["oc_rate"] == 0.2
    assert name["uc_rate"] == 0.8
    assert name["profiles_per_oc"] == 2.0
    assert name["profiles_created"] == 5
    assert name["profiles_true"] == 4
    assert name["score_to_minimize"] == 5.4
    other = rows[OTHER]
    assert (other["homogeneity"], other["completeness"], other["v_measure"]) == (1.0, 1.0, 1.0)
    assert other["score_to_minimize"] == 0.0


def test_validation_report_golden(spark, truth_pred):
    report = validation_report(truth_pred)
    assert report["homogeneity"] == 0.92
    assert report["completeness"] == 0.85
    assert report["v_measure"] == 0.88
    assert report["oc_rate"] == 0.1
    assert report["uc_rate"] == 0.4
    assert report["profiles_per_oc"] == 1.0
    assert report["profiles_created"] == 3.5
    assert report["profiles_true"] == 3.0
    assert report["score_to_minimize"] == 2.7


def test_pairwise_f1_perfect_and_degenerate(spark):
    lp = spark.createDataFrame(
        [("b", "u1", "u2", True), ("b", "u1", "u3", False)],
        "blocking_key string, unique_id_a string, unique_id_b string, label boolean",
    )
    good = spark.createDataFrame(
        [("u1", 10), ("u2", 10), ("u3", 20)], "unique_id string, cluster_id long"
    )
    m = pairwise_f1(lp, good)
    assert m["f1"] == 1.0 and m["tn"] == 1.0
    allone = spark.createDataFrame(
        [("u1", 1), ("u2", 1), ("u3", 1)], "unique_id string, cluster_id long"
    )
    m2 = pairwise_f1(lp, allone)
    assert m2["recall"] == 1.0 and m2["precision"] == 0.5


def test_validation_report_weighted(spark, truth_pred):
    """np.average(weights=count) analog (qa/quality_control.py:55-85): the NAME
    block (7 records) dominates the OTHER block (2 records)."""
    report = validation_report(truth_pred, weights_col="count")
    assert report["homogeneity"] == round((0.84 * 7 + 1.0 * 2) / 9, 2)
    assert report["completeness"] == round((0.70 * 7 + 1.0 * 2) / 9, 2)
    assert report["v_measure"] == round((0.76 * 7 + 1.0 * 2) / 9, 2)
    assert report["oc_rate"] == round((0.2 * 7) / 9, 2)
    assert report["uc_rate"] == round((0.8 * 7) / 9, 2)
    assert report["score_to_minimize"] == round((5.4 * 7) / 9, 2)


def test_initial_name_checks(spark):
    from entity_resolution_spark.qa.metrics import initial_name_checks

    validation = spark.createDataFrame(
        [("A", "u1"), ("A", "u2"), ("B", "u3"), ("D", "u7"), ("D", "u8")],
        "blocking_key string, unique_id string",
    )
    results = spark.createDataFrame(
        [("A", "u1"), ("A", "u2"), ("C", "u4"), ("D", "u7")],
        "blocking_key string, unique_id string",
    )
    got = {
        r["blocking_key"]: (r["validation_count"], r["actual_count"], r["status"])
        for r in initial_name_checks(validation, results).collect()
    }
    assert got["A"] == (2, 2, "ok")
    assert got["B"] == (1, None, "missing_from_results")
    assert got["C"] == (None, 1, "missing_from_validation")
    assert got["D"] == (2, 1, "count_mismatch")


def test_f1_pair_count_bigint_safe(spark):
    """The F1-gate pair counter must survive truth groups past the naive
    n·(n−1) bigint cliff (~3.04e9): at n = 2^32 the raw product is ~1.8e19
    > 2^63−1, while the halved-first form fits exactly.  Constructed
    group-size frame — no real rows needed (VERDICT r4 ask #4)."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.queries import pair_count

    n_even = 2**32  # the largest n whose pair count itself fits in bigint
    n_odd = 2**32 - 1
    df = spark.createDataFrame([(n_even,), (n_odd,), (1,), (2,), (3,)], "n bigint")
    got = {
        r["n"]: r["p"]
        for r in df.select("n", pair_count(F.col("n")).alias("p")).collect()
    }
    assert got[n_even] == n_even * (n_even - 1) // 2
    assert got[n_odd] == n_odd * (n_odd - 1) // 2
    assert got[1] == 0 and got[2] == 1 and got[3] == 3
