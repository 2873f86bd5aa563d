"""Golden tests for the feature-intersection adjacency family.

Expected weights come from the reference's own golden matrices
(``/root/reference/test/combiners/test_common_combiners.py``): an n×n symmetric
matrix with entry w(i,j) corresponds to our undirected edge list with one row per
(i<j) pair and weight w — i.e. matrix ``sum() == 2 · Σ edge weights``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.adjacency import (
    feature_intersection_edges,
    multi_feature_negative_edges,
    negative_edges_disjoint_sets,
    negative_edges_numeric_distance,
)


def _records(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def edges_dict(df):
    return {(r["id_a"], r["id_b"]): r["weight"] for r in df.collect()}


def test_single_feature_golden(spark):
    # test_intersection_on_lower_case: [[0,2,1],[2,0,1],[1,1,0]]
    recs = _records(
        spark,
        [
            ("r1", ["john", "peter", "flow"]),
            ("r2", ["peter", "flow", "kl"]),
            ("r3", ["flow"]),
        ],
        "unique_id string, person array<string>",
    )
    got = edges_dict(feature_intersection_edges(recs, ["person"]))
    assert got == {("r1", "r2"): 2.0, ("r1", "r3"): 1.0, ("r2", "r3"): 1.0}


def test_no_overlap_empty(spark):
    recs = _records(
        spark,
        [("r1", ["1", "2"]), ("r2", ["3", "4"])],
        "unique_id string, person array<string>",
    )
    assert feature_intersection_edges(recs, ["person"]).count() == 0


def test_case_sensitive(spark):
    recs = _records(
        spark,
        [("r1", ["peter", "john"]), ("r2", ["Peter", "John"])],
        "unique_id string, person array<string>",
    )
    assert feature_intersection_edges(recs, ["person"]).count() == 0


def test_duplicate_values_collapse(spark):
    # permutations(set(ids)) semantics: duplicated value counts once
    recs = _records(
        spark,
        [("r1", ["x", "x", "y"]), ("r2", ["x", "y", "y"])],
        "unique_id string, person array<string>",
    )
    got = edges_dict(feature_intersection_edges(recs, ["person"]))
    assert got == {("r1", "r2"): 2.0}


def test_multi_feature_golden(spark):
    # expected sum matrix [[0,2,3],[2,0,1],[3,1,0]]
    recs = _records(
        spark,
        [
            ("r1", ["john", "peter", "flow"], ["apple", "netflix", "amazon"]),
            ("r2", ["apple", "flow", "kl"], ["apple"]),
            ("r3", ["flow"], ["netflix", "amazon"]),
        ],
        "unique_id string, person array<string>, org array<string>",
    )
    got = edges_dict(feature_intersection_edges(recs, ["person", "org"]))
    assert got == {("r1", "r2"): 2.0, ("r1", "r3"): 3.0, ("r2", "r3"): 1.0}
    # per-feature variant (as_list=True analog)
    per = feature_intersection_edges(recs, ["person", "org"], per_feature=True)
    by_feat = {(r["feature"], r["id_a"], r["id_b"]): r["weight"] for r in per.collect()}
    assert by_feat[("person", "r1", "r2")] == 1.0
    assert by_feat[("org", "r1", "r3")] == 2.0
    assert ("org", "r2", "r3") not in by_feat


def test_inverse_degree_weighting(spark):
    # value shared by all 3 records has df=3 → contributes 1/3 per pair
    recs = _records(
        spark,
        [("r1", ["common"]), ("r2", ["common"]), ("r3", ["common"])],
        "unique_id string, person array<string>",
    )
    got = edges_dict(feature_intersection_edges(recs, ["person"], inverse_degree=True))
    for w in got.values():
        assert w == pytest.approx(1 / 3)


@pytest.mark.parametrize(
    ("sets", "distance", "expected_pairs"),
    [
        ([[1992], [1993, 1994], [1995]], 1, 1),     # matrix sum 2 → 1 edge
        ([[1992, 1993, 1994, 1995, 1996], [1992]], 0, 0),
        ([[1992, 1993, 1994, 1995, 1996], [1999]], 0, 1),
        ([[1992, 1993, 1994], [1995, 1996]], 0, 1),
    ],
)
def test_negative_numeric_distance_golden(spark, sets, distance, expected_pairs):
    rows = [(f"r{i}", s) for i, s in enumerate(sets)]
    recs = _records(spark, rows, "unique_id string, yob array<int>")
    got = negative_edges_numeric_distance(recs, "yob", distance)
    assert got.count() == expected_pairs


@pytest.mark.parametrize(
    ("sets", "expected_pairs"),
    [
        ([["FR", "GR"], ["FR"]], 0),
        ([["FR", "GR"], ["FR"], ["GR"]], 1),        # matrix sum 2 → 1 edge
        ([["FR", "GR"], ["FR"], []], 0),            # empty set: no negative evidence
    ],
)
def test_negative_disjoint_golden(spark, sets, expected_pairs):
    rows = [(f"r{i}", s) for i, s in enumerate(sets)]
    recs = _records(spark, rows, "unique_id string, country array<string>")
    assert negative_edges_disjoint_sets(recs, "country").count() == expected_pairs


def test_multi_negative_golden(spark):
    # YOB d=2 no edge; PRIMARY disjoint → one edge with weight 1 (matrix sum 2)
    recs = _records(
        spark,
        [("r0", [1992], ["FR"]), ("r1", [1993, 1994], ["GR"])],
        "unique_id string, yob array<int>, primary array<string>",
    )
    got = edges_dict(
        multi_feature_negative_edges(recs, [("yob", 2.0), ("primary", None)])
    )
    assert got == {("r0", "r1"): 1.0}
