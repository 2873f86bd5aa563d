"""ColourNegativeEdgesSplitter — reference-semantics tests
(am_combiner/splitters/common.py:130-178)."""

from __future__ import annotations

from entity_resolution_spark.operators.coloring import (
    colour_component,
    colour_negative_edges_split,
)


def test_colour_component_negative_pair_split():
    """A negative edge forces two colours; proper colouring holds."""
    ids = ["a", "b"]
    colours = colour_component(ids, pos_edges=[(0, 1, 0.9)], neg_edges=[(0, 1)])
    assert colours[0] != colours[1]


def test_colour_component_isolated_joins_best_mean_edge():
    """Reference common.py:166-173: a record with no negative edge joins the
    colour class with the highest MEAN positive weight toward it."""
    # a—b negative; c isolated in the negative graph, strongly tied to b
    ids = ["a", "b", "c"]
    pos = [(0, 2, 0.1), (1, 2, 0.95)]
    neg = [(0, 1)]
    colours = colour_component(ids, pos, neg)
    assert colours[0] != colours[1]
    assert colours[2] == colours[1]


def test_colour_component_triangle_three_colours():
    ids = ["a", "b", "c"]
    neg = [(0, 1), (1, 2), (0, 2)]
    colours = colour_component(ids, [], neg)
    assert len(set(colours)) == 3


def test_colour_component_deterministic_tiebreak():
    """Equal negative degrees → order fixed by record id (the deterministic
    re-expression of nx largest_first's insertion-order tie-break)."""
    ids = ["x2", "x1"]
    c1 = colour_component(ids, [], [(0, 1)])
    c2 = colour_component(ids[::-1], [], [(0, 1)])
    # colouring is on sorted-by-id order: x1 gets colour 0 both times
    assert c1[1] == c2[0] == 0
    assert c1[0] == c2[1] == 1


def test_split_spark_end_to_end(spark):
    """Components without internal negatives keep their CC label; dirty
    components are recoloured with the negative pair separated."""
    pos = spark.createDataFrame(
        [
            ("a", "b", 0.9), ("b", "c", 0.9),      # dirty component (a~b neg)
            ("p", "q", 0.8),                        # clean component
        ],
        ["id_a", "id_b", "score"],
    )
    neg = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    out = {r["unique_id"]: r["cluster_id"]
           for r in colour_negative_edges_split(pos, neg).collect()}
    assert out["p"] == out["q"] == "p"          # untouched, min-id CC label
    assert out["a"] != out["b"]                  # negative edge enforced
    assert out["c"] in (out["a"], out["b"])      # isolated → best mean edge
    assert out["c"] == out["b"]                  # tied to b (0.9) not a (0)
    assert len(set(out.values())) == 3


def test_split_cross_component_negative_ignored(spark):
    pos = spark.createDataFrame(
        [("a", "b", 0.9), ("x", "y", 0.9)], ["id_a", "id_b", "score"]
    )
    neg = spark.createDataFrame([("a", "x")], ["id_a", "id_b"])
    out = {r["unique_id"]: r["cluster_id"]
           for r in colour_negative_edges_split(pos, neg).collect()}
    assert out["a"] == out["b"] == "a"
    assert out["x"] == out["y"] == "x"
