"""AnnotationsCombiner semantics: labeled-pair overrides on scored edges
(reference combiners/annotation.py:41-67; ground truth utils/data.py:589-620)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.annotations import (
    annotate_and_cluster,
    apply_label_overrides,
    ground_truth_from_annotations,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "id_a string, id_b string, score double")


def _labels(spark, rows):
    return spark.createDataFrame(rows, "id_a string, id_b string, label boolean")


def test_positive_label_forces_edge_negative_deletes(spark):
    edges = _edges(spark, [("r1", "r2", 0.9), ("r4", "r5", 0.8)])
    labeled = _labels(
        spark,
        [
            ("r2", "r1", False),  # reversed orientation: still deletes r1–r2
            ("r3", "r4", True),   # no scored edge: forced in at 1.0
        ],
    )
    out = apply_label_overrides(edges, labeled)
    got = {(r["id_a"], r["id_b"]): r["score"] for r in out.collect()}
    assert ("r1", "r2") not in got
    assert got[("r3", "r4")] == 1.0
    assert got[("r4", "r5")] == 0.8


def test_conflicting_labels_negative_wins(spark):
    edges = _edges(spark, [("r1", "r2", 0.9)])
    labeled = _labels(spark, [("r1", "r2", True), ("r2", "r1", False)])
    out = apply_label_overrides(edges, labeled)
    assert out.count() == 0


def test_annotation_round_trip_clusters(spark):
    """The reference's annotation round trip: scoring proposes {r1,r2} and
    {r4,r5}; annotations split the first and bridge r2–r3; CC yields the
    annotated partition and every record keeps exactly one cluster."""
    vertices = spark.createDataFrame(
        [("r1",), ("r2",), ("r3",), ("r4",), ("r5",), ("r6",)], "unique_id string"
    )
    edges = _edges(spark, [("r1", "r2", 0.9), ("r4", "r5", 0.8)])
    labeled = _labels(spark, [("r1", "r2", False), ("r2", "r3", True)])
    out = annotate_and_cluster(edges, labeled, vertices)
    got = {r["unique_id"]: r["cluster_rep"] for r in out.collect()}
    assert len(got) == 6
    assert got["r1"] != got["r2"]              # negative split
    assert got["r2"] == got["r3"]              # forced positive merge
    assert got["r4"] == got["r5"]              # scored edge survives
    assert got["r6"] == "r6"                   # isolated singleton


def test_ground_truth_from_annotations_preserves_rows(spark):
    records = spark.createDataFrame(
        [("r1", "a"), ("r2", "b"), ("r3", "c")], "unique_id string, payload string"
    )
    edges = _edges(spark, [("r1", "r2", 0.9)])
    labeled = _labels(spark, [("r2", "r3", True)])
    out = ground_truth_from_annotations(records, edges, labeled)
    assert out.count() == records.count()
    gt = {r["unique_id"]: r["ground_truth"] for r in out.collect()}
    assert gt["r1"] == gt["r2"] == gt["r3"]    # chained via annotation
    assert set(out.columns) == {"unique_id", "payload", "ground_truth"}
