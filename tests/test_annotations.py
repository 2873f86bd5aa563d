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


def test_annotation_pair_file_ingestion(spark):
    """Pair CSV → records + labeled pairs (reference utils/data.py:442-508):
    both sides stacked and deduped; symmetric per-entity label pairs."""
    from entity_resolution_spark.operators.annotations import (
        annotation_labeled_pairs,
        annotation_records,
    )

    pairs = spark.createDataFrame(
        [
            ("u1", "text one", "u2", "text two", "Alice", "Yes"),
            ("u2", "text two", "u3", "text three", "Alice", "No"),
            ("u3", "text three", "u2", "text two", "Alice", "No"),  # reversed dup
            ("u1", "text one", "u4", "text four", "Bob", "Yes"),    # u1 under 2nd entity
        ],
        "url_1 string, content_1 string, url_2 string, content_2 string,"
        "entity_name string, annotation_result string",
    )
    recs = annotation_records(pairs).collect()
    got = {(r["unique_id"], r["blocking_field"]): r["content"] for r in recs}
    assert len(recs) == len(got) == 5  # u1/u2/u3 under Alice + u1/u4 under Bob
    assert got[("u1", "Alice")] == "text one" and got[("u1", "Bob")] == "text one"
    assert got[("u3", "Alice")] == "text three"

    lp = annotation_labeled_pairs(pairs).collect()
    got_lp = {(r["blocking_field"], r["id_a"], r["id_b"]): r["label"] for r in lp}
    # reversed duplicate annotation collapses to ONE canonical row
    assert len(lp) == 3
    assert got_lp[("Alice", "u1", "u2")] is True
    assert got_lp[("Alice", "u2", "u3")] is False
    assert got_lp[("Bob", "u1", "u4")] is True


def test_name_filters_and_max_names(spark):
    """Reference utils/data.py:185-195: include/exclude isin filters, then the
    first max_names distinct names keep all their records."""
    from entity_resolution_spark.operators.filters import (
        filter_entity_names,
        limit_names,
    )

    recs = spark.createDataFrame(
        [("r1", "Alice", 3), ("r2", "Alice", 1), ("r3", "Bob", 2),
         ("r4", "Carol", 0), ("r5", "Dave", 4)],
        "unique_id string, blocking_field string, ingest_order long",
    )
    inc = filter_entity_names(recs, include=["Alice", "Bob"])
    assert {r["unique_id"] for r in inc.collect()} == {"r1", "r2", "r3"}
    exc = filter_entity_names(recs, exclude=["Alice"])
    assert {r["unique_id"] for r in exc.collect()} == {"r3", "r4", "r5"}

    # name-order contract: ascending name → Alice, Bob (both Alice rows kept)
    byname = limit_names(recs, 2)
    assert {r["unique_id"] for r in byname.collect()} == {"r1", "r2", "r3"}
    # explicit order column: min(ingest_order) → Carol(0), Alice(1)
    byorder = limit_names(recs, 2, order_by="ingest_order")
    assert {r["unique_id"] for r in byorder.collect()} == {"r1", "r2", "r4"}
    # no limit → unchanged
    assert limit_names(recs, None).count() == 5


def test_preprocess_input_records_reference_semantics(spark):
    """Reference random_data.py:40-66: scheme→http collapse, keep-first dedupe
    BEFORE the name-containment filter, meta struct packing."""
    from entity_resolution_spark.operators.filters import (
        preprocess_input_records,
    )

    recs = spark.createDataFrame(
        [
            # https/http duplicates collapse; first (ord) kept
            ("Alice", "https://ex.com/1", "Alice was here", "en", 0),
            ("Alice", "http://ex.com/1", "Alice again", "en", 1),
            # first occurrence lacks the name -> dropped AFTER dedupe wins
            # (the later duplicate that would pass is already gone)
            ("Bob", "ftp://ex.com/2", "no name present", "de", 2),
            ("Bob", "http://ex.com/2", "Bob is mentioned", "de", 3),
            # scheme-less id passes through unchanged
            ("Carol", "ex.com/3", "Carol text", "fr", 4),
            # name absent, unique id -> containment drop
            ("Dave", "http://ex.com/4", "someone else", "en", 5),
        ],
        "blocking_field string, unique_id string, content string, "
        "lang string, ord long",
    )
    out = preprocess_input_records(
        recs, meta_keys=("lang",), order_by="ord"
    )
    rows = {r["unique_id"]: r for r in out.collect()}
    assert set(rows) == {"http://ex.com/1", "ex.com/3"}
    assert rows["http://ex.com/1"]["content"] == "Alice was here"
    assert rows["http://ex.com/1"]["meta"]["lang"] == "en"
    assert rows["ex.com/3"]["blocking_field"] == "Carol"
    assert set(out.columns) == {
        "blocking_field", "unique_id", "content", "lang", "meta",
    }
