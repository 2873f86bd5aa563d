"""Term visitor, selected-text visitor, incremental combiners — reference
semantics tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from entity_resolution_spark.functions.terms import (
    combo_basic_terms,
    selected_text,
    top_terms,
)
from entity_resolution_spark.operators.incremental_combiner import (
    incremental_cluster_blocks,
    incremental_labels,
)

# ------------------------------------------------------------ selected text


def test_selected_text_window(spark):
    """previous_and_next (text_selector.py:6-39): pre/post window around hits,
    order-preserving dedup, space-join."""
    df = spark.createDataFrame(
        [(["s0", "alice here", "s2", "s3", "alice again", "s5"], "alice")],
        ["sents", "name"],
    )
    out = df.select(selected_text("sents", "name", pre=1, post=1).alias("sel")).first()
    assert out["sel"] == "s0 alice here s2 s3 alice again s5"


def test_selected_text_overlapping_windows_dedup(spark):
    df = spark.createDataFrame(
        [(["bob a", "bob b", "tail"], "bob")], ["sents", "name"]
    )
    out = df.select(selected_text("sents", "name", 1, 1).alias("sel")).first()
    # windows [0..1] and [0..2] overlap; each sentence appears once
    assert out["sel"] == "bob a bob b tail"


def test_selected_text_no_hit_empty(spark):
    df = spark.createDataFrame([(["x", "y"], "none")], ["sents", "name"])
    assert df.select(selected_text("sents", "name").alias("s")).first()["s"] == ""


# ------------------------------------------------------------ combo_basic


def test_combo_basic_favors_frequent_multiwords():
    text = "data frame data frame data frame spark engine spark"
    terms = combo_basic_terms(text, n=4)
    assert "data frame" in terms
    # the repeated bigram outranks its unigram parts' singles at equal freq
    assert terms.index("data frame") == 0


def test_combo_basic_deterministic_and_lowercased():
    t1 = combo_basic_terms("Alpha Beta alpha beta", n=5)
    t2 = combo_basic_terms("Alpha Beta alpha beta", n=5)
    assert t1 == t2
    assert all(t == t.lower() for t in t1)


def test_top_terms_spark(spark):
    df = spark.createDataFrame(
        [("d1", "connection pool connection pool timeout")], ["unique_id", "content"]
    )
    row = top_terms(df, "content", n=3).first()
    assert row["unique_id"] == "d1"
    assert "connection pool" in row["terms"]


# ------------------------------------------------------------ incremental


def test_incremental_pairwise_reference_walk():
    x = np.array([[1.0, 0.0], [0.8, 0.6], [0.0, 1.0]])
    labels = incremental_labels(x, threshold=0.75, strategy="pairwise")
    # p1 joins p0 (cos 0.8 ≥ 0.75); p2's best is p1 at cos 0.6 → new cluster
    assert labels.tolist() == [0, 0, 1]
    labels2 = incremental_labels(x, threshold=0.55, strategy="pairwise")
    # at th 0.55, p2 reaches cluster 0 through p1 (cos 0.6) — chaining
    assert labels2.tolist() == [0, 0, 0]


def test_incremental_centroid_differs_from_pairwise():
    """Third point joins the cluster of its nearest MEMBER under pairwise, but
    the running-mean centroid has drifted away → centroid founds a new one."""
    x = np.array([[1.0, 0.0], [0.92, 0.39], [0.78, 0.625]])
    lp = incremental_labels(x, threshold=0.9, strategy="pairwise")
    lc = incremental_labels(x, threshold=0.9, strategy="centroid")
    # pairwise: cos(p2,p1) ≈ 0.962 ≥ 0.9 → joins;
    # centroid ≈ [0.96, 0.195]: cos(p2, centroid) ≈ 0.889 < 0.9 → new cluster
    assert lp.tolist() == [0, 0, 0]
    assert lc.tolist() == [0, 0, 1]


def test_incremental_ties_go_to_earliest_cluster():
    x = np.array([[1.0, 0.0], [0.0, 1.0], [np.sqrt(0.5), np.sqrt(0.5)]])
    labels = incremental_labels(x, threshold=0.7, strategy="pairwise")
    # p2 is equidistant (cos ≈ 0.707) from both clusters → earliest wins
    assert labels[2] == labels[0] == 0


def test_incremental_blocks_deterministic_order(spark):
    rows = [
        ("r3", "blk", [0.0, 1.0]),
        ("r1", "blk", [1.0, 0.0]),
        ("r2", "blk", [0.95, 0.05]),
    ]
    df_fwd = spark.createDataFrame(rows, ["unique_id", "blocking_key", "vec"])
    df_rev = spark.createDataFrame(rows[::-1], ["unique_id", "blocking_key", "vec"]).repartition(4)
    o1 = sorted(map(tuple, incremental_cluster_blocks(df_fwd, "vec", threshold=0.9).collect()))
    o2 = sorted(map(tuple, incremental_cluster_blocks(df_rev, "vec", threshold=0.9).collect()))
    assert o1 == o2
    out = dict((r[0], r[2]) for r in o1)
    # scan order is id order: r1 founds, r2 joins (cos≈0.998), r3 founds
    assert out["r1"] == "r1" and out["r2"] == "r1" and out["r3"] == "r3"


def test_incremental_numeric_order_col_sorts_natively(spark):
    """A numeric ingest-sequence order column must scan 999 before 1000 —
    a string cast would sort "1000" < "999" and reorder the walk."""
    rows = [
        ("late", "blk", [0.0, 1.0], 1000),
        ("early", "blk", [1.0, 0.0], 999),
    ]
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "vec", "seq"])
    out = dict(
        (r["unique_id"], r["cluster_id"])
        for r in incremental_cluster_blocks(
            df, "vec", order_col="seq", threshold=0.99
        ).collect()
    )
    # both found their own cluster; the founder ids prove the scan order
    assert out == {"early": "early", "late": "late"}
    # orthogonal vectors: the SECOND record founds cluster index 1 — with the
    # right order that is "late"; verify via a joining third record
    rows2 = rows + [("tie", "blk", [1.0, 0.0], 1001)]
    df2 = spark.createDataFrame(rows2, ["unique_id", "blocking_key", "vec", "seq"])
    out2 = dict(
        (r["unique_id"], r["cluster_id"])
        for r in incremental_cluster_blocks(
            df2, "vec", order_col="seq", threshold=0.9
        ).collect()
    )
    assert out2["tie"] == "early"  # joins the cluster founded by seq=999
