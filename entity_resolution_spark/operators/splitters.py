"""Splitters: break clusters using negative evidence.

Reference semantics: ``DeleteNegativeEdgesSplitter`` subtracts the negative adjacency
from the positive one and re-runs connected components
(``am_combiner/splitters/common.py:181-216``); negative edges come from
``(feature, distance)`` negators — disjoint feature sets or numeric ranges farther
than a distance (``am_combiner/utils/adjacency.py:117-200``).

Spark form: negative evidence is an anti-join predicate on the match-edge DataFrame
*before* connected components — deleting an edge before CC is exactly equivalent to
the reference's subtract-then-recluster, without a second CC pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def negative_edges_disjoint(
    pairs_with_features: DataFrame, feature_a: str, feature_b: str
) -> Column:
    """Negator predicate: the two records' feature sets are disjoint
    (``utils/adjacency.py:158-160`` with distance=None)."""
    return F.size(F.array_intersect(F.col(feature_a), F.col(feature_b))) == 0


def negative_edges_distance(a_min: Column, a_max: Column, b_min: Column, b_max: Column,
                            distance: float) -> Column:
    """Negator predicate: numeric ranges farther apart than ``distance``
    (``utils/adjacency.py:161-167``)."""
    return (b_min - a_max > distance) | (a_min - b_max > distance)


def apply_negative_edge_splitter(
    edges: DataFrame, features: DataFrame
) -> DataFrame:
    """Delete match edges contradicted by hard negative evidence.

    Default negator for the code domain: ``lang`` must match (the analog of the
    reference's country/YOB negators — a single hard key whose disagreement forbids
    co-reference). Exact-content edges are never split (identical bytes can't be two
    entities).
    """
    lang_a = features.select(
        F.col("unique_id").alias("id_a"), F.col("lang").alias("_lang_a"),
        F.col("content_sha").alias("_sha_a"),
    )
    lang_b = features.select(
        F.col("unique_id").alias("id_b"), F.col("lang").alias("_lang_b"),
        F.col("content_sha").alias("_sha_b"),
    )
    e = edges.join(lang_a, "id_a").join(lang_b, "id_b")
    keep = (F.col("_lang_a") == F.col("_lang_b")) | (F.col("_sha_a") == F.col("_sha_b"))
    return e.where(keep).select(*edges.columns)
