"""Feature-intersection adjacency — the reference's core relational pattern (§2.3).

Reference: ``am_combiner/utils/adjacency.py``:
- ``get_article_feature_adjacency_matrix`` (15-70): inverted index per feature →
  pair weight = number of distinct shared values (or Σ 1/df with inverse_degree);
- ``get_article_multi_feature_adjacency`` (73-114): sum over features;
- ``get_feature_negative_edge_matrix`` (117-172): negative edges for disjoint sets
  or numeric ranges farther than a distance.

Spark form: explode the feature array → self-equi-join on the value → groupBy pair.
Semantics preserved exactly (validated by the reference's golden matrices in
tests/test_adjacency.py): duplicate values in one record count once
(``permutations(set(ids), 2)`` at adjacency.py:57 collapses duplicates — we
``array_distinct`` before exploding), self-pairs are excluded, weight is the count
of distinct shared values summed across features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_intersection_edges(
    records: DataFrame,
    feature_cols: list[str],
    id_col: str = "unique_id",
    inverse_degree: bool = False,
    per_feature: bool = False,
    block_col: str | None = None,
) -> DataFrame:
    """Weighted undirected edges (id_a < id_b) from shared feature values.

    weight = Σ_f |values shared in f|            (inverse_degree=False)
           = Σ_f Σ_{v shared} 1/df(v)            (inverse_degree=True, df = #records
                                                  carrying v in feature f — the
                                                  reference divides by posting-list
                                                  degree, adjacency.py:61-64)
    ``per_feature=True`` keeps the feature name in the key (reference ``as_list``).
    ``block_col`` scopes the value join (and the df census) to the block —
    the reference always runs adjacency inside one blocked name, so block-
    scoped callers (e.g. the graph_node_th spectral gate) pass it to keep
    posting lists block-local at scale.
    """
    parts = []
    blk_sel = [F.col(block_col).alias("_blk")] if block_col else []
    for fc in feature_cols:
        parts.append(
            records.select(
                F.col(id_col).alias("_id"),
                *blk_sel,
                F.lit(fc).alias("_feat"),
                F.explode(F.array_distinct(F.col(fc))).alias("_v"),
            )
        )
    exploded = parts[0]
    for p in parts[1:]:
        exploded = exploded.unionByName(p)
    blk_keys = ["_blk"] if block_col else []

    if inverse_degree:
        df_ = exploded.groupBy(*blk_keys, "_feat", "_v").agg(
            F.count("*").alias("_df")
        )
        exploded = exploded.join(df_, [*blk_keys, "_feat", "_v"])
        contrib = F.lit(1.0) / F.col("_df")
    else:
        contrib = F.lit(1.0)

    a = exploded.select(
        F.col("_id").alias("id_a"), *blk_keys, "_feat", "_v",
        *( ["_df"] if inverse_degree else [] ),
    )
    b = exploded.select(
        F.col("_id").alias("id_b"),
        *( [F.col("_blk").alias("_blk_b")] if block_col else [] ),
        F.col("_feat").alias("_feat_b"),
        F.col("_v").alias("_v_b"),
    )
    cond = (
        (a["_feat"] == b["_feat_b"]) & (a["_v"] == b["_v_b"]) & (a["id_a"] < b["id_b"])
    )
    if block_col:
        cond = cond & (a["_blk"] == b["_blk_b"])
    joined = a.join(b, cond)
    keys = [*blk_keys, "id_a", "id_b"] + (["_feat"] if per_feature else [])
    out = joined.groupBy(*keys).agg(F.sum(contrib).alias("weight"))
    if per_feature:
        out = out.withColumnRenamed("_feat", "feature")
    if block_col:
        out = out.withColumnRenamed("_blk", block_col)
    return out


def negative_edges_disjoint_sets(
    records: DataFrame, feature_col: str, id_col: str = "unique_id",
    block_col: str | None = None,
) -> DataFrame:
    """Pairs whose feature sets are DISJOINT (reference distance=None negator,
    adjacency.py:158-160). Records with empty feature sets contribute no negative
    evidence (the reference skips them: only pairs where both have values).
    Theta-join within block (or global when block_col None) — use on capped blocks.
    """
    base = records.select(
        F.col(id_col).alias("_id"),
        (F.col(block_col) if block_col else F.lit("all")).alias("_blk"),
        F.array_distinct(F.col(feature_col)).alias("_f"),
    ).where(F.size("_f") > 0)
    a = base.select(F.col("_id").alias("id_a"), "_blk", F.col("_f").alias("_fa"))
    b = base.select(F.col("_id").alias("id_b"), "_blk", F.col("_f").alias("_fb"))
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.size(F.array_intersect(F.col("_fa"), F.col("_fb"))) == 0)
        .select("id_a", "id_b", F.lit(1.0).alias("weight"))
    )


def negative_edges_numeric_distance(
    records: DataFrame, feature_col: str, distance: float,
    id_col: str = "unique_id", block_col: str | None = None,
) -> DataFrame:
    """Pairs whose numeric feature ranges are farther apart than ``distance``
    (reference adjacency.py:161-167: min(b) - max(a) > d or min(a) - max(b) > d)."""
    base = records.select(
        F.col(id_col).alias("_id"),
        (F.col(block_col) if block_col else F.lit("all")).alias("_blk"),
        F.array_min(F.col(feature_col)).alias("_mn"),
        F.array_max(F.col(feature_col)).alias("_mx"),
    ).where(F.col("_mn").isNotNull())
    a = base.select(F.col("_id").alias("id_a"), "_blk",
                    F.col("_mn").alias("_mn_a"), F.col("_mx").alias("_mx_a"))
    b = base.select(F.col("_id").alias("id_b"), "_blk",
                    F.col("_mn").alias("_mn_b"), F.col("_mx").alias("_mx_b"))
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.col("_mn_b") - F.col("_mx_a") > distance)
            | (F.col("_mn_a") - F.col("_mx_b") > distance)
        )
        .select("id_a", "id_b", F.lit(1.0).alias("weight"))
    )


def multi_feature_negative_edges(
    records: DataFrame,
    negators: list[tuple[str, float | None]],
    id_col: str = "unique_id",
    block_col: str | None = None,
) -> DataFrame:
    """Σ of negative edges over a (feature, distance) negator list
    (reference adjacency.py:175-200)."""
    parts = []
    for feature_col, distance in negators:
        if distance is None:
            parts.append(
                negative_edges_disjoint_sets(records, feature_col, id_col, block_col)
            )
        else:
            parts.append(
                negative_edges_numeric_distance(
                    records, feature_col, distance, id_col, block_col
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("id_a", "id_b").agg(F.sum("weight").alias("weight"))
