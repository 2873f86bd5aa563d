"""Candidate-pair generation: bounded self-join within blocks.

The distributed form of the reference's inverted-index pair emission
(``am_combiner/utils/adjacency.py:50-65`` — posting list → ``itertools.permutations``):
a self-equi-join on ``block_key`` with ``id_a < id_b`` (we keep the canonical ordered
pair once; the reference's symmetric matrix is recovered implicitly since all our
downstream ops — threshold + connected components — are symmetric).

Scale design:
- **exact-duplicate blocks emit a star, not a clique**: all members of a sha-equal
  block link to the block's min id. A 100k-copy boilerplate file yields 10^5 edges
  instead of 5·10^9 — connectivity under CC is identical.
- similarity blocks are size-capped upstream (``apply_block_caps``) so the join's
  per-key fan-out is ≤ cap²; AQE skew-join splits any residual hot key.
- output is de-duplicated on (id_a, id_b) across key families with one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_pairs(assignments: DataFrame) -> DataFrame:
    """(block_key, unique_id) → pairs (min_id, other_id) per block. O(block size)."""
    reps = assignments.groupBy("block_key").agg(F.min("unique_id").alias("id_a"))
    return (
        assignments.join(reps.hint("shuffle_hash"), "block_key")
        .where(F.col("unique_id") != F.col("id_a"))
        .select(F.col("id_a"), F.col("unique_id").alias("id_b"))
    )


def clique_pairs(assignments: DataFrame) -> DataFrame:
    """Full within-block self-join with id_a < id_b.

    SHUFFLE_HASH: block sizes are capped upstream, so each build partition is
    bounded; a sort-merge join would Tungsten-sort the full exploded
    assignment stream twice just to pair within keys.
    """
    left = assignments.alias("a")
    right = assignments.alias("b")
    return (
        left.join(right.hint("shuffle_hash"), "block_key")
        .where(F.col("a.unique_id") < F.col("b.unique_id"))
        .select(
            F.col("a.unique_id").alias("id_a"),
            F.col("b.unique_id").alias("id_b"),
        )
    )


def candidate_pairs(assignments: DataFrame, exact_prefix: str = "sha:") -> DataFrame:
    """Union of star pairs (exact blocks) + clique pairs (similarity blocks), distinct.

    ``is_exact`` marks pairs that came from an exact-content block — these score 1.0
    without ever touching the content again. Exact blocks are identified by the
    ``is_exact`` boolean when ``block_assignments`` provided one (int64-key
    schema); string-keyed assignments fall back to the ``exact_prefix`` test.
    """
    if "is_exact" in assignments.columns:
        exact = assignments.where(F.col("is_exact")).select("unique_id", "block_key")
        sim = assignments.where(~F.col("is_exact")).select("unique_id", "block_key")
    else:
        exact = assignments.where(F.col("block_key").startswith(exact_prefix))
        sim = assignments.where(~F.col("block_key").startswith(exact_prefix))
    e = star_pairs(exact).withColumn("is_exact", F.lit(True))
    s = clique_pairs(sim).withColumn("is_exact", F.lit(False))
    return (
        e.unionByName(s)
        .groupBy("id_a", "id_b")
        .agg(F.max("is_exact").alias("is_exact"))
    )
