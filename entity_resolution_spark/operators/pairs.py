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


def drop_sha_covered_pairs(
    pairs: DataFrame,
    features: DataFrame,
    id_col: str = "unique_id",
    lang_col: str = "lang",
    sha_col: str = "content_sha",
) -> DataFrame:
    """Drop candidate pairs whose two sides are byte-identical duplicates of
    each other — their connectivity is already guaranteed by the exact
    family's star, so scoring them is pure redundancy.

    The 100 TB skew shape this fixes: a boilerplate family of n identical
    files lands in the SAME path/band/fingerprint blocks, and the salted
    clique pairs among them are O(n·cap) rows of wide vector payload that the
    scorer evaluates for nothing (measured: a 1000-copy family produced 100k
    candidate pairs, ~99% sha-covered). Star pairs themselves are kept (they
    carry the family's connectivity and score on the exact feature).

    Covered = both sides in the same (lang, full-sha256) duplicate group,
    keyed by the xxhash64 of the pair — the same 64-bit surrogate-collision
    class the pipeline already accepts for record ids (pipeline.py id
    narrowing: risk n²/2^65, switch to the 128-bit pair at 10^12 records) and
    far beyond the 48-bit blocking prefix. The duplicate map costs one narrow
    (id, group) exchange and is exactly as large as the duplicate population:
    on a duplicate-free corpus it is empty and the probe joins are no-ops.
    """
    from pyspark.sql import Window

    # ONE narrow exchange builds the whole map: hash (lang, sha) to an int64
    # group key BEFORE the shuffle (keys are payload) and compute the group's
    # rep + size as a window over that key — the groupBy-then-join-back
    # formulation exchanged the 64-char sha strings twice and measured +5s on
    # a duplicate-FREE 703k-file corpus; this shape costs one (id, group)
    # exchange. The map's size is then the runtime gate: AQE sees an empty /
    # tiny map and broadcasts the probes below, so the pairs stream is never
    # re-shuffled unless duplicates actually exist.
    g = Window.partitionBy("_g")
    dup_map = (
        features.select(
            F.col(id_col).alias("_uid"),
            F.xxhash64(lang_col, sha_col).alias("_g"),
        )
        .select(
            "_uid",
            F.min("_uid").over(g).alias("_rep"),
            F.count("*").over(g).alias("_n"),
        )
        .where(F.col("_n") > 1)
        .select("_uid", "_rep")
    )
    a = dup_map.select(F.col("_uid").alias("id_a"), F.col("_rep").alias("_rep_a"))
    b = dup_map.select(F.col("_uid").alias("id_b"), F.col("_rep").alias("_rep_b"))
    covered = (
        (F.col("_rep_a") == F.col("_rep_b"))
        & F.col("_rep_a").isNotNull()
        & ~F.col("is_exact")
    )
    return (
        pairs.join(a, "id_a", "left")
        .join(b, "id_b", "left")
        .where(~covered | covered.isNull())
        .select(*pairs.columns)
    )
