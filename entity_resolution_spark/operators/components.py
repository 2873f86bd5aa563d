"""Distributed connected components over an edge DataFrame.

Replaces the reference's ``nx.Graph(adj)`` → ``nx.connected_components`` step
(``am_combiner/combiners/common.py:138-177``) with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): converges in O(log n) rounds, every round is a
shuffle-bounded groupBy-min + join — no driver-side graph, no collect.

Cluster id = the minimum node id in the component ("hash-to-min"), which is stable
under any partitioning/order — the distributed replacement for the reference's
``.cat.codes`` dense relabeling (``am_combiner/blockers/common.py:42-48``).

The node type is any orderable Spark type (long or string); the loop is
type-agnostic. Each iteration ``localCheckpoint``s to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward smaller ids; connect all smaller neighbors (and u) to the min."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    with_min = oriented.join(mins, "src")
    to_min = with_min.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_min.union(self_edge)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    target_rows_per_partition: int = 250_000,
) -> DataFrame:
    """Edge DataFrame → component labels ``(id, component)``.

    ``component`` is the min node id of the component. Nodes appear iff they appear
    in ``edges``; union isolated vertices downstream (see :func:`label_components`).

    The loop is latency-sensitive (each round is a driver-synchronized barrier),
    so edges are re-partitioned to ≈``target_rows_per_partition`` rows/partition
    first: a 500k-edge graph runs its ~log(diameter) rounds on a handful of
    partitions instead of paying per-task scheduling on hundreds of slivers,
    while a 10^12-edge graph still fans out to thousands of partitions.
    """
    # persist BEFORE the sizing count: the input subtree (often an expensive
    # similarity join) would otherwise execute twice — once for count(), once
    # for the eager checkpoint that seeds the loop
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct().persist()
    n_edges = e.count()
    if n_edges == 0:
        out = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
        e.unpersist()
        return out
    n_parts = max(2, min(int(e.sparkSession.conf.get("spark.sql.shuffle.partitions")),
                         n_edges // target_rows_per_partition + 1))
    shuffle_conf = "spark.sql.shuffle.partitions"
    prev_parts = e.sparkSession.conf.get(shuffle_conf)
    e.sparkSession.conf.set(shuffle_conf, str(n_parts))
    try:
        seed = e.repartition(n_parts, "src").localCheckpoint(eager=True)
        e.unpersist()
        return _cc_loop(seed, max_iterations)
    finally:
        e.sparkSession.conf.set(shuffle_conf, prev_parts)


def _cc_loop(e: DataFrame, max_iterations: int) -> DataFrame:
    """``e`` must already be materialized (checkpointed) by the caller."""
    prev_sig = None
    for _ in range(max_iterations):
        e = _large_star(e)
        e = _small_star(e).localCheckpoint(eager=True)
        sig_row = e.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")

    # post-convergence the graph is a forest of stars: (node → root)
    labels = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return labels.union(roots).groupBy("id").agg(F.min("component").alias("component"))


def label_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    out_col: str = "component",
) -> DataFrame:
    """All vertices labeled; isolated vertices become singleton components (their own id)."""
    labels = connected_components(edges, src, dst)
    return (
        vertices.join(labels, vertices[id_col] == labels["id"], "left")
        .select(
            *[vertices[c] for c in vertices.columns],
            F.coalesce(labels["component"], vertices[id_col]).alias(out_col),
        )
    )
