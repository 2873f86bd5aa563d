"""Per-block k-means and spectral combiners — reference-semantics tests."""

from __future__ import annotations

import numpy as np

from entity_resolution_spark.operators.kmeans import (
    kmeans_cluster_blocks,
    kmeans_silhouette_labels,
)
from entity_resolution_spark.operators.spectral import (
    spectral_cluster_blocks,
    spectral_labels_block,
)


# ---------------------------------------------------------------- k-means


def test_kmeans_tiny_block_singletons():
    """Reference tfidf.py:50-52: ≤3 records → no combining at all."""
    x = np.array([[0.0], [0.0], [0.0]])
    assert kmeans_silhouette_labels(x).tolist() == [0, 1, 2]
    assert kmeans_silhouette_labels(x[:2]).tolist() == [0, 1]


def test_kmeans_separates_obvious_clusters():
    rng = np.random.RandomState(7)
    x = np.vstack(
        [rng.randn(10, 3) * 0.05, rng.randn(10, 3) * 0.05 + 10.0]
    )
    labels = kmeans_silhouette_labels(x)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_kmeans_blocks_spark(spark):
    rows = []
    for i in range(6):
        rows.append((f"a{i}", "blk1", [0.0 + i * 0.01, 0.0]))
    for i in range(6):
        rows.append((f"b{i}", "blk1", [9.0 + i * 0.01, 9.0]))
    rows.append(("c1", "blk2", [1.0, 1.0]))  # tiny block → singleton
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "vec"])
    out = {r["unique_id"]: r["cluster_id"]
           for r in kmeans_cluster_blocks(df, "vec").collect()}
    assert len({out[f"a{i}"] for i in range(6)}) == 1
    assert len({out[f"b{i}"] for i in range(6)}) == 1
    assert out["a0"] != out["b0"]
    assert out["c1"] == "c1"  # min-id labeling of its own singleton cluster
    # min-id labeling convention
    assert out["a0"] == "a0" and out["b0"] == "b0"


def test_kmeans_deterministic_across_partitionings(spark):
    rows = [(f"r{i:02d}", "b", [float(i % 2) * 5, float(i % 2) * 5]) for i in range(12)]
    df1 = spark.createDataFrame(rows, ["unique_id", "blocking_key", "vec"]).repartition(1)
    df8 = spark.createDataFrame(rows[::-1], ["unique_id", "blocking_key", "vec"]).repartition(8)
    o1 = sorted(map(tuple, kmeans_cluster_blocks(df1, "vec").collect()))
    o8 = sorted(map(tuple, kmeans_cluster_blocks(df8, "vec").collect()))
    assert o1 == o8


def test_cluster_blocks_with_algo_pluggable(spark):
    """TFIDFCombinerWithClusteringAlgo analog: any fit_predict-style callable."""
    import numpy as np

    from entity_resolution_spark.operators.kmeans import cluster_blocks_with_algo

    rows = [
        ("u1", "blk", [0.0]), ("u2", "blk", [0.1]),
        ("u3", "blk", [5.0]), ("u4", "blk", [5.1]),
    ]
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "vec"])

    def threshold_algo(x: np.ndarray):
        return (x[:, 0] > 2.5).astype(int)

    out = {r["unique_id"]: r["cluster_id"]
           for r in cluster_blocks_with_algo(df, "vec", threshold_algo).collect()}
    assert out["u1"] == out["u2"] == "u1"
    assert out["u3"] == out["u4"] == "u3"


# ---------------------------------------------------------------- spectral


def test_spectral_block_kernel_separates():
    """Two records sharing features cluster; the stranger stays apart
    (reference utils/spectral.py: Fiedler-vector embedding, cosine, CC)."""
    ids = ["u1", "u2", "u3", "u4"]
    feats = [
        ["imp_requests", "imp_flask", "fn_render"],
        ["imp_requests", "imp_flask", "fn_render"],
        ["imp_numpy", "imp_torch", "fn_train"],
        ["imp_numpy", "imp_torch", "fn_train"],
    ]
    labels = spectral_labels_block(ids, feats, "blockname", th=0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_spectral_prunes_hapax_features():
    """A feature used by ONE record is pruned (spectral.py:39-42) — it must not
    glue anything, and its presence/absence must not change the labels."""
    ids = ["u1", "u2", "u3"]
    base = [["shared_x"], ["shared_x"], ["only_mine"]]
    with_hapax = [["shared_x", "hapax_1"], ["shared_x"], ["only_mine"]]
    l1 = spectral_labels_block(ids, base, "blk", th=0.5)
    l2 = spectral_labels_block(ids, with_hapax, "blk", th=0.5)
    # the pruned graph is IDENTICAL → labels identical (cluster structure on a
    # 3-node graph with a symmetric pair is eigen-degenerate — the reference
    # has the same property — so only the invariance is asserted here; the
    # separation behavior is covered by the 4-node test above)
    assert (l1 == l2).all()


def test_spectral_blocks_spark(spark):
    rows = [
        ("u1", "blk", ["imp_requests", "imp_flask"]),
        ("u2", "blk", ["imp_requests", "imp_flask"]),
        ("u3", "blk", ["imp_numpy", "imp_torch"]),
        ("u4", "blk", ["imp_numpy", "imp_torch"]),
    ]
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "imports"])
    out = {r["unique_id"]: r["cluster_id"]
           for r in spectral_cluster_blocks(df, ["imports"], th=0.5).collect()}
    assert out["u1"] == out["u2"] == "u1"
    assert out["u3"] == out["u4"] == "u3"


def test_spectral_order_invariant():
    ids = ["u3", "u1", "u2"]
    feats = [["imp_numpy"], ["shared_a", "shared_b"], ["shared_a", "shared_b"]]
    l_fwd = spectral_labels_block(ids, feats, "blk", th=0.5)
    l_rev = spectral_labels_block(ids[::-1], feats[::-1], "blk", th=0.5)
    # same partition of the id set regardless of row order
    def partition(ids_, labels_):
        groups = {}
        for i, lab in zip(ids_, labels_):
            groups.setdefault(lab, set()).add(i)
        return sorted(map(frozenset, groups.values()), key=sorted)
    assert partition(ids, l_fwd) == partition(ids[::-1], l_rev)


def test_spectral_gated_graph_node_th(spark):
    """TFIDFFeatrGraphCosineSimilarityCombiner's graph_node_th gate
    (combiners/tfidf.py:424-577): feature-intersection CC subgraphs with
    >= graph_node_th records run the eig kernel and must match the ungated
    spectral output on that subgraph; SMALLER subgraphs bypass eig and keep
    their component label whole — even when their features would split
    under the spectral kernel."""
    from entity_resolution_spark.operators.spectral import (
        spectral_cluster_blocks_gated,
        spectral_labels_block,
    )

    # big subgraph (6 records, chained through 'bridge' values so the
    # ftr-adjacency connects them into ONE component, but spectral splits
    # the two 3-record communities)
    big = [
        ("a1", ["imp_requests", "imp_flask", "bridge"]),
        ("a2", ["imp_requests", "imp_flask"]),
        ("a3", ["imp_requests", "imp_flask"]),
        ("a4", ["imp_numpy", "imp_torch", "bridge"]),
        ("a5", ["imp_numpy", "imp_torch"]),
        ("a6", ["imp_numpy", "imp_torch"]),
    ]
    # small subgraph (2 records): features that the SPECTRAL kernel would
    # split (no shared non-hapax value except the pair link), but the gate
    # must keep them whole at their component label without running eig
    small = [
        ("z1", ["pair_link", "imp_pandas"]),
        ("z2", ["pair_link", "imp_sklearn"]),
    ]
    rows = [(i, "blk", f) for i, f in big + small]
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "imports"])
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in spectral_cluster_blocks_gated(
            df, ["imports"], th=0.5, ftr_th=1.0, graph_node_th=5
        ).collect()
    }
    # small subgraph: bypassed -> one whole cluster at the min id
    assert out["z1"] == out["z2"] == "z1"
    # big subgraph: must equal the ungated kernel's labels on those 6 records
    ids = [i for i, _ in big]
    feats = [f for _, f in big]
    kern = spectral_labels_block(ids, feats, "blk", th=0.5)
    kern_rep = {}
    for i, lbl in zip(ids, kern):
        kern_rep.setdefault(lbl, i)
    expect = {i: kern_rep[lbl] for i, lbl in zip(ids, kern)}
    assert {i: out[i] for i in ids} == expect
    # and the gate really did split the big subgraph (eig ran there)
    assert out["a1"] != out["a4"]


def test_spectral_gated_all_small_never_eigs(spark):
    """Every subgraph under the threshold -> output is exactly the CC labels
    (the pure bypass path)."""
    from entity_resolution_spark.operators.spectral import (
        spectral_cluster_blocks_gated,
    )

    rows = [
        ("u1", "blk", ["x"]),
        ("u2", "blk", ["x"]),
        ("u3", "blk", ["y"]),
    ]
    df = spark.createDataFrame(rows, ["unique_id", "blocking_key", "imports"])
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in spectral_cluster_blocks_gated(
            df, ["imports"], graph_node_th=5
        ).collect()
    }
    assert out == {"u1": "u1", "u2": "u1", "u3": "u3"}
