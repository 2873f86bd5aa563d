"""GCN (SAGEConv mean) combiner — golden tests vs dense numpy arithmetic
(reference am_combiner/combiners/ml.py:31-209)."""

from __future__ import annotations

import numpy as np

from entity_resolution_spark.operators.gcn import (
    gcn_resolve,
    glorot_weights,
    sage_layer,
)


def _dense_sage(x, adj_w, w_self, w_neigh, alpha=0.01):
    """Reference arithmetic on dense matrices: weighted neighbor mean."""
    n = x.shape[0]
    nmat = np.zeros_like(x)
    for i in range(n):
        w = adj_w[i]
        if w.sum() > 0:
            nmat[i] = (w[:, None] * x).sum(axis=0) / w.sum()
    h = x @ w_self + nmat @ w_neigh
    return np.where(h > 0, h, alpha * h)


def test_sage_layer_matches_dense(spark):
    ids = ["a", "b", "c", "d"]
    x = np.arange(12, dtype=np.float64).reshape(4, 3) / 10.0
    adj = np.zeros((4, 4))
    adj[0, 1] = adj[1, 0] = 2.0
    adj[1, 2] = adj[2, 1] = 1.0
    # d is isolated: neighbor term must be zero, not NaN
    w = glorot_weights(3, 5, seed=11)

    feats = spark.createDataFrame(
        [(ids[i], x[i].tolist()) for i in range(4)], ["id", "features"]
    )
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0)], ["id_a", "id_b", "weight"]
    )
    rows = sage_layer(edges, feats, w["w_self"], w["w_neigh"]).collect()
    got = {r["id"]: np.array(r["embedding"]) for r in rows}
    expected = _dense_sage(x, adj, w["w_self"], w["w_neigh"])
    for i, k in enumerate(ids):
        np.testing.assert_allclose(got[k], expected[i], rtol=1e-9, atol=1e-12)


def test_glorot_deterministic():
    w1 = glorot_weights(4, 8, seed=7)
    w2 = glorot_weights(4, 8, seed=7)
    np.testing.assert_array_equal(w1["w_self"], w2["w_self"])
    np.testing.assert_array_equal(w1["w_neigh"], w2["w_neigh"])
    assert w1["w_self"].shape == (4, 8)


def test_gcn_resolve_groups_feature_connected(spark):
    """Records sharing features end in one cluster; strangers stay apart.
    With identical node features and a shared edge, the SAGE embeddings of the
    connected pair coincide → cosine 1 > th; the isolated record keeps its own
    embedding direction."""
    records = spark.createDataFrame(
        [
            ("r1", ["m_auth", "m_db"], [1.0, 0.0, 0.0]),
            ("r2", ["m_auth", "m_db"], [1.0, 0.0, 0.0]),
            ("r3", ["m_zzz"], [0.0, 0.0, 1.0]),
        ],
        ["unique_id", "deps", "emb"],
    )
    out = {r["unique_id"]: r["cluster_id"]
           for r in gcn_resolve(records, ["deps"], "emb", th=0.99).collect()}
    assert out["r1"] == out["r2"]
    assert out["r3"] != out["r1"]
    assert len(out) == 3


def test_gcn_resolve_null_feature_row_is_singleton(spark):
    """Regression: a null node-feature row must not poison the feature-width
    probe (it was a partition-order-dependent .first()) nor crash the kernel —
    the record simply resolves as its own singleton cluster."""
    rows = [
        ("a", ["t1", "t2"], [1.0, 0.0, 0.0, 0.0]),
        ("b", ["t1", "t2"], [1.0, 0.0, 0.0, 0.0]),
        ("z", ["t9"], None),
    ]
    recs = spark.createDataFrame(
        rows, "unique_id string, toks array<string>, emb array<double>"
    )
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in gcn_resolve(recs, ["toks"], "emb", th=0.5).collect()
    }
    assert out["a"] == out["b"]
    assert out["z"] == "z"  # null-featured: no embedding, singleton


def test_gcn_resolve_zero_feature_vectors_are_singletons(spark):
    """Regression: all-zero feature vectors produce a zero-norm embedding
    (0·W through LeakyReLU is 0); the cosine join must exclude them — ANSI
    mode turns the norm division into a job-failing DIVIDE_BY_ZERO — and the
    records resolve as singletons."""
    rows = [
        # a/b form their own token component: every input feature in it is
        # zero, so self AND neighbor terms are zero → zero-norm embeddings
        ("a", ["t1", "t2"], [0.0, 0.0, 0.0, 0.0]),
        ("b", ["t1", "t2"], [0.0, 0.0, 0.0, 0.0]),
        ("c", ["t8", "t9"], [1.0, 2.0, 0.0, 0.0]),
        ("d", ["t8", "t9"], [1.0, 2.0, 0.0, 0.0]),
    ]
    recs = spark.createDataFrame(
        rows, "unique_id string, toks array<string>, emb array<double>"
    )
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in gcn_resolve(recs, ["toks"], "emb", th=0.5).collect()
    }
    assert out["a"] == "a" and out["b"] == "b"  # zero-norm: singletons
    assert out["c"] == out["d"]                  # normal rows still cluster


# ------------------------------------------------------------- hetero GCN


def _dense_hetero(x, adjs, ws, alpha=0.0):
    """Dense HeteroGCN arithmetic (ml.py:46-62): SAGEConv(mean, ReLU) per
    edge type, elementwise mean over the type outputs."""
    outs = [
        _dense_sage(x, adj, w["w_self"], w["w_neigh"], alpha=alpha)
        for adj, w in zip(adjs, ws)
    ]
    return np.mean(outs, axis=0)


def test_gcn_hetero_matches_dense(spark):
    """Two edge types with different adjacencies + per-type weights: the
    distributed hetero mean-embedding must equal the dense HeteroGraphConv
    arithmetic, and the clusters must follow those embeddings."""
    from entity_resolution_spark.operators.gcn import gcn_hetero_resolve

    ids = ["a", "b", "c", "d"]
    x = (np.arange(12, dtype=np.float64).reshape(4, 3) + 1.0) / 10.0
    # type 1 ("deps"): a-b share 2 values, b-c share 1
    adj1 = np.zeros((4, 4))
    adj1[0, 1] = adj1[1, 0] = 2.0
    adj1[1, 2] = adj1[2, 1] = 1.0
    # type 2 ("calls"): c-d share 1 value
    adj2 = np.zeros((4, 4))
    adj2[2, 3] = adj2[3, 2] = 1.0
    w1 = glorot_weights(3, 4, seed=7)      # seed + 0
    w2 = glorot_weights(3, 4, seed=8)      # seed + 1 (the default ladder)
    records = spark.createDataFrame(
        [
            ("a", ["d1", "d2"], [], x[0].tolist()),
            ("b", ["d1", "d2", "d3"], [], x[1].tolist()),
            ("c", ["d3"], ["f1"], x[2].tolist()),
            ("d", [], ["f1"], x[3].tolist()),
        ],
        ["unique_id", "deps", "calls", "emb"],
    )
    expected = _dense_hetero(x, [adj1, adj2], [w1, w2])

    # verify through the embedding-bearing internals: run the resolve at an
    # impossible threshold so clusters are singletons, then reconstruct the
    # mean embedding with the same per-type weights directly
    from entity_resolution_spark.operators.adjacency import (
        feature_intersection_edges,
    )
    from entity_resolution_spark.operators.gcn import sage_layer

    feats = spark.createDataFrame(
        [(i, x[k].tolist()) for k, i in enumerate(ids)], ["id", "features"]
    )
    epf = feature_intersection_edges(
        records, ["deps", "calls"], id_col="unique_id", per_feature=True
    )
    outs = []
    for fc, w in (("deps", w1), ("calls", w2)):
        e = epf.where(epf["feature"] == fc).select("id_a", "id_b", "weight")
        outs.append(
            {
                r["id"]: np.array(r["embedding"])
                for r in sage_layer(
                    e, feats, w["w_self"], w["w_neigh"], leaky_alpha=0.0
                ).collect()
            }
        )
    got = {i: (outs[0][i] + outs[1][i]) / 2.0 for i in ids}
    for k, i in enumerate(ids):
        np.testing.assert_allclose(got[i], expected[k], rtol=1e-9, atol=1e-12)

    # and the operator end-to-end: identical node features + a type-1 edge
    # make a/b coincide; d only connects through type 2
    same = spark.createDataFrame(
        [
            ("r1", ["m1"], [], [1.0, 0.0, 0.0]),
            ("r2", ["m1"], [], [1.0, 0.0, 0.0]),
            ("r3", [], ["z9"], [0.0, 1.0, 0.0]),
        ],
        ["unique_id", "deps", "calls", "emb"],
    )
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in gcn_hetero_resolve(
            same, ["deps", "calls"], "emb", th=0.99
        ).collect()
    }
    assert out["r1"] == out["r2"]
    assert out["r3"] != out["r1"]


def test_gcn_hetero_edgeless_type_contributes_self_term(spark):
    """An edge type with NO edges must not crash (the reference needs a
    synthetic self-loop hack there) — every node still gets that type's
    self-term in the mean."""
    from entity_resolution_spark.operators.gcn import gcn_hetero_resolve

    records = spark.createDataFrame(
        [
            ("u1", ["s"], [], [0.5, 0.5]),
            ("u2", ["s"], [], [0.5, 0.5]),
        ],
        "unique_id string, deps array<string>, calls array<string>, "
        "emb array<double>",
    )
    out = {
        r["unique_id"]: r["cluster_id"]
        for r in gcn_hetero_resolve(
            records, ["deps", "calls"], "emb", th=0.9
        ).collect()
    }
    assert out["u1"] == out["u2"] == "u1"
