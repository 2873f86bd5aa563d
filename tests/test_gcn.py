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
