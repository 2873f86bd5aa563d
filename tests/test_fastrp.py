"""FastRP combiner — reference-golden tests (test/combiners/test_fastRP.py)."""

from __future__ import annotations

import numpy as np
import pytest

from entity_resolution_spark.operators.fastrp import (
    _reference_seed,
    fastrp_embeddings,
    fastrp_resolve,
    random_projection_rows,
)


def _reference_numpy_fastrp(a: np.ndarray, r: np.ndarray, weights=(0.0, 0.5, 0.5)):
    """The reference's _fastrp_proj arithmetic (fastRP.py:78-106), densely."""
    n = a.shape[0]
    m = a / a.sum(axis=1, keepdims=True)
    n_current = r.copy()
    acc = np.zeros_like(r)
    for w in weights:
        n_current = m @ n_current
        acc += n_current * w
    norms = np.linalg.norm(acc, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u = acc / norms
    return u @ u.T


def test_projection_rows_permutation_invariant(spark):
    """Reference test_fastRP.py:7-23: R rows depend only on the id string."""
    ids1 = spark.createDataFrame(
        [("SM:HilaryClinton47",), ("SM:DonaldTrump46",)], ["unique_id"]
    )
    ids2 = spark.createDataFrame(
        [("SM:DonaldTrump46",), ("SM:HilaryClinton47",)], ["unique_id"]
    )
    r1 = {
        (row["id"], row["pos"]): row["val"]
        for row in random_projection_rows(ids1, dim=32).collect()
    }
    r2 = {
        (row["id"], row["pos"]): row["val"]
        for row in random_projection_rows(ids2, dim=32).collect()
    }
    assert r1 == r2 and len(r1) > 0


def test_projection_rows_reference_seed_exact():
    """Seed arithmetic is the reference's exact char hash (fastRP.py:63-66)."""
    s = "SM:HilaryClinton47"
    expected = 0
    for i, ch in enumerate(s):
        expected += 3**i + ord(ch)
    assert _reference_seed(s) == expected % 2**32
    row = np.random.RandomState(_reference_seed(s)).choice(
        [0.0, -0.658, 0.658], size=16, p=[2 / 3, 1 / 6, 1 / 6]
    )
    assert set(np.unique(row)).issubset({0.0, -0.658, 0.658})


def test_embeddings_match_reference_arithmetic(spark):
    """Distributed SpMM ≡ the reference's dense M²R/M³R accumulation, via an
    injected R (reference test_fastRP.py:26-36 uses an injected dense R too)."""
    # chain graph: 0-1 weak, 1-2 strong (the reference's test matrix shape)
    a = np.array([[0.0, 0.2, 0.1], [0.2, 0.0, 0.9], [0.1, 0.9, 0.0]])
    rng = np.random.RandomState(42)
    r = rng.rand(3, 8)

    ids = ["d0", "d1", "d2"]
    edges = spark.createDataFrame(
        [(ids[i], ids[j], float(a[i, j])) for i in range(3) for j in range(i + 1, 3)
         if a[i, j] > 0],
        ["id_a", "id_b", "weight"],
    )
    r_long = spark.createDataFrame(
        [(ids[i], p, float(r[i, p])) for i in range(3) for p in range(8)],
        ["id", "pos", "val"],
    )
    emb_rows = fastrp_embeddings(edges, dim=8, r_long=r_long).collect()
    emb = {row["id"]: np.array(row["embedding"]) for row in emb_rows}
    got = np.stack([emb[i] for i in ids])

    m = a / a.sum(axis=1, keepdims=True)
    expected = 0.5 * (m @ m @ r) + 0.5 * (m @ m @ m @ r)
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_fastrp_resolve_clusters_shared_features(spark):
    records = spark.createDataFrame(
        [
            ("r1", ["lib_a", "lib_b", "lib_c"]),
            ("r2", ["lib_a", "lib_b", "lib_c"]),
            ("r3", ["zzz_1", "zzz_2"]),
            ("r4", ["zzz_1", "zzz_2"]),
            ("r5", ["solo_only"]),
        ],
        ["unique_id", "deps"],
    )
    out = {r["unique_id"]: r["cluster_id"]
           for r in fastrp_resolve(records, ["deps"], th=0.9, dim=64).collect()}
    assert len(out) == 5
    assert out["r1"] == out["r2"]
    assert out["r3"] == out["r4"]
    assert out["r1"] != out["r3"]
    assert out["r5"] not in (out["r1"], out["r3"])
