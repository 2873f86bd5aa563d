"""ANN tests: brute-force exactness on a known fixture; blocked-tile exactness vs
the HOF baseline; LSH recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.dedup import embedding_near_dup_pairs
from entity_resolution_spark.operators.similarity import (
    blocked_cosine_pairs,
    brute_force_topk,
    lsh_ann_topk,
)


def _vecs(spark, n=60, dim=8, seed=3):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_known(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    probes = vecs.where("vec_id = 0")
    got = [
        (r["neighbor_id"], r["rank"])
        for r in brute_force_topk(vecs, probes, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_blocked_tiles_match_hof_baseline(spark):
    vecs = _vecs(spark)
    th = 0.5
    base = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 6)
        for r in embedding_near_dup_pairs(vecs, threshold=th).collect()
    }
    tiles = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 6)
        for r in blocked_cosine_pairs(vecs, threshold=th, n_buckets=4).collect()
    }
    assert set(base) == set(tiles)
    for k in base:
        assert abs(base[k] - tiles[k]) < 1e-9


def test_lsh_recall_vs_brute_force(spark):
    vecs = _vecs(spark, n=100)
    probes = vecs.where("vec_id < 10")
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, probes, k=3).collect()
    }
    approx = {
        (r["probe_id"], r["neighbor_id"])
        for r in lsh_ann_topk(vecs, probes, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 256-bit Hamming screen at the default radius catches nearly all true
    # neighbors on random 8-dim vectors (E[ham] well inside radius at cos>0.3)
    assert recall >= 0.9, recall


def test_blocked_cosine_pairs_more_buckets_than_vectors(spark):
    """Regression: a 3-vector input with n_buckets=8 leaves most buckets empty;
    mixed tiles must return empty instead of crashing np.stack."""
    from entity_resolution_spark.operators.similarity import blocked_cosine_pairs

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = blocked_cosine_pairs(vecs, threshold=0.9, n_buckets=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
