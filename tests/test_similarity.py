"""ANN tests: brute-force exactness on a known fixture; blocked-tile exactness vs
the HOF baseline; LSH recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.dedup import embedding_near_dup_pairs
from entity_resolution_spark.operators.similarity import (
    blocked_cosine_pairs,
    brute_force_topk,
    ivf_ann_topk,
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


def test_lsh_ann_topk_preserves_id_types(spark):
    """Regression: id columns must pass through with their INPUT types (the
    brute_force_topk parity the docstring promises) — string ids used to hit a
    hardcoded long schema and fail at the Arrow boundary."""
    import random

    rng = random.Random(11)
    rows = [(f"doc-{i}", [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    probes = vecs.limit(3)
    out = lsh_ann_topk(vecs, probes, k=3)
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["probe_id"] == "string" and schema["neighbor_id"] == "string"
    got = out.collect()
    assert got and all(r["probe_id"].startswith("doc-") for r in got)


def _clustered_vecs(spark, n_clusters=20, per_cluster=10, dim=8, seed=7):
    """Tight seeded clusters: center per cluster, members = center + 5% noise
    (cosine ≈ 0.995 within a cluster — the regime IVF's coarse cells index)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        for m in range(per_cluster):
            v = centers[c] + 0.05 * rng.standard_normal(dim)
            rows.append((c * per_cluster + m, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_ann_recalls_clustered_neighbors(spark):
    """On data WITH coarse structure (tight clusters), IVF at n_probe=2 of
    ~14 cells (≈14% scan) must recover nearly all true top-3 neighbors —
    the geometric-selectivity contract. (On an isotropic corpus recall
    tracks scan fraction for ANY cell index; the sketch path covers that
    regime — see the module docstring.)"""
    vecs = _clustered_vecs(spark)
    probes = vecs.where(F.col("vec_id") % 50 == 0)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, probes, k=3).collect()
    }
    approx = {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_ann_topk(vecs, probes, k=3, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_ann_deterministic_and_id_types(spark):
    """Same input → identical output across runs (seeded k-means++, fixed
    Lloyd iterations); ids pass through at their input types."""
    vecs = _clustered_vecs(spark, n_clusters=8, per_cluster=6)
    svecs = vecs.select(
        F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    probes = svecs.limit(4)
    a = sorted(map(tuple, ivf_ann_topk(svecs, probes, k=3).collect()))
    b = sorted(map(tuple, ivf_ann_topk(svecs, probes, k=3).collect()))
    assert a == b and a
    assert all(isinstance(r[0], str) and isinstance(r[1], str) for r in a)


def test_ivf_assign_cells_partitions_clusters_together(spark):
    """ivf_assign_cells is the persistent-index path: members of one tight
    cluster must land in one cell (so a cell-partitioned table co-locates
    them), and every corpus row gets exactly one cell."""
    from entity_resolution_spark.operators.similarity import (
        ivf_assign_cells,
        train_ivf_centroids,
    )

    vecs = _clustered_vecs(spark)
    cents = train_ivf_centroids(vecs, n_cells=20)
    out = ivf_assign_cells(vecs, cents).collect()
    assert len(out) == vecs.count()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["vec_id"] // 10, set()).add(r["cell"])
    frac_single = sum(1 for s in by_cluster.values() if len(s) == 1) / len(by_cluster)
    assert frac_single >= 0.9, by_cluster


# ------------------------------------------------------------------ PQ ANN


def test_pq_equals_brute_when_rerank_covers_corpus(spark):
    """With rerank >= corpus size every row is admitted and reranked by the
    EXACT cosine, so the PQ output must equal brute force bit-for-bit —
    isolating the ADC/top-R plumbing from quantization loss."""
    import numpy as np

    from entity_resolution_spark.operators.similarity import (
        brute_force_topk,
        pq_ann_topk,
    )

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.where("vec_id < 5")
    want = sorted(
        (r["probe_id"], r["rank"], r["neighbor_id"])
        for r in brute_force_topk(emb, probes, k=3).collect()
    )
    got = sorted(
        (r["probe_id"], r["rank"], r["neighbor_id"])
        for r in pq_ann_topk(emb, probes, k=3, m=4, k_codes=8, rerank=60).collect()
    )
    assert got == want


def test_pq_planted_partner_and_partition_invariance(spark):
    """Near-dup partners at cosine ≈ 0.995 must be retrieved top-1 through
    the quantized screen at rerank << N, and the result must not depend on
    the corpus partitioning."""
    import numpy as np

    from entity_resolution_spark.operators.similarity import pq_ann_topk

    rng = np.random.RandomState(23)
    base = rng.standard_normal((80, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    rows += [
        (1000 + i,
         [float(x) for x in base[i] + 0.05 * rng.standard_normal(16)])
        for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.where("vec_id < 10")

    def run(df):
        return {
            (r["probe_id"], r["rank"]): r["neighbor_id"]
            for r in pq_ann_topk(df, probes, k=3, m=4, k_codes=16, rerank=16).collect()
        }

    got = run(emb.coalesce(1))  # ONE batch of 90 rows >> rerank=16: the
    # batch-local top-16 IS the global ADC top-16 — the ground truth
    for i in range(10):
        assert got[(i, 1)] == 1000 + i  # the planted partner wins top-1
    # Multi-partition runs produce batch-local top-16 lists whose union is
    # a SUPERSET of the global top-16; the global-ADC window must discard
    # the batch-boundary surplus so every partitioning agrees with the
    # single-batch run (the pre-fix code failed exactly here: repartition(2)
    # admits ~45-row batches > rerank, changing the reranked candidate set).
    assert run(emb.repartition(2)) == got
    assert run(emb.repartition(7)) == got


def test_pq_partition_invariance_under_adc_ties(spark):
    """Duplicate vectors produce bit-identical ADC sums; batch-local top-R
    selection must break boundary ties by neighbor_id (the global window's
    order), or the pooled candidate set — and thus top-k — depends on how
    the corpus was partitioned."""
    import numpy as np

    from entity_resolution_spark.operators.similarity import pq_ann_topk

    rng = np.random.RandomState(5)
    v = rng.standard_normal(16)
    w = rng.standard_normal(16)
    rows = [(i, [float(x) for x in v]) for i in range(40)]          # 40-way tie
    rows += [(100 + i, [float(x) for x in w]) for i in range(10)]
    rows += [(900, [float(x) for x in rng.standard_normal(16)])]    # probe
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.where("vec_id = 900")

    def run(df):
        return sorted(
            (r["probe_id"], r["rank"], r["neighbor_id"])
            for r in pq_ann_topk(
                df, probes, k=5, m=4, k_codes=8, rerank=8
            ).collect()
        )

    got = run(emb.coalesce(1))
    assert run(emb.repartition(3)) == got
    assert run(emb.repartition(11)) == got
