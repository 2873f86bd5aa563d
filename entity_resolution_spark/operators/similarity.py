"""Similarity search over embedding columns: brute-force cosine top-k + ANN.

The reference compares dense vectors only pairwise inside blocks (BERT/TF-IDF cosine,
``am_combiner/combiners/tfidf.py:199-217``); a training-data pipeline additionally
needs *search*: given probe vectors, the k nearest corpus vectors.

- ``brute_force_topk``: exact — probe × corpus join with JVM ``zip_with`` dot
  products, window row_number for top-k. O(P·N); right when P is small or as the
  per-bucket step below.
- ``lsh_ann_topk``: scale path #1 — Charikar sign sketches (256-bit hyperplane
  signature per vector), XOR+popcount Hamming screen against broadcast probe
  sketches, exact cosine rerank inside the radius. One linear scan over packed
  32-byte sketches instead of float vectors; recall set by the Hamming radius.
- ``ivf_ann_topk``: scale path #2 — IVF (inverted-file) coarse quantization: a
  seeded spherical k-means over a deterministic corpus sample trains the cell
  centroids; each corpus vector is assigned to its nearest cell and only the
  ``n_probe`` cells nearest each probe are exact-reranked. Candidate volume
  ≈ N·n_probe/n_cells — the selectivity dial is geometric (cells), where the
  sketch path's is statistical (radius). On a persistent 100 TB deployment the
  cell assignment is the precomputed index column (partition the table by
  cell; probes touch n_probe partitions), which is why the assignment step is
  exposed separately as :func:`ivf_assign_cells`.

Hyperplanes/centroid seeds are literal constants (deterministic across
runs/cluster sizes, like FastRP's id-seeded projections,
``am_combiner/combiners/fastRP.py:62-67``).
"""

from __future__ import annotations

import numpy as _np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolution_spark.functions.vectors import cosine_array_cols


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str | None = None,
) -> DataFrame:
    """For each probe vector, the k nearest corpus vectors by cosine (excluding self).

    Output: (probe_id, neighbor_id, cosine, rank). Deterministic: ties broken by
    neighbor id. The corpus side streams; the probe side is broadcast when small.
    """
    probe_id_col = probe_id_col or id_col
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine_array_cols(F.col("_pv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def blocked_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int | None = None,
    target_bucket_size: int = 2000,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via bucket-pair blocked matrix products.

    The N² pair space is tiled into (P choose 2)+P bucket pairs; each tile is one
    ``applyInPandas`` group doing a single numpy/BLAS matmul — the Arrow-vectorized
    replacement for a per-pair higher-order-function cosine (~100× faster, no
    per-row Python). Each vector is replicated P times (once per tile it touches);
    a pair (i, j) is evaluated in exactly one tile (bucket(i), bucket(j)), so no
    dedup shuffle is needed. Deterministic: buckets come from a hash of the id.

    At cluster scale the tile size is bounded by |bucket|² and P is chosen so a
    tile's two bucket slices fit in executor memory — the same block-size-capping
    discipline as the ER blocking stage.
    """
    import numpy as np
    import pandas as pd

    if n_buckets is None:
        # P grows with N so tile size (≈ (N/P)² dots) and per-tile memory stay
        # bounded as the corpus scales; replication cost is P× per vector, so P
        # tracks N/target rather than a fixed constant.
        n = vectors.count()
        n_buckets = max(4, -(-n // target_bucket_size))

    b = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets))
    base = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), b.alias("_b")
    )
    # replicate each vector into every tile (min(b,q), max(b,q)) it participates in
    tiles = base.select(
        "_id",
        "_v",
        "_b",
        F.explode(F.array(*[F.lit(q) for q in range(n_buckets)])).alias("_q"),
    ).select(
        "_id",
        "_v",
        "_b",
        F.least("_b", "_q").alias("_p1"),
        F.greatest("_b", "_q").alias("_p2"),
    ).dropDuplicates(["_id", "_p1", "_p2"])

    th = float(threshold)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        p1 = int(pdf["_p1"].iloc[0])
        p2 = int(pdf["_p2"].iloc[0])
        left = pdf[pdf["_b"] == p1]
        ids_l = left["_id"].to_numpy()
        # emptiness guards BEFORE np.stack (np.stack raises on an empty slice —
        # a bucket can be empty whenever n_vectors < n_buckets)
        if p1 == p2 and len(ids_l) < 2:
            return _empty()
        if not len(ids_l):
            return _empty()
        m_l = np.stack(left["_v"].to_numpy()).astype(np.float64)
        norms_l = np.linalg.norm(m_l, axis=1)
        norms_l[norms_l == 0] = 1.0
        m_l = m_l / norms_l[:, None]
        if p1 == p2:
            sims = m_l @ m_l.T
            iu, ju = np.triu_indices(len(ids_l), k=1)
            mask = sims[iu, ju] >= th
            ia, jb = ids_l[iu[mask]], ids_l[ju[mask]]
            cs = sims[iu, ju][mask]
        else:
            right = pdf[pdf["_b"] == p2]
            ids_r = right["_id"].to_numpy()
            if not len(ids_r):
                return _empty()
            m_r = np.stack(right["_v"].to_numpy()).astype(np.float64)
            norms_r = np.linalg.norm(m_r, axis=1)
            norms_r[norms_r == 0] = 1.0
            m_r = m_r / norms_r[:, None]
            sims = m_l @ m_r.T
            ii, jj = np.where(sims >= th)
            ia, jb = ids_l[ii], ids_r[jj]
            cs = sims[ii, jj]
        lo = np.minimum(ia, jb)
        hi = np.maximum(ia, jb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cs})

    return tiles.groupBy("_p1", "_p2").applyInPandas(
        tile, schema="id_a long, id_b long, cosine double"
    )


# deterministic sketch planes: fixed literal seed, MT19937 stream is stable
# across numpy versions/platforms by spec — every executor derives the SAME
# planes, every run, every cluster size (FastRP-style seeded determinism)
_SKETCH_SEED = 0x5EEDC0DE

# byte-popcount lookup (numpy < 2.0 has no bitwise_count)
_POPCNT8 = _np.unpackbits(
    _np.arange(256, dtype=_np.uint8)[:, None], axis=1
).sum(axis=1).astype(_np.int32)


def _pack_signs(mat, planes):
    """Rows × dim float → rows × (bits/8) uint8 sign-sketch (bit b = v·h_b > 0)."""
    signs = (mat @ planes.T) > 0  # rows × bits bool
    return _np.packbits(signs, axis=1)


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str | None = None,
    sketch_bits: int = 256,
    hamming_radius: int | None = None,
) -> DataFrame:
    """Approximate top-k by Hamming-ranked sign sketches + exact rerank.

    Round-2's bucket-join schedule (few planes × many tables) was slower than
    the brute force it approximates: at the corpus's neighbor similarity
    (cosine ≈ 0.3, per-plane agreement p ≈ 0.6, barely above the 0.5 of random
    pairs) bucket LSH must either miss neighbors or flood candidates. The scale
    design here is Charikar-sketch *ranking* instead of bucketing:

    - every vector gets a ``sketch_bits``-bit hyperplane sign sketch
      (one matmul + packbits per Arrow batch — 32 bytes/vector at 256 bits);
    - one pass over the corpus screens ALL vectors against the broadcast probe
      sketches with XOR+popcount (≈16× cheaper per candidate than a 64-dim
      float dot, and the sketch array is what a 100 TB deployment keeps hot);
    - rows within ``hamming_radius`` are exact-reranked with the true cosine
      (the vectors are in the same partition — no second pass, no shuffle);
    - a final per-probe window takes the global top-k.

    E[hamming] = bits·θ/π, σ ≈ √(bits)/2: the default radius
    ``bits/2 − 1.6·√bits/2`` (115 at 256) admits ≈5% of random directions
    while catching ≥95% of cosine ≳ 0.3 neighbors — the recall/scan dial the
    bench gate measures. Output schema matches :func:`brute_force_topk`
    (rank may differ where recall < 1).
    """
    import pandas as pd

    probe_id_col = probe_id_col or id_col
    if hamming_radius is None:
        hamming_radius = int(sketch_bits / 2 - 1.6 * (sketch_bits ** 0.5) / 2)

    # id columns pass through with their INPUT types (long, string, …) — the
    # brute_force_topk parity the docstring promises, not a hardcoded long
    pid_t = probes.select(probe_id_col).schema.fields[0].dataType.simpleString()
    nid_t = corpus.select(id_col).schema.fields[0].dataType.simpleString()
    scan_schema = f"probe_id {pid_t}, neighbor_id {nid_t}, cosine double"

    # the probe side is small by contract (same as brute_force_topk's
    # broadcast) — ship ids/vectors to every scan task via Spark broadcast
    probe_rows = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    ).collect()
    if not probe_rows:
        return corpus.sparkSession.createDataFrame(
            [], scan_schema + ", rank int"
        )
    p_ids = _np.array([r["probe_id"] for r in probe_rows])
    p_mat = _np.stack([_np.asarray(r["_pv"], dtype=_np.float64) for r in probe_rows])
    p_norms = _np.linalg.norm(p_mat, axis=1)
    p_norms[p_norms == 0] = 1.0
    p_unit = p_mat / p_norms[:, None]
    dim = p_mat.shape[1]
    planes = _np.random.RandomState(_SKETCH_SEED).standard_normal((sketch_bits, dim))
    p_sk = _pack_signs(p_unit, planes)
    bc = corpus.sparkSession.sparkContext.broadcast(
        {"ids": p_ids, "unit": p_unit, "sk": p_sk}
    )
    radius = int(hamming_radius)

    def scan(batches):
        pb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            mat = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf["_v"].to_numpy()]
            )
            norms = _np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            sk = _pack_signs(unit, planes)
            # N×P hamming via byte-XOR + popcount lookup
            ham = _POPCNT8[sk[:, None, :] ^ pb["sk"][None, :, :]].sum(axis=2)
            ci, pi = _np.where(
                (ham <= radius) & (ids[:, None] != pb["ids"][None, :])
            )
            if not len(ci):
                continue
            cosine = _np.einsum("ij,ij->i", unit[ci], pb["unit"][pi])
            yield pd.DataFrame(
                {
                    "probe_id": pb["ids"][pi],
                    "neighbor_id": ids[ci],
                    "cosine": _np.round(cosine, 6),
                }
            )

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    scored = c.mapInPandas(scan, schema=scan_schema)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def _spherical_kmeans(unit: "_np.ndarray", n_cells: int, seed: int, n_iter: int = 10):
    """Seeded k-means++ init + fixed-iteration Lloyd on the unit sphere
    (assignment by max dot == min cosine distance; centroids re-normalized).
    Driver-side over a bounded sample — deterministic by construction (fixed
    seed, fixed iteration count, no convergence-dependent stopping)."""
    n = len(unit)
    n_cells = max(1, min(n_cells, n))
    rng = _np.random.RandomState(seed)
    cents = [unit[int(rng.randint(n))]]
    d = _np.clip(1.0 - unit @ cents[0], 0.0, None)
    for _ in range(1, n_cells):
        tot = float(d.sum())
        if tot <= 0.0:
            idx = int(rng.randint(n))
        else:
            idx = min(
                int(_np.searchsorted(_np.cumsum(d), rng.uniform(0.0, tot))), n - 1
            )
        cents.append(unit[idx])
        d = _np.minimum(d, _np.clip(1.0 - unit @ cents[-1], 0.0, None))
    cmat = _np.stack(cents)
    for _ in range(n_iter):
        assign = _np.argmax(unit @ cmat.T, axis=1)
        for c in range(n_cells):
            members = assign == c
            if members.any():
                v = unit[members].sum(axis=0)
                norm = float(_np.linalg.norm(v))
                if norm > 0:
                    cmat[c] = v / norm
    return cmat


def _unit_rows(mat: "_np.ndarray") -> "_np.ndarray":
    norms = _np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 8192,
    seed: int = _SKETCH_SEED,
) -> "_np.ndarray":
    """Coarse-quantizer centroids from a DETERMINISTIC corpus sample: the
    hash-sampled rows with the ``sample_rows`` smallest id hashes
    (TakeOrderedAndProject — the ordering makes the sample independent of
    partition layout, so the trained quantizer is identical at any
    parallelism; a bare ``limit`` would take whichever rows arrived first).
    Default ``n_cells`` ≈ √N (the classical IVF balance point: cell size ≈
    scan-list size ≈ √N)."""
    n = corpus.count()
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    if n_cells is None:
        n_cells = max(4, int(n ** 0.5))
    every = max(1, n // sample_rows)
    samp = (
        corpus.select(
            F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("_h"),
        )
        .where(F.pmod("_h", F.lit(every)) == 0)
        .orderBy("_h")
        .limit(sample_rows)
        .collect()
    )
    mat = _np.stack([_np.asarray(r["_v"], dtype=_np.float64) for r in samp])
    return _spherical_kmeans(_unit_rows(mat), n_cells, seed)


def ivf_assign_cells(
    corpus: DataFrame,
    centroids: "_np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) → (id, vec, cell): nearest-centroid assignment, one Arrow
    batch matmul per task against the broadcast centroid matrix. At deployment
    scale this column IS the IVF index — write the table partitioned/bucketed
    by ``cell`` and a probe touches only its ``n_probe`` cells' files."""
    import pandas as pd

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    nid_t = corpus.select(id_col).schema.fields[0].dataType.simpleString()
    vec_t = corpus.select(vec_col).schema.fields[0].dataType.simpleString()

    def assign(batches):
        cmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            unit = _unit_rows(
                _np.stack(
                    [_np.asarray(v, dtype=_np.float64) for v in pdf["_v"].to_numpy()]
                )
            )
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"],
                    vec_col: pdf["_v"],
                    "cell": _np.argmax(unit @ cmat.T, axis=1).astype(_np.int32),
                }
            )

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return c.mapInPandas(
        assign, schema=f"{id_col} {nid_t}, {vec_col} {vec_t}, cell int"
    )


def ivf_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str | None = None,
    n_cells: int | None = None,
    n_probe: int = 4,
    sample_rows: int = 8192,
    seed: int = _SKETCH_SEED,
    centroids: "_np.ndarray | None" = None,
) -> DataFrame:
    """Approximate top-k via IVF coarse quantization + exact rerank.

    One fused scan over the corpus: each Arrow batch assigns its rows to
    cells (matmul vs broadcast centroids), admits a row only for the probes
    whose ``n_probe`` nearest cells include that row's cell, and computes the
    exact cosine for the admitted (row, probe) pairs; a final window takes the
    per-probe top-k. Output schema matches :func:`brute_force_topk` with ids
    passing through at their input types.

    Pass ``centroids`` (from :func:`train_ivf_centroids`) to reuse a trained
    quantizer — the persistent-index deployment path; otherwise a
    deterministic sample trains one inline.
    """
    import pandas as pd

    probe_id_col = probe_id_col or id_col
    pid_t = probes.select(probe_id_col).schema.fields[0].dataType.simpleString()
    nid_t = corpus.select(id_col).schema.fields[0].dataType.simpleString()
    scan_schema = f"probe_id {pid_t}, neighbor_id {nid_t}, cosine double"

    probe_rows = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    ).collect()
    if not probe_rows:
        return corpus.sparkSession.createDataFrame([], scan_schema + ", rank int")

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, id_col=id_col, vec_col=vec_col,
            sample_rows=sample_rows, seed=seed,
        )
    n_cells_eff = len(centroids)
    n_probe = max(1, min(n_probe, n_cells_eff))

    p_ids = _np.array([r["probe_id"] for r in probe_rows])
    p_unit = _unit_rows(
        _np.stack([_np.asarray(r["_pv"], dtype=_np.float64) for r in probe_rows])
    )
    # probed[cell, probe] = does this probe scan this cell
    order = _np.argsort(-(p_unit @ centroids.T), axis=1)[:, :n_probe]
    probed = _np.zeros((n_cells_eff, len(p_ids)), dtype=bool)
    for pi in range(len(p_ids)):
        probed[order[pi], pi] = True
    bc = corpus.sparkSession.sparkContext.broadcast(
        {"ids": p_ids, "unit": p_unit, "cents": centroids, "probed": probed}
    )

    def scan(batches):
        pb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            unit = _unit_rows(
                _np.stack(
                    [_np.asarray(v, dtype=_np.float64) for v in pdf["_v"].to_numpy()]
                )
            )
            cells = _np.argmax(unit @ pb["cents"].T, axis=1)
            adm = pb["probed"][cells] & (ids[:, None] != pb["ids"][None, :])
            ci, pi = _np.where(adm)
            if not len(ci):
                continue
            cosine = _np.einsum("ij,ij->i", unit[ci], pb["unit"][pi])
            yield pd.DataFrame(
                {
                    "probe_id": pb["ids"][pi],
                    "neighbor_id": ids[ci],
                    "cosine": _np.round(cosine, 6),
                }
            )

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    scored = c.mapInPandas(scan, schema=scan_schema)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


# --- Product quantization (PQ) ANN -----------------------------------------


def _l2_kmeans(x: "_np.ndarray", k: int, seed: int, n_iter: int = 10):
    """Seeded k-means++ init + fixed-iteration Lloyd under squared-L2 — the
    subspace quantizer PQ trains (Jégou et al. 2011, §III). Deterministic by
    construction: fixed seed, fixed iterations, empty clusters keep their
    previous centroid."""
    n = len(x)
    k = max(1, min(k, n))
    rng = _np.random.RandomState(seed)
    cents = [x[int(rng.randint(n))]]
    d = ((x - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d.sum())
        if tot <= 0.0:
            idx = int(rng.randint(n))
        else:
            idx = min(
                int(_np.searchsorted(_np.cumsum(d), rng.uniform(0.0, tot))),
                n - 1,
            )
        cents.append(x[idx])
        d = _np.minimum(d, ((x - cents[-1]) ** 2).sum(axis=1))
    cmat = _np.stack(cents)
    for _ in range(n_iter):
        d2 = (
            (x**2).sum(axis=1)[:, None]
            - 2.0 * (x @ cmat.T)
            + (cmat**2).sum(axis=1)[None, :]
        )
        assign = _np.argmin(d2, axis=1)
        for c in range(k):
            members = assign == c
            if members.any():
                cmat[c] = x[members].mean(axis=0)
    return cmat


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 8192,
    seed: int = _SKETCH_SEED,
) -> list:
    """Per-subspace PQ codebooks from the SAME deterministic hash sample as
    the IVF trainer: unit-normalize the sampled vectors (ADC inner product
    over unit rows == cosine), split dimensions into ``m`` contiguous
    subspaces, L2-k-means each with ``k_codes`` centroids. Returns a list of
    m (k_codes × d_sub) arrays. Sample-bounded driver work; the trained
    codebooks broadcast at ~m·k·d·8 bytes (a few KB)."""
    n = corpus.count()
    if n == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    every = max(1, n // sample_rows)
    samp = (
        corpus.select(
            F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("_h"),
        )
        .where(F.pmod("_h", F.lit(every)) == 0)
        .orderBy("_h")
        .limit(sample_rows)
        .collect()
    )
    unit = _unit_rows(
        _np.stack([_np.asarray(r["_v"], dtype=_np.float64) for r in samp])
    )
    splits = _np.array_split(_np.arange(unit.shape[1]), m)
    return [
        _l2_kmeans(unit[:, idx], k_codes, seed + s)
        for s, idx in enumerate(splits)
    ]


def pq_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str | None = None,
    m: int = 4,
    k_codes: int = 16,
    rerank: int = 32,
    sample_rows: int = 8192,
    seed: int = _SKETCH_SEED,
    codebooks: "list | None" = None,
) -> DataFrame:
    """Approximate top-k via product quantization + asymmetric distance
    (Jégou et al. 2011) with exact rerank — the MEMORY-bound ANN scale tier
    (IVF bounds the rows scanned; PQ bounds the BYTES per row: m code bytes
    instead of d floats, the standard shape for RAM-resident indexes over
    10^11 vectors).

    One fused corpus scan: each Arrow batch encodes its rows (per-subspace
    argmin against the broadcast codebooks — at 100 TB the codes would be
    precomputed once and stored as an m-byte column; the fused encode keeps
    this operator self-contained), scores ALL probes with the ADC lookup
    tables (probe × subspace × code inner-product tables built once
    driver-side), keeps each probe's batch-local top-``rerank`` candidates,
    and computes their EXACT cosine; a first window then takes the GLOBAL
    ADC top-``rerank`` per probe (every global-ADC-top-R row is necessarily
    in its own batch's top-R, so the union of batch lists always contains
    it — the result is exactly "global ADC top-R, exact-reranked", fully
    independent of the corpus partitioning), and the final window ranks
    those by the exact value. Recall loss comes only from PQ distortion
    dropping a true neighbor below global ADC rank ``rerank``
    (planted-partner gate in bench.py).

    Probes are contract-small (collected + broadcast, like
    :func:`brute_force_topk` / :func:`ivf_ann_topk`)."""
    import pandas as pd

    probe_id_col = probe_id_col or id_col
    pid_t = probes.select(probe_id_col).schema.fields[0].dataType.simpleString()
    nid_t = corpus.select(id_col).schema.fields[0].dataType.simpleString()
    scan_schema = f"probe_id {pid_t}, neighbor_id {nid_t}, adc double, cosine double"

    probe_rows = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    ).collect()
    if not probe_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"probe_id {pid_t}, neighbor_id {nid_t}, cosine double, rank int"
        )

    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, m=m, k_codes=k_codes, id_col=id_col, vec_col=vec_col,
            sample_rows=sample_rows, seed=seed,
        )
    p_ids = _np.array([r["probe_id"] for r in probe_rows])
    p_unit = _unit_rows(
        _np.stack([_np.asarray(r["_pv"], dtype=_np.float64) for r in probe_rows])
    )
    d = p_unit.shape[1]
    splits = _np.array_split(_np.arange(d), len(codebooks))
    # ADC tables: tables[s][probe, code] = <probe_sub, centroid>
    tables = [
        p_unit[:, idx] @ cb.T for idx, cb in zip(splits, codebooks)
    ]
    bc = corpus.sparkSession.sparkContext.broadcast(
        {
            "ids": p_ids, "unit": p_unit, "cb": codebooks,
            "splits": [idx for idx in splits], "tables": tables,
            "rerank": int(rerank),
        }
    )

    def scan(batches):
        pb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            unit = _unit_rows(
                _np.stack(
                    [_np.asarray(v, dtype=_np.float64) for v in pdf["_v"].to_numpy()]
                )
            )
            napprox = _np.zeros((len(ids), len(pb["ids"])))
            for idx, cb, tab in zip(pb["splits"], pb["cb"], pb["tables"]):
                sub = unit[:, idx]
                # encode: argmin squared-L2 == argmax (2x·c − ||c||²)
                codes = _np.argmax(
                    2.0 * (sub @ cb.T) - (cb**2).sum(axis=1)[None, :], axis=1
                )
                napprox += tab[:, codes].T  # (rows, probes)
            # per-probe batch-local top-R by ADC score, self-pairs excluded.
            # Boundary ties are broken by ascending neighbor_id — the SAME
            # order as the global-ADC window downstream. A bare argpartition
            # keeps an ARBITRARY subset of rows tied at the rank-R value
            # (duplicate/templated vectors produce bit-identical ADC sums),
            # which could evict the tied row the global window defines as
            # top-R, making the pooled set batch-boundary-dependent again.
            napprox[ids[:, None] == pb["ids"][None, :]] = -_np.inf
            r = min(pb["rerank"], len(ids))
            sel_r: list = []
            sel_p: list = []
            for j in range(napprox.shape[1]):
                col = napprox[:, j]
                if r >= len(col):
                    idx = _np.nonzero(col > -_np.inf)[0]
                else:
                    kth = -_np.partition(-col, r - 1)[r - 1]
                    if kth == -_np.inf:
                        idx = _np.nonzero(col > -_np.inf)[0]
                    else:
                        gt = _np.nonzero(col > kth)[0]
                        ties = _np.nonzero(col == kth)[0]
                        need = r - len(gt)
                        if need < len(ties):
                            ties = ties[
                                _np.argsort(ids[ties], kind="stable")[:need]
                            ]
                        idx = _np.concatenate([gt, ties])
                sel_r.append(idx)
                sel_p.append(_np.full(len(idx), j, dtype=_np.int64))
            ci = _np.concatenate(sel_r)
            pi = _np.concatenate(sel_p)
            if not len(ci):
                continue
            cosine = _np.einsum("ij,ij->i", unit[ci], pb["unit"][pi])
            yield pd.DataFrame(
                {
                    "probe_id": pb["ids"][pi],
                    "neighbor_id": ids[ci],
                    "adc": napprox[ci, pi],
                    "cosine": _np.round(cosine, 6),
                }
            )

    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    scored = c.mapInPandas(scan, schema=scan_schema)
    # GLOBAL ADC top-R per probe: every global-top-R row is necessarily in
    # its own batch's top-R, so the union of batch-local lists contains it;
    # this window discards the batch-boundary-dependent surplus, making the
    # reranked candidate set exactly "global ADC top-R" regardless of how
    # the corpus was partitioned (the partition-invariance test constructs
    # batches larger than rerank to exercise it).
    wa = Window.partitionBy("probe_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    pooled = (
        scored.withColumn("_ar", F.row_number().over(wa))
        .where(F.col("_ar") <= int(rerank))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pooled.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
