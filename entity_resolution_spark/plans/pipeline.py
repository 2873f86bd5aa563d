"""The end-to-end entity-resolution pipeline.

Stage DAG (each stage optionally checkpointed, mirrors the reference's
load → extract → block → combine → store flow, ``README.md:113-122``):

  repo_files ──► features ──► block assignments ──► candidate pairs
        │            │                                  │
        │            └── tfidf vectors ─────────────────┤
        │                                               ▼
        │                                     pair features → scores
        │                                               ▼
        │                                    match edges (threshold, splitter)
        │                                               ▼
        └────────────────────────────► clusters (connected components)

Every record keeps ``content_sha`` from the first stage; the final output re-joins
it so the sha256 integrity invariant is auditable end-to-end (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions import text as TX
from entity_resolution_spark.functions.hashing import content_sha, unique_id
from entity_resolution_spark.functions.vectors import tfidf_vectors
from entity_resolution_spark.operators.blocking import BlockingConfig, block_assignments
from entity_resolution_spark.operators.components import connected_components
from entity_resolution_spark.operators.pairs import candidate_pairs
from entity_resolution_spark.operators.scoring import (
    ScorerWeights,
    build_pair_features,
    logistic_score,
    match_edges,
)
from entity_resolution_spark.plans.checkpoint import CheckpointStore


@dataclass
class PipelineConfig:
    shingle_k: int = 5
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scorer: ScorerWeights = field(default_factory=ScorerWeights)
    # min_df=2 prunes hapax shingles from the TF-IDF vectors. df=1 terms appear
    # in exactly one document, so they contribute 0 to every pair dot product —
    # pruning is lossless for the cosine numerator and only shrinks norms/unions,
    # i.e. scores can only rise. It is also the big payload lever: the pair join
    # ships these arrays, and the hapax tail is the bulk of the vocabulary
    # (reference analog: TfidfVectorizer min_df=5, am_combiner/dataloop.py:33-36).
    min_df: int = 2
    max_df_frac: float = 1.0
    # Hard cap on TF-IDF vector width (top-k by weight, renormalized). The pair
    # join ships terms/weights arrays through the shuffle TWICE — unbounded
    # vectors made match_edges shuffle-payload-bound (flat 4→16 cores, BENCH
    # round 1). 128 is the largest sweep value holding the e2e F1 gate at 1.0
    # (sweep None/256/128 → 1.0, 64 → 0.9927, 32 → 0.9468; tools/debug_recall.py).
    tfidf_top_k: int | None = 128
    use_splitter: bool = True        # negative-evidence: lang mismatch breaks edges
    # Drop candidate pairs whose two sides are byte-identical duplicates —
    # the exact family's star already carries their connectivity, so the wide
    # vector probe + scorer pass over them is pure redundancy. The dup map
    # costs one narrow groupBy and is sized by the actual duplicate
    # population (empty ⇒ the filter joins are no-ops), so duplicate-free
    # corpora pay ~nothing and a boilerplate-heavy web corpus saves O(n·cap)
    # wide rows per n-copy family (pairs.drop_sha_covered_pairs).
    dedup_covered_pairs: bool = True
    # Submit the vectors and assignments stages from two driver threads. The
    # two subtrees are independent (both read only `features`); each runs
    # build-time driver actions — the TF-IDF vocab census collect+save and the
    # blocking families' eager checkpoints — that otherwise serialize.
    # Spark's per-block cache locks make the shared `features`
    # materialization race-free (each partition computed once; the other
    # job's task blocks on the lock then reads the cached block), and the
    # subtrees never interact, so results are bit-identical either way.
    # Measured NEUTRAL on the 703k-file corpus at local[16] (min-of-3
    # alternating: 84.4s concurrent vs 83.8s sequential): the census collect
    # is itself a parallel job, so the truly serial driver window is only the
    # ~1-2s np.save — there is little idle time to reclaim in local mode.
    # Default off; turn on where driver→cluster round-trips are long (remote
    # driver, busy scheduler) and the overlap window is real.
    concurrent_stages: bool = False


def extract_features(
    repo_files: DataFrame, cfg: PipelineConfig, keep: list[str] | None = None
) -> DataFrame:
    """The visitor stage: derive ids + typed feature columns, never touching content.

    (Reference: visitors mutate Article objects in place,
    ``am_combiner/features/frontend.py:24-43``; here each feature is a column and
    ``content`` itself is only read, never rewritten — the sha256 invariant.)
    """
    # The tokenize → shingle → fingerprint loop is the hot visitor. The pure-JVM
    # higher-order-function version (functions.hashing.hashed_shingles /
    # rolling_fingerprints) evaluates interpreted lambdas per token element and
    # measured FLAT across cores inside one local-mode JVM (~60s on 175k files
    # at 4 AND 16 cores — PLANS.md round-2 audit). The Arrow kernel
    # (functions.fast_text.code_features: C-speed crc32 + vectorized numpy
    # polynomial window hashes in separate Python worker processes) computes the
    # same three columns scalably; shingles are stored HASHED (array<long>):
    # 4-6× less shuffle width than raw strings, long-compare intersects, and
    # minhash / TF-IDF downstream operate on the hashes directly.
    from entity_resolution_spark.functions.fast_text import code_features

    with_cf = repo_files.select(
        unique_id().alias("unique_id"),
        "repo",
        "path",
        "commit",
        "lang",
        content_sha().alias("content_sha"),
        TX.path_stem("path").alias("stem"),
        TX.path_tokens("path").alias("path_toks"),
        code_features(F.col("content"), cfg.shingle_k).alias("_cf"),
        *[F.col(c) for c in (keep or [])],
    )
    return with_cf.select(
        *[F.col(c) for c in (keep or [])],
        "unique_id",
        "repo",
        "path",
        "commit",
        "lang",
        "content_sha",
        "stem",
        "path_toks",
        F.col("_cf.shingles").alias("shingles"),
        F.col("_cf.fingerprints").alias("fingerprints"),
        F.col("_cf.minhash").alias("minhash"),
        F.col("_cf.n_tokens").alias("n_tokens"),
    )


def bump_block_sizes(assignments: DataFrame, cfg: "PipelineConfig") -> DataFrame:
    """Per-record ``block_n`` for the large-block threshold bump (reference's
    +0.02-over-400 anti-overcombination guard) — sized only as far as blocks
    can actually exceed ``large_block_size``:

    - capped families are bounded by ``block_cap``, so when
      ``large_block_size >= block_cap`` they can never trigger the bump and
      the full-volume sizing pass over the assignment fan-out is skipped;
    - exact (sha) blocks are NEVER capped (their pairs are stars), so they can
      exceed the trigger under ANY geometry: size just those (one assignment
      row per record) and keep only the over-threshold families — on real
      corpora this frame is empty-or-tiny (a single content sha with more
      than ``large_block_size`` byte-identical copies), so the downstream
      feat join builds against a broadcast-sized side. A 500-copy boilerplate
      family therefore still bumps its members' MIXED pairs against
      near-variant files, which the geometry shortcut alone would miss.
    """
    if cfg.scorer.large_block_size < cfg.blocking.block_cap:
        return (
            assignments.groupBy("block_key")
            .agg(F.count("*").alias("_n"))
            .hint("shuffle_hash")   # build on the aggregated (1 row/key) side;
            .join(assignments, "block_key")  # nothing sorts the exploded side
            .groupBy("unique_id")
            .agg(F.max("_n").alias("block_n"))
        )
    ex = assignments.where(F.col("is_exact")).select("unique_id", "block_key")
    big = (
        ex.groupBy("block_key")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cfg.scorer.large_block_size)
    )
    return (
        ex.join(F.broadcast(big), "block_key")
        .groupBy("unique_id")
        .agg(F.max("_n").alias("block_n"))
    )


def resolve(
    spark,
    repo_files: DataFrame,
    cfg: PipelineConfig | None = None,
    store: CheckpointStore | None = None,
    eager: bool = False,
    timings: dict | None = None,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every stage DataFrame keyed by stage name.

    With a ``CheckpointStore``, each stage is written (Iceberg-style) and re-read, and
    a re-run after a crash resumes from the last completed stage (input-signature
    guarded) — the reference's cache-resume pattern generalized.
    """
    cfg = cfg or PipelineConfig()
    sig = "v3"  # bumped when pipeline logic changes; a content hash at production scale
    persisted: list = []  # intermediates to unpersist via release() — a long-lived
    # session (streaming foreachBatch) would otherwise accumulate cached frames

    def stage(name: str, compute):
        import time as _time

        t0 = _time.monotonic()
        if store is not None:
            out = store.get_or_compute(name, compute, input_signature=sig)
        else:
            # no store: cache the stage so downstream actions don't recompute the DAG
            out = compute().persist()
            persisted.append(out)
            if eager:
                out.count()
        if timings is not None:
            timings[name] = round(_time.monotonic() - t0, 2)
        return out

    features = stage("features", lambda: extract_features(repo_files, cfg))
    # Id narrowing: the sha-hex unique_id is a 64-BYTE string, and the middle
    # stages (blocking, pair join, edges, CC) carry it in every shuffle key and
    # sort. Swap to an int64 surrogate for those stages (8 bytes, integer
    # compares in the sort-merge joins — measured 27% faster pair join) and map
    # back to the string id at the cluster stage. Collision risk n²/2^65 —
    # at 10^12 records switch to the 128-bit pair (functions/hashing.long_id
    # documents the one-line change).
    fi = features.withColumn("unique_id_str", F.col("unique_id")).withColumn(
        "unique_id", F.xxhash64("unique_id")
    )
    vec_fn = lambda: tfidf_vectors(  # noqa: E731
        fi, "unique_id", "shingles", cfg.min_df, cfg.max_df_frac,
        top_k=cfg.tfidf_top_k, persisted=persisted,
        # extract_features' Arrow tokenizer np.unique's each shingle array
        # (fast_text.py:82) → tf≡1: skip the tf shuffle and keep rows
        # doc-clustered so the vector assembly agg scales with cores
        terms_distinct=True,
    )
    asg_fn = lambda: block_assignments(  # noqa: E731
        fi, cfg.blocking, persisted=persisted
    )
    if cfg.concurrent_stages:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as _ex:
            _fv = _ex.submit(stage, "vectors", vec_fn)
            _fa = _ex.submit(stage, "assignments", asg_fn)
            vectors = _fv.result()
            assignments = _fa.result()
    else:
        vectors = stage("vectors", vec_fn)
        assignments = stage("assignments", asg_fn)
    def compute_pairs():
        p = candidate_pairs(assignments)
        if cfg.dedup_covered_pairs:
            from entity_resolution_spark.operators.pairs import drop_sha_covered_pairs

            p = drop_sha_covered_pairs(p, fi)
        return p

    pairs = stage("candidate_pairs", compute_pairs)

    def compute_edges():
        block_sizes = bump_block_sizes(assignments, cfg)
        # block_n joins into the per-record feat frame and rides through the
        # scoring kernel; the splitter is a predicate on pair features already
        # computed (same_lang/exact) — the old post-scoring joins re-derived
        # both from fi at the cost of two broadcast builds per run
        pf = build_pair_features(
            pairs, fi, vectors, persisted=persisted, block_sizes=block_sizes
        )
        scored = logistic_score(pf, cfg.scorer)
        if cfg.use_splitter:
            # delete-negative-edges semantics (splitters.py): lang must agree
            # unless content is byte-identical; null lang on either side splits
            scored = scored.where(
                (F.col("same_lang") == 1.0) | (F.col("exact") == 1.0)
            )
        return match_edges(scored, cfg.scorer)

    edges = stage("match_edges", compute_edges)

    def compute_clusters():
        labels = connected_components(
            edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        ).persist()
        # The labeling joins probe with rows carrying the 64-char string id +
        # sha; shuffling those across cores is the one clusters-stage cost
        # that GROWS with core count (sliver partitions of a small frame).
        # labels has one row per matched record — when it is broadcast-sized
        # (it is, whenever CC took the small-graph union-find path), both
        # joins become map-side and the stage stops anti-scaling. Larger label
        # sets (true cluster scale) hash-build instead: the probe side
        # streams, nothing sorts. The count is cheap: CC returns a
        # materialized frame on the small path, and the loop path's output
        # is one narrow agg over a checkpointed edge set.
        # ~1M (long,long) label rows ≈ 50-60 MB as a broadcast relation (and
        # reps carry 64-char strings) — stay inside the session's 64 MB
        # threshold so the fast path cannot OOM the driver; bigger label sets
        # take the shuffle-hash path one row below
        broadcastable = labels.count() <= 1_000_000
        hinted = F.broadcast(labels) if broadcastable else labels.hint("shuffle_hash")
        all_ids = fi.select("unique_id", "unique_id_str", "lang", "content_sha")
        comp = all_ids.join(hinted, all_ids["unique_id"] == labels["id"], "left").select(
            "unique_id_str",
            "lang",
            "content_sha",
            F.coalesce(F.col("component"), F.col("unique_id")).alias("_comp"),
        )
        # cluster representative stays the MIN STRING id of the component (the
        # public min-member contract, independent of the int64 surrogates)
        reps = comp.groupBy("_comp").agg(F.min("unique_id_str").alias("cluster_rep"))
        reps = F.broadcast(reps) if broadcastable else reps.hint("shuffle_hash")
        out = (
            comp.join(reps, "_comp")
            .select(
                F.col("unique_id_str").alias("unique_id"),
                "lang",
                "content_sha",
                "cluster_rep",
                F.xxhash64("cluster_rep").alias("cluster_id"),
            )
        )
        persisted.append(labels)
        return out

    clusters = stage("clusters", compute_clusters)
    return {
        "features": features,
        "vectors": vectors,
        "assignments": assignments,
        "pairs": pairs,
        "edges": edges,
        "clusters": clusters,
        "_persisted": persisted,
    }


def release(out: dict) -> None:
    """Unpersist every frame a :func:`resolve` call cached (stage outputs and
    internal intermediates). Call once downstream consumers are done — mandatory
    in per-micro-batch use (streaming) where cached frames would otherwise
    accumulate for the life of the session."""
    for df in out.get("_persisted", []):
        try:
            df.unpersist()
        except Exception:
            pass


def audit_content_sha(repo_files: DataFrame, clusters: DataFrame) -> int:
    """The per-row integrity check: every input row's sha256(content) must appear
    unchanged on its output row. Returns the number of violations (0 == pass)."""
    expected = repo_files.select(
        unique_id().alias("unique_id"), content_sha().alias("expected_sha")
    )
    joined = expected.join(clusters, "unique_id", "full")
    return joined.where(
        F.col("expected_sha").isNull()
        | F.col("content_sha").isNull()
        | (F.col("expected_sha") != F.col("content_sha"))
    ).count()
