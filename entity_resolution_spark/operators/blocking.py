"""Multi-pass blocking: exact keys + MinHash-LSH bands, with block-size caps and salting.

Reference semantics being reproduced (not ported):

- multi-pass blocking over several key families, harvesting blocks per pass
  (``am_combiner/blockers/common.py:100-201`` — FeatureBasedNameBlockerWithCutoff);
- oversized-block splitting by a secondary/salt key
  (``am_combiner/blockers/country.py:19-126`` — CountryBlocker splits blocks over
  ``min_split_size`` by country code);
- inverted-index candidate generation instead of N² comparison
  (``am_combiner/utils/adjacency.py:15-70``).

The Spark expression of "a block" is a row ``(unique_id, block_key)``; a record may
carry several keys (one per pass/family) and the union of per-key pair sets is the
candidate set. All keys carry the ``lang`` component so cross-language pairs are never
generated (the reference never crosses blocking_field boundaries either).

Scale notes (100 TB): every key family below is a map-side projection + one groupBy;
LSH banding bounds the candidate count; block caps bound the per-block self-join at
``cap²``; salting keeps any single shuffle partition bounded even under pathological
keys (license boilerplate, empty files). AQE skew-join is on as a second line of
defense.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.hashing import band_keys, minhash_signature


@dataclass(frozen=True)
class BlockingConfig:
    num_hashes: int = 32
    bands: int = 16                 # rows-per-band = num_hashes // bands; r=2 keeps
                                    # catch probability high for jaccard ≥ 0.3 pairs
                                    # (P = 1-(1-s²)^16 ≈ 0.78 at s=0.3, 0.99 at s=0.5)
    sha_prefix_len: int = 12        # exact-duplicate key: sha prefix
    block_cap: int = 200            # max records per similarity block (ref: split size 1000,
                                    # large-cluster guard 400 — we default tighter)
    use_path_tokens: bool = True
    use_minhash: bool = True
    use_fingerprints: bool = True   # winnowing fingerprints — copy-detection blocker


def exact_sha_blocks(features: DataFrame, cfg: BlockingConfig) -> DataFrame:
    """(unique_id, block_key) for exact-content duplicates: lang + content-sha prefix."""
    return features.select(
        "unique_id",
        F.concat_ws(
            ":", F.lit("sha"), "lang", F.substring("content_sha", 1, cfg.sha_prefix_len)
        ).alias("block_key"),
    )


def path_token_blocks(features: DataFrame) -> DataFrame:
    """(unique_id, block_key) on normalized path tokens (skip empty token sets)."""
    return features.where(F.size("path_toks") > 0).select(
        "unique_id",
        F.concat_ws(
            ":", F.lit("path"), "lang", F.concat_ws("_", "path_toks")
        ).alias("block_key"),
    )


def minhash_band_blocks(features: DataFrame, cfg: BlockingConfig) -> DataFrame:
    """MinHash-LSH band keys over content shingles.

    One explode + one groupBy computes the whole signature (H min-aggregates in a
    single pass — map-side partial aggregation keeps the shuffle at |docs|·H, not
    |shingles|). Band keys are hashes of signature slices; each band emits one
    ``(unique_id, block_key)`` row.
    """
    exploded = features.select("unique_id", "lang", F.explode("shingles").alias("_v"))
    sig = exploded.groupBy("unique_id", "lang").agg(
        *minhash_signature(F.col("_v"), cfg.num_hashes)
    )
    sig = sig.select("unique_id", "lang", *band_keys(cfg.num_hashes, cfg.bands))
    stacked = sig.select(
        "unique_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(f"mh{b}"), "lang", F.col(f"band_{b}"))
                    for b in range(cfg.bands)
                ]
            )
        ).alias("block_key"),
    )
    return stacked


def fingerprint_blocks(features: DataFrame) -> DataFrame:
    """(unique_id, block_key) per content fingerprint (winnowing sample of shingle
    hashes, :func:`rolling_fingerprints`). Documents sharing any unchanged region
    co-block — robust to localized edits where MinHash bands can miss. The inverted
    index over fingerprints is the same exploded-equi-join shape as the reference's
    feature adjacency (``utils/adjacency.py:50-54``)."""
    return features.select(
        "unique_id",
        "lang",
        F.explode("fingerprints").alias("_fp"),
    ).select(
        "unique_id",
        F.concat_ws(":", F.lit("fp"), "lang", F.col("_fp").cast("string")).alias("block_key"),
    )


def apply_block_caps(assignments: DataFrame, cap: int, salt_col: str = "unique_id") -> DataFrame:
    """Split any block larger than ``cap`` into deterministic salted sub-blocks.

    Mirrors the reference's oversized-block handling (CountryBlocker splits blocks
    over ``min_split_size`` by a secondary key, ``blockers/country.py:67-91``). The
    salt is ``xxhash64(unique_id) pmod n_sub`` — deterministic, partition-independent.
    Trade-off (documented): records of one true entity inside a giant block may land
    in different sub-blocks for *that key family*; other key families (sha, path,
    other bands) still link them, and CC restores transitivity.
    """
    sizes = assignments.groupBy("block_key").agg(F.count("*").alias("_bs"))
    joined = assignments.join(sizes, "block_key")
    n_sub = F.ceil(F.col("_bs") / F.lit(cap)).cast("long")
    salted = F.when(
        F.col("_bs") <= cap, F.col("block_key")
    ).otherwise(
        F.concat_ws(
            "#", F.col("block_key"), F.pmod(F.xxhash64(F.col(salt_col)), n_sub).cast("string")
        )
    )
    return joined.select(F.col("unique_id"), salted.alias("block_key"))


def block_assignments(
    features: DataFrame,
    cfg: BlockingConfig | None = None,
    persisted: list | None = None,
) -> DataFrame:
    """Union of all key families → capped (unique_id, block_key) assignments.

    ``features`` must carry: unique_id, lang, content_sha, path_toks, shingles.
    """
    cfg = cfg or BlockingConfig()
    parts = [exact_sha_blocks(features, cfg)]
    if cfg.use_path_tokens:
        parts.append(path_token_blocks(features))
    if cfg.use_minhash:
        parts.append(minhash_band_blocks(features, cfg))
    if cfg.use_fingerprints and "fingerprints" in features.columns:
        parts.append(fingerprint_blocks(features))
    asg = parts[0]
    for p in parts[1:]:
        asg = asg.unionByName(p)
    # The union is consumed THREE times downstream (sha filter, sim filter, and
    # the cap-sizes join). Spark plans are trees, not DAGs — without a
    # materialization boundary the whole minhash subtree executes 3×. persist()
    # collapses that to once (at cluster scale this is the stage checkpoint).
    asg = asg.persist()
    if persisted is not None:
        persisted.append(asg)  # caller releases once downstream is materialized
    # exact-sha blocks are never salted apart (their pairs are stars anyway);
    # similarity blocks get capped
    sha_part = asg.where(F.col("block_key").startswith("sha:"))
    sim_part = asg.where(~F.col("block_key").startswith("sha:"))
    return sha_part.unionByName(apply_block_caps(sim_part, cfg.block_cap))
