"""Blocking + pair-generation tests: key families, caps/salting, star-vs-clique."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.blocking import (
    BlockingConfig,
    apply_block_caps,
    block_assignments,
)
from entity_resolution_spark.operators.pairs import candidate_pairs, clique_pairs, star_pairs
from entity_resolution_spark.plans.pipeline import PipelineConfig, extract_features


def _features(spark, rows):
    rf = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return extract_features(rf, PipelineConfig())


def test_exact_sha_blocks_group_identical_content(spark):
    feats = _features(
        spark,
        [
            ("r1", "a.py", "c1", "python", "def f():\n    return 1"),
            ("r2", "b.py", "c2", "python", "def f():\n    return 1"),
            ("r3", "c.py", "c3", "python", "def g():\n    return 2"),
        ],
    )
    asg = block_assignments(feats, BlockingConfig(use_minhash=False, use_fingerprints=False, use_path_tokens=False))
    sha_blocks = asg.groupBy("block_key").agg(F.count("*").alias("n")).collect()
    by_n = sorted(r["n"] for r in sha_blocks)
    assert by_n == [1, 2]


def test_lang_never_crosses(spark):
    feats = _features(
        spark,
        [
            ("r1", "x.py", "c1", "python", "shared tokens here alpha beta gamma delta"),
            ("r2", "x.go", "c2", "go", "shared tokens here alpha beta gamma delta"),
        ],
    )
    asg = block_assignments(feats, BlockingConfig())
    pairs = candidate_pairs(asg)
    assert pairs.count() == 0  # same content, different lang → no shared key


def test_apply_block_caps_splits_big_blocks(spark):
    asg = spark.createDataFrame(
        [(f"id{i}", "big") for i in range(100)] + [(f"s{i}", "small") for i in range(5)],
        "unique_id string, block_key string",
    )
    capped = apply_block_caps(asg, cap=30)
    sizes = {r["block_key"]: r["n"] for r in capped.groupBy("block_key").agg(F.count("*").alias("n")).collect()}
    assert "small" in sizes and sizes["small"] == 5          # untouched
    big_parts = [k for k in sizes if k.startswith("big#")]
    assert len(big_parts) == 4                               # ceil(100/30)
    assert all(sizes[k] <= 45 for k in big_parts)            # roughly balanced
    assert sum(sizes[k] for k in big_parts) == 100
    # deterministic: same salt assignment on re-run
    again = {r["unique_id"]: r["block_key"] for r in apply_block_caps(asg, cap=30).collect()}
    for r in capped.collect():
        assert again[r["unique_id"]] == r["block_key"]


def test_star_vs_clique_pairs(spark):
    asg = spark.createDataFrame(
        [("a", "k"), ("b", "k"), ("c", "k"), ("d", "k2")],
        "unique_id string, block_key string",
    )
    star = {(r["id_a"], r["id_b"]) for r in star_pairs(asg).collect()}
    assert star == {("a", "b"), ("a", "c")}          # min-id star, linear count
    clique = {(r["id_a"], r["id_b"]) for r in clique_pairs(asg).collect()}
    assert clique == {("a", "b"), ("a", "c"), ("b", "c")}


def test_candidate_pairs_exact_flag_and_dedup(spark):
    asg = spark.createDataFrame(
        [("a", "sha:python:x"), ("b", "sha:python:x"), ("a", "mh0:python:7"), ("b", "mh0:python:7")],
        "unique_id string, block_key string",
    )
    got = {(r["id_a"], r["id_b"]): r["is_exact"] for r in candidate_pairs(asg).collect()}
    assert got == {("a", "b"): True}   # one pair, exact wins over similarity dup


def test_minhash_bands_block_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    feats = _features(
        spark,
        [
            ("r1", "one.py", "c1", "python", base + "tail one"),
            ("r2", "two.py", "c2", "python", base + "tail two"),
            ("r3", "three.py", "c3", "python", "totally different words nothing shared xyz " * 6),
        ],
    )
    asg = block_assignments(feats, BlockingConfig(use_path_tokens=False, use_fingerprints=False))
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(asg).collect()}
    feats_ids = {r["path"]: r["unique_id"] for r in feats.collect()}
    a, b = sorted([feats_ids["one.py"], feats_ids["two.py"]])
    assert (a, b) in pairs
    c = feats_ids["three.py"]
    assert all(c not in p for p in pairs)
