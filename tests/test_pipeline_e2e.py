"""End-to-end correctness gate (BASELINE.md): pairwise F1 ≥ 0.99 on labeled pairs,
per-row content-sha256 integrity, determinism under different parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.plans.pipeline import (
    PipelineConfig,
    audit_content_sha,
    resolve,
)
from entity_resolution_spark.qa.metrics import pairwise_f1
from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_dataframes(spark, SynthConfig(seed=42, n_entities=60))


@pytest.fixture(scope="module")
def resolved(spark, corpus):
    repo_files, _, _ = corpus
    return resolve(spark, repo_files, PipelineConfig())


def test_f1_gate_and_sha_audit(spark, corpus, resolved):
    repo_files, ground_truth, labeled_pairs = corpus
    out = resolved
    clusters = out["clusters"]

    # negatives must exist in the labeled pairs (over-combination is exercised)
    assert labeled_pairs.where(~F.col("label")).count() > 0

    # every input row present exactly once
    assert clusters.count() == repo_files.count()

    # integrity invariant: content sha preserved through every transform
    assert audit_content_sha(repo_files, clusters) == 0

    metrics = pairwise_f1(labeled_pairs, clusters)
    print("PAIRWISE:", metrics)
    assert metrics["f1"] >= 0.99, metrics


def test_all_exact_duplicates_cluster_together(spark, resolved):
    c = resolved["clusters"]
    # identical content => identical cluster (exact edges are never split)
    violations = (
        c.groupBy("content_sha")
        .agg(F.countDistinct("cluster_id").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert violations == 0
