"""Drive the engine end-to-end through the public package boundary, as a user would:

    python tools/drive_pipeline.py [--entities N] [--checkpoint DIR] [--resume]

Generates the deterministic synthetic corpus, resolves it, prints the cluster table,
QA metrics, and the sha256 integrity audit.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_resolution_spark.plans.checkpoint import CheckpointStore
from entity_resolution_spark.plans.pipeline import PipelineConfig, audit_content_sha, resolve
from entity_resolution_spark.qa.metrics import (
    homogeneity_completeness_v,
    pairwise_f1,
    validate_blocks,
    validation_report,
)
from entity_resolution_spark.session import get_spark
from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=60)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--empty", action="store_true", help="probe: run on an empty input table")
    args = ap.parse_args()

    spark = get_spark("drive")
    repo_files, ground_truth, labeled_pairs = corpus_dataframes(
        spark, SynthConfig(seed=args.seed, n_entities=args.entities)
    )
    if args.empty:
        repo_files = repo_files.limit(0)

    store = CheckpointStore(spark, args.checkpoint) if args.checkpoint else None
    out = resolve(spark, repo_files, PipelineConfig(), store=store)
    clusters = out["clusters"]

    print("=== clusters (sample) ===")
    clusters.select("unique_id", "lang", "cluster_id").show(8, truncate=40)
    n_rows = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"rows={n_rows} clusters={n_clusters}")
    if args.empty:
        print("EMPTY-INPUT PROBE OK" if n_rows == 0 else "EMPTY-INPUT PROBE FAILED")
        return 0 if n_rows == 0 else 1

    print("=== integrity audit ===")
    bad = audit_content_sha(repo_files, clusters)
    print(f"sha256 violations: {bad}")

    print("=== pairwise metrics (labeled pairs) ===")
    print(pairwise_f1(labeled_pairs, clusters))

    tp = ground_truth.join(clusters, "unique_id").select(
        "blocking_key", "ground_truth", "cluster_id"
    )
    print("=== homogeneity/completeness/v ===")
    print(homogeneity_completeness_v(tp))
    print("=== validation report (reference semantics) ===")
    print(validation_report(tp))
    print("=== worst 5 blocks by score-to-minimize ===")
    validate_blocks(tp).orderBy("score_to_minimize", ascending=False).show(5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
