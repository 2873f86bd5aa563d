"""Determinism + resumability gates (FIXTURES.md §5):
- identical cluster co-membership under local[2] vs local[8];
- resume-from-checkpoint after a simulated crash reproduces identical clusters.

Each parallelism level runs in its own subprocess (own SparkSession/JVM)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from entity_resolution_spark.plans.pipeline import PipelineConfig, resolve
from entity_resolution_spark.session import get_spark
from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes

cores = int(sys.argv[1])
spark = get_spark("det", master=f"local[{{cores}}]", shuffle_partitions=cores * 2)
rf, _, _ = corpus_dataframes(spark, SynthConfig(seed=7, n_entities=25))
out = resolve(spark, rf, PipelineConfig())
rows = sorted(
    (r["unique_id"], r["cluster_rep"]) for r in out["clusters"].collect()
)
print("RESULT" + json.dumps(rows))
"""


def _run(cores: int) -> list:
    p = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, p.stderr[-3000:]
    return json.loads(lines[-1][len("RESULT"):])


def test_identical_output_across_parallelism():
    assert _run(2) == _run(8)


def test_resume_reproduces_identical_clusters(spark, tmp_path):
    from entity_resolution_spark.plans.checkpoint import CheckpointStore
    from entity_resolution_spark.plans.pipeline import PipelineConfig, resolve
    from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes

    rf, _, _ = corpus_dataframes(spark, SynthConfig(seed=9, n_entities=20))
    root = str(tmp_path / "ck")
    store = CheckpointStore(spark, root)
    first = sorted(
        (r["unique_id"], r["cluster_rep"])
        for r in resolve(spark, rf, PipelineConfig(), store=store)["clusters"].collect()
    )
    # simulate crash after candidate_pairs: drop the later stages
    for stage in ("match_edges", "clusters"):
        shutil.rmtree(os.path.join(root, stage), ignore_errors=True)
        lp = os.path.join(root, f"{stage}._lineage.json")
        if os.path.exists(lp):
            os.remove(lp)
    store2 = CheckpointStore(spark, root)
    second = sorted(
        (r["unique_id"], r["cluster_rep"])
        for r in resolve(spark, rf, PipelineConfig(), store=store2)["clusters"].collect()
    )
    assert first == second
    # and the early stages were NOT recomputed (lineage timestamps unchanged)
    with open(os.path.join(root, "features._lineage.json")) as f:
        assert json.load(f)["stage"] == "features"


def test_concurrent_stage_submission_identical_clusters(spark):
    """concurrent_stages=True submits the vectors/assignments subtrees from two
    driver threads; the subtrees never interact, so the resolved clusters must
    be bit-identical to the sequential default (also verified at 703k files x
    3 runs in BENCH/BASELINE.md — clusters 240113 every sample)."""
    from entity_resolution_spark.plans.pipeline import PipelineConfig, release, resolve
    from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes

    rf, _, _ = corpus_dataframes(spark, SynthConfig(seed=13, n_entities=25))
    outs = []
    for conc in (False, True):
        out = resolve(spark, rf, PipelineConfig(concurrent_stages=conc))
        outs.append(
            sorted(
                (r["unique_id"], r["cluster_rep"])
                for r in out["clusters"].collect()
            )
        )
        release(out)
    assert outs[0] == outs[1]


def test_iceberg_backend_parity(spark, tmp_path):
    """Config-gated Iceberg backend (north rule: "checkpointing ... to
    Iceberg"): with an Iceberg catalog configured, stage writes route through
    writeTo(...).createOrReplace() and the resolved clusters must be
    IDENTICAL to the parquet backend's. Auto-skips when the Iceberg runtime
    jar is absent (as in this sandbox) — the fallback path is what every
    other checkpoint test exercises."""
    import pytest

    from entity_resolution_spark.plans.checkpoint import (
        CheckpointStore,
        detect_iceberg_catalog,
    )
    from entity_resolution_spark.plans.pipeline import PipelineConfig, resolve
    from entity_resolution_spark.synth.generator import SynthConfig, corpus_dataframes

    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("Iceberg runtime jar not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.ckpt_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ckpt_test.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.ckpt_test.warehouse", str(tmp_path / "warehouse")
    )
    try:
        assert detect_iceberg_catalog(spark) == "ckpt_test"

        rf, _, _ = corpus_dataframes(spark, SynthConfig(seed=11, n_entities=15))

        def _clusters(store):
            out = resolve(spark, rf, PipelineConfig(), store=store)
            return sorted(
                (r["unique_id"], r["cluster_rep"])
                for r in out["clusters"].collect()
            )

        pq = _clusters(
            CheckpointStore(spark, str(tmp_path / "pq"), catalog="")
        )
        ice_store = CheckpointStore(
            spark, str(tmp_path / "ice"), catalog="ckpt_test"
        )
        ice = _clusters(ice_store)
        assert pq == ice
        # the stages really landed as catalog tables
        tables = {
            r["tableName"]
            for r in spark.sql(
                "SHOW TABLES IN ckpt_test.er_checkpoints"
            ).collect()
        }
        assert "clusters" in tables
    finally:
        for k in (
            "spark.sql.catalog.ckpt_test",
            "spark.sql.catalog.ckpt_test.type",
            "spark.sql.catalog.ckpt_test.warehouse",
        ):
            spark.conf.unset(k)


def test_parquet_fallback_without_catalog(spark, tmp_path):
    """No Iceberg catalog configured → detect returns None and the store
    stays on parquet (the sandbox default every resume test runs on)."""
    from entity_resolution_spark.plans.checkpoint import (
        CheckpointStore,
        detect_iceberg_catalog,
    )

    if detect_iceberg_catalog(spark) is not None:
        import pytest

        pytest.skip("session carries a real Iceberg catalog config")
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    assert store.catalog is None


def test_interrupted_rewrite_invalidates_stale_checkpoint(spark, tmp_path):
    """A crash mid-overwrite must not leave `has()` pointing at the stage it
    was replacing: the lineage sidecar is removed before the parquet overwrite
    begins, so an interrupted write forces a recompute instead of a silent
    read of a corrupt/partial directory."""
    import pytest
    from pyspark.sql import functions as F

    from entity_resolution_spark.plans.checkpoint import CheckpointStore

    store = CheckpointStore(spark, str(tmp_path / "ck"))
    df = spark.range(10).select(F.col("id"))
    store.write("stage_a", df, input_signature="v1")
    assert store.has("stage_a", "v1")

    # a frame whose evaluation fails mid-write simulates the crash
    bad = spark.range(4).select((F.lit(1) / (F.col("id") - 2)).alias("x"))
    with pytest.raises(Exception):
        store.write("stage_a", bad, input_signature="v2")
    assert not store.has("stage_a", "v1")
    assert not store.has("stage_a", "v2")

    # the store recovers: the next get_or_compute recomputes cleanly
    out = store.get_or_compute("stage_a", lambda: df, input_signature="v1")
    assert out.count() == 10


def test_unusable_autodetected_catalog_falls_back_to_parquet(spark, tmp_path):
    """ADVICE r4: a session conf that merely MENTIONS an Iceberg catalog
    (jar absent / warehouse broken) must not break a store that previously
    worked on parquet — auto-detection falls back with a warning.  An
    EXPLICIT catalog= keeps the hard failure."""
    import warnings as _w

    import pytest

    from entity_resolution_spark.plans.checkpoint import CheckpointStore

    spark.conf.set(
        "spark.sql.catalog.bogus_ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            store = CheckpointStore(spark, str(tmp_path / "ck"))
        assert store.catalog is None  # parquet fallback
        assert any("falling back to the parquet backend" in str(w.message)
                   for w in rec)
        df = spark.range(5).toDF("n")
        store.write("s1", df, "sig")
        assert store.read("s1").count() == 5  # parquet path really works

        with pytest.raises(Exception):
            CheckpointStore(spark, str(tmp_path / "ck2"), catalog="bogus_ice")
    finally:
        spark.conf.unset("spark.sql.catalog.bogus_ice")
