"""Physical-plan shape regression tests — the `.explain` audits PLANS.md
records, turned into assertions so a refactor cannot silently lose them.

Each test captures `df.explain("formatted")` and asserts the scale-critical
plan property: predicate pushdown reaching the parquet scan, column pruning
(ReadSchema), broadcast of small dimension tables, and the absence of
cartesian products in the pipeline compositions. These are properties of the
LOGICAL formulation — they must hold at any scale factor, so asserting them
at test scale is meaningful for the 100 TB plan.
"""

from __future__ import annotations

import contextlib
import io

from entity_resolution_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_pricing_summary_pushes_shipdate_filter_and_prunes_columns(spark):
    plan = _plan(QUERIES["pricing_summary"](spark, SF_DIR))
    # the shipdate predicate must reach the parquet scan, not sit in a Filter
    # above a full scan
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    # column pruning: the scan must not read the full 16-column lineitem row
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    for needed in ("l_returnflag", "l_quantity", "l_shipdate"):
        assert needed in read_schema


def test_top_revenue_nations_broadcasts_nation_dim(spark):
    plan = _plan(QUERIES["top_revenue_nations"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation_before_shuffle(spark):
    # map-side combine: HashAggregate appears both below and above the
    # exchange for the groupBy (partial_ functions under whole-stage codegen)
    plan = _plan(QUERIES["pricing_summary"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_resolve_pipeline_has_no_cartesian_product(spark):
    for name in ("er_resolve_docs", "sanction_resolve", "jaccard_pairs_docs"):
        plan = _plan(QUERIES[name](spark, SF_DIR), "extended")
        assert "CartesianProduct" not in plan, name


def test_exact_dedup_scan_prunes_to_needed_columns(spark):
    plan = _plan(QUERIES["exact_dedup_docs"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "embedding" not in read_schema


def test_line_dedup_no_cartesian_single_census_exchange(spark):
    """corpus_line_dedup: hashed-line census join, never a self-join of the
    corpus — no CartesianProduct / BroadcastNestedLoop anywhere, and the
    line text reaches the census exchange only as its xxhash64."""
    plan = _plan(QUERIES["line_dedup_docs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_temperature_mixture_broadcasts_budgets(spark):
    """The |buckets|-row budgets frame must broadcast into the doc join —
    a shuffle join there would exchange the whole corpus against a
    handful of rows."""
    plan = _plan(QUERIES["temperature_mixture_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
