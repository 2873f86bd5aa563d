"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the operators that define this engine (ER pipeline, dedup family,
ANN, CC) plus the relational parity queries. Each query is timed to full
materialization (count), not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entity_resolution_spark.queries import QUERIES  # noqa: E402
from entity_resolution_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "top_revenue_nations",
    "order_priority_semijoin",
    "topk_orders_per_priority",
    "weighted_avg_discount",
    "doc_length_histogram",
    "block_stats",
    "exact_dedup_docs",
    "token_counts_docs",
    "quality_stats_lang",
    "lang_id_docs",
    "jaccard_pairs_docs",
    "cc_jaccard_docs",
    "negative_edges_nchars",
    "feature_adjacency_docs",
    "embedding_topk",
    "embedding_near_dup",
    "minhash_near_dup",
    "simhash_near_dup",
    "lsh_ann_topk",
    "er_resolve_docs",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # warm up the JVM/Arrow paths so per-query times measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        try:
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            times[name] = round(dt, 3)
            total += dt
            print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        except Exception as e:  # keep the harness robust: one bad query ≠ no bench
            times[name] = -1.0
            print(f"# {name}: ERROR {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
