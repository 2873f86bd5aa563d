"""Sequence chunking + token-budget sampling: hand-traced goldens and
scale-shape assertions."""

from pyspark.sql import functions as F

from entity_resolution_spark.operators.chunking import chunk_documents
from entity_resolution_spark.operators.sampling import token_budget_sample


def test_chunk_documents_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7"),  # n=7, chunk=4, overlap=1, stride=3
            (2, "a b"),                    # n=2 <= 4: one chunk
            (3, ""),                       # empty: no chunks
        ],
        "unique_id long, content string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = {
        (r["unique_id"], r["chunk_idx"]): r
        for r in out.collect()
    }
    # doc 1: nc = ceil((7-4)/3)+1 = 2; starts 1, 4
    assert (rows[(1, 0)]["token_start"], rows[(1, 0)]["n_tokens"]) == (1, 4)
    assert rows[(1, 0)]["chunk_text"] == "t1 t2 t3 t4"
    assert (rows[(1, 1)]["token_start"], rows[(1, 1)]["n_tokens"]) == (4, 4)
    assert rows[(1, 1)]["chunk_text"] == "t4 t5 t6 t7"
    assert (rows[(2, 0)]["n_tokens"], rows[(2, 0)]["chunk_text"]) == (2, "a b")
    assert not any(k[0] == 3 for k in rows)
    assert len(rows) == 3


def test_chunk_last_token_always_covered(spark):
    # sweep lengths: the final chunk must reach token n, chunks overlap by
    # exactly `overlap`, and every chunk past the first adds new tokens
    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(1, n + 1))) for n in range(1, 40)],
        "unique_id long, content string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["unique_id"], []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[-1]["token_start"] + chunks[-1]["n_tokens"] - 1 == n
        for a, b in zip(chunks, chunks[1:]):
            assert b["token_start"] == a["token_start"] + 5  # stride
            assert b["token_start"] <= a["token_start"] + a["n_tokens"]


def test_chunk_plan_is_map_only(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "unique_id long, content string"
    )
    plan = (
        chunk_documents(docs, chunk_tokens=4, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles: pure map-side fan-out


def test_token_budget_sample_hand_computed(spark):
    # ranks: (id*2654435761) % 2^32 → order within bucket
    docs = spark.createDataFrame(
        [(i, "s", 10) for i in range(1, 6)],
        "unique_id long, source string, n_tokens long",
    )
    out = token_budget_sample(
        docs, budget_tokens=25, bucket_col="source"
    ).collect()
    ranked = sorted(out, key=lambda r: (r["sample_rank"], r["unique_id"]))
    # cumulative 10,20,30,40,50 — kept while cum-before < 25: first three
    assert [r["cum_tokens"] for r in ranked] == [10, 20, 30, 40, 50]
    assert [r["kept"] for r in ranked] == [True, True, True, False, False]


def test_token_budget_sample_per_bucket_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "b", 5)],
        "unique_id long, source string, n_tokens long",
    )
    out = {r["unique_id"]: r for r in
           token_budget_sample(docs, budget_tokens=50).collect()}
    assert out[3]["kept"]  # bucket b under budget regardless of bucket a
    assert sum(bool(out[i]["kept"]) for i in (1, 2)) == 1  # first rank only


def test_token_budget_sample_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", (i * 7) % 40 + 1) for i in range(1, 200)],
        "unique_id long, source string, n_tokens long",
    )
    a = token_budget_sample(docs.repartition(1), 300).orderBy("unique_id")
    b = token_budget_sample(docs.repartition(13), 300).orderBy("unique_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_token_budget_sample_large_ids_no_overflow(spark):
    """Ids near and above 2^32 must hash without ANSI int64 overflow, and the
    limb-decomposed rank must equal the mathematical (id·K) mod 2^32."""
    ids = [3_460_000_000, 4_294_967_295, 2**40 + 123, 7]
    docs = spark.createDataFrame(
        [(i, "s", 10) for i in ids], "unique_id long, source string, n_tokens long"
    )
    got = {
        r["unique_id"]: r["sample_rank"]
        for r in token_budget_sample(docs, budget_tokens=100).collect()
    }
    for i in ids:
        assert got[i] == (i * 2654435761) % (1 << 32)


def test_name_letter_quotas_bankers_rounding(spark):
    # reference summarise_name_distribution uses Python round (half-to-even):
    # a: 3/4 · 10 = 7.5 → 8, b: 1/4 · 10 = 2.5 → 2 (F.round would say 3)
    from entity_resolution_spark.operators.sampling import name_letter_quotas

    df = spark.createDataFrame(
        [("Alice",), ("adam",), ("Arthur",), ("bob",)], "name string"
    )
    rows = name_letter_quotas(df, sample_size=10).collect()
    got = {r["first_letter"]: (r["n_names"], r["new_sample"]) for r in rows}
    assert got == {"a": (3, 8), "b": (1, 2)}
    assert [r["first_letter"] for r in rows] == ["a", "b"]  # sorted strata


def test_temperature_budgets_flatten_head(spark):
    """alpha = 0.5 reallocates budget from the dominant source toward the
    tail relative to proportional (alpha = 1) — the XLM-R flattening."""
    from entity_resolution_spark.operators.sampling import temperature_budgets

    docs = spark.createDataFrame(
        [(i, "big", 100) for i in range(90)]
        + [(100 + i, "small", 100) for i in range(10)],
        "unique_id long, source string, n_tokens long",
    )
    half = {
        r["source"]: r["budget_tokens"]
        for r in temperature_budgets(docs, 1000, alpha=0.5).collect()
    }
    prop = {
        r["source"]: r["budget_tokens"]
        for r in temperature_budgets(docs, 1000, alpha=1.0).collect()
    }
    # proportional: 900 / 100. sqrt: 1000*sqrt(9000)/(sqrt(9000)+sqrt(1000))
    assert prop["big"] == 900 and prop["small"] == 100
    assert half["big"] < 900 and half["small"] > 100
    # isqrt(9000)=94, isqrt(1000)=31: floor(1000·94/125), floor(1000·31/125)
    assert half["big"] == 752 and half["small"] == 248
    assert half["big"] + half["small"] <= 1000


def test_temperature_mixture_sample_respects_budgets(spark):
    from entity_resolution_spark.operators.sampling import (
        temperature_budgets,
        temperature_mixture_sample,
    )

    rows = [(i, "a" if i % 3 else "b", 10 + i % 7) for i in range(60)]
    docs = spark.createDataFrame(rows, "unique_id long, source string, n_tokens long")
    out = temperature_mixture_sample(docs, 300, alpha=0.5, id_col="unique_id")
    budgets = {
        r["source"]: r["budget_tokens"]
        for r in temperature_budgets(docs, 300, alpha=0.5).collect()
    }
    per = {}
    for r in out.collect():
        assert r["budget_tokens"] == budgets[r["source"]]
        if r["kept"]:
            per.setdefault(r["source"], []).append(r)
    for src, kept in per.items():
        kept.sort(key=lambda r: (r["sample_rank"], r["unique_id"]))
        # every kept doc but the last starts under budget; the stop rule is
        # keep-while-cum-before-this-doc-under-budget
        for r in kept[:-1]:
            assert r["cum_tokens"] - r["n_tokens"] < budgets[src]
        # first doc past the crossing is NOT kept: the max kept cum either
        # crosses the budget once or the bucket ran out of docs
        total_bucket = sum(x["n_tokens"] for x in (
            r for r in out.collect() if r["source"] == src))
        assert kept[-1]["cum_tokens"] >= min(budgets[src], total_bucket) or \
            kept[-1]["cum_tokens"] == total_bucket


def test_isqrt_correction_exact():
    """The ±1 isqrt correction: perfect squares and k²-1 both land exactly."""
    from entity_resolution_spark.operators.sampling import temperature_budgets
    from entity_resolution_spark.session import get_spark

    spark = get_spark("t")
    docs = spark.createDataFrame(
        [(1, "sq", 9409), (2, "off", 9408)],  # 97², 97²-1
        "unique_id long, source string, n_tokens long",
    )
    # weights must be isqrt: 97 and 96 -> budgets floor(T*97/193), floor(T*96/193)
    got = {
        r["source"]: r["budget_tokens"]
        for r in temperature_budgets(docs, 193_000, alpha=0.5).collect()
    }
    assert got == {"sq": 97_000, "off": 96_000}


def test_temperature_budgets_exact_past_2pow53(spark):
    """ADVICE r4: at real LLM token budgets (1e13) the product
    total·isqrt(bucket_tokens) passes 2^53, where the old double-division
    floor() could be off by one.  The decimal(38,0) DIV path must match
    exact Python integer arithmetic bucket-for-bucket."""
    import math

    from entity_resolution_spark.operators.sampling import temperature_budgets

    total = 10**13
    buckets = {
        "a": 9_007_199_254_740_993,   # 2^53 + 1: unrepresentable in double
        "b": 4_611_686_018_427_387_904,  # 2^62: isqrt ~2.1e9
        "c": 3,
        "d": 999_999_999_999_999_999,
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in buckets.items()], "source string, n_tokens long"
    )
    got = {
        r["source"]: r["budget_tokens"]
        for r in temperature_budgets(docs, total, alpha=0.5).collect()
    }
    w = {k: math.isqrt(v) for k, v in buckets.items()}
    tot_w = sum(w.values())
    want = {k: (total * wk) // tot_w for k, wk in w.items()}
    assert got == want
