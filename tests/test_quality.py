"""Gopher quality rules (operators/quality.py) — per-rule hand goldens,
integer parts, and the no-shuffle plan shape."""

from __future__ import annotations

from entity_resolution_spark.operators.quality import gopher_quality

# 60 words, mean length in [3,10], all alphabetic, ≥2 Gopher stop words,
# no symbols/bullets/ellipses → passes every rule.
GOOD = " ".join(
    ["the quick brown fox jumps over that lazy dog with steady grace"] * 5
) + "\nthis line keeps the page honest and plain.\n"


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["id", "text"])
    return {r["id"]: r for r in gopher_quality(df, id_col="id").collect()}


def test_gopher_good_doc_passes(spark):
    r = _run(spark, [(1, GOOD)])[1]
    assert r["fail_mask"] == 0 and r["keep"] == 1
    assert r["n_words"] == 68
    assert r["n_stop_hits"] >= 2


def test_gopher_word_count_rule(spark):
    rows = _run(spark, [(1, "too short to keep"), (2, GOOD)])
    assert rows[1]["fail_mask"] & 1
    assert rows[1]["keep"] == 0
    assert not rows[2]["fail_mask"] & 1


def test_gopher_mean_word_length_rule(spark):
    # 60 words of length 12 → mean 12 > 10 → bit 1 (and bit 6: no stop words)
    long_words = " ".join(["abcdefghijkl"] * 60)
    r = _run(spark, [(1, long_words)])[1]
    assert r["fail_mask"] & 2
    assert r["n_words"] == 60 and r["word_chars"] == 720
    # boundary: mean exactly 10 passes the rule (inclusive bound)
    exact = " ".join(["abcdefghij"] * 60)
    r2 = _run(spark, [(2, exact)])[2]
    assert not r2["fail_mask"] & 2


def test_gopher_symbol_ratio_rule(spark):
    # Paper rule (Rae et al. A1.1): EITHER class alone must exceed 0.1.
    # GOOD (68 words) + 9 hashes → 77 words total; 10·9 > 77 fails on hash.
    sym = GOOD + " " + "# " * 9
    r = _run(spark, [(1, sym)])[1]
    assert r["n_hash_symbols"] == 9 and r["n_ellipsis_symbols"] == 0
    assert r["fail_mask"] & 4
    # 6% hashes + 6% ellipses: neither class alone exceeds 0.1 → PASSES
    # (the pre-fix summed-ratio variant wrongly failed this doc)
    mixed = GOOD + " " + "# " * 5 + "... ... ... ... ..."
    r2 = _run(spark, [(2, mixed)])[2]
    assert r2["n_hash_symbols"] == 5 and r2["n_ellipsis_symbols"] == 5
    assert not r2["fail_mask"] & 4
    assert not _run(spark, [(3, GOOD)])[3]["fail_mask"] & 4


def test_gopher_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(["- item %d is listed here" % i for i in range(10)])
    r = _run(spark, [(1, bullets)])[1]
    assert r["n_lines"] == 10 and r["n_bullet_lines"] == 10
    assert r["fail_mask"] & 8
    ell = "\n".join(["this line trails off..." for _ in range(4)] + ["plain line"])
    r2 = _run(spark, [(2, ell)])[2]
    assert r2["n_ellipsis_lines"] == 4 and r2["n_lines"] == 5
    assert r2["fail_mask"] & 16
    # 9 bullets of 10 lines = 90% — NOT > 90%, rule passes
    edge = bullets.replace("- item 9", "item nine", 1)
    r3 = _run(spark, [(3, edge)])[3]
    assert r3["n_bullet_lines"] == 9 and not r3["fail_mask"] & 8


def test_gopher_alpha_word_and_stopword_rules(spark):
    # 50 numeric words + 10 alphabetic → 10/60 < 80% alpha → bit 5
    nums = " ".join(["12345"] * 50 + ["the dog and cat have fun with that toy be"])
    r = _run(spark, [(1, nums)])[1]
    assert r["n_alpha_words"] == 10
    assert r["fail_mask"] & 32
    # stop words: GOOD has the/that/with → 3 hits; a stopword-free doc fails
    words = " ".join(["apple banana cherry damson elder fig grape"] * 9)
    r2 = _run(spark, [(2, words)])[2]
    assert r2["n_stop_hits"] == 0
    assert r2["fail_mask"] & 64
    assert _run(spark, [(3, GOOD)])[3]["n_stop_hits"] == 4


def test_gopher_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], ["id", "text"])
    rows = {r["id"]: r for r in gopher_quality(df, id_col="id").collect()}
    for i in (1, 2):
        assert rows[i]["n_words"] == 0 and rows[i]["keep"] == 0
        assert rows[i]["fail_mask"] & 1  # word-count rule is the failure


def test_gopher_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], ["id", "text"])
    plan = (
        gopher_quality(df, id_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
