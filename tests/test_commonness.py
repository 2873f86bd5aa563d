"""Name-commonness scoring — reference semantics
(``am_combiner/name_commonness.py:57-120`` get_commonness_score)."""

from __future__ import annotations

from entity_resolution_spark.operators.commonness import (
    name_commonness_scores,
    token_frequency_table,
)


def _corpus(spark):
    return spark.createDataFrame(
        [("john smith",), ("john doe",), ("mary smith",)], ["name"]
    )


def test_commonness_product_of_token_fractions(spark):
    """score = ∏ token_count/total; hand-computed: john=2, smith=2, total=3
    -> john smith = (2/3)(2/3) = 4/9; numerator = 4."""
    names = _corpus(spark)
    freq = token_frequency_table(names)
    out = {
        r["name"]: r
        for r in name_commonness_scores(names, freq, 3).collect()
    }
    r = out["john smith"]
    assert r["n_tokens"] == 2
    assert r["commonness_num"] == 4
    assert abs(r["commonness"] - 4.0 / 9.0) < 1e-12
    assert out["john doe"]["commonness_num"] == 2  # john(2) * doe(1)


def test_commonness_zero_guards(spark):
    """Reference zero guard: any token missing from the table -> 0, and a
    REPEATED token also zeroes (the frequency table contributes one row per
    distinct token, so matched rows < token count)."""
    corpus = _corpus(spark)
    freq = token_frequency_table(corpus)
    probes = spark.createDataFrame(
        [(1, "john brown"), (2, "john john"), (3, "zzz")],
        ["pid", "name"],
    )
    out = {
        r["pid"]: r
        for r in name_commonness_scores(
            probes, freq, 3, id_col="pid"
        ).collect()
    }
    assert out[1]["commonness_num"] == 0      # brown absent
    assert out[1]["commonness"] == 0.0
    assert out[2]["commonness_num"] == 0      # duplicate token guard
    assert out[3]["commonness_num"] == 0      # nothing matches at all
    assert out[3]["n_tokens"] == 1
