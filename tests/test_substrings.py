"""Cross-document repeated-substring stats: hand-traced goldens."""

from entity_resolution_spark.operators.substrings import repeated_window_stats


def test_repeated_window_stats_hand_computed(spark):
    # n=3 windows. Docs 1 and 2 share the span "a b c d" (windows "a b c",
    # "b c d" — a run of 2 consecutive repeated starts in each). Doc 3 shares
    # nothing cross-doc (its repeated content is WITHIN-doc only).
    docs = spark.createDataFrame(
        [
            (1, "a b c d x y z"),      # windows: abc bcd cdx dxy xyz (5)
            (2, "q a b c d"),          # windows: qab abc bcd (3)
            (3, "m m m m m"),          # windows: mmm x3 — within-doc only
            (4, "u v"),                # too short: 0 windows
        ],
        "unique_id long, content string",
    )
    out = {r["unique_id"]: r for r in repeated_window_stats(docs, n=3).collect()}
    assert (out[1]["n_windows"], out[1]["repeated_positions"],
            out[1]["max_repeated_run"]) == (5, 2, 2)
    assert (out[2]["n_windows"], out[2]["repeated_positions"],
            out[2]["max_repeated_run"]) == (3, 2, 2)
    # within-doc repetition must NOT count (min_docs=2 distinct docs)
    assert (out[3]["n_windows"], out[3]["repeated_positions"],
            out[3]["max_repeated_run"]) == (3, 0, 0)
    assert (out[4]["n_windows"], out[4]["repeated_positions"]) == (0, 0)


def test_repeated_window_stats_split_runs(spark):
    # doc 1 shares TWO separate spans with docs 2/3: runs of 2 and 1, with a
    # non-repeated gap between — max run must be 2, total repeated 3
    docs = spark.createDataFrame(
        [
            (1, "a b c d GAP1 GAP2 x y z"),
            (2, "a b c d"),
            (3, "p q x y z"),
        ],
        "unique_id long, content string",
    )
    out = {r["unique_id"]: r for r in repeated_window_stats(docs, n=3).collect()}
    assert (out[1]["repeated_positions"], out[1]["max_repeated_run"]) == (3, 2)


def test_repeated_window_stats_min_docs(spark):
    # min_docs=3: a window in only 2 docs no longer qualifies
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c f")],
        "unique_id long, content string",
    )
    out3 = {r["unique_id"]: r
            for r in repeated_window_stats(docs, n=3, min_docs=3).collect()}
    # "a b c" is in all 3 docs; the doc-specific windows are in 1 each
    for i in (1, 2, 3):
        assert (out3[i]["repeated_positions"], out3[i]["max_repeated_run"]) == (1, 1)
