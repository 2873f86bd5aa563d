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


def test_source_overlap_matrix_hand_computed(spark):
    # n=3: srcA/srcB share windows "a b c" and "b c d"; srcC shares nothing
    # cross-source. Within-source repeats (two srcA docs with "a b c") must
    # count the window ONCE per source, not once per doc.
    docs = spark.createDataFrame(
        [
            ("srcA", "a b c d"),
            ("srcA", "a b c q"),       # duplicate "a b c" within srcA
            ("srcB", "z a b c d"),
            ("srcC", "m n o p"),
        ],
        "source string, content string",
    )
    from entity_resolution_spark.operators.substrings import source_overlap_matrix

    rows = source_overlap_matrix(docs, n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"], r["shared_windows"]) == ("srcA", "srcB", 2)


def test_canonical_survivors_keep_rule(spark):
    # cluster 1 = docs 1,2,3 (doc 2 longest -> keep); cluster 10 = doc 10 alone.
    # Tie inside cluster 20: docs 20,21 same length -> min id (20) wins.
    from entity_resolution_spark.operators.dedup import canonical_survivors

    docs = spark.createDataFrame(
        [
            (1, "x y"),
            (2, "x y z w"),
            (3, "x"),
            (10, "solo doc"),
            (20, "a b c"),
            (21, "d e f"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 20), (21, 20)],
        "doc_id long, cluster long",
    )
    out = {r["doc_id"]: r for r in canonical_survivors(docs, clusters).collect()}
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
    assert out[2]["n_tokens"] == 4
    assert out[10]["keep"] is True
    assert (out[20]["keep"], out[21]["keep"]) == (True, False)
