"""C4 line/page cleaning rules (operators/cleaning.py) — hand goldens per
rule and the no-shuffle plan shape."""

from __future__ import annotations

from entity_resolution_spark.operators.cleaning import c4_clean

GOOD = [
    "The first sentence is fine.",
    "A second proper sentence here!",
    "Does the third one qualify?",
    'She said the word was "fine"',
    "And a fifth terminal sentence.",
]


def test_c4_line_rules(spark):
    text = "\n".join(
        GOOD
        + [
            "no terminal punctuation here",   # punct rule
            "Too short.",                      # < 3 words
            "this javascript line is long.",   # javascript rule
            "   A padded line also counts.  ",  # trimmed, kept
        ]
    )
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    r = c4_clean(df).collect()[0]
    assert r["n_lines"] == 9
    assert r["n_kept_lines"] == 6
    assert r["page_kept"] == 1
    assert r["clean_text"] == "\n".join(GOOD + ["A padded line also counts."])


def test_c4_page_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "\n".join(GOOD)),                          # exactly 5 -> kept
            (2, "\n".join(GOOD[:4])),                      # 4 kept lines -> drop
            (3, "\n".join(GOOD) + "\nSome Lorem Ipsum filler."),   # blocklist
            (4, "\n".join(GOOD) + "\nA brace { appears here."),    # curly
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in c4_clean(df).collect()}
    assert rows[1]["page_kept"] == 1 and rows[1]["clean_text"] is not None
    for i in (2, 3, 4):
        assert rows[i]["page_kept"] == 0
        assert rows[i]["clean_text"] is None
    # audit counts still populated for dropped pages
    assert rows[2]["n_kept_lines"] == 4


def test_c4_clean_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "A line here.")], ["id", "text"])
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stream_c4_pii_scrub_matches_batch(spark):
    """The stateless scrub stage (c4_clean → redact_pii) is streaming-safe:
    applied to a readStream of the documents table it must equal the batch
    result row-for-row (append mode, no state)."""
    from entity_resolution_spark.operators.pii import redact_pii

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    out = redact_pii(c4_clean(stream), text_col="text")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("scrub_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM scrub_out").collect()}
    batch = redact_pii(
        c4_clean(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")),
        text_col="text",
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) == 500


def test_corpus_line_dedup_keep_first_and_counts(spark):
    """Across-corpus duplicate lines drop everywhere but the canonical first
    (min (id, pos)); within-doc repeats count toward the census; empty lines
    always drop; a doc with no survivors emits NULL clean_text."""
    from entity_resolution_spark.operators.cleaning import corpus_line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared line\nunique two"),
            (2, "shared line\nonly here"),
            (3, "shared line\n\n   \nshared line"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(docs).collect()}
    # doc 1 holds the first occurrence of "shared line" -> keeps all 3
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["clean_text"] == "unique one\nshared line\nunique two"
    # doc 2 loses the duplicate, keeps its unique line
    assert out[2]["n_kept_lines"] == 1 and out[2]["clean_text"] == "only here"
    # doc 3: both copies are non-first occurrences; whitespace lines drop
    assert out[3]["n_kept_lines"] == 0 and out[3]["clean_text"] is None
    assert out[3]["n_lines"] == 4
    # empty doc: one empty line from split, nothing kept
    assert out[4]["n_lines"] == 1 and out[4]["n_kept_lines"] == 0


def test_corpus_line_dedup_trim_key_raw_output(spark):
    """The census key is the TRIMMED line (indented boilerplate still
    collides) but surviving lines keep their original text."""
    from entity_resolution_spark.operators.cleaning import corpus_line_dedup

    docs = spark.createDataFrame(
        [(1, "  footer  \nkeep a"), (2, "footer\nkeep b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(docs).collect()}
    assert out[1]["clean_text"] == "  footer  \nkeep a"  # raw text survives
    assert out[2]["clean_text"] == "keep b"


def test_corpus_line_dedup_no_keep_first(spark):
    from entity_resolution_spark.operators.cleaning import corpus_line_dedup

    docs = spark.createDataFrame(
        [(1, "dup\nsolo"), (2, "dup")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in corpus_line_dedup(docs, keep_first=False).collect()
    }
    assert out[1]["clean_text"] == "solo"
    assert out[2]["n_kept_lines"] == 0 and out[2]["clean_text"] is None
