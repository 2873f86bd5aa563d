"""Unigram-rarity quality scoring: hand-traced golden."""

from entity_resolution_spark.operators.rarity import unigram_rarity_stats


def test_unigram_rarity_hand_computed(spark):
    # 4 docs. df: the=3, cat=2, sat=1, dog=1, mat=2
    # rarity = floor(log2(4/df)): df=3 -> floor(log2(1.333)) via 4//3=1 -> 0
    #          df=2 -> 4//2=2 -> 1;  df=1 -> 4 -> 2
    docs = spark.createDataFrame(
        [
            (1, "the cat sat the"),   # distinct {the,cat,sat}: 0+1+2=3, max 2
            (2, "the cat mat"),       # {the,cat,mat}: 0+1+1=2, max 1
            (3, "the dog"),           # {the,dog}: 0+2=2, max 2
            (4, "mat"),               # {mat}: 1, max 1
        ],
        "unique_id long, content string",
    )
    out = {r["unique_id"]: r for r in unigram_rarity_stats(docs).collect()}
    assert (out[1]["n_tokens"], out[1]["distinct_tokens"],
            out[1]["sum_rarity"], out[1]["max_rarity"]) == (4, 3, 3, 2)
    assert (out[2]["sum_rarity"], out[2]["max_rarity"]) == (2, 1)
    assert (out[3]["sum_rarity"], out[3]["max_rarity"]) == (2, 2)
    assert (out[4]["n_tokens"], out[4]["sum_rarity"]) == (1, 1)


def test_unigram_rarity_empty_doc_zeroed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "")], "unique_id long, content string"
    )
    out = {r["unique_id"]: r for r in unigram_rarity_stats(docs).collect()}
    assert (out[2]["n_tokens"], out[2]["distinct_tokens"],
            out[2]["sum_rarity"], out[2]["max_rarity"]) == (0, 0, 0, 0)
    # df=1 for both tokens of doc 1 over n_docs=2: rarity 1 each
    assert (out[1]["sum_rarity"], out[1]["max_rarity"]) == (2, 1)


def test_unigram_rarity_null_text_zeroed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None)], "unique_id long, content string"
    )
    out = {r["unique_id"]: r for r in unigram_rarity_stats(docs).collect()}
    assert (out[2]["n_tokens"], out[2]["distinct_tokens"],
            out[2]["sum_rarity"], out[2]["max_rarity"]) == (0, 0, 0, 0)
