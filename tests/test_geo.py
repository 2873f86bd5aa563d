"""Geo resolution goldens — reference ArticleGeoVisitor semantics
(``am_combiner/features/geography.py:273-394``): one-hop resolution to the
first ``final`` node in insertion order; unresolved mentions kept raw."""

from __future__ import annotations

from entity_resolution_spark.operators.geo import geo_mapping, resolve_geo_mentions


def _lexicon(spark):
    countries = spark.createDataFrame(
        [
            ("United States", "US"),
            ("United Kingdom", "GB"),
            ("Germany", "DE"),
            ("India", "IN"),
        ],
        ["name", "code"],
    )
    aliases = spark.createDataFrame(
        [
            ("United States", ["USA", "America", "the states"]),
            ("United Kingdom", ["UK", "Britain", "Great Britain"]),
            # primary not a country, but one alias is -> swap (geography.py:157-172)
            ("Deutschland", ["Germany", "Bundesrepublik"]),
            # neither primary nor any alias resolves -> dropped with a warning
            ("Atlantis", ["Lemuria"]),
        ],
        "name string, aliases array<string>",
    )
    divisions = spark.createDataFrame(
        [
            ("US", ["California", "Texas"], "Washington"),
            ("DE", ["Bavaria"], "Berlin"),
            ("IN", [], "New Delhi"),
        ],
        "code string, states array<string>, capital string",
    )
    return countries, aliases, divisions


def test_geo_mapping_kinds_and_priority(spark):
    m = geo_mapping(*_lexicon(spark))
    rows = {r["mention"]: (r["country"], r["kind"]) for r in m.collect()}
    # countries resolve to themselves (DFS visits the source first)
    assert rows["germany"] == ("germany", "country")
    # codes, aliases, states, capitals all map one hop to the country
    assert rows["us"] == ("united states", "code")
    assert rows["usa"] == ("united states", "alias")
    assert rows["bavaria"] == ("germany", "state")
    assert rows["berlin"] == ("germany", "capital")
    assert rows["new delhi"] == ("india", "capital")
    # primary/alias swap: 'deutschland' became an alias of 'germany',
    # 'bundesrepublik' stayed one, and 'germany' was NOT demoted
    assert rows["deutschland"] == ("germany", "alias")
    assert rows["bundesrepublik"] == ("germany", "alias")
    # unresolvable alias row dropped entirely
    assert "atlantis" not in rows and "lemuria" not in rows
    # one row per mention
    assert m.count() == m.select("mention").distinct().count()


def test_geo_mapping_insertion_order_tie_break(spark):
    # a name that is BOTH a country and another country's alias resolves as
    # the country (countries are inserted before aliases — geography.py:397)
    countries = spark.createDataFrame([("Georgia", "GE")], ["name", "code"])
    aliases = spark.createDataFrame(
        [("Georgia", ["Sakartvelo"])], "name string, aliases array<string>"
    )
    m = geo_mapping(countries, aliases)
    rows = {r["mention"]: (r["country"], r["kind"]) for r in m.collect()}
    assert rows["georgia"] == ("georgia", "country")
    assert rows["sakartvelo"] == ("georgia", "alias")


def test_resolve_geo_mentions_goldens(spark):
    m = geo_mapping(*_lexicon(spark))
    df = spark.createDataFrame(
        [
            (1, ["USA", "Berlin", "Narnia"]),
            (2, ["  uk  ", "Texas"]),
            (3, []),
            (4, None),
            # duplicates collapse (the reference output is a set)
            (5, ["America", "the states", "US"]),
        ],
        "unique_id int, gpe_mentions array<string>",
    )
    out = resolve_geo_mentions(df, m, id_col="unique_id")
    got = {r["unique_id"]: r["gpe_clean"] for r in out.collect()}
    # hits become the canonical country; misses keep the trimmed raw text
    assert got[1] == ["Narnia", "germany", "united states"]
    assert got[2] == ["united kingdom", "united states"]
    assert got[3] == []
    assert got[4] == []
    assert got[5] == ["united states"]
