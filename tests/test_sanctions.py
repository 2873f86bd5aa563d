"""Nested-JSON raw-entity extraction — goldens translated from the reference
(``test/features/test_common.py:201-289`` TestBirthExtractor /
test_known_yob_extraction, plus alias/country semantics from
``am_combiner/features/common.py:336-530``)."""

from __future__ import annotations

import json

from entity_resolution_spark.operators.sanctions import (
    org_alias_keyword_variants,
    org_sanction_features,
    parse_raw_entity,
    sanction_features,
    sanction_term_features,
)


def _extract(spark, raw_entities):
    df = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(raw_entities)],
        "id int, raw_entity string",
    )
    rows = sanction_features(df).orderBy("id").collect()
    return [r.asDict() for r in rows]


def test_birth_extractor_reference_golden(spark):
    # reference test/features/test_common.py:203-247 (yob range + dob)
    ent = {
        "data": {
            "births": [
                {"min_date": "1959-01-01", "max_date": "1959-12-31",
                 "justification": {"score": 1.0}},
                {"min_date": "1960-03-31", "max_date": "1960-03-31"},
                {"min_date": "1958-04-29", "max_date": "1958-04-29"},
            ]
        }
    }
    (r,) = _extract(spark, [ent])
    assert r["yob"] == [1958, 1959, 1960]
    assert r["dob"] == ["1958-04-29", "1960-03-31"]


def test_known_yob_reference_golden(spark):
    # reference test/features/test_common.py:256-288: the all-"01" encoding
    # contributes BOTH years; the 12-31 / 31-12 encodings only the min year.
    ents = [
        {
            "data": {
                "births": [
                    {"min_date": "1967-01-01", "max_date": "1967-31-12"},
                    {"min_date": "1968-01-01", "max_date": "1968-12-31"},
                    {"min_date": "1969-01-01", "max_date": "1971-01-01"},
                ]
            }
        },
        {
            "data": {
                "births": [
                    {"min_date": "1979-01-01", "max_date": "1989-01-01"},
                    {"min_date": "1969-01-01", "max_date": "1971-01-01"},
                ]
            }
        },
    ]
    r0, r1 = _extract(spark, ents)
    assert r0["yob_known"] == ["1967", "1968", "1969", "1971"]
    assert r1["yob_known"] == ["1969", "1971", "1979", "1989"]


def test_alias_keyword_phonetic_bigrams(spark):
    ent = {
        "data": {
            "names": [
                {"name": "Robert J. Smith-Jones", "name_type": "primary"},
                {"name": "Bob Smith", "name_type": "aka"},
                {"name": "Bob Smith", "name_type": "aka"},  # dup collapses
            ]
        }
    }
    (r,) = _extract(spark, [ent])
    assert r["alias"] == ["Bob Smith", "Robert J. Smith-Jones"]
    assert r["primary"] == ["Robert J. Smith-Jones"]
    # keyword tokens: lower, punctuation->space, len>2, sorted
    # "Robert J. Smith-Jones" -> [jones, robert, smith]; "Bob Smith" -> [bob, smith]
    assert r["alias_keyword"] == ["bob+smith", "jones+robert+smith"]
    # soundex: bob=B100 smith=S530 jones=J520 robert=R163
    assert r["alias_phonetic"] == ["B100+S530", "J520+R163+S530"]
    assert r["alias_keyword_bigrams"] == [
        "bob+smith", "jones+robert", "jones+smith", "robert+smith",
    ]


def test_keyword_fallback_short_name(spark):
    # every token <= 2 chars -> fallback to the whole lowered name
    ent = {"data": {"names": [{"name": "Al B", "name_type": "primary"}]}}
    (r,) = _extract(spark, [ent])
    assert r["alias_keyword"] == ["al b"]


def test_country_codes_and_international_veto(spark):
    ents = [
        {"data": {"locations": [
            {"country_code": "RU", "original_name": "Moscow"},
            {"country_code": "AF", "original_name": "Kabul"},
            {"country_code": None, "original_name": "nowhere"},
            {"country_code": "RU", "original_name": "Moscow"},
        ]}},
        {"data": {"locations": [
            {"country_code": "US", "original_name": "International"},
            {"country_code": "GB", "original_name": "London"},
        ]}},
        {"data": {}},  # missing locations -> feature absent
    ]
    r0, r1, r2 = _extract(spark, ents)
    assert r0["country_code"] == ["AF", "RU"]
    assert r1["country_code"] is None  # one 'International' vetoes the entity
    assert r2["country_code"] is None


def test_missing_sections_are_null_and_extra_json_tolerated(spark):
    ent = {"data": {"names": None}, "unmodelled": {"blob": [1, 2, 3]}}
    (r,) = _extract(spark, [ent])
    for c in ("alias", "primary", "yob", "yob_known", "dob", "country_code"):
        assert r[c] is None


def test_nationality_and_aml_type_extractors(spark):
    """NationalityVisitor (common.py:591-606) + AmlTypeVisitor (609-630):
    distinct codes/types, nulls dropped, absent/empty sections -> null."""
    ents = [
        {"data": {
            "nationalities": [
                {"country_code": "IR"}, {"country_code": "RU"},
                {"country_code": "IR"},
            ],
            "aml_types": [
                {"aml_type": "sanction"}, {"aml_type": None},
                {"aml_type": "pep"}, {"aml_type": "sanction"},
            ],
        }},
        {"data": {"nationalities": [], "aml_types": None}},
        {"data": {}},
    ]
    r0, r1, r2 = _extract(spark, ents)
    assert r0["nationalities"] == ["IR", "RU"]
    assert r0["aml_types"] == ["pep", "sanction"]
    assert r1["nationalities"] is None  # empty list -> no feature (reference)
    assert r1["aml_types"] is None
    assert r2["nationalities"] is None and r2["aml_types"] is None


def test_fathers_phonetics_from_alias(spark):
    """FathersNamesFromAlias (common.py:633-666): a 'ben' / 's/o' denominator
    before the last token marks the suffix as the father's name; phonetics are
    '+'-joined soundex of its keyword tokens. Hand-computed soundex goldens:
    hassan=H250, omar=O560, karim=K650."""
    ents = [
        {"data": {"names": [
            {"name": "Abu Ali ben Hassan Omar", "name_type": "primary"},
            {"name": "Rahim s/o Karim", "name_type": "aka"},
            {"name": "Ariel Ben", "name_type": "aka"},     # fd is LAST token: no hit
            {"name": "Plain Name", "name_type": "aka"},
        ]}},
        {"data": {"names": [{"name": "No Father Here", "name_type": "primary"}]}},
        {"data": {}},
    ]
    r0, r1, r2 = _extract(spark, ents)
    assert r0["father_phonetic"] == ["H250+O560", "K650"]
    assert r1["father_phonetic"] == []
    assert r2["father_phonetic"] is None  # no names section -> absent


def _extract_org(spark, raw_entities):
    df = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(raw_entities)],
        "id int, raw_entity string",
    )
    rows = org_sanction_features(df).orderBy("id").collect()
    return [r.asDict() for r in rows]


def test_org_alias_keyword_variants_reference_golden():
    """Hand-traced recursion of ``_convert_to_keyword_tokens``
    (organisation_visitors.py:86-115) on the reference's own docstring example
    shape: brackets strip first, then the a.k.a. split, then the full form."""
    out = org_alias_keyword_variants("Big Fat Shop [BFS] a.k.a. Fat Shop Ltd")
    assert out == [
        "big+fat+shop",              # bracket-stripped, pre-a.k.a.
        "fat+shop",                  # bracket-stripped, post-a.k.a. (ltd dropped)
        "big+fat+fat+shop+shop",     # bracket-stripped full form (multiplicity kept)
        "big+fat+shop",              # pre-a.k.a. of the bracketed form, de-bracketed
        "bfs+big+fat+shop",          # pre-a.k.a. with bracket token inlined
        "fat+shop",                  # post-a.k.a. of the bracketed form
        "bfs+big+fat+fat+shop+shop", # full form with bracket token inlined
    ]
    # numerics kept, 2-char and stopword tokens dropped
    assert org_alias_keyword_variants("4 Seasons Co 2020") == ["2020+4+seasons"]
    # all tokens filtered -> no variant at all (unlike person-alias fallback)
    assert org_alias_keyword_variants("A B Co") == []


def test_org_visitors_end_to_end(spark):
    """JsonSummarizer + OrganisationIdentifiersVisitor + OrganisationAliasVisitor
    over raw-entity JSON (vectorisation.py:247-339, organisation_visitors.py:25-129)."""
    ents = [
        {"data": {
            "names": [
                {"name": "Big Fat Shop [BFS] a.k.a. Fat Shop Ltd",
                 "name_type": "primary"},
            ],
            "display_fields": [
                {"title": "Program", "value": "SDGT"},
                {"title": "Not A Real Title", "value": "dropme"},
                {"title": "Address", "value": "123 Main St"},
                {"title": "Registration Number", "value": "AB12345, C-98765"},
                {"title": "Registration Number", "value": "XY1001 789012"},
                {"title": "Designation Date", "value": "2017-05-12"},
                {"title": "Designation Date", "value": "12 Jan 2009"},
            ],
        }},
        {"data": {"names": [{"name": "Plainco", "name_type": "primary"}]}},
        {"other": {}},  # no data section
    ]
    r0, r1, r2 = _extract_org(spark, ents)

    # FULL_TEXT: allowlisted values '.'-joined in array order (Registration
    # Number and Designation Date ARE in the allowlist).
    assert r0["full_text"] == (
        "SDGT.123 Main St.AB12345, C-98765.XY1001 789012.2017-05-12.12 Jan 2009"
    )
    assert r1["full_text"] == ""  # absent display_fields -> empty iteration

    # ORG_IDS: len>=5, tok[2:] numeric, '1001' suffix excluded; split on the
    # reference punctuation pattern. Sorted distinct (reference keeps a set).
    assert r0["org_ids"] == ["789012", "98765", "AB12345"]
    assert r0["designation_year"] == [2009, 2017]
    assert r1["org_ids"] == [] and r1["designation_year"] == []
    assert r2["org_ids"] is None and r2["designation_year"] is None

    # ALIAS_KEYWORD: distinct sorted union of the recursion variants.
    assert r0["org_alias_keyword"] == [
        "bfs+big+fat+fat+shop+shop",
        "bfs+big+fat+shop",
        "big+fat+fat+shop+shop",
        "big+fat+shop",
        "fat+shop",
    ]
    assert r1["org_alias_keyword"] == ["plainco"]
    assert r2["org_alias_keyword"] is None


def test_sanction_term_visitor_reference_golden(spark):
    """``SanctionTermVisitor`` bypass-translation path (sanction_term.py:14-57):
    requested titles match on the normalized space->underscore upper form,
    values truncate to char_len, duplicates collapse (the reference unions
    into a set); unrequested titles are ignored; null data -> null feature."""
    ents = [
        {"data": {"display_fields": [
            {"title": "Other Information", "value": "first note that is long"},
            {"title": "other information", "value": "second"},  # normalized match
            {"title": "Function", "value": "treasurer"},
            {"title": "Unrequested", "value": "dropme"},
            {"title": "Other Information", "value": "second"},  # dup collapses
        ]}},
        {"data": {}},       # no display_fields -> empty sets
        {"other": {}},      # no data -> absent features
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(ents)],
        "id int, raw_entity string",
    )
    out = sanction_term_features(
        parse_raw_entity(df), ["Other Information", "Function"], char_len=10
    )
    r0, r1, r2 = [r.asDict() for r in out.orderBy("id").collect()]
    assert r0["term_other_information"] == ["first note", "second"]
    assert r0["term_function"] == ["treasurer"]
    assert r1["term_other_information"] == [] and r1["term_function"] == []
    assert r2["term_other_information"] is None and r2["term_function"] is None


def test_sanction_job_build_clusters_person_and_org(spark):
    """The spark-submit sanction job's core (`jobs/sanction_job.py`): visitor
    chain -> feature-intersection adjacency (th) -> CC, min-id labels — the
    reference's `inter-domain.py` composition. Person entities cluster on
    shared alias keywords; orgs on shared registration ids OR alias keywords."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))
    from sanction_job import build_clusters

    people = [
        ("p1", {"data": {"names": [{"name": "Omar Hassan", "name_type": "primary"}]}}),
        ("p2", {"data": {"names": [{"name": "Hassan Omar", "name_type": "primary"}]}}),  # same sorted keyword
        ("p3", {"data": {"names": [{"name": "Someone Else", "name_type": "primary"}]}}),
        ("p4", {"data": {"names": None}}),  # absent names -> singleton
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in people], "sanction_id string, raw_entity string"
    )
    got = {
        r["sanction_id"]: (r["entity_id"], r["n_members"])
        for r in build_clusters(df, "person", ["alias_keyword"], 1).collect()
    }
    assert got["p1"] == ("p1", 2) and got["p2"] == ("p1", 2)
    assert got["p3"] == ("p3", 1) and got["p4"] == ("p4", 1)

    orgs = [
        ("o1", {"data": {
            "names": [{"name": "Acme Trading", "name_type": "primary"}],
            "display_fields": [{"title": "Registration Number", "value": "AB99887"}],
        }}),
        ("o2", {"data": {
            "names": [{"name": "Totally Different", "name_type": "primary"}],
            "display_fields": [{"title": "Registration Number", "value": "AB99887"}],
        }}),  # same registration id -> same entity
        ("o3", {"data": {
            "names": [{"name": "Trading Acme Ltd", "name_type": "primary"}],
        }}),  # same sorted org keyword as o1 (Ltd dropped)
    ]
    dfo = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in orgs], "sanction_id string, raw_entity string"
    )
    goto = {
        r["sanction_id"]: (r["entity_id"], r["n_members"])
        for r in build_clusters(dfo, "organisation", ["org_alias_keyword", "org_ids"], 1).collect()
    }
    assert goto["o1"] == ("o1", 3) and goto["o2"] == ("o1", 3) and goto["o3"] == ("o1", 3)


def test_address_visitor_tokens_and_texts(spark):
    # AddressVisitor (organisation_visitors.py:130-277): texts pooled from
    # addresses + locations + 'Address' display fields; tokens keep numerics
    # or len>3, lowercase, minus the address stopword list
    import json

    from entity_resolution_spark.operators.sanctions import address_token_features

    ent = {
        "data": {
            "addresses": [
                {"original_address": "12 Baker Street, London", "country": "UK"},
                {"value": "Unit 7, Hightown Business Park"},
            ],
            "locations": [{"name": "Floor 3 Westgate House", "country": "Germany"}],
            "display_fields": [
                {"title": "Address", "value": "Calle Mayor 99"},
                {"title": "Program", "value": "dropme"},
            ],
        }
    }
    df = spark.createDataFrame([(1, json.dumps(ent))], ["id", "raw_entity"])
    row = address_token_features(df).collect()[0]
    assert row["address_texts"] == [
        "12 Baker Street, London",
        "Calle Mayor 99",
        "Floor 3 Westgate House",
        "Unit 7, Hightown Business Park",
    ]
    # '12'/'99'/'7'/'3' numeric kept; 'unit' len 4 kept; 'street'/'park'/
    # 'business'/'house'/'floor' are stopwords; 'mayor' kept
    assert row["address_tokens"] == [
        "12", "3", "7", "99", "baker", "calle", "hightown", "london",
        "mayor", "unit", "westgate",
    ]


def test_address_visitor_country_resolution(spark):
    import json

    from entity_resolution_spark.operators.geo import geo_mapping
    from entity_resolution_spark.operators.sanctions import (
        address_country_features,
    )

    countries = spark.createDataFrame(
        [("United Kingdom", "GB"), ("Germany", "DE"), ("Spain", "ES")],
        ["name", "code"],
    )
    aliases = spark.createDataFrame(
        [("United Kingdom", ["UK"])], "name string, aliases array<string>"
    )
    geo = geo_mapping(countries, aliases)

    e1 = {
        "data": {
            "addresses": [
                # 'country' field resolves via alias; 'London' segment is a miss
                {"original_address": "12 Baker Street, London", "country": "UK"},
                # comma-split segment 'Germany' resolves
                {"value": "Floor 3, Germany"},
            ]
        }
    }
    e2 = {"data": {"display_fields": [{"title": "Program", "value": "x"}]}}
    df = spark.createDataFrame(
        [(1, json.dumps(e1)), (2, json.dumps(e2))], ["id", "raw_entity"]
    )
    got = {
        r["id"]: r["address_country"]
        for r in address_country_features(df, geo, id_col="id").collect()
    }
    assert got[1] == ["germany", "united kingdom"]
    assert got[2] == []


def test_passport_features_pid_rule(spark):
    # _extract_pid (common.py:553-563): split on ;,-/() -> alnum tokens with
    # len>4 and a digit -> case-sensitive sort -> '+' join -> lower
    import json

    from entity_resolution_spark.operators.sanctions import passport_features

    e1 = {
        "data": {
            "passports": [
                # 'Zz12345' sorts before 'ab999x' case-sensitively (Z < a)
                {"passport": "ab999x/Zz12345; exp. 2030"},
                # 'no1' too short, 'passport' no digit, '12-345' split apart
                {"passport": "no1 passport 12-345"},
                {"passport": "B7777777 (diplomatic)"},
            ]
        }
    }
    e2 = {"data": {}}
    df = spark.createDataFrame(
        [(1, json.dumps(e1)), (2, json.dumps(e2))], ["id", "raw_entity"]
    )
    got = {
        r["id"]: (r["passport_raw"], r["passport_id"])
        for r in passport_features(df).collect()
    }
    assert got[1][0] == [
        "ab999x/Zz12345; exp. 2030",
        "no1 passport 12-345",
        "B7777777 (diplomatic)",
    ]
    assert got[1][1] == ["b7777777", "zz12345+ab999x"]
    assert got[2] == (None, None)
