"""Date standardisation goldens — output contract of the reference's
DateStandardisationVisitor (``am_combiner/features/date.py:28-116``):
per mention {year, month, day, text, validated, precision}."""

from __future__ import annotations

from entity_resolution_spark.functions.dates import extract_dates, standardized_date_keys


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, t string")
    rows = (
        df.select("id", extract_dates("t").alias("d"), standardized_date_keys("t").alias("k"))
        .orderBy("id")
        .collect()
    )
    return [([x.asDict() for x in r.d], list(r.k)) for r in rows]


def test_day_precision_families(spark):
    (iso, _), (slash, _), (mdy, _), (dmy, _) = _run(
        spark,
        [
            "released on 2021-03-05 worldwide",
            "filed 3/5/2021 in court",
            "born March 5, 2021 in Paris",
            "on 5 March 2021 he left",
        ],
    )
    for hits in (iso, slash, mdy, dmy):
        assert len(hits) == 1
        d = hits[0]
        assert (d["year"], d["month"], d["day"]) == (2021, 3, 5)
        assert d["precision"] == "day" and d["validated"] is True


def test_invalid_calendar_date_extracts_but_fails_validation(spark):
    ((hits, keys),) = _run(spark, ["the report of 2020-02-30 was wrong"])
    assert len(hits) == 1
    assert hits[0]["precision"] == "day" and hits[0]["validated"] is False
    assert keys == []  # unvalidated mentions produce no blocking key


def test_precision_suppression(spark):
    # "March 5, 2021" must NOT additionally yield a month-year or bare-year hit
    ((hits, keys),) = _run(spark, ["born March 5, 2021; moved in May 1999"])
    precs = sorted((h["precision"], h["year"]) for h in hits)
    assert precs == [("day", 2021), ("month", 1999)]
    assert keys == ["1999-5-x", "2021-3-5"]


def test_bare_year_and_month_year(spark):
    ((hits, _),) = _run(spark, ["the 1987 crash; by December 2008 it was over"])
    got = {(h["precision"], h["year"], h["month"]) for h in hits}
    assert got == {("year", 1987, None), ("month", 2008, 12)}
    assert all(h["validated"] for h in hits)


def test_no_dates(spark):
    ((hits, keys),) = _run(spark, ["no temporal content here at all"])
    assert hits == [] and keys == []


def test_iso_digit_run_guard(spark):
    # digit-adjacent runs are ids/serials, not ISO dates: no DAY-precision
    # mention may come out of either ("2021" alone may still fall through to
    # the bare-year family — that is the reference's behavior for a lone year)
    ((a, _), (b, _)) = _run(
        spark, ["case 12021-03-05 pending", "ref 2021-03-055 filed"]
    )
    assert [h for h in a if h["precision"] == "day"] == []
    assert [h for h in b if h["precision"] == "day"] == []


def test_standalone_month_year_survives_same_month_day_hit(spark):
    # a standalone "March 2021" is a real month mention even though
    # "March 5, 2021" (same year+month) appears elsewhere in the text
    ((hits, keys),) = _run(
        spark, ["Born March 5, 2021. By March 2021 the market had moved"]
    )
    precs = sorted((h["precision"], h["year"]) for h in hits)
    assert precs == [("day", 2021), ("month", 2021)]
    assert keys == ["2021-3-5", "2021-3-x"]


def test_per_occurrence_suppression(spark):
    # suppression is occurrence-counted, not text-containment: a standalone
    # repeat of a string that also appears inside a day hit is a real mention
    ((a, _), (b, _)) = _run(
        spark,
        [
            "Published March 5, 2021. Also archived 2021.",
            "Met in March 2021 and again on 5 March 2021.",
        ],
    )
    got_a = sorted((h["precision"], h["year"]) for h in a)
    assert got_a == [("day", 2021), ("year", 2021)]
    got_b = sorted((h["precision"], h["year"]) for h in b)
    assert got_b == [("day", 2021), ("month", 2021)]
