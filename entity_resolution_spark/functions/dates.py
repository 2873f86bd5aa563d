"""Date/time standardisation over free text — the DateStandardisationVisitor
analog (reference ``am_combiner/features/date.py:28-116``).

The reference pipeline is spaCy NER -> dateparser -> date_extractor cross-check;
its OUTPUT contract per mention is ``{year, month, day, text, validated,
precision}`` where precision ∈ {year, month, day} reflects which fields the
mention actually pins down, and ``validated`` means two independent parses
agree. This module reproduces that contract with deterministic JVM-side
expressions (``regexp_extract_all`` + higher-order ``transform``) — no Python
in the row path, no model downloads:

- pattern families: ISO (2021-03-05), slash (3/5/2021, month-first), textual
  ("March 5, 2021" / "5 March 2021"), month-year ("March 2021"), bare year;
- precision comes from the matched family;
- ``validated``: day-precision mentions are re-parsed by Spark's own datetime
  parser (``try_to_timestamp``) — the second-opinion check; an invalid
  calendar date (Feb 30) extracts but fails validation, exactly the
  reference's "two parsers agree" semantics. Year/month precision is
  validated by range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = [
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
]
_MON_RE = (
    "(?i)(January|February|March|April|May|June|July|August|September|"
    "October|November|December|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
)
_YEAR_RE = r"((?:1[89]|20)\d{2})"

DATE_STRUCT = (
    "struct<year:int,month:int,day:int,text:string,validated:boolean,"
    "precision:string>"
)


def _month_num(name: Column) -> Column:
    return F.array_position(
        F.lit(_MONTHS), F.lower(F.substring(name, 1, 3))
    ).cast("int")


def _mk(y: Column, m: Column, d: Column, txt: Column, precision: str) -> Column:
    y, m, d = y.cast("int"), m.cast("int"), d.cast("int")
    if precision == "day":
        validated = F.try_to_timestamp(
            F.concat_ws("-", y, m, d), F.lit("y-M-d")
        ).isNotNull()
    elif precision == "month":
        validated = m.between(1, 12)
    else:
        validated = y.between(1800, 2099)
    return F.struct(
        y.alias("year"),
        (m if precision != "year" else F.lit(None).cast("int")).alias("month"),
        (d if precision == "day" else F.lit(None).cast("int")).alias("day"),
        txt.alias("text"),
        validated.alias("validated"),
        F.lit(precision).alias("precision"),
    )


def _family(text: Column, pattern: str, build) -> Column:
    """All matches of one pattern family -> array<DATE_STRUCT>."""
    matches = F.regexp_extract_all(text, F.lit(pattern), 0)
    return F.transform(matches, build)


def _occurrences(hay: Column, needle: Column) -> Column:
    """Non-overlapping substring occurrence count (length-delta / replace)."""
    return F.when(F.length(needle) == 0, F.lit(0)).otherwise(
        ((F.length(hay) - F.length(F.replace(hay, needle))) / F.length(needle))
        .cast("int")
    )


def _keep_uncovered(arr: Column, sup: Column) -> Column:
    """Per-OCCURRENCE precision suppression. ``regexp_extract_all`` emits one
    element per occurrence, so for each mention text drop exactly as many
    occurrences as are covered inside suppressor-hit texts and keep the rest.
    (Plain text containment over-suppresses: a standalone "March 2021" — or a
    repeated bare "2021" — elsewhere in the text is a genuine mention even
    when "5 March 2021" also appears; the reference emits one mention per
    spaCy DATE entity.)"""

    def keep(m, i):
        covered = F.aggregate(
            sup, F.lit(0), lambda acc, d: acc + _occurrences(d["text"], m["text"])
        )
        earlier_same = F.size(
            F.filter(F.slice(arr, F.lit(1), i), lambda e: e["text"] == m["text"])
        )
        return earlier_same >= covered

    return F.filter(arr, keep)


def extract_dates(text: Column) -> Column:
    """array<DATE_STRUCT> of every standardised date mention in ``text``.

    Families are matched longest-first and a mention claimed by a more precise
    family is suppressed in the less precise ones (a bare "2021" inside
    "March 5, 2021" is not also a year mention) — mirroring the reference's
    single pass over spaCy DATE entities.
    """
    iso = _family(
        text,
        # digit-boundary guards: an id/serial like "12021-03-05" or
        # "2021-03-055" must not shed a bogus validated day mention
        r"(?<!\d)(?:1[89]|20)\d{2}-\d{2}-\d{2}(?!\d)",
        lambda s: _mk(
            F.substring(s, 1, 4), F.substring(s, 6, 2), F.substring(s, 9, 2),
            s, "day",
        ),
    )
    slash = _family(
        text,
        r"\b\d{1,2}/\d{1,2}/(?:1[89]|20)\d{2}\b",
        lambda s: _mk(
            F.element_at(F.split(s, "/"), 3),
            F.element_at(F.split(s, "/"), 1),
            F.element_at(F.split(s, "/"), 2),
            s, "day",
        ),
    )
    mdy = _family(
        text,
        _MON_RE + r"\.? \d{1,2}, " + _YEAR_RE,
        lambda s: _mk(
            F.regexp_extract(s, _YEAR_RE, 1),
            _month_num(F.regexp_extract(s, _MON_RE, 1)),
            F.regexp_extract(s, r" (\d{1,2}),", 1),
            s, "day",
        ),
    )
    dmy = _family(
        text,
        r"\b\d{1,2} " + _MON_RE + r"\.? " + _YEAR_RE,
        lambda s: _mk(
            F.regexp_extract(s, _YEAR_RE, 1),
            _month_num(F.regexp_extract(s, _MON_RE, 1)),
            F.regexp_extract(s, r"^(\d{1,2}) ", 1),
            s, "day",
        ),
    )
    # month-year: suppress matches that were part of a day-precision textual hit
    my = _family(
        text,
        _MON_RE + r"\.? " + _YEAR_RE,
        lambda s: _mk(
            F.regexp_extract(s, _YEAR_RE, 1),
            _month_num(F.regexp_extract(s, _MON_RE, 1)),
            F.lit(None), s, "month",
        ),
    )
    yr = _family(
        text,
        r"\b(?:1[89]|20)\d{2}\b",
        lambda s: _mk(s, F.lit(None), F.lit(None), s, "year"),
    )

    day_hits = F.concat(iso, slash, mdy, dmy)
    # occurrence-counted suppression (see _keep_uncovered): month-year
    # occurrences inside day hits are dropped, standalone repeats survive;
    # same for bare years vs every higher-precision hit
    my_kept = _keep_uncovered(my, day_hits)
    month_plus = F.concat(day_hits, my_kept)
    yr_kept = _keep_uncovered(yr, month_plus)
    return F.concat(month_plus, yr_kept)


def standardized_date_keys(text: Column) -> Column:
    """Distinct sorted 'y-m-d'-style keys of VALIDATED mentions — the blocking-
    key form the reference feeds to its combiners (Features.DATE)."""
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(extract_dates(text), lambda d: d["validated"]),
                lambda d: F.concat_ws(
                    "-",
                    d["year"],
                    F.coalesce(d["month"].cast("string"), F.lit("x")),
                    F.coalesce(d["day"].cast("string"), F.lit("x")),
                ),
            )
        )
    )


# --- Time standardisation (reference am_combiner/features/time.py:9-118) ----
#
# The reference's TimeStandardisationVisitor normalises am/pm spellings, then
# tries exactly five strptime patterns ("%I %p", "%I%p", "%I:%M %p",
# "%I:%M%p", "%H:%M"); a mention that none of them full-match falls back to a
# regex scan whose hits are themselves re-parsed, unparseable hits kept RAW
# (time.py:99-110 — including the documented "3.17AM -> 17AM" quirk, which the
# golden tests pin). Everything below is a pure Column expression; the
# strptime patterns are translated to CPython _strptime's own group regexes
# (%I = 1[0-2]|0[1-9]|[1-9], %M = [0-5]\d|\d, %H = 2[0-3]|[01]\d|\d, format
# whitespace = \s+, IGNORECASE) so the full-match semantics are identical.

_H12 = r"(1[0-2]|0[1-9]|[1-9])"
_H24 = r"(2[0-3]|[01]\d|\d)"
_MIN = r"([0-5]\d|\d)"
_TIME_FALLBACK_RE = r"\d{1,2}:?(?:\d{2})?\s?(?:AM|PM|am|pm)"


def _time_hms(h24: Column, minute: Column) -> Column:
    """str(datetime.time(h, m)) — zero-padded 'HH:MM:00'."""
    return F.concat_ws(
        ":",
        F.lpad(h24.cast("string"), 2, "0"),
        F.lpad(minute.cast("string"), 2, "0"),
        F.lit("00"),
    )


def _meridiem_h24(h12: Column, mer: Column) -> Column:
    return (h12.cast("int") % 12) + F.when(
        F.upper(mer) == "PM", F.lit(12)
    ).otherwise(F.lit(0))


def _try_parse_time(t: Column) -> Column:
    """'HH:MM:00' of the last reference pattern that full-matches, else NULL.

    The five patterns are mutually exclusive on any one string (meridiem
    presence and the colon/space shape differ), so the reference's
    keep-last-success loop (time.py:69-77) reduces to a first-match chain.
    """
    p_h24 = r"^" + _H24 + ":" + _MIN + r"$"
    p_hm_mer_tight = r"(?i)^" + _H12 + ":" + _MIN + r"(AM|PM)$"
    p_hm_mer = r"(?i)^" + _H12 + ":" + _MIN + r"\s+(AM|PM)$"
    p_h_mer_tight = r"(?i)^" + _H12 + r"(AM|PM)$"
    p_h_mer = r"(?i)^" + _H12 + r"\s+(AM|PM)$"

    def h12(pat: str, with_min: bool) -> Column:
        h = F.regexp_extract(t, pat, 1)
        m = F.regexp_extract(t, pat, 2) if with_min else F.lit("0")
        mer = F.regexp_extract(t, pat, 3 if with_min else 2)
        return _time_hms(_meridiem_h24(h, mer), m)

    return (
        F.when(
            t.rlike(p_h24),
            _time_hms(
                F.regexp_extract(t, p_h24, 1).cast("int"),
                F.regexp_extract(t, p_h24, 2),
            ),
        )
        .when(t.rlike(p_hm_mer_tight), h12(p_hm_mer_tight, True))
        .when(t.rlike(p_hm_mer), h12(p_hm_mer, True))
        .when(t.rlike(p_h_mer_tight), h12(p_h_mer_tight, False))
        .when(t.rlike(p_h_mer), h12(p_h_mer, False))
    )


def _standardize_one_time(t: Column) -> Column:
    """One raw mention -> array of standardised-or-raw strings (time.py:92-110)."""
    n = F.coalesce(t, F.lit(""))
    # ordered, case-sensitive replaces — exactly _normalise_am_pm (time.py:27-48)
    for old, new in (("p.m.", "PM"), ("a.m.", "AM"), ("pm", "PM"), ("am", "AM")):
        n = F.replace(n, F.lit(old), F.lit(new))
    direct = _try_parse_time(n)
    fallback = F.transform(
        F.regexp_extract_all(n, F.lit(_TIME_FALLBACK_RE), 0),
        lambda m: F.coalesce(_try_parse_time(m), m),
    )
    return F.when(direct.isNotNull(), F.array(direct)).otherwise(fallback)


def standardize_times(times: Column) -> Column:
    """array<string> of raw time mentions -> sorted distinct standardised set.

    The TIME -> TIME_CLEAN feature transform (reference time.py:79-118): the
    per-article result is a set, represented here as a sorted distinct array
    so downstream blocking keys are deterministic.
    """
    per_mention = F.transform(times, _standardize_one_time)
    return F.coalesce(
        F.array_sort(F.array_distinct(F.flatten(per_mention))),
        F.array().cast("array<string>"),
    )
