"""PII redaction operator (operators/pii.py) — counts, placeholders and
non-PII passthrough; plus the no-shuffle plan shape."""

from __future__ import annotations

from entity_resolution_spark.operators.pii import redact_pii


def test_redact_pii_counts_and_placeholders(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org today"),
            (2, "server 192.168.0.1 and 10.0.0.255 rebooted"),
            (3, "call +1 555-867-5309 or 555.867.5309 now"),
            (4, "ssn on file 123-45-6789"),
            (5, "token " + "a1" * 16 + " leaked"),
            (6, "nothing sensitive here 42 7.5 v1.2"),
        ],
        ["id", "text"],
    )
    rows = {r["id"]: r for r in redact_pii(df).collect()}

    assert rows[1]["pii_email"] == 1
    assert rows[1]["redacted_text"] == "reach me at <EMAIL> today"
    assert rows[2]["pii_ipv4"] == 2
    assert rows[2]["redacted_text"] == "server <IP> and <IP> rebooted"
    assert rows[3]["pii_phone"] == 2
    assert rows[3]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert rows[4]["pii_ssn"] == 1
    assert rows[4]["redacted_text"] == "ssn on file <SSN>"
    assert rows[5]["pii_secret"] == 1
    assert rows[5]["redacted_text"] == "token <SECRET> leaked"
    # version strings / bare numbers / short decimals survive untouched
    assert rows[6]["pii_total"] == 0
    assert rows[6]["redacted_text"] == rows[6]["text"]
    for i in (1, 2, 3, 4, 5):
        assert rows[i]["pii_total"] >= 1


def test_redact_pii_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a@b.co")], ["id", "text"])
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_in_place_audits_raw_text(spark):
    """out_col == text_col (in-place scrub, the corpus-prep job path) must
    still count matches against the ORIGINAL text."""
    df = spark.createDataFrame([(1, "mail a@b.co and 10.0.0.1")], ["id", "text"])
    r = redact_pii(df, out_col="text").collect()[0]
    assert r["text"] == "mail <EMAIL> and <IP>"
    assert r["pii_email"] == 1 and r["pii_ipv4"] == 1 and r["pii_total"] == 2
