"""PII redaction — scrub emails, IPv4 addresses, phone numbers, SSNs and
hex secrets from document text, the standard pre-release scrubbing pass of
public LLM-corpus recipes (C4 "bad words + PII" pass, RefinedWeb §4.3 PII
rules, BigCode/The-Stack PII pipeline: replace matches with typed
placeholder tokens rather than dropping the document).

Scale shape (the 100 TB argument): every rule is a single JVM-side
``regexp_replace`` / ``regexp_count`` projection — map-side only, zero
shuffles, zero Python, whole-stage-codegen friendly. At 1000 executors each
task streams its parquet split once and writes redacted text plus integer
audit counts; nothing is collected or joined.

Oracle exactness: the pattern set is restricted to the regex subset with
identical semantics in Java (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, alternation-free concatenation and ``\\b`` word
boundaries; no backreferences or lookaround (RE2 lacks them). All audit
outputs are integers so the driver hash is engine-exact.

The sanction-visitor family of the reference normalizes free-text identity
fields with the same replace-by-rule pattern (reference
``features/common.py:336-666``); this operator is that pattern applied to
the training-data mandate's PII use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (rule name, pattern, placeholder) — applied in list order. Patterns are
# deliberately Java/RE2-common (see module docstring). The same literals are
# embedded in the oracle SQL (queries.SQL_PII_REDACT_DOCS); keep in sync.
PII_RULES: list[tuple[str, str, str]] = [
    # RFC-5322-lite mailbox: local part @ dotted domain + alpha TLD
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted-quad IPv4 (no octet-range check — scrubbing favors recall)
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # NANP-ish phone: optional +CC group, 3-3-4 groups with space/dot/dash
    # separators; the final separator is REQUIRED so pure digit runs (hex
    # secrets, long ids) can never be claimed as phones
    ("phone", r"(?:\+?\d{1,2}[ .-])?\(?\d{3}\)?[ .-]?\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
    # US SSN
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # 32/40/64-hex secrets (md5/sha1/sha256-shaped API keys and tokens)
    ("secret", r"\b[0-9a-f]{32,64}\b", "<SECRET>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted_text",
    count_prefix: str = "pii_",
) -> DataFrame:
    """Add ``out_col`` with every PII match replaced by its placeholder and
    one integer ``{count_prefix}{rule}`` column per rule counting matches in
    the ORIGINAL text (audit counts are rule-independent; the replacement
    chain applies rules in PII_RULES order).

    Pure projection: no shuffle, no UDF; safe to compose before any
    dedup/quality stage.
    """
    red = F.col(text_col)
    for _, pat, tok in PII_RULES:
        red = F.regexp_replace(red, pat, tok)
    # counts are built from the ORIGINAL column expression first, so
    # out_col == text_col (in-place scrub) still audits the raw text
    counts = []
    total = None
    for name, pat, _ in PII_RULES:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        counts.append((f"{count_prefix}{name}", c))
        total = c if total is None else total + c
    counts.append((f"{count_prefix}total", total))
    out = df.withColumns(dict(counts))
    return out.withColumn(out_col, red)
