"""C4 line- and page-level cleaning rules (Raffel et al. 2020, §2.2 — the
public "C4" corpus recipe; RefinedWeb and Dolma apply the same family).

Line rules (a line is kept only if ALL hold):
- ends in a terminal punctuation mark (period / ! / ? / closing quote);
- contains at least ``min_words_per_line`` whitespace words;
- does not contain the word "javascript" (case-insensitive).

Page rules (the document is dropped, ``clean_text`` = NULL, if ANY holds):
- fewer than ``min_kept_lines`` surviving lines (the paper counts
  sentences; kept lines are the documented line-level proxy);
- any blocklist phrase occurs anywhere in the raw page (default
  "lorem ipsum", case-insensitive);
- a curly bracket ``{`` occurs anywhere in the raw page.

Scale shape (the 100 TB argument): everything is ONE codegen'd projection —
``split`` on newline, a ``filter`` HOF for the line rules, ``array_join``
back. No explode, no shuffle, no Python; at 1000 executors each task
streams its split once. Audit outputs are integers so the driver oracle
hashes exactly.

HOF hygiene: per the repo rule, multi-parameter builtins are never passed
bare as HOF callbacks (pyspark feeds (element, index) to arity-2
callables); every lambda here is explicit single-arg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = '[.!?"]$'


def _line_keep(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return (
        t.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(t, " +")) >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 5,
    blocklist: tuple[str, ...] = ("lorem ipsum",),
) -> DataFrame:
    """Apply the C4 rules; adds ``n_lines``, ``n_kept_lines``, ``page_kept``
    (bigint 0/1) and ``out_col`` (newline-joined kept lines, NULL when the
    page is dropped)."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.transform(
        F.filter(lines, lambda ln: _line_keep(ln, min_words_per_line)),
        lambda ln: F.trim(ln),
    )
    page_drop = (F.size(kept) < min_kept_lines) | text.contains("{")
    for phrase in blocklist:
        page_drop = page_drop | F.lower(text).contains(phrase.lower())
    return (
        df.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn("page_kept", (~page_drop).cast("long"))
        .withColumn(
            out_col,
            F.when(~page_drop, F.array_join(kept, "\n")).otherwise(
                F.lit(None).cast("string")
            ),
        )
    )


def corpus_line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Corpus-WIDE duplicate-line removal — the across-dataset half of C4
    §2.2 ("we discarded all but one of any ... span occurring more than once
    in the data set") at line granularity, the line-dedup pass RefinedWeb /
    Dolma run before document-level near-dedup. A line whose TRIMMED text
    occurs ``min_count``-or-more times anywhere in the corpus is dropped
    from every document — except, with ``keep_first``, at its one canonical
    first occurrence (minimum (id, line position) — Spark struct ordering,
    mirrored by the oracle's ``row_number() OVER (ORDER BY id, pos)``).
    Empty/whitespace-only lines always drop. Kept lines are re-joined in
    original order with their ORIGINAL (untrimmed) text.

    Output: (id, n_lines, n_kept_lines, clean_text) — one row per input doc,
    ``clean_text`` NULL when nothing survives. All counts bigint.

    Scale shape (the 100 TB argument): one explode → ONE census shuffle on
    ``xxhash64(trimmed line)`` (map-side combining count + min-occurrence) →
    one hash join back on the 8-byte key → per-doc reassembly as a sorted
    collect over (doc, pos). Line text crosses the census exchange only as
    its hash; the corpus is never self-joined. Equality-by-hash is the
    engine's accepted 64-bit surrogate class; the DuckDB oracle censuses the
    STRING lines and hash-matches.
    """
    lines = F.split(F.coalesce(F.col(text_col).cast("string"), F.lit("")), "\n")
    # deliberately NOT materialized: base feeds the census subtree AND the
    # final n_lines join, but it is a narrow projection of the source scan —
    # re-reading the corpus twice is the scale-safe choice (a localCheckpoint
    # here would write the entire split-line corpus to executor storage)
    base = docs.select(F.col(id_col).alias("_id"), lines.alias("_ls"))
    ex = (
        base.select("_id", F.posexplode("_ls").alias("_pos", "_ln"))
        .withColumn("_t", F.trim("_ln"))
        .where(F.col("_t") != "")
        .withColumn("_k", F.xxhash64("_t"))
    )
    census = ex.groupBy("_k").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("_id", "_pos")).alias("_first"),
    )
    keep = F.col("_cnt") < min_count
    if keep_first:
        keep = keep | (F.struct("_id", "_pos") == F.col("_first"))
    kept = (
        ex.join(census.hint("shuffle_hash"), "_k")
        .where(keep)
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_kept_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_ln"))),
                    lambda s: s["_ln"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )
    return (
        base.join(kept, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.size("_ls").cast("long").alias("n_lines"),
            F.coalesce("n_kept_lines", F.lit(0)).cast("long").alias("n_kept_lines"),
            "clean_text",
        )
    )
