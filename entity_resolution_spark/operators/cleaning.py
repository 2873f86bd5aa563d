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
