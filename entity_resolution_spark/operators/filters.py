"""Input-side record filters: name include/exclude and the ``max_names`` limit.

Reference semantics being reproduced (not ported): the data provider trims its
input frame before any visitor runs —
``am_combiner/utils/data.py:185-195``: keep rows whose blocking field is in
``entity_names``, drop rows in ``excluded_entity_names``, then truncate to the
first ``max_names`` distinct names and keep only their rows.

Spark design: the name lists are human-sized (config values), so both filters
are ``isin`` predicates that Catalyst pushes into the scan; ``max_names``
materializes the tiny distinct-name head on the driver and broadcasts it into
a semi-join — one narrow shuffle-free pass over the records at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def filter_entity_names(
    records: DataFrame,
    blocking_col: str = "blocking_field",
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Keep/drop records by blocking-field membership (``utils/data.py:185-190``)."""
    out = records
    if include:
        out = out.where(F.col(blocking_col).isin(list(include)))
    if exclude:
        out = out.where(~F.col(blocking_col).isin(list(exclude)))
    return out


def limit_names(
    records: DataFrame,
    max_names: int | None,
    blocking_col: str = "blocking_field",
    order_by: Column | str | None = None,
) -> DataFrame:
    """Truncate to the first ``max_names`` distinct names; keep all their records
    (``utils/data.py:191-195``).

    The reference takes names in input-frame row order; a distributed frame has
    no row order, so the contract here is explicit: names rank by
    ``min(order_by)`` when given (e.g. an ingest timestamp or line number),
    else by the name itself — both deterministic under any partitioning.
    """
    if max_names is None:
        return records  # only None means "no limit"; 0 truncates to nothing
    rank_key = (
        F.min(order_by).alias("_rk")
        if order_by is not None
        else F.min(F.col(blocking_col)).alias("_rk")
    )
    head = (
        records.groupBy(blocking_col)
        .agg(rank_key)
        .orderBy(F.col("_rk").asc(), F.col(blocking_col).asc())
        .limit(int(max_names))
        .select(blocking_col)
    )
    return records.join(F.broadcast(head), blocking_col, "left_semi")


def preprocess_input_records(
    records: DataFrame,
    name_col: str = "blocking_field",
    id_col: str = "unique_id",
    text_col: str = "content",
    meta_keys: tuple[str, ...] = (),
    order_by: Column | str | None = None,
) -> DataFrame:
    """Input-frame preprocessing (reference ``utils/random_data.py:40-66``,
    ``preprocess_input_dataframe`` + ``add_metadata_series``): project to the
    (name, id, text) contract columns plus ``meta_keys``; pack the meta keys
    into a ``meta`` struct; force the unique-id URL scheme to ``http`` (the
    reference rewrites via urlparse so http/https duplicates collapse); drop
    duplicate unique_ids keeping the FIRST; finally keep only records whose
    entity name occurs verbatim inside the text.

    Order contract: pandas "keep first" has file order; a distributed frame
    does not, so first = smallest ``order_by`` (ingest line number,
    timestamp, ...) when given, else smallest (name, text) — deterministic
    under any partitioning. Step order matches the reference exactly:
    dedupe BEFORE the name-containment filter (a surviving first row that
    fails the filter is dropped even if a later duplicate would have passed).

    Scale shape: scheme rewrite and containment are codegen'd projections;
    the only exchange is the window on ``id_col`` (the dedupe key) — at
    100 TB that is one hash shuffle on a high-cardinality key, no skew
    (duplicate groups are tiny by construction).
    """
    norm_id = F.regexp_replace(
        F.col(id_col), r"^[A-Za-z][A-Za-z0-9+.-]*://", "http://"
    )
    out = records.withColumn(id_col, norm_id)
    order_cols = (
        [order_by] if order_by is not None else [F.col(name_col), F.col(text_col)]
    )
    w = Window.partitionBy(id_col).orderBy(*order_cols)
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = out.where(F.contains(F.col(text_col), F.col(name_col)))
    cols = [name_col, id_col, text_col, *meta_keys]
    out = out.select(*cols)
    if meta_keys:
        out = out.withColumn("meta", F.struct(*[F.col(k) for k in meta_keys]))
    return out
