"""Geographic mention resolution — the ArticleGeoVisitor family
(reference ``am_combiner/features/geography.py:13-422``).

The reference builds an nx.DiGraph from small lexicon files (country primary
names marked ``final``; alias -> country, code <-> country, state <-> country,
capital <-> country edges) and resolves each GPE mention by DFS-preorder to
the FIRST ``final`` node (geography.py:304-342 — ``if resolutions: break``).
Every non-country node carries a direct edge to its country, so resolution is
a one-hop lookup whose tie-break is graph *insertion order*: countries are
added first, then aliases, codes, states, capitals (geography.py:397-422).

Spark-first shape: the lexicon is a tiny dimension table. We materialize the
DFS semantics as a (mention -> country) mapping DataFrame with an explicit
kind-priority replaying the insertion order, then resolve mentions with ONE
broadcast hash join — the 100 TB cost is a map-side join against a
few-thousand-row broadcast, no shuffle of the corpus.

No reference data files are read: the lexicon is caller-supplied (tests ship
a small public-facts sample); the operator is data-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# insertion order of get_full_geo_resolver (geography.py:397-422)
_KIND_PRIORITY = {"country": 0, "alias": 1, "code": 2, "state": 3, "capital": 4}


def _norm(c):
    return F.lower(F.trim(c))


def geo_mapping(
    countries: DataFrame,
    aliases: DataFrame | None = None,
    divisions: DataFrame | None = None,
) -> DataFrame:
    """Build the (mention -> canonical country) dimension table.

    - ``countries``: columns ``name``, ``code`` (CountriesList/CodesVisitor,
      geography.py:45-115).
    - ``aliases``: columns ``name``, ``aliases`` (array<string>) — the
      alternative-names file (geography.py:118-177). A row whose primary
      ``name`` is not a known country but one of whose aliases IS becomes
      keyed by that alias, with the old primary demoted into the alias set —
      the reference's primary/alias swap (geography.py:157-172). Rows where
      neither resolves are dropped (the reference only prints a warning).
    - ``divisions``: columns ``code``, ``states`` (array<string>),
      ``capital`` — per-country division file (geography.py:180-272).

    Output: ``mention`` (lowercased), ``country``, ``kind``, deduplicated to
    the lowest insertion priority per mention, countries themselves included
    (a country mention resolves to itself — DFS visits the source first).
    """
    c = countries.select(
        _norm("name").alias("country"), _norm("code").alias("code")
    ).dropDuplicates(["country"])

    parts = [
        c.select(
            F.col("country").alias("mention"),
            "country",
            F.lit("country").alias("kind"),
        ),
        c.where(F.col("code").isNotNull()).select(
            F.col("code").alias("mention"), "country", F.lit("code").alias("kind")
        ),
    ]

    if aliases is not None:
        a = aliases.select(
            _norm("name").alias("primary"),
            F.array_distinct(F.transform("aliases", _norm)).alias("alias_set"),
        )
        known = c.select(F.col("country").alias("primary")).withColumn(
            "_is_country", F.lit(True)
        )
        a = a.join(F.broadcast(known), "primary", "left")
        # primary/alias swap: the first alias that is itself a country becomes
        # the key and the old primary is demoted (geography.py:157-172) —
        # expressed as explode + broadcast membership join + first-over-window
        ex = a.select(
            "primary", "_is_country", F.posexplode("alias_set").alias("pos", "alias")
        ).join(
            F.broadcast(known.select(F.col("primary").alias("alias")).withColumn(
                "_alias_is_country", F.lit(True)
            )),
            "alias",
            "left",
        )
        w = Window.partitionBy("primary")
        ex = ex.withColumn(
            "_new_primary",
            F.when(F.col("_is_country"), F.col("primary")).otherwise(
                F.first(
                    F.when(F.col("_alias_is_country"), F.col("alias")),
                    ignorenulls=True,
                ).over(w.orderBy("pos").rowsBetween(Window.unboundedPreceding,
                                                    Window.unboundedFollowing))
            ),
        )
        alias_edges = (
            ex.where(F.col("_new_primary").isNotNull())
            .select(
                F.when(F.col("alias") == F.col("_new_primary"), F.col("primary"))
                .otherwise(F.col("alias"))
                .alias("mention"),
                F.col("_new_primary").alias("country"),
                F.lit("alias").alias("kind"),
            )
            .where(F.col("mention") != F.col("country"))
        )
        parts.append(alias_edges)

    if divisions is not None:
        d = divisions.select(
            _norm("code").alias("code"),
            F.coalesce("states", F.array().cast("array<string>")).alias("states"),
            _norm("capital").alias("capital"),
        ).join(F.broadcast(c), "code", "inner")
        parts.append(
            d.select(
                F.explode(F.array_distinct(F.transform("states", _norm))).alias(
                    "mention"
                ),
                "country",
                F.lit("state").alias("kind"),
            ).where(F.col("mention").isNotNull() & (F.col("mention") != ""))
        )
        parts.append(
            d.where(F.col("capital").isNotNull()).select(
                F.col("capital").alias("mention"),
                "country",
                F.lit("capital").alias("kind"),
            )
        )

    prio = F.create_map(
        *[x for k, v in _KIND_PRIORITY.items() for x in (F.lit(k), F.lit(v))]
    )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    w = Window.partitionBy("mention").orderBy(
        prio[F.col("kind")].asc(), F.col("country").asc()
    )
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_geo_mentions(
    df: DataFrame,
    mapping: DataFrame,
    mentions_col: str = "gpe_mentions",
    out_col: str = "gpe_clean",
    id_col: str | None = None,
) -> DataFrame:
    """GPE -> GPE_CLEAN (reference ArticleGeoVisitor, geography.py:345-394).

    Each mention is trimmed and matched case-insensitively; a hit is replaced
    by its canonical country name, a miss keeps the TRIMMED ORIGINAL-CASE
    text (geography.py:380-388). The per-row result is the reference's set,
    represented as a sorted distinct array.

    Plan shape: explode -> broadcast hash join on the mapping -> one
    hash aggregate back to the row. The corpus never shuffles on data
    columns; only the (id, mention) pairs move, and the join is map-side.

    Pass ``id_col`` (a unique row key) whenever one exists: the fallback
    ``monotonically_increasing_id`` feeds both sides of a self-join and is
    only safe when the input's partitioning is stable across recomputation.
    """
    if id_col is not None:
        keyed = df.withColumn("_gid", F.col(id_col))
    else:
        keyed = df.select(
            "*", F.monotonically_increasing_id().alias("_gid")
        )
    ex = keyed.select(
        "_gid", F.explode_outer(mentions_col).alias("_m")
    ).withColumn("_mt", F.trim("_m"))
    hit = ex.join(
        F.broadcast(mapping.select(F.col("mention").alias("_lc"), "country")),
        F.lower(F.col("_mt")) == F.col("_lc"),
        "left",
    ).select(
        "_gid",
        F.when(F.col("_m").isNull(), F.lit(None))
        .otherwise(F.coalesce("country", "_mt"))
        .alias("_resolved"),
    )
    agg = hit.groupBy("_gid").agg(
        F.array_sort(
            F.array_distinct(F.collect_list("_resolved"))
        ).alias(out_col)
    )
    return keyed.join(agg, "_gid", "left").drop("_gid")
