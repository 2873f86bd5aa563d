"""Hash-based signatures: record ids, MinHash, SimHash, rolling fingerprints.

All signatures are computed with Spark's built-in 64-bit hash functions
(``xxhash64`` — JVM-side, whole-stage-codegen'd); seeds are varied by prefixing a
literal salt, so the same (value, seed) always hashes identically on any cluster —
the determinism requirement the reference meets with id-seeded projections
(``am_combiner/combiners/fastRP.py:62-67``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ID_SEP = "\x1f"


def unique_id(repo: Column | str = "repo", path: Column | str = "path",
              commit: Column | str = "commit") -> Column:
    """Stable record id: sha256(repo ∥ path ∥ commit) hex — matches the synthetic
    generator and survives re-partitioning/re-runs (no monotonically_increasing_id)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (repo, path, commit)]
    return F.sha2(F.concat_ws(ID_SEP, *cols), 256)


def content_sha(col: Column | str = "content") -> Column:
    """The per-row integrity invariant: sha256 of the untouched content column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def long_id(col: Column | str) -> Column:
    """64-bit surrogate of a string id, for the connected-components loop.

    NOTE (scale): at 10^12 records a 64-bit surrogate has non-trivial birthday
    collision probability; production would use the string id itself (CC works on
    any orderable type) or a 128-bit pair. We keep longs for shuffle width and note
    the switch is a one-line change (CC below is type-agnostic).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def minhash_signature(exploded_value: Column, num_hashes: int) -> list[Column]:
    """Aggregate expressions computing a MinHash signature over an exploded
    (id, value) frame: one ``min(xxhash64(salt_i || value))`` per hash function.

    Use as: ``df.select(id, explode(shingles).alias('v')).groupBy(id).agg(*exprs)``.
    """
    return [
        F.min(F.xxhash64(F.lit(f"mh{i}"), exploded_value)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def band_keys(num_hashes: int, bands: int, prefix: str = "mh_") -> list[Column]:
    """LSH band keys from a MinHash signature laid out as columns ``mh_0..mh_{H-1}``:
    hash of each band's row-slice. ``bands`` must divide ``num_hashes``."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"{prefix}{b * rows + r}") for r in range(rows)]
        out.append(F.xxhash64(F.lit(f"band{b}"), *cols).alias(f"band_{b}"))
    return out


def simhash64(exploded_value: Column, weight: Column | None = None) -> Column:
    """Aggregate expression for a 64-bit SimHash over an exploded (id, token) frame.

    Classic Charikar sketch: for each bit position, sum +w/-w by token-hash bit sign,
    take the sign of the sum. Expressed as 64 conditional sums folded into one long —
    all JVM-side aggregation, no UDF.
    """
    w = weight if weight is not None else F.lit(1)
    h = F.xxhash64(exploded_value)
    one = F.lit(1).cast("long")
    bit_sums = [
        F.sum(F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, w).otherwise(-w)).alias(f"b{i}")
        for i in range(64)
    ]
    # caller folds: use simhash_fold() on the 64 aggregated columns
    return bit_sums  # type: ignore[return-value]


def simhash_fold(prefix: str = "b") -> Column:
    """Fold the 64 bit-sum columns produced by :func:`simhash64` into one long.

    Bit 63 is set via shiftleft (1<<63 overflows a positive long literal)."""
    acc = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(64):
        acc = acc.bitwiseOR(
            F.when(F.col(f"{prefix}{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        )
    return acc


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes: popcount of xor."""
    return F.bit_count(a.bitwiseXOR(b))


def hashed_shingles(tok: Column, k: int = 5) -> Column:
    """Sorted distinct xxhash64 of each k-token window — hashes the slice array
    directly (no per-window string materialization). Documents shorter than k
    tokens hash their whole token sequence, so short files still compare.
    ``tok`` must be a bound column reference (see pipeline.extract_features on
    HOF-lambda re-evaluation)."""
    windows = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (k - 1)),
        lambda i: F.xxhash64(F.slice(tok, i, k)),
    )
    short = F.when(F.size(tok) > 0, F.array(F.xxhash64(tok))).otherwise(
        F.array().cast("array<bigint>")
    )
    return F.array_sort(
        F.array_distinct(F.when(F.size(tok) >= k, windows).otherwise(short))
    )


def rolling_fingerprints(tok: Column, window: int = 8, keep_every: int = 16) -> Column:
    """Document fingerprinting (winnowing-lite): hash every ``window``-token shingle,
    keep hashes ≡ 0 (mod keep_every) — a deterministic content-defined sample used
    for copy detection. Pure higher-order-function SQL.
    """
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tok) - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tok, i, window))),
    )
    return F.array_sort(F.array_distinct(F.filter(windows, lambda h: h % keep_every == 0)))


def with_minhash(df: DataFrame, id_col: str, shingle_col: str,
                 num_hashes: int = 32) -> DataFrame:
    """(id, array<string> shingles) → (id, mh_0..mh_{H-1}); one explode + one groupBy."""
    exploded = df.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("_v"))
    return exploded.groupBy(id_col).agg(*minhash_signature(F.col("_v"), num_hashes))
