"""Sequence chunking — split documents into fixed-token-budget training
chunks with overlap (the standard context-window packing prep: RoBERTa §3.1
FULL-SENTENCES / Llama-2 pretraining chunking). The inverse concern of
dedup: dedup removes rows, chunking fans each row out into model-sized units.

Scale shape: entirely row-local (split / slice / transform / posexplode) —
zero shuffles, zero UDFs; at 100 TB this is a map-only stage that pipelines
with the scan and whatever sink follows. Output order inside a doc is the
chunk index, so downstream repartitioning can key on (doc, chunk) without a
sort.

Definitions (identical on both engines, documented for the oracle):
- tokens: split(text, /\\s+/), empties dropped (case PRESERVED — chunks are
  training payloads, not match keys; chunk_text re-joins with single spaces,
  i.e. whitespace is normalized);
- stride = chunk_tokens − overlap (must be ≥ 1);
- chunk i starts at token i·stride + 1 (1-based) and takes
  min(chunk_tokens, n − start + 1) tokens;
- num_chunks = 1 for 0 < n ≤ chunk_tokens, else
  ceil((n − chunk_tokens)/stride) + 1 — every chunk past the first adds at
  least one new token, and the final chunk reaches the last token;
- empty docs produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import ws_tokens


def chunk_documents(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "unique_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, text) → (id, chunk_idx, token_start, n_tokens, chunk_text).

    ``chunk_idx`` is 0-based, ``token_start`` 1-based; both bigint.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks = ws_tokens(F.col(text_col), lower=False)
    n = F.size("_toks")
    num_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)) + 1
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), num_chunks - 1), lambda i: i * stride + 1
    )
    return (
        docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .select(
            "_id",
            "_toks",
            F.size("_toks").alias("_n"),
            F.posexplode(
                F.when(num_chunks > 0, starts).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("chunk_idx", "_start"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("_start").cast("bigint").alias("token_start"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start") + 1)
            .cast("bigint")
            .alias("n_tokens"),
            F.concat_ws(
                " ",
                F.slice(
                    "_toks",
                    F.col("_start"),
                    F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start") + 1),
                ),
            ).alias("chunk_text"),
        )
    )
