"""Sequence packing: assign documents to fixed-token-budget bins.

Training-data assembly packs documents into fixed-size token sequences
(e.g. 2048/4096/8192-token windows). True greedy first-fit packing is
inherently sequential; the distributed form used here is CUMULATIVE-OFFSET
binning:

1. shard the corpus deterministically (``id % n_shards`` by default — a
   pure-arithmetic shard every engine reproduces),
2. within each shard, order documents deterministically and compute the
   running token total (one window function),
3. a document's bin is ``floor(start_offset / budget)`` — the bin its
   FIRST token falls in.

Properties: fully deterministic, one shuffle (the window partition),
parallelism = ``n_shards`` (pick >= cluster cores at scale: sharding is
what makes the prefix-sum distributed — a global cumsum would serialize
into a single window partition). A document straddling a bin boundary is
assigned to its starting bin, so bins can overflow by at most one
document's tokens — the standard streaming-packing trade; callers that
need hard caps split oversized documents upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    budget: int,
    n_shards: int = 8,
    order_col: str | None = None,
) -> DataFrame:
    """(id, shard, bin, n_tokens, cum_tokens) per document.

    ``n_tokens`` is the token-count expression (e.g.
    ``text.token_count("text")`` or a precomputed column); ``bin`` is the
    shard-local fixed-budget bin. Deterministic given (id order, shard
    count) — no RNG, so the layout is reproducible run to run."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    order = order_col or id_col
    base = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint").alias("shard"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.col(order).alias("__ord") if order != id_col else F.col(id_col).alias("__ord"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return packed.select(
        id_col,
        "shard",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(float(budget)))
        .cast("bigint")
        .alias("bin"),
        "n_tokens",
        "cum_tokens",
    )


def bin_fill_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-(shard, bin) fill report: docs, tokens, fill ratio vs budget —
    the packing-quality metric a data curator watches (mean fill close to
    1.0 = little padding waste)."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn(
            "fill_ratio", (F.col("bin_tokens") / F.lit(float(budget))).cast("double")
        )
    )


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    chunk_size: int = 50,
    stride: int = 40,
    text_out: str = "chunk_text",
) -> DataFrame:
    """Fixed-window chunking with overlap: split each document's token
    array into ``chunk_size``-token windows starting every ``stride``
    tokens (overlap = ``chunk_size - stride``), the standard pre-packing
    split for long documents in a training pipeline.

    Window starts are ``1, 1+stride, ...`` up to
    ``greatest(1, n - overlap)``, so the tail is always covered and the
    final chunk may be short (never empty); a document shorter than one
    window yields exactly one chunk. Output per chunk: ``chunk_idx``
    (0-based), ``start_token`` (1-based), ``n_tokens``, and the
    re-joined ``chunk_text``.

    Scale shape: pure map-side — tokenize, ``sequence`` + ``explode``,
    ``slice`` — no shuffle anywhere, so it pipelines into whatever
    consumes the chunks (dedup, packing, embedding batches) and the
    dense chunk rows never hit a shuffle unless the consumer needs one.
    """
    if chunk_size <= 0 or stride <= 0 or stride > chunk_size:
        raise ValueError(
            f"need 0 < stride <= chunk_size, got chunk_size={chunk_size} "
            f"stride={stride}"
        )
    overlap = chunk_size - stride
    toks = df.select(F.col(id_col), tokens.alias("__toks"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.size("__toks") - F.lit(overlap)),
        F.lit(stride),
    )
    exploded = toks.select(
        F.col(id_col), F.col("__toks"), F.explode(starts).alias("start_token")
    )
    chunk = F.slice("__toks", F.col("start_token"), F.lit(chunk_size))
    return exploded.select(
        F.col(id_col),
        F.floor((F.col("start_token") - 1) / F.lit(float(stride)))
        .cast("bigint")
        .alias("chunk_idx"),
        F.col("start_token").cast("bigint"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias(text_out),
    )
