"""Training-sequence assembly: token counts, sequence packing, chunking.

The reference has no training-batch surface (its tables are 2-3 rows;
subscription_flow.py:27-34 loads whole JSON files), but a corpus
pipeline's last mile is turning curated documents into model-ready
sequences. Two ops cover it:

- :func:`pack_sequences` — "concatenate then split at token-budget
  boundaries" packing: every document gets a ``(seq_id, seq_offset)``
  placement under a fixed budget. Globally-greedy packing is inherently
  sequential (each placement depends on the running remainder), so we
  shard by a content-keyed hash and pack within shards: each shard's
  running sum is an independent window partition → ``n_shards``-way
  parallelism, deterministic under repartitioning/retries because both
  the shard and the intra-shard order derive from the data, never from
  partition layout. At 100 TB, ``n_shards`` scales with the cluster
  (each shard's window state is one running sum — O(1) memory).
- :func:`chunk_documents` — overlapping token windows (size/stride),
  the long-document-split / RAG-chunking primitive. Pure per-row
  higher-order-function math: map-only, no shuffle, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import norm_tokens
from .sampling import hash_bucket

#: seq_id = shard * _SEQ_STRIDE + intra-shard sequence number; 1e6
#: sequences per shard is far beyond any shard's document count here and
#: keeps the composite id readable (shard recoverable by integer div).
_SEQ_STRIDE = 1_000_000


def with_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count per row (size of :func:`norm_tokens`)."""
    return df.withColumn(out, F.size(norm_tokens(F.col(text_col))))


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a training-sequence slot under ``budget``.

    Concat-and-split semantics: within a shard, documents are laid out
    end-to-end in ``id_col`` order; a document belongs to the sequence
    where it STARTS (``seq_offset`` is its start position), so a
    document may run past the budget boundary into the next sequence —
    exactly the packing used when pre-training batches are built by
    concatenating docs and slicing fixed-length windows.

    Plan: one map stage (tokenize + count + shard hash), one window
    shuffle partitioned by shard. The window state per shard is a single
    running sum; shards are content-hashed so skew is bounded by the
    hash, not by any data property.

    Returns ``(id_col, n_tokens, shard, seq_id, seq_offset)``.
    """
    # the guard chunk_documents always had (r12 review): budget=0 fed
    # `_cum div 0` / `_cum % 0` — all-NULL placements non-ANSI, a
    # DIVIDE_BY_ZERO abort under ANSI; n_shards=0 nulls the shard hash
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    t = with_token_count(df.select(id_col, text_col), text_col).drop(text_col)
    t = t.withColumn("shard", hash_bucket(F.col(id_col), n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return t.select(
        id_col,
        "n_tokens",
        "shard",
        F.expr(f"shard * {_SEQ_STRIDE} + _cum div {budget}").alias("seq_id"),
        (F.col("_cum") % budget).alias("seq_offset"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``;
    chunks are emitted until every token is covered, so the final chunk
    may be shorter (``chunk_tokens`` carries the actual length). A doc
    shorter than ``chunk_size`` yields exactly one chunk.

    The token array is staged in its own projection (referenced by the
    index sequence, the slice, and the length), so Catalyst cannot
    inline-and-re-tokenize per reference. ``explode`` fans out rows
    map-side — no shuffle anywhere.

    Returns ``(id_col, chunk_idx, chunk_text, chunk_tokens)``.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError(f"chunk_size/stride must be positive: {chunk_size}/{stride}")
    base = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("_tok"))
    # chunks beyond the first: ceil(max(n - chunk_size, 0) / stride),
    # kept in integer arithmetic (`div`) so the oracle's `//` matches
    extra = F.expr(
        f"(greatest(size(_tok) - {chunk_size}, 0) + {stride - 1}) div {stride}"
    )
    fanned = base.select(
        id_col,
        "_tok",
        F.size("_tok").alias("_n"),
        F.explode(F.sequence(F.lit(0), extra)).alias("chunk_idx"),
    )
    return fanned.select(
        id_col,
        "chunk_idx",
        F.concat_ws(
            " ", F.slice("_tok", F.col("chunk_idx") * stride + 1, chunk_size)
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_size), F.col("_n") - F.col("chunk_idx") * stride
        ).alias("chunk_tokens"),
    )


def length_bucketed_batches(
    df: DataFrame,
    batch_size: int = 32,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batch assembly: group docs of similar token
    length so fixed-size training batches pad to the batch max, not the
    corpus max — the standard padding-waste optimization for
    variable-length batches (dynamic batching / bucketed batching).

    - bucket = ceil(log2(n_tokens)) via the INTEGER formula
      ``length(bin(n-1))`` — no float log, so engines can't disagree
      at exact powers of two;
    - shard = content-hashed within bucket (same determinism story as
      :func:`pack_sequences`: layout-independent, retry-safe);
    - batches fill in (n_tokens desc, id) order within (bucket, shard)
      so each batch's max is as tight as possible.

    One map stage + one (bucket, shard)-keyed window + the per-batch
    aggregation that REUSES the window's partitioning (no second
    shuffle). Per-batch stats quantify the win: ``pad_frac`` is the
    fraction of the batch tensor that is padding. Returns
    ``(bucket, shard, batch_id, n_docs, max_tokens, sum_tokens,
    pad_frac)``.
    """
    if batch_size <= 0 or n_shards <= 0:
        raise ValueError(
            f"batch_size and n_shards must be positive, got "
            f"{batch_size}/{n_shards}"
        )
    t = with_token_count(df.select(id_col, text_col), text_col).drop(text_col)
    t = t.withColumn(
        "bucket",
        F.when(F.col("n_tokens") <= 1, F.lit(0)).otherwise(
            F.length(F.bin(F.col("n_tokens") - 1))
        ).cast("int"),
    ).withColumn("shard", hash_bucket(F.col(id_col), n_shards))
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    t = t.withColumn("_rn", F.row_number().over(w)).withColumn(
        "batch_id", F.expr(f"(_rn - 1) div {int(batch_size)}")
    )
    return (
        t.groupBy("bucket", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "pad_frac",
            F.lit(1.0)
            - F.col("sum_tokens")
            / (F.col("max_tokens") * F.col("n_docs")).cast("double"),
        )
    )
