"""Sequence packing: place documents into fixed-capacity context windows.

The LLM-training data layout problem: a corpus of variable-length
documents must become fixed-length training sequences (e.g. 2048
tokens).  The standard scalable recipe is *concat-and-chunk*: documents
are laid end-to-end in a deterministic order and the concatenation is
cut every ``capacity`` tokens, so a document occupies the half-open
token interval [offset, offset + n_tokens) and may straddle a chunk
boundary (GPT-style packing; documents are separated by the tokenizer's
EOS in the real pipeline — token accounting here, bytes later).

Scale design:

- the corpus is sharded by a deterministic function of the document id;
  each shard is packed independently, so parallelism == ``n_shards``
  and no global total order is ever required.  Choose ``n_shards`` ~
  cluster parallelism at real scale (it bounds both the window-state
  per task and the sequential fraction).
- within a shard the layout is a running sum over a window ordered by
  the id — ONE shuffle on the shard key, no iteration, no driver state.
- every output is integer arithmetic on token counts → deterministic
  across engines, partitionings and retries.

Greedy first-fit packing (no straddling, bins close when the next doc
doesn't fit) is a *sequential* decision process — each placement depends
on every prior one, so it cannot be a window expression.  Concat-and-
chunk is what large pipelines actually ship (no fragmentation, perfect
bin utilization) and is fully declarative; that trade is deliberate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document its token interval and chunk span.

    Returns (id, shard, n_tokens, offset, chunk_first, chunk_last,
    n_chunks) where ``offset`` is the document's start position in its
    shard's token concatenation and [chunk_first, chunk_last] the
    inclusive range of ``capacity``-token chunks it touches.  Empty
    documents (0 tokens) are dropped — they occupy no interval.
    """
    ident: Column = F.col(id_col)
    base = (
        df.select(
            ident,
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .select(
            ident,
            F.pmod(ident, F.lit(n_shards)).cast("long").alias("shard"),
            "n_tokens",
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("offset")
    laid = base.select(ident, "shard", "n_tokens", offset)
    # Integer DIV on both engines (oracle uses //): offsets are nonnegative
    # longs, so this equals floor(x / capacity) with no float channel at all.
    cap = int(capacity)
    chunk_first = F.expr(f"offset DIV {cap}").cast("long")
    chunk_last = F.expr(f"(offset + n_tokens - 1) DIV {cap}").cast("long")
    return laid.select(
        ident,
        "shard",
        "n_tokens",
        "offset",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).alias("n_chunks"),
    )
