"""Sequence packing: assign documents to fixed-token-budget context
windows — the step between a curated corpus and a training dataloader.

LLM training consumes fixed-length contexts; feeding one (padded)
document per context wastes most of the window on short documents.
The standard remedy is *packing*: concatenate documents in a
deterministic order and cut the stream every ``budget`` tokens.  The
reference's surface stops at per-event transforms (its re-batching
example, ``test/examples/telegram_test.exs:18-31``, is the 1-D
analogue: re-chunk a stream by accumulated length), so this is a
beyond-reference capability of the training-data family.

Greedy concatenation order is inherently sequential — the window a
document lands in depends on every document before it.  The scale
design therefore shards the corpus into ``n_buckets`` independent
packing lanes by portable key hash (same md5-bucket construction as
sampling.py, so any engine can replay the assignment), orders each
lane by the document key, and computes a running token sum per lane:

  ``seq_id   = floor(prev_cum / budget)``  (window where the doc STARTS)
  ``tok_offset = prev_cum % budget``       (position inside that window)

One shuffle (the per-lane window sort); lanes are independent, so
``n_buckets`` bounds both parallelism and per-task sort size — at
100 TB you raise ``n_buckets`` to keep each lane's token stream
executor-sized, and the assignment stays bit-identical because lane
membership and order depend only on the key.  Documents longer than
``budget`` simply span windows (exactly what concat-then-cut training
pipelines do); ``tok_offset`` tells the loader where the document
begins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..component import Component, require_batch
from ..flow import Flow
from .sampling import bucket_of


class PackSequences(Component):
    """Add ``pack_bucket``, ``seq_id``, ``tok_offset`` to ``input``:
    the context window (of ``budget`` tokens, within one of
    ``n_buckets`` deterministic packing lanes) that each document is
    packed into, under concat-then-cut semantics.

    ``tokens_col`` must hold the per-document token count (compute it
    with ``functions.text.token_count``/``bpe_token_count`` upstream —
    packing is tokenizer-agnostic by design).

    ``partition_by`` packs WITHIN each group of those columns (e.g.
    per train/val/test split, per source): lanes never mix groups, so
    a sequence can't straddle a split boundary.  Each (group, lane)
    pair is its own window partition — at 100 TB this only refines
    the shuffle key, it doesn't add a shuffle."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        id_col: str,
        tokens_col: str,
        budget: int,
        n_buckets: int = 64,
        salt: str = "pack",
        partition_by: Sequence[str] | None = None,
        label: str | None = None,
    ):
        if budget <= 0:
            raise ValueError("budget must be positive")
        if n_buckets <= 0:
            raise ValueError("n_buckets must be positive")
        self.input = input
        self.output = output or input
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.budget = budget
        self.n_buckets = n_buckets
        self.salt = salt
        self.partition_by = list(partition_by or [])
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        df = flow[self.input]
        require_batch(
            df,
            "PackSequences",
            "the running token sum needs an ordered rank window over the "
            "full lane",
        )
        lane = F.pmod(bucket_of(self.id_col, self.salt), F.lit(self.n_buckets))
        w = (
            Window.partitionBy("pack_bucket", *self.partition_by)
            .orderBy(F.col(self.id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        prev = F.sum(F.col(self.tokens_col)).over(w) - F.col(self.tokens_col)
        out = (
            df.withColumn("pack_bucket", lane.cast("int"))
            .withColumn("__prev", prev)
            .withColumn("seq_id", F.floor(F.col("__prev") / self.budget))
            .withColumn("tok_offset", F.pmod(F.col("__prev"), F.lit(self.budget)).cast("bigint"))
            .drop("__prev")
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)


class ChunkDocuments(Component):
    """Overlapping token-window chunking — the document → embedding-unit
    explode of a retrieval/indexing pipeline: every ``stride = size -
    overlap`` tokens starts a chunk of up to ``size`` tokens, adjacent
    chunks sharing ``overlap`` tokens; the final chunk truncates at the
    document tail (the standard sliding-window convention).  Where
    :class:`PackSequences` concatenates documents INTO fixed windows
    for training, this cuts documents into units for embedding/search.

    Emits one row per chunk: ``(id_col, chunk_idx, token_start,
    n_chunk_tokens, chunk_text)`` — ``token_start`` is the 1-based
    token offset so downstream spans map back into the source doc.

    Plan: tokens bound once per doc, then a pure Column-HOF sequence →
    slice explode — narrow fan-out riding the scan, zero shuffle, zero
    Python; stream-legal (stateless).  At 100 TB chunking is the cheap
    step; write chunks to their own table before the embedding GEMM
    touches them."""

    def __init__(
        self,
        input: str,
        output: str | None = None,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        size: int = 128,
        overlap: int = 0,
        label: str | None = None,
    ):
        if size < 1:
            raise ValueError("size must be >= 1")
        if not 0 <= overlap < size:
            raise ValueError("overlap must be in [0, size)")
        self.input = input
        self.output = output or input
        self.id_col = id_col
        self.text_col = text_col
        self.size = int(size)
        self.overlap = int(overlap)
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        from ..functions import text as TXT

        df = flow[self.input]
        stride = self.size - self.overlap
        toks = df.filter(F.col(self.text_col).isNotNull()).select(
            F.col(self.id_col), TXT.tokens(self.text_col).alias("__t")
        )
        starts = F.sequence(
            F.lit(1), F.greatest(F.size("__t"), F.lit(1)), F.lit(stride)
        )
        out = (
            toks.select(
                self.id_col,
                F.size("__t").alias("__n"),
                F.col("__t"),
                F.explode(starts).alias("token_start"),
            )
            .select(
                self.id_col,
                ((F.col("token_start") - 1) / stride).cast("bigint").alias(
                    "chunk_idx"
                ),
                F.col("token_start").cast("bigint"),
                F.least(
                    F.lit(self.size),
                    F.col("__n") - F.col("token_start") + 1,
                ).cast("bigint").alias("n_chunk_tokens"),
                F.concat_ws(
                    " ", F.slice(F.col("__t"), F.col("token_start"), self.size)
                ).alias("chunk_text"),
            )
        )
        return flow.without(self.input).with_stream(self.output, out)

    def input_names(self) -> Sequence[str]:
        return (self.input,)

    def output_names(self) -> Sequence[str]:
        return (self.output,)
