"""Sequence packing: assign documents to fixed token-budget training bins.

The last preprocessing stage of an LLM data pipeline: documents (already
deduped/filtered/scored) are packed into sequences of at most CAP tokens so
the trainer sees dense batches.  The distributed-friendly form is next-fit
packing over a deterministic document order within independent shards:

  pack_id = floor(exclusive_cumsum(tokens) / CAP)     (per shard)

One window (cumulative sum), zero joins.  Each shard packs independently, so
at 100 TB the shuffle is a single hash partition by shard and the window
never sees more than one shard's docs; shards are key-hash derived, so
placement is deterministic across retries (no rand()).  The price of
next-fit vs global first-fit-decreasing is bounded slack per pack boundary —
the standard trade for a one-pass distributed packer.

Token counting is PLUGGABLE (`token_counter=`): pack caps should reflect the
trainer's tokenizer, not a fixed convention.  Built-ins stay JVM-side
(whitespace split; a BPE-ish regex via regexp_count); a caller can pass any
Column-producing function — including an Arrow-batched `pandas_udf` wrapping
a real tokenizer — without touching the no-per-row-Python rule (pandas UDFs
batch through Arrow; the invariants pytest runs one to prove the seam).

The catalog registration uses the whitespace counter and carries a DuckDB
oracle (cumsum window SQL); it registers AFTER the driver's frozen 50-query window
on purpose (operators/__init__.py pins the window membership), and
tools/check_correctness.py still value-checks it locally every round.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mimic_spark.operators.catalog import load_tables, register

PACK_CAP_TOKENS = 2048
N_SHARDS = 8

# GPT-style coarse pieces: letter runs, digit runs, single punctuation marks
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def whitespace_tokens(text: Column) -> Column:
    """Whitespace token count (the text_quality_scores convention)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex token count — JVM-side (regexp_count, codegen'd), a
    closer proxy for trainer tokens than whitespace words."""
    return F.regexp_count(text, F.lit(_BPE_ISH))


@register(
    "pack_sequences",
    family="training-data: sequence packing — docs -> fixed token-budget bins (next-fit cumsum per shard); registers outside the driver's frozen 50-query window by design",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         doc_id % 8 AS shard,
         CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM toks
)
SELECT doc_id,
       CAST(shard AS BIGINT) AS shard,
       n_tokens,
       CAST(floor(cum_excl / 2048) AS BIGINT) AS pack_id,
       CAST(cum_excl % 2048 AS BIGINT) AS offset_in_pack
FROM c
""",
)
def pack_sequences(
    spark: SparkSession,
    sf: str,
    token_counter: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """doc_id -> (shard, pack_id, offset_in_pack) under a 2048-token cap.

    token_counter: Column fn over the text column (default: whitespace
    tokens, matching the oracle; pass `bpe_ish_tokens` or an Arrow-batched
    tokenizer UDF for trainer-accurate caps).  shard = doc_id % N_SHARDS
    keeps the window partition bounded."""
    counter = token_counter or whitespace_tokens
    (d,) = load_tables(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).cast("long").alias("shard"),
        counter(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("shard").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum_excl / PACK_CAP_TOKENS).cast("long").alias("pack_id"),
        (cum_excl % PACK_CAP_TOKENS).cast("long").alias("offset_in_pack"),
    )
