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

Registered rows-only BY CHOICE: the op is SQL-expressible, but the driver's
correctness window holds exactly the 50 oracled queries (COVERAGE.md);
correctness is carried by the invariants pytest
(tests/test_operators.py::test_sequence_packing_invariants): every doc
assigned exactly once, packs are contiguous runs in shard order, no pack
exceeds CAP + (its last doc's tokens), determinism across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mimic_spark.operators.catalog import load_tables, register

PACK_CAP_TOKENS = 2048
N_SHARDS = 8


@register(
    "pack_sequences",
    family="training-data: sequence packing — docs -> fixed token-budget bins (next-fit cumsum per shard)",
    oracle=None,  # SQL-expressible but kept rows-only: the driver window
    # holds exactly the 50 oracled entries; pytest twin covers invariants
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id -> (shard, pack_id, offset_in_pack) under a 2048-token cap.

    Token counts are whitespace tokens (the text_quality_scores convention);
    shard = doc_id % N_SHARDS keeps the window partition bounded."""
    (d,) = load_tables(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
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
