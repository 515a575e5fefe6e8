"""Operator registry: every implemented operator family from SURVEY.md §2.

Each entry pairs a Spark DataFrame implementation with (where SQL-expressible)
an ANSI-SQL oracle that DuckDB runs on the same parquet — the driver's
correctness gate.  Conventions that make the value-hash comparison stable:

- every computed column is aliased identically in Spark and SQL;
- money sums use the "cents" pattern: round(x*100) summed as BIGINT —
  exact, order-independent, identical in both engines (double sums are
  order-dependent across partitions);
- ratios/averages derived from those integer sums with the same double
  division in both engines, rounded;
- top-k queries carry a unique tiebreaker so ties can't reorder results;
- whitespace splitting: Java regex \\s includes \\x0B (vertical tab), RE2's
  (DuckDB) does not — the synthetic corpus contains neither, so the legacy
  oracles' \\s+ is safe there, but NEW oracles should use an explicit class
  like '[ \\t\\n\\r\\f]+' on BOTH sides (chunk_documents is the model).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryOp:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    family: str  # SURVEY.md §2 row(s) this covers
    doc: str


OPS: dict[str, QueryOp] = {}

# DataFrames cached *inside* one catalog query (shingle sets etc.).  A cache
# speeds reuse within that query's job, but left alone it leaks across the
# session and cross-contaminates later queries' timings (round-1 bench bug).
# Queries register their caches here; the next catalog query releases them.
_QUERY_CACHES: list[DataFrame] = []


def cache_for_query(df: DataFrame) -> DataFrame:
    """Cache `df` for reuse within the current query; released lazily when
    the *next* catalog query starts (the returned plan must stay computable
    after the query function returns — the driver collects later — so the
    unpersist can't happen inside the query itself)."""
    cached = df.cache()
    _QUERY_CACHES.append(cached)
    return cached


def release_query_caches() -> None:
    while _QUERY_CACHES:
        df = _QUERY_CACHES.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session may already be stopped


def register(name: str, family: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        @functools.wraps(fn)
        def wrapped(
            spark: SparkSession, sf_dir: str, *args, **kwargs
        ) -> DataFrame:
            # extra args pass through for ops with pluggable knobs
            # (e.g. pack_sequences' token_counter); the catalog/driver
            # always calls with just (spark, sf_dir)
            release_query_caches()
            return fn(spark, sf_dir, *args, **kwargs)

        OPS[name] = QueryOp(
            name=name, fn=wrapped, oracle=oracle, family=family, doc=doc
        )
        return wrapped

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [
        spark.read.parquet(f"{sf_dir.rstrip('/')}/{n}.parquet") for n in names
    ]


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan to the session's core count WHEN file
    splitting under-parallelizes it (r9, guide §2.6/§6): a single small
    parquet file yields only a handful of splits, leaving most cores idle
    through an expensive map stage (the Arrow-kernel operators measured a
    6-task stage on local[32]).  Scale-adaptive by construction: once the
    input yields >= cores splits — any real table at cluster scale — this
    is a no-op, so no shuffle is ever added where the scan already spreads.
    Round-robin (no key) keeps the exchange skew-free; Spark's
    sort-before-repartition default keeps task retries deterministic."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
