"""Driver contract for the spark-graft builder (PySpark target).

entry      — flagship CDC run at sf0.001 scale (smoke check).
queries    — one entry per implemented operator from SURVEY.md §2 / the
             training-data op set; see mimic_spark/operators/*.
oracle_sql — DuckDB-runnable ANSI SQL twins for every SQL-expressible op.

Registration order is oracled-first (mimic_spark/operators/__init__.py): the
same 50 oracled queries as r3 occupy positions 1-50 (membership FROZEN in
operators/__init__.py:_WINDOW_50) so they all land inside the driver's
50-entry correctness window; the r4 oracled additions
(text_repetition_score, pack_sequences) register right after, and the 4
rows-only entries (pytest twins, see COVERAGE.md) last.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC pipeline (changelog -> dedup -> exactly-once MERGE
    -> published transcripts), deterministic synthetic input."""
    from mimic_spark.operators.cdc_flagship import run_cdc_flagship
    from mimic_spark.sources.changelog import ChangelogSpec

    return run_cdc_flagship(
        spark, ChangelogSpec(n_events=4000, n_convs=100, n_chunks=4)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimic_spark.operators import OPS

    return {name: op.fn for name, op in OPS.items()}


def oracle_sql() -> dict[str, str]:
    from mimic_spark.operators import OPS

    return {name: op.oracle for name, op in OPS.items() if op.oracle is not None}
