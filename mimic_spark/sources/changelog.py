"""Deterministic synthetic changelog (binlog/WAL) of transcript change events.

Two *independent but exactly-agreeing* implementations:

- ``gen_changelog_df``  — Spark-columnar: every field is a pure built-in
  column expression over ``spark.range(n)`` (no driver materialization, no
  Python in the row path).  This is how 10^10 events are produced at bench
  time: the stream is synthesized on the fly, never stored.
- ``gen_events_py``     — pure-Python twin used by the pytest replay oracle.

Both derive every field from the LSN through the same integer LCG pipeline
(all arithmetic mod 2^31-1, exact in both runtimes — no floats, no library
hashes), so per-event equality is bit-stable.  The reference's analogous
fixture generator is test/mock_data/generate_mock_data.py (seeded CSVs).

Generator invariants (FIXTURES.md §1.2):
- inserts/updates/deletes mixed per key; delete payloads are NULL;
- duplicate LSN deliveries injected (same event emitted again in the *next*
  micro-batch — the harder, cross-batch dedup case);
- late/out-of-order LSNs within a bounded lag (batch assignment jittered);
- a few hot conv_ids own a large share of all events (skew path is load-
  bearing);
- the ``tool`` column exists only from the schema-evolution point onward —
  earlier chunk files do not have the column at all;
- raw text contains messy whitespace (double spaces, tabs, NBSP) so the
  Arrow-vectorized normalization pass is observable in the output.
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

M = 2147483647  # 2^31 - 1
BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z

# distinct LCG multipliers per derived field
_A_CONV = 1103515245
_A_ROUTE = 1579544639
_A_TURN = 1299709
_A_OP = 900000011
_A_WORD = 179424673
_A_NBSP = 715827883
_A_TOOL = 97002301
_A_JIT = 62089911

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "query", "table", "merge", "shuffle", "window",
    "batch", "stream", "spark", "delta2", "scan", "join", "sort", "hash",
    "group", "filter", "broadcast", "salt", "bucket", "commit", "ledger",
    "replay", "upsert", "tombstone", "lineage", "audit", "schema", "evolve",
    "arrow", "pandas", "vector", "column", "row", "key", "value", "turn",
    "agent", "user2", "tool2",
]
assert len(WORDS) == 64


@dataclass
class ChangelogSpec:
    n_events: int = 20_000
    n_convs: int = 500
    n_hot: int = 3
    hot_pct: int = 12  # percent of events routed to the n_hot conversations
    turns_per_conv: int = 40
    delete_pct: int = 6
    insert_pct: int = 34  # op: <delete_pct delete, <delete_pct+insert_pct insert, else update
    dup_every: int = 47  # every k-th event is delivered twice
    n_chunks: int = 8  # micro-batches
    lag: int = 400  # out-of-order jitter in LSNs
    evolve_frac: float = 0.5  # `tool` column appears from this point on
    files_per_chunk: int = 4  # parquet files per chunk (read parallelism)
    body_words: int = 0  # extra filler words per text (0 = short test rows;
    # bench uses ~48 for realistic KB-ish transcript turns)

    @property
    def chunk_size(self) -> int:
        return max(1, (self.n_events + self.n_chunks - 1) // self.n_chunks)

    @property
    def evolve_chunk(self) -> int:
        return int(self.n_chunks * self.evolve_frac)

    evolve_at_override: int | None = None  # pin the evolution LSN explicitly
    # (e.g. replaying a truncated range of a larger stream's spec)

    @property
    def evolve_at(self) -> int:
        if self.evolve_at_override is not None:
            return self.evolve_at_override
        return self.evolve_chunk * self.chunk_size


# ---------------------------------------------------------------- spark side


def _lcg(col: Column, a: int, c: int = 12345) -> Column:
    return F.pmod(F.lit(a) * F.pmod(col, F.lit(M)) + F.lit(c), F.lit(M))


def derive_event_df(df: DataFrame, spec: ChangelogSpec) -> DataFrame:
    """Derive the full change-event row from a DataFrame bearing an `lsn`
    column — pure built-in column expressions, usable on spark.range output
    (batch synthesis) or on a rate-source stream (on-the-fly streaming
    synthesis: lsn = rate `value`)."""
    lsn = F.col("lsn")
    r_conv = _lcg(lsn, _A_CONV)
    r_route = _lcg(lsn, _A_ROUTE)
    r_turn = _lcg(lsn, _A_TURN)
    r_op = _lcg(lsn, _A_OP)
    r_word = _lcg(lsn, _A_WORD)
    r_nbsp = _lcg(lsn, _A_NBSP)
    r_tool = _lcg(lsn, _A_TOOL)
    r_jit = _lcg(lsn, _A_JIT)

    n_cold = max(1, spec.n_convs - spec.n_hot)
    conv_idx = F.when(
        F.pmod(r_route, F.lit(100)) < F.lit(spec.hot_pct),
        F.pmod(r_conv, F.lit(spec.n_hot)),
    ).otherwise(F.lit(spec.n_hot) + F.pmod(r_conv, F.lit(n_cold)))
    conv_id = F.format_string("c%08d", conv_idx.cast("int"))
    turn_idx = F.pmod(r_turn, F.lit(spec.turns_per_conv)).cast("int")

    opx = F.pmod(r_op, F.lit(100))
    op = (
        F.when(opx < F.lit(spec.delete_pct), F.lit("delete"))
        .when(opx < F.lit(spec.delete_pct + spec.insert_pct), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    is_del = op == F.lit("delete")

    role = (
        F.when(turn_idx == 0, F.lit("system"))
        .when(turn_idx % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    words = F.array(*[F.lit(w) for w in WORDS])
    w1 = F.element_at(words, (F.pmod(r_word, F.lit(64)) + 1).cast("int"))
    w2 = F.element_at(words, (F.pmod(r_word + 17, F.lit(64)) + 1).cast("int"))
    w3 = F.element_at(words, (F.pmod(r_word + 41, F.lit(64)) + 1).cast("int"))
    nbsp = F.when(F.pmod(r_nbsp, F.lit(7)) == 0, F.lit(" ")).otherwise(F.lit(" "))
    parts = [
        F.lit("turn "), turn_idx.cast("string"),
        F.lit(" of "), conv_id,
        F.lit(" rev "), lsn.cast("string"),
        F.lit(" ::  "), w1, F.lit("\t"), w2, F.lit("  "), w3,
    ]
    if spec.body_words > 0:
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(spec.body_words - 1)),
                lambda i: F.element_at(
                    words, (F.pmod(r_word + i * 7, F.lit(64)) + 1).cast("int")
                ),
            ),
        )
        parts += [F.lit(" "), body]
    text = F.concat(*parts, nbsp, F.lit("."))

    tool = F.when(
        (lsn >= F.lit(spec.evolve_at))
        & (role == F.lit("assistant"))
        & (F.pmod(r_tool, F.lit(3)) == 0),
        F.format_string("tool_%d", F.pmod(r_tool, F.lit(5)).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + lsn)

    jittered = lsn + F.pmod(r_jit, F.lit(spec.lag))
    # exact integer floor-div: (x - x%cs)/cs is an exact multiple, no fp error
    floordiv = (
        (jittered - F.pmod(jittered, F.lit(spec.chunk_size)))
        / F.lit(spec.chunk_size)
    ).cast("long")
    batch_hint = F.least(F.lit(spec.n_chunks - 1).cast("long"), floordiv).cast("int")

    return df.select(
        lsn.cast("long").alias("lsn"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(~is_del, role).alias("role"),
        F.when(~is_del, text).alias("text"),
        F.when(~is_del, tool).alias("tool"),
        ts.alias("ts"),
        batch_hint.alias("batch_hint"),
    )


def gen_changelog_df(
    spark: SparkSession, spec: ChangelogSpec, with_batch_hint: bool = True
) -> DataFrame:
    """All change events (including duplicate deliveries) as one DataFrame.

    Distributed synthesis: spark.range -> pure column exprs; scales to any
    n_events without touching the driver.
    """
    base = spark.range(0, spec.n_events, 1).select(F.col("id").alias("lsn"))
    out = derive_event_df(base, spec)

    # duplicate deliveries: every dup_every-th event re-emitted in the NEXT chunk
    dup = out.filter(F.pmod(F.col("lsn"), F.lit(spec.dup_every)) == 0).withColumn(
        "batch_hint",
        F.least(F.lit(spec.n_chunks - 1), F.col("batch_hint") + 1).cast("int"),
    )
    out = out.unionByName(dup)
    if not with_batch_hint:
        out = out.drop("batch_hint")
    return out


def gen_changelog_stream(
    spark: SparkSession, spec: ChangelogSpec, rows_per_second: int = 100_000
) -> DataFrame:
    """Unbounded streaming changelog from the rate source: lsn = `value`,
    every other field derived by the same column pipeline.  This is how the
    10^10-event stream is produced without ever materializing it — the rate
    source emits monotonically increasing values and the synthesis is pure
    expression work on executors."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(F.col("value").alias("lsn"))
    )
    return derive_event_df(rate, spec).drop("batch_hint")


def write_changelog_chunks(
    spark: SparkSession, spec: ChangelogSpec, out_dir: str
) -> list[str]:
    """Materialize the changelog as one parquet file dir per micro-batch.

    Chunks before the evolution point are written WITHOUT the `tool` column
    (the file-level schema genuinely evolves mid-stream).  Returns chunk paths
    in delivery order.
    """
    os.makedirs(out_dir, exist_ok=True)
    events = gen_changelog_df(spark, spec).cache()
    paths = []
    try:
        for c in range(spec.n_chunks):
            chunk = events.filter(F.col("batch_hint") == c).drop("batch_hint")
            if c < spec.evolve_chunk:
                chunk = chunk.drop("tool")
            p = os.path.join(out_dir, f"chunk-{c:05d}")
            chunk.repartition(spec.files_per_chunk).write.mode(
                "overwrite"
            ).parquet(p)
            paths.append(p)
    finally:
        events.unpersist()
    return paths


# --------------------------------------------------------------- python twin


def _lcg_py(x: int, a: int, c: int = 12345) -> int:
    return (a * (x % M) + c) % M


def gen_events_py(spec: ChangelogSpec) -> list[dict]:
    """Pure-Python twin of gen_changelog_df (including duplicate deliveries)."""
    evs = []
    n_cold = max(1, spec.n_convs - spec.n_hot)
    for lsn in range(spec.n_events):
        r_conv = _lcg_py(lsn, _A_CONV)
        r_route = _lcg_py(lsn, _A_ROUTE)
        r_turn = _lcg_py(lsn, _A_TURN)
        r_op = _lcg_py(lsn, _A_OP)
        r_word = _lcg_py(lsn, _A_WORD)
        r_nbsp = _lcg_py(lsn, _A_NBSP)
        r_tool = _lcg_py(lsn, _A_TOOL)
        r_jit = _lcg_py(lsn, _A_JIT)

        if r_route % 100 < spec.hot_pct:
            conv_idx = r_conv % spec.n_hot
        else:
            conv_idx = spec.n_hot + r_conv % n_cold
        conv_id = f"c{conv_idx:08d}"
        turn_idx = r_turn % spec.turns_per_conv

        opx = r_op % 100
        if opx < spec.delete_pct:
            op = "delete"
        elif opx < spec.delete_pct + spec.insert_pct:
            op = "insert"
        else:
            op = "update"

        if turn_idx == 0:
            role = "system"
        elif turn_idx % 2 == 1:
            role = "user"
        else:
            role = "assistant"

        w1 = WORDS[r_word % 64]
        w2 = WORDS[(r_word + 17) % 64]
        w3 = WORDS[(r_word + 41) % 64]
        nbsp = " " if r_nbsp % 7 == 0 else " "
        text = f"turn {turn_idx} of {conv_id} rev {lsn} ::  {w1}\t{w2}  {w3}"
        if spec.body_words > 0:
            body = " ".join(
                WORDS[(r_word + i * 7) % 64] for i in range(spec.body_words)
            )
            text += " " + body
        text += f"{nbsp}."

        tool = None
        if lsn >= spec.evolve_at and role == "assistant" and r_tool % 3 == 0:
            tool = f"tool_{r_tool % 5}"

        ts = dt.datetime.fromtimestamp(BASE_EPOCH + lsn, dt.timezone.utc).replace(
            tzinfo=None
        )
        batch_hint = min(
            spec.n_chunks - 1, (lsn + r_jit % spec.lag) // spec.chunk_size
        )
        ev = {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": None if op == "delete" else role,
            "text": None if op == "delete" else text,
            "tool": None if op == "delete" else tool,
            "ts": ts,
            "batch_hint": batch_hint,
        }
        evs.append(ev)
        if lsn % spec.dup_every == 0:
            dup = dict(ev)
            dup["batch_hint"] = min(spec.n_chunks - 1, batch_hint + 1)
            evs.append(dup)
    return evs


def replay_oracle_py(
    spec: ChangelogSpec, normalize=None
) -> dict[tuple[str, int], dict]:
    """Final table state by sequential replay in LSN order (the oracle).

    Engine-independent: applies each event at most once per (key, lsn) with
    last-writer-wins by LSN; deletes tombstone the key but a later re-insert
    (higher LSN) revives it — identical rules to lakehouse.merge.
    """
    state: dict[tuple[str, int], dict] = {}
    for ev in sorted(gen_events_py(spec), key=lambda e: e["lsn"]):
        k = (ev["conv_id"], ev["turn_idx"])
        cur = state.get(k)
        if cur is not None and ev["lsn"] < cur["_lsn"]:
            continue
        if ev["op"] == "delete":
            state[k] = {"_lsn": ev["lsn"], "_deleted": True}
        else:
            text = ev["text"]
            if normalize is not None:
                text = normalize(text)
            state[k] = {
                "_lsn": ev["lsn"],
                "_deleted": False,
                "role": ev["role"],
                "text": text,
                "tool": ev["tool"],
                "ts": ev["ts"],
            }
    return {k: v for k, v in state.items() if not v["_deleted"]}


def workflow_generate(spark, conf: dict) -> dict:
    """`type: "py"` workflow step: materialize a deterministic changelog.

    Conf keys: changelog_dir (required), n_events, n_convs, n_chunks.
    The role of the reference's source-extraction stage in full.etlconf."""
    spec = ChangelogSpec(
        n_events=int(conf.get("n_events", 8000)),
        n_convs=int(conf.get("n_convs", 160)),
        n_chunks=int(conf.get("n_chunks", 6)),
    )
    paths = write_changelog_chunks(spark, spec, conf["changelog_dir"])
    return {"chunks": len(paths), "n_events": spec.n_events}
