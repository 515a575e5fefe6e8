"""Incrementally-maintained rollup table over a CDC transcripts table.

The continuous-aggregate / materialized-view-maintenance role of a CDC
lake (reference analog: MIMIC's achilles-style summary tables rebuilt per
load, etl/achilles counts; here they are MAINTAINED, never rebuilt): a
per-conversation aggregate table (live turn count, total characters, last
change version) that tails the upstream table's change feed and applies
DELTA + RETRACTION updates — classic incremental view maintenance — so a
poll costs O(changed keys), not O(table).

Why delta+retraction instead of recomputing touched groups: a
conversation's rows hash-spread across every bucket (the key is
(conv_id, turn_idx)), so "recompute the touched conversations from the
base table" is a full scan per poll at 100 TB.  The delta algebra only
ever reads:

- the upstream VERSION DIFF (new files only, O(batch)),
- each changed key's PRE-batch value — a time-travel point lookup pinned
  at the previous cursor version (`read_for_keys(version=...)`,
  bucket- and bloom-pruned) for small batches, or a bucket-scoped scan +
  semi-join when the batch is too large for a driver-side key list,
- the touched conversations' CURRENT rollup rows (point lookup on the
  rollup table, keyed by conv_id).

Only SELF-MAINTAINABLE aggregates are materialized (counts and sums:
``n_turns``, ``n_chars``; plus the monotone ``src_version``).  MIN/MAX
over mutable rows are deliberately excluded — a delete can lower a max,
which delta maintenance cannot see without the full group; compute those
on read, or maintain them against an append-only stream.

Exactly-once: the rollup MERGE commit atomically carries both the batch
marker (batch_id = upstream version, monotone) and the cursor property,
exactly like ChangeFeedConsumer; a crashed poll replays as a no-op.  The
per-row LSN guard uses the upstream snapshot version too — monotone per
poll, so replayed/late polls can never regress a newer rollup row.

Pairing note: a MoR upstream feeds O(batch) diff rows per poll (delta
files are exactly the batch).  A COW upstream's merge rewrites whole
buckets, so its version diff re-emits every row of the touched buckets —
still CORRECT here (unchanged rows zero out in the delta join, the same
way compaction re-emits do) but proportionally more expensive; write-hot
streams should maintain rollups off MoR tables, the documented default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into
from mimic_spark.lakehouse.table import SnapshotTable

CURSOR_PROP = "rollup_src_version"

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("src_version", T.LongType(), True),
    ]
)


class IncrementalConvRollup:
    """Maintains ``rollup_path`` (keyed by conv_id) from ``upstream_path``'s
    change feed.  ``max_point_keys`` bounds the driver-side key list for the
    point-lookup old-value path; larger batches switch to the bucket-scoped
    scan + semi-join (same asymptotics as the COW merge that produced the
    batch)."""

    def __init__(
        self,
        spark: SparkSession,
        upstream_path: str,
        rollup_path: str,
        n_buckets: int = 16,
        max_point_keys: int = 10_000,
        expire_every: int = 16,
        keep_snapshots: int = 4,
    ):
        if not SnapshotTable.exists(upstream_path):
            raise FileNotFoundError(
                f"rollup source: no snapshot table at {upstream_path!r}"
            )
        self.spark = spark
        self.upstream = SnapshotTable(spark, upstream_path)
        self.max_point_keys = max_point_keys
        # every poll commits one rollup snapshot; unbounded history is the
        # same O(polls) metadata growth the CDC bookkeeping tables had
        # (r4 verdict) — expire on a cadence, keeping a short time-travel
        # window for downstream feeds tailing the rollup itself
        self.expire_every = expire_every
        self.keep_snapshots = keep_snapshots
        self._polls_since_expire = 0
        if not SnapshotTable.exists(rollup_path):
            SnapshotTable.create(
                spark,
                rollup_path,
                ensure_internal_schema(ROLLUP_SCHEMA),
                ["conv_id"],
                n_buckets,
            )
        self.table = SnapshotTable(spark, rollup_path)

    def cursor(self) -> int:
        return int(self.table.props().get(CURSOR_PROP, -1))

    # ------------------------------------------------------------ internals

    @staticmethod
    def _contrib(df: DataFrame) -> DataFrame:
        """Per-key aggregate contribution: a live row contributes (1 turn,
        len(text) chars); a tombstone or absent row contributes zero."""
        live = ~F.coalesce(F.col("_deleted"), F.lit(False))
        return df.select(
            "conv_id",
            "turn_idx",
            F.col("_lsn").cast("long").alias("lsn"),
            F.when(live, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("turns"),
            F.when(live, F.coalesce(F.length("text"), F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("chars"),
        )

    def _old_rows(self, diff: DataFrame, last_v: int) -> DataFrame:
        """Changed keys' upstream rows AS OF the previous cursor version.

        The empty frame borrows the DIFF's schema (already aligned to the
        current snapshot) — never snapshot(0)'s, which upstream retention
        may have expired by the time a fresh rollup attaches."""
        empty = self.spark.createDataFrame([], diff.schema)
        if last_v < 0:
            return empty
        kdf = diff.select("conv_id", "turn_idx").distinct()
        head = kdf.limit(self.max_point_keys + 1).collect()
        if len(head) <= self.max_point_keys:
            if not head:
                return empty
            keys = [(r["conv_id"], r["turn_idx"]) for r in head]
            return self.upstream.read_for_keys(keys, version=last_v)
        # large batch: bucket-scoped scan of the pinned old version + a
        # semi-join on the changed keys (no driver-side key list).
        # Keys are CAST TO THE PINNED SNAPSHOT'S TYPES before hashing —
        # xxhash64 hashes int and bigint differently, so after a key-type
        # widening in the (last_v, cur_v] window, current-schema values
        # would hash to the wrong old buckets and silently miss every old
        # value (the same guard files_for_keys implements for the point
        # path)
        old_snap = self.upstream.snapshot(last_v)
        nb = self.upstream.n_buckets_at(last_v)
        old_types = {f.name: f.dataType for f in old_snap.schema.fields}
        from mimic_spark.functions.hashing import bucket_expr

        kdf_old = kdf.select(
            *[
                F.col(c).cast(old_types[c]).alias(c)
                for c in self.upstream.key_cols
            ]
        )
        buckets = sorted(
            r["_b"]
            for r in kdf_old.select(
                bucket_expr(self.upstream.key_cols, nb).alias("_b")
            )
            .distinct()
            .collect()
        )
        base = self.upstream.read(version=last_v, buckets=buckets)
        return base.join(kdf, ["conv_id", "turn_idx"], "left_semi")

    # ---------------------------------------------------------------- poll

    def poll_once(self) -> int:
        """Fold one upstream version window into the rollup; returns the
        number of conversations whose aggregates changed."""
        last_v = self.cursor()
        cur_v = self.upstream.current_version()
        if cur_v <= last_v:
            return 0
        try:
            snap, new_files = self.upstream.changed_files(last_v, cur_v)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"rollup cursor v{last_v} is older than upstream snapshot "
                f"retention; drop the '{CURSOR_PROP}' property and truncate "
                f"the rollup table to trigger a full rebuild"
            ) from e
        if not new_files:
            base = self.table.snapshot()
            self.table.commit(
                base=base,
                op="rollup-cursor",
                files=base.files,
                props_update={CURSOR_PROP: cur_v},
            )
            return 0
        diff = self.upstream._read_files(snap, new_files, resolve=True)

        new_c = self._contrib(diff)
        old_c = self._contrib(self._old_rows(diff, last_v)).select(
            "conv_id",
            "turn_idx",
            F.col("lsn").alias("old_lsn"),
            F.col("turns").alias("old_turns"),
            F.col("chars").alias("old_chars"),
        )
        # Staleness guard (the rollup's analog of the merge LSN guard): a
        # LATE event lands in a new file under MoR even when a newer row for
        # its key already exists in an old file, so the version diff's
        # resolved row can be STALER than the key's true state.  Such a row
        # is a no-op upstream and must be a no-op here: the effective new
        # contribution falls back to the old one, zeroing the delta.  A
        # compaction re-emitting unchanged rows zeroes out the same way.
        fresh = F.col("lsn") >= F.coalesce(F.col("old_lsn"), F.lit(-1))
        eff_turns = F.when(fresh, F.col("turns")).otherwise(F.col("old_turns"))
        eff_chars = F.when(fresh, F.col("chars")).otherwise(F.col("old_chars"))
        deltas = (
            new_c.join(old_c, ["conv_id", "turn_idx"], "left")
            .groupBy("conv_id")
            .agg(
                F.sum(
                    eff_turns - F.coalesce(F.col("old_turns"), F.lit(0))
                ).alias("d_turns"),
                F.sum(
                    eff_chars - F.coalesce(F.col("old_chars"), F.lit(0))
                ).alias("d_chars"),
            )
            # zero-delta conversations (all-stale polls, compaction re-emits,
            # equal-length edits) change nothing — don't rewrite their rows
            .filter((F.col("d_turns") != 0) | (F.col("d_chars") != 0))
            # eager materialization of the O(changed convs) result: the
            # conv-id collect below AND the merge's write would otherwise
            # each replay the whole O(batch) diff + old-value pipeline
            .localCheckpoint()
        )

        convs = [r["conv_id"] for r in deltas.select("conv_id").collect()]
        if not convs:
            base = self.table.snapshot()
            self.table.commit(
                base=base,
                op="rollup-cursor",
                files=base.files,
                props_update={CURSOR_PROP: cur_v},
            )
            return 0
        current = (
            self.table.read_for_keys([(c,) for c in convs])
            .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .select(
                "conv_id",
                F.col("n_turns").alias("cur_turns"),
                F.col("n_chars").alias("cur_chars"),
            )
        )
        merged = deltas.join(current, "conv_id", "left").select(
            "conv_id",
            (F.coalesce(F.col("cur_turns"), F.lit(0)) + F.col("d_turns")).alias(
                "n_turns"
            ),
            (F.coalesce(F.col("cur_chars"), F.lit(0)) + F.col("d_chars")).alias(
                "n_chars"
            ),
            F.lit(cur_v).cast("long").alias("src_version"),
        )
        batch = merged.select(
            "conv_id",
            "n_turns",
            "n_chars",
            "src_version",
            F.lit(cur_v).cast("long").alias("lsn"),
            F.when(F.col("n_turns") <= 0, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
        result = merge_into(
            self.table,
            batch,
            batch_id=cur_v,  # monotone, idempotent under replay
            extra_props={CURSOR_PROP: cur_v},
            mode="cow",
        )
        if result.skipped:
            return 0
        self._polls_since_expire += 1
        if self.expire_every and self._polls_since_expire >= self.expire_every:
            from mimic_spark.lakehouse.maintenance import expire_snapshots

            expire_snapshots(self.table, keep_last=self.keep_snapshots)
            self._polls_since_expire = 0
        return len(convs)

    def run_until_idle(self, max_polls: int = 1000) -> int:
        total = 0
        for _ in range(max_polls):
            n = self.poll_once()
            total += n
            if n == 0 and self.cursor() >= self.upstream.current_version():
                return total
        raise RuntimeError(f"rollup still busy after {max_polls} polls")

    # --------------------------------------------------------------- reads

    def read(self) -> DataFrame:
        df = self.table.read()
        return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(
            "_lsn", "_deleted"
        )
