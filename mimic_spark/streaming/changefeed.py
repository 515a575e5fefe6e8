"""Change-feed consumer: chain CDC tables through incremental reads.

The Iceberg incremental-read consumer role: a downstream table tails an
upstream SnapshotTable's change feed and applies the changes through the
same exactly-once MERGE path the primary changelog uses.  This is how a
lake fans one ingested table out to derived tables without re-reading the
source stream (reference role: MIMIC's staged->CDM table chain, each stage
reading only what the previous stage changed).

The cursor is the upstream SNAPSHOT VERSION, not an LSN watermark: under
out-of-order delivery a late event carries a low lsn but lands in a new
file/commit, so a version-diff read (`read_changes_between`) sees it while
an lsn-watermark read would silently skip it (found by the convergence test
in tests/test_changefeed.py — the synthetic changelog jitters delivery
order by design).  That is exactly why Iceberg's incremental read is
snapshot-id-based.

Exactly-once: the cursor is committed as a snapshot property of the
DOWNSTREAM table in the same atomic commit as the merged data
(`apply_batch(extra_props=...)`), so a crash can never separate "applied
the rows" from "advanced the cursor".  Resume is checkpoint-free: a
restarted consumer re-reads the cursor from the downstream table.

Scale posture: each poll is one bounded micro-batch — a scan of only the
upstream files committed since the cursor, the standard dedup window, and a
bucket-pruned MERGE.  No driver-side state grows with stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mimic_spark.lakehouse.merge import MergeResult
from mimic_spark.lakehouse.table import SnapshotTable
from mimic_spark.streaming.apply import TranscriptCdc

CURSOR_PROP = "changefeed_src_version"

# A genuine crash leaves a ledger hole of exactly 1 batch (the crash window
# is between the data commit and the single ledger append).  A larger gap
# means the ledger table was lost or recreated — backfilling thousands of
# marker commits would silently paper over real history loss, so fail loud
# instead and let the operator decide (r4 ADVICE).
MAX_LEDGER_BACKFILL = 16


class ChangeFeedConsumer:
    """Tails `upstream`'s change feed into the `downstream` CDC table.

    max_versions_per_poll / max_rows_per_poll bound each micro-batch (the
    Structured Streaming ``maxOffsetsPerTrigger`` role): a consumer resuming
    behind a large backlog drains it in bounded chunks instead of planning
    one scan over the whole gap — at 10^10 events an unbounded catch-up
    poll would be a full-table-sized batch that spills or OOMs, while N
    bounded polls are exactly the micro-batches the steady-state path
    already handles.  Both bounds are enforced from the driver-side
    manifest walk (footer row counts) — no Spark job is spent planning.
    A poll always advances at least one version, so progress is guaranteed
    even when a single version exceeds max_rows_per_poll."""

    def __init__(
        self,
        spark: SparkSession,
        upstream_path: str,
        downstream: TranscriptCdc,
        max_versions_per_poll: int | None = None,
        max_rows_per_poll: int | None = None,
    ):
        if not SnapshotTable.exists(upstream_path):
            raise FileNotFoundError(
                f"change-feed source: no snapshot table at {upstream_path!r}"
            )
        if max_versions_per_poll is not None and max_versions_per_poll < 1:
            raise ValueError("max_versions_per_poll must be >= 1")
        if max_rows_per_poll is not None and max_rows_per_poll < 1:
            raise ValueError("max_rows_per_poll must be >= 1")
        self.spark = spark
        self.upstream = SnapshotTable(spark, upstream_path)
        self.cdc = downstream
        self.max_versions_per_poll = max_versions_per_poll
        self.max_rows_per_poll = max_rows_per_poll

    def cursor(self) -> int:
        """Upstream snapshot version the downstream table is current to."""
        return int(self.cdc.table.props().get(CURSOR_PROP, -1))

    def lag(self) -> dict:
        """Feed lag, O(manifest): how far behind upstream this consumer is.

        ``rows_behind`` is the footer-stat row sum of upstream data files
        not yet covered by the cursor — an upper bound on rows the next
        polls will scan (op-aware like the read itself: compaction/rebucket
        rewrites carry no logical change and are not counted).  No Spark
        job."""
        last_v = self.cursor()
        cur_v = self.upstream.current_version()
        if cur_v <= last_v:
            return {
                "cursor": last_v,
                "latest_upstream_version": cur_v,
                "versions_behind": 0,
                "rows_behind": 0,
                "files_behind": 0,
            }
        try:
            _, new_files = self.upstream.changed_data_files(last_v, cur_v)
        except FileNotFoundError:
            new_files = list(self.upstream.snapshot(cur_v).files)
        return {
            "cursor": last_v,
            "latest_upstream_version": cur_v,
            "versions_behind": cur_v - max(last_v, -1),
            "rows_behind": sum(int(f.get("rows") or 0) for f in new_files),
            "files_behind": len(new_files),
        }

    def bootstrap(self) -> int:
        """Initial snapshot load (the Debezium snapshot-then-stream role):
        bulk-load the upstream's CURRENT resolved state as one batch and
        set the cursor to that snapshot version, so tailing starts from
        there instead of replaying all history version-by-version.

        Two reasons this exists:
        - a fresh consumer against an upstream whose early snapshots were
          EXPIRED by retention cannot incremental-read from v-1 at all
          (poll_once fails loud); the current snapshot is always readable;
        - even with full history, replaying N versions of churn through N
          merges does O(history) work for a result the current snapshot
          already holds in O(live-rows).

        Exactly-once: the cursor rides the same atomic commit as the merged
        data (extra_props), so a crash either left nothing (rerun redoes
        the load) or left a complete bootstrap (rerun returns 0).  Rows
        carry their original upstream ``_lsn``, so a subsequent poll's
        events interleave correctly under the merge's LSN staleness guard.
        Returns rows loaded; 0 if the consumer already has a cursor."""
        if self.cursor() >= 0:
            return 0
        snap_v = self.upstream.current_version()
        snap = self.upstream.snapshot(snap_v)
        state = self.upstream._read_files(snap, snap.files, resolve=True)
        if "_deleted" in state.columns:
            state = state.filter(~F.col("_deleted"))
        payload = [c for c in state.columns if not c.startswith("_")]
        batch = state.select(
            *payload,
            (F.col("_lsn") if "_lsn" in state.columns else F.lit(0)).alias(
                "lsn"
            ),
            F.lit("insert").alias("op"),
        )
        batch_id = self.cdc._ledger_hwm + 1
        result = self.cdc.apply_batch(
            batch, batch_id, extra_props={CURSOR_PROP: snap_v}
        )
        # an EMPTY upstream snapshot skips the merge, so no commit carried
        # the cursor prop — without this the cursor stays -1 and the next
        # poll replays full history (or fails loud if early versions were
        # expired: the exact case bootstrap exists to avoid).  Advance it
        # with a metadata-only commit, same as poll_once's empty-diff path.
        if self.cursor() < snap_v:
            base = self.cdc.table.snapshot()
            self.cdc.table.commit(
                base=base,
                op="changefeed-cursor",
                files=base.files,
                props_update={CURSOR_PROP: snap_v},
            )
        return int(result.rows_applied)

    def _poll_target(self, last_v: int, cur_v: int) -> int:
        """Largest to-version within this poll's bounds (driver-side only).

        Walks the upstream manifests oldest-first, charging each version
        the footer rows of files not seen at any earlier version; versions
        whose op is a content-preserving maintenance rewrite charge
        nothing (the read itself skips their files).  Always returns at
        least the first available version past the cursor — a single
        oversized version still gets applied alone rather than stalling
        the feed."""
        if self.max_versions_per_poll is None and self.max_rows_per_poll is None:
            return cur_v
        from mimic_spark.lakehouse.table import MAINTENANCE_OPS, WAP_STAGED_PROP

        # never pin a WAP-staged version as a poll target: a staged-then-
        # ABORTED snapshot's files appear in no published snapshot, and
        # reading one mid-walk would leak unpublished data downstream
        vs = [
            v
            for v in self.upstream.versions()
            if last_v < v <= cur_v
            and WAP_STAGED_PROP not in self.upstream.snapshot(v).props
        ]
        if not vs:
            return cur_v
        if self.max_versions_per_poll is not None:
            vs = vs[: self.max_versions_per_poll]
        if self.max_rows_per_poll is None:
            return vs[-1]
        seen: set[str] = set()
        if last_v >= 0:
            try:
                seen = {f["path"] for f in self.upstream.snapshot(last_v).files}
            except FileNotFoundError:
                pass  # poll_once fails loud on the actual diff read
        target, rows = vs[0], 0
        for v in vs:
            s_v = self.upstream.snapshot(v)
            new = [f for f in s_v.files if f["path"] not in seen]
            if s_v.op not in MAINTENANCE_OPS:
                rows += sum(int(f.get("rows") or 0) for f in new)
            seen.update(f["path"] for f in new)
            if rows > self.max_rows_per_poll and v != vs[0]:
                break
            target = v
            if rows > self.max_rows_per_poll:
                break
        return target

    def poll_once(self) -> int:
        """Apply one micro-batch of upstream changes; returns rows applied.

        The upstream version is pinned for the whole poll (snapshot
        isolation); a concurrent upstream commit is picked up next poll.

        Single-pass: metadata-only version windows (renames, props, cursor
        advances) are detected from the manifest FILE LISTS driver-side —
        no Spark job at all — and the applied-row count comes from the
        merge's own Observation, so the version diff is scanned exactly
        once per poll (r4 verdict: the old emptiness probe ran a second
        count() job over the same diff)."""
        last_v = self.cursor()
        # published-only consumption: a WAP-staged upstream snapshot is
        # invisible to the feed until published (and an aborted one NEVER
        # reaches downstream — its files appear in no published snapshot)
        cur_v = self.upstream.current_version()
        if cur_v <= last_v:
            return 0
        cur_v = self._poll_target(last_v, cur_v)
        try:
            # op-aware diff: compaction/rebucket rewrites carry no logical
            # change and are EXCLUDED — an upstream compaction otherwise
            # makes the next poll re-merge every rewritten row downstream
            # (converges via the LSN guard, but costs O(table) per upstream
            # maintenance cadence)
            snap, new_files = self.upstream.changed_data_files(last_v, cur_v)
        except FileNotFoundError as e:
            # the cursor's snapshot was expired by upstream retention: the
            # version diff is gone, so an incremental read would silently
            # lose history — fail loud and tell the operator what to do
            raise RuntimeError(
                f"change-feed cursor v{last_v} is older than the upstream "
                f"table's snapshot retention; reset the cursor (drop the "
                f"'{CURSOR_PROP}' property) to trigger a full backfill"
            ) from e
        if not new_files:
            # metadata-only upstream versions (rename, props): advance the
            # cursor with a props-only commit so polls don't re-walk them.
            # ONE snapshot read — a commit racing between two reads would
            # pair a stale base with newer files and spuriously conflict
            base = self.cdc.table.snapshot()
            self.cdc.table.commit(
                base=base,
                op="changefeed-cursor",
                files=base.files,
                props_update={CURSOR_PROP: cur_v},
            )
            return 0
        changes = self.upstream._read_files(snap, new_files, resolve=True)
        payload = [c for c in changes.columns if not c.startswith("_")]
        batch = changes.select(
            *payload,
            F.col("_lsn").alias("lsn"),
            F.when(F.col("_deleted"), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
        # Crash healing: a crash between the merge commit (table
        # last_batch_id advanced, cursor advanced) and the ledger append
        # leaves the ledger one row behind.  Backfill recovery marker(s)
        # FIRST — otherwise the hole is permanent and the ledger-continuity
        # audit fails forever — then apply this poll's changes under a
        # fresh id (never reuse the committed id: its idempotence guard
        # would silently skip this poll's NEW data).
        committed = int(self.cdc.table.props().get("last_batch_id", -1))
        gap = committed - self.cdc._ledger_hwm
        if gap > MAX_LEDGER_BACKFILL:
            raise RuntimeError(
                f"ledger is {gap} batches behind the data table "
                f"(last_batch_id={committed}, ledger hwm="
                f"{self.cdc._ledger_hwm}); a genuine crash leaves a gap of "
                f"1 — the ledger table looks lost or recreated.  Restore "
                f"it (or truncate the data table's last_batch_id) instead "
                f"of letting the feed fabricate {gap} recovery markers"
            )
        if gap > 1:
            import logging

            logging.getLogger(__name__).warning(
                "change-feed healing %d ledger holes (expected 1 for a "
                "genuine crash); markers are stamped recovered=True with "
                "the CURRENT table lsn_hi", gap,
            )
        while self.cdc._ledger_hwm < committed:
            self.cdc._record(
                self.cdc._ledger_hwm + 1, MergeResult(skipped=True), []
            )
        batch_id = self.cdc._ledger_hwm + 1
        result = self.cdc.apply_batch(
            batch, batch_id, extra_props={CURSOR_PROP: cur_v}
        )
        if result.skipped:  # unreachable after healing; fail loud
            raise RuntimeError(
                f"change-feed batch id {batch_id} collided with an already-"
                f"committed merge; cursor did not advance past v{last_v}"
            )
        # what the merge actually wrote, not the pre-merge count (events can
        # be absorbed by the LSN staleness guard after a cursor reset)
        return int(result.rows_applied)

    def run_until_idle(self, max_polls: int = 1000) -> int:
        """Poll until the cursor is current with upstream; returns total rows
        applied.  Terminates on cursor currency, not on rows-applied==0 — a
        poll can legitimately apply 0 rows (all events stale under the LSN
        guard) while still advancing the cursor with more versions behind."""
        total = 0
        for _ in range(max_polls):
            n = self.poll_once()
            total += n
            if n == 0 and self.cursor() >= self.upstream.current_version():
                return total
        raise RuntimeError(f"change feed still busy after {max_polls} polls")
