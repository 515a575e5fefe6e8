"""Config-driven workflow runner — the reference's orchestrator, Spark-first.

The reference's `scripts/run_workflow.py` reads a JSON etlconf, merges
per-workflow confs and `--set @k=v` pairs, substitutes `@variables`
longest-match-first, then executes each workflow either as a SQL script list
against one DuckDB connection or as a Python subprocess
(run_workflow.py:88-110; duckdb_run_script.py:144-213).  Same contract here,
with Spark as the engine:

- step `type: "sql"`   — a list of SQL texts (or file paths); each text is
  variable-substituted, split into statements (paren-depth-aware `;`,
  `--` comments stripped — the reference's split_queries), and run via
  `spark.sql`.  The last statement's DataFrame may be registered as a view
  (`register:` key) for downstream steps.
- step `type: "py"`    — a dotted `callable` (module:function) invoked with
  (spark, conf) — replaces the reference's subprocess boundary with an
  in-process call (no process fork needed on Spark; executors are the
  parallelism boundary).
- step `type: "ingest"`— DDL-driven CSV loads (sources/csv_ingest).
- step `type: "cdc"`   — the transcript CDC apply (batch or stream mode).
- step `type: "audit"` — the audit gate; failure aborts the workflow
  (reference's forced-cast-error abort, post_etl_audit.sql:456-499).
- step `type: "changefeed"` — chain a downstream CDC table off an upstream
  table's change feed (the staged->derived hop, conf-driven).
- step `type: "rollup"` — maintain an incremental per-conversation
  aggregate table off an upstream table's change feed (streaming/rollup).
- step `type: "maintenance"` — compact / expire_snapshots / remove_orphans
  on a table (the reference's cleanup/VACUUM scripts, conf-driven).
"""

from __future__ import annotations

import hashlib
import importlib
import json
import logging
import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.config import merge_config, substitute_variables

log = logging.getLogger(__name__)


def _code_version() -> str:
    """Best-effort git SHA of the engine checkout (reference @git_sha role)."""
    import os
    import subprocess

    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stderr=subprocess.DEVNULL,
            )
            .decode()
            .strip()
        )
    except Exception:
        return ""


def read_run_metadata(spark: SparkSession, md_dir: str) -> DataFrame:
    return spark.read.parquet(md_dir)


def audit_run_metadata(spark: SparkSession, md_dir: str, run_id: str) -> None:
    """Exactly-one-row-per-run contract (reference mock E2E assertion)."""
    n = read_run_metadata(spark, md_dir).filter(F.col("run_id") == run_id).count()
    if n != 1:
        raise AssertionError(
            f"run_metadata: expected exactly 1 row for run {run_id!r}, found {n}"
        )


def split_statements(text: str) -> list[str]:
    """Split a SQL script on top-level ';', stripping `--` comment lines
    (reference: duckdb_run_script.py:54-72)."""
    lines = []
    for line in text.splitlines():
        stripped = line.lstrip()
        if stripped.startswith("--"):
            continue
        lines.append(line)
    body = "\n".join(lines)
    out, cur, depth, in_str = [], [], 0, None
    for ch in body:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ";" and depth == 0:
            stmt = "".join(cur).strip()
            if stmt:
                out.append(stmt)
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


class Workflow:
    def __init__(self, spark: SparkSession, conf: dict[str, Any]):
        self.spark = spark
        self.conf = conf
        self.variables: dict[str, Any] = dict(conf.get("variables", {}))
        self.results: list[dict[str, Any]] = []

    def _sub(self, text: str) -> str:
        return substitute_variables(text, self.variables)

    def run(self) -> list[dict[str, Any]]:
        """Execute all steps; stamp exactly one run-metadata row per run.

        The reference stamps every run with id / git SHA / timestamps into
        ``audit.run_metadata`` (scripts/run_workflow.py:183-203) and its mock
        E2E asserts exactly one row per run — same contract here: if the
        conf carries ``run_metadata_dir`` (or variable ``@run_metadata_dir``)
        one row is appended there whether the run succeeds or aborts."""
        import time as _time

        self.run_id = str(self.variables.get("run_id") or uuid.uuid4())
        started = _time.time()
        status, error = "ok", None
        try:
            for i, step in enumerate(self.conf.get("steps", [])):
                kind = step.get("type", "sql")
                name = step.get("name", f"step_{i}")
                log.info("workflow step %s (%s)", name, kind)
                fn = getattr(self, f"_run_{kind}", None)
                if fn is None:
                    raise ValueError(f"unknown step type: {kind!r}")
                out = fn(step)
                self.results.append({"name": name, "type": kind, "result": out})
            return self.results
        except Exception as e:
            status, error = "failed", f"{type(e).__name__}: {e}"
            raise
        finally:
            # best-effort audit row: if the metadata write itself fails (bad
            # run_metadata_dir, session died — exactly when a step just
            # failed), it must not replace the original step exception
            try:
                self._write_run_metadata(started, _time.time(), status, error)
            except Exception:
                log.exception(
                    "run-metadata write failed (run_id=%s, status=%s)",
                    self.run_id,
                    status,
                )
                if status == "ok":  # nothing to mask on the success path
                    raise

    def _write_run_metadata(
        self, started: float, finished: float, status: str, error: str | None
    ) -> None:
        md_dir = self.conf.get("run_metadata_dir") or self.variables.get(
            "run_metadata_dir"
        )
        if not md_dir:
            return
        row = {
            "run_id": self.run_id,
            "config_digest": hashlib.sha256(
                json.dumps(self.conf, sort_keys=True, default=str).encode()
            ).hexdigest(),
            "code_version": _code_version(),
            "started_at": datetime.fromtimestamp(started, tz=timezone.utc).isoformat(),
            "finished_at": datetime.fromtimestamp(finished, tz=timezone.utc).isoformat(),
            "status": status,
            "error": error,
            "n_steps_done": len(self.results),
            "steps": json.dumps(
                [{"name": r["name"], "type": r["type"]} for r in self.results]
            ),
        }
        schema = (
            "run_id string, config_digest string, code_version string,"
            " started_at string, finished_at string, status string,"
            " error string, n_steps_done int, steps string"
        )
        self.spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(self._sub(str(md_dir)))

    # ------------------------------------------------------------- steps

    def _run_sql(self, step: dict) -> dict:
        n = 0
        last: DataFrame | None = None
        for script in step["scripts"]:
            text = script
            if isinstance(script, str) and script.endswith(".sql"):
                with open(script) as f:
                    text = f.read()
            for stmt in split_statements(self._sub(text)):
                last = self.spark.sql(stmt)
                n += 1
        if step.get("register") and last is not None:
            last.createOrReplaceTempView(step["register"])
        return {"statements": n}

    def _run_py(self, step: dict) -> Any:
        mod_name, _, fn_name = step["callable"].partition(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        sconf = {
            k: (self._sub(v) if isinstance(v, str) else v)
            for k, v in step.get("conf", {}).items()
        }
        return fn(self.spark, merge_config(self.conf, sconf))

    def _run_ingest(self, step: dict) -> dict:
        from mimic_spark.sources.csv_ingest import (
            IngestRegistry,
            ingest_csv_table,
            parse_ddl,
        )

        with open(self._sub(step["ddl"])) as f:
            schemas = parse_ddl(f.read())
        target = self._sub(step["target_dir"])
        registry = IngestRegistry(target)
        loaded = {}
        for table, csv_path in step["tables"].items():
            loaded[table] = ingest_csv_table(
                self.spark,
                self._sub(csv_path),
                schemas[table],
                target,
                table,
                on_exists=step.get("on_exists", "replace"),
                limit=step.get("limit"),
                registry=registry,
            )
        return loaded

    def _run_cdc(self, step: dict) -> dict:
        from mimic_spark.streaming.apply import TranscriptCdc, run_batched
        from mimic_spark.streaming.cdc import run_stream

        table = self._sub(step["table"])
        # batch mode: chunks may be listed explicitly or discovered from a
        # changelog dir (the shape workflow_generate materializes)
        if "chunks" not in step and step.get("changelog") and step.get("mode", "batch") == "batch":
            import os as _os

            cdir = self._sub(step["changelog"])
            step = {
                **step,
                "chunks": sorted(
                    _os.path.join(cdir, n)
                    for n in _os.listdir(cdir)
                    if n.startswith("chunk-")
                ),
            }
        if step.get("mode") == "attach":
            # open an existing table without applying anything — the shape
            # report/metrics workflows use (reference workflow_metrics.conf).
            # attach must never CREATE: a typo'd path would otherwise silently
            # materialize an empty table and report watermark null (r2 ADVICE)
            from mimic_spark.lakehouse.table import SnapshotTable as _ST
            from mimic_spark.streaming.apply import TranscriptCdc as _T

            if not _ST.exists(table):
                raise FileNotFoundError(
                    f"cdc attach: no snapshot table at {table!r} "
                    "(attach opens existing tables only; use mode=batch/stream "
                    "to create one)"
                )
            cdc = _T(self.spark, table, n_buckets=int(step.get("n_buckets", 32)))
            self._last_cdc = cdc
            if step.get("register"):
                cdc.read_published().createOrReplaceTempView(step["register"])
            return {
                "watermark": cdc.high_watermark(),
                "version": cdc.table.latest_version(),
            }
        if step.get("mode", "batch") == "stream":
            cdc = run_stream(
                self.spark,
                self._sub(step["changelog"]),
                table,
                self._sub(step["checkpoint"]),
                n_buckets=int(step.get("n_buckets", 32)),
            )
        else:
            cdc = TranscriptCdc(
                self.spark,
                table,
                n_buckets=int(step.get("n_buckets", 32)),
                mode=step.get("merge_mode", "cow"),
            )
            run_batched(self.spark, cdc, step["chunks"])
        self._last_cdc = cdc
        if step.get("register"):
            cdc.read_published().createOrReplaceTempView(step["register"])
        return {"watermark": cdc.high_watermark(), "version": cdc.table.latest_version()}

    def _run_changefeed(self, step: dict) -> dict:
        """Chain a downstream CDC table off an upstream table's change feed
        (the derived-table hop of the lake: staged -> curated -> serving).

        keys: upstream (table path), table (downstream path), n_buckets,
        merge_mode; registers the downstream published view if asked."""
        from mimic_spark.streaming.apply import TranscriptCdc
        from mimic_spark.streaming.changefeed import ChangeFeedConsumer

        down = TranscriptCdc(
            self.spark,
            self._sub(step["table"]),
            n_buckets=int(step.get("n_buckets", 32)),
            mode=step.get("merge_mode", "cow"),
        )
        feed = ChangeFeedConsumer(
            self.spark, self._sub(step["upstream"]), down
        )
        applied = feed.run_until_idle(
            max_polls=int(step.get("max_polls", 1000))
        )
        self._last_cdc = down
        if step.get("register"):
            down.read_published().createOrReplaceTempView(step["register"])
        return {
            "rows_applied": int(applied),
            "cursor": feed.cursor(),
            "version": down.table.latest_version(),
        }

    def _run_rollup(self, step: dict) -> dict:
        """Maintain an incrementally-updated aggregate table off an
        upstream CDC table's change feed (streaming/rollup.py — the
        continuous-aggregate role; r5).

        keys: upstream (table path), table (rollup path), n_buckets,
        max_point_keys; registers the published rollup view if asked."""
        from mimic_spark.streaming.rollup import IncrementalConvRollup

        roll = IncrementalConvRollup(
            self.spark,
            self._sub(step["upstream"]),
            self._sub(step["table"]),
            n_buckets=int(step.get("n_buckets", 16)),
            max_point_keys=int(step.get("max_point_keys", 10_000)),
        )
        changed = roll.run_until_idle(
            max_polls=int(step.get("max_polls", 1000))
        )
        if step.get("register"):
            roll.read().createOrReplaceTempView(step["register"])
        return {
            "conversations_changed": int(changed),
            "cursor": roll.cursor(),
            "version": roll.table.latest_version(),
        }

    def _run_maintenance(self, step: dict) -> dict:
        """Table maintenance (the reference's cleanup/VACUUM scripts,
        conf-driven): any of compact / expire_snapshots / remove_orphans,
        in that order, each opt-in via its key (true or {} = defaults).

        Ordering contract: register views over a table AFTER its
        maintenance step (e.g. via a cdc-attach step) — a temp view
        registered earlier pins the concrete file paths of the
        registration-time snapshot, which compaction + retention may
        delete, failing later SQL steps mid-workflow."""
        from mimic_spark.lakehouse.maintenance import (
            compact,
            expire_snapshots,
            remove_orphan_files,
        )
        from mimic_spark.lakehouse.table import SnapshotTable

        path = self._sub(step["table"])
        if not SnapshotTable.exists(path):
            raise FileNotFoundError(
                f"maintenance: no snapshot table at {path!r}"
            )
        t = SnapshotTable(self.spark, path)

        def _opt(key: str) -> dict | None:
            """Uniform opt-in: absent/None/false -> skip; true or {} ->
            defaults; dict -> options.  (An empty dict means 'with
            defaults', never 'skip' — a falsy check would silently no-op.)
            Any OTHER type is a conf bug and raises: a typo like
            "compact": "false" (string) must not silently RUN compaction
            (r4 ADVICE)."""
            v = step.get(key)
            if v is None or v is False:
                return None
            if v is True:
                return {}
            if isinstance(v, dict):
                return v
            raise ValueError(
                f"maintenance step key {key!r} must be true/false or an "
                f"options dict, got {type(v).__name__}: {v!r}"
            )

        out: dict[str, Any] = {}
        c = _opt("compact")
        if c is not None:
            if c.get("incremental"):
                from mimic_spark.lakehouse.maintenance import (
                    compact_incremental,
                )

                out["compact"] = compact_incremental(
                    t,
                    min_files=int(c.get("min_files", 4)),
                    min_delta_ratio=float(c.get("min_delta_ratio", 0.25)),
                    gc_tombstones_below=c.get("gc_tombstones_below"),
                    sort_cols=c.get("sort_cols"),
                )
            else:
                out["compact"] = compact(
                    t,
                    gc_tombstones_below=c.get("gc_tombstones_below"),
                    sort_cols=c.get("sort_cols"),
                )
        e = _opt("expire_snapshots")
        if e is not None:
            out["expire_snapshots"] = expire_snapshots(
                t, keep_last=int(e.get("keep_last", 5))
            )
        o = _opt("remove_orphans")
        if o is not None:
            out["remove_orphans"] = remove_orphan_files(
                t, older_than_s=float(o.get("older_than_s", 3 * 24 * 3600))
            )
        return out

    def _run_quality(self, step: dict) -> list:
        from mimic_spark.quality import run_quality_suite

        return [
            r.__dict__
            for r in run_quality_suite(
                self.spark,
                step["checks"],
                fail_on_error=step.get("fail_on_error", True),
                report_view=step.get("report_view", "report_unit_test"),
            )
        ]

    def _run_audit(self, step: dict) -> dict:
        from mimic_spark.streaming.audit import run_audit

        rep = run_audit(
            self._last_cdc,
            expected_final_count=step.get("expected_final_count"),
            fail_on_error=step.get("fail_on_error", True),
            max_reject_ratio=step.get("max_reject_ratio", 0.01),
        )
        return rep.checks


def run_workflow(spark: SparkSession, conf: dict[str, Any]) -> list[dict[str, Any]]:
    return Workflow(spark, conf).run()
