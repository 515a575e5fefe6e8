"""Property-based merge semantics: random changelogs vs the sequential oracle.

hypothesis generates op sequences over a tiny keyspace (maximizing
insert/update/delete collisions), permutes delivery order, injects exact
duplicate deliveries, and splits delivery into arbitrary batches.  The final
table must equal the LSN-ordered sequential replay regardless — for both COW
and MoR modes.  (The reference's analog is its determinism suite; this is the
§5 carry-over strengthened with randomized inputs.)
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mimic_spark.lakehouse.merge import ensure_internal_schema, merge_into
from mimic_spark.lakehouse.table import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

BATCH_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, text string"
)


@st.composite
def changelog(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for lsn in range(n):
        conv = draw(st.integers(min_value=0, max_value=2))
        turn = draw(st.integers(min_value=0, max_value=2))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        events.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": f"c{conv}",
                "turn_idx": turn,
                "text": None if op == "delete" else f"payload-{lsn}",
            }
        )
    delivery = draw(st.permutations(events))
    # exact duplicate deliveries of a few events
    dups = draw(
        st.lists(
            st.integers(min_value=0, max_value=len(delivery) - 1),
            max_size=3,
        )
    )
    for i in sorted(dups, reverse=True):
        delivery.insert(i, dict(delivery[i]))
    # split into 1..4 batches
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(delivery)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(delivery)]:
        batches.append(delivery[prev:c])
        prev = c
    return events, batches


def oracle_state(events):
    state = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        k = (ev["conv_id"], ev["turn_idx"])
        cur = state.get(k)
        if cur is not None and ev["lsn"] < cur["lsn"]:
            continue
        state[k] = ev
    return {
        k: v["text"]
        for k, v in state.items()
        if v["op"] != "delete"
    }


def run_engine(spark, batches, mode: str):
    from mimic_spark.streaming.apply import dedup_batch

    d = tempfile.mkdtemp(prefix="hyp_merge_")
    try:
        t = SnapshotTable.create(
            spark,
            os.path.join(d, "t"),
            ensure_internal_schema(SCHEMA),
            ["conv_id", "turn_idx"],
            n_buckets=4,
        )
        for i, batch in enumerate(batches):
            if not batch:
                continue
            df = spark.createDataFrame(
                [
                    (e["lsn"], e["op"], e["conv_id"], e["turn_idx"], e["text"])
                    for e in batch
                ],
                BATCH_SCHEMA,
            )
            merge_into(t, dedup_batch(df), batch_id=i, mode=mode)
        import pyspark.sql.functions as F

        rows = (
            t.read()
            .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .select("conv_id", "turn_idx", "text")
            .collect()
        )
        return {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=changelog())
@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_equals_sequential_replay(spark, mode, data):
    events, batches = data
    assert run_engine(spark, batches, mode) == oracle_state(events)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=changelog())
def test_diff_apply_roundtrip_property(spark, data):
    """For random changelogs: snapshot_diff(v_mid -> v_end) applied onto a
    copy of v_mid reproduces v_end — the engine's emitted CDC is faithful."""
    import pyspark.sql.functions as F

    from mimic_spark.lakehouse.diff import snapshot_diff
    from mimic_spark.streaming.apply import dedup_batch

    events, batches = data
    d = tempfile.mkdtemp(prefix="hyp_diff_")
    try:
        t = SnapshotTable.create(
            spark,
            os.path.join(d, "t"),
            ensure_internal_schema(SCHEMA),
            ["conv_id", "turn_idx"],
            n_buckets=4,
        )
        versions = []
        for i, batch in enumerate(batches):
            if not batch:
                continue
            df = spark.createDataFrame(
                [
                    (e["lsn"], e["op"], e["conv_id"], e["turn_idx"], e["text"])
                    for e in batch
                ],
                BATCH_SCHEMA,
            )
            merge_into(t, dedup_batch(df), batch_id=i)
            versions.append(t.latest_version())
        if len(versions) < 2:
            return
        v_mid, v_end = versions[0], versions[-1]

        changes = snapshot_diff(t, v_mid, v_end)
        copy = SnapshotTable.create(
            spark,
            os.path.join(d, "copy"),
            t.read(version=v_mid).schema,
            ["conv_id", "turn_idx"],
            n_buckets=4,
        )
        copy.append(t.read(version=v_mid))
        merge_into(copy, changes, batch_id=0)

        def pub(tbl, v=None):
            df = tbl.read(version=v).filter(
                ~F.coalesce(F.col("_deleted"), F.lit(False))
            )
            return sorted(
                tuple(r)
                for r in df.select("conv_id", "turn_idx", "text").collect()
            )

        assert pub(copy) == pub(t, v_end)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---- pure-Python property tests for round-4 primitives (no Spark) ----

from hypothesis import given, settings as _settings
from hypothesis import strategies as _st

_key_tuple = _st.tuples(
    _st.text(min_size=0, max_size=20),
    _st.integers(min_value=-(2**31), max_value=2**31 - 1),
)


@given(
    added=_st.lists(_key_tuple, min_size=0, max_size=300, unique=True),
    probes=_st.lists(_key_tuple, min_size=0, max_size=50),
)
@_settings(max_examples=100, deadline=None)
def test_bloom_never_false_negative(added, probes):
    """A bloom filter may say 'maybe' for absent keys but must NEVER say
    'absent' for a key that was added — a false negative would silently
    drop rows from a point lookup."""
    from mimic_spark.lakehouse.bloom import bloom_might_contain, build_bloom

    bl = build_bloom(added)
    for kt in added:
        assert bloom_might_contain(bl, kt)
    # round-trip through the manifest JSON representation
    import json as _j

    bl2 = _j.loads(_j.dumps(bl))
    for kt in added:
        assert bloom_might_contain(bl2, kt)


@given(
    ts=_st.datetimes(
        min_value=__import__("datetime").datetime(1970, 1, 2),
        max_value=__import__("datetime").datetime(2200, 1, 1),
    ),
    offset_min=_st.integers(min_value=-14 * 60, max_value=14 * 60),
)
@_settings(max_examples=200, deadline=None)
def test_norm_ts_str_instant_equivalence(ts, offset_min):
    """_norm_ts_str maps every representation of the same instant — naive
    UTC datetime, tz-aware datetime in any offset, or their ISO strings —
    to one canonical naive-UTC string, and is idempotent (manifests written
    before the r4 fix stored '+00:00' suffixes that must normalize to the
    same value)."""
    import datetime as dt

    from mimic_spark.lakehouse.table import _norm_ts_str

    tz = dt.timezone(dt.timedelta(minutes=offset_min))
    aware = ts.replace(tzinfo=dt.timezone.utc).astimezone(tz)
    want = _norm_ts_str(ts)  # naive == UTC by convention
    assert _norm_ts_str(aware) == want
    assert _norm_ts_str(ts.isoformat(sep=" ")) == want
    assert _norm_ts_str(aware.isoformat(sep=" ")) == want
    assert _norm_ts_str(want) == want  # idempotent
