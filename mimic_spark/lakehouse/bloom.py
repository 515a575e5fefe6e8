"""Per-file key bloom filters for point-lookup file skipping.

The reference ships an opt-in curated index role (ART indexes on hot key
columns, scripts/optimize_duckdb_indexes.py:34-55); the lakehouse analog at
Iceberg parity is file-level key metadata.  Min/max key stats don't work
here: keys are HASH-bucketed, so every file of a bucket spans nearly the
whole lexical key range and a range test never prunes.  A small bloom per
file does: `read_for_keys` tests each candidate file's bloom against the
looked-up keys and skips files that provably don't contain any of them —
pruning WITHIN a bucket, on top of the existing bucket pruning.

Sizing: ~10 bits/key with 7 probes ≈ 1% false-positive rate (a false
positive only costs reading one extra file — never correctness).  The
filter is capped at 64 KiB so a huge file degrades to a weaker filter
rather than bloating the manifest.

Harvesting is OPT-IN per table (`key_bloom` table prop): it re-reads each
just-written file's key columns (a cheap columnar read of 1-2 columns, but
not free), which serving tables want and write-hot CDC streams may not —
the reference's index script makes the same opt-in tradeoff.  At 100 TB /
Iceberg parity this surface maps to parquet bloom filters + puffin stats;
the manifest JSON here plays the same role driver-side.

Blooms are pure Python + hashlib (no Spark dependency): the writer builds
them from a pyarrow column read, the lookup tests them driver-side before
any Spark job is planned.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Any, Iterable

N_PROBES = 7
BITS_PER_KEY = 10
MAX_BYTES = 64 * 1024


def supported_key_types(schema, key_cols: list[str]) -> bool:
    """True iff every key column's type has a writer/lookup-consistent
    encoding.

    str/bool/integral types encode via str() identically on both sides.
    TIMESTAMP and DATE keys (r5) encode CANONICALLY as epoch integers at
    BOTH ends — the harvester casts the pyarrow column to int64 epoch
    micros / int32 epoch days, and the lookup computes unix_micros /
    unix_date JVM-side BEFORE collect (never str() of a collected
    datetime: pyarrow hands back tz-aware UTC while Spark collect hands
    back naive session-local — those strings diverge and a bloom built on
    them would return false NEGATIVES).  TIMESTAMP_NTZ stays unsupported:
    unix_micros on NTZ routes through the session timezone, so there is
    no session-independent canonical integer for it.  Floats/decimals/
    binary stay unsupported (formatting divergence); such tables simply
    get no blooms (conservatively kept files, never wrong)."""
    from pyspark.sql import types as T

    ok = (
        T.StringType,
        T.BooleanType,
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.TimestampType,
        T.DateType,
    )
    # (TimestampNTZType is NOT a TimestampType subclass, so the allowlist
    # alone already excludes it — asserted by the unsafe-key-types pytest)
    by_name = {f.name: f.dataType for f in schema.fields}
    return all(isinstance(by_name.get(c), ok) for c in key_cols)


def key_encode(values: tuple) -> bytes:
    """Canonical byte encoding of one key tuple (writer and lookup must
    agree; str() of Spark-collected and pyarrow-collected scalars matches
    for the supported key types: str/int/bool — enforced by
    supported_key_types at harvest time)."""
    return "\x1f".join(
        v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
        for v in values
    ).encode("utf-8")


def _probes(enc: bytes, m_bits: int) -> Iterable[int]:
    h = hashlib.sha256(enc).digest()
    h1 = int.from_bytes(h[0:8], "big")
    h2 = int.from_bytes(h[8:16], "big") | 1  # odd -> full-period stride
    for i in range(N_PROBES):
        yield (h1 + i * h2) % m_bits


def build_bloom(keys: Iterable[tuple]) -> dict[str, Any]:
    """Bloom over key tuples -> manifest-JSON-safe dict
    {"b64": ..., "m": bits, "k": probes, "n": keys_added}."""
    keys = list(keys)
    m_bits = min(max(1024, len(keys) * BITS_PER_KEY), MAX_BYTES * 8)
    buf = bytearray((m_bits + 7) // 8)
    for kt in keys:
        for p in _probes(key_encode(kt), m_bits):
            buf[p >> 3] |= 1 << (p & 7)
    return {
        "b64": base64.b64encode(bytes(buf)).decode("ascii"),
        "m": m_bits,
        "k": N_PROBES,
        "n": len(keys),
    }


def bloom_might_contain(bloom: dict[str, Any], key_tuple: tuple) -> bool:
    """False means the file PROVABLY lacks the key; True means maybe."""
    return bloom_might_contain_any(bloom, [key_tuple])


def bloom_might_contain_any(
    bloom: dict[str, Any], key_tuples: Iterable[tuple]
) -> bool:
    """Test many keys against one filter, decoding the (up to 64 KiB)
    bitset ONCE — probing per (file, key) with a fresh b64decode each time
    would make a 1000-key lookup decode every candidate file 1000 times."""
    buf = base64.b64decode(bloom["b64"])
    m_bits = int(bloom["m"])
    return any(
        all(
            buf[p >> 3] & (1 << (p & 7))
            for p in _probes(key_encode(kt), m_bits)
        )
        for kt in key_tuples
    )


def harvest_file_bloom(
    parquet_path: str, key_cols: list[str]
) -> dict[str, Any] | None:
    """Read a data file's key columns (columnar — only those columns hit
    disk) and build its bloom.  Returns None if anything goes wrong: blooms
    are an optimization, never a correctness gate.

    Timestamp/date columns are canonicalized to epoch integers (micros /
    days) BEFORE encoding — the lookup side computes the same integers
    JVM-side (unix_micros/unix_date in files_for_keys), so the two ends
    agree on an absolute-instant encoding no matter the session timezone."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(parquet_path, columns=key_cols)
        cols = []
        for c in key_cols:
            col = tbl.column(c)
            if pa.types.is_timestamp(col.type):
                col = col.cast(
                    pa.timestamp("us", tz=col.type.tz)
                ).cast(pa.int64())
            elif pa.types.is_date(col.type):
                col = col.cast(pa.date32()).cast(pa.int32())
            cols.append(col.to_pylist())
        return build_bloom(zip(*cols)) if cols else None
    except Exception:
        return None
