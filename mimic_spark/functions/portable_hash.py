"""Portable integer hashing shared by Spark queries and their DuckDB oracles.

Engine hashes (xxhash64, farm_fingerprint) differ across engines by design,
which forces rows-only correctness checks.  Everything here is plain
BIGINT arithmetic mod the Mersenne prime 2^31-1 — bit-identical in Spark,
DuckDB and pure Python — so minhash signatures, simhash bits, LSH hyperplane
signs and row ids can be *value-checked* against an independent engine.
The polynomial word hash is the same one `doc_fingerprint` proved green
(reference role: FARM_FINGERPRINT in st_hosp_base.sql:28-33, replayed with
portable arithmetic instead of an engine hash).

All products stay below 2^62: operands are < 2^31, multipliers <= 2^31,
so the arithmetic is overflow-free (and ANSI-mode-safe) in both engines.
"""

from __future__ import annotations

HASH_MOD = 2147483647  # 2^31 - 1 (prime)

# fixed multipliers/offsets for the universal family h_i(x) = (a_i*x + c_i) % M
# (a nonzero mod a prime makes each h_i a bijection on Z_M)
KNUTH = 2654435761
WORD_COMBINE = 131
SIG_COMBINE = 1000003


def hash_family(n: int) -> list[tuple[int, int]]:
    """n (a_i, c_i) pairs, deterministic, a_i != 0 mod M."""
    out = []
    for i in range(1, n + 1):
        a = (i * KNUTH + 1) % HASH_MOD
        c = (i * 40503 + 7) % HASH_MOD
        assert a != 0
        out.append((a, c))
    return out


# --- Spark SQL expression fragments (for F.expr) -------------------------

# per-word rolling character hash: fold ascii codepoints mod M
SPARK_WORD_HASH = (
    "aggregate(transform(sequence(1, length({w})), "
    "i -> cast(ascii(substring({w}, i, 1)) AS BIGINT)), "
    "cast(0 AS BIGINT), (acc, x) -> pmod(acc * 31 + x, 2147483647))"
)

# array<string> words -> array<bigint> word hashes
SPARK_WORD_HASHES = (
    "transform({words}, w -> " + SPARK_WORD_HASH.format(w="w") + ")"
)


def spark_word_hashes(words_col: str) -> str:
    return SPARK_WORD_HASHES.format(words=words_col)


# --- DuckDB SQL fragments -------------------------------------------------

DUCK_WORD_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length({w})), "
    "i -> CAST(unicode(substring({w}, i, 1)) AS BIGINT))), "
    "(acc, x) -> (acc * 31 + x) % 2147483647)"
)

DUCK_WORD_HASHES = (
    "list_transform({words}, w -> " + DUCK_WORD_HASH.format(w="w") + ")"
)


def duck_word_hashes(words_col: str) -> str:
    return DUCK_WORD_HASHES.format(words=words_col)


# 62-bit row id: two independent rolling char hashes (multipliers 31 / 37)
# stacked — collision odds ~2^-62, good enough to stand in for the
# reference's FARM_FINGERPRINT row identity in a cross-engine-checkable way.

def spark_row_id(s: str) -> str:
    h31 = SPARK_WORD_HASH.format(w=s)
    h37 = SPARK_WORD_HASH.format(w=s).replace("acc * 31 +", "acc * 37 +")
    return f"(({h31}) * 2147483648 + ({h37}))"


def duck_row_id(s: str) -> str:
    h31 = DUCK_WORD_HASH.format(w=s)
    h37 = DUCK_WORD_HASH.format(w=s).replace("acc * 31 +", "acc * 37 +")
    return f"(({h31}) * 2147483648 + ({h37}))"


# --- pure-Python twin (for pytest) ---------------------------------------


def py_word_hash(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def py_string_hash(s: str) -> int:
    """Rolling hash over a whole string's characters (row-id use)."""
    return py_word_hash(s)
