"""Arrow-vectorized text normalization (the engine's only Python compute).

BASELINE.json mandates: "Arrow-vectorized pandas UDFs for all text
normalization — no per-row Python".  The normalization itself is small on
purpose; what matters is the *shape*: a ``pandas_udf`` (Series -> Series,
Arrow batch transfer, shows up as ArrowEvalPython in plans — never
BatchEvalPython), plus a pure-Python twin used by the pytest replay oracle so
per-turn text equality is checkable without Spark.

Rules (applied identically by both implementations, in this order):
1. Control chars (except \n, \t) stripped.
2. NBSP and other unicode space separators -> ASCII space; runs of
   horizontal whitespace collapsed to one space.
3. Leading/trailing whitespace stripped.
4. Unicode NFC normalization (last, so the OUTPUT is guaranteed NFC even
   when stripping a control char juxtaposes a base with a combining mark —
   r3 reorder; it also lets the Arrow path resolve unicode-whitespace rows
   entirely in C++ before the Python NFC loop).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPACES = re.compile(r"[^\S\n]+")  # horizontal whitespace runs (incl.  , \t)
_CTRL = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")


def normalize_text_py(s: str | None) -> str | None:
    """Pure-Python twin of the UDF — used by the replay oracle in tests."""
    if s is None:
        return None
    s = _CTRL.sub("", s)
    s = _SPACES.sub(" ", s)
    s = s.strip()
    return unicodedata.normalize("NFC", s)


# RE2 twins of the Python patterns for pyarrow.compute (C++ execution).
# RE2's \s/\S are ASCII-only, so the horizontal-whitespace class is spelled
# out: exactly the chars str.isspace() accepts minus \n, minus the ones the
# CTRL pass (which runs first) has already removed.
_CTRL_RE2 = r"[\x00-\x08\x0b-\x1f\x7f]"
_SPACES_RE2 = (
    r"[ \t\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}"
    r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+"
)
# r9 decomposition of the _SPACES_RE2 collapse (see _normalize_series):
# the non-ASCII space characters alone (no ' ', no \t), replaced 1:1 first
_UNI_SPACE_RE2 = (
    r"[\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}"
    r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"
)


def _data_bytes(arr) -> "object":
    """numpy view of a string array's content bytes (gating scans)."""
    import numpy as np

    bufs = arr.buffers()
    if bufs[2] is None:
        return np.zeros(0, np.uint8)
    return np.frombuffer(bufs[2], np.uint8)


def _normalize_series(s: pd.Series) -> pd.Series:
    """pyarrow.compute implementation — the regex passes run in C++ (RE2),
    measured the biggest single cost in the CDC apply path.  NFC
    composition runs in Python but ONLY on rows still containing non-ASCII
    bytes AFTER the C++ passes (pyarrow's utf8_normalize does not compose).

    r9 (guide §4.2): RE2 replace cost is per MATCH, so the original
    single-pass `[ \\t<unicode spaces>]+ -> ' '` collapse paid a match for
    every single space of every row (~30 MB/s measured).  The pass is
    decomposed into provably equivalent cheap steps — unicode space chars
    -> ' ' (1:1), '\\t' -> ' ' (literal), then collapse only runs of 2+
    spaces (`'  +'`, which matches orders of magnitude fewer times) — each
    step gated by a numpy byte-presence scan of the Arrow buffer, so a
    clean batch pays one memcmp-speed scan and no regex at all.
    Equivalence: every char of the old class maps to ' ' first, so any old
    class-run becomes a space-run and collapses to one ' '; single class
    chars were already replaced 1:1.  Measured 1.8 s -> 0.5 s per 200k
    dirty rows (57 MB), unchanged results (twin-fuzz tests).

    The rule order (module docstring) puts NFC LAST deliberately: rows whose
    only non-ASCII content is unicode whitespace (NBSP et al. — ~all dirty
    rows of a typical chat stream) become pure ASCII after the C++ passes
    and never hit the per-row Python NFC loop (r3: under the old NFC-first
    order that loop was silently running on ~94% of the synthetic stream's
    rows).  NFC-last is also the stronger contract — the output is
    guaranteed NFC even when stripping a control char juxtaposes a base
    with a combining mark (the one case where the orders genuinely differ;
    fuzz-covered).  Byte-for-byte equal to normalize_text_py (twin-fuzzed
    in tests, incl. decomposed combining sequences)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(s, type=pa.string())
    d = _data_bytes(arr)
    # one histogram pass answers every class-presence gate at memcmp speed
    hist = np.bincount(d, minlength=256)
    has_ctrl = bool(
        hist[0x00:0x09].sum() + hist[0x0B:0x20].sum() + hist[0x7F]
    )
    has_tab = bool(hist[0x09])
    has_nonascii = bool(hist[0x80:].sum())
    has_double = bool(
        ((d[:-1] == 0x20) & (d[1:] == 0x20)).any()
    ) if len(d) > 1 else False
    if has_ctrl:
        arr = pc.replace_substring_regex(
            arr, pattern=_CTRL_RE2, replacement=""
        )
    if has_nonascii:
        arr = pc.replace_substring_regex(
            arr, pattern=_UNI_SPACE_RE2, replacement=" "
        )
    if has_tab:
        arr = pc.replace_substring(arr, pattern="\t", replacement=" ")
    if has_double or has_tab or has_nonascii or has_ctrl:
        # any of the passes above (or a pre-existing double space) can have
        # produced adjacent spaces; clean batches skip the collapse outright
        arr = pc.replace_substring_regex(
            arr, pattern="  +", replacement=" "
        )
    # after the collapse the only whitespace left is ' ' and '\n' — trimming
    # those two is exactly str.strip() at this point
    arr = pc.utf8_trim(arr, characters=" \n")
    if has_nonascii and bool((_data_bytes(arr) >= 0x80).any()):
        nonascii = pc.match_substring_regex(arr, "[^\\x00-\\x7f]")
        vals = arr.to_pylist()
        mask = nonascii.to_pylist()
        vals = [
            unicodedata.normalize("NFC", v) if (m and v is not None) else v
            for v, m in zip(vals, mask)
        ]
        arr = pa.array(vals, type=pa.string())
    return arr.to_pandas()


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _normalize_series(s)


def normalized(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return normalize_text_udf(c)
