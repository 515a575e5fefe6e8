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


def _normalize_series(s: pd.Series) -> pd.Series:
    """pyarrow.compute implementation — the regex passes run in C++ (RE2),
    ~4x faster than pandas object-dtype regex; measured the biggest single
    cost in the CDC apply path.  NFC composition runs in Python but ONLY on
    rows still containing non-ASCII bytes AFTER the C++ passes (pyarrow's
    utf8_normalize does not compose).

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
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(s, type=pa.string())
    arr = pc.replace_substring_regex(arr, pattern=_CTRL_RE2, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_SPACES_RE2, replacement=" ")
    # after the collapse the only whitespace left is ' ' and '\n' — trimming
    # those two is exactly str.strip() at this point
    arr = pc.utf8_trim(arr, characters=" \n")
    nonascii = pc.match_substring_regex(arr, "[^\\x00-\\x7f]")
    if pc.any(nonascii).as_py():
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
