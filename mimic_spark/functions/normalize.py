"""Arrow-vectorized text normalization (the engine's only Python compute).

BASELINE.json mandates: "Arrow-vectorized pandas UDFs for all text
normalization — no per-row Python".  The normalization itself is small on
purpose; what matters is the *shape*: a ``pandas_udf`` (Series -> Series,
Arrow batch transfer, shows up as ArrowEvalPython in plans — never
BatchEvalPython), plus a pure-Python twin used by the pytest replay oracle so
per-turn text equality is checkable without Spark.

Rules (applied identically by both implementations):
1. Unicode NFC normalization.
2. NBSP and other unicode space separators -> ASCII space.
3. Control chars (except \n, \t) stripped.
4. Runs of whitespace (space/tab, not newline) collapsed to one space.
5. Leading/trailing whitespace stripped.
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
    s = unicodedata.normalize("NFC", s)
    s = _CTRL.sub("", s)
    s = _SPACES.sub(" ", s)
    return s.strip()


def _normalize_series(s: pd.Series) -> pd.Series:
    # vectorized pandas string ops over the Arrow batch; one regex pass each
    out = s.str.normalize("NFC")
    out = out.str.replace(_CTRL, "", regex=True)
    out = out.str.replace(_SPACES, " ", regex=True)
    return out.str.strip()


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return _normalize_series(s)


def normalized(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return normalize_text_udf(c)
