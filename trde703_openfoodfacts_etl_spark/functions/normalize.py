"""Vectorized Unicode text normalization (pandas/Arrow UDFs — no per-row Python).

Parity target: the reference's only UDF, ``normalize_string``
(etl/silver_to_gold.py:20-29) — a row-at-a-time Python UDF doing NFD
decomposition, combining-mark strip, and whitespace collapse. Here the same
specification runs as an Arrow-batched pandas UDF: the executor receives
columnar batches and applies pandas ``.str`` kernels, ~10-100× less
serialization + interpreter overhead than per-row pickling.

Spec (ENGINE_NORM_SPEC — the pytest oracle implements this independently):
1. Unicode NFD decomposition.
2. Remove combining marks in the standard combining blocks
   (U+0300–036F, U+1AB0–1AFF, U+1DC0–1DFF, U+20D0–20FF, U+FE20–FE2F).
3. Collapse runs of whitespace to a single space; strip ends.
Null in → null out. ``normalize_key`` additionally lowercases first
(the reference applies ``lower()`` before its UDF, etl/silver_to_gold.py:94).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: combining-mark blocks removed after NFD decomposition
_COMBINING = "̀-ͯ᪰-᫿᷀-᷿⃐-⃿︠-︯"
_MARKS_RE = f"[{_COMBINING}]"
_WS_RE = r"\s+"


def _normalize_series(s: pd.Series, lowercase: bool) -> pd.Series:
    out = s.str.normalize("NFD")
    if lowercase:
        out = out.str.lower()
    out = out.str.replace(_MARKS_RE, "", regex=True)
    out = out.str.replace(_WS_RE, " ", regex=True).str.strip()
    return out


@F.pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    return _normalize_series(s, lowercase=False)


@F.pandas_udf(T.StringType())
def normalize_key(s: pd.Series) -> pd.Series:
    return _normalize_series(s, lowercase=True)


def reference_normalize(value: str | None, lowercase: bool = False) -> str | None:
    """Independent scalar implementation of ENGINE_NORM_SPEC for test
    oracles (plain python, per row — never used by the engine)."""
    import re

    if value is None:
        return None
    import unicodedata

    v = unicodedata.normalize("NFD", value)
    if lowercase:
        v = v.lower()
    v = re.sub(_MARKS_RE, "", v)
    v = re.sub(r"\s+", " ", v).strip()
    return v


def with_normalized_text(df, src: str = "text", dst: str = "text_norm"):
    """Batch transform hook for the CDC pipeline: adds the normalized text
    column (vectorized). Plug into run_incremental(transform=...)."""
    return df.withColumn(dst, normalize_text(F.col(src)))
