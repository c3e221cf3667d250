"""Vectorized UDF definitions (SURVEY.md §2 group J).

NOTE: deliberately NO ``from __future__ import annotations`` here — Spark's
pandas-UDF type inference reads the real annotation objects, and PEP 563
stringified annotations break GROUPED_AGG inference.
"""

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_len(n_chars: pd.Series, lang: pd.Series) -> float:
    """Grouped-agg UDAF (op 59): weighted mean doc length, weight 2.0 for
    English docs. Whole group arrives in one pandas call -> deterministic.

    Rounding is half-AWAY-from-zero (floor(x*1e4+0.5)) to match SQL round()
    semantics — Python's built-in round() is half-even and diverges on ties.
    """
    import math

    w = (lang == "en") * 1.0 + 1.0
    v = float((n_chars * w).sum() / w.sum())
    return math.floor(v * 10000.0 + 0.5) / 10000.0


@pandas_udf("string")
def norm_md5(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER UDF (op 57): md5 of whitespace-normalized text; the
    iterator form amortizes per-batch setup."""
    for s in batches:
        yield s.map(
            lambda x: hashlib.md5(" ".join(x.split()).encode("utf-8")).hexdigest()
        )
