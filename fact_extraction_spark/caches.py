"""Pipeline cache registry.

Persisted DataFrames created deep inside plans/operators (the windows
persist in ``plans.pipeline``, the map-side dictionary's sentence/tail
persists in ``operators.mentions``, the tf-idf entity profiles in
``plans.pipeline._page_mentions``) register here so callers — bench legs,
repeated learn/extract invocations in one session — can release executor
storage between runs without threading persist handles through every
return value. Un-released persists accumulate until storage eviction kicks
in under memory pressure, which is exactly the bench-contamination failure
mode VERDICT round 2 documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release."""
    _TRACKED.append(df)
    return df


def release() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.
    Safe to call with a stopped SparkContext (failures are swallowed —
    nothing to release then anyway)."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TRACKED.clear()
    return n
