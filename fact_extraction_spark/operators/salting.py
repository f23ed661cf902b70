"""Skew handling: salted equi-joins for hot keys (mega-entities, hot aliases).

The north star mandates explicit skew handling ("salted joins and AQE
skew-split") for the joins whose key distribution follows the web's power
law — a country page is the object of millions of facts, a hot alias matches
in a large share of all sentences. AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) is the runtime
backstop; ``salted_join`` is the explicit, planner-independent fix for joins
we *know* are skewed.

Mechanics (SURVEY.md §4 item 1): the fact (large, skewed) side gets a
deterministic salt in ``[0, buckets)``; the dimension side is exploded
``buckets`` ways so every (key, salt) pair finds its dimension row; the join
key becomes ``(key, salt)``, spreading each hot key over ``buckets`` tasks.
Cost: dimension side is replicated ``buckets``× — use for medium dims that
are too big to broadcast but far smaller than the fact side.

``hot_keys`` finds the keys worth salting (frequency above a threshold), for
the split-join pattern: salt only rows with hot keys, plain-join the rest,
union. ``skew_split_join`` packages that pattern.

The reference has no analogue — it never joins; its dict probes are all
driver-memory (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16
_SALT = "__salt"


def _with_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Deterministic row salt: hash of all columns (stable across retries —
    no ``rand()``, which would break task re-execution idempotency)."""
    return df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                      F.lit(buckets)).cast("int"))


def _explode_salt(df: DataFrame, buckets: int) -> DataFrame:
    return df.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))


def salted_join(
    large: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Equi-join ``large ⋈ dim`` on ``on`` with the large side salted and the
    dim side replicated ``buckets`` ways. Semantically identical to
    ``large.join(dim, on, how)`` for how in (inner, left, left_semi,
    left_anti); hot join keys are spread over ``buckets`` tasks."""
    salted_large = _with_salt(large, buckets)
    salted_dim = _explode_salt(dim, buckets)
    out = salted_large.join(salted_dim, on + [_SALT], how)
    return out.drop(_SALT)


def hot_keys(df: DataFrame, on: list[str], min_count: int) -> DataFrame:
    """Keys occurring at least ``min_count`` times — the salting candidates.
    One aggregation over the fact table; at scale, run on a sample or reuse
    a prior count."""
    return (df.groupBy(*on).agg(F.count("*").alias("_cnt"))
            .filter(F.col("_cnt") >= min_count).drop("_cnt"))


def skew_split_join(
    large: DataFrame,
    dim: DataFrame,
    on: list[str],
    hot: DataFrame,
    how: str = "inner",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Split-union join: rows whose key is in ``hot`` take the salted path,
    the long tail takes the plain shuffle join. ``hot`` is small (broadcast).

    This keeps dimension replication confined to the hot keys — the right
    trade at 10^12 documents where the dim side is itself large.
    """
    hot_b = F.broadcast(hot.select(*on).distinct())
    large_hot = large.join(hot_b, on, "left_semi")
    large_cold = large.join(hot_b, on, "left_anti")
    dim_hot = dim.join(hot_b, on, "left_semi")

    hot_joined = salted_join(large_hot, dim_hot, on, how, buckets)
    cold_joined = large_cold.join(dim, on, how)
    return hot_joined.unionByName(cold_joined)
