"""Type-pair independence statistics (the reference's optional
``statistics/`` module, SURVEY.md §2.5 last row).

Relational reimplementation of
/root/reference/statistics/types_independence.py:
* the per-fact subject-type × object-type cross product (:115-116),
* observed vs expected pair counts under type independence and their
  deviation statistics (:179-218).

Semantics: for every fact ``(subj, pred, obj)``, every pair of
(subject type, object type) co-occurs once; under independence the expected
pair count for a relation is ``P(stype|pred) · P(otype|pred) · pairs(pred)``.
``lift = observed / expected`` measures how far a type pair deviates
(the reference's "specificity"); the per-relation relative variance of the
deviations summarizes how type-dependent a relation is.

All of it is two explodes + three groupBys — the reference's
O(|facts|·|types|²) Python loops become partial-aggregated shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def type_pair_counts(facts: DataFrame, types: DataFrame) -> DataFrame:
    """(pred, stype, otype, observed): per-relation co-occurrence counts of
    subject-type × object-type over all facts (types_independence.py:115-116).

    The two type joins are the corpus-side joins; ``types`` is entity-
    dimension sized and hot entities (mega-cities as objects) are exactly
    the AQE-skew-split / salting case (operators/salting.py).
    """
    st = types.select(F.col("entity").alias("subj"), F.col("type").alias("stype"))
    ot = types.select(F.col("entity").alias("obj"), F.col("type").alias("otype"))
    return (
        facts.select("subj", "pred", "obj")
        .join(st, "subj")
        .join(ot, "obj")
        .groupBy("pred", "stype", "otype")
        .agg(F.count("*").alias("observed"))
    )


def type_pair_independence(facts: DataFrame, types: DataFrame) -> DataFrame:
    """(pred, stype, otype, observed, expected, lift): observed pair counts
    vs the independence expectation (types_independence.py:179-200).
    ``expected = marg(stype) * marg(otype) / total_pairs`` per relation.
    """
    pairs = type_pair_counts(facts, types)
    s_marg = pairs.groupBy("pred", "stype").agg(F.sum("observed").alias("s_cnt"))
    o_marg = pairs.groupBy("pred", "otype").agg(F.sum("observed").alias("o_cnt"))
    total = pairs.groupBy("pred").agg(F.sum("observed").alias("total"))
    return (
        pairs.join(s_marg, ["pred", "stype"])
        .join(o_marg, ["pred", "otype"])
        .join(total, "pred")
        .withColumn("expected",
                    F.col("s_cnt") * F.col("o_cnt") / F.col("total"))
        .withColumn("lift", F.col("observed") / F.col("expected"))
        .select("pred", "stype", "otype", "observed",
                F.round("expected", 6).alias("expected"),
                F.round("lift", 6).alias("lift"))
    )


def relation_independence_summary(facts: DataFrame, types: DataFrame) -> DataFrame:
    """(pred, n_pairs, relative_variance): the per-relation deviation
    summary (types_independence.py:202-218) — mean squared relative
    deviation of observed from expected, weighted by expected."""
    ind = type_pair_independence(facts, types)
    dev = ((F.col("observed") - F.col("expected")) ** 2) / F.col("expected")
    return (
        ind.withColumn("dev", dev)
        .groupBy("pred")
        .agg(F.count("*").alias("n_pairs"),
             F.round(F.avg("dev"), 6).alias("relative_variance"))
    )
