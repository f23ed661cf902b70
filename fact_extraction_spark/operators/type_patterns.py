"""Type-pattern learning: which entity types co-occur with each relation.

Relational reimplementation of the reference's type_learning stage:

* per-relation fact counts + per-entity predicate counts
  (/root/reference/type_learning/type_learner.py:41-78) → two groupBys + a
  join with the ``types`` table;
* count cleaning with absolute-or-fractional minimum
  (type_learning/type_pattern.py:20-34) → a filter against a per-relation
  scalar;
* cross-relation probability normalization P(rel|type) and the per-relation
  weighted probability (type_learning/type_cleaner.py:24-43) — the
  reference's O(|types|·|relations|²) nested loop collapses into ONE
  ``Window.partitionBy(side, type)`` sum.

Outputs
  type_probabilities(pred, side, type, type_count, probability)
  relation_type_stats(pred, facts, subject_weighted_probability,
                      object_weighted_probability)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _side_type_counts(facts: DataFrame, types: DataFrame, side_col: str) -> DataFrame:
    """relation × type counts for one fact side ('subj' or 'obj')."""
    entity_pred = facts.groupBy(
        F.col(side_col).alias("entity"), "pred"
    ).agg(F.count("*").alias("cnt"))
    return (
        entity_pred.join(types, "entity")
        .groupBy("pred", "type")
        .agg(F.sum("cnt").alias("type_count"))
    )


def learn_type_patterns(
    facts: DataFrame,
    types: DataFrame,
    subject_minimum: float = 0.05,
    object_minimum: float = 0.05,
) -> tuple[DataFrame, DataFrame]:
    """facts(subj,pred,obj) × types(entity,type) → (type_probabilities,
    relation_type_stats).

    ``*_minimum`` in (0,1) means a fraction of the relation's fact count,
    otherwise an absolute count (type_pattern.py:20-28 semantics).
    """
    rel_facts = facts.groupBy("pred").agg(F.count("*").alias("facts"))

    sides = []
    for side, col, minimum in (("subject", "subj", subject_minimum),
                               ("object", "obj", object_minimum)):
        counts = _side_type_counts(facts, types, col).join(rel_facts, "pred")
        if 0 < minimum < 1:
            threshold = F.col("facts") * F.lit(minimum)
        else:
            threshold = F.lit(minimum)
        counts = counts.filter(F.col("type_count") >= threshold)
        sides.append(counts.select(
            "pred", F.lit(side).alias("side"), "type", "type_count", "facts"))
    cleaned = sides[0].unionByName(sides[1])

    # P(rel | type) = (count/facts_rel) / Σ_rel' (count'/facts_rel')
    # — the cross-relation normalization, one window instead of O(R²) loops.
    freq = F.col("type_count") / F.col("facts")
    norm = F.sum(freq).over(Window.partitionBy("side", "type"))
    probs = cleaned.withColumn("probability", freq / norm)

    # weighted probability per (pred, side): Σ_type (count/total) · P
    side_total = F.sum("type_count").over(Window.partitionBy("pred", "side"))
    weighted = (
        probs.withColumn("w", F.col("type_count") / side_total * F.col("probability"))
        .groupBy("pred", "side")
        .agg(F.sum("w").alias("weighted_probability"))
    )
    stats = (
        rel_facts.join(
            weighted.groupBy("pred").pivot("side", ["subject", "object"])
            .agg(F.first("weighted_probability")),
            "pred", "left")
        .select(
            "pred", "facts",
            F.coalesce(F.col("subject"), F.lit(0.0)).alias("subject_weighted_probability"),
            F.coalesce(F.col("object"), F.lit(0.0)).alias("object_weighted_probability"),
        )
    )
    return probs.select("pred", "side", "type", "type_count", "probability"), stats
