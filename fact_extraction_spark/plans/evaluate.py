"""Ground-truth evaluation: per-relation precision / recall / F1.

Relational reimplementation of
/root/reference/pattern_testing/pattern_tester.py:72-111: left-join the
extracted triples against the ground truth, flag matches, aggregate.
Also provides the train/test leak check (:47-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate(extracted: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """(pred, right, wrong, known, precision, recall, f1).

    right = extracted ∩ truth; wrong = extracted \\ truth (over subjects the
    truth covers — facts about non-evaluated subjects are not penalized,
    matching the tester's per-subject scope); known = |truth|.
    """
    ex = extracted.select("subj", "pred", "obj").distinct()
    gt = ground_truth.select("subj", "pred", "obj").distinct()
    gt_subjects = gt.select("subj").distinct()
    scoped = ex.join(gt_subjects, "subj", "left_semi")

    flagged = scoped.join(gt.withColumn("_hit", F.lit(1)),
                          ["subj", "pred", "obj"], "left")
    per_pred = flagged.groupBy("pred").agg(
        F.sum(F.coalesce("_hit", F.lit(0))).alias("right"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("wrong"),
    )
    known = gt.groupBy("pred").agg(F.count("*").alias("known"))
    m = known.join(per_pred, "pred", "left").fillna({"right": 0, "wrong": 0})
    precision = F.when(F.col("right") + F.col("wrong") > 0,
                       F.col("right") / (F.col("right") + F.col("wrong")))
    recall = F.col("right") / F.col("known")
    f1 = F.when((precision + recall) > 0,
                2 * precision * recall / (precision + recall))
    return m.select("pred", "right", "wrong", "known",
                    precision.alias("precision"),
                    recall.alias("recall"),
                    f1.alias("f1"))


def assert_no_leak(training_subjects: DataFrame, ground_truth: DataFrame) -> None:
    """Train/test subject disjointness (pattern_tester.py:47-50)."""
    leaked = training_subjects.join(
        ground_truth.select("subj").distinct(), "subj", "inner").count()
    assert leaked == 0, f"{leaked} ground-truth subjects leaked into training"
