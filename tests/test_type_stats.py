"""Type-pair independence statistics (reference statistics/ module)."""

from fact_extraction_spark.operators.type_stats import (
    relation_independence_summary, type_pair_counts, type_pair_independence,
)


def _fixture(spark):
    facts = spark.createDataFrame(
        [("A", "p", "X"), ("B", "p", "X"), ("A", "p", "Y")],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [("A", "t1"), ("B", "t1"), ("B", "t2"), ("X", "o1"), ("Y", "o2")],
        "entity string, type string")
    return facts, types


def test_type_pair_counts_cross_product(spark):
    facts, types = _fixture(spark)
    got = {(r["stype"], r["otype"]): r["observed"]
           for r in type_pair_counts(facts, types).collect()}
    assert got == {("t1", "o1"): 2, ("t2", "o1"): 1, ("t1", "o2"): 1}


def test_independence_expected_and_lift(spark):
    facts, types = _fixture(spark)
    got = {(r["stype"], r["otype"]): (r["expected"], r["lift"])
           for r in type_pair_independence(facts, types).collect()}
    # marginals: t1=3, t2=1, o1=3, o2=1, total=4
    assert got[("t1", "o1")] == (2.25, round(2 / 2.25, 6))
    assert got[("t2", "o1")] == (0.75, round(1 / 0.75, 6))
    assert got[("t1", "o2")] == (0.75, round(1 / 0.75, 6))


def test_relation_summary(spark):
    facts, types = _fixture(spark)
    row = relation_independence_summary(facts, types).first()
    assert row["pred"] == "p" and row["n_pairs"] == 3
    expected_var = ((2 - 2.25) ** 2 / 2.25
                    + (1 - 0.75) ** 2 / 0.75
                    + (1 - 0.75) ** 2 / 0.75) / 3
    assert abs(row["relative_variance"] - expected_var) < 1e-6
