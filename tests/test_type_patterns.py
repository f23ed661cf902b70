"""Type-pattern learning vs hand-computed probabilities."""

import pytest

from fact_extraction_spark.operators.type_patterns import learn_type_patterns


@pytest.fixture(scope="module")
def tiny(spark):
    facts = spark.createDataFrame(
        [("A", "born", "X"), ("B", "born", "Y"), ("C", "works", "X")],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [("A", "Person"), ("B", "Person"), ("C", "Org"),
         ("X", "City"), ("Y", "City")],
        "entity string, type string")
    return facts, types


def test_probabilities_cross_relation_normalized(spark, tiny):
    facts, types = tiny
    probs, stats = learn_type_patterns(facts, types,
                                       subject_minimum=0, object_minimum=0)
    p = {(r["pred"], r["side"], r["type"]): r["probability"]
         for r in probs.collect()}
    # subject side: Person appears only with born -> P=1; Org only works -> 1
    assert p[("born", "subject", "Person")] == pytest.approx(1.0)
    assert p[("works", "subject", "Org")] == pytest.approx(1.0)
    # object side City: born freq 2/2=1, works freq 1/1=1 -> each P=0.5
    assert p[("born", "object", "City")] == pytest.approx(0.5)
    assert p[("works", "object", "City")] == pytest.approx(0.5)

    s = {r["pred"]: r for r in stats.collect()}
    assert s["born"]["facts"] == 2 and s["works"]["facts"] == 1
    assert s["born"]["subject_weighted_probability"] == pytest.approx(1.0)
    assert s["born"]["object_weighted_probability"] == pytest.approx(0.5)
    assert s["works"]["object_weighted_probability"] == pytest.approx(0.5)


def test_fractional_minimum_cleans_rare_types(spark):
    # 10 facts for rel r; type Rare appears once -> dropped at minimum=0.2
    facts = spark.createDataFrame(
        [(f"S{i}", "r", f"O{i}") for i in range(10)],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [(f"S{i}", "Common") for i in range(10)] + [("S0", "Rare")],
        "entity string, type string")
    probs, _ = learn_type_patterns(facts, types,
                                   subject_minimum=0.2, object_minimum=0)
    kept = {r["type"] for r in probs.filter("side='subject'").collect()}
    assert kept == {"Common"}
