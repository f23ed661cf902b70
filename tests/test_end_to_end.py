"""Golden end-to-end: learn on the fixture corpus, extract on held-out
pages, evaluate P/R vs ground truth (target >= 0.95, BASELINE.json)."""

import pytest
from pyspark.sql import functions as F

from fact_extraction_spark.plans.evaluate import assert_no_leak, evaluate
from fact_extraction_spark.plans.pipeline import PipelineConfig, extract, learn

# full learn+extract integration: the slow half of the gate (pytest -m slow)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model_and_triples(spark, tables):
    # no article cap; sort_output exercises the presentation-layer ordering
    # (off by default so the scale hot path has no global sort Exchange)
    cfg = PipelineConfig(articles_limit=0, sort_output=True)
    model = learn(spark, tables["pages"], tables["facts"], tables["types"],
                  tables["redirects"], cfg,
                  exclude_subjects=tables["ground_truth"])
    triples = extract(spark, tables["pages"], model, tables["types"],
                      tables["redirects"], cfg).cache()
    return model, triples


def test_no_training_leak(spark, tables, model_and_triples):
    model, _ = model_and_triples
    assert_no_leak(model.training_subjects, tables["ground_truth"])


def test_precision_recall_above_target(spark, tables, model_and_triples):
    _, triples = model_and_triples
    metrics = evaluate(triples, tables["ground_truth"])
    rows = metrics.collect()
    assert rows, "no relations evaluated"
    total_right = sum(r["right"] for r in rows)
    total_wrong = sum(r["wrong"] for r in rows)
    total_known = sum(r["known"] for r in rows)
    precision = total_right / max(1, total_right + total_wrong)
    recall = total_right / max(1, total_known)
    print({r["pred"]: (r["precision"], r["recall"]) for r in rows})
    assert precision >= 0.95, f"precision {precision} < 0.95"
    assert recall >= 0.95, f"recall {recall} < 0.95"


def test_extraction_is_score_ordered_with_evidence(model_and_triples):
    _, triples = model_and_triples
    rows = triples.collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["url"] and r["sent_id"] is not None for r in rows)


def test_known_fact_subtraction(spark, tables, model_and_triples):
    model, triples = model_and_triples
    cfg = PipelineConfig(articles_limit=0)
    new_only = extract(spark, tables["pages"], model, tables["types"],
                       tables["redirects"], cfg,
                       known_facts=tables["facts"])
    # every surviving triple is absent from the known set
    overlap = new_only.join(tables["facts"], ["subj", "pred", "obj"]).count()
    assert overlap == 0
    assert new_only.count() <= triples.count()


def test_discovery_cap_is_distributed_topk(spark, tables, model_and_triples):
    """articles_limit plans as TakeOrderedAndProject (distributed top-k),
    never a row_number over an unpartitioned window, and keeps exactly the
    lexicographically-first urls."""
    from fact_extraction_spark.plans.pipeline import select_discovery_pages

    model, _ = model_and_triples
    capped = select_discovery_pages(
        tables["pages"], model, tables["types"], PipelineConfig(articles_limit=5))
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # no global row_number window over the discovery urls (the model lineage
    # legitimately contains small-dim windows from cap_training_facts)
    assert "windowspecdefinition(url" not in plan

    uncapped = select_discovery_pages(
        tables["pages"], model, tables["types"], PipelineConfig(articles_limit=0))
    expected = sorted(r["url"]
                      for r in uncapped.select("url").distinct().collect())[:5]
    got = sorted(r["url"] for r in capped.select("url").distinct().collect())
    assert got == expected


def test_discovery_excluded_cache_keyed_per_types_table(
        spark, tables, model_and_triples):
    """Two DIFFERENT types tables through one model must each get a fresh
    discovery-excluded set (ADVICE r5: an id()-keyed cache could serve a
    stale set after id reuse). The cache pins the keying DataFrame and
    identity-checks it, so (a) results reflect the table actually passed,
    (b) both entries coexist, (c) the pinned object matches the key."""
    from fact_extraction_spark.plans.pipeline import select_discovery_pages

    model, _ = model_and_triples
    cfg = PipelineConfig(articles_limit=0)

    kept_real = select_discovery_pages(
        tables["pages"], model, tables["types"], cfg)
    n_real = kept_real.count()

    # an empty types table: nothing is typed-but-gate-failing, so only
    # training subjects are excluded -> strictly more pages kept than with
    # the real table (which excludes wrong-typed entities too)
    empty_types = tables["types"].limit(0)
    kept_empty = select_discovery_pages(
        tables["pages"], model, empty_types, cfg)
    n_empty = kept_empty.count()
    assert n_empty >= n_real

    keys = [k for k in model.extras
            if isinstance(k, tuple) and k[0] == "discovery_excluded"]
    assert len(keys) >= 2, "each types table gets its own cache entry"
    for k in keys:
        entry = model.extras[k]
        assert len(entry) == 3 and id(entry[2]) == k[1], \
            "cached tuple pins the keying types DataFrame"

    # repeat call with the real table must reuse its entry, not rebuild
    n_entries_before = len(model.extras)
    again = select_discovery_pages(tables["pages"], model, tables["types"], cfg)
    assert again.count() == n_real
    assert len(model.extras) == n_entries_before


def test_scoring_int_url_equivalence(spark, tables, model_and_triples):
    """scoring_int_url=True (SLIM_KEY_INT: url hash-encoded through the
    scoring persist, strings re-attached post-threshold) must be
    row-identical to the default string-keyed path — same triples, same
    scores, same evidence columns."""
    model, base = model_and_triples
    cfg = PipelineConfig(articles_limit=0, scoring_int_url=True)
    got = extract(spark, tables["pages"], model, tables["types"],
                  tables["redirects"], cfg)

    def rows(df):
        return {(r["subj"], r["pred"], r["obj"], round(r["score"], 9),
                 r["url"], r["sent_id"], round(r["rel_pos"], 9))
                for r in df.collect()}

    got_rows = rows(got)
    assert got_rows and got_rows == rows(base)


def test_redirect_alias_objects_resolved(model_and_triples, tables):
    _, triples = model_and_triples
    objs = {r["obj"] for r in triples.select("obj").distinct().collect()}
    # objects linked via the alias must be emitted under the canonical name
    assert "Veldt_Haven" not in objs
