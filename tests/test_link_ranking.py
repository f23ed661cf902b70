"""Stage 2b: tf-idf context-similarity candidate ranking (north star)."""

import pytest
from pyspark.sql import functions as F

from fact_extraction_spark.operators.link_ranking import (
    build_entity_profiles, compute_idf, mention_context_words, rank_candidates,
)

_MENTION_DDL = ("url string, sent_id int, rel_pos double, "
                "tokens array<string>, start int, end int, "
                "alias string, entity string")


def _mention(url, sent_id, tokens, start, end, entity, alias=None):
    return (url, sent_id, 0.0, tokens, start, end, alias or tokens[start], entity)


def test_context_words_exclude_the_mention_span(spark):
    m = spark.createDataFrame(
        [_mention("u1", 0, ["a", "b", "c", "d"], 1, 2, "E")], _MENTION_DDL)
    words = {r["word"] for r in mention_context_words(m).collect()}
    assert words == {"a", "d"}


def test_tfidf_ranking_prefers_contextually_similar_entity(spark):
    # trusted (anchor) mentions define the two profiles
    trusted = spark.createDataFrame([
        _mention("p1", 0, ["the", "capital", "of", "france", "is", "paris"],
                 5, 5, "Paris_city"),
        _mention("p1", 1, ["the", "capital", "has", "france", "and", "paris"],
                 5, 5, "Paris_city"),
        _mention("p2", 0, ["paris", "was", "a", "prince", "of", "troy"],
                 0, 0, "Paris_myth"),
    ], _MENTION_DDL)
    profiles = build_entity_profiles(trusted)
    idf = compute_idf(profiles)

    # ambiguous mention: context talks about capitals and france
    cands = spark.createDataFrame([
        _mention("d1", 0, ["paris", "has", "a", "capital", "in", "france"],
                 0, 0, "Paris_city", alias="paris"),
        _mention("d1", 0, ["paris", "has", "a", "capital", "in", "france"],
                 0, 0, "Paris_myth", alias="paris"),
    ], _MENTION_DDL)
    best = rank_candidates(cands, profiles, idf, top_k=1).collect()
    assert len(best) == 1
    assert best[0]["entity"] == "Paris_city"
    assert best[0]["link_score"] > 0


def test_every_span_keeps_a_candidate_even_without_overlap(spark):
    trusted = spark.createDataFrame([
        _mention("p1", 0, ["alpha", "beta", "gamma"], 0, 0, "A"),
    ], _MENTION_DDL)
    profiles = build_entity_profiles(trusted)
    idf = compute_idf(profiles)
    cands = spark.createDataFrame([
        _mention("d1", 0, ["zz", "qq", "ww"], 0, 0, "A", alias="zz"),
        _mention("d1", 0, ["zz", "qq", "ww"], 0, 0, "B", alias="zz"),
    ], _MENTION_DDL)
    best = rank_candidates(cands, profiles, idf, top_k=1).collect()
    assert len(best) == 1  # deterministic tie-break on entity name
    assert best[0]["entity"] == "A"
    assert best[0]["link_score"] == 0.0


def test_profile_word_cap_bounds_hot_entities(spark):
    rows = [_mention("p", i, ["w%02d" % i, "x", "hub"], 2, 2, "Hub")
            for i in range(40)]
    trusted = spark.createDataFrame(rows, _MENTION_DDL)
    profiles = build_entity_profiles(trusted, max_profile_words=5)
    assert profiles.filter(F.col("entity") == "Hub").count() == 5


def test_pipeline_ambiguity_split_ranks_only_ambiguous(spark):
    """The dictionary pipeline's ambiguity split (pipeline._build_dict_ctx /
    _page_mentions): hits on an ambiguous alias still go through tf-idf
    ranking and land on the contextually right entity; hits on unambiguous
    aliases pass through the ranking bypass unchanged."""
    from fact_extraction_spark.operators.mentions import collect_redirect_map
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, _build_dict_ctx, _page_mentions)

    def page(title, body):
        return (f"https://en.wikipedia.org/wiki/{title}",
                body.encode(), "en")

    pages = spark.createDataFrame([
        page("France_Guide",
             "The [[Paris city|paris]] is the capital of france today .\n\n"
             "Tail paragraph here."),
        page("Troy_Guide",
             "In myth [[Paris myth|paris]] was a prince of troy .\n\n"
             "Tail paragraph here."),
        page("Notes",
             "Many visit paris for the capital of france .\n\n"
             "Tail paragraph here."),
        page("Lyon_Notes",
             "Some prefer lyon instead .\n\nTail paragraph here."),
    ], "url string, html binary, lang string")
    redirects = spark.createDataFrame(
        [("paris", "Paris_city"), ("paris", "Paris_myth"),
         ("lyon", "Lyon_city")],
        "alias string, target string")

    # scan_unanchored: the Notes/Lyon pages carry no anchor links at all
    # (Common-Crawl shape) — the keeps-a-link filter would drop them
    cfg = PipelineConfig(mention_mode="dictionary",
                         dictionary_strategy="broadcast",
                         dictionary_scan_unanchored=True)
    ctx = _build_dict_ctx(spark, pages, redirects, cfg)
    # only the two-target alias is marked ambiguous
    assert {r["alias"] for r in ctx["ambiguous"].collect()} == {"paris"}

    rmap = collect_redirect_map(spark, redirects)
    mentions = _page_mentions(pages, rmap, "en", ctx, cfg)
    notes = {r["entity"] for r in mentions.filter(
        F.col("url").endswith("/Notes")).collect()}
    assert "Paris_city" in notes          # tf-idf picked the capital sense
    assert "Paris_myth" not in notes
    lyon = {r["entity"] for r in mentions.filter(
        F.col("url").endswith("/Lyon_Notes")).collect()}
    assert "Lyon_city" in lyon            # unambiguous bypass


def test_ambiguity_is_keyed_on_tokenized_match_key(spark):
    """Two DISTINCT alias strings that tokenize identically ("new york" vs
    "new york " with a trailing space), each mapping to a single different
    entity, collide on the same mention span (the automaton keys tokenized
    aliases). Keying
    ambiguity on the raw alias string would class both as unambiguous and
    emit TWO entities for one span; keying on the tokenized match key routes
    both through ranking, whose per-span top-1 keeps exactly one."""
    from fact_extraction_spark.operators.mentions import collect_redirect_map
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, _build_dict_ctx, _page_mentions)

    pages = spark.createDataFrame([
        ("https://en.wikipedia.org/wiki/Notes",
         b"People love new york greatly .\n\nTail paragraph here.",
         "en"),
    ], "url string, html binary, lang string")
    redirects = spark.createDataFrame(
        [("new york", "Entity_A"), ("new york ", "Entity_B")],
        "alias string, target string")

    cfg = PipelineConfig(mention_mode="dictionary",
                         dictionary_strategy="broadcast",
                         dictionary_scan_unanchored=True)
    ctx = _build_dict_ctx(spark, pages, redirects, cfg)
    # both alias strings share the token key -> both marked ambiguous
    amb = {r["alias"] for r in ctx["ambiguous"].collect()}
    assert amb == {"new york", "new york "}

    rmap = collect_redirect_map(spark, redirects)
    mentions = _page_mentions(pages, rmap, "en", ctx, cfg)
    rows = mentions.filter(F.col("url").endswith("/Notes")).collect()
    spans = {}
    for r in rows:
        spans.setdefault((r["sent_id"], r["start"], r["end"]), set()) \
            .add(r["entity"])
    # exactly one entity survives per span
    assert spans, "the span must be detected at all"
    for ents in spans.values():
        assert len(ents) == 1


@pytest.mark.slow
@pytest.mark.slowest
def test_unanchored_dictionary_recovers_anchored_triples(spark):
    """Common-Crawl shape, end to end: learn from the anchored fixture
    corpus, strip EVERY [[..]] anchor from the pages, and extract in
    dictionary mode with dictionary_scan_unanchored=True. The AC dictionary
    alone must recover exactly the anchored extract's triple set (different
    seed than the driver oracle so both corpus instances are covered)."""
    from fact_extraction_spark.fixtures import (
        corpus_to_dataframes, generate_corpus)
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, extract, learn)

    fx = generate_corpus(seed=7, n_persons=25)
    t = corpus_to_dataframes(spark, fx, partitions=4)
    cfg = PipelineConfig(articles_limit=0)
    model = learn(spark, t["pages"], t["facts"], t["types"], t["redirects"],
                  cfg, exclude_subjects=t["ground_truth"])
    anchored = extract(spark, t["pages"], model, t["types"], t["redirects"],
                       cfg)
    anchored_set = {(r["subj"], r["pred"], r["obj"])
                    for r in anchored.select("subj", "pred", "obj").collect()}

    stripped = t["pages"].withColumn(
        "html", F.encode(
            F.regexp_replace(
                F.regexp_replace(F.decode("html", "utf-8"),
                                 r"\[\[([^|\]]*)\|([^\]]*)\]\]", "$2"),
                r"\[\[([^\]]*)\]\]", "$1"),
            "utf-8"))
    # sanity: the strip is non-vacuous
    n_anchored_pages = t["pages"].filter(
        F.decode("html", "utf-8").contains("[[")).count()
    assert n_anchored_pages > 0
    assert stripped.filter(
        F.decode("html", "utf-8").contains("[[")).count() == 0

    cfg2 = PipelineConfig(articles_limit=0, mention_mode="dictionary",
                          dictionary_strategy="broadcast",
                          dictionary_scan_unanchored=True)
    unanch = extract(spark, stripped, model, t["types"], t["redirects"], cfg2)
    unanch_set = {(r["subj"], r["pred"], r["obj"])
                  for r in unanch.select("subj", "pred", "obj").collect()}
    assert anchored_set, "anchored extract must be non-empty"
    assert unanch_set == anchored_set


@pytest.mark.slow
@pytest.mark.slowest
def test_dictionary_mode_end_to_end_parity(spark, tables):
    """North-star stage 2 (AC dictionary + tf-idf disambiguation) reaches the
    same P/R bar as anchor-parity mode on the fixture corpus."""
    from fact_extraction_spark.plans.evaluate import evaluate
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, extract, learn)

    # pin mapside so the default at-scale strategy stays covered end-to-end
    # (the "auto" default would pick broadcast at fixture dictionary size)
    cfg = PipelineConfig(articles_limit=0, mention_mode="dictionary",
                         dictionary_strategy="mapside")
    model = learn(spark, tables["pages"], tables["facts"], tables["types"],
                  tables["redirects"], cfg,
                  exclude_subjects=tables["ground_truth"])
    triples = extract(spark, tables["pages"], model, tables["types"],
                      tables["redirects"], cfg)
    rows = evaluate(triples, tables["ground_truth"]).collect()
    total_right = sum(r["right"] for r in rows)
    total_wrong = sum(r["wrong"] for r in rows)
    total_known = sum(r["known"] for r in rows)
    precision = total_right / max(1, total_right + total_wrong)
    recall = total_right / max(1, total_known)
    assert precision >= 0.9, f"dictionary-mode precision {precision}"
    assert recall >= 0.9, f"dictionary-mode recall {recall}"
