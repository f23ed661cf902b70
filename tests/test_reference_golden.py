"""Reference golden-article parity (the reference's own test data).

Part 1 ports the 8 golden article cases — including the 3 expected-empty
negatives — verbatim from /root/reference/pattern_testing/test_data.py:1-44
and feeds them through the engine's learn → mentions → score → threshold
path (pattern_test.py:21-34 semantics: per-article set-equality of emitted
triples) at the reference's config threshold
(config-default.ini: match_threshold = 0.5).

The reference ships no learned model (its pattern pickles are gitignored),
so the test first trains the engine on a deterministic mini-corpus whose
learned tables encode the same lexical/type knowledge the reference's
DBpedia/Wikipedia training produces for birthPlace and almaMater (plus a
third distractor relation so type probabilities are diluted realistically).
The parity claim verified here: given equivalent learned knowledge, the
engine's mentions→score→threshold machinery makes the reference's
documented accept/reject decision on every golden article.

Part 2 loads the reference's committed ground truth
(pattern_testing/ground_truth.ttl, 51 facts) and its committed extraction
output (results/extracted_facts.nt, 2250 facts) through the engine's NT
scan, and checks the evaluate() operator against an independently computed
(plain-Python) precision/recall over the same files — the pattern_tester.py
scoring semantics on the reference's own data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fact_extraction_spark.plans.evaluate import evaluate
from fact_extraction_spark.plans.pipeline import PipelineConfig, extract, learn
from fact_extraction_spark.sources.nt import read_nt

GROUND_TRUTH_TTL = "/root/reference/pattern_testing/ground_truth.ttl"
EXTRACTED_FACTS_NT = "/root/reference/results/extracted_facts.nt"

ONTOLOGY = "http://dbpedia.org/ontology/"
RESOURCE = "http://dbpedia.org/resource/"

# ---------------------------------------------------------------------------
# The 8 golden cases, verbatim from
# /root/reference/pattern_testing/test_data.py:1-44
# (html, resource, expected facts); 3 cases expect NO facts.
# ---------------------------------------------------------------------------
GOLDEN_CASES = [
    (
        'Merkel was educated in Templin and at the <a href="/wiki/Leipzig_University">University of Leipzig</a>, where she studied <a href="/wiki/Physics">physics</a> from 1973 to 1978.',
        'Angela_Merkel',
        [('Angela_Merkel', 'http://dbpedia.org/ontology/almaMater',
          'http://dbpedia.org/resource/Leipzig_University')]),
    (
        'Mark Zuckerberg was born in <a href="/wiki/White_Plains_(New_York)">White Plains</a>.',
        'Mark_Zuckerberg',
        [('Mark_Zuckerberg', 'http://dbpedia.org/ontology/birthPlace',
          'http://dbpedia.org/resource/White_Plains_(New_York)')]),
    (
        'While living in <a href="/wiki/Annapolis,_Maryland" title="Annapolis, Maryland">Annapolis</a> with her husband and their four children , Agnew served as the president of her local <a href="/wiki/Parent-Teacher_Association" title="Parent-Teacher Association">PTA</a> , and volunteered as both an assistant <a href="/wiki/Girl_Scouts_of_the_USA" title="Girl Scouts of the USA">Girl Scout</a> troop leader and a board member of the <a href="/wiki/Kiwanis" title="Kiwanis">Kiwanis</a> Club womens auxiliary .',
        'Judy_Agnew',
        []),
    (
        'He recently became a professor at the <a href="/wiki/Massachusetts_Institute_of_Technology">MIT</a>.',
        'Andrew_Wiles',
        [('Andrew_Wiles', 'http://dbpedia.org/ontology/almaMater',
          'http://dbpedia.org/resource/Massachusetts_Institute_of_Technology')]),
    (
        'Uriah Butler really loves <a href="/wiki/Pyrotechnics">pyrotechnics</a>.',
        'Tubal_Uriah_Butler',
        []),
    (
        'Irma Raush was born in <a href="/wiki/Saratov">Saratov</a> on 21 April 1938 into a Volga German family.',
        'Irma_Raush',
        [('Irma_Raush', 'http://dbpedia.org/ontology/birthPlace',
          'http://dbpedia.org/resource/Saratov')]),
    (
        'Born Elinor Isabel Judefind in <a href="/wiki/Baltimore">Baltimore, Maryland</a> , to parents of French-German descent , Agnew was daughter of William Lee Judefind , a <a href="/wiki/Chemist">chemist</a> , and his wife , the former Ruth Elinor Schafer . ',
        'Judy_Agnew',
        [('Judy_Agnew', 'http://dbpedia.org/ontology/birthPlace',
          'http://dbpedia.org/resource/Baltimore')]),
    (
        'Her paternal grandfather was a <a href="/wiki/Methodism">Methodist</a> minister .',
        'Judy_Agnew',
        []),
]


def _short(uri: str) -> str:
    """Full DBpedia URI → underscore name (how the engine keys entities)."""
    for prefix in (ONTOLOGY, RESOURCE):
        if uri.startswith(prefix):
            return uri[len(prefix):]
    return uri.rsplit("/", 1)[-1]


# ---------------------------------------------------------------------------
# Deterministic training mini-corpus.
#
# Template phrasing mirrors the Wikipedia phrasings the golden articles use
# ("was born in X", "Born N N N in X , to parents", "at the U, where",
# "became a professor at the U"), exactly as the reference's distant
# supervision learns them from real Wikipedia; names/cities vary per
# sentence so only the stable pattern words survive frequency cleaning
# (least_threshold_words = 2, config-default.ini pattern_cleaner).
# ---------------------------------------------------------------------------

_BP_CITIES = ["Hailbrook", "Marwick", "Fenholm", "Ostvale", "Quarring",
              "Drelline", "Sulmere", "Tamgate", "Norwold", "Kelbray",
              "Polgarth", "Zenholt"]
_AM_UNIS = ["University of Veldt", "University of Carden",
            "University of Istria Plains", "University of Morbay",
            "University of Tressle", "University of Ankerwood",
            "University of Quill", "University of Sarn",
            "University of Holmfirth", "University of Pellad",
            "University of Wrenmoor", "University of Jaspern"]
_EMP_COMPANIES = ["Tamgar Works", "Veldt Foundry", "Ostrand Mills",
                  "Quill Dynamics"]

_FIRST = ["Ada", "Boren", "Cilla", "Doran", "Elba", "Fenn", "Gerda", "Holt",
          "Ilsa", "Joren", "Kessa", "Lorn"]
_MID = ["Lee", "Rae", "Tov", "Sul", "Ann", "Oren", "Pell", "Ru",
        "Sten", "Tam", "Ulla", "Von"]
_LAST = ["Marwick", "Garton", "Drayer", "Quenwick", "Ostberg", "Fenwright",
         "Halloway", "Sulgrave", "Norfield", "Kelstead", "Polson", "Zenner"]


def _golden_training_rows():
    """(subject_title, wikitext_sentence, pred, obj_title) rows."""
    rows = []

    def link(title):
        return "[[" + title.replace("_", " ") + "]]"

    # birthPlace: 12 persons, 3 templates x 4 — learns
    #   was@-3 born@-2 in@-1 .@+1 | on@+1 the@+2 family@+3 farm@+4
    #   | to@+1 parents@+2 of@+3 humble@+4
    for i in range(12):
        first, mid, last = _FIRST[i], _MID[i], _LAST[i]
        city = _BP_CITIES[i]
        subj = f"{first}_{last}"
        if i % 3 == 0:
            sent = f"{first} {last} was born in {link(city)}."
        elif i % 3 == 1:
            sent = f"{first} {last} was born in {link(city)} on the family farm."
        else:
            sent = (f"Born {first} {mid} {last} in {link(city)} , "
                    "to parents of humble stock.")
        rows.append((subj, sent, "birthPlace", city))

    # almaMater: 12 persons, 2 templates x 6 — learns
    #   the@-1 at@-2 and@-3 ,@+1 where@+2 he@+3 studied@+4
    #   | professor@-3 a@-4 .@+1
    for i in range(12):
        first, last = _FIRST[i], _LAST[(i + 5) % 12]
        uni = _AM_UNIS[i]
        subj = f"{first}_{last}_Jr"
        if i % 2 == 0:
            sent = (f"{first} {last} was educated in Gorsby and at the "
                    f"{link(uni)}, where he studied.")
        else:
            sent = f"He recently became a professor at the {link(uni)}."
        rows.append((subj, sent, "almaMater", uni.replace(" ", "_")))

    # employer (distractor relation; dilutes P(rel | Person) to 1/3)
    for i in range(4):
        first, last = _FIRST[i], _LAST[(i + 7) % 12]
        co = _EMP_COMPANIES[i]
        subj = f"{first}_{last}_Sr"
        sent = f"{first} {last} worked for {link(co)} as an engineer."
        rows.append((subj, sent, "employer", co.replace(" ", "_")))
    return rows


def _url(title: str) -> str:
    return "https://en.wikipedia.org/wiki/" + title


@pytest.fixture(scope="module")
def golden_tables(spark):
    """pages / facts / types / redirects covering training + golden cases."""
    train = _golden_training_rows()

    pages, facts, types = [], [], []
    for subj, sent, pred, obj in train:
        pages.append((_url(subj), sent + "\n\n", "en"))
        facts.append((subj, pred, obj))
        types.append((subj, "Person"))

    for city in _BP_CITIES:
        types += [(city, "Settlement"), (city, "Location")]
    for uni in _AM_UNIS:
        t = uni.replace(" ", "_")
        types += [(t, "University"), (t, "Location")]
    for co in _EMP_COMPANIES:
        types.append((co.replace(" ", "_"), "Company"))

    # golden pages: each case is one single-paragraph page (the reference
    # feeds the snippet straight to extract_facts_from_html)
    for html, resource, _expected in GOLDEN_CASES:
        pages.append((_url(resource), html + "\n\n", "en"))

    # golden entity types: subjects are persons; place/university objects get
    # the same type families the training objects have; the negatives'
    # objects carry types outside every learned gate (organisations,
    # disciplines) — as in DBpedia, where PTA/Kiwanis/physics/Methodism are
    # not typed like birthPlace/almaMater objects.
    for person in ("Angela_Merkel", "Mark_Zuckerberg", "Judy_Agnew",
                   "Andrew_Wiles", "Tubal_Uriah_Butler", "Irma_Raush"):
        types.append((person, "Person"))
    for place in ("White_Plains_(New_York)", "Saratov", "Baltimore",
                  "Annapolis,_Maryland"):
        types += [(place, "Settlement"), (place, "Location")]
    for uni in ("Leipzig_University", "Massachusetts_Institute_of_Technology"):
        types += [(uni, "University"), (uni, "Location")]
    for other in ("Parent-Teacher_Association", "Girl_Scouts_of_the_USA",
                  "Kiwanis", "Chemist"):
        types.append((other, "Organisation"))
    for topic in ("Physics", "Pyrotechnics", "Methodism"):
        types.append((topic, "Discipline"))

    pages_df = spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8")), lang) for u, h, lang in pages],
        "url string, html binary, lang string",
    ).withColumn("warc_ts", F.current_timestamp()) \
     .withColumn("text", F.lit(None).cast("string"))
    facts_df = spark.createDataFrame(facts, "subj string, pred string, obj string")
    types_df = spark.createDataFrame(types, "entity string, type string")
    redirects_df = spark.createDataFrame([], "alias string, target string")
    return {"pages": pages_df, "facts": facts_df, "types": types_df,
            "redirects": redirects_df}


@pytest.fixture(scope="module")
def golden_extraction(spark, golden_tables):
    cfg = PipelineConfig(match_threshold=0.5,  # config-default.ini:28
                         articles_limit=0)
    golden_subjects = spark.createDataFrame(
        [(r,) for _, r, _ in GOLDEN_CASES], "subj string")
    model = learn(spark, golden_tables["pages"], golden_tables["facts"],
                  golden_tables["types"], golden_tables["redirects"], cfg,
                  exclude_subjects=golden_subjects)
    triples = extract(spark, golden_tables["pages"], model,
                      golden_tables["types"], golden_tables["redirects"], cfg)
    return {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}


def test_golden_articles_set_equality(golden_extraction):
    """pattern_test.py:6-17 compare_facts semantics: exact set equality of
    (subject, relation, object) across all 8 golden articles."""
    expected = {
        (s, _short(p), _short(o))
        for _, _, exp in GOLDEN_CASES
        for (s, p, o) in exp
    }
    assert golden_extraction == expected, (
        f"false positives: {sorted(golden_extraction - expected)}; "
        f"false negatives: {sorted(expected - golden_extraction)}")


def test_golden_negatives_stay_empty(golden_extraction):
    """The 3 expected-empty cases (test_data.py:13-16,22-25,36-39) must not
    leak facts: no triples for their anchor objects at all."""
    negative_objects = {"Annapolis,_Maryland", "Parent-Teacher_Association",
                        "Girl_Scouts_of_the_USA", "Kiwanis", "Pyrotechnics",
                        "Methodism", "Chemist", "Physics"}
    leaked = {t for t in golden_extraction if t[2] in negative_objects}
    assert not leaked, f"negative-case objects extracted: {sorted(leaked)}"


def test_golden_per_subject_decisions(golden_extraction):
    """Per-article accept/reject matches the reference's documented outcome."""
    by_subject = {}
    for s, p, o in golden_extraction:
        by_subject.setdefault(s, set()).add((p, o))
    assert by_subject.get("Angela_Merkel") == {("almaMater", "Leipzig_University")}
    assert by_subject.get("Mark_Zuckerberg") == {("birthPlace", "White_Plains_(New_York)")}
    assert by_subject.get("Andrew_Wiles") == {("almaMater", "Massachusetts_Institute_of_Technology")}
    assert by_subject.get("Irma_Raush") == {("birthPlace", "Saratov")}
    assert by_subject.get("Judy_Agnew") == {("birthPlace", "Baltimore")}
    assert "Tubal_Uriah_Butler" not in by_subject


# ---------------------------------------------------------------------------
# Part 2: the reference's committed ground truth + extraction output through
# the engine's NT scan and evaluate().
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_files(spark):
    gt = read_nt(spark, GROUND_TRUTH_TTL).cache()
    ex = read_nt(spark, EXTRACTED_FACTS_NT).cache()
    return gt, ex


def test_reference_files_parse(reference_files):
    gt, ex = reference_files
    # 52 facts (the file's last line has no trailing newline, so `wc -l`
    # reports 51); every line is well-formed
    assert gt.count() == 52
    assert ex.count() == 2250     # every committed extracted fact parses
    preds = {r["pred"] for r in gt.select("pred").distinct().collect()}
    assert preds == {ONTOLOGY + "almaMater", ONTOLOGY + "birthPlace",
                     ONTOLOGY + "spouse"}


def test_evaluate_matches_reference_scoring_on_reference_data(reference_files):
    """evaluate() must reproduce pattern_tester.py:98-102 P/R counting on the
    reference's own files, checked against an independent plain-Python
    computation (per-subject scope: only facts about ground-truth subjects
    count as wrong, pattern_tester.py:72-81)."""
    gt_df, ex_df = reference_files
    gt = {(r["subj"], r["pred"], r["obj"]) for r in gt_df.collect()}
    ex = {(r["subj"], r["pred"], r["obj"]) for r in ex_df.collect()}

    gt_subjects = {s for s, _, _ in gt}
    scoped = {t for t in ex if t[0] in gt_subjects}
    expected = {}
    for pred in {p for _, p, _ in gt}:
        known = sum(1 for t in gt if t[1] == pred)
        right = sum(1 for t in scoped if t[1] == pred and t in gt)
        wrong = sum(1 for t in scoped if t[1] == pred and t not in gt)
        expected[pred] = (right, wrong, known)

    rows = evaluate(ex_df, gt_df).collect()
    got = {r["pred"]: (r["right"], r["wrong"], r["known"]) for r in rows}
    assert got == expected

    # The two committed files share NO subjects (the extraction run and the
    # golden ground truth cover disjoint resources), so every relation has
    # right=0, wrong=0 → precision must be None, matching the reference's
    # _soft_division ZeroDivisionError → None (pattern_tester.py:91-95),
    # and recall must be 0.
    assert all(v == (0, 0, v[2]) for v in expected.values())
    for r in rows:
        assert r["precision"] is None
        assert r["recall"] == 0.0
