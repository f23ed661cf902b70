"""Stage-1 byte-identity on Spark: the Arrow UDF must reproduce the frozen
function's output per url under any partitioning (BASELINE.json per-row
invariant)."""

from pyspark.sql import functions as F

from fact_extraction_spark.operators.extract_text import explode_sentences, extract_text


def test_stage1_byte_identity_per_url(spark, tables, corpus):
    pages = tables["pages"]
    out = extract_text(pages, lang=None).select("url", "text")
    got = {r["url"]: r["text"] for r in out.collect()}
    expected = {p["url"]: p["text"] for p in corpus.pages}
    assert got == expected  # byte-for-byte per url


def test_stage1_partitioning_invariance(spark, tables):
    pages = tables["pages"]
    a = extract_text(pages.repartition(1), lang=None).select("url", "text")
    b = extract_text(pages.repartition(13, "url"), lang=None).select("url", "text")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_lang_filter_applies(spark, tables, corpus):
    n_en = sum(1 for p in corpus.pages if p["lang"] == "en")
    assert extract_text(tables["pages"]).count() == n_en


def test_sentence_explosion_schema_and_anchor_rows(spark, tables):
    texts = extract_text(tables["pages"], lang=None)
    sents = explode_sentences(texts)
    assert set(sents.columns) == {
        "url", "sent_id", "paragraph_idx", "rel_pos", "sentence", "anchors"}
    sample = sents.filter(F.size("anchors") > 0).limit(5).collect()
    assert sample, "expected link-bearing sentences in fixture corpus"
    for r in sample:
        assert 0.0 <= r["rel_pos"] < 1.0
        assert r["anchors"][0]["href"].startswith("/wiki/")
