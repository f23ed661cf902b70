"""NT scan/sink semantics + URI column functions."""

from fact_extraction_spark.functions.uri import (
    capitalize_first, strip_cleaned_name, strip_name, to_wiki_href)
from fact_extraction_spark.sources.nt import nt_lines, read_nt
from pyspark.sql import functions as F


def test_nt_roundtrip_with_drop_semantics(spark, tmp_path):
    path = str(tmp_path / "facts.nt")
    lines = [
        "<http://dbpedia.org/resource/Alice> <http://dbpedia.org/ontology/birthPlace> <http://dbpedia.org/resource/Oslo> .",
        "malformed line without uris",
        "<a> <b> .",  # only two groups -> dropped
        "<http://dbpedia.org/resource/Bad__Thing> <p> <o> .",  # __ subject -> dropped
        "<s2> <p2> <o2> .",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    df = read_nt(spark, path)
    rows = {tuple(r) for r in df.collect()}
    assert rows == {
        ("http://dbpedia.org/resource/Alice",
         "http://dbpedia.org/ontology/birthPlace",
         "http://dbpedia.org/resource/Oslo"),
        ("s2", "p2", "o2"),
    }
    out = {r["value"] for r in nt_lines(df).collect()}
    assert "<s2> <p2> <o2> ." in out


def test_uri_functions(spark):
    df = spark.createDataFrame(
        [("http://dbpedia.org/resource/Alain_Connes",), ("plainName",),
         ("http://x/y/angela_merkel",)],
        "uri string")
    got = df.select(
        strip_name("uri").alias("n"),
        strip_cleaned_name("uri").alias("c"),
        to_wiki_href("uri").alias("h"),
        capitalize_first(strip_name("uri")).alias("cap"),
    ).collect()
    by_n = {r["n"]: r for r in got}
    assert by_n["Alain_Connes"]["c"] == "Alain Connes"
    assert by_n["Alain_Connes"]["h"] == "/wiki/Alain_Connes"
    assert by_n["angela_merkel"]["cap"] == "Angela_merkel"
    assert by_n["plainName"]["n"] == "plainName"
