"""Setup ETL: raw .ttl dumps → types/redirects tables
(reference data_cleaning/nt_cleaner.py:20-59 semantics)."""

import json
import os

import pytest

from fact_extraction_spark.sources.setup_etl import (
    REDIRECT_RELATION, SUBCLASS_RELATION, TYPE_RELATION,
    build_redirects_table, build_type_inheritance_table, build_types_table,
    validate_complete)
from fact_extraction_spark.sources.nt import read_nt

R = "http://dbpedia.org/resource/"
Y = "http://dbpedia.org/class/yago/"
OWL = "http://www.w3.org/2002/07/owl#Thing"


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture()
def types_ttl(tmp_path):
    return _write(tmp_path, "instance_types.ttl", [
        f"<{R}Alain_Connes> <{TYPE_RELATION}> <{Y}WikicatFrenchMathematicians> .",
        f"<{R}Alain_Connes> <{TYPE_RELATION}> <{OWL}> .",
        f"<{R}Alain_Connes> <{TYPE_RELATION}> <{Y}YagoLegalActor> .",
        f"<{R}Berlin> <{TYPE_RELATION}> <http://dbpedia.org/ontology/City> .",
        f"<{R}x__internal> <{TYPE_RELATION}> <{Y}WikicatThings> .",  # __ drop
        "malformed line without uris",                               # drop
    ])


def test_types_table_abbreviation_and_drops(spark, types_ttl):
    rows = {(r["entity"], r["type"])
            for r in build_types_table(spark, types_ttl).collect()}
    assert rows == {
        # Wikicat → W, on the URI before name stripping (nt_cleaner.py:33)
        ("Alain_Connes", "WFrenchMathematicians"),
        # owl# → owl merges the fragment into the last path segment
        ("Alain_Connes", "owlThing"),
        # Yago → Y (case-sensitive: the lowercase /yago/ path is untouched)
        ("Alain_Connes", "YLegalActor"),
        ("Berlin", "City"),
    }


def test_types_table_unions_multiple_dumps(spark, tmp_path, types_ttl):
    extra = _write(tmp_path, "yago_types.ttl", [
        f"<{R}Berlin> <{TYPE_RELATION}> <{Y}YagoGeoEntity> .",
        # duplicate of a row in the first dump → deduped
        f"<{R}Berlin> <{TYPE_RELATION}> <http://dbpedia.org/ontology/City> .",
    ])
    df = build_types_table(spark, types_ttl, extra)
    assert df.count() == 5
    assert df.filter("entity = 'Berlin'").count() == 2


def test_assert_complete_contract(spark, tmp_path, types_ttl):
    mixed = _write(tmp_path, "mixed.ttl", [
        f"<{R}A> <{TYPE_RELATION}> <{Y}WikicatThings> .",
        f"<{R}A> <{REDIRECT_RELATION}> <{R}B> .",
    ])
    with pytest.raises(ValueError, match="non-whitelisted"):
        build_types_table(spark, mixed, assert_complete=True)
    # nt_cleaner.py assert_complete=False path: foreign predicates skipped
    assert build_types_table(spark, mixed, assert_complete=False).count() == 1
    validate_complete(read_nt(spark, types_ttl), [TYPE_RELATION])


def test_redirects_table(spark, tmp_path):
    ttl = _write(tmp_path, "redirects.ttl", [
        f"<{R}Veldt_Haven> <{REDIRECT_RELATION}> <{R}Veldt_Harbor> .",
        f"<{R}Old_Veldt> <{REDIRECT_RELATION}> <{R}Veldt_Haven> .",
    ])
    rows = {(r["alias"], r["target"])
            for r in build_redirects_table(spark, ttl).collect()}
    assert rows == {("Veldt_Haven", "Veldt_Harbor"),
                    ("Old_Veldt", "Veldt_Haven")}


def test_inheritance_table_filters_foreign_predicates(spark, tmp_path):
    ttl = _write(tmp_path, "ontology.ttl", [
        f"<http://dbpedia.org/ontology/City> <{SUBCLASS_RELATION}> "
        "<http://dbpedia.org/ontology/Settlement> .",
        f"<http://dbpedia.org/ontology/City> <http://www.w3.org/2000/01/"
        f"rdf-schema#label> <ignored> .",
    ])
    rows = build_type_inheritance_table(spark, ttl).collect()
    assert [(r["type"], r["supertype"]) for r in rows] == [
        ("City", "Settlement")]


def test_setup_etl_job_end_to_end(spark, tmp_path, types_ttl):
    """jobs/setup_etl.py CLI: raw dumps in, pipeline input tables out."""
    import jobs.setup_etl as job

    redirects_ttl = _write(tmp_path, "redirects.ttl", [
        f"<{R}Veldt_Haven> <{REDIRECT_RELATION}> <{R}Veldt_Harbor> .",
    ])
    out = str(tmp_path / "kb")
    rc = job.main(["--instance-types", types_ttl,
                   "--redirects", redirects_ttl, "--out", out])
    assert rc == 0
    types = spark.read.parquet(os.path.join(out, "types.parquet"))
    redirects = spark.read.parquet(os.path.join(out, "redirects.parquet"))
    assert types.count() == 4
    assert redirects.count() == 1
    assert set(types.columns) == {"entity", "type"}
    assert set(redirects.columns) == {"alias", "target"}


def test_nt_clean_types_oracle_parity(spark):
    """The nt_clean_types entry query matches its DuckDB oracle by value."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {(r["entity"], r["type"])
           for r in entry.q_nt_clean_types(spark, sf).collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW nation AS SELECT * FROM "
                f"read_parquet('{sf}/nation.parquet')")
    exp = {tuple(t) for t in
           con.execute(entry.oracle_sql()["nt_clean_types"]).fetchall()}
    assert got == exp and len(got) == 75
