"""Setup ETL: raw DBpedia ``.ttl``/``.nt`` dumps → the pipeline's input tables.

Relational reimplementation of the reference's corpus-prep pass
(/root/reference/data_cleaning/nt_cleaner.py:20-59, driven by
setup/setup.sh + setup_ontology_and_redirects.sh):

* predicate filter (``rdf-syntax-ns#type`` for types,
  ``dbo:wikiPageRedirects`` for redirects, ``rdfs:subClassOf`` for the
  type-inheritance table),
* type-URI abbreviation ``owl# → owl``, ``Wikicat → W``, ``Yago → Y``
  (nt_cleaner.py:33), applied to the full URI before name stripping —
  exactly the reference's operation order,
* the NT scan drop rules (malformed lines, ``__`` subjects) via
  ``sources.nt.read_nt``.

Everything is codegen column algebra (regexp parse + filters + string
rewrites) — one distributed pass per dump file, no Python in the loop, so
a 60 GB instance-types dump cleans at scan speed.

Documented divergence: the reference writes ``#``-delimited CSV with names
in display space ("Foo Bar", strip_cleaned_name); this engine's tables are
parquet in underscore space ("Foo_Bar") — the convention every downstream
join (types gate, redirect resolution, alias building) uses. The
``assert '#' not in name`` guard (nt_cleaner.py:35) exists to protect the
reference's CSV delimiter; parquet needs no delimiter guard, but
``validate_complete`` reproduces the ``assert_complete`` contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_extraction_spark.functions.uri import strip_name
from fact_extraction_spark.sources.nt import read_nt

TYPE_RELATION = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
REDIRECT_RELATION = "http://dbpedia.org/ontology/wikiPageRedirects"
SUBCLASS_RELATION = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def abbreviate_type_uri(col: Column | str) -> Column:
    """``owl# → owl``, ``Wikicat → W``, ``Yago → Y`` on the full URI
    (nt_cleaner.py:33 semantics, case-sensitive, before name stripping)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit("owl#"), F.lit("owl"))
    c = F.replace(c, F.lit("Wikicat"), F.lit("W"))
    return F.replace(c, F.lit("Yago"), F.lit("Y"))


def clean_nt(facts: DataFrame, filter_relations: list[str],
             out_cols: tuple[str, str] = ("entity", "value")) -> DataFrame:
    """facts(subj, pred, obj) → 2-column cleaned table
    (nt_cleaner.py:20-36): keep whitelisted predicates, abbreviate the
    object URI, strip both names."""
    left, right = out_cols
    return (
        facts.filter(F.col("pred").isin(list(filter_relations)))
        .select(
            strip_name("subj").alias(left),
            strip_name(abbreviate_type_uri("obj")).alias(right),
        )
    )


def validate_complete(facts: DataFrame, filter_relations: list[str]) -> None:
    """``assert_complete`` contract (nt_cleaner.py:27-28): every line of the
    dump must carry a whitelisted predicate. Distributed count, one scan."""
    bad = facts.filter(~F.col("pred").isin(list(filter_relations))).limit(1)
    rows = bad.collect()
    if rows:
        raise ValueError(
            f"dump contains a non-whitelisted predicate: {rows[0]['pred']}")


def build_types_table(spark: SparkSession, *paths: str,
                      assert_complete: bool = True) -> DataFrame:
    """instance-types dumps (+ optional yago-types) → types(entity, type).

    Mirrors clean_instance_types (nt_cleaner.py:40-44): the dumps are pure
    rdf:type files, so assert_complete defaults on. Multiple dumps union
    (setup runs instance_types_en.ttl and yago_types.ttl back to back).
    """
    out = None
    for path in paths:
        facts = read_nt(spark, path)
        if assert_complete:
            validate_complete(facts, [TYPE_RELATION])
        cleaned = clean_nt(facts, [TYPE_RELATION], ("entity", "type"))
        out = cleaned if out is None else out.unionByName(cleaned)
    return out.dropDuplicates(["entity", "type"])


def build_redirects_table(spark: SparkSession, path: str,
                          assert_complete: bool = True) -> DataFrame:
    """redirects dump → redirects(alias, target) (clean_redirects,
    nt_cleaner.py:55-59)."""
    facts = read_nt(spark, path)
    if assert_complete:
        validate_complete(facts, [REDIRECT_RELATION])
    return clean_nt(facts, [REDIRECT_RELATION], ("alias", "target"))


def build_type_inheritance_table(spark: SparkSession, path: str) -> DataFrame:
    """ontology dump → inheritance(type, supertype)
    (clean_instance_types_inheritance, nt_cleaner.py:47-52 —
    assert_complete=False there: the ontology dump carries many predicates
    and only subClassOf lines are kept)."""
    facts = read_nt(spark, path)
    return clean_nt(facts, [SUBCLASS_RELATION], ("type", "supertype"))
