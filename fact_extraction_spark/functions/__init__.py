"""Column-level scalar functions (JVM-side, codegen-friendly — no UDFs)."""

from fact_extraction_spark.functions.uri import (  # noqa: F401
    capitalize_first,
    strip_cleaned_name,
    strip_name,
    to_dbpedia_uri,
    to_wiki_href,
    to_wikipedia_url,
)
