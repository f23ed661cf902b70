"""URI/name rewriting as pure Column expressions.

Same semantics as /root/reference/helper_functions/uri_rewriting.py:6-72 but
expressed with built-in pyspark.sql.functions so they stay inside
whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_name(col: Column | str) -> Column:
    """Last path segment of a URI (uri_rewriting.py:6-13)."""
    return F.substring_index(F.col(col) if isinstance(col, str) else col, "/", -1)


def strip_cleaned_name(col: Column | str) -> Column:
    """Last segment with underscores as spaces (uri_rewriting.py:61-72)."""
    return F.replace(strip_name(col), F.lit("_"), F.lit(" "))


def to_wiki_href(col: Column | str) -> Column:
    """name → '/wiki/<name>' (uri_rewriting.py:16-24)."""
    return F.concat(F.lit("/wiki/"), strip_name(col))


def to_wikipedia_url(col: Column | str) -> Column:
    return F.concat(F.lit("https://en.wikipedia.org/wiki/"), strip_name(col))


def to_dbpedia_uri(col: Column | str) -> Column:
    return F.concat(F.lit("http://dbpedia.org/resource/"), strip_name(col))


def capitalize_first(col: Column | str) -> Column:
    """Uppercase the first character, keep the rest (uri_rewriting.py:49-58,
    the link-normalization hotfix of tagged_sentence.py:232-233)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 2_000_000))
