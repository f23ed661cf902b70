"""Frozen pure-Python text functions — the per-row contract of stage 1/1b.

These functions are deliberately dependency-free and deterministic: the same
input string always yields the same output bytes, regardless of partitioning,
executor count, or batch boundaries. They define the engine's byte-identity
contract (BASELINE.json ``input_hint``: "byte-identical extracted text per
url") and are wrapped in Arrow UDFs by ``operators.extract_text``.
"""

from fact_extraction_spark.textops.wikitext import (  # noqa: F401
    extract_article_text,
    extract_paragraphs,
    extract_sentences,
    normalize_sentence,
    wikitext_to_html,
)
from fact_extraction_spark.textops.tokenizer import tokenize  # noqa: F401
