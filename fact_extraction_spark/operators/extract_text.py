"""Stage 1: pages(html binary) → text, and stage 1b: text → sentence rows.

The heavy lifting is the frozen pure functions in ``textops`` wrapped in
Arrow-batched pandas UDFs — a pure function of each row, so the output is
byte-identical per url regardless of partitioning or executor count
(BASELINE.json per-row invariant). Replaces the reference's driver-side
article loop + per-sentence JVM subprocesses
(/root/reference/wikipedia_connector/wikipedia_dump_extractor.py:141-152,
 tagged_sentence.py:130-158).

Scale notes: the ``html`` column is dropped immediately after this stage
(column pruning keeps it out of every later scan); sentences explode ~50x
rows but ~0.02x bytes per row. Arrow batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so giant pages cannot blow
executor memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

from fact_extraction_spark.textops.wikitext import extract_article_text, extract_sentences

SENTENCE_SCHEMA = ArrayType(StructType([
    StructField("paragraph_idx", IntegerType()),
    StructField("rel_pos", DoubleType()),
    StructField("sentence", StringType()),
    StructField("anchors", ArrayType(StructType([
        StructField("href", StringType()),
        StructField("anchor_text", StringType()),
    ]))),
]))


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """html bytes → clean article text (frozen stage-1 cascade)."""
    return html.map(lambda b: extract_article_text(
        (bytes(b) if b is not None else b"").decode("utf-8", errors="replace")))


@pandas_udf(SENTENCE_SCHEMA)
def extract_sentences_udf(text: pd.Series) -> pd.Series:
    """article text → list of link-bearing sentence structs."""
    def _rows(t: str):
        return [
            (r["paragraph_idx"], r["rel_pos"], r["sentence"],
             [(href, atext) for href, atext in r["anchors"]])
            for r in extract_sentences(t or "")
        ]
    return text.map(_rows)


# pure function; non-determinism marking is an optimizer fence so the
# posexplode in explode_sentences cannot duplicate the ArrowEvalPython node
# (guide-documented filter-pushdown copy that doubles the whole extraction)
extract_sentences_udf = extract_sentences_udf.asNondeterministic()


def extract_text(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """pages(url, warc_ts, html, …) → (url, warc_ts, lang, text).

    The language filter is pushed to the scan (plain column predicate), and
    ``html`` is projected away right after the UDF.
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.select(
        "url", "warc_ts", "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )


def explode_sentences(texts: DataFrame, keep_cols: tuple = ()) -> DataFrame:
    """(url, text) → one row per link-bearing sentence.

    Output: (url, sent_id, paragraph_idx, rel_pos, sentence, anchors)
    plus any ``keep_cols`` passed through (e.g. ``warc_ts`` for the
    streaming event-time aggregates). ``sent_id`` is deterministic
    (position within the page).
    """
    with_sents = texts.select(
        "url", *keep_cols,
        F.posexplode(extract_sentences_udf(F.col("text"))).alias("sent_id", "s"),
    )
    return with_sents.select(
        "url",
        *keep_cols,
        "sent_id",
        F.col("s.paragraph_idx").alias("paragraph_idx"),
        F.col("s.rel_pos").alias("rel_pos"),
        F.col("s.sentence").alias("sentence"),
        F.col("s.anchors").alias("anchors"),
    )
