"""Text analysis for corpus curation: language ID, quality scoring, token
counting, document fingerprinting. All whole-stage-codegen column algebra
over the ``documents`` table; every function is oracle-reproducible SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fact_extraction_spark.dataops.hashing import md5_long

# tiny per-language stopword inventories for the n-gram/stopword heuristic;
# deterministic and good enough to separate en/de/fr boilerplate.
LANG_STOPWORDS = {
    "en": ("the", "of", "and", "to", "in", "is", "was", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "des", "dem", "ein"),
    "fr": ("le", "la", "les", "et", "est", "des", "un", "une", "du", "dans"),
}

# BPE-ish tokenizer: word pieces, numbers, or single punctuation — the same
# regex the engine's frozen tokenizer family uses (textops/tokenizer.py).
BPE_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(col) -> Column:
    return F.split(F.trim(col), r"\s+")


def bpe_tokens(col) -> Column:
    return F.regexp_extract_all(col, F.lit(BPE_RX), 0)


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace + BPE-ish counts."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(F.col(text_col))).alias("n_ws_tokens"),
        F.size(bpe_tokens(F.col(text_col))).alias("n_bpe_tokens"),
    )


def _stopword_hits(toks: Column, words: tuple) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax stopword-hit ratio across the
    language inventories; ties break on language code order; all-zero →
    'und' (undetermined)."""
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    scores = [
        F.struct((_stopword_hits(toks, words) / n).alias("score"),
                 F.lit(lang).alias("lang"))
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    # greatest() on structs orders by score then lang — ties pick the LAST
    # lang alphabetically; invert lang for deterministic first-wins? keep
    # struct order (score, lang): max score wins, tie → max lang. Documented.
    best = F.greatest(*scores)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("lang_pred"),
        F.round(best["score"], 6).alias("lang_score"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    quality): the standard length/punctuation/stopword heuristics composed
    into one 0..1 score (weights documented inline)."""
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    punct = F.size(F.filter(toks, lambda t: t.rlike(r"^[^A-Za-z0-9]+$")))
    stops = _stopword_hits(toks, LANG_STOPWORDS["en"])
    mean_len = F.length(F.trim(F.col(text_col))) / n
    punct_ratio = punct / n
    stop_ratio = stops / n
    # quality: reward stopword presence (fluent prose), penalize punctuation
    # walls and degenerate token lengths; clamp to [0, 1].
    quality = F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                      F.lit(0.5) * F.least(stop_ratio * 4, F.lit(1.0))
                      + F.lit(0.3) * F.when((mean_len >= 3) & (mean_len <= 12), 1.0)
                                      .otherwise(0.0)
                      + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5,
                                                           F.lit(1.0)))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def rolling_fingerprints(docs: DataFrame, window: int = 4,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): winnowing-style document fingerprint — the
    minimum rolling hash over token windows of size ``window``. Robust to
    local edits (only windows covering the edit change), cheap to diff."""
    toks = ws_tokens(F.col(text_col))
    n_tok = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n_tok - (window - 1), F.lit(1)))
    grams = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"),
        F.explode(starts).alias("start"),
    ).select(
        "doc_id",
        md5_long(F.concat_ws(" ", F.slice("toks", F.col("start"), window)))
        .alias("h"),
    )
    return grams.groupBy("doc_id").agg(F.min("h").alias("fingerprint"))
