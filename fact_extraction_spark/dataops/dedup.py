"""Deduplication operators for web-scale corpus curation.

Four families, all DataFrame-native (no Python in the hot path — the hash
functions are md5-based column expressions, see dataops/hashing.py):

* ``exact_dedup``        — hash-groupBy on the full text.
* ``ngram_jaccard_pairs``— exact n-gram Jaccard similarity join: pairs share
  at least one shingle (the join), similarity from intersection/union
  counts. The verifier for the approximate families; quadratic only within
  shingle-sharing groups.
* ``minhash_lsh_pairs``  — MinHash signatures + banded LSH: per document,
  ``num_hashes`` min-hashes over its shingle set; band-hash groupBy buckets
  candidate pairs; exact Jaccard verification joins the survivors. The
  scale path: cost is linear in corpus size + bucket collisions, never
  all-pairs.
* ``simhash``            — per-document ``bits``-wide SimHash over token
  frequencies; near-dup candidates are documents whose signatures match on
  band prefixes (Hamming-adjacent). Exposed as signatures; banding reuses
  the LSH machinery.

Scale notes (100 TB): every stage is shuffle-on-key (shingle, band-hash);
hot shingles (boilerplate n-grams) are the skew risk — ``minhash_lsh_pairs``
drops shingles shared by more than ``max_shingle_df`` documents (stopword
shingles carry no dedup signal; this is the standard guard), and AQE
skew-split covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fact_extraction_spark.dataops.hashing import md5_long

TOKEN_RX = r"\s+"


def _tokens(col):
    return F.split(F.trim(col), TOKEN_RX)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, dup_count, keeper)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("dup_count"),
             F.min(id_col).alias("keeper_doc_id"))
        .filter(F.col("dup_count") > 1)
    )


def shingle_sets(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct token n-grams per document.

    Pure column algebra: posexplode over token positions + slice/concat.
    Documents shorter than ``n`` tokens yield their full token string as the
    single shingle (so they can still be compared).
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n_tok - (n - 1), F.lit(1)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"),
                    F.explode(starts).alias("start"))
        .select("doc_id",
                F.concat_ws(" ", F.slice("toks", F.col("start"), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact Jaccard over token n-gram sets: (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard >= threshold."""
    sh = shingle_sets(docs, n, id_col, text_col).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a").join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc_id, seed, minhash): one min over the shingle set per hash-family
    member. The explode is ``num_hashes``× the shingle rows — partial
    aggregation (map-side min) collapses it before any shuffle."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)]))
    return (
        shingles.withColumn("seed", seeds)
        .withColumn("h", md5_long(F.concat_ws(
            ":", F.col("seed").cast("string"), F.col("shingle"))))
        .groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """Band the signature vector; documents sharing any band bucket are
    candidates: (doc_a, doc_b) distinct, doc_a < doc_b."""
    banded = signatures.withColumn("band", F.col("seed") % bands)
    band_sig = (
        banded.groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("seed", "minhash"))).alias("sig"))
        .withColumn("bucket", F.md5(F.concat_ws(
            ",", F.transform("sig", lambda s: s["minhash"].cast("string")))))
        .select("doc_id", "band", "bucket")
    )
    return (
        band_sig.alias("a")
        .join(band_sig.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification:
    (doc_a, doc_b, jaccard >= threshold). Approximation affects only which
    pairs are *considered*; every emitted pair carries its true Jaccard.

    ``max_shingle_df``: drop shingles appearing in more than this many
    documents before hashing (boilerplate guard / skew guard).
    """
    sh = shingle_sets(docs, n, id_col, text_col)
    if max_shingle_df is not None:
        rare = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_shingle_df).select("shingle"))
        sh = sh.join(rare, "shingle", "left_semi")
    sh = sh.cache()

    sigs = minhash_signatures(sh, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands)

    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_signatures(docs: DataFrame, bits: int = 16,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): classic SimHash over token frequencies.

    Per token: a ``bits``-wide hash; bit j votes +tf / -tf; the signature's
    bit j is 1 iff the vote sum is positive. Expressed as explode(bit) +
    groupBy — the per-document vector never leaves the JVM.
    """
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        .withColumn("h", md5_long(F.col("tok")))
    )
    bit = F.explode(F.array(*[F.lit(j) for j in range(bits)]))
    votes = (
        toks.withColumn("j", bit)
        # shiftright with a column shift amount needs the SQL form
        .withColumn("vote", F.expr(
            "CASE WHEN shiftright(h, j) % 2 = 1 THEN tf ELSE -tf END"))
        .groupBy("doc_id", "j").agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn("bitval", F.expr(
            "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), j) "
            "ELSE CAST(0 AS BIGINT) END"))
        .groupBy("doc_id").agg(F.sum("bitval").alias("simhash"))
    )
