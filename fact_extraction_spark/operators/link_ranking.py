"""Stage 2b: tf-idf context-similarity ranking of entity-link candidates.

The north star (BASELINE.json) mandates that mention detection "scores
entity-link candidates with the reference's tf-idf context-similarity
ranking": once the Aho-Corasick dictionary pass emits *candidate* links (an
alias can map to several entities when titles, redirects and case variants
collide), the winner per mention span is the candidate whose *entity context
profile* is most similar to the mention's sentence context.

The closest reference analogue is the type+syntax candidate ranking
(/root/reference/pattern_recognition/pattern_matcher.py:18-53); the tf-idf
formulation is the north-star upgrade of it, and it is deliberately
expressed as plain relational algebra so the whole ranking stays JVM-side
(joins + groupBys + one window — zero Python in the hot path):

* ``entity_profiles``  — per entity, term frequencies of the words around its
  *unambiguous* mentions (anchor-tagged mentions during training):
  ``profile(entity, word, tf)``.
* ``idf``              — smoothed inverse document frequency over profiles,
  ``idf = ln((N+1)/(df+1)) + 1`` with one profile = one "document".
* ``rank_candidates``  — cosine( tfidf(mention context), tfidf(profile) ),
  computed as a word-level equi-join + sum, normalized by the two vector
  norms; ties broken by entity name for determinism.

Scale notes: the profile table is entity-dimension sized (≪ corpus); the
join feeding the cosine is (mention context words) ⋈ (profile words) on
``word`` — hot words are exactly the low-idf ones, so the join input is
pre-filtered to the top-``max_profile_words`` terms per entity, which bounds
the per-word fan-out. The candidate table never collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MENTION_KEY = ["url", "sent_id", "start", "end"]


def mention_context_words(mentions: DataFrame) -> DataFrame:
    """mention rows (url, sent_id, …, tokens, start, end, …) → one row per
    (mention, context word): the sentence's tokens minus the mention span.

    Pure column algebra (posexplode + span filter); feeds both profile
    building (unambiguous side) and candidate ranking (ambiguous side).
    """
    keep = [c for c in mentions.columns if c != "tokens"]
    return (
        mentions.select(*keep, F.posexplode("tokens").alias("pos", "word"))
        .filter((F.col("pos") < F.col("start")) | (F.col("pos") > F.col("end")))
        .drop("pos")
    )


def build_entity_profiles(
    unambiguous_mentions: DataFrame,
    max_profile_words: int = 64,
) -> DataFrame:
    """Aggregate context words of trusted (anchor-tagged) mentions into
    per-entity term-frequency profiles: (entity, word, tf).

    ``max_profile_words`` caps each profile to its top-tf terms so a
    mega-entity (a country page mentioned everywhere) cannot turn the
    ranking join into a skew bomb — the cap is the salting-free fix because
    the heavy hitters are exactly the words the cap drops first.
    """
    ctx = mention_context_words(unambiguous_mentions)
    tf = ctx.groupBy("entity", "word").agg(F.count("*").alias("tf"))
    top = Window.partitionBy("entity").orderBy(F.desc("tf"), "word")
    return (
        tf.withColumn("_r", F.row_number().over(top))
        .filter(F.col("_r") <= max_profile_words)
        .drop("_r")
    )


def compute_idf(profiles: DataFrame) -> DataFrame:
    """Smoothed idf over profiles (one profile = one document):
    ``idf(word) = ln((N+1)/(df+1)) + 1``. Output: (word, idf)."""
    n_docs = profiles.select("entity").distinct().count()
    df_counts = profiles.groupBy("word").agg(
        F.countDistinct("entity").alias("df"))
    return df_counts.select(
        "word",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )


def _norm(vec: DataFrame, key: list[str], weight_col: str) -> DataFrame:
    return vec.groupBy(*key).agg(
        F.sqrt(F.sum(F.col(weight_col) * F.col(weight_col))).alias("_norm"))


def rank_candidates(
    candidate_mentions: DataFrame,
    profiles: DataFrame,
    idf: DataFrame,
    top_k: int = 1,
) -> DataFrame:
    """Rank each candidate (mention span, entity) pair by tf-idf cosine.

    ``candidate_mentions``: (url, sent_id, rel_pos, tokens, start, end,
    alias, entity) from ``detect_dictionary_mentions`` — several rows per
    span when the alias is ambiguous.

    Returns the input minus ``tokens`` plus ``link_score``, keeping the
    ``top_k`` best-scoring candidates per mention span (ties → entity name).
    A candidate with an empty profile or no word overlap scores 0 and can
    still win if nothing beats it (every span keeps at least one candidate —
    the reference never drops a link for lack of context either).

    ``candidate_mentions`` feeds three branches of this plan (keys, context
    vectors, final join); it sits behind the Arrow-UDF detection stage, so
    we materialize it once (MEMORY_AND_DISK) instead of letting Catalyst
    re-execute the UDF chain per branch — at cluster scale this is where the
    mentions table is committed to Iceberg between stages (sinks/snapshot).
    """
    from fact_extraction_spark.caches import track

    candidate_mentions = track(candidate_mentions.persist())
    cand_keys = candidate_mentions.select(*MENTION_KEY, "entity").distinct()

    # mention-side tf-idf vector
    ctx = mention_context_words(
        candidate_mentions.select(*MENTION_KEY, "tokens").distinct())
    ctx_tf = ctx.groupBy(*MENTION_KEY, "word").agg(F.count("*").alias("tf"))
    ctx_vec = track(ctx_tf.join(F.broadcast(idf), "word").withColumn(
        "w_ctx", F.col("tf") * F.col("idf")).persist())
    ctx_norm = _norm(ctx_vec, MENTION_KEY, "w_ctx") \
        .withColumnRenamed("_norm", "ctx_norm")

    # profile-side tf-idf vector + norms (entity-dimension sized)
    prof_vec = track(profiles.join(F.broadcast(idf), "word").withColumn(
        "w_prof", F.col("tf") * F.col("idf")).persist())
    prof_norm = _norm(prof_vec, ["entity"], "w_prof") \
        .withColumnRenamed("_norm", "prof_norm")

    # dot product: context words ⋈ the candidate's profile words
    dots = (
        cand_keys
        .join(ctx_vec.select(*MENTION_KEY, "word", "w_ctx"), MENTION_KEY)
        .join(prof_vec.select("entity", "word", "w_prof"), ["entity", "word"])
        .groupBy(*MENTION_KEY, "entity")
        .agg(F.sum(F.col("w_ctx") * F.col("w_prof")).alias("dot"))
    )

    scored = (
        cand_keys
        .join(dots, MENTION_KEY + ["entity"], "left")
        .join(ctx_norm, MENTION_KEY, "left")
        .join(prof_norm, "entity", "left")
        .withColumn(
            "link_score",
            F.when(
                F.col("dot").isNotNull()
                & (F.col("ctx_norm") > 0) & (F.col("prof_norm") > 0),
                F.col("dot") / (F.col("ctx_norm") * F.col("prof_norm")),
            ).otherwise(F.lit(0.0)),
        )
        .select(*MENTION_KEY, "entity", "link_score")
    )

    w = Window.partitionBy(*MENTION_KEY).orderBy(F.desc("link_score"), "entity")
    best = (scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top_k).drop("_r"))

    return candidate_mentions.join(best, MENTION_KEY + ["entity"])


def disambiguate_mentions(
    candidate_mentions: DataFrame,
    profiles: DataFrame,
    idf: DataFrame,
) -> DataFrame:
    """Convenience: keep only the single best entity per mention span,
    dropping the ranking internals — the stage-2b output the pipeline feeds
    into window extraction."""
    ranked = rank_candidates(candidate_mentions, profiles, idf, top_k=1)
    return ranked.drop("alias")
