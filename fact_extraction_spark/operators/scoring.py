"""Stage 3b: score candidate windows against every learned relation pattern.

Exact score algebra of the reference matcher
(/root/reference/pattern_recognition/pattern_matcher.py:18-53), expressed as
joins + column math (whole-stage codegen; no Python in the loop):

* subject/object type score (:55-74): Σ P(rel|type) over the candidate's
  types ∩ learned types, divided by |candidate types|; 0 kills the match
  (early exit :31-37); a type-less entity scores None when
  ``allow_unknown_entity_types`` (weights renormalize, :146-164).
* position score ``(1-|Δ|)²`` (:127-133).
* syntax score ``min(1, avgI²/avg1/avg2)`` (:135-144) where the candidate
  pattern covers 1 sentence and holds one word per filled slot, so the
  counter-min intersection reduces to *counting matching (slot, word)
  pairs* against the learned pattern — a join + count.
* weighted arithmetic mean with weights [subj_wp, obj_wp, 0.15, 1.0]
  (:41-47), None-scores dropped and weights renormalized.

The learned-pattern tables are tiny (≤50 relations); every join against
them is a broadcast — the corpus-sized candidate table never shuffles.
This is the reference's broadcast nested-loop "score every candidate
against every pattern" (fact_extractor.py:87-95) with the type gate
(fact_extractor.py:97-109) applied as a semi-join *before* scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RELATIVE_POSITION_WEIGHT = 0.15  # pattern_matcher.py:45
SYNTAX_WEIGHT = 1.0              # pattern_matcher.py:46
DEFAULT_MATCH_THRESHOLD = 0.005  # fact_extractor.py:18 (config default 0.5)

CAND_KEY = ["url", "sent_id", "subject", "object"]


def _entity_side_scores(types: DataFrame, type_probs: DataFrame, side: str) -> DataFrame:
    """(entity, pred, prob_sum) — Σ P(rel|type) over the entity's types."""
    side_probs = F.broadcast(
        type_probs.filter(F.col("side") == side).select("pred", "type", "probability"))
    return (
        types.join(side_probs, "type")
        .groupBy("entity", "pred")
        .agg(F.sum("probability").alias("prob_sum"))
    )


def _gate_pairs(types: DataFrame, pattern_types: DataFrame, side: str) -> DataFrame:
    """(entity, pred) pairs whose type sets intersect the learned gating set
    (fact_extractor.py:97-109 reasonable-relations filter)."""
    gate = F.broadcast(
        pattern_types.filter(F.col("side") == side).select("pred", "type"))
    return types.join(gate, "type").select("entity", "pred").distinct()


def score_candidates(
    windows: DataFrame,
    pattern_words: DataFrame,
    pattern_stats: DataFrame,
    pattern_types: DataFrame,
    type_probs: DataFrame,
    rel_stats: DataFrame,
    types: DataFrame,
    allow_unknown_entity_types: bool = True,
    match_threshold: float = DEFAULT_MATCH_THRESHOLD,
) -> DataFrame:
    """windows (candidate context rows) → scored (subj, pred, obj, score, …).

    ``windows`` comes from ``lexical_patterns.candidate_windows`` over
    discovery pages. All learned tables are broadcast dims.
    """
    # windows hold ONE nested row per candidate (unique by construction in
    # fused_anchor_windows / candidate_windows) — no corpus-wide distinct
    cands = windows.select(*CAND_KEY, "rel_pos", "n_slots")

    n_types = types.groupBy("entity").agg(F.count("*").alias("n_types"))

    # ---- reasonable-relations gate, subject and object side ----
    # Build per-ENTITY admissible-pred sets once (entity-dimension sized),
    # then enforce both sides with two inner joins. The earlier formulation
    # expanded candidate×pred rows per side and intersect()ed them — a
    # corpus-sized distinct+shuffle that dominated the scoring stage.
    def entity_preds(entity_col: str, side: str) -> DataFrame:
        typed = _gate_pairs(types, pattern_types, side)
        ents = cands.select(F.col(entity_col).alias("entity")).distinct()
        allowed = typed.join(ents, "entity", "left_semi")
        if allow_unknown_entity_types:
            all_preds = F.broadcast(pattern_stats.select("pred").distinct())
            unknown = (ents.join(n_types, "entity", "left_anti")
                       .crossJoin(all_preds))
            allowed = allowed.unionByName(unknown)
        return allowed.withColumnRenamed("entity", entity_col)

    scored = (
        cands.join(entity_preds("subject", "subject"), "subject")
        .join(entity_preds("object", "object"), ["object", "pred"])
    )

    # ---- syntax score ----
    lw = F.broadcast(pattern_words.select("pred", "slot", "word"))
    matches = (
        windows.select(*CAND_KEY, F.explode("slots").alias("s"))
        .select(*CAND_KEY, F.col("s.slot").alias("slot"),
                F.col("s.word").alias("word"))
        .join(lw, ["slot", "word"])
        .groupBy(*CAND_KEY, "pred")
        .agg(F.count("*").alias("matches"))
    )
    scored = scored.join(matches, CAND_KEY + ["pred"], "left").fillna({"matches": 0})
    stats = F.broadcast(pattern_stats.filter(F.col("total_words") > 0))
    scored = scored.join(stats, "pred")
    avg_learned = F.col("total_words") / F.col("covered_sentences")
    # candidate total words = filled slots + 1 (the mention-head "root" word,
    # which the learned side has cleared — pattern.py:214)
    avg_cand = F.col("n_slots") + F.lit(1.0)
    syntax = F.least(F.lit(1.0),
                     (F.col("matches") * F.col("matches")) / avg_learned / avg_cand)
    scored = scored.withColumn("syntax_score", syntax)

    # ---- type scores ----
    for side, ent_col in (("subject", "subject"), ("object", "object")):
        ss = _entity_side_scores(types, type_probs, side) \
            .withColumnRenamed("entity", ent_col) \
            .withColumnRenamed("prob_sum", f"{side}_prob_sum") \
            .withColumnRenamed("pred", "pred")
        scored = scored.join(ss, [ent_col, "pred"], "left")
        nt = n_types.withColumnRenamed("entity", ent_col) \
            .withColumnRenamed("n_types", f"{side}_n_types")
        scored = scored.join(nt, ent_col, "left")
        score_col = (
            F.when(F.col(f"{side}_n_types").isNull(), F.lit(None).cast("double"))
            .otherwise(F.coalesce(F.col(f"{side}_prob_sum"), F.lit(0.0))
                       / F.col(f"{side}_n_types"))
        )
        scored = scored.withColumn(f"{side}_type_score", score_col)

    if not allow_unknown_entity_types:
        # without the unknown-types exemption, a missing type set scores 0
        scored = scored.withColumn(
            "subject_type_score", F.coalesce("subject_type_score", F.lit(0.0))
        ).withColumn(
            "object_type_score", F.coalesce("object_type_score", F.lit(0.0)))

    # early exit (pattern_matcher.py:31-37): a hard type-score 0 kills it
    scored = scored.filter(
        (F.col("subject_type_score").isNull() | (F.col("subject_type_score") > 0))
        & (F.col("object_type_score").isNull() | (F.col("object_type_score") > 0)))

    # ---- position score ----
    pos = (F.lit(1.0) - F.abs(F.col("relative_position") - F.col("rel_pos"))) ** 2
    scored = scored.withColumn("position_score", pos)

    # ---- weighted mean with None-dropping renormalization ----
    scored = scored.join(
        F.broadcast(rel_stats.select(
            "pred",
            F.col("subject_weighted_probability").alias("swp"),
            F.col("object_weighted_probability").alias("owp"))),
        "pred")
    st, ot = F.col("subject_type_score"), F.col("object_type_score")
    w_st = F.when(st.isNull(), 0.0).otherwise(F.col("swp"))
    w_ot = F.when(ot.isNull(), 0.0).otherwise(F.col("owp"))
    total_w = w_st + w_ot + F.lit(RELATIVE_POSITION_WEIGHT) + F.lit(SYNTAX_WEIGHT)
    weighted_sum = (
        F.coalesce(st, F.lit(0.0)) * w_st
        + F.coalesce(ot, F.lit(0.0)) * w_ot
        + F.col("position_score") * F.lit(RELATIVE_POSITION_WEIGHT)
        + F.col("syntax_score") * F.lit(SYNTAX_WEIGHT)
    )
    scored = scored.withColumn("score", weighted_sum / total_w)

    return (
        scored.filter(F.col("score") >= match_threshold)
        .select(
            F.col("subject").alias("subj"),
            "pred",
            F.col("object").alias("obj"),
            "score",
            "url", "sent_id", "rel_pos",
        )
    )
