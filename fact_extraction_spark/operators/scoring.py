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
# the slim persist's key columns: ``subject`` is ALWAYS the page title —
# a pure function of ``url`` (capitalize_first(strip_name(url)), identical
# in both mention modes) — so the scoring persist does not store it; the
# scorer recomputes it per scan in codegen. The job is memory-bandwidth
# bound at high core counts (BENCH/BASELINE.md round-5 host-saturation
# analysis), so trading ~25 stored+rescanned string bytes per candidate
# for a few ALU ops on an otherwise stalled core is the right direction.
SLIM_KEY = ["url", "sent_id", "object"]
# int-url variant (VERDICT r5 Next #3): the ~60-byte url string — the
# dominant remaining bytes-per-candidate — is replaced by its xxhash64
# through the persist and every scoring scan/join; the string (and the
# derived subject) is re-attached AFTER the threshold filter by a join
# against the url dimension, which touches only the surviving rows.
SLIM_KEY_INT = ["url_id", "sent_id", "object"]


def _slot_key(slot_col, word_col):
    """(slot, word) → int64 via xxhash64 — the match-count join key.

    Strings dominate the byte volume of the candidate table (the job is
    memory-bandwidth-bound at high core counts, BENCH/BASELINE.md); an
    8-byte hash shrinks the scoring persist and makes ``array_intersect``
    integer codegen instead of string comparison. Collisions would need two
    distinct (slot, word) pairs sharing a 64-bit hash inside one relation's
    learned vocabulary (≤ ~10^5 keys) — probability < 10^-9, and the effect
    would be one spurious match count, not a wrong join."""
    return F.xxhash64(slot_col.cast("int"), word_col)


def hashed_slot_keys():
    """Column expression: nested ``slots`` → ``array<bigint>`` of hashed
    (slot, word) keys."""
    return F.transform("slots", lambda s: _slot_key(s["slot"], s["word"]))


def slim_score_windows(windows: DataFrame, int_url: bool = False) -> DataFrame:
    """Project candidate windows to the minimal schema scoring needs, with
    the slot words hash-encoded and the derivable ``subject`` column
    dropped (see SLIM_KEY). extract() persists THIS instead of the full
    nested-string windows: the persist and every scan over it then carry
    8 bytes per slot instead of a string word and no subject string at all
    (learn() keeps the full slots — pattern learning needs the actual
    words).

    ``int_url=True`` (SLIM_KEY_INT) additionally hash-encodes the url;
    pass the matching ``url_dim`` to ``score_candidates`` so strings can
    be re-attached after the threshold filter."""
    if int_url:
        return windows.select(
            F.xxhash64("url").alias("url_id"), "sent_id", "object",
            "rel_pos", "n_slots", hashed_slot_keys().alias("slot_keys"))
    return windows.select(*SLIM_KEY, "rel_pos", "n_slots",
                          hashed_slot_keys().alias("slot_keys"))


def url_dim(discovery: DataFrame) -> DataFrame:
    """(url_id, url, subject) dimension for the int-url slim persist: one
    row per distinct discovery url (a superset of the candidate urls —
    extra rows simply never match). Collision risk is the slot-key
    argument again: two distinct urls sharing an xxhash64 (P < n²/2⁶⁴ —
    ~10⁻⁸ at 10⁶ pages) would cross-attach two pages' rows; at 10¹²-page
    scale widen the key to two independent hashes."""
    from fact_extraction_spark.functions.uri import (
        capitalize_first, strip_name)
    return discovery.select("url").distinct().select(
        F.xxhash64("url").alias("url_id"), "url",
        capitalize_first(strip_name("url")).alias("subject"))


def _entity_side_scores(types: DataFrame, type_probs: DataFrame, side: str) -> DataFrame:
    """(entity, pred, prob_sum) — Σ P(rel|type) over the entity's types.

    Reference spelling: the hot path is ``fused_side_scores`` (one types
    traversal for both sides); this per-side form pins its equivalence in
    test_fused_side_scores_matches_reference."""
    side_probs = F.broadcast(
        type_probs.filter(F.col("side") == side).select("pred", "type", "probability"))
    return (
        types.join(side_probs, "type")
        .groupBy("entity", "pred")
        .agg(F.sum("probability").alias("prob_sum"))
    )


def _gate_pairs(types: DataFrame, pattern_types: DataFrame, side: str) -> DataFrame:
    """(entity, pred) pairs whose type sets intersect the learned gating set
    (fact_extractor.py:97-109 reasonable-relations filter). Reference
    spelling — see ``fused_side_scores`` / ``_entity_side_scores``."""
    gate = F.broadcast(
        pattern_types.filter(F.col("side") == side).select("pred", "type"))
    return types.join(gate, "type").select("entity", "pred").distinct()


def fused_side_scores(types: DataFrame, pattern_types: DataFrame,
                      type_probs: DataFrame, pattern_stats: DataFrame,
                      n_types: DataFrame, ents_both: DataFrame,
                      allow_unknown_entity_types: bool) -> DataFrame:
    """(entity, side, pred, type_score) for BOTH candidate sides in ONE
    types traversal.

    Exact-algebra fusion of the former per-side chain (still kept above as
    the reference spelling): ``_gate_pairs`` ∩ ents → left-join
    ``_entity_side_scores`` → ÷ n_types → early-exit filter. The gating set
    (pattern_types) and the probability table (type_probs) are both keyed
    (side, pred, type): union them into one broadcast dim and aggregate the
    types join once. max(is_gate) recovers the gate (an (entity, pred)
    passes iff some type matches the gating set) and sum(probability)
    recovers Σ P(rel|type) (gate-only rows carry NULL, which F.sum ignores,
    and an (entity, pred) holding a gate match but zero probability mass
    sums to NULL → coalesce 0 → dropped by the same >0 early-exit filter —
    pattern_matcher.py:31-37). ``ents_both`` is the labelled candidate
    entity set: (entity, side) with side ∈ {subject, object}.
    Equivalence is pinned by test_fused_side_scores_matches_reference."""
    gate_dim = (pattern_types.select("side", "pred", "type")
                .withColumn("probability", F.lit(None).cast("double"))
                .withColumn("is_gate", F.lit(1)))
    prob_dim = (type_probs.select("side", "pred", "type", "probability")
                .withColumn("is_gate", F.lit(0)))
    type_dim = F.broadcast(gate_dim.unionByName(prob_dim))

    typed = (
        types.join(type_dim, "type")
        .groupBy("entity", "side", "pred")
        .agg(F.sum("probability").alias("prob_sum"),
             F.max("is_gate").alias("gated"))
        .filter(F.col("gated") == 1)
        .join(ents_both, ["entity", "side"], "left_semi")
        .join(n_types, "entity")
        .withColumn("type_score",
                    F.coalesce("prob_sum", F.lit(0.0)) / F.col("n_types"))
        .filter(F.col("type_score") > 0)
        .select("entity", "side", "pred", "type_score"))
    if allow_unknown_entity_types:
        # type-less entities score None for every learned relation
        # (weights renormalize downstream)
        all_preds = F.broadcast(pattern_stats.select("pred").distinct())
        unknown = (
            ents_both.join(n_types, "entity", "left_anti")
            .crossJoin(all_preds)
            .select("entity", "side", "pred",
                    F.lit(None).cast("double").alias("type_score")))
        typed = typed.unionByName(unknown)
    return typed


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
    type_matching: bool = True,
    side_broadcast_rows: int = 5_000_000,
    url_map: DataFrame | None = None,
) -> DataFrame:
    """windows (candidate context rows) → scored (subj, pred, obj, score, …).

    ``windows`` comes from ``lexical_patterns.candidate_windows`` over
    discovery pages. All learned tables are broadcast dims.

    ``type_matching=False`` reproduces the reference exactly
    (fact_extractor.py:135-141 + pattern_matcher.py:24-25): every candidate
    is scored against EVERY learned relation (no reasonable-relations
    gate), and the match score is the pattern-intersection (syntax) score
    alone — no type scores, no position term, no weighted mean.
    """
    # windows hold ONE nested row per candidate (unique by construction in
    # fused_anchor_windows / candidate_windows) — no corpus-wide distinct.
    # ``slot_keys`` hash-encodes each filled slot (slot, word) to int64 so
    # the match count is a codegen array_intersect of LONG arrays against a
    # broadcast per-relation key array — NOT an explode + broadcast-join +
    # groupBy(count) + join back, which costs two corpus-sized shuffles and
    # was the dominant allocation source at high core counts
    # (BENCH/BASELINE.md round-2 task-time-inflation analysis). A caller
    # that pre-projected via ``slim_score_windows`` already carries
    # slot_keys and no slots column at all.
    int_url = "url_id" in windows.columns
    if int_url:
        # SLIM_KEY_INT input: candidates carry an 8-byte url hash; url and
        # the derived subject live only in the url dimension and are
        # re-attached after the threshold filter (finalize below)
        if url_map is None:
            raise ValueError("int-url slim windows require url_map "
                             "(scoring.url_dim over the discovery pages)")
        cands = windows.select(*SLIM_KEY_INT, "rel_pos", "n_slots",
                               "slot_keys")
    else:
        if "subject" not in windows.columns:
            # slim input (SLIM_KEY): recompute the page-title subject from
            # url in codegen — cheaper than storing and re-reading it per
            # scan
            from fact_extraction_spark.functions.uri import (
                capitalize_first, strip_name)
            windows = windows.withColumn(
                "subject", capitalize_first(strip_name("url")))
        if "slot_keys" in windows.columns:
            cands = windows.select(*CAND_KEY, "rel_pos", "n_slots",
                                   "slot_keys")
        else:
            cands = windows.select(*CAND_KEY, "rel_pos", "n_slots",
                                   hashed_slot_keys().alias("slot_keys"))

    def finalize(df: DataFrame) -> DataFrame:
        """Post-threshold projection to the output schema; the int-url path
        re-attaches url/subject here, so the string join touches only the
        surviving rows."""
        if int_url:
            df = df.join(url_map, "url_id")
        return df.select(
            F.col("subject").alias("subj"),
            "pred",
            F.col("object").alias("obj"),
            "score",
            "url", "sent_id", "rel_pos",
        )

    n_types = types.groupBy("entity").agg(F.count("*").alias("n_types"))

    if type_matching:
        from fact_extraction_spark.caches import track
        # n_types feeds the fused typed join + the unknown anti-join;
        # persist + eager fill so the small aggregation over the types
        # table runs once instead of once per reference
        n_types = track(n_types.persist())
        n_types.count()
        # ---- reasonable-relations gate + type score + early exit, one
        # fused traversal PER SIDE (fused_side_scores): the gate+prob
        # union-dim aggregation replaces the former gate-pairs distinct +
        # prob groupBy + left-join chain (two types traversals and two
        # extra shuffles per side). The two sides stay CONCURRENT — an
        # A/B of a single both-sides job measured 2 s SLOWER at the bench
        # shape despite less total work, because one fused job serializes
        # a critical path that two overlapped per-side jobs hide (guide
        # §2.6 back-filling); per-side fusion keeps the overlap AND the
        # shorter chains. ----
        if int_url:
            # subject entities come from the url dimension (a superset of
            # candidate subjects — extra rows never match), and the side
            # table is re-keyed to url_id so the candidate join hashes an
            # 8-byte key instead of the subject string
            sub_ents = url_map.select(
                F.col("subject").alias("entity")).distinct()
        else:
            sub_ents = cands.select(
                F.col("subject").alias("entity")).distinct()
        obj_ents = cands.select(F.col("object").alias("entity")).distinct()

        def side_scores(ents: DataFrame, side: str) -> DataFrame:
            """(entity, {side}_type_score, pred) over the given candidate-
            side entity set (one "entity" column)."""
            return (fused_side_scores(
                types,
                pattern_types.filter(F.col("side") == side),
                type_probs.filter(F.col("side") == side),
                pattern_stats, n_types,
                ents.withColumn("side", F.lit(side)),
                allow_unknown_entity_types)
                .drop("side")
                .withColumnRenamed("type_score", f"{side}_type_score"))

        def finish_side(tbl: DataFrame) -> DataFrame:
            # The side table is bounded (candidate entities × admissible
            # preds) but sits behind aggregates/unions whose size estimates
            # Catalyst distrusts, so it plans a shuffle join — exchanging
            # the corpus-sized candidate table both ways. Measure the real
            # row count (one job over a dimension table) and broadcast when
            # it is small enough: the candidate table then never shuffles
            # and the whole scan→join→score pipeline stays in one
            # whole-stage-codegen pass.
            from fact_extraction_spark.caches import track
            tbl = track(tbl.persist())
            if tbl.count() <= side_broadcast_rows:
                tbl = F.broadcast(tbl)
            return tbl

        if int_url:
            sub_tbl = (
                side_scores(sub_ents, "subject")
                .join(url_map.select(
                    "url_id", F.col("subject").alias("entity")), "entity")
                .select("url_id", "pred", "subject_type_score"))
            sub_key = "url_id"
        else:
            sub_tbl = side_scores(sub_ents, "subject") \
                .withColumnRenamed("entity", "subject")
            sub_key = "subject"
        obj_tbl = side_scores(obj_ents, "object") \
            .withColumnRenamed("entity", "object")

        # the two side-table materializations are independent multi-stage
        # jobs over dimension tables whose wall time is stage-count
        # overhead, not bytes — submit them concurrently so one side's
        # stages back-fill the other's stragglers (guide §2.6; job
        # descriptions are thread-local so the UI stays labelled)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_sub = pool.submit(finish_side, sub_tbl)
            f_obj = pool.submit(finish_side, obj_tbl)
            sub_done, obj_done = f_sub.result(), f_obj.result()

        scored = (
            cands.join(sub_done, sub_key)
            .join(obj_done, ["object", "pred"])
        )
    else:
        # reasonable_relations = ALL learned relations
        # (fact_extractor.py:140-141)
        scored = cands.crossJoin(
            F.broadcast(pattern_stats.select("pred").distinct()))

    # ---- syntax score (|candidate ∩ learned (slot, word) pairs|) ----
    pattern_keys = F.broadcast(
        pattern_words.groupBy("pred").agg(
            F.collect_list(_slot_key(F.col("slot"), F.col("word")))
            .alias("learned_keys")))
    stats = F.broadcast(pattern_stats.filter(F.col("total_words") > 0))
    scored = scored.join(stats, "pred").join(pattern_keys, "pred", "left")
    matches = F.when(F.col("learned_keys").isNull(), F.lit(0)).otherwise(
        F.size(F.array_intersect("slot_keys", "learned_keys")))
    avg_learned = F.col("total_words") / F.col("covered_sentences")
    # candidate total words = filled slots + 1 (the mention-head "root" word,
    # which the learned side has cleared — pattern.py:214)
    avg_cand = F.col("n_slots") + F.lit(1.0)
    syntax = F.least(F.lit(1.0),
                     (matches * matches) / avg_learned / avg_cand)
    scored = scored.withColumn("syntax_score", syntax)

    if not type_matching:
        # pattern_matcher.py:24-25: score = the intersection score, full stop
        return finalize(
            scored.withColumn("score", F.col("syntax_score"))
            .filter(F.col("score") >= match_threshold))

    # (type scores + early exit already attached by the fused side joins)

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

    return finalize(scored.filter(F.col("score") >= match_threshold))
