"""The full distant-supervision lifecycle, Spark-first.

Mirrors the reference's three entry points (SURVEY.md §3) as two plans:

* ``learn(...)``   = learn_types.sh + learn_patterns.sh
* ``extract(...)`` = extract_facts.sh + fact_cleaner.py

Dataflow (SURVEY.md §7.1):
  pages → stage1 text (Arrow UDF) → sentences → mentions (anchor tagging /
  AC dictionary) → token windows → [learn: groupBy aggregates → pattern
  tables] / [extract: type-gate → broadcast score → threshold → anti-join
  known → triples].

Every stage takes/returns DataFrames; the learned model is a set of small
tables, broadcast at use sites.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_extraction_spark.caches import track
from fact_extraction_spark.caches import release as release_pipeline_caches  # noqa: F401  (public API)
from fact_extraction_spark.functions.uri import capitalize_first, strip_name
from fact_extraction_spark.operators.extract_text import (  # noqa: F401
    explode_sentences, extract_text,
)
from fact_extraction_spark.operators.lexical_patterns import (
    candidate_windows, cap_training_facts, learn_lexical_patterns,
)
from fact_extraction_spark.operators.link_ranking import (
    build_entity_profiles, compute_idf, disambiguate_mentions,
)
from fact_extraction_spark.operators.mentions import (
    _mapside_union, alias_join_keys, anchor_mention_rows,
    anchor_windows_relational,
    build_alias_candidates, collect_alias_broadcast,
    collect_redirect_map,
    fused_anchor_mentions, fused_anchor_windows,
    fused_sentence_hits_and_anchors, hot_hits, split_alias_dictionary,
)
from fact_extraction_spark.operators.mentions import resolve_redirects
from fact_extraction_spark.operators.scoring import score_candidates
from fact_extraction_spark.operators.type_patterns import learn_type_patterns

logger = logging.getLogger(__name__)


@dataclass
class PipelineConfig:
    """Engine knobs; defaults mirror config-default.ini + code defaults
    (see BASELINE.md reference-envelope table)."""

    relation_whitelist: list[str] | None = None     # config relation_types
    facts_limit: int = 2000                         # per relation
    relation_types_limit: int = 50
    articles_limit: int = 5000
    match_threshold: float = 0.5                    # config-default.ini:28
                                                    # (code default is 0.005,
                                                    # fact_extractor.py:18)
    allow_unknown_entity_types: bool = True
    # type_matching=False reproduces fact_extractor.py:123-147 +
    # pattern_matcher.py:24-25: NO reasonable-relations gate (every learned
    # relation is considered) and the match score is the pattern-intersection
    # (syntax) score ALONE — no type scores, no position term, no weighted
    # mean. The discovery-resource type gate stays active either way
    # (_load_discovery_resources applies it unconditionally,
    # fact_extractor.py:68-85).
    type_matching: bool = True
    window: int = 4                                 # lexical analogue of depth=2
    subject_minimum: float = 0.05                   # type-count cleaning
    object_minimum: float = 0.05
    least_threshold_words: float = 2
    least_threshold_types: float = 1
    lang: str | None = "en"
    # "anchors": reference-parity tagging (hyperlink targets ARE the links).
    # "dictionary": north-star stage 2 — Aho-Corasick over the broadcast
    # alias dictionary + tf-idf context-similarity disambiguation (stage 2b).
    mention_mode: str = "anchors"
    max_profile_words: int = 64
    # Dictionary-mode detection strategy:
    # "auto" (default) — count the (alias, entity) pairs (one agg over a
    #   dimension table) and pick: "broadcast" under
    #   ``dictionary_auto_threshold`` pairs (mapside's two extra shuffles
    #   are pure overhead on a small dictionary), "mapside" above.
    # "mapside" — bounded hot-head automaton broadcast + relational
    #   n-gram join against the long-tail alias table; the full dictionary is
    #   NEVER collected to the driver (at 10^7 aliases the full collect is a
    #   multi-GB driver materialization + per-executor Python dict).
    # "broadcast" — collect the whole dictionary into one automaton; fastest
    #   when the dictionary is known-small (tests, bounded domains).
    dictionary_strategy: str = "auto"
    dictionary_auto_threshold: int = 200_000   # pairs; "auto" switch point
    # Dictionary mode only: also scan sentences WITHOUT any anchor link.
    # The reference-parity keeps-a-link sentence filter
    # (tagged_sentence.py:156,167-173) makes sense for anchor-supervised
    # extraction, but Common-Crawl-style pages carry no wiki anchors at
    # all — with this flag the AC/dictionary pass covers every extracted
    # sentence. Off by default so dictionary-mode output stays directly
    # comparable to anchors mode on the same corpus.
    dictionary_scan_unanchored: bool = False
    dictionary_hot_k: int = 100_000      # head size (aliases, not pairs)
    max_tail_tokens: int = 6             # n-gram bound for the tail join
    # Dictionary-mode sentence pruning: drop sentences with no automaton
    # hit, no anchor mention and no possible tail-alias start INSIDE the
    # scan UDF — on web-shaped pages the filler majority, whose tokens then
    # never cross Arrow, never enter the sentence persist and never reach
    # the n-gram explode. Semantics-neutral (every downstream consumer
    # filters on one of the three); in mapside mode it needs the tail's
    # first-token set broadcast, gated by
    # dictionary_first_token_broadcast_rows (the set is orders of magnitude
    # smaller than the dictionary — aliases share first tokens — and the
    # old posexplode path broadcast the very same set for its semi-join).
    dictionary_prune_sentences: bool = True
    dictionary_first_token_broadcast_rows: int = 2_000_000
    # Anchors-mode redirect resolution:
    # "broadcast" (default) — match-time Python dict from a bounded
    #   driver collect; fastest while the redirect table fits comfortably.
    # "join" — zero driver state: the UDF emits unresolved spans and
    #   resolution/dedup/self-link happen relationally (Catalyst picks
    #   broadcast vs shuffle by the redirect table's size). Use at
    #   dictionary sizes where a per-executor Python dict stops being sane.
    redirect_strategy: str = "broadcast"
    # windows⋈training-facts join strategy (SURVEY north star "salted joins
    # + AQE"): "broadcast" (the capped fact table is small), "salted" for
    # uncapped fact sets too big to broadcast — routes mega-entity keys
    # (>= salt_hot_min_count window rows) through the explicit skew-split
    # salted join while the tail shuffle-joins plainly — or "auto"
    # (default), which mirrors the dictionary auto switch: ONE count over
    # the already-cached capped fact table picks broadcast below
    # training_join_auto_threshold rows and salted above it. AQE skew-join
    # (on in session.py) remains the runtime backstop either way.
    training_join_strategy: str = "auto"
    # rows; ~(subj,pred,obj) triples broadcast comfortably well past 10^6 —
    # at 2M short-string rows the broadcast is O(100 MB), still cheaper
    # than shuffling a corpus-sized window table
    training_join_auto_threshold: int = 2_000_000
    salt_hot_min_count: int = 100_000
    # discovery gating (select_discovery_pages): max size of the EXCLUDED
    # title set (training subjects ∪ gate-failing typed entities) for the
    # broadcast anti-join strategy that keeps the html-bearing pages table
    # out of every exchange; above it, the slim semi-join fallback runs
    discovery_exclude_broadcast_rows: int = 2_000_000
    # int-url scoring persist (VERDICT r5 Next #3): hash-encode the url
    # through the slim scoring persist (SLIM_KEY_INT) and re-attach
    # url/subject after the threshold filter via the url dimension. The
    # next bytes-per-candidate lever after the slot-word hashing; gated
    # behind a flag for the measured A/B on the scale corpus.
    scoring_int_url: bool = False
    # config-default.ini:19 — 0 means learn type patterns over ALL facts
    type_learner_facts_limit: int = 0
    # config-default.ini:8; the reference's invariant asserts guard a
    # pattern TREE (pattern.py:144-155) — the monoid groupBy merge has no
    # tree to validate, so the flag is parsed for parity but inert
    perform_tests: bool = False
    # Canonicalize triple subjects/objects through the connected-components
    # alias graph (redirects + capitalize variants) before the sink —
    # SURVEY §3.3 step 6 / §7.1 last box. Off by default: anchors-mode
    # extraction already resolves redirects + applies the capitalize hotfix
    # at mention time, so canonicalization only changes output when the
    # corpus contains alias-titled pages (subjects) or multi-step chains the
    # per-mention pass missed.
    canonicalize_output: bool = False
    # Global score ordering of the extract output is presentation-layer work
    # (the reference sorts once at print time, fact_extractor.py:208): at
    # corpus scale a full sort is an extra all-to-all Exchange of the result,
    # so the hot path leaves it off and sinks do sortWithinPartitions.
    sort_output: bool = False


@dataclass
class LearnedModel:
    pattern_words: DataFrame
    pattern_stats: DataFrame
    pattern_types: DataFrame
    type_probs: DataFrame
    rel_stats: DataFrame
    training_subjects: DataFrame
    extras: dict = field(default_factory=dict)

    def cache(self) -> "LearnedModel":
        for df in (self.pattern_words, self.pattern_stats, self.pattern_types,
                   self.type_probs, self.rel_stats, self.training_subjects):
            df.cache()
        return self

    def unpersist(self) -> "LearnedModel":
        extra_dfs = [v[0] for k, v in self.extras.items()
                     if isinstance(k, tuple) and k
                     and k[0] == "discovery_excluded"]
        for df in (self.pattern_words, self.pattern_stats, self.pattern_types,
                   self.type_probs, self.rel_stats, self.training_subjects,
                   *extra_dfs):
            try:
                df.unpersist()
            except Exception:
                pass
        return self


def _build_dict_ctx(spark: SparkSession, pages: DataFrame,
                    redirects: DataFrame, cfg: "PipelineConfig",
                    cands: DataFrame | None = None,
                    extras: dict | None = None) -> dict:
    """Dictionary-mode detection context per cfg.dictionary_strategy.

    ``cands`` overrides the derived (alias, entity) candidate table —
    used by dict_scale_bench.py to sweep dictionary sizes on a fixed
    corpus when locating the broadcast/mapside crossover.

    ``extras`` (a LearnedModel.extras dict) memoizes the built context per
    (strategy knobs, pages, redirects) WITHIN the model's lifetime — the
    same per-model reuse pattern as the discovery-excluded cache: the
    context is a pure function of (pages, redirects, strategy knobs), so a
    second extract over the same model and tables (e.g. the anchored and
    unanchored dictionary bench legs) skips the alias-candidate build, the
    redirect fixpoint loop, the ambiguity aggregation and the head/tail
    collects. Keyed with the table objects PINNED and identity-checked
    (the id-recycling rule every cache here follows); dimension persists
    are re-pinned on hit because cache releases between legs may have
    dropped them."""
    ctx_key = None
    if extras is not None and cands is None:
        ctx_key = ("dict_ctx", cfg.dictionary_strategy,
                   cfg.dictionary_auto_threshold, cfg.dictionary_hot_k,
                   cfg.max_tail_tokens, cfg.dictionary_prune_sentences,
                   cfg.dictionary_first_token_broadcast_rows)
        cached = extras.get(ctx_key)
        if (cached is not None and cached[1] is pages
                and cached[2] is redirects):
            ctx = cached[0]
            track(ctx["ambiguous"].persist())
            if ctx["mode"] == "mapside":
                track(ctx["tail"].persist())
            return ctx
    if cands is None:
        cands = build_alias_candidates(pages, redirects)
    # AMBIGUITY is a dictionary-side property: an alias needs tf-idf
    # disambiguation iff its MATCH KEY maps to >1 entity. Matching happens
    # in token space (the automaton keys tokenized aliases; the mapside
    # tail joins on the tokenizer-space ``key``), so two distinct alias
    # strings that tokenize identically ("Foo -Bar" / "Foo - Bar") hit the
    # same span — grouping by the raw alias string would class each as
    # unambiguous and emit both entities for one mention. Group by the
    # tokenized key instead, then project back to alias strings so the
    # hit-side split below stays a broadcast semi/anti join on ``alias``.
    # Two dimension-table aggs; every hit on an unambiguous key bypasses
    # the whole ranking subplan (profiles, idf, context vectors, cosine,
    # per-span window) with identical semantics — top-1 of a single
    # candidate is that candidate regardless of score.
    # the tokenized-key dimension feeds MANY derived jobs (ambiguity agg,
    # the has_ambiguous probe, the head/tail split's filters, the hot-head
    # top-k and the head collect) — each would otherwise re-run the
    # candidate build + tokenizing UDF chain; persist it once, eagerly
    keyed = track(alias_join_keys(cands).persist())
    keyed.count()
    amb_keys = (keyed.groupBy("key")
                .agg(F.countDistinct("entity").alias("_n"))
                .filter(F.col("_n") > 1).select("key"))
    ambiguous = track(
        keyed.join(F.broadcast(amb_keys), "key", "left_semi")
        .select("alias").distinct()
        .persist())
    strategy = cfg.dictionary_strategy
    if strategy == "auto":
        # one count over a dimension table decides the switch: under the
        # threshold the full-dictionary broadcast wins (mapside's n-gram
        # explode + two joins are pure overhead); above it the bounded-head
        # mapside path is the only sane shape
        n_pairs = cands.count()
        strategy = ("broadcast" if n_pairs <= cfg.dictionary_auto_threshold
                    else "mapside")
        logger.info("dictionary_strategy=auto: %d alias pairs -> %s",
                    n_pairs, strategy)
    if strategy == "broadcast":
        ctx = {"mode": "broadcast", "ambiguous": ambiguous,
               "alias_bc": collect_alias_broadcast(spark, cands),
               "has_ambiguous": ambiguous.limit(1).count() > 0}
        if ctx_key is not None:
            extras[ctx_key] = (ctx, pages, redirects)
        return ctx
    head, tail = split_alias_dictionary(
        cands, hot_k=cfg.dictionary_hot_k,
        max_tail_tokens=cfg.max_tail_tokens, keyed=keyed)
    # the ONLY driver materialization is the bounded head (≤ hot_k aliases
    # + the rare >max_tail_tokens ones); the tail stays a DataFrame
    head_bc = collect_alias_broadcast(spark, head.select("alias", "entity"))
    # make the promised bound OBSERVABLE: aliases longer than
    # max_tail_tokens bypass hot_k unconditionally, so a long-alias-heavy
    # dictionary can still blow up the driver — warn instead of failing
    # silently (raise max_tail_tokens or pre-filter junk aliases upstream)
    n_head = len(head_bc.value)
    if n_head > 2 * cfg.dictionary_hot_k:
        logger.warning(
            "map-side dictionary head holds %d pairs (> 2x hot_k=%d): the "
            "long-alias overflow (> max_tail_tokens=%d tokens) dominates; "
            "consider raising max_tail_tokens", n_head,
            cfg.dictionary_hot_k, cfg.max_tail_tokens)
    tail_keyed = track(tail.select("alias", "entity", "key").persist())
    # first-token set (in-scan candidate marking) + witness set (sentence-
    # level match gate, one selective token per tail alias) — both None
    # when pruning is off or the set exceeds the broadcast bound; the tail
    # join then falls back to posexplode + semi-join / ungated scanning
    ft_bc = wit_bc = tail_known_empty = None
    if cfg.dictionary_prune_sentences:
        from fact_extraction_spark.operators.mentions import (
            collect_tail_broadcasts)
        bound = cfg.dictionary_first_token_broadcast_rows
        ft_bc, wit_bc, tail_known_empty = collect_tail_broadcasts(
            tail_keyed, bound)
    ctx = {"mode": "mapside", "head_bc": head_bc, "ambiguous": ambiguous,
           "tail": tail_keyed, "first_tok_bc": ft_bc, "witness_bc": wit_bc,
           # probed once at build; spares every extract _mapside_union's
           # own limit(1) emptiness job (None = unknown, probe as before)
           "tail_empty": tail_known_empty,
           # materialized once at build; spares every extract the
           # per-call limit(1) probe of the ambiguous-alias dimension
           "has_ambiguous": ambiguous.limit(1).count() > 0}
    if ctx_key is not None:
        extras[ctx_key] = (ctx, pages, redirects)
    return ctx


def _page_mentions(pages: DataFrame, redirect_map_bc, lang: str | None,
                   dict_ctx: dict | None = None,
                   cfg: "PipelineConfig | None" = None) -> DataFrame:
    """pages → mention rows, excluding self-links (page linking itself,
    wikipedia_pattern_extractor.py:189-192 ``res != entity``).

    With ``dict_ctx`` set (mention_mode="dictionary"), runs the north-star
    stage 2: Aho-Corasick detection over the alias dictionary (full
    broadcast or hot-head + relational tail, per dict_ctx["mode"]), then
    tf-idf context-similarity disambiguation (stage 2b) with entity profiles
    built from the trusted anchor-tagged mentions of the same pages.
    """
    if dict_ctx is None:
        # ONE ArrowEvalPython node for the whole html→mentions chain: three
        # chained pandas UDFs would each get their own python worker per
        # task (3× processes, 2 extra Arrow round-trips of the full text)
        # and anti-scale at high core counts (see fused_anchor_mentions)
        mentions = fused_anchor_mentions(pages, redirect_map_bc, lang=lang)
    else:
        # ONE corpus pass yields both the dictionary candidates (automaton
        # hits) and the trusted anchor mentions that build the tf-idf
        # ranking profiles — running them as two fused UDFs costs a second
        # full html→sentences pass over the corpus
        head_bc = (dict_ctx["alias_bc"] if dict_ctx["mode"] == "broadcast"
                   else dict_ctx["head_bc"])
        # prune filler sentences in the scan UDF whenever the tail is
        # covered: broadcast mode has no tail (the head IS the full
        # dictionary), mapside mode needs the first-token set broadcast
        ft_bc = dict_ctx.get("first_tok_bc")
        wit_bc = dict_ctx.get("witness_bc")
        no_tail = dict_ctx["mode"] == "broadcast"
        prune = bool(cfg.dictionary_prune_sentences if cfg else True) and (
            no_tail or ft_bc is not None)
        sent = track(fused_sentence_hits_and_anchors(
            pages, head_bc, redirect_map_bc, lang=lang,
            include_unanchored=(cfg.dictionary_scan_unanchored if cfg
                                else False),
            first_tok_bc=ft_bc, prune_empty=prune,
            witness_bc=wit_bc, no_tail=no_tail).persist())
        # EAGER cache fill: the sentence rows feed several INDEPENDENT
        # subtrees of the downstream action (hot hits, candidate positions,
        # the tail join-back, anchor-mention profiles, the ambiguous/
        # unambiguous splits) — independent stages of one job run
        # concurrently, and each that reaches an unfilled cache partition
        # recomputes the whole html→scan UDF chain for it. One count()
        # executes the corpus scan exactly once; every branch then reads
        # the cache (the round-2 windows-persist lesson applied to the
        # scan persist).
        sent.count()
        if dict_ctx["mode"] == "broadcast":
            candidates = hot_hits(sent)
        else:
            candidates = _mapside_union(
                sent.select("url", "sent_id", "rel_pos", "tokens", "hits",
                            "cand"),
                dict_ctx["tail"],
                (cfg.max_tail_tokens if cfg else 6),
                use_cand=ft_bc is not None,
                tail_empty=dict_ctx.get("tail_empty"))
        # stage 2b runs ONLY over hits of ambiguous aliases (dictionary-side
        # split, see _build_dict_ctx); unambiguous hits pass through — the
        # ranking subplan's corpus-sized shuffles shrink to the ambiguous
        # slice, and when the dictionary has no ambiguity at all the
        # profile/idf build is skipped outright (one dimension-table probe).
        amb = dict_ctx["ambiguous"]
        cols = ["url", "sent_id", "rel_pos", "tokens", "start", "end",
                "entity"]
        has_amb = dict_ctx.get("has_ambiguous")
        if has_amb is None:
            has_amb = amb.limit(1).count() > 0
        if not has_amb:
            mentions = candidates.select(*cols)
        else:
            amb_b = F.broadcast(amb)
            unambig = candidates.join(amb_b, "alias", "left_anti") \
                .select(*cols)
            ambig = candidates.join(amb_b, "alias", "left_semi")
            anchor_mentions = anchor_mention_rows(sent)
            profiles = track(build_entity_profiles(
                anchor_mentions,
                max_profile_words=(cfg.max_profile_words if cfg else 64))
                .persist())
            idf = compute_idf(profiles)
            ranked = disambiguate_mentions(ambig, profiles, idf) \
                .drop("link_score")
            mentions = unambig.unionByName(ranked.select(*cols))
        # no stage boundary HERE: the caller's windows persist+count right
        # after candidate_windows() is the boundary (same recompute
        # protection), and the windows rows are far smaller than mention
        # rows carrying full sentence tokens — the round-3 eager
        # localCheckpoint at this spot wrote every mention row (tokens
        # included) to local disk before windowing, 2.85× the anchors-mode
        # extract (VERDICT r3 "What's wrong" #2). On a cluster the committed
        # table between stages is the windows table (sinks/snapshot).
    return mentions.filter(
        F.col("entity") != capitalize_first(strip_name("url")))


def learn(
    spark: SparkSession,
    pages: DataFrame,
    facts: DataFrame,
    types: DataFrame,
    redirects: DataFrame,
    cfg: PipelineConfig | None = None,
    exclude_subjects: DataFrame | None = None,
) -> LearnedModel:
    """Train type patterns + lexical patterns."""
    cfg = cfg or PipelineConfig()

    training_facts = track(cap_training_facts(
        facts,
        relation_whitelist=cfg.relation_whitelist,
        facts_limit=cfg.facts_limit,
        relation_types_limit=cfg.relation_types_limit,
        exclude_subjects=exclude_subjects,
    ).cache())
    training_subjects = training_facts.select("subj").distinct()

    # filtered-index semantics (wikipedia_dump_index_creator.py:41-57):
    # only articles that are training-fact subjects are read further.
    train_urls = training_subjects.select(
        F.concat(F.lit("https://en.wikipedia.org/wiki/"), F.col("subj")).alias("url"))
    train_pages = pages.join(train_urls, "url", "left_semi")

    redirect_map_bc = None
    if cfg.mention_mode != "anchors" or cfg.redirect_strategy == "broadcast":
        redirect_map_bc = collect_redirect_map(spark, redirects)
    dict_ctx = None
    if cfg.mention_mode == "dictionary":
        dict_ctx = _build_dict_ctx(spark, pages, redirects, cfg)
    extras = {"redirect_map_bc": redirect_map_bc, "dict_ctx": dict_ctx}
    # windows feed several downstream aggregates (pattern words / stats /
    # types); persist so the UDF chain runs once, not once per model table.
    # Anchors mode takes the single-pass nested-row path (html → candidate
    # rows in one mapInPandas, two fewer corpus-sized shuffles); dictionary
    # mode needs per-sentence tokens for tf-idf ranking, so it keeps the
    # mention-row path.
    if cfg.mention_mode == "anchors":
        if cfg.redirect_strategy == "join":
            windows = anchor_windows_relational(
                train_pages, redirects, lang=cfg.lang,
                window=cfg.window).persist()
        else:
            windows = fused_anchor_windows(
                train_pages, redirect_map_bc, lang=cfg.lang,
                window=cfg.window).persist()
    else:
        mentions = _page_mentions(train_pages, redirect_map_bc, cfg.lang,
                                  dict_ctx, cfg)
        windows = candidate_windows(mentions, window=cfg.window).persist()
    # EAGER stage boundary: fill the persist before the multi-branch
    # aggregation DAG runs. A lazily-persisted windows under concurrently
    # submitted downstream stages makes every stage find the cache unfilled
    # and re-run the whole html→windows UDF chain (measured 5-10× on the
    # capped extract, VERDICT r2 #3) — one count() materializes it once.
    track(windows).count()

    join_strategy = cfg.training_join_strategy
    if join_strategy == "auto":
        # one count over the already-cached capped fact table decides;
        # mirrors the dictionary auto switch (_build_dict_ctx)
        n_facts = training_facts.count()
        join_strategy = ("broadcast"
                         if n_facts <= cfg.training_join_auto_threshold
                         else "salted")
        logger.info("training_join_strategy=auto: %d capped facts -> %s",
                    n_facts, join_strategy)
    learned = learn_lexical_patterns(
        windows, training_facts, types,
        least_threshold_words=cfg.least_threshold_words,
        least_threshold_types=cfg.least_threshold_types,
        join_strategy=join_strategy,
        salt_hot_min_count=cfg.salt_hot_min_count,
    )
    # type patterns are learned over the full fact set by default, as the
    # type_learner does with facts_limit=0 (config-default.ini:19); a
    # non-zero limit caps facts per relation first (type_learner.py:41-49)
    type_facts = facts
    if cfg.type_learner_facts_limit:
        type_facts = cap_training_facts(
            facts, facts_limit=cfg.type_learner_facts_limit,
            relation_types_limit=1_000_000)
    type_probs, rel_stats = learn_type_patterns(
        type_facts, types,
        subject_minimum=cfg.subject_minimum,
        object_minimum=cfg.object_minimum,
    )
    return LearnedModel(
        pattern_words=learned["pattern_words"],
        pattern_stats=learned["pattern_stats"],
        pattern_types=learned["pattern_types"],
        type_probs=type_probs,
        rel_stats=rel_stats,
        training_subjects=training_subjects,
        extras={"training_instances": learned["training_instances"], **extras},
    ).cache()


def select_discovery_pages(
    pages: DataFrame,
    model: LearnedModel,
    types: DataFrame,
    cfg: PipelineConfig,
) -> DataFrame:
    """Discovery corpus (fact_extractor.py:68-85 semantics): pages whose
    title is not a training subject and whose types intersect the learned
    subject-type gate (or are unknown, when allowed). Deterministic
    ``articles_limit`` cap by url order (divergence: reference is
    file-order).

    Shape for scale: the gate usually KEEPS almost the whole corpus (it
    only drops training subjects and wrong-typed entities), so expressing
    it as ``pages semi-join keep`` shuffles the html-bearing pages table
    against a corpus-sized url set — measured as a SortMergeJoin exchanging
    every html payload both ways (the single biggest byte-mover in the
    extract plan). Instead, when the EXCLUDED side is dimension-derivable
    (``allow_unknown_entity_types``, the default), gate with a broadcast
    ANTI-join against the excluded titles (training subjects ∪ typed
    entities whose types miss the subject gate): html then never leaves
    its scan stage — the mapInPandas extraction fuses directly onto the
    parquet scan with zero page-table exchange. One dimension-side count
    picks the strategy; above ``discovery_exclude_broadcast_rows`` (or with
    ``articles_limit``, whose kept set is already a bounded broadcast) the
    original slim semi-join path runs instead. At 10^12 documents the
    right layout is pages bucketed by url so even that fallback semi-join
    is co-located and exchange-free."""
    titled = pages.select("url").withColumn(
        "title", capitalize_first(strip_name("url")))
    training_titles = model.training_subjects.select(
        F.col("subj").alias("title"))

    valid_types = model.pattern_types.filter(
        F.col("side") == "subject").select("type").distinct()
    typed_ok = (
        types.join(F.broadcast(valid_types), "type")
        .select(F.col("entity").alias("title")).distinct()
    )

    if not cfg.articles_limit and cfg.allow_unknown_entity_types:
        # inverted gate: keep ⇔ title ∉ (training ∪ typed-but-gate-failing)
        # — identical semantics (¬training ∧ (typed_ok ∨ untyped) ⇔
        # ¬(training ∨ (typed ∧ ¬typed_ok))), but the join against the
        # html-bearing pages is a broadcast anti instead of a shuffled semi.
        # The excluded dim depends only on (model, types), so it is built,
        # persisted and counted ONCE per model and shared by every extract
        # over it (multiple bench legs, repeated extracts, the dictionary
        # path's several actions) — the per-extract fixed cost of the
        # inversion is zero after the first call. Keyed on id(types) so a
        # caller passing a different types table gets a fresh set; the
        # cached tuple also PINS the keying DataFrame, so CPython cannot
        # recycle its id() for a different types table while the entry
        # lives (id reuse after GC would silently serve a stale excluded
        # set); an identity check backstops any other collision. Released
        # by model.unpersist().
        cache_key = ("discovery_excluded", id(types))
        cached = model.extras.get(cache_key)
        if cached is not None and cached[2] is not types:
            cached = None
        if cached is None:
            typed_ent = types.select(
                F.col("entity").alias("title")).distinct()
            typed_not_ok = typed_ent.join(typed_ok, "title", "left_anti")
            excluded = (training_titles.unionByName(typed_not_ok)
                        .distinct().persist())
            cached = (excluded, excluded.count(), types)
            model.extras[cache_key] = cached
        excluded, n_excluded = cached[0], cached[1]
        if n_excluded <= cfg.discovery_exclude_broadcast_rows:
            return (
                pages.withColumn(
                    "title", capitalize_first(strip_name("url")))
                .join(F.broadcast(excluded), "title", "left_anti")
                .drop("title"))

    non_training = titled.join(training_titles, "title", "left_anti")
    gated = non_training.join(typed_ok, "title", "left_semi")
    if cfg.allow_unknown_entity_types:
        untyped = non_training.join(
            types.select(F.col("entity").alias("title")).distinct(),
            "title", "left_anti")
        gated = gated.unionByName(untyped)
    keep = gated.select("url")
    if cfg.articles_limit:
        # Distributed top-k: orderBy+limit on a slim (url) projection plans
        # as TakeOrderedAndProject (per-partition top-k, then one merge of k
        # rows) — NOT a row_number over an unpartitioned window, which would
        # funnel the whole discovery corpus through a single task. The kept
        # url set is at most articles_limit rows, so the semi-join back is a
        # broadcast.
        keep = F.broadcast(keep.orderBy("url").limit(cfg.articles_limit))
    return pages.join(keep, "url", "left_semi")


def extract(
    spark: SparkSession,
    pages: DataFrame,
    model: LearnedModel,
    types: DataFrame,
    redirects: DataFrame,
    cfg: PipelineConfig | None = None,
    known_facts: DataFrame | None = None,
) -> DataFrame:
    """Run extraction over discovery pages → triples with evidence.

    Output: (subj, pred, obj, score, url, sent_id, rel_pos). With
    ``cfg.sort_output`` the result is globally ordered by score desc (the
    intent of fact_extractor.py:208 — the reference line sorts by the
    subject's 4th character, a documented bug we fix); by default ordering
    is left to the presentation/export layer so the hot path has no global
    Exchange for a sort nobody consumes.
    """
    cfg = cfg or PipelineConfig()
    discovery = select_discovery_pages(pages, model, types, cfg)

    # reuse the broadcasts learn() already built (redirect resolution is an
    # iterative driver loop — a fixed serial cost worth paying exactly once)
    needs_rmap = (cfg.mention_mode != "anchors"
                  or cfg.redirect_strategy == "broadcast")
    redirect_map_bc = model.extras.get("redirect_map_bc")
    if needs_rmap and redirect_map_bc is None:
        redirect_map_bc = collect_redirect_map(spark, redirects)
    dict_ctx = model.extras.get("dict_ctx")
    if cfg.mention_mode == "dictionary" and dict_ctx is None:
        dict_ctx = _build_dict_ctx(spark, pages, redirects, cfg,
                                   extras=model.extras)
    if cfg.mention_mode != "dictionary":
        dict_ctx = None
    # scoring fans out over windows (candidate keys + slot-word matches);
    # persist so the extraction UDF chain executes once. redlink drop =
    # fact_extractor.py:189-191. The persist holds the SLIM scoring schema
    # (slot words hash-encoded to int64, nested strings dropped) — scoring
    # is the only consumer and the job is memory-bandwidth-bound, so every
    # byte not in this table is a byte every scoring pass doesn't re-read.
    from fact_extraction_spark.operators.scoring import slim_score_windows
    if cfg.mention_mode == "anchors":
        if cfg.redirect_strategy == "join":
            windows = anchor_windows_relational(
                discovery, redirects, lang=cfg.lang,
                window=cfg.window, drop_redlinks=True)
        else:
            windows = fused_anchor_windows(
                discovery, redirect_map_bc, lang=cfg.lang,
                window=cfg.window, drop_redlinks=True)
    else:
        mentions = _page_mentions(discovery, redirect_map_bc, cfg.lang,
                                  dict_ctx, cfg)
        mentions = mentions.filter(~F.col("entity").contains("redlink=1"))
        windows = candidate_windows(mentions, window=cfg.window)
    url_map = None
    if cfg.scoring_int_url:
        # url dimension (url_id, url, subject) from the column-pruned
        # discovery scan; persisted — consumed by the subject side-table
        # build and the post-threshold string re-attach
        from fact_extraction_spark.operators.scoring import url_dim
        url_map = track(url_dim(discovery).persist())
    windows = slim_score_windows(
        windows, int_url=cfg.scoring_int_url).persist()
    # EAGER stage boundary (VERDICT r2 #3): score_candidates submits several
    # stages over ``windows`` concurrently; if the persist is still lazy,
    # each finds the cache unfilled and re-runs the full html→windows chain
    # plus the discovery subtree (measured 178 s vs 19 s on the capped
    # bench leg). One count() fills the cache exactly once.
    track(windows).count()

    scored = score_candidates(
        windows,
        model.pattern_words, model.pattern_stats, model.pattern_types,
        model.type_probs, model.rel_stats, types,
        allow_unknown_entity_types=cfg.allow_unknown_entity_types,
        match_threshold=cfg.match_threshold,
        type_matching=cfg.type_matching,
        url_map=url_map,
    )
    if known_facts is not None:
        # new-fact subtraction (pattern_recognition/fact_cleaner.py:15-25)
        scored = scored.join(known_facts.select("subj", "pred", "obj"),
                             ["subj", "pred", "obj"], "left_anti")
    if cfg.canonicalize_output:
        # SURVEY §3.3 step 6: rewrite co-referent subject/object names to a
        # canonical representative via connected components over the alias
        # graph (resolved redirects + capitalize variants). Preferred
        # representatives: resolved redirect TARGETS (canonical by
        # definition) plus page titles that are not themselves redirect
        # aliases (a page titled with an alias — e.g. an alias-titled
        # mirror — is non-canonical, which is exactly the case this pass
        # exists to fix: its triples must surface under the real name).
        from fact_extraction_spark.operators.canonicalize import (
            build_equivalence_edges, canonical_mapping, canonicalize_triples)
        resolved = resolve_redirects(redirects).select("alias", "target")
        edges = build_equivalence_edges(resolved)
        titles = pages.select(
            capitalize_first(strip_name("url")).alias("name")).distinct()
        aliases = resolved.select(capitalize_first("alias").alias("name"))
        targets = resolved.select(capitalize_first("target").alias("name"))
        preferred = targets.unionByName(
            titles.join(aliases, "name", "left_anti")).distinct()
        mapping = canonical_mapping(edges, preferred=preferred)
        scored = canonicalize_triples(scored, mapping)
    if cfg.sort_output:
        scored = scored.orderBy(F.desc("score"), "subj", "pred", "obj")
    return scored
