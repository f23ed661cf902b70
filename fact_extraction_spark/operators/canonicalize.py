"""Canonicalization: resolve co-referent entity names via connected components.

Generalizes the reference's one-hop alias fixes — redirect substitution
(/root/reference/data_cleaning/redirects_substitutor.py:52-64) and the
capitalize hotfix (wikipedia_connector/tagged_sentence.py:232-233,
helper_functions/uri_rewriting.py:49-58) — into a single graph pass: build
an ``edges(src, dst)`` DataFrame of name-equivalences (redirects, case
variants, co-mention aliases), compute connected components iteratively,
and rewrite triple subjects/objects to each component's canonical
representative.

The CC loop is driver-coordinated min-label propagation with
``localCheckpoint`` per iteration to cut lineage (SURVEY.md §4 item 3);
alias chains are short, so it converges in a handful of rounds. A fixpoint
guard caps iterations and asserts convergence (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """edges(src, dst) → (vertex, component) with component = min vertex id
    (lexicographic) of the component.

    Min-label propagation over the symmetrized edge set; each round is one
    join + one aggregation. Component diameter bounds round count.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.vertex)
            .groupBy("src").agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.src, "left")
            .select(
                "vertex",
                F.least(F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component"))
                        ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("changed")).limit(1).count()
        labels = updated.drop("changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds")
    return labels


def build_equivalence_edges(redirects: DataFrame,
                            extra_edges: DataFrame | None = None) -> DataFrame:
    """Name-equivalence edges: resolved redirects + first-letter case
    variants (+ caller-provided co-reference edges)."""
    rd = redirects.select(F.col("alias").alias("src"),
                          F.col("target").alias("dst"))
    case = redirects.select(F.col("alias").alias("name")).unionByName(
        redirects.select(F.col("target").alias("name"))).distinct()
    case_edges = case.select(
        F.col("name").alias("src"),
        F.concat(F.upper(F.substring("name", 1, 1)),
                 F.substring("name", 2, 2_000_000)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = rd.unionByName(case_edges)
    if extra_edges is not None:
        edges = edges.unionByName(extra_edges.select("src", "dst"))
    return edges


def canonical_mapping(edges: DataFrame,
                      preferred: DataFrame | None = None) -> DataFrame:
    """(name, canonical): every name in the edge graph mapped to its
    component representative.

    ``preferred`` (one column ``name``, e.g. real page titles): if a
    component contains preferred names, its representative is the smallest
    preferred one; otherwise the component min.
    """
    comps = connected_components(edges)
    if preferred is None:
        return comps.select(F.col("vertex").alias("name"),
                            F.col("component").alias("canonical"))
    pref = comps.join(preferred.select(F.col("name").alias("vertex")), "vertex") \
        .groupBy("component").agg(F.min("vertex").alias("rep"))
    return (
        comps.join(pref, "component", "left")
        .select(
            F.col("vertex").alias("name"),
            F.coalesce(F.col("rep"), F.col("component")).alias("canonical"),
        )
    )


def canonicalize_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj and obj through the canonical mapping (identity on
    names outside the graph). The mapping is a broadcast dim."""
    m = F.broadcast(mapping)
    out = (
        triples.join(m.withColumnRenamed("name", "subj")
                     .withColumnRenamed("canonical", "_cs"), "subj", "left")
        .join(m.withColumnRenamed("name", "obj")
              .withColumnRenamed("canonical", "_co"), "obj", "left")
    )
    return out.select(
        F.coalesce("_cs", "subj").alias("subj"),
        "pred",
        F.coalesce("_co", "obj").alias("obj"),
        *[c for c in triples.columns if c not in ("subj", "pred", "obj")],
    )
