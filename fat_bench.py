"""Fat-page throughput bench: text-stage cost at the realistic web shape.

The headline corpora are compact (~0.4 KB/page) because the reference's
fixture sentences are; real web/wiki pages are tens of KB with the fact
sentences a tiny fraction of bytes. At 100 TB the engine's bill is paid
per BYTE of the html→text cascade, not per page, so the scale-honest
metric is MB/s of raw wikitext through the full extract plan.

Protocol (same hygiene as ab_bench.py): two corpora at the SAME
(seed, n_persons) — thin (fat_kb=0) and fat (fat_kb=FAT_KB, default 16 KiB
of deterministic unanchored filler per page; see fixtures._filler_paragraphs)
— each with its own learned model (the models are semantically identical:
the filler adds no facts/links, pinned by test_fat_pages). extract() runs
in ALTERNATING legs FAT_PAIRS times with caches cleared between legs.

FAT_LEG selects the measured path:
  * "extract" (default) — anchors-mode extract, the headline plan.
  * "dict_unanchored" — the Common-Crawl shape: every [[...]] anchor is
    stripped from the pages, mentions come from the Aho-Corasick
    dictionary, and dictionary_scan_unanchored lifts the keeps-a-link
    filter so EVERY sentence (filler included) crosses the automaton.
    This is the honest anchor-free web-text cost: MB/s here is what a
    crawl corpus would pay. The model is still learned from the anchored
    corpus (patterns need supervision); only discovery pages are stripped.
Thin/fat triple identity holds on BOTH legs: filler sentences contain no
dictionary alias (aliases are full "First Lastcompound" strings; filler
uses bare first names + a lowercase vocabulary), so filler mentions are
impossible — the assert below re-proves it at bench scale.
Reports per-variant {median, best, runs} seconds plus raw-MB, MB/s and the
MARGINAL cascade throughput (fat_MB-thin_MB)/(fat_s-thin_s) — the per-byte
cost of pure filler text, which is the number that extrapolates to a web
corpus. Triple counts are asserted identical thin vs fat (the filler must
be invisible to extraction). Appends a table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SEED = 42


def _ensure(spark, n_persons: int, fat_kb: int, partitions: int,
            inert: bool = False) -> str:
    from fact_extraction_spark.fixtures import generate_bench_corpus
    out = (f"/tmp/fx_fat_corpus_seed{SEED}_n{n_persons}"
           f"_p{partitions}_k{fat_kb}" + ("_inert" if inert else ""))
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        generate_bench_corpus(spark, SEED, n_persons, out,
                              partitions=partitions, fat_kb=fat_kb,
                              fat_inert=inert)
        open(marker, "w").close()
    return out


def main() -> None:
    from pyspark.sql import functions as F
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, extract, learn, release_pipeline_caches)
    from fact_extraction_spark.session import get_spark

    cpus = int(os.environ.get("FAT_CPUS", "16"))
    pairs = int(os.environ.get("FAT_PAIRS", "3"))
    n_persons = int(os.environ.get("FAT_PERSONS", "120000"))
    fat_kb = int(os.environ.get("FAT_KB", "16"))
    partitions = int(os.environ.get("FAT_PARTITIONS", "64"))
    # FAT_INERT=1: dictionary-token-free filler (nav/boilerplate shape,
    # the scan probe's best case) instead of the default subject-naming
    # body-prose shape (the probe's worst case, where it self-disables)
    inert = os.environ.get("FAT_INERT", "0") == "1"
    leg = os.environ.get("FAT_LEG", "extract")
    assert leg in ("extract", "dict_unanchored"), leg

    spark = get_spark("fat_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={
                          # fat pages: keep scan splits small enough that
                          # all cores stay busy on 64 files of ~30 MB
                          "spark.sql.files.maxPartitionBytes": str(8 << 20),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig(articles_limit=0)
    if leg == "dict_unanchored":
        run_cfg = PipelineConfig(articles_limit=0, mention_mode="dictionary",
                                 dictionary_scan_unanchored=True)
    else:
        run_cfg = cfg

    def _strip_anchors(pages):
        # same transform as __spark_entry__.q_kg_extract_dict_unanchored:
        # [[t|text]] -> text, [[t]] -> t, so the corpus carries no anchors
        return pages.withColumn(
            "html", F.encode(
                F.regexp_replace(
                    F.regexp_replace(F.decode("html", "utf-8"),
                                     r"\[\[([^|\]]*)\|([^\]]*)\]\]", "$2"),
                    r"\[\[([^\]]*)\]\]", "$1"),
                "utf-8"))

    variants: dict[str, dict] = {}
    for name, kb in (("thin", 0), ("fat", fat_kb)):
        corpus = _ensure(spark, n_persons, kb, partitions,
                         inert=inert and kb > 0)
        t = {n: spark.read.parquet(f"{corpus}/{n}.parquet")
             for n in ("pages", "facts", "types", "redirects",
                       "ground_truth")}
        if leg == "dict_unanchored":
            t["run_pages"] = _strip_anchors(t["pages"])
        else:
            t["run_pages"] = t["pages"]
        agg = t["pages"].select(
            F.count("*").alias("n"),
            F.sum(F.length("html")).alias("b")).first()
        model = learn(spark, t["pages"], t["facts"], t["types"],
                      t["redirects"], cfg, exclude_subjects=t["ground_truth"])
        mats = [model.pattern_words, model.pattern_stats, model.pattern_types,
                model.type_probs, model.rel_stats, model.training_subjects]
        for df in mats:
            df.count()
        release_pipeline_caches()
        variants[name] = {"tables": t, "model": model, "mats": mats,
                          "pages": int(agg["n"]), "bytes": int(agg["b"]),
                          "runs": [], "counts": set()}

    for _ in range(pairs):
        for name, v in variants.items():
            spark.catalog.clearCache()
            for df in v["mats"]:
                df.cache().count()
            t0 = time.time()
            triples = extract(spark, v["tables"]["run_pages"], v["model"],
                              v["tables"]["types"], v["tables"]["redirects"],
                              run_cfg)
            v["counts"].add(triples.count())
            v["runs"].append(round(time.time() - t0, 2))
            release_pipeline_caches()

    assert variants["thin"]["counts"] == variants["fat"]["counts"] \
        and len(variants["thin"]["counts"]) == 1, \
        f"filler changed the triple set: " \
        f"{ {k: v['counts'] for k, v in variants.items()} }"

    def _stats(v: dict) -> dict:
        s = sorted(v["runs"])
        med = s[len(s) // 2]
        mb = v["bytes"] / 1e6
        return {"median": med, "best": s[0], "runs": v["runs"],
                "raw_mb": round(mb, 1),
                "mb_per_s": round(mb / med, 1),
                "pages_per_s": round(v["pages"] / med, 1)}

    out = {
        "leg": leg, "inert": inert,
        "persons": n_persons, "fat_kb": fat_kb, "cpus": cpus, "pairs": pairs,
        "triples": variants["thin"]["counts"].pop(),
        "thin": _stats(variants["thin"]), "fat": _stats(variants["fat"]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    d_mb = (variants["fat"]["bytes"] - variants["thin"]["bytes"]) / 1e6
    d_s = out["fat"]["median"] - out["thin"]["median"]
    out["marginal_mb_per_s"] = round(d_mb / d_s, 1) if d_s > 0 else None
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\nFat-page bench, leg={leg}"
            f"{' INERT filler' if inert else ''} ({out['timestamp']}): "
            f"{n_persons} persons, "
            f"fat_kb={fat_kb}, local[{cpus}], {pairs} alternating pairs, "
            f"identical triple set ({out['triples']}).\n\n"
            "| variant | raw MB | extract s (median) | best | MB/s | "
            "pages/s | runs |\n|---|---|---|---|---|---|---|\n")
        for name in ("thin", "fat"):
            st = out[name]
            f.write(f"| {name} | {st['raw_mb']} | {st['median']} | "
                    f"{st['best']} | {st['mb_per_s']} | {st['pages_per_s']} "
                    f"| {st['runs']} |\n")
        f.write(f"\nmarginal cascade throughput (pure filler bytes): "
                f"{out['marginal_mb_per_s']} MB/s\n")
    spark.stop()


if __name__ == "__main__":
    main()
