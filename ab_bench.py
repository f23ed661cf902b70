"""A/B harness: two PipelineConfig variants on the scale corpus.

Used for VERDICT r5 Next #3 (scoring_int_url — hash-encode the url through
the slim scoring persist) and reusable for any config-flag A/B: the SAME
learned model runs extract() under config A and config B in ALTERNATING
legs (A,B,A,B,...), AB_PAIRS (default 3) times, with caches cleared and the
model tables re-cached before every leg so each run re-executes the full
extraction. Reports per-variant {median, best, runs} extract seconds and
appends a table to BENCH/BASELINE.md. Triple counts are asserted equal
across variants (a free equivalence check on top of the pytest
row-identity test).

Scale corpus: SPARK_GRAFT_BENCH_PERSONS (default 1330000 — the 1.37M-page
corpus of the BENCH/BASELINE.md scaling rows; throughput A/Bs on smaller
corpora don't amortize per-task overhead and read as noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_BENCH_PERSONS", "1330000")


def main() -> None:
    import bench
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, extract, learn, release_pipeline_caches)
    from fact_extraction_spark.session import get_spark

    cpus = int(os.environ.get("AB_CPUS", "16"))
    pairs = int(os.environ.get("AB_PAIRS", "3"))
    flag = os.environ.get("AB_FLAG", "scoring_int_url")
    spark = get_spark("ab_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(1 << 20),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    corpus, n_persons = bench.ensure_corpus(spark, 0.1)
    t = {n: spark.read.parquet(f"{corpus}/{n}.parquet")
         for n in ("pages", "facts", "types", "redirects", "ground_truth")}
    n_pages = t["pages"].count()

    base_cfg = PipelineConfig(articles_limit=0)
    model = learn(spark, t["pages"], t["facts"], t["types"], t["redirects"],
                  base_cfg, exclude_subjects=t["ground_truth"])
    mats = [model.pattern_words, model.pattern_stats, model.pattern_types,
            model.type_probs, model.rel_stats, model.training_subjects]
    for df in mats:
        df.count()
    release_pipeline_caches()

    variants = {
        "off": base_cfg,
        "on": PipelineConfig(articles_limit=0, **{flag: True}),
    }
    runs: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, set[int]] = {k: set() for k in variants}
    for _ in range(pairs):
        for name, cfg in variants.items():
            spark.catalog.clearCache()
            for df in mats:
                df.cache().count()
            t0 = time.time()
            triples = extract(spark, t["pages"], model, t["types"],
                              t["redirects"], cfg)
            counts[name].add(triples.count())
            runs[name].append(round(time.time() - t0, 2))
            release_pipeline_caches()

    assert counts["off"] == counts["on"] and len(counts["off"]) == 1, \
        f"variant outputs differ: {counts}"

    def _stats(xs: list[float]) -> dict:
        s = sorted(xs)
        return {"median": s[len(s) // 2], "best": s[0], "runs": xs}

    out = {
        "flag": flag,
        "pages": n_pages,
        "persons": n_persons,
        "cpus": cpus,
        "pairs": pairs,
        "triples": counts["off"].pop(),
        "off": _stats(runs["off"]),
        "on": _stats(runs["on"]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out["speedup_median"] = round(
        out["off"]["median"] / out["on"]["median"], 3)
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\nA/B `{flag}` ({out['timestamp']}): {n_pages} pages, "
            f"local[{cpus}], {pairs} alternating pairs, same model, "
            f"equal triple counts ({out['triples']}).\n\n"
            "| variant | extract s (median) | best | runs |\n"
            "|---|---|---|---|\n")
        for name in ("off", "on"):
            st = out[name]
            f.write(f"| {flag}={name} | {st['median']} | {st['best']} "
                    f"| {st['runs']} |\n")
        f.write(f"\nmedian speedup on/off: {out['speedup_median']}x\n")
    spark.stop()


if __name__ == "__main__":
    main()
