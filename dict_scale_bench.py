"""Dictionary-strategy crossover bench (VERDICT r3 Next #6).

Validates the ``dictionary_strategy="auto"`` switch point (PipelineConfig
.dictionary_auto_threshold, default 200k pairs) against a dictionary that
actually exceeds it: the scale corpus (SPARK_GRAFT_BENCH_PERSONS persons →
~1.6M pages at the round-3 setting) yields one (alias, entity) pair per
page title plus the redirect aliases — far past the threshold — so
"mapside" must win there, while the small per-round bench dictionary
(~5k pairs) keeps "broadcast" ahead.

Measures mention-DETECTION wall time (the part the strategy controls:
fused sentence pass + automaton hits [+ n-gram tail join] + ambiguity
split + any ranking) for both strategies on the same cached corpus, and
appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from fact_extraction_spark.caches import release as release_caches
    from fact_extraction_spark.operators.mentions import (
        build_alias_candidates, collect_redirect_map)
    from fact_extraction_spark.plans.pipeline import (
        PipelineConfig, _build_dict_ctx, _page_mentions)
    from fact_extraction_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = bench._sf_from_dir(sf_dir)
    spark = get_spark("dict_scale_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(1 << 20),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    corpus, _ = bench.ensure_corpus(spark, sf)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    redirects = spark.read.parquet(f"{corpus}/redirects.parquet")
    n_pages = pages.count()
    n_pairs = build_alias_candidates(pages, redirects).count()
    rmap_bc = collect_redirect_map(spark, redirects)

    results = {}
    for strategy in ("broadcast", "mapside"):
        cfg = PipelineConfig(mention_mode="dictionary",
                             dictionary_strategy=strategy)
        t0 = time.time()
        ctx = _build_dict_ctx(spark, pages, redirects, cfg)
        n_mentions = _page_mentions(pages, rmap_bc, "en", ctx, cfg).count()
        results[strategy] = round(time.time() - t0, 2)
        release_caches()
    winner = min(results, key=results.get)
    auto_pick = ("broadcast" if n_pairs <= PipelineConfig()
                 .dictionary_auto_threshold else "mapside")
    out = {"pages": n_pages, "pairs": n_pairs, "mentions": n_mentions,
           "broadcast_sec": results["broadcast"],
           "mapside_sec": results["mapside"],
           "winner": winner, "auto_picks": auto_pick,
           "auto_correct": winner == auto_pick,
           "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\nDictionary-strategy crossover ({out['timestamp']}): "
            f"{n_pages} pages, {n_pairs} alias pairs, "
            f"broadcast {results['broadcast']} s vs mapside "
            f"{results['mapside']} s → winner {winner}; auto (threshold "
            f"{PipelineConfig().dictionary_auto_threshold}) picks "
            f"{auto_pick} ({'correct' if out['auto_correct'] else 'WRONG'}).\n")
    spark.stop()


if __name__ == "__main__":
    main()
