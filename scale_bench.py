"""Two-parallelism scaling bench (the sandbox proxy for the north rule's
N→4N executor criterion; see BASELINE.md "Engine targets").

Runs the IDENTICAL KG extraction job at two parallelism levels on the same
cached corpus and reports throughput at both plus
efficiency = (throughput@4N / throughput@N) / 4. Results are appended to
BENCH/BASELINE.md.

Two modes (SCALE_BENCH_MODE):

* ``threads`` (default) — ``local[N]`` vs ``local[4N]``: one JVM, 4x the
  task threads. Cheap, but conflates executor scaling with single-heap
  GC/memory-bandwidth contention that a real multi-executor cluster does
  not pay (BENCH/BASELINE.md round-2 analysis).
* ``executors`` — ``local-cluster[1,C,M]`` vs ``local-cluster[4,C,M]``:
  one vs FOUR separate executor JVMs with identical per-executor cores and
  memory. This is the faithful sandbox proxy of the north rule's "N to 4N
  executors" axis: each executor has its own heap, GC, python workers and
  shuffle server; the only shared resource is the host's DRAM/IO — exactly
  what co-located executors on a real cluster node share.

Each level runs in a fresh subprocess so the JVM/session cannot leak state
between levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
REPEATS = int(os.environ.get("SCALE_BENCH_REPEATS", "3"))
from fact_extraction_spark.session import get_spark
from fact_extraction_spark.plans.pipeline import PipelineConfig, extract, learn

master = sys.argv[1]; cpus = int(sys.argv[2]); corpus = sys.argv[3]
conf = {{
    "spark.sql.files.maxPartitionBytes": str(1 << 20),
    "spark.sql.files.openCostInBytes": "0",
}}
if master.startswith("local-cluster"):
    # driver runs no tasks in this mode; executor heaps come from the
    # master string (MB per executor)
    conf["spark.driver.memory"] = "4g"
    conf["spark.executor.memory"] = master.rsplit(",", 1)[-1].rstrip("]") + "m"
spark = get_spark("scale_bench", master=master,
                  shuffle_partitions=max(8, cpus),
                  extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
t = {{n: spark.read.parquet(f"{{corpus}}/{{n}}.parquet")
     for n in ("pages", "facts", "types", "redirects", "ground_truth")}}
n_pages = t["pages"].count()
cfg = PipelineConfig(articles_limit=0)
model = learn(spark, t["pages"], t["facts"], t["types"], t["redirects"], cfg,
              exclude_subjects=t["ground_truth"])
for df in (model.pattern_words, model.pattern_stats, model.pattern_types,
           model.type_probs, model.rel_stats):
    df.count()
# best-of-N: the sandbox has bursty background load (observed idle loadavg
# spikes >20) that randomly steals cores; min over repeats measures the
# engine, not the noise. Repeats run warm (same JVM/python workers), which
# is the steady-state a long-running cluster job sees — but data caches are
# cleared each round (only the small model tables are re-cached) so every
# repeat re-executes the full extraction over the corpus.
mats = [model.pattern_words, model.pattern_stats, model.pattern_types,
        model.type_probs, model.rel_stats, model.training_subjects]
runs = []
n = None
for _ in range(REPEATS):
    spark.catalog.clearCache()
    for df in mats:
        df.cache().count()
    t0 = time.time()
    triples = extract(spark, t["pages"], model, t["types"], t["redirects"], cfg)
    n = triples.count()
    runs.append(time.time() - t0)
runs_sorted = sorted(runs)
dt_best = runs_sorted[0]
dt_median = runs_sorted[len(runs_sorted) // 2]
print(json.dumps({{"cpus": cpus, "pages": n_pages, "triples": n,
                   "extract_sec": dt_best,
                   "extract_sec_median": dt_median,
                   "extract_runs": [round(r, 2) for r in runs],
                   "docs_per_sec": n_pages / dt_best,
                   "docs_per_sec_median": n_pages / dt_median}}))
spark.stop()
"""


def run_level(master: str, cpus: int, corpus: str) -> dict:
    code = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, master, str(cpus), corpus],
        capture_output=True, text=True, check=True)
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> None:
    mode = os.environ.get("SCALE_BENCH_MODE", "threads")
    if mode == "executors":
        ec = int(os.environ.get("SCALE_BENCH_EXEC_CORES", "4"))
        em = int(os.environ.get("SCALE_BENCH_EXEC_MEM_MB", "8192"))
        n_low, n_high = ec, 4 * ec
        low_master = f"local-cluster[1,{ec},{em}]"
        high_master = f"local-cluster[4,{ec},{em}]"
        low_label, high_label = "1 executor", "4 executors"
    else:
        n_low = int(os.environ.get("SCALE_BENCH_N", "8"))
        n_high = 4 * n_low
        low_master = f"local[{n_low}]"
        high_master = f"local[{n_high}]"
        low_label, high_label = f"N={n_low}", f"N={n_high}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # materialize the shared corpus once (same generator/seed as bench.py)
    sys.path.insert(0, REPO)
    import bench
    from fact_extraction_spark.session import get_spark
    sf = bench._sf_from_dir(sf_dir)
    spark = get_spark("scale_bench_prep", master="local[8]")
    corpus, _ = bench.ensure_corpus(spark, sf)
    spark.stop()

    # INVOCATION-level repeats (VERDICT r4 Next #1a/#2): each run_level
    # call is a fresh subprocess/JVM holding SCALE_BENCH_REPEATS warm
    # in-JVM repeats; we additionally alternate low/high invocations so
    # ambient host noise hits both levels symmetrically, then report the
    # median and the best across all readings per level.
    invocations = int(os.environ.get("SCALE_BENCH_INVOCATIONS", "3"))
    lows, highs = [], []
    for i in range(invocations):
        lows.append(run_level(low_master, n_low, corpus))
        highs.append(run_level(high_master, n_high, corpus))

    def _collapse(readings: list[dict]) -> dict:
        base = dict(readings[0])
        best = [r["docs_per_sec"] for r in readings]
        med = sorted(r["docs_per_sec_median"] for r in readings)
        base["docs_per_sec"] = max(best)            # best across invocations
        base["docs_per_sec_median"] = med[len(med) // 2]
        base["all_runs"] = [r["extract_runs"] for r in readings]
        return base

    low, high = _collapse(lows), _collapse(highs)
    efficiency = (high["docs_per_sec"] / low["docs_per_sec"]) / (n_high / n_low)
    eff_median = ((high["docs_per_sec_median"] / low["docs_per_sec_median"])
                  / (n_high / n_low))
    result = {
        "mode": mode,
        "low": low, "high": high,
        "efficiency": round(efficiency, 4),
        "efficiency_median": round(eff_median, 4),
        "invocations": invocations,
        "sf": sf,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — throughput & scaling efficiency\n\n"
                "Sandbox proxy for the N→4N executor criterion "
                "(BASELINE.json): the identical KG extraction job at two\n"
                "local parallelism levels on the same cached corpus; "
                "efficiency = (docs/sec@4N ÷ docs/sec@N) ÷ 4.\n\n"
                "| when | sf | pages | local[N] docs/s | local[4N] docs/s "
                "| efficiency |\n|---|---|---|---|---|---|\n")
        f.write(
            f"| {result['timestamp']} | {sf} | {low['pages']} "
            f"| {low['docs_per_sec']:.1f} best / "
            f"{low['docs_per_sec_median']:.1f} med ({low_label}, "
            f"{invocations}×{os.environ.get('SCALE_BENCH_REPEATS', '3')} runs) "
            f"| {high['docs_per_sec']:.1f} best / "
            f"{high['docs_per_sec_median']:.1f} med ({high_label}) "
            f"| {efficiency:.3f} best / {eff_median:.3f} med |\n")


if __name__ == "__main__":
    main()
