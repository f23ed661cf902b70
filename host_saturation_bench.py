"""Host-saturation control for the scaling-efficiency target (VERDICT r4
Next #1b).

Question it answers: when the N→4N scaling efficiency on this single-host
sandbox misses 0.8, is the JOB failing to scale, or is the HOST? A real
cluster gives each group of 4 cores its own DRAM bus and LLC; this sandbox
shares one memory subsystem across all parallelism. The control separates
the two:

* run ONE local[4] extraction job solo → per-job throughput T_solo;
* run K INDEPENDENT local[4] jobs concurrently (separate JVMs, separate
  python workers, same corpus) → per-job throughput T_conc.

The K concurrent jobs share nothing at the Spark level — no shuffle, no
scheduler, no heap. The ONLY shared resource is the host (DRAM bandwidth,
LLC, IO). Therefore:

* ``T_conc ≈ T_solo``   → the host has headroom; an efficiency miss is the
  job's fault (scheduler, skew, serial sections) and more code work can fix
  it;
* ``T_conc ≪ T_solo``   → the host memory subsystem is saturated by ~2×4
  cores of this workload; co-scaling N→4N on ONE box cannot reach 0.8
  regardless of code, because the 4N configuration pays exactly this
  contention. On a real multi-host cluster (the north rule's actual axis)
  each executor group brings its own memory subsystem and this term
  vanishes.

Aggregate host efficiency at concurrency K = (K · T_conc) / (K · T_solo)
= T_conc / T_solo — directly comparable to the N→4N efficiency number.

Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# same per-level worker as scale_bench (fresh subprocess, warm in-JVM
# repeats, best + median)
from scale_bench import _WORKER  # noqa: E402


def _spawn(master: str, cpus: int, corpus: str) -> subprocess.Popen:
    code = _WORKER.format(repo=REPO)
    return subprocess.Popen(
        [sys.executable, "-c", code, master, str(cpus), corpus],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _collect(p: subprocess.Popen) -> dict:
    out, err = p.communicate()
    if p.returncode != 0:
        raise RuntimeError(f"worker failed:\n{err[-2000:]}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    cores = int(os.environ.get("SATURATION_CORES", "4"))
    ks = [int(k) for k in
          os.environ.get("SATURATION_LEVELS", "1,2,4").split(",")]
    # the "host efficiency vs solo" column divides by the K=1 reading; a
    # custom SATURATION_LEVELS without 1 would silently rebase it on a
    # concurrent run and mislabel every row (ADVICE r5)
    if 1 not in ks:
        ks = [1] + ks
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, REPO)
    import bench
    from fact_extraction_spark.session import get_spark
    sf = bench._sf_from_dir(sf_dir)
    spark = get_spark("saturation_prep", master="local[8]")
    corpus, _ = bench.ensure_corpus(spark, sf)
    spark.stop()

    master = f"local[{cores}]"
    levels = {}
    for k in ks:
        procs = [_spawn(master, cores, corpus) for _ in range(k)]
        results = [_collect(p) for p in procs]
        per_job_best = [r["docs_per_sec"] for r in results]
        per_job_med = [r["docs_per_sec_median"] for r in results]
        levels[k] = {
            "jobs": k,
            "per_job_docs_per_sec_best": per_job_best,
            "per_job_docs_per_sec_median": per_job_med,
            "mean_best": sum(per_job_best) / k,
            "mean_median": sum(per_job_med) / k,
        }
        print(json.dumps({"concurrency": k, **levels[k]}))

    solo = levels[min(ks)]
    out = {
        "cores_per_job": cores,
        "levels": levels,
        "host_efficiency": {
            str(k): round(levels[k]["mean_median"] / solo["mean_median"], 4)
            for k in ks},
        "sf": sf,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(out))

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(f"\nHost-saturation control ({out['timestamp']}): "
                f"K independent local[{cores}] jobs, per-job docs/s "
                f"(median over warm repeats):\n\n")
        f.write("| concurrent jobs | per-job docs/s (median) | per-job "
                "docs/s (best) | host efficiency vs solo |\n|---|---|---|---|\n")
        for k in ks:
            lv = levels[k]
            f.write(f"| {k} | {lv['mean_median']:.1f} | {lv['mean_best']:.1f} "
                    f"| {out['host_efficiency'][str(k)]:.3f} |\n")


if __name__ == "__main__":
    main()
