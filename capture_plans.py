"""Capture .explain("formatted") for every declared query into plans/<tag>/.

Usage: python capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_{before|after}.txt depending on $PLAN_SUFFIX
(default "before"). Measurement tooling only — not part of the engine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    only = set(sys.argv[2:])
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from fact_extraction_spark.session import get_spark
    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("capture_plans", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture failures visibly, don't abort
            plan = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
