"""Build the --py-files artifact for cluster submission.

Produces ``dist/fact_extraction_spark.zip`` containing the package, suitable
for::

    spark-submit --py-files dist/fact_extraction_spark.zip \
        jobs/run_pipeline.py --pages <iceberg-or-parquet-uri> ...

Stdlib-only (zipfile) — no build backend needed on an edge node.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "fact_extraction_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
