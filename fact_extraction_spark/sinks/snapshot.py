"""Snapshot-committed partitioned tables with per-partition lineage rows.

Implements the Iceberg-style commit semantics the north star mandates —
"partitioned triple tables with per-partition lineage + counters, so any
stage resumes from its last committed snapshot" — on plain parquet, because
this sandbox ships no Iceberg runtime jar. The layout and protocol map 1:1
onto Iceberg (data files + manifest + snapshot commit); on a real cluster
``writeTo(table).append()`` against an Iceberg catalog replaces ``_write``
and the lineage table becomes an ordinary Iceberg table.

Protocol (reader-side visibility = committed lineage only):

* data:     ``<base>/data/part_id=<p>/…parquet`` (dynamic-overwrite per part)
* lineage:  ``<base>/_lineage/…parquet`` rows
            (snapshot_id, part_id, stage, status, row_count)
* a data partition EXISTS for readers iff a lineage row with
  status='committed' covers it. A crash between data write and lineage
  append leaves orphan files that are invisible and simply rewritten on
  resume — no dupes, no gaps (this mirrors Iceberg: data files are dead
  until a manifest commit references them).

Resume = anti-join the input's part_ids against committed lineage and
process only the remainder (SURVEY.md §2.13).

The reference's analogue is stage-level pickle artifacts
(/root/reference/storing_tools/file_tool.py:18-26) — resumability there is
per stage; here it is per partition.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = ("snapshot_id string, part_id int, stage string, "
                  "status string, row_count long")


def with_part_id(df: DataFrame, key_col: str, num_parts: int = 32) -> DataFrame:
    """Deterministic partition assignment: pmod(hash(key), n)."""
    return df.withColumn(
        "part_id", F.pmod(F.hash(F.col(key_col)), F.lit(num_parts)).cast("int"))


def committed_parts(spark: SparkSession, base: str, stage: str) -> DataFrame:
    """(part_id) partitions already committed for this stage."""
    lineage_dir = os.path.join(base, "_lineage")
    try:
        lineage = spark.read.parquet(lineage_dir)
    except Exception:
        return spark.createDataFrame([], "part_id int")
    return (
        lineage.filter((F.col("stage") == stage)
                       & (F.col("status") == "committed"))
        .select("part_id").distinct()
    )


def remaining_input(spark: SparkSession, df: DataFrame, base: str,
                    stage: str) -> DataFrame:
    """Input rows whose part_id has not been committed yet (resume filter)."""
    done = committed_parts(spark, base, stage)
    return df.join(F.broadcast(done), "part_id", "left_anti")


def commit_partitions(spark: SparkSession, df: DataFrame, base: str,
                      stage: str) -> dict:
    """Write ``df`` (must carry ``part_id``) into the table and commit
    lineage for exactly the partitions written. Returns commit summary.

    Idempotent under kill/rerun: data lands via dynamic partition overwrite,
    lineage is appended only after the data job succeeds, and readers trust
    lineage only.
    """
    remaining = remaining_input(spark, df, base, stage)
    counts = [(r["part_id"], r["cnt"]) for r in
              remaining.groupBy("part_id").agg(F.count("*").alias("cnt")).collect()]
    if not counts:
        return {"snapshot_id": None, "parts": 0, "rows": 0}

    data_dir = os.path.join(base, "data")
    (remaining.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("part_id").parquet(data_dir))

    snapshot_id = uuid.uuid4().hex[:12]
    lineage_rows = [(snapshot_id, int(p), stage, "committed", int(c))
                    for p, c in counts]
    (spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA)
     .coalesce(1).write.mode("append")
     .parquet(os.path.join(base, "_lineage")))
    return {"snapshot_id": snapshot_id, "parts": len(counts),
            "rows": sum(c for _, c in counts)}


def read_committed(spark: SparkSession, base: str, stage: str) -> DataFrame:
    """Read only the committed partitions (partition-pruned scan)."""
    data = spark.read.parquet(os.path.join(base, "data"))
    return data.join(F.broadcast(committed_parts(spark, base, stage)),
                     "part_id", "left_semi")


def lineage(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, "_lineage"))
