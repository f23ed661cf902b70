"""N-Triples scan/sink as DataFrame transformations.

Scan semantics mirror /root/reference/nt_operations/nt_reader.py:23-44:
parse the three ``<…>`` URI groups per line, drop lines that don't have
exactly 3, drop subjects containing ``__`` ("not part of Wikipedia").
The sink mirrors nt_writer.py:11-15.

Spark-first: the parse is `regexp_extract_all` + filters — fully
codegen'd, pushdown-friendly, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fact_extraction_spark.functions.uri import strip_cleaned_name

_URI_GROUP = r"<([^>]+)>"


def read_nt(spark: SparkSession, path: str) -> DataFrame:
    """NT/TTL file → facts(subj, pred, obj) with the reference's drop rules."""
    lines = spark.read.text(path)
    uris = lines.select(
        F.regexp_extract_all("value", F.lit(_URI_GROUP), 1).alias("uris"))
    return (
        uris.filter(F.size("uris") == 3)
        .select(
            F.col("uris")[0].alias("subj"),
            F.col("uris")[1].alias("pred"),
            F.col("uris")[2].alias("obj"),
        )
        .filter(~F.col("subj").contains("__"))
    )


def read_nt_cleaned_names(spark: SparkSession, path: str) -> DataFrame:
    """Same scan with URI→display-name rewriting (nt_reader.py:16-21)."""
    df = read_nt(spark, path)
    return df.select(
        strip_cleaned_name("subj").alias("subj"),
        strip_cleaned_name("pred").alias("pred"),
        strip_cleaned_name("obj").alias("obj"),
    )


def nt_lines(facts: DataFrame, subj="subj", pred="pred", obj="obj") -> DataFrame:
    """facts → one `<s> <p> <o> .` string column (nt_writer.py:11-15)."""
    def fmt(c):
        return F.concat(F.lit("<"), F.col(c), F.lit(">"))
    return facts.select(
        F.concat_ws(" ", fmt(subj), fmt(pred), fmt(obj), F.lit(".")).alias("value"))


def write_nt(facts: DataFrame, path: str) -> None:
    nt_lines(facts).write.mode("overwrite").text(path)
