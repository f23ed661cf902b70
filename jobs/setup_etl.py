"""spark-submit entry point: setup ETL — raw DBpedia dumps → input tables.

The day-one corpus-prep job the reference drives with setup/setup.sh +
data_cleaning/nt_cleaner.py: from raw ``.ttl``/``.nt`` dumps, build the
parquet ``types`` / ``redirects`` (and optional ``types_inheritance``)
tables that jobs/run_pipeline.py consumes.

Cluster usage::

    python jobs/package.py
    spark-submit --master <cluster> \
        --py-files dist/fact_extraction_spark.zip \
        jobs/setup_etl.py \
        --instance-types s3://dumps/instance_types_en.ttl \
        --yago-types s3://dumps/yago_types.ttl \
        --redirects s3://dumps/redirects_en.ttl \
        --ontology s3://dumps/dbpedia_ontology.nt \
        --out s3://kb/

Each dump is one distributed scan (regexp parse + predicate filter +
type-URI abbreviation, all codegen — sources/setup_etl.py); output tables
land as ``<out>/types.parquet`` etc.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--instance-types", default=None,
                   help=".ttl dump of rdf:type facts (instance_types_en)")
    p.add_argument("--yago-types", default=None,
                   help="optional second types dump (yago_types)")
    p.add_argument("--redirects", default=None,
                   help=".ttl dump of dbo:wikiPageRedirects facts")
    p.add_argument("--ontology", default=None,
                   help="ontology dump; rdfs:subClassOf lines are kept")
    p.add_argument("--out", required=True)
    p.add_argument("--no-assert-complete", action="store_true",
                   help="skip the every-line-whitelisted check "
                        "(nt_cleaner.py assert_complete=False)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from fact_extraction_spark.sources.setup_etl import (
        build_redirects_table, build_type_inheritance_table,
        build_types_table)

    # Only stop the session if this job created it: in-process callers
    # (tests, notebooks) hand getOrCreate() their live session, and stopping
    # it would kill every Spark consumer in the process.
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("setup_etl").getOrCreate()
    strict = not args.no_assert_complete
    summary: dict[str, int] = {}
    t0 = time.time()

    if args.instance_types:
        paths = [args.instance_types]
        if args.yago_types:
            paths.append(args.yago_types)
        types = build_types_table(spark, *paths, assert_complete=strict)
        types.write.mode("overwrite").parquet(f"{args.out}/types.parquet")
        summary["types"] = spark.read.parquet(
            f"{args.out}/types.parquet").count()

    if args.redirects:
        redirects = build_redirects_table(spark, args.redirects,
                                          assert_complete=strict)
        redirects.write.mode("overwrite").parquet(
            f"{args.out}/redirects.parquet")
        summary["redirects"] = spark.read.parquet(
            f"{args.out}/redirects.parquet").count()

    if args.ontology:
        inh = build_type_inheritance_table(spark, args.ontology)
        inh.write.mode("overwrite").parquet(
            f"{args.out}/types_inheritance.parquet")
        summary["types_inheritance"] = spark.read.parquet(
            f"{args.out}/types_inheritance.parquet").count()

    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
