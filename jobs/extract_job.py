"""Production entry point: spark-submit-able extraction job.

Usage (cluster):
    zip -r hps.zip html_parser_spark
    spark-submit --py-files hps.zip \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=64 \
        --conf spark.sql.files.maxPartitionBytes=16777216 \
        jobs/extract_job.py \
        --input <pages table path or name> --output <output path> \
        [--plan isolate|full|none] [--no-resume] [--spans]

Input modes (mutually exclusive): --input (pages parquet path or
catalog table), --warc-input (parquet of (warc_id, warc binary) WARC
blobs — record-walked into pages first), --synth (sandbox corpus
synthesis from a testdata dir).

Usage (sandbox smoke, synthesizes pages from the test documents table):
    python jobs/extract_job.py --synth /root/testdata/sf0.001 \
        --output /tmp/hps_out

The job is idempotent/resumable: every run anti-joins the source
against already-committed output urls and appends only the remainder
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"). The run report (docs, bytes, errors, truncated, partition
histogram) prints as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages table: parquet path or "
                                     "catalog table name (url, warc_ts, "
                                     "html, text, lang)")
    src.add_argument("--synth", help="synthesize pages from this testdata "
                                     "dir's documents.parquet instead")
    src.add_argument("--warc-input",
                     help="ingest WARC blobs instead: parquet of "
                          "(warc_id, warc binary) — records are walked "
                          "into (url, warc_ts, html) before extraction")
    ap.add_argument("--output", required=True)
    ap.add_argument("--plan", default="isolate",
                    choices=["isolate", "full", "none"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--spans", action="store_true",
                    help="emit element spans (larger output)")
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from html_parser_spark.plans.pipeline import configure, run_extraction
    from html_parser_spark.sources.pages import pages_df

    # under spark-submit a session already exists (getOrCreate attaches);
    # standalone it builds a local one
    spark = configure(SparkSession.builder.getOrCreate()
                      if SparkSession.getActiveSession() else None)
    spark.sparkContext.setLogLevel("WARN")

    if args.synth:
        pages = pages_df(spark, args.synth)
    elif args.warc_input:
        from html_parser_spark.sources.warc import warc_records
        pages = warc_records(spark.read.parquet(args.warc_input))
    elif args.input and "/" in args.input:
        pages = spark.read.parquet(args.input)
    elif args.input:
        pages = spark.table(args.input)
    else:
        ap.error("one of --input/--synth/--warc-input is required")

    report = run_extraction(spark, pages, args.output,
                            num_partitions=args.num_partitions,
                            resume=not args.no_resume,
                            with_spans=args.spans, plan=args.plan)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
