"""Cluster job entrypoint — ``spark-submit --py-files`` deployment.

    spark-submit --master <cluster> \
        --py-files html_table_spark.zip \
        job.py --input <corpus parquet/iceberg> --output <sink root> \
               [--mode all|single] [--partitions N] [--mega-threshold BYTES]

The session is NOT constructed with local-mode defaults here: on a cluster
spark-submit conf (executors, shuffle partitions, Arrow batch size) wins;
we only set the configs that are semantic for the job (Arrow enabled,
adaptive on).  Re-running the same command after a failure resumes from the
last committed snapshot (anti-join on committed doc_ids).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def build_session(app: str = "html-table-extract") -> SparkSession:
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .getOrCreate()
    )


def main(argv: list[str] | None = None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="corpus path (parquet dir or iceberg://tbl)")
    parser.add_argument("--output", required=True, help="snapshot sink root")
    parser.add_argument("--mode", choices=["all", "single", "maincontent", "corpus"],
                        default="all",
                        help="'all': every top-level table per doc; 'single': reference "
                             "one-table semantics; 'maincontent': boilerplate-strip "
                             "pipeline (block features + verdicts) instead of tables; "
                             "'corpus': training-corpus build (quality gate + exact "
                             "dedup + PII scrub) with the same snapshot commit")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--mega-threshold", type=int, default=None,
                        help="bytes of HTML above which a doc takes the split path")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--format", choices=["auto", "warc"], default="auto",
                        help="'auto': parquet/iceberg documents table; 'warc': a "
                             "directory of .warc/.warc.gz crawl archives ingested "
                             "via sources/warc.py (HTML 200 responses become docs)")
    args = parser.parse_args(argv)

    # absolute imports: spark-submit executes this file as a top-level
    # script; the package arrives via --py-files
    from html_table_spark.config import ParserConfig
    from html_table_spark.plans.pipeline import DEFAULT_MEGA_COST, run_job
    from html_table_spark.sources.documents import read_documents
    from html_table_spark.sources.sinks import SnapshotSink
    from html_table_spark.sources.warc import read_warc_documents

    spark = build_session()
    if args.format == "warc":
        documents = read_warc_documents(spark, args.input)
    else:
        documents = read_documents(spark, args.input)
    sink = SnapshotSink(args.output)
    if args.mode == "corpus":
        from html_table_spark.operators.corpus import run_corpus_job

        manifest = run_corpus_job(
            spark, documents, sink, resume=not args.no_resume
        )
        print(json.dumps(manifest))
        return manifest
    if args.mode == "maincontent":
        from html_table_spark.operators.maincontent import run_maincontent_job

        manifest = run_maincontent_job(
            spark, documents, sink, resume=not args.no_resume
        )
        print(json.dumps(manifest))
        return manifest
    config = ParserConfig().all_tables() if args.mode == "all" else ParserConfig()
    manifest = run_job(
        spark,
        documents,
        sink,
        config,
        resume=not args.no_resume,
        num_partitions=args.partitions,
        mega_cost_threshold=(
            args.mega_threshold
            if args.mega_threshold is not None
            else DEFAULT_MEGA_COST
        ),
    )
    print(json.dumps(manifest))
    return manifest


if __name__ == "__main__":
    main()
