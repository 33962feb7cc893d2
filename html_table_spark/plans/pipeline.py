"""End-to-end extraction pipeline: skew-aware plan + lineage + resume.

Plan shape (SURVEY.md §3.4, §4.3) — all choices are *plan-shape* decisions,
no custom Catalyst rules:

    scan(doc_id, spans)                       -- pruned to 2 columns
      ├─ cost pre-pass (JVM-side F.aggregate, no Python)
      ├─ normal docs  ─ salted repartition ─┐
      └─ mega docs ─ split into table-chunks┴─ mapInPandas extraction
                         (linear scan; base table ordinal per chunk)
      → union → per-partition lineage agg → snapshot-committed sink

Why explicit: UDF-stage skew is invisible to AQE (it only splits skewed
joins/aggregations), so a 2,000-table mega-document would otherwise pin one
task for the whole stage.  The cost pre-pass is pure JVM (`aggregate` over
the span array); only docs above ``mega_cost_threshold`` pay the split scan.

Scaling: the salted repartition key is ``pmod(xxhash64(doc_id), P)`` — a
deterministic, uniformly-distributed assignment that holds at any corpus
size; P tracks cluster parallelism (defaults to
``spark.sql.shuffle.partitions``).  At 10^12 docs the only all-data shuffle
in the job is this single repartition; everything downstream is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ParserConfig
from ..operators.extract import extract_tables, split_mega_docs
from ..sources.sinks import SnapshotSink

# Docs whose total text size exceeds this take the mega-doc split path.
DEFAULT_MEGA_COST = 256 * 1024  # bytes of HTML


def with_doc_cost(documents: DataFrame) -> DataFrame:
    """JVM-side cost proxy: total text length across spans (no Python)."""
    return documents.withColumn(
        "doc_cost",
        F.aggregate(
            "spans",
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        ),
    )


def salted(documents: DataFrame, num_partitions: int) -> DataFrame:
    """Deterministic salted repartition (north rule: explicit skew control)."""
    return documents.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions))
    ).repartition(num_partitions, "salt").drop("salt")


def plan_extraction(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    num_partitions: int | None = None,
    mega_cost_threshold: int = DEFAULT_MEGA_COST,
    tables_per_chunk: int = 64,
) -> DataFrame:
    """Build the lazy extraction DataFrame (no action triggered)."""
    config = config or ParserConfig()
    spark = documents.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    costed = with_doc_cost(documents.select("doc_id", "spans"))
    normal = costed.filter(F.col("doc_cost") <= mega_cost_threshold).drop("doc_cost")
    mega = costed.filter(F.col("doc_cost") > mega_cost_threshold).drop("doc_cost")

    normal_out = extract_tables(salted(normal, num_partitions), config)
    # mega path: split → rebalance chunks across the cluster → extract
    chunks = split_mega_docs(mega, tables_per_chunk=tables_per_chunk)
    mega_out = extract_tables(salted_chunks(chunks, num_partitions), config)
    return normal_out.unionByName(mega_out)


def salted_chunks(chunks: DataFrame, num_partitions: int) -> DataFrame:
    """Chunks of one mega-doc must NOT hash to one partition — salt by
    (doc_id, table_idx_base)."""
    return chunks.withColumn(
        "salt",
        F.pmod(F.xxhash64("doc_id", "table_idx_base"), F.lit(num_partitions)),
    ).repartition(num_partitions, "salt").drop("salt")


def lineage_from_extracted(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-extraction-partition lineage + metrics rows (north rule)."""
    return (
        extracted.groupBy("part_id")
        .agg(
            F.countDistinct("doc_id").alias("doc_count"),
            F.count(F.lit(1)).alias("table_count"),
            F.sum(F.size(F.coalesce("spans", F.array()))).alias("span_count"),
            F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias(
                "error_count"
            ),
            F.max("wall_ms").alias("wall_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "part_id",
            "doc_count",
            "table_count",
            "span_count",
            "error_count",
            "wall_ms",
        )
    )


def run_job(
    spark: SparkSession,
    documents: DataFrame,
    sink: SnapshotSink,
    config: ParserConfig | None = None,
    *,
    resume: bool = True,
    **plan_kwargs,
) -> dict:
    """Execute one extraction run: resume-filter → extract → write+commit.

    Returns the commit manifest (plus counters). Re-running after a crash or
    partial corpus processes only uncommitted documents (Iceberg-snapshot
    discipline, SURVEY.md §4.3).
    """
    if resume:
        documents = sink.remaining_documents(documents)
    run_id = sink.new_run_id()
    extracted = plan_extraction(documents, config, **plan_kwargs)
    # Materialize the extraction exactly once: write the data files, then
    # derive lineage by re-reading them (a cheap columnar aggregate) instead
    # of recomputing the whole extraction DAG. The snapshot commits only
    # after BOTH tables are on disk — crash at any earlier point leaves no
    # visible state ("lineage in the same transaction", SURVEY.md §4.3).
    data_path = sink.data_path(run_id)
    extracted.write.mode("errorifexists").parquet(data_path)
    committed = spark.read.schema(extracted.schema).parquet(data_path)
    lineage = lineage_from_extracted(committed, run_id)
    lineage_path = sink.lineage_path(run_id)
    lineage.write.mode("errorifexists").parquet(lineage_path)
    return sink.commit_run(run_id, data_path, lineage_path)
