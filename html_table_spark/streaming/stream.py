"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.7) and the north rule's
"resumable from checkpoint" is satisfied by the snapshot sink — but a live
corpus (crawler output landing as files) is the natural streaming shape, so
the same extraction operator is exposed as a streaming query:

    readStream(parquet dir) → mapInPandas(extraction) → writeStream(parquet)

- exactly-once file sink via Spark's own checkpoint/WAL;
- ``Trigger.AvailableNow`` drains the backlog then stops (used in tests and
  for incremental batch runs);
- the extraction operator is stateless, so it streams unchanged — no
  watermark needed. A watermarked windowed aggregation over extraction
  metrics (tables/min, late events tolerated 10 min) demonstrates the
  stateful side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ParserConfig
from ..operators.extract import extract_tables
from ..sources.documents import DOCUMENTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config: ParserConfig | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the streaming
    extraction over a landing directory of parquet document files."""
    docs = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    extracted = extract_tables(docs, config or ParserConfig().all_tables())
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.trigger(processingTime="10 seconds").start()


def windowed_event_rates(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming or batch input):
    events(ts, event_type, value) → per-window counts + value sums. Late
    rows beyond the watermark are dropped; state is bounded."""
    # watermarks require zoned TIMESTAMP; parquet often carries TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
