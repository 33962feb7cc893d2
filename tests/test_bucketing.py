"""Scale techniques that only show up in plans: bucketed co-located joins
(no shuffle at join time) and Lloyd-refined IVF centroids."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Pre-bucketing both sides of a recurring join key eliminates the
    shuffle: the physical plan must contain a SortMergeJoin with NO
    Exchange on either input — the 100 TB answer for repeated big-big
    joins on the same key."""
    # warehouse dir is a static conf — tables land in the session default;
    # drop them afterwards instead
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.createDataFrame(
        [Row(okey=i, prio=i % 3) for i in range(1000)]
    )
    lines = spark.createDataFrame(
        [Row(okey=i % 1000, qty=float(i)) for i in range(5000)]
    )
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")
    joined = spark.table("b_lines").join(spark.table("b_orders"), "okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle at join time
    assert joined.count() == 5000
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_ivf_train_refines_centroids(spark):
    import random

    from html_table_spark.operators import similarity

    rng = random.Random(5)
    # two tight clusters far apart; seed centroids are vec_id 0 and 1
    def around(base, n, start_id):
        return [
            Row(
                vec_id=start_id + i,
                embedding=[b + rng.gauss(0, 0.05) for b in base],
            )
            for i in range(n)
        ]

    rows = around([5.0, 0.0, 0.0], 20, 0) + around([0.0, 5.0, 0.0], 20, 100)
    df = spark.createDataFrame(rows)
    cents = similarity.ivf_train(df, k=2, iters=2)
    assert [c[0] for c in cents] == [0, 1]
    # refined centroid 0 ≈ cluster-0 mean, far from seed noise
    c0, c1 = cents[0][1], cents[1][1]
    assert c0[0] == pytest.approx(5.0, abs=0.1) and c0[1] == pytest.approx(0.0, abs=0.1)
    # assignment under refined centroids separates the clusters perfectly
    assigned = similarity.ivf_assign(df, cents)
    got = {r.vec_id: r.centroid_id for r in assigned.collect()}
    assert all(got[i] == 0 for i in range(20))
    assert all(got[100 + i] == 1 for i in range(20))
