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


def test_pq_train_refines_codebooks(spark):
    """Per-subspace Lloyd: with two tight sub-clusters per subspace, one
    iteration must move each seed word to its assigned cluster's mean, and
    refined books must reduce total quantization error."""
    from html_table_spark.operators import similarity

    # 4-dim vectors, m=2 subspaces of 2 dims; two clusters per subspace
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [1.0, 1.0, 11.0, 11.0]),   # seeds: vec 0 and 1 (ksub=2)
        (2, [0.2, 0.2, 10.2, 10.2]),
        (3, [0.8, 0.8, 10.8, 10.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seed_books, dsub = similarity.pq_codebooks(df, m=2, ksub=2)
    books, dsub2 = similarity.pq_train(df, m=2, ksub=2, iters=1)
    assert dsub == dsub2 == 2

    def err(bks):
        enc = similarity.pq_encode(df, bks, dsub).collect()
        tot = 0.0
        for r in enc:
            for j, code in ((0, r.code_0), (1, r.code_1)):
                c = bks[j][code]
                sub = r.v[j * dsub:(j + 1) * dsub]
                tot += sum((a - b) ** 2 for a, b in zip(sub, c))
        return tot

    assert err(books) < err(seed_books)
    # code word 0 of subspace 0 = mean of its members' first 2 dims
    # (vecs 0,2 encode to word 0; vecs 1,3 to word 1 under the seeds)
    assert books[0][0] == pytest.approx([0.1, 0.1])
    assert books[0][1] == pytest.approx([0.9, 0.9])
    assert books[1][0] == pytest.approx([10.1, 10.1])
