"""URL canonicalization (functions/urls.py) — pure JVM Column exprs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from html_table_spark.functions.urls import url_canonical


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(url_canonical("url").alias("c")).collect()
    ]


CASES = [
    # scheme/host case, default port, fragment
    ("HTTP://Example.COM:80/a#frag", "http://example.com/a"),
    ("https://Example.com:443/", "https://example.com/"),
    # non-default port kept; userinfo preserved
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://u:pw@Example.com/x", "http://u:pw@example.com/x"),
    # path: slash runs, trailing slashes, empty path
    ("http://h//a///b//", "http://h/a/b"),
    ("http://h", "http://h/"),
    ("http://h/", "http://h/"),
    # query: sort, drop empties + tracking params; '?' dropped when empty
    ("http://h/p?b=2&a=1", "http://h/p?a=1&b=2"),
    ("http://h/p?a=1&&b=2&", "http://h/p?a=1&b=2"),
    ("http://h/p?utm_source=x&utm_campaign=c&a=1", "http://h/p?a=1"),
    ("http://h/p?fbclid=z", "http://h/p"),
    ("http://h/p?gclid=1&msclkid=2", "http://h/p"),
    # '?' inside a fragment is NOT a query
    ("http://h/p#a/b?c=d", "http://h/p"),
    # schemeless strings still normalize path+query
    ("example.com/x//y?b=1&a=2", "example.com/x/y?a=2&b=1"),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_canonical_cases(spark, url, expected):
    assert _canon(spark, [url]) == [expected]


def test_null_safe_and_idempotent(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(url_canonical("url").alias("c")).collect()[0]["c"] is None
    urls = [u for u, _ in CASES]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice  # canonicalization is idempotent


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("http://A/x",)], "url string").select(
        url_canonical("url").alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # whole-stage JVM expressions only


def test_registry_dedup_semantics(spark):
    import __spark_entry__ as entry

    rows = entry.tx_url_dedup(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 243
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canon"], []).append(r)
    # exactly one first-occurrence per canonical group, and it is min(id)
    for canon, grp in by_canon.items():
        firsts = [r for r in grp if r["is_canonical_first"]]
        assert len(firsts) == 1
        assert firsts[0]["id"] == min(r["id"] for r in grp)
    # the fixture really does produce collisions (the point of the op)
    assert any(len(g) > 1 for g in by_canon.values())
