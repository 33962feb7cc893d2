"""The reference's downstream query surface as native DataFrame operators.

bakame-php/html-table delegates row processing to league/csv's
``TabularDataReader`` (reference ``src/Parser.php:392``; verbs evidenced in
README.md:20-34 and ParserTest.php — SURVEY.md §2.9).  Those verbs assume an
*insertion-ordered* in-memory row buffer; a distributed DataFrame has no
such order, so :class:`Tabular` carries explicit order keys and compiles
each verb to the Catalyst-friendly plan:

| reference verb          | plan here                                      |
|-------------------------|------------------------------------------------|
| filter(closure)         | df.filter(expr) — JVM predicate, pushdown-able |
| sorted(cmp)             | orderBy(sort keys) — comparators become keys   |
| slice(offset, length)   | orderBy().offset().limit() — no global window  |
| nth(n) / first()        | slice(n, 1)                                    |
| fetchPairs(k, v)        | groupBy(k).agg(min_by(v, order)) — first-wins  |
|                         | without a row_number window shuffle            |
| reduce(fn, init)        | df.agg(native aggregate)                       |
| count()                 | df.count()                                     |
| getHeader()             | df.columns                                     |

``slice``/``nth`` use Spark ≥3.4 ``offset`` + ``limit`` so the sort is a
top-(offset+length) TakeOrdered plan, not a full global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Tabular:
    """Ordered tabular view over a DataFrame (league/csv ResultSet parity)."""

    def __init__(self, df: DataFrame, order_by: list):
        if not order_by:
            raise ValueError("Tabular requires explicit order keys on distributed data")
        self.df = df
        self.order_by = list(order_by)

    def _ordered(self) -> DataFrame:
        return self.df.orderBy(*self.order_by)

    # -- verbs ----------------------------------------------------------

    def filter(self, condition) -> "Tabular":
        return Tabular(self.df.filter(condition), self.order_by)

    def sorted(self, *cols) -> "Tabular":
        return Tabular(self.df, list(cols))

    def slice(self, offset: int, length: int | None = None) -> DataFrame:
        out = self._ordered().offset(offset)
        return out.limit(length) if length is not None else out

    def nth(self, n: int) -> dict | None:
        rows = self.slice(n, 1).collect()
        return rows[0].asDict() if rows else None

    def first(self):
        """league/csv returns [] for an empty set (ParserTest.php:461)."""
        row = self.nth(0)
        return row if row is not None else []

    def fetch_pairs(self, key, value) -> DataFrame:
        """Project two columns into (key, value) with FIRST-wins on duplicate
        keys (league/csv fetchPairs, README.md:24-34). ``min_by`` keeps the
        value of the minimal order key per group — one hash aggregate with
        map-side partials, no window."""
        keys = [F.col(c) if isinstance(c, str) else c for c in self.order_by]
        # a bare primitive order key keeps the aggregate hash-based
        # (struct-typed min_by buffers fall back to SortAggregate)
        order_expr = keys[0] if len(keys) == 1 else F.struct(*keys)
        key_col = F.col(key) if isinstance(key, str) else key
        # alias at groupBy time: renaming afterwards would need the column's
        # JVM name (absent under Spark Connect) and collides when the key
        # column is itself named 'value'
        return self.df.groupBy(key_col.alias("key")).agg(
            F.min_by(value, order_expr).alias("value")
        )

    def reduce(self, *aggs: Column) -> DataFrame:
        return self.df.agg(*aggs)

    def count(self) -> int:
        return self.df.count()

    def exists(self, condition) -> bool:
        # limit(1) short-circuits: no full scan once one match is found
        return self.df.filter(condition).limit(1).count() > 0

    def select(self, *cols) -> "Tabular":
        return Tabular(self.df.select(*cols), self.order_by)

    def header(self) -> list[str]:
        return self.df.columns

    # -- remaining TabularDataReader verbs (league/csv ≥9.25 full surface,
    #    SURVEY.md §2.9 "no bespoke work needed" group) -----------------

    def fetch_column_by_name(self, name: str) -> DataFrame:
        """fetchColumnByName: one column, insertion order preserved."""
        return self._ordered().select(name)

    def fetch_column_by_offset(self, offset: int) -> DataFrame:
        """fetchColumnByOffset: 0-based positional column."""
        return self._ordered().select(self.df.columns[offset])

    def map(self, *exprs) -> "Tabular":
        """map(closure) → projected expressions (closures become Columns)."""
        return Tabular(self.df.select(*exprs), self.order_by)

    def each(self):
        """each(closure): ordered iteration on the driver — inherently
        sequential in the reference too."""
        return self._ordered().toLocalIterator()

    def value(self, column: str):
        """value(): first row's column value, None when empty."""
        row = self.nth(0)
        return row.get(column) if row else None

    def to_local_iterator(self):
        return self._ordered().toLocalIterator()


def table_to_json(extracted: DataFrame) -> DataFrame:
    """``Table::jsonSerialize`` twin (reference ``src/Table.php:68-75``):
    one compact JSON document per extracted table with the same shape.
    ``rows`` iterates the TabularDataReader, so with a **non-empty header**
    each row is a JSON *object* keyed by header names — the record
    projected to header width with missing offsets null-filled, exactly
    ``combineArray`` (reference ``src/Parser.php:614-622``); with an empty
    header rows stay positional string arrays. Rows are rebuilt JVM-side
    from the flat cell-span stream using the table's ``row_lens`` column
    (cells per grid-expanded row — the span stream itself has no row
    boundaries): prefix-sum the lengths, slice the cell texts per row. No
    explode/re-group shuffle. Legacy rows with a null ``row_lens``
    (pre-round-2 parquet) fall back to one-cell rows. Null-valued keys
    (``"caption": null``, null-filled cells) are kept, matching PHP
    json_encode (``ignoreNullFields=false``; Spark always keeps null map
    values).

    PHP list-vs-object parity (round-3 VERDICT item 4): PHP coerces
    canonical integer-string array keys to int keys, and ``json_encode``
    emits a JSON *array* (not object) iff the keys are exactly
    ``0..n-1`` in insertion order (``array_is_list``). ``combineArray``
    inserts in header order, so a header of exactly
    ``["0","1",...,"n-1"]`` makes every row serialize positionally —
    e.g. an extracted header row whose cells are ``0,1,2``. Any other
    numeric-string header (``["1","2"]`` offset, ``["0","2"]`` gapped,
    ``["1","0"]`` reordered, ``["00","1"]`` non-canonical) keeps object
    rows because the coerced keys are not a 0-based in-order list.
    Rows on this path are still combineArray-projected (header width,
    null-fill) — only the JSON shape changes."""
    cells = F.filter(F.col("spans"), lambda s: s["kind"] == "cell")
    texts = F.transform(cells, lambda s: s["text"])
    lens = F.col("row_lens")
    header = F.col("header")
    # 1-based slice starts: [1, 1+l0, 1+l0+l1, ...]
    starts = F.aggregate(
        lens,
        F.array(F.lit(1)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    grouped = F.when(F.size(lens) == 0, F.array().cast("array<array<string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(lens), F.lit(1))),
            lambda i: F.slice(texts, F.element_at(starts, i), F.element_at(lens, i)),
        )
    )
    rows = F.when(lens.isNull(), F.transform(cells, lambda s: F.array(s["text"]))).otherwise(
        grouped
    )
    # combineArray: project each row to header width, null-fill missing
    # offsets (F.get is 0-based and yields NULL out-of-bounds even under
    # ANSI mode), drop cells beyond the header. Header names are unique —
    # duplicate headers are rejected at config time (§2.3).
    keyed_rows = F.transform(
        rows,
        lambda row: F.map_from_arrays(
            header,
            F.transform(
                F.sequence(F.lit(0), F.size(header) - F.lit(1)),
                lambda j: F.get(row, j),
            ),
        ),
    )
    # combineArray-projected positional rows for the PHP list case
    projected_rows = F.transform(
        rows,
        lambda row: F.transform(
            F.sequence(F.lit(0), F.size(header) - F.lit(1)),
            lambda j: F.get(row, j),
        ),
    )
    # header == ["0","1",...,"n-1"] exactly: PHP int-key coercion turns
    # these into keys 0..n-1 in insertion order → array_is_list → JSON
    # array. int→string cast is canonical decimal, so "00"/"+1"/" 1"
    # headers never compare equal and correctly stay objects.
    header_is_php_list = header == F.transform(
        F.sequence(F.lit(0), F.size(header) - F.lit(1)),
        lambda i: i.cast("string"),
    )
    opts = {"ignoreNullFields": "false"}
    js = F.when(
        (F.size(header) > 0) & header_is_php_list,
        F.to_json(
            F.struct(
                F.col("caption").alias("caption"),
                header.alias("header"),
                projected_rows.alias("rows"),
            ),
            opts,
        ),
    ).when(
        F.size(header) > 0,
        F.to_json(
            F.struct(
                F.col("caption").alias("caption"),
                header.alias("header"),
                keyed_rows.alias("rows"),
            ),
            opts,
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("caption").alias("caption"),
                header.alias("header"),
                rows.alias("rows"),
            ),
            opts,
        )
    )
    return extracted.select("doc_id", "table_idx", js.alias("js"))


def golden_diff(actual: DataFrame, expected: DataFrame) -> DataFrame:
    """Multiset diff for golden-expectation comparison (SURVEY §2.7 set
    ops): rows present in ``actual`` but not ``expected`` tagged
    ``unexpected``, the reverse tagged ``missing`` — ``exceptAll`` keeps
    duplicate multiplicity, so doubled rows are caught where ``except``
    would hide them. An empty result == exact multiset equality."""
    a = actual.exceptAll(expected).withColumn("golden_side", F.lit("unexpected"))
    b = expected.exceptAll(actual).withColumn("golden_side", F.lit("missing"))
    return a.unionAll(b)


def extracted_cells(extracted: DataFrame) -> DataFrame:
    """Explode extraction output spans to one row per span — the relational
    view used by downstream queries and the DuckDB oracles:
    (doc_id, table_idx, kind, text, media_ref, offset)."""
    return extracted.select(
        "doc_id",
        "table_idx",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        "table_idx",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
