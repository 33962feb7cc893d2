"""End-to-end extraction pipeline: skew-aware plan + lineage + resume.

Plan shape (SURVEY.md §3.4, §4.3) — all plan-shape decisions, no custom
Catalyst rules:

    discovery (offsets-only scan → mega doc_ids, driver-planned)   │
    scan #1 (doc_id NOT IN mega_ids) → pass 1 (mapInArrow) ────────┐
    scan #2 (doc_id IN mega_ids, row-group-PRUNED by the pushed    │
        filter) → boundary-scan chunking                           │
        → chunk rows (status='chunk', ≤64 tables, base ordinal)    │
        → full-entropy repartition → pass 2 (mapInArrow) ──────────┴→ union
    → per-partition lineage agg → snapshot-committed sink

Why explicit: UDF-stage skew is invisible to AQE (it only splits skewed
joins/aggregations), so a 2,000-table mega-document would otherwise pin one
task for the whole stage.  Mega docs are found by a span-COUNT discovery
job that reads only the int32 offset leaf (nested schema pruning), then
split by a linear boundary scan; routing is a performance split, never a
correctness boundary — misrouted docs parse in place (pass 1) or as one
whole-doc chunk (pass 2).  (At fleet scale the routing predicate would be
a STORED top-level byte-length column, giving scan #2 parquet min/max
pruning + predicate pushdown with no discovery job at all; discovery is
the honest stand-in because the corpus schema is fixed by BASELINE.json.)

Why TWO scans (a deliberate trade): scan #2 re-reads the mega tail instead
of persisting pass-1 output — persisting a corpus-sized intermediate at
10^12 docs costs more storage/IO than a second columnar scan, and with the
pushed ``doc_id IN`` filter the re-read touches only the row groups that
actually hold mega docs.  The only shuffle in the job moves the skewed
tail (mega-doc chunks ≪ corpus), repartitioned on ``xxhash64(doc_id,
chunk)``.  Normal docs ride the scan's byte-balanced file splits
(``maxPartitionBytes``); a full repartition remains available
(``repartition_normal='always'``) for pathological file layouts, and
engages automatically when the scan exposes too little parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ParserConfig
from ..operators.extract import extract_tables, html_reassembly_col
from ..sources.sinks import SnapshotSink

# Docs whose total text size exceeds this take the mega-doc split path.
DEFAULT_MEGA_COST = 256 * 1024  # bytes of HTML

# Discovery routing collects at most this many mega doc_ids to the driver
# (ids only — never bytes). 64Ki ids ≈ a few MB of strings; past it the
# planner falls back to distributed cost routing. At fleet scale the mega
# tail is vanishingly rare by construction (it is the skew tail), and a
# STORED byte-length column would replace discovery outright (see module
# docstring).
DEFAULT_DISCOVER_CAP = 65536


def mega_span_count_hint(mega_cost_threshold: int) -> int:
    """Span-count proxy threshold matching a byte threshold.

    Routing needs only a CHEAP predicate that puts almost-all mega docs on
    the chunk path — it is a performance hint, not a correctness boundary:
    a byte-heavy doc the proxy misses is parsed in place by pass 1
    (mega_policy='parse'), and a span-heavy doc with tiny HTML becomes one
    whole-doc chunk parsed downstream (chunk mode's documented invariant).
    4 KiB/span is the conservative end of the corpus shape (one table
    fixture per span); the floor keeps tiny thresholds sane."""
    return max(8, mega_cost_threshold // 4096)


def discover_mega_ids(
    documents: DataFrame,
    *,
    span_count_hint: int,
    cap: int = DEFAULT_DISCOVER_CAP,
) -> list[str] | None:
    """Find mega-doc candidates by span COUNT — an offsets-only columnar scan.

    ``size(spans.offset)`` needs just the int32 offset leaf (nested schema
    pruning drops kind/text/media_ref), so this job reads a few bytes per
    document where the round-2 routing scan re-decoded and re-concatenated
    every text byte in the corpus merely to find the tail. Returns the ids
    (possibly empty), or None when more than ``cap`` candidates exist —
    callers then fall back to distributed cost routing, keeping the driver
    out of the data path. doc_id-less rows are never candidates (they ride
    the normal leg). The predicate here is kept EXACTLY the null-safe form
    _prep_legs builds for the legs, so the returned ids are a faithful
    materialization of the mega leg's routing filter."""
    n_spans = F.coalesce(F.size(F.col("spans").getField("offset")), F.lit(0))
    rows = (
        documents.where(n_spans > span_count_hint)
        .where(F.col("doc_id").isNotNull())
        .select("doc_id")
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        return None
    return [r[0] for r in rows]


def doc_cost_col():
    """JVM-side cost proxy COLUMN: total text length across spans (no
    Python). The single source of truth for routing predicates and
    :func:`with_doc_cost` — the 'cost' routing branch filters on this very
    expression, so the two can never drift.

    Lambda-free on purpose: ``array_join`` skips null elements, so
    ``length(array_join(spans.text, ''))`` equals the old per-span
    ``aggregate(...coalesce(length(text), 0)...)`` exactly, stays inside
    whole-stage codegen (interpreted HOF lambdas are not codegen'd), and
    costs no LambdaFunction resolution on the ~10 analyzer passes the
    pipeline plan takes during construction.

    NULL spans must cost 0, not NULL: a NULL cost would fail BOTH pass
    filters, silently dropping the doc — and with resume on, it would be
    re-scanned forever (it never gets its completion marker)."""
    cost = F.length(F.array_join(F.col("spans").getField("text"), ""))
    return F.coalesce(cost, F.lit(0)).cast("long")


def with_doc_cost(documents: DataFrame) -> DataFrame:
    """Materialize :func:`doc_cost_col` as a ``doc_cost`` column."""
    return documents.withColumn("doc_cost", doc_cost_col())


def salted(documents: DataFrame, num_partitions: int) -> DataFrame:
    """Deterministic salted repartition (north rule: explicit skew control).

    Repartitions on the FULL-ENTROPY hash, not a pre-modded salt: feeding P
    distinct salt values through the partitioner's own hash is balls-in-
    bins — ~1/e of the P partitions would come out empty and others would
    stack 2-3 salts. The hash rides the repartition expression directly —
    no withColumn/drop pair (each intermediate Dataset is a full analyzer
    pass, serial driver time)."""
    return documents.repartition(num_partitions, F.xxhash64("doc_id"))


def plan_extraction(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    num_partitions: int | None = None,
    mega_cost_threshold: int = DEFAULT_MEGA_COST,
    tables_per_chunk: int = 64,
    repartition_normal: str = "auto",
    routing: str = "discover",
    discover_cap: int = DEFAULT_DISCOVER_CAP,
) -> DataFrame:
    """Build the extraction DataFrame (with default routing='discover', one
    tiny id-discovery job runs while the mega leg is planned;
    routing='cost' is fully lazy) — the single-action union of
    :func:`plan_extraction_legs`. Prefer :func:`run_extraction_concurrent`
    when you control the action (see run_job): in
    the union plan the DAGScheduler cannot launch the result stage (which
    holds pass 1's scan tasks) until the mega leg's chunk map stage
    finishes, so the bulk of the cluster idles behind the skewed tail's
    barrier."""
    normal_out, mega_out = plan_extraction_legs(
        documents,
        config,
        num_partitions=num_partitions,
        mega_cost_threshold=mega_cost_threshold,
        tables_per_chunk=tables_per_chunk,
        repartition_normal=repartition_normal,
        routing=routing,
        discover_cap=discover_cap,
    )
    if mega_out is None:
        return normal_out
    return normal_out.unionByName(mega_out)


def plan_extraction_legs(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    num_partitions: int | None = None,
    mega_cost_threshold: int = DEFAULT_MEGA_COST,
    tables_per_chunk: int = 64,
    repartition_normal: str = "auto",
    routing: str = "discover",
    discover_cap: int = DEFAULT_DISCOVER_CAP,
) -> tuple[DataFrame, DataFrame | None]:
    """Build the two extraction legs as INDEPENDENT lazy DataFrames.

    Returns ``(normal_out, mega_out)``; ``mega_out`` is None in single-table
    mode (no mega splitting). The legs share no shuffle dependency, so a
    caller that runs one action per leg from two driver threads (see
    :func:`run_concurrent`) gets them scheduled as concurrent jobs: the mega
    leg's scan#2 + chunk stage fills task slots the pass-1 stage leaves idle
    in its straggler tail instead of barriering in front of it. Measured on
    the sf0.1 bench corpus (pinned local[32]): union plan 7.0 s vs
    concurrent legs 5.7 s; at local[8] both ~15.4 s (saturated cores — the
    overlap is free capacity only the wide configuration has), which is
    exactly the shape the N→4N scaling rule rewards.

    ``repartition_normal``: whether to shuffle the normal-doc stream before
    extraction. ``'never'``: extract directly on scan partitions — zero
    all-data shuffle; correct whenever input files are well-sized, since
    ``maxPartitionBytes`` balances splits by bytes and per-doc cost is
    bounded by ``mega_cost_threshold``. ``'always'``: salted repartition
    (pay one full shuffle to fix pathological file layouts). ``'auto'``
    (default): shuffle only when the scan exposes too few partitions to
    keep the cluster busy. The mega-doc chunk stream is ALWAYS salted —
    that shuffle moves only the skewed tail, which is the north rule's
    skew case without the 100 TB full-corpus shuffle.

    ``routing``: how docs are split between the legs — ``'discover'``
    (default; a LAZY span-count predicate routes the legs, and an
    offsets-only id-discovery job — run only when the mega leg is planned —
    prunes the mega scan via pushed-down ``doc_id IN``) or ``'cost'``
    (round-2 distributed span-text-length filters, fully lazy).
    See the routing comment in :func:`_prep_legs`; output rows are
    identical under either.
    """
    prep = _prep_legs(
        documents,
        config,
        num_partitions=num_partitions,
        mega_cost_threshold=mega_cost_threshold,
        tables_per_chunk=tables_per_chunk,
        repartition_normal=repartition_normal,
        routing=routing,
        discover_cap=discover_cap,
    )
    return _plan_normal_leg(prep), _plan_mega_leg(prep)


def _prep_legs(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    num_partitions: int | None = None,
    mega_cost_threshold: int = DEFAULT_MEGA_COST,
    tables_per_chunk: int = 64,
    repartition_normal: str = "auto",
    routing: str = "discover",
    discover_cap: int = DEFAULT_DISCOVER_CAP,
) -> dict:
    """Shared, JOB-FREE leg preparation: source shuffling decision + the two
    complementary routing predicates. Everything here is lazy driver work so
    both legs can plan themselves independently (run_extraction_concurrent
    threads them; plan_extraction_legs calls them in sequence).

    Leg routing (round-3 discovery rewrite, made lazy in the serial-path
    diet). Routing is a PERFORMANCE split, not a correctness boundary:
    whatever predicate lands a doc in whichever leg, pass 1 parses it in
    place (mega_policy='parse') and chunk mode turns it into chunk rows
    parsed downstream — output rows are identical either way
    (tests/test_pipeline.py pins this). That freedom buys two scans' worth
    of bytes back:

    - 'discover' (default): BOTH legs route on the lazy span-count proxy
      (``size(spans.offset)`` — the int32 offset leaf only, no text bytes,
      no Spark job, exact complements by construction). When the mega leg
      is planned it additionally runs discover_mega_ids — the offsets-only
      job — and, because the discovered id set IS the exact materialization
      of its own routing predicate, swaps the filter for `doc_id IN (...)`,
      which pushes into the Parquet reader and prunes at row-group
      granularity: the "second full scan" becomes a read of just the row
      groups holding mega docs. The normal leg never waits for that job —
      its complement predicate is a per-row array-length check, cheaper
      than the round-2 InSet probe over 64Ki id strings and free of the id
      list's per-task plan-serialization weight. Ids over discover_cap:
      the mega leg keeps the lazy predicate (cost-style full scan of the
      tail, still exactly complementary). (At fleet scale a STORED
      byte-length column subsumes discovery — module docstring — but the
      discovery job IS the honest stand-in: it reads the narrowest leaf,
      never bytes, never spans.)
    - 'cost': the round-2 distributed routing — both legs filter on the
      sort-free span-text length (order-independent concat length ==
      len(reassembled html) under the corpus contract). No id list; both
      scans read every text byte. Kept for callers that want routing on
      actual byte cost rather than the span-count proxy.

    Plan construction is deliberately terse: every intermediate Dataset
    costs a full Catalyst analyzer pass over the whole subtree (measured
    ~1s per extract_tables call in the round-2 shape — pure serial driver
    time that caps the N→4N scaling ratio).
    """
    config = config or ParserConfig()
    spark = documents.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if repartition_normal == "always":
        shuffle_source = True
    elif repartition_normal == "never":
        shuffle_source = False
    else:  # auto: cheap structural check, no job triggered
        scan_parts = documents.rdd.getNumPartitions()
        shuffle_source = scan_parts < max(2, num_partitions // 2)

    if not config.select_all_tables:
        # reference single-table semantics: selection applies to the whole
        # document, so mega splitting does not apply
        source = documents.select("doc_id", "spans")
        if shuffle_source:
            source = salted(source, num_partitions)
        return {"config": config, "single_source": source}

    shuffled = salted(documents, num_partitions) if shuffle_source else documents

    if routing == "discover":
        # size() of a NULL array is NULL (or -1 under legacy sizeOfNull) —
        # coalesce to 0 so a null-spans doc rides the normal leg instead of
        # failing BOTH predicates; null doc_id likewise must not vanish
        # (the mega leg's IN/shuffle keys on doc_id, so it takes only
        # non-null ids — discover_mega_ids applies the same carve-out)
        n_spans = F.coalesce(
            F.size(F.col("spans").getField("offset")), F.lit(0)
        )
        hint = mega_span_count_hint(mega_cost_threshold)
        normal_filter = F.col("doc_id").isNull() | (n_spans <= hint)
        mega_filter = F.col("doc_id").isNotNull() & (n_spans > hint)
    else:
        route_len = doc_cost_col()
        normal_filter = route_len <= mega_cost_threshold
        mega_filter = route_len > mega_cost_threshold

    return {
        "config": config,
        "documents": documents,
        "shuffled": shuffled,
        "num_partitions": num_partitions,
        "mega_cost_threshold": mega_cost_threshold,
        "tables_per_chunk": tables_per_chunk,
        "routing": routing,
        "discover_cap": discover_cap,
        "normal_filter": normal_filter,
        "mega_filter": mega_filter,
    }


def _reassembled(source: DataFrame) -> DataFrame:
    return source.select(
        F.col("doc_id"), html_reassembly_col("spans").alias("html")
    )


def _plan_normal_leg(prep: dict) -> DataFrame:
    """Pass 1 — the bulk. Fully lazy: no discovery job, no id list.

    Routed-out docs are filtered JVM-SIDE, so mega-doc bytes never cross
    the Arrow boundary just to be skipped. No cache, no materialization:
    pass 1 output flows straight to the consumer/sink. mega_policy='parse':
    a doc the routing proxy under-calls (byte-heavy, few spans) is parsed
    in place — one slow task, never a dropped doc."""
    if "single_source" in prep:
        return extract_tables(
            prep["single_source"], prep["config"], spread_small_inputs=False
        )
    return extract_tables(
        _reassembled(prep["shuffled"].where(prep["normal_filter"])),
        prep["config"],
        mega_cost_threshold=prep["mega_cost_threshold"],
        tables_per_chunk=prep["tables_per_chunk"],
        mega_policy="parse",
        spread_small_inputs=False,
        pre_reassembled=True,
        has_base=False,
    )


def _plan_mega_leg(prep: dict) -> DataFrame | None:
    """Pass 2 — the skewed tail only. Returns None when the leg is absent
    (single-table mode, or discovery finds no mega docs at all).

    Discovery mode runs the offsets-only id job HERE — not on the shared
    planning path — so a threaded caller overlaps it with pass 1's launch.
    The discovered id list drives PRUNING only: the leg filters on
    ``doc_id IN (ids) AND mega_filter``, so the scan row-group-prunes on
    the pushed IN while the span-count conjunct keeps the row set the
    exact complement of the normal leg even when doc_ids are NOT unique
    (a small doc sharing a mega doc's id would otherwise ride both legs
    and its tables would be emitted twice).

    The leg: a second PRUNED scan (discovery: row-group-pruned by the
    pushed doc_id IN filter; fallback/cost: reads the corpus but keeps just
    the tail), split into chunk rows by a linear boundary scan, salted so
    one doc's chunks spread across the cluster, then extracted with global
    table ordinals. The shuffle here moves mega-doc bytes only — there is
    NO full-corpus shuffle anywhere in the plan."""
    if "single_source" in prep:
        return None
    shuffled = prep["shuffled"]
    num_partitions = prep["num_partitions"]
    mega_source = None
    if prep["routing"] == "discover":
        mega_ids = discover_mega_ids(
            prep["documents"],
            span_count_hint=mega_span_count_hint(prep["mega_cost_threshold"]),
            cap=prep["discover_cap"],
        )
        if mega_ids is not None:
            if not mega_ids:
                # no skew tail at all: the normal leg's complement predicate
                # already admits every doc, so the mega leg simply vanishes
                return None
            # The pruned scan inherits the corpus's partitioning (hundreds
            # of tasks, nearly all empty after the IN filter) and the chunk
            # kernel is a PYTHON stage — every empty partition still pays
            # the worker task prologue. Compact to one partition per
            # discovered doc first: this shuffle moves only the mega docs
            # themselves, and the chunk split is per-doc serial anyway, so
            # extra partitions buy nothing.
            mega_source = shuffled.where(
                F.col("doc_id").isin(mega_ids) & prep["mega_filter"]
            ).repartition(
                min(num_partitions, len(mega_ids)), F.xxhash64("doc_id")
            )
    if mega_source is None:
        # cost routing, or discovery over cap: the lazy predicate scans the
        # corpus but keeps just the tail — still the exact complement of
        # the normal leg's filter
        mega_source = shuffled.where(prep["mega_filter"])
    chunks = extract_tables(
        _reassembled(mega_source),
        prep["config"],
        mega_cost_threshold=prep["mega_cost_threshold"],
        tables_per_chunk=prep["tables_per_chunk"],
        mega_policy="chunk",
        spread_small_inputs=False,
        pre_reassembled=True,
        has_base=False,
    )
    # chunk mode emits ONLY status='chunk' rows (extract.py documents the
    # invariant at the emit site: an unsplittable doc becomes one whole-doc
    # chunk, parsed downstream after the salt spreads it) and the routing
    # predicate above is the complement of pass 1's, so the chunk pass has
    # exactly one consumer — no persist, no always-empty parsed-in-place
    # union leg. A chunk row carries exactly ONE text span (the chunk's
    # HTML, built by the extractor) — element_at(1) IS its reassembly,
    # lambda-free.
    chunk_rows = chunks.select(
        "doc_id",
        F.coalesce(F.element_at("spans", 1)["text"], F.lit("")).alias("html"),
        F.col("table_idx").alias("table_idx_base"),
    )
    return extract_tables(
        salted_chunks(chunk_rows, num_partitions),
        prep["config"],
        spread_small_inputs=False,
        pre_reassembled=True,
        has_base=True,
    )


def run_extraction_concurrent(
    documents: DataFrame,
    config: ParserConfig | None = None,
    *,
    leg_action,
    **plan_kwargs,
) -> dict:
    """Plan AND execute both extraction legs in concurrent driver threads.

    The round-3 serial-path diet over ``plan_extraction_legs`` +
    ``run_concurrent``: in the serial shape the discovery job plus BOTH
    legs' Catalyst analysis finish before the first task launches —
    measured ~0.5 s of driver wall at local[32]/sf0.1, a cost only the wide
    configuration feels (at low core counts the box is saturated anyway),
    i.e. exactly the shape the N→4N scaling rule punishes. Here each leg
    plans itself inside its own thread: the normal leg's routing predicate
    is lazy, so pass 1's scan tasks are launching while the mega thread is
    still running id discovery and analyzing the chunk plan.

    ``leg_action(name, df)`` (name in {'normal','mega'}) runs the leg's
    action in that thread — count, write, collect. Returns
    ``{'normal': result, 'mega': result}`` with ``'mega': None`` when the
    leg is absent (single-table mode or an unskewed corpus). Errors in
    either thread re-raise after both finish (run_concurrent contract)."""
    prep = _prep_legs(documents, config, **plan_kwargs)
    spark = documents.sparkSession

    def normal_thunk():
        return leg_action("normal", _plan_normal_leg(prep))

    def mega_thunk():
        mega = _plan_mega_leg(prep)
        return None if mega is None else leg_action("mega", mega)

    mega_res, normal_res = run_concurrent(
        [mega_thunk, normal_thunk], spark=spark
    )
    return {"normal": normal_res, "mega": mega_res}


def run_concurrent(actions, spark: SparkSession | None = None):
    """Run driver-side actions (zero-arg callables) as concurrent Spark jobs.

    One thread per action — Spark's scheduler then packs the jobs' stages
    onto free task slots together instead of serializing them behind each
    other's barriers (standard multi-job submission; PySpark pins py4j
    threads, so thread-local job groups/properties stay isolated). When a
    session is passed AND it runs the FAIR scheduler, each action gets its
    own on-the-fly scheduler pool: under FIFO, AQE materializes each query
    stage as a separate job with a LATER job id, so a small leg's follow-up
    stages queue behind a big leg's running stage (measured: the 4-task
    mega chunk stage waited 4 s behind pass 1's 256 tasks); FAIR pools let
    both legs' stages share slots the whole time. Results come back in
    input order; the first exception is re-raised after all threads finish,
    so a failed leg cannot leak a half-run."""
    import threading

    results: list = [None] * len(actions)
    errors: list = [None] * len(actions)
    fair = (
        spark is not None
        and spark.conf.get("spark.scheduler.mode", "FIFO").upper() == "FAIR"
    )

    def runner(i, fn):
        try:
            if fair:
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"leg-{i}"
                )
            results[i] = fn()
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            errors[i] = exc

    threads = [
        threading.Thread(target=runner, args=(i, fn), daemon=True)
        for i, fn in enumerate(actions)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for exc in errors:
        if exc is not None:
            raise exc
    return results


def salted_chunks(chunks: DataFrame, num_partitions: int) -> DataFrame:
    """Chunks of one mega-doc must NOT hash to one partition — repartition
    on the full-entropy hash of (doc_id, chunk ordinal); see salted()."""
    return chunks.repartition(
        num_partitions, F.xxhash64("doc_id", "table_idx_base")
    )


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
    # Materialize the extraction exactly once: write the data files, then
    # derive lineage by re-reading them (a cheap columnar aggregate) instead
    # of recomputing the whole extraction DAG. The snapshot commits only
    # after BOTH tables are on disk — crash at any earlier point leaves no
    # visible state ("lineage in the same transaction", SURVEY.md §4.3).
    # The legs PLAN THEMSELVES and write as CONCURRENT jobs into sibling
    # subdirectories (two independent commit protocols — no shared
    # _temporary dir): pass 1's write is launching while the mega thread is
    # still running discovery (see run_extraction_concurrent). Visibility
    # is unchanged — nothing is committed until both writes finish.
    data_path = sink.data_path(run_id)

    def write_leg(name: str, df: DataFrame):
        df.write.mode("errorifexists").parquet(data_path.rstrip("/") + "/" + name)
        return df.schema

    res = run_extraction_concurrent(
        documents, config, leg_action=write_leg, **plan_kwargs
    )
    committed = (
        spark.read.schema(res["normal"])
        .option("recursiveFileLookup", "true")
        .parquet(data_path)
    )
    lineage = lineage_from_extracted(committed, run_id)
    lineage_path = sink.lineage_path(run_id)
    lineage.write.mode("errorifexists").parquet(lineage_path)
    return sink.commit_run(run_id, data_path, lineage_path)
