"""Lake-maintenance surface through the driver contract: the parquet MERGE
(keyed upsert) primitive applied to a real table and verified against the
relational definition of merge semantics in SQL.

The sink itself (sinks/upsert.py) is write-side and pytest-covered; this
query makes its SEMANTICS driver-checkable: write the base table, apply a
deterministic update+insert batch through ``merge_parquet`` (last-writer-
wins rewrite), read the merged directory back, and hash-compare against a
FULL OUTER JOIN oracle — updated keys must carry the new values, untouched
keys the old ones, inserted keys must exist exactly once.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import cents
from ..sinks.upsert import merge_parquet
from ..sources import load_table
from .registry import query


@query(
    "q_merge_upsert",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, 'U' AS status, total_cents + 100000 AS total_cents
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', total_cents
      FROM base WHERE o_orderkey % 100 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.status, b.status) AS status,
           CAST(COALESCE(u.total_cents, b.total_cents) AS BIGINT) AS total_cents
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed parquet MERGE end-to-end: base orders → deterministic batch
    (every 10th key updated to status 'U' with +1000.00; every 100th key
    re-inserted under key+10M as status 'N') → last-writer-wins rewrite →
    read-back. Money in exact integer cents throughout. The oracle is the
    declarative merge: FULL OUTER JOIN with update-priority COALESCE."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="merge_upsert_") + "/orders"
    base.write.mode("overwrite").parquet(path)
    updates = base.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("total_cents") + 100000).alias("total_cents"),
    ).unionByName(
        base.where(F.col("o_orderkey") % 100 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("status"),
            F.col("total_cents"),
        )
    )
    merge_parquet(spark, path, updates, key="o_orderkey")
    return spark.read.parquet(path)


from pyspark.sql import Window  # noqa: E402


@query(
    "q_scd2_history",
    extra=True,
    oracle="""
    WITH src AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    changed AS (
      SELECT * FROM (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_value
        FROM src
      ) WHERE prev_value IS NULL OR value <> prev_value
    ),
    versioned AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS version,
             lead(ts) OVER w AS next_ts
      FROM changed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           ROUND(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(next_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (next_ts IS NULL) AS is_current
    FROM versioned
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build from a change log:
    collapse consecutive no-change rows, then open [valid_from, valid_to)
    intervals with ``lead`` and flag the open-ended current version — the
    standard lake-dimension maintenance pattern, expressed as two chained
    windows plus a rank on ONE user_id partitioning (single Exchange; the
    change-collapse filter runs between them without re-shuffling).
    Deterministic ordering tiebreak on event_id mirrors the oracle."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .drop("prev_value")
    )
    versioned = changed.select(
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return versioned.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        F.round("value", 2).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


@query(
    "q_incremental_mv",
    extra=True,
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST((2 * SUM(CAST(ROUND(value * 100) AS BIGINT)) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS avg_cents,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/incremental.py): the per-(user, type) aggregate view is
    built as PERSISTED STATE — history (ts < Jan 21) is partial-aggregated,
    written to parquet, READ BACK, and two later ingest days fold in via
    the algebraic merge (count partials merged by SUM, etc.) — never
    rescanning history. The oracle is the from-scratch GROUP BY over all
    events: the merge's closure property says the two must be
    hash-identical; money in exact integer cents, avg via the half-up
    integer recurrence (functions/scalar.py:half_up_units), timestamps
    formatted.

    Scale: this is the O(batch)-per-ingest view-maintenance shape — at
    100 TB of history the rebuild rescans everything, the merge touches
    |state| + |batch| rows with ONE shuffle on the view key (both sides
    pre-aggregated). The state round-trips through parquet here exactly as
    it would in production (bucket it on the key to kill even that
    shuffle).
    """
    from ..functions.scalar import half_up_units
    from ..operators.incremental import agg_state, merge_states

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", cents("value").alias("v_cents")
    )
    keys = ["user_id", "event_type"]
    aggs = {
        # count over the never-null ts, NOT v_cents: count(col) skips that
        # column's nulls, and the oracle's COUNT(*) counts rows — identical
        # only while value has no nulls (a latent hash/denominator trap)
        "n_events": ("ts", "count"),
        "total_cents": ("v_cents", "sum"),
        "first_ts": ("ts", "min"),
        "last_ts": ("ts", "max"),
    }
    cut1, cut2 = "2024-01-21", "2024-01-26"
    state_dir = tempfile.mkdtemp(prefix="incr_mv_") + "/state"
    # ingest 1: all history before cut1 -> persisted state table
    agg_state(ev.where(F.col("ts") < cut1), keys, aggs).write.mode(
        "overwrite"
    ).parquet(state_dir)
    # ingests 2+3: two later windows fold into the read-back state
    state = spark.read.parquet(state_dir)
    batch2 = agg_state(
        ev.where((F.col("ts") >= cut1) & (F.col("ts") < cut2)), keys, aggs
    )
    batch3 = agg_state(ev.where(F.col("ts") >= cut2), keys, aggs)
    view = merge_states([state, batch2, batch3], keys, aggs)
    return view.select(
        "user_id",
        "event_type",
        "n_events",
        "total_cents",
        half_up_units(F.col("total_cents"), F.col("n_events"), 1).alias(
            "avg_cents"
        ),
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


@query(
    "q_zorder_index",
    # Promoted to the graded window in round 7: the lake-layout family
    # previously had no driver-graded representative.
    oracle="""
    WITH base AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
      FROM events
    ),
    bounds AS (
      SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
             MIN(day) AS dlo, MAX(day) AS dhi
      FROM base
    ),
    bk AS (
      SELECT greatest(0, least(15,
               ((user_id - ulo) * 16) // (uhi - ulo + 1))) AS ub,
             greatest(0, least(15,
               ((day - dlo) * 16) // (dhi - dlo + 1))) AS db
      FROM base CROSS JOIN bounds
    ),
    zz AS (SELECT ub, db, ((((ub >> 0) & 1) * 1) + (((ub >> 1) & 1) * 4) + (((ub >> 2) & 1) * 16) + (((ub >> 3) & 1) * 64) + (((db >> 0) & 1) * 2) + (((db >> 1) & 1) * 8) + (((db >> 2) & 1) * 32) + (((db >> 3) & 1) * 128)) AS z FROM bk)
    SELECT CAST(z AS BIGINT) AS z,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ub) AS BIGINT) AS min_ub,
           CAST(MAX(ub) AS BIGINT) AS max_ub,
           CAST(MIN(db) AS BIGINT) AS min_db,
           CAST(MAX(db) AS BIGINT) AS max_db
    FROM zz GROUP BY z
    """,
)
def q_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) code computation (sinks/zorder.py) over events
    (user_id x event day, 4 bits each): min/max-bounded bucketization in
    pure integer floor division, then the bit-interleave — the SAME
    GENERATED SQL TEXT runs on both engines (the oracle embeds
    morton_sql()'s output verbatim), so the code values are hash-exact by
    construction. Aggregated per z-cell with each dimension's bucket
    min/max — the footer-stats view a file-skipping scan would see.

    The layout effect the code exists for (multi-dim box filters touching
    few files after repartitionByRange(z) + sortWithinPartitions) is
    asserted against real written files in tests/test_layout_pruning.py.
    """
    from ..sinks.zorder import bucketize, morton_sql

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
    )
    bounds = ev.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("day").alias("dlo"),
        F.max("day").alias("dhi"),
    )
    bk = ev.crossJoin(F.broadcast(bounds)).select(
        bucketize(F.col("user_id"), F.col("ulo"), F.col("uhi"), 4).alias("ub"),
        bucketize(F.col("day"), F.col("dlo"), F.col("dhi"), 4).alias("db"),
    )
    zz = bk.withColumn("z", F.expr(morton_sql(["ub", "db"], 4)))
    return zz.groupBy("z").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ub").alias("min_ub"),
        F.max("ub").alias("max_ub"),
        F.min("db").alias("min_db"),
        F.max("db").alias("max_db"),
    )


@query(
    "q_schema_evolution",
    extra=True,
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(NULL AS VARCHAR) AS channel
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
           CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END AS channel
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution on a plain-parquet table: generation 1 is
    written without ``channel``, generation 2 adds it; a single
    ``mergeSchema`` read reconstructs the union schema with NULLs for the
    old files — the no-rewrite column-add every long-lived lake table
    needs. The oracle is the relational definition (old rows with NULL
    channel UNION new rows with values); a read that dropped the column,
    defaulted it wrong, or leaked generation-2 values into generation-1
    rows flips the hash.

    Scale: mergeSchema's footer-union runs on file METADATA only (cost ~
    n_files, not data); the data files are never rewritten. At 100 TB
    that's the difference between a metadata operation and a full-table
    rewrite. (Columnar formats make the NULL backfill free at scan time —
    missing columns simply aren't materialized.)
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="schema_evo_") + "/orders"
    base.where(F.col("o_orderkey") % 2 == 0).write.mode("overwrite").parquet(
        path
    )
    gen2 = base.where(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("web")).otherwise("store"),
    )
    gen2.write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


@query(
    "q_compaction_invariance",
    extra=True,
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
    FROM orders
    """,
)
def q_compaction_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (sinks/upsert.py:compact_parquet) proven to
    be a pure LAYOUT operation: the table is deliberately written as many
    tiny files (64 hash partitions of sf0.01 orders), compacted to
    target_records_per_file, and read back — the oracle is the original
    relation, so any dropped/duplicated/mutated row during the rewrite
    flips the hash. The file-count reduction itself is asserted in
    tests/test_pipeline.py's sink coverage; here the DRIVER certifies the
    data invariance half of the contract.

    Scale: compaction is the nightly companion of every streaming/upsert
    sink (thousands of per-batch files otherwise dominate scan cost via
    open/footer overhead); rewrite cost is one pass, readers see either
    layout — never wrong data.
    """
    from ..sinks.upsert import compact_parquet

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="compaction_") + "/orders"
    base.repartition(64).write.mode("overwrite").parquet(path)
    compact_parquet(spark, path, target_records_per_file=100_000)
    return spark.read.parquet(path)


@query(
    "q_dense_ids",
    extra=True,
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
             AS dense_id
    FROM documents
    """,
)
def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed dense surrogate keys (operators/ids.py:
    assign_dense_ids) under the total order (source, doc_id): range-
    partition on the order, per-partition parallel row_number, driver-side
    cumulative offsets stitched back by broadcast. The oracle is the
    textbook single-window ``ROW_NUMBER() OVER (ORDER BY ...) - 1`` —
    the operator's whole contract is producing that exact relation
    WITHOUT the single-partition window the textbook plan pays for.

    Scale: one range shuffle (sampled bounds keep output partitions
    balanced) + an O(partitions) driver exchange — this is how you mint
    stable training-example ids over 100 TB; monotonically_increasing_id
    is parallel but sparse and run-unstable, the global window is exact
    but serial; this is exact AND parallel.
    """
    from ..operators.ids import assign_dense_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_dense_ids(docs, ["source", "doc_id"], n_partitions=8)


@query(
    "q_json_source_permissive",
    extra=True,
    oracle="""
    SELECT FALSE AS is_corrupt,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_n_chars
    FROM documents
    UNION ALL
    SELECT TRUE,
           CAST(COUNT(*) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM documents WHERE doc_id % 100 = 0
    """,
)
def q_json_source_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines SOURCE with PERMISSIVE corrupt-record handling — the
    ingest-side twin of the ALTO pipeline's unsupported-namespace error
    column (quarantine, never fail the job, never drop silently): the
    documents table is written as real JSONL, one deliberately truncated
    line is planted per doc_id % 100 == 0, and the explicit-schema read
    must (a) parse every valid line with values intact and (b) route each
    corrupt line to ``_corrupt`` with null fields. The oracle counts both
    populations and check-sums n_chars over the good rows — a reader that
    dropped, double-parsed, or half-parsed a corrupt line flips the hash.

    Scale: schema-explicit JSON read is a parallel narrow scan (no
    inference pass over 100 TB); the corrupt column costs nothing on
    clean files. PERMISSIVE quarantining is the production contract for
    web-scale crawl ingestion where some fraction of lines is always
    garbage.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="json_src_")
    good_dir, bad_dir = base + "/good", base + "/bad"
    docs.write.mode("overwrite").json(good_dir)
    (
        docs.where(F.col("doc_id") % 100 == 0)
        .select(
            F.concat(
                F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
                F.lit(', "n_chars"'),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(bad_dir)
    )
    parsed = (
        spark.read.schema("doc_id long, lang string, n_chars long, _corrupt string")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json([good_dir, bad_dir])
    )
    # Spark forbids queries whose column set reduces to the corrupt-record
    # column alone on a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    # the analyzer fires scale-dependently once pruning collapses the
    # required schema). The documented pattern is ALSO the production
    # shape: land the parsed batch as a bronze table (quarantine column
    # included), then analyze the materialized relation.
    bronze = base + "/bronze"
    parsed.write.mode("overwrite").parquet(bronze)
    return spark.read.parquet(bronze).groupBy(
        F.col("_corrupt").isNotNull().alias("is_corrupt")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_n_chars"),
    )


@query(
    "q_orc_roundtrip",
    extra=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format round-trip (source/sink breadth beyond parquet): the
    lineitem projection is written as zstd ORC, read back, and
    aggregated — the oracle runs on the ORIGINAL parquet, so any row or
    value mutated by the encode/decode flips the hash. ORC is the other
    columnar lake format a migrating warehouse brings along; the engine
    must scan it with the same pushdown machinery (Spark's OrcFileFormat
    supports predicate pushdown + column pruning like parquet).

    Scale: format conversion is one narrow pass; all downstream math is
    the usual partial-agg shuffle on the 6-group key.
    """
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        cents("l_extendedprice").alias("price_cents"),
    )
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/lineitem"
    src.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").alias("sum_qty"),
        F.sum("price_cents").alias("sum_price_cents"),
    )


@query(
    "q_csv_roundtrip",
    extra=True,
    oracle="""
    SELECT doc_id, lang, source, md5(text) AS text_md5,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with byte-exact text preservation: documents are
    written as quoted/escaped CSV with a header, read back with an
    EXPLICIT schema (inference is banned from the data path — it is a
    second full scan AND a correctness hazard), and every row's text is
    md5-fingerprinted. The oracle fingerprints the original parquet, so
    a single character lost to quoting/escaping/encoding flips the hash.

    Scale: CSV is the interchange format every external corpus drop
    arrives in; the lesson encoded here is schema-on-read discipline —
    explicit schema, explicit quote/escape policy, permissive mode left
    OFF so malformed rows surface instead of silently nulling.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = tempfile.mkdtemp(prefix="csv_rt_") + "/documents"
    (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).option("header", True).option("escape", '"').csv(path)
    return back.select(
        "doc_id",
        "lang",
        "source",
        F.md5("text").alias("text_md5"),
        "n_chars",
    )


@query(
    "q_time_travel",
    extra=True,  # rotated out r12 (graded r8-r11; lake family keeps q_zorder_index graded)
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE status END AS status,
             CASE WHEN o_orderkey % 10 = 0 THEN total_cents + 100000
                  ELSE total_cents END AS total_cents
      FROM base
    )
    SELECT CAST(1 AS BIGINT) AS version, * FROM base
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS version, * FROM v2
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (sinks/versioned.py): the orders table is
    committed as version 1, an update batch (every 10th key → status 'U',
    +1000.00) is committed as version 2, and BOTH pinned snapshots are
    read back — the v1 read happens AFTER the v2 commit, so the oracle
    (original relation ∪ updated relation) certifies snapshot isolation:
    a later write cannot disturb an earlier pinned version.

    Scale: the manifest commit is one atomic rename (the entire
    difference from Delta/Iceberg is WHERE that commit lives); each
    version directory is ordinary parquet with full pushdown/pruning.
    """
    from ..sinks.versioned import read_version, write_version

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="time_travel_") + "/orders"
    write_version(base, path)
    upd = base.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("U"))
        .otherwise(F.col("status"))
        .alias("status"),
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("total_cents") + 100000
        )
        .otherwise(F.col("total_cents"))
        .alias("total_cents"),
    )
    write_version(upd, path)
    v1 = read_version(spark, path, 1).select(
        F.lit(1).cast("long").alias("version"), "*"
    )
    v2 = read_version(spark, path, 2).select(
        F.lit(2).cast("long").alias("version"), "*"
    )
    return v1.unionByName(v2)


@query(
    "q_snapshot_diff",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders
    )
    SELECT o_orderkey,
           status AS old_status, 'U' AS new_status,
           total_cents AS old_cents, total_cents + 100000 AS new_cents
    FROM base WHERE o_orderkey % 10 = 0
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two pinned snapshots (the analytics
    companion of q_time_travel): commit v1 (base orders) and v2 (every
    10th key updated), then diff the versions by key — exactly the
    "what did yesterday's pipeline change" audit a training-data lake
    answers from its version history, with no change log maintained at
    write time. The oracle derives the expected change set from the
    original relation.

    Scale: the diff is one equi-join of two snapshot scans on the table
    key (bucket both versions by the key to make it exchange-free);
    emitted rows are only the changed keys.
    """
    from ..sinks.versioned import read_version, write_version

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        cents("o_totalprice").alias("total_cents"),
    )
    path = tempfile.mkdtemp(prefix="snap_diff_") + "/orders"
    write_version(base, path)
    write_version(
        base.select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("U"))
            .otherwise(F.col("status"))
            .alias("status"),
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("total_cents") + 100000
            )
            .otherwise(F.col("total_cents"))
            .alias("total_cents"),
        ),
        path,
    )
    v1 = read_version(spark, path, 1).select(
        "o_orderkey",
        F.col("status").alias("old_status"),
        F.col("total_cents").alias("old_cents"),
    )
    v2 = read_version(spark, path, 2).select(
        "o_orderkey",
        F.col("status").alias("new_status"),
        F.col("total_cents").alias("new_cents"),
    )
    return (
        v1.join(v2, "o_orderkey")
        .where(
            (F.col("old_status") != F.col("new_status"))
            | (F.col("old_cents") != F.col("new_cents"))
        )
        .select(
            "o_orderkey", "old_status", "new_status", "old_cents", "new_cents"
        )
    )


@query(
    "q_table_checksum",
    extra=True,
    oracle="""
    WITH h_orders AS (
      SELECT md5_number_lower(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
               || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             ) % 2147483647 AS h
      FROM orders
    ),
    h_customer AS (
      SELECT md5_number_lower(
               CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
               || CAST(c_nationkey AS VARCHAR)
             ) % 2147483647 AS h
      FROM customer
    ),
    h_nation AS (
      SELECT md5_number_lower(
               CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|'
               || CAST(n_regionkey AS VARCHAR)
             ) % 2147483647 AS h
      FROM nation
    )
    SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_hash,
           CAST(SUM(h) AS BIGINT) AS sum_hash
    FROM h_orders
    UNION ALL
    SELECT 'customer', CAST(COUNT(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT), CAST(SUM(h) AS BIGINT)
    FROM h_customer
    UNION ALL
    SELECT 'nation', CAST(COUNT(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT), CAST(SUM(h) AS BIGINT)
    FROM h_nation
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprints — the migration-validation
    primitive this whole repo's oracle methodology is built on, exposed
    as an operator: per table, (row count, XOR of stable row hashes, SUM
    of row hashes mod p31). XOR is commutative/associative and
    overflow-free at any scale but blind to duplicate-pairs; the SUM
    twin catches those; COUNT anchors cardinality. Two engines (or two
    snapshots, or pre/post-migration copies) agree on all three iff the
    multisets of rows agree — no sort, no collect, one partial-agg pass
    per table. Money enters as exact integer cents; hash input is an
    explicit '|'-joined string so both engines serialize rows
    identically.

    Scale: each checksum is a map-side-combined 1-row aggregate — the
    cheapest possible full-table integrity check, and the three
    aggregates are mergeable across partitions/batches by construction.
    """
    from ..functions.scalar import stable_hash_p31

    def table_sum(name: str, cols) -> DataFrame:
        t = load_table(spark, sf_dir, name)
        h = stable_hash_p31(F.concat_ws("|", *cols(t)))
        return t.select(h.alias("h")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("h").alias("xor_hash"),
            F.sum("h").alias("sum_hash"),
        ).select(F.lit(name).alias("tbl"), "n_rows", "xor_hash", "sum_hash")

    orders = table_sum(
        "orders",
        lambda t: [
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            cents("o_totalprice").cast("string"),
        ],
    )
    customer = table_sum(
        "customer",
        lambda t: [
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_nationkey").cast("string"),
        ],
    )
    nation = table_sum(
        "nation",
        lambda t: [
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.col("n_regionkey").cast("string"),
        ],
    )
    return orders.unionByName(customer).unionByName(nation)


@query(
    "q_bucketed_join",
    extra=True,
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join end-to-end through the driver contract
    (sinks/bucketed.py — previously pytest-only): lineitem and orders are
    materialized bucketed-by-orderkey (the write-time shuffle paid ONCE),
    then joined with ZERO join-side Exchange (each task reads bucket i of
    both sides; asserted in tests/test_bucketed.py with broadcast
    disabled) and aggregated. The oracle is the plain join — layout must
    never change values.

    Scale: THE canonical 100 TB fact⋈fact answer — the shuffle cost is
    amortized across every downstream query on the bucket key instead of
    paid per query.
    """
    import uuid as _uuid

    from ..sinks.bucketed import colocated_join, write_bucketed

    uid = _uuid.uuid4().hex[:10]
    lt, ot = f"bj_li_{uid}", f"bj_ord_{uid}"
    base = tempfile.mkdtemp(prefix="bucketed_join_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", cents("l_extendedprice").alias("price_cents")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    write_bucketed(li, lt, "l_orderkey", 8, f"{base}/li")
    write_bucketed(orders, ot, "l_orderkey", 8, f"{base}/ord")
    return (
        colocated_join(spark, lt, ot, "l_orderkey")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )


@query(
    "q_partition_backfill",
    extra=True,
    oracle="""
    SELECT event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS v_cents
    FROM events
    """,
)
def q_partition_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent single-partition backfill via DYNAMIC partition
    overwrite: the initial write lands a CORRUPTED 'click' partition
    (half its rows dropped — a failed upstream job), then the backfill
    recomputes ONLY the click slice and overwrites it with
    partitionOverwriteMode=dynamic — replacing exactly the partitions
    present in the new data, never touching the other four. The read-back
    must equal the full correct relation: if dynamic overwrite degraded
    to static (wiping the other partitions) the result would be
    clicks-only and the hash flips; if the backfill failed to replace,
    the dropped rows stay missing and the hash flips.

    Scale: this is the nightly repair shape for a date/type-partitioned
    100 TB lake — recompute cost is one partition, not one table, and
    re-running the same backfill is a no-op (idempotent by overwrite).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", cents("value").alias("v_cents")
    )
    path = tempfile.mkdtemp(prefix="backfill_") + "/events"
    corrupted = ev.where(
        (F.col("event_type") != "click") | (F.col("event_id") % 2 == 0)
    )
    corrupted.write.partitionBy("event_type").parquet(path)
    clicks = ev.where(F.col("event_type") == "click")
    (
        clicks.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(path)
    )
    return spark.read.parquet(path).select(
        "event_id", "event_type", "v_cents"
    )


@query(
    "q_cdc_apply",
    extra=True,
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, 0 AS seq, 'I' AS op,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus AS status
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1000 AS cents,
             'X' AS status
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    del AS (
      SELECT o_orderkey AS k, 2 AS seq, 'D' AS op,
             CAST(NULL AS BIGINT) AS cents, CAST(NULL AS VARCHAR) AS status
      FROM orders WHERE o_orderkey % 20 = 0
    ),
    log AS (
      SELECT * FROM base UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM del
    ),
    last AS (
      SELECT k, op, cents, status FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY k ORDER BY seq DESC
        ) AS rn FROM log
      ) WHERE rn = 1
    )
    SELECT k AS orderkey, cents AS final_cents, status AS final_status
    FROM last WHERE op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — reconstruct the current table state from a snapshot
    plus an ordered change log with inserts, updates AND DELETES (the
    op the MERGE/upsert twins never exercise): the change stream is
    planted deterministically from orders (every 10th key updated with
    +10.00 and status 'X' at seq 1, every 20th then deleted at seq 2),
    and apply = last-writer-wins per key by change sequence, deletes
    dropping the key. This is the Debezium/lakehouse change-data
    ingestion primitive; at scale it is exactly the foreachBatch MERGE
    loop's batch form.

    Scale: ONE shuffle keys the log by primary key; last-per-key is a
    max_by aggregate (no sort, map-side partial); the snapshot is never
    rescanned per op type — base and both change sets are one union off
    the same pruned scan."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
        cents("o_totalprice").alias("cents"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 10 == 0
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        (cents("o_totalprice") + 1000).alias("cents"),
        F.lit("X").alias("status"),
    )
    dele = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 20 == 0
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(None).cast("string").alias("status"),
    )
    log = base.unionByName(upd).unionByName(dele)
    last = log.groupBy("k").agg(
        F.max_by("op", F.col("seq")).alias("op"),
        F.max_by("cents", F.col("seq")).alias("cents"),
        F.max_by("status", F.col("seq")).alias("status"),
    )
    return last.where(F.col("op") != "D").select(
        F.col("k").alias("orderkey"),
        F.col("cents").alias("final_cents"),
        F.col("status").alias("final_status"),
    )


def _hilbert_oracle() -> str:
    """Oracle for q_hilbert_vs_zorder, assembled from the SAME generated
    expression text the Spark side executes (sinks/zorder.py:
    hilbert_rounds / morton_sql — the engine-portability device)."""
    from ..sinks.zorder import hilbert_sql_nested, morton_sql

    inner = """(
      SELECT DISTINCT
        CAST(md5_number_lower('hx-v1:' || CAST(doc_id AS VARCHAR))
             % 4294967296 % 16 AS BIGINT) AS cell_x,
        CAST(md5_number_lower('hy-v1:' || CAST(doc_id AS VARCHAR))
             % 4294967296 % 16 AS BIGINT) AS cell_y,
        CAST(md5_number_lower('hx-v1:' || CAST(doc_id AS VARCHAR))
             % 4294967296 % 16 AS BIGINT) AS x,
        CAST(md5_number_lower('hy-v1:' || CAST(doc_id AS VARCHAR))
             % 4294967296 % 16 AS BIGINT) AS y
      FROM documents
    )"""
    tpl = """
    WITH cells AS MATERIALIZED (
      SELECT cell_x, cell_y, hilbert, MORTON AS zorder
      FROM HILBERT
      WHERE cell_x BETWEEN 3 AND 12 AND cell_y BETWEEN 5 AND 10
    )
    SELECT curve, CAST(n_cells AS BIGINT) AS n_cells,
           CAST(n_runs AS BIGINT) AS n_runs
    FROM (
      SELECT 'hilbert' AS curve, COUNT(*) AS n_cells,
             1 + SUM(CASE WHEN idx - prev > 1 THEN 1 ELSE 0 END) AS n_runs
      FROM (SELECT hilbert AS idx,
                   LAG(hilbert, 1, hilbert) OVER (ORDER BY hilbert) AS prev
            FROM cells)
      UNION ALL
      SELECT 'zorder' AS curve, COUNT(*) AS n_cells,
             1 + SUM(CASE WHEN idx - prev > 1 THEN 1 ELSE 0 END) AS n_runs
      FROM (SELECT zorder AS idx,
                   LAG(zorder, 1, zorder) OVER (ORDER BY zorder) AS prev
            FROM cells)
    )
    """
    return tpl.replace("MORTON", morton_sql(["cell_x", "cell_y"], bits=4)).replace(
        "HILBERT", hilbert_sql_nested(inner, 4)
    )


@query("q_hilbert_vs_zorder", extra=True, oracle=_hilbert_oracle())
def q_hilbert_vs_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout vs Z-order, measured where it matters: the
    number of contiguous CURVE RUNS a 2-D box query touches over the
    occupied cell set (runs ≈ files touched under min/max skipping —
    Z's bit-interleave takes long diagonal jumps, Hilbert moves one
    adjacent cell per step, so Hilbert covers an aligned box in
    provably fewer runs; measured 13 vs 20 at full occupancy). The
    Hilbert transform is the STAGED shared-text device
    (sinks/zorder.py:hilbert_rounds — each round's rotate/reflect is
    one projection whose exact SQL text runs in both engines), the
    companion of q_zorder_index's one-expression Morton code.

    Scale: the transform is a narrow projection chain (no shuffle); the
    run count is a lag window over the box's occupied-cell relation —
    bounded by the GRID (≤ 2^(2*bits) rows), never the corpus.
    """
    from ..functions.scalar import stable_hash_u32
    from ..sinks.zorder import hilbert_index, morton_sql

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        (
            stable_hash_u32(
                F.concat(F.lit("hx-v1:"), F.col("doc_id").cast("string"))
            )
            % 16
        ).alias("cell_x"),
        (
            stable_hash_u32(
                F.concat(F.lit("hy-v1:"), F.col("doc_id").cast("string"))
            )
            % 16
        ).alias("cell_y"),
    ).distinct()
    cells = (
        hilbert_index(base, "cell_x", "cell_y", bits=4)
        .withColumn("zorder", F.expr(morton_sql(["cell_x", "cell_y"], bits=4)))
        .where(F.col("cell_x").between(3, 12) & F.col("cell_y").between(5, 10))
        .localCheckpoint()  # feeds both curve legs; bounded (<= 256 rows)
    )

    def runs_of(idx_col: str) -> DataFrame:
        w = Window.orderBy(idx_col)  # constant-size relation (grid-bounded)
        gaps = cells.select(
            F.col(idx_col).alias("idx"),
            F.lag(idx_col, 1).over(w).alias("prev"),
        )
        return gaps.agg(
            F.lit(idx_col).alias("curve"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("idx") - F.coalesce("prev", F.col("idx")) > 1, 1
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("n_runs"),
        )

    return runs_of("hilbert").unionByName(runs_of("zorder"))


@query(
    "q_scd2_pointintime",
    extra=True,
    oracle="""
    WITH src AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    changed AS (
      SELECT * FROM (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_value
        FROM src
      ) WHERE prev_value IS NULL OR value <> prev_value
    ),
    versioned AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS version,
             lead(ts) OVER w AS next_ts
      FROM changed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    facts AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT f.user_id,
             COALESCE(v.version, 0) AS version,
             CAST(ROUND(v.value * 100) AS BIGINT) AS vcents
      FROM facts f LEFT JOIN versioned v
        ON v.user_id = f.user_id
       AND f.ts >= v.ts
       AND (v.next_ts IS NULL OR f.ts < v.next_ts)
    )
    SELECT user_id,
           CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(MAX(vcents) AS BIGINT) AS dim_value_cents
    FROM j GROUP BY 1, 2
    """,
)
def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (effective-dated) dimension lookup — the query the
    SCD2 history EXISTS for: every click joins the purchase-value
    version in effect at the click's instant ([valid_from, valid_to)
    containment; clicks before the user's first version attribute to
    version 0). The lakehouse's 'AS OF the fact's own time' semantics —
    distinct from q_asof_join (nearest key, one relation) and
    q_time_travel (whole-table snapshot): here every fact row time-
    travels independently.

    Scale: the join carries the user_id EQUALITY key, so it shuffles on
    user and evaluates the validity range as a residual — never a pure
    range cross; version relations are change-collapsed (<= changes per
    user, not events per user). Aggregated to (user, version) so the
    output is version-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    src = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        src.withColumn("prev_value", F.lag("value").over(w))
        .where(
            F.col("prev_value").isNull()
            | (F.col("value") != F.col("prev_value"))
        )
        .drop("prev_value")
    )
    dim = changed.select(
        F.col("user_id").alias("d_user"),
        F.col("ts").alias("valid_from"),
        cents("value").alias("vcents"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    j = facts.join(
        dim,
        (F.col("d_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    )
    return j.groupBy(
        "user_id", F.coalesce("version", F.lit(0)).cast("long").alias("version")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.max("vcents").cast("long").alias("dim_value_cents"),
    )
