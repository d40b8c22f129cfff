package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Table-maintenance and data-management operators a production lake needs
  * around the analytics core: CDC latest-snapshot compaction, referential
  * data-quality auditing, distribution window functions, and time-series
  * gap-filling. All absent in the reference (SURVEY.md §2.2); each entry is
  * oracle-checked.
  */
object TableOps {

  // -------------------------------------------------------- latest by key

  /** CDC-style latest-record-per-key snapshot: the compaction every
    * upsert-ingest lake runs (take the newest version of each key, here
    * user_id by (ts, event_id) descending). One hash shuffle on the key;
    * Spark plans the rank-1 filter as WindowGroupLimit, so each partition
    * keeps only its per-key max row instead of sorting whole groups — the
    * 100 TB-correct shape (equivalent to max_by over all payload columns).
    */
  def latestByKey(spark: SparkSession, dir: String): DataFrame = {
    // order AND output on µs-truncated time: DuckDB surfaces the parquet
    // nanos timestamp at µs precision, so deciding the per-key winner on raw
    // nanos could tie-break differently cross-engine when two versions share
    // a microsecond
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts_us"), desc("event_id"))
    Tables.load(spark, dir, "events")
      .withColumn("ts_us", Tables.tsNanosToMicros("ts"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
      .orderBy("user_id")
  }

  val latestByKeySql: String =
    """SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // --------------------------------------------------------- data quality

  /** Data-quality audit — the validation pass a pipeline runs before
    * promoting a snapshot: cardinality, duplicate keys, domain violations,
    * null/blank required fields, and referential orphans across the star
    * schema. Each check is an independent aggregate (anti-joins for the
    * referential ones — at scale the dimension side broadcasts); the 1-row
    * results combine via broadcast cross joins. The literal-expected checks
    * double as a driver-side gate: a corrupted snapshot flips the row.
    */
  def dataQuality(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val lineitem = Tables.load(spark, dir, "lineitem")

    val eventChecks = events.agg(
      count(lit(1)).as("n_events"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("dup_event_ids"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_values"),
      sum(when(col("props").isNull || col("props") === "", 1L).otherwise(0L))
        .as("blank_props"))
    val orphanOrders = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    val orphanLines = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    eventChecks.crossJoin(orphanOrders).crossJoin(orphanLines)
  }

  val dataQualitySql: String =
    """SELECT (SELECT count(*) FROM events)::BIGINT AS n_events,
      |       (SELECT count(*) - count(DISTINCT event_id) FROM events)::BIGINT AS dup_event_ids,
      |       (SELECT count(*) FROM events WHERE value < 0)::BIGINT AS neg_values,
      |       (SELECT count(*) FROM events WHERE props IS NULL OR props = '')::BIGINT AS blank_props,
      |       (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |        WHERE c.c_custkey IS NULL)::BIGINT AS orphan_orders,
      |       (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |        WHERE o.o_orderkey IS NULL)::BIGINT AS orphan_lineitems""".stripMargin

  // ------------------------------------------------- distribution windows

  /** Distribution window functions — ntile/percent_rank/cume_dist over
    * customers within market segment. Completes the window family
    * (x_window_rank = ranking, x_window_frames = frames/analytic). The
    * ORDER BY is a total order (acctbal, custkey) so ranks are deterministic;
    * percent_rank/cume_dist are single IEEE divisions of exact integer
    * ranks — bit-stable cross-engine.
    */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  val windowDistributionSql: String =
    """SELECT c_custkey, c_mktsegment AS seg, c_acctbal,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- gapfill

  /** Time-series gap-fill (resample): hourly event counts over the full
    * span with empty hours materialized as zero — the densification step
    * before any rolling-window feature computation. The hour spine is
    * generated from a 1-row bounds aggregate (`sequence` + explode — no
    * driver loop, no collect), then left-joins the hourly counts. At scale:
    * counts are a map-side-combinable agg; the spine is tiny (one row per
    * hour of span) and broadcasts.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hours = Tables.load(spark, dir, "events")
      .select(expr(Tables.tsNanosToHoursSql("ts")).as("hr"))
    val spine = hours.agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
    val counts = hours.groupBy("hr").agg(count(lit(1)).as("n_raw"))
    spine.join(counts, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("n_raw"), lit(0L)).as("n"))
      .orderBy("hr")
  }

  val gapFillSql: String =
    """WITH h AS (SELECT epoch_ns(ts) // 3600000000000 AS hr FROM events),
      |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
      |spine AS (SELECT unnest(generate_series(lo, hi)) AS hr FROM b),
      |c AS (SELECT hr, count(*)::BIGINT AS n_raw FROM h GROUP BY hr)
      |SELECT spine.hr, COALESCE(c.n_raw, 0)::BIGINT AS n
      |FROM spine LEFT JOIN c USING (hr) ORDER BY hr""".stripMargin

  // ------------------------------------------------------------- dense ids

  /** Driver row for [[Ids.contiguous]]: contiguous 0-based ids over
    * `documents` in `doc_id` order (the "assign stable row ids to the
    * corpus" step of every training-data pipeline). The oracle is the
    * definition itself — a global row_number — which DuckDB can afford
    * single-node; the Spark side computes the same ranks with one
    * bucket-hash shuffle and no unpartitioned window (see [[Ids]]).
    */
  def denseIds(spark: SparkSession, dir: String): DataFrame =
    Ids.contiguous(
      Tables.load(spark, dir, "documents").select("doc_id", "n_chars"),
      Seq("doc_id"), "seq_id")
      .orderBy("doc_id")

  val denseIdsSql: String =
    """SELECT doc_id, n_chars,
      |       (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS seq_id
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- entry

  // ------------------------------------------------------- snapshot diff

  /** Snapshot window bounds (µs since epoch, UTC): old = 2024-01-01..04,
    * new = 2024-01-25..28 — two 3-day key-presence windows far enough
    * apart that all four diff classes occur in the fixture.
    */
  val SnapOldLoUs = 1704067200000000L
  val SnapOldHiUs = 1704326400000000L
  val SnapNewLoUs = 1706140800000000L
  val SnapNewHiUs = 1706400000000000L

  /** CDC snapshot reconciliation — the diff every lake maintenance job
    * runs between two table versions: latest state per (user_id,
    * event_type) in each window, full-outer joined and classified
    * added / removed / changed / unchanged, with the exact value delta.
    * Each snapshot is the [[latestByKey]] WindowGroupLimit shape (rank-1
    * per key, one hash shuffle); both sides then shuffle on the SAME
    * (user_id, event_type) key, so the full-outer join is co-partitioned
    * — at 100 TB this is two scans + three same-key exchanges, no
    * broadcast of anything unbounded. Values compare as 1e-6-quantized
    * BIGINTs, so 'changed' is exact, not an FP-tolerance call.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    def snap(loUs: Long, hiUs: Long, vAlias: String): DataFrame = {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(desc("ts_us"), desc("event_id"))
      Tables.load(spark, dir, "events")
        .withColumn("ts_us", Tables.tsNanosToMicros("ts"))
        .where(col("ts_us") >= loUs && col("ts_us") < hiUs)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .selectExpr("user_id", "event_type",
          s"CAST(round(value * 1000000) AS BIGINT) AS $vAlias")
    }
    snap(SnapOldLoUs, SnapOldHiUs, "old_v_u")
      .join(snap(SnapNewLoUs, SnapNewHiUs, "new_v_u"),
        Seq("user_id", "event_type"), "full_outer")
      .selectExpr("user_id", "event_type",
        """CASE WHEN old_v_u IS NULL THEN 'added'
          |     WHEN new_v_u IS NULL THEN 'removed'
          |     WHEN old_v_u <> new_v_u THEN 'changed'
          |     ELSE 'unchanged' END AS status""".stripMargin,
        "old_v_u", "new_v_u", "new_v_u - old_v_u AS delta_v_u")
      .orderBy("user_id", "event_type")
  }

  val snapshotDiffSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
       |         CAST(round(value * 1000000) AS BIGINT) AS v_u
       |  FROM events),
       |o AS (SELECT user_id, event_type, v_u AS old_v_u FROM (
       |        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |                    ORDER BY ts_us DESC, event_id DESC) AS rn
       |        FROM e WHERE ts_us >= $SnapOldLoUs AND ts_us < $SnapOldHiUs)
       |      WHERE rn = 1),
       |n AS (SELECT user_id, event_type, v_u AS new_v_u FROM (
       |        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |                    ORDER BY ts_us DESC, event_id DESC) AS rn
       |        FROM e WHERE ts_us >= $SnapNewLoUs AND ts_us < $SnapNewHiUs)
       |      WHERE rn = 1)
       |SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       |       COALESCE(o.event_type, n.event_type) AS event_type,
       |       CASE WHEN old_v_u IS NULL THEN 'added'
       |            WHEN new_v_u IS NULL THEN 'removed'
       |            WHEN old_v_u <> new_v_u THEN 'changed'
       |            ELSE 'unchanged' END AS status,
       |       old_v_u, new_v_u, new_v_u - old_v_u AS delta_v_u
       |FROM o FULL JOIN n ON o.user_id = n.user_id AND o.event_type = n.event_type
       |ORDER BY user_id, event_type""".stripMargin

  /** MERGE INTO — the warehouse upsert statement (SQL:2003 / Delta/Iceberg
    * MERGE), re-expressed as its relational core: one full-outer join of
    * target and source on the key, then the WHEN-clause decision per row —
    * matched+U updates, matched+D deletes, not-matched+I inserts,
    * unmatched target rows carry. The changeset is derived
    * deterministically from the corpus (rank-within-source waves: ranks
    * 1-3 update, 4-5 delete, and three brand-new keys per source insert),
    * so every clause fires on every partition (spec-guarded live). Output
    * = the post-merge table with each row's applied action — an
    * unapplied clause, a lost carry row, or a resurrection of a deleted
    * key all break the hash. Scale shape: one co-partitioned outer join
    * on the key; at 100 TB the same body runs per-partition against a
    * bucketed target ([[graft.streaming.Sinks.partitionedUpsertBatch]]
    * is this statement's touched-partition-only specialization).
    */
  def mergeInto(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("srk", expr(
        "row_number() OVER (PARTITION BY source ORDER BY doc_id)"))
    val target = docs.selectExpr("doc_id", "source", "n_chars")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val changes = docs.where("srk <= 5")
      .selectExpr("doc_id", "source", "n_chars",
        "CASE WHEN srk <= 3 THEN 'U' ELSE 'D' END AS op")
      .unionByName(docs.where("srk <= 3")
        .selectExpr(s"doc_id + ${maxId + 1}L AS doc_id", "source",
          "n_chars", "'I' AS op"))
    target.alias("t")
      .join(changes.alias("c"), Seq("doc_id"), "full_outer")
      .selectExpr("doc_id",
        "coalesce(t.source, c.source) AS source",
        """CASE WHEN c.op = 'U' THEN t.n_chars + 1000
          |     WHEN c.op = 'I' THEN c.n_chars + 2000
          |     ELSE t.n_chars END AS n_chars""".stripMargin,
        "coalesce(c.op, 'K') AS last_op")
      .where("last_op <> 'D'")
      .orderBy("doc_id")
  }

  val mergeIntoSql: String =
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS srk
      |  FROM documents),
      |m AS (SELECT max(doc_id) AS mx FROM documents),
      |changes AS (
      |  SELECT doc_id, source, n_chars,
      |         CASE WHEN srk <= 3 THEN 'U' ELSE 'D' END AS op
      |  FROM r WHERE srk <= 5
      |  UNION ALL
      |  SELECT doc_id + mx + 1, source, n_chars, 'I'
      |  FROM r CROSS JOIN m WHERE srk <= 3),
      |merged AS (
      |  SELECT coalesce(t.doc_id, c.doc_id) AS doc_id,
      |         coalesce(t.source, c.source) AS source,
      |         CASE WHEN c.op = 'U' THEN t.n_chars + 1000
      |              WHEN c.op = 'I' THEN c.n_chars + 2000
      |              ELSE t.n_chars END AS n_chars,
      |         coalesce(c.op, 'K') AS last_op
      |  FROM r t FULL OUTER JOIN changes c ON t.doc_id = c.doc_id)
      |SELECT doc_id, source, n_chars, last_op
      |FROM merged WHERE last_op <> 'D' ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_merge_into" -> mergeInto,
    "x_snapshot_diff" -> snapshotDiff,
    "x_latest_by_key" -> latestByKey,
    "x_data_quality" -> dataQuality,
    "x_window_distribution" -> windowDistribution,
    "x_gapfill" -> gapFill,
    "x_dense_ids" -> denseIds)

  val oracles: Map[String, String] = Map(
    "x_merge_into" -> mergeIntoSql,
    "x_snapshot_diff" -> snapshotDiffSql,
    "x_latest_by_key" -> latestByKeySql,
    "x_data_quality" -> dataQualitySql,
    "x_window_distribution" -> windowDistributionSql,
    "x_gapfill" -> gapFillSql,
    "x_dense_ids" -> denseIdsSql)
}
