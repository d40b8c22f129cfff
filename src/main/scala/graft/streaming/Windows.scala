package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the standard
  * stream-processor surface the reference never implemented (SURVEY.md §2.2:
  * "watermarks / event-time windows: none — processing time only"). Provided
  * as first-class capability: tumbling/sliding windows over the `events`
  * stream with bounded state via watermark-driven late-data eviction.
  *
  * Scale: windowed aggregation shuffles once on (window, key); the watermark
  * bounds state size regardless of stream length — this is the pattern that
  * keeps a 1000-executor streaming job's state finite.
  */
object Windows {

  /** events.ts carries epoch NANOS as LONG (graft.Tables.load); convert to a
    * proper timestamp column for event-time semantics. Integral `div` —
    * `Column./` would round-trip 1.7e18 nanos through DOUBLE (> 2^53) and
    * lose sub-millisecond precision.
    */
  def tsCol(nanosCol: String): Column = timestamp_micros(expr(s"$nanosCol div 1000L"))

  /** Tumbling-window counts + value sums per event_type.
    *
    * @param events    streaming or batch DataFrame with `ts` (LONG nanos),
    *                  `event_type`, `value`
    * @param window    e.g. "1 hour"
    * @param watermark allowed lateness, e.g. "2 hours" (streaming only)
    */
  def tumblingCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame = {
    val withTs = events.withColumn("event_ts", tsCol("ts"))
    val marked = if (events.isStreaming) withTs.withWatermark("event_ts", watermark) else withTs
    marked
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        unix_millis(col("window.start")).as("win_start_ms"),
        unix_millis(col("window.end")).as("win_end_ms"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Oracle-checkable batch form of [[tumblingCounts]] (1-hour windows over
    * `events`, exact decimal value sums; epoch-aligned windows match integer
    * hour bucketing).
    */
  def windowCountsQuery(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .withColumn("event_ts", tsCol("ts"))
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double").as("total_value"))
      .select(
        unix_millis(col("window.start")).as("win_start_ms"),
        unix_millis(col("window.end")).as("win_end_ms"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("win_start_ms", "event_type")

  val windowCountsSql: String =
    """SELECT (epoch_us(ts) // 3600000000) * 3600000 AS win_start_ms,
      |       ((epoch_us(ts) // 3600000000) + 1) * 3600000 AS win_end_ms,
      |       event_type, count(*)::BIGINT AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3 ORDER BY win_start_ms, event_type""".stripMargin

  /** Sliding-window batch query (1 h window, 30 min slide): each event lands
    * in windowLen/slide windows. Oracle: enumerate the member windows by
    * integer arithmetic (epoch-aligned, like Spark's window()).
    */
  def slidingCountsQuery(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .withColumn("event_ts", tsCol("ts"))
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("window.start")).as("win_start_ms"),
        unix_millis(col("window.end")).as("win_end_ms"),
        col("event_type"), col("n"))
      .orderBy("win_start_ms", "event_type")

  val slidingCountsSql: String =
    """SELECT s * 1800000 AS win_start_ms, s * 1800000 + 3600000 AS win_end_ms,
      |       event_type, count(*)::BIGINT AS n
      |FROM (SELECT event_type,
      |             (epoch_us(ts) // 1800000000) - k AS s
      |      FROM events, unnest(range(0, 2)) AS t(k)
      |      WHERE (epoch_us(ts) // 1800000000) - k >= 0)
      |GROUP BY 1, 2, 3 ORDER BY win_start_ms, event_type""".stripMargin

  /** Session windows (data-driven, 30 min inactivity gap) per user — the
    * third event-time window family. Spark's session_window end = last event
    * + gap; the oracle reproduces it with the classic islands technique
    * (lag + cumulative new-session flags).
    */
  def sessionCountsQuery(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .withColumn("event_ts", tsCol("ts"))
      .groupBy(session_window(col("event_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("session_window.start")).as("sess_start_ms"),
        unix_millis(col("session_window.end")).as("sess_end_ms"),
        col("user_id"), col("n"))
      .orderBy("user_id", "sess_start_ms")

  val sessionCountsSql: String =
    // session MEMBERSHIP decided in micros (Spark's precision); only the
    // final output floors to ms — deciding on ms-floored gaps would split
    // boundary cases differently
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |         CASE WHEN epoch_us(ts)
      |                   - lag(epoch_us(ts), 1, -1800000000)
      |                     OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (SELECT user_id, ts_us,
      |             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
      |                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      |      FROM e)
      |SELECT min(ts_us) // 1000 AS sess_start_ms,
      |       (max(ts_us) + 1800000000) // 1000 AS sess_end_ms,
      |       user_id, count(*)::BIGINT AS n
      |FROM s GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start_ms""".stripMargin

  /** Sliding-window variant (windowLen every slide). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      watermark: String): DataFrame = {
    val withTs = events.withColumn("event_ts", tsCol("ts"))
    val marked = if (events.isStreaming) withTs.withWatermark("event_ts", watermark) else withTs
    marked
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), windowLen, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("window.start")).as("win_start_ms"),
        unix_millis(col("window.end")).as("win_end_ms"),
        col("event_type"), col("n"))
  }
}
