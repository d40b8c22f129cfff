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
    * proper timestamp column for event-time semantics.
    */
  def tsCol(nanos: Column): Column = timestamp_micros((nanos / 1000L).cast("long"))

  /** Tumbling-window counts + value sums per event_type.
    *
    * @param events    streaming or batch DataFrame with `ts` (LONG nanos),
    *                  `event_type`, `value`
    * @param window    e.g. "1 hour"
    * @param watermark allowed lateness, e.g. "2 hours" (streaming only)
    */
  def tumblingCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame = {
    val withTs = events.withColumn("event_ts", tsCol(col("ts")))
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
      .withColumn("event_ts", tsCol(col("ts")))
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

  /** Sliding-window variant (windowLen every slide). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      watermark: String): DataFrame = {
    val withTs = events.withColumn("event_ts", tsCol(col("ts")))
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
