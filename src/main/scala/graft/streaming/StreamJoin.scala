package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join — the conversion-attribution shape: each
  * click joined to the same user's purchases within the next `maxLag`.
  * Another stream-processor capability absent in the reference (which has
  * no joins at all, SURVEY.md §2.2) provided as first-class surface.
  *
  * The SAME join runs batch (driver-checked against DuckDB) and streaming
  * (StreamJoinSpec): in streaming, BOTH sides carry watermarks and the join
  * condition is time-bounded in both directions, so Spark derives state
  * eviction for each side — click state older than the watermark minus
  * maxLag is dropped, purchase state at the watermark. That bounded-state
  * derivation is exactly what keeps a 1000-executor stream-stream join's
  * state finite at 100 TB/day; an unconstrained join condition would grow
  * state forever.
  */
object StreamJoin {

  val MaxLag = "6 hours"

  /** The join core, batch or streaming: sides must expose
    * (c_user, click_id, c_ts) / (p_user, purchase_id, p_ts).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.join(purchases,
        expr(s"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL $MaxLag"))
      .select(
        col("c_user").as("user_id"),
        col("click_id"), col("purchase_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / lit(1000000L))
          .cast("long").as("lag_s"))

  /** Batch sides from `events` (ts nanos → timestamp, see Windows.tsCol). */
  def sides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = graft.Tables.load(spark, dir, "events")
      .withColumn("event_ts", Windows.tsCol("ts"))
    val clicks = e.where("event_type = 'click'")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_ts").as("c_ts"))
    val purchases = e.where("event_type = 'purchase'")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_ts").as("p_ts"))
    (clicks, purchases)
  }

  /** Driver entry: batch form of the interval join. One hash shuffle per
    * side on user_id, the range predicate evaluated join-local — never a
    * cross product (the equi key carries the join).
    */
  def intervalJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, purchases) = sides(spark, dir)
    clickToPurchase(clicks, purchases).orderBy("click_id", "purchase_id")
  }

  val intervalJoinSql: String =
    """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
      |       (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS lag_s
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'purchase'
      | AND epoch_us(b.ts) > epoch_us(a.ts)
      | AND epoch_us(b.ts) <= epoch_us(a.ts) + 21600000000
      |ORDER BY click_id, purchase_id""".stripMargin
}
