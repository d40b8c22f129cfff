package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming deduplication — the stateful first-occurrence filter every
  * event-ingest pipeline needs (the reference has no dedup of any kind;
  * this is a north-star extension like the batch dedup family in
  * graft.pipeline.Dedup, but for unbounded streams).
  *
  * Scale: `dropDuplicatesWithinWatermark` keeps one state entry per key seen
  * within the watermark horizon — the watermark EVICTS key state, so a
  * 1000-executor stream's dedup state stays bounded by key-arrival rate ×
  * horizon, not by stream length. State shuffles once on the key columns.
  */
object StreamingDedup {

  /** Streaming form: first occurrence per `keys` within the watermark
    * horizon; duplicate arrivals inside the horizon are dropped, state for
    * keys older than the horizon is evicted (a key recurring later than the
    * horizon is emitted again — the price of bounded state).
    */
  def dedupStream(events: DataFrame, watermark: String, keys: Seq[String]): DataFrame =
    events.withColumn("event_ts", Windows.tsCol("ts"))
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Batch form (driver-oracle-checkable): the deterministic first event per
    * (user_id, event_type) by event time — what the streaming form converges
    * to when all of a key's duplicates arrive within the horizon.
    */
  def firstPerKeyQuery(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)"))
      .where("rk = 1")
      .selectExpr("event_id", "user_id", "event_type",
        s"${graft.Tables.tsNanosToMillisSql("ts")} AS ts_ms", "value")
      .orderBy("user_id", "event_type")

  val firstPerKeySql: String =
    """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                                   ORDER BY ts, event_id) AS rk
      |      FROM events)
      |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin
}
