package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the most common streaming join in practice:
  * a fact stream decorated with a small dimension table (here: events keyed
  * into `nation` via user_id). The static side needs NO watermark and holds
  * NO state: Spark broadcasts it into every micro-batch, so the stream side
  * never shuffles for the join — at 100 TB/day this is the only join shape
  * that costs the same as a scan. Completes the streaming-join family next
  * to [[StreamJoin]] (stream-stream interval).
  *
  * The same core runs batch (driver oracle row) and streaming
  * (StaticEnrichSpec proves streaming == batch across micro-batches).
  */
object StaticEnrich {

  /** Join core, batch or streaming `events`: key the stream into the 25-row
    * nation dim (user_id mod 25 — the synthetic fixture has no FK into the
    * star schema) and aggregate per nation.
    */
  def enriched(events: DataFrame, nation: DataFrame): DataFrame =
    events
      .withColumn("nk", pmod(col("user_id"), lit(25)).cast("int"))
      .join(broadcast(nation), col("nk") === col("n_nationkey"))

  /** Driver entry: per-nation event counts + exact value sums. */
  def staticEnrichQuery(spark: SparkSession, dir: String): DataFrame =
    enriched(
      graft.Tables.load(spark, dir, "events"),
      graft.Tables.load(spark, dir, "nation"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double").as("total_value"))
      .orderBy("nation")

  val staticEnrichSql: String =
    """SELECT n_name AS nation, count(*)::BIGINT AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN nation ON user_id % 25 = n_nationkey
      |GROUP BY n_name ORDER BY nation""".stripMargin
}
