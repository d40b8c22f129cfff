package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's relational capability set Q1–Q8 (SURVEY.md §2.3) as plain
  * DataFrame programs, each with a DuckDB oracle (SURVEY.md §5.2 t2 gate).
  *
  * Every query is Catalyst-optimized end-to-end: projections/filters reach the
  * parquet scan, aggregates are partial (map-side), window/topk stay in
  * whole-stage codegen. Oracle-compare rules: aliases match the SQL exactly,
  * every query has a deterministic total ORDER BY, doubles are either exact
  * (min/max/passthrough) or computed by the identical expression tree in both
  * engines (bit-identical IEEE arithmetic).
  */
object RelationalQueries {

  /** Q1 — typed parse + projection (reference O2/O3 CSV/typed parse,
    * NYCTaxiRideSource.fromString / CSVParser.map): extract the numeric `k`
    * from events.props, surface ts as exact epoch millis.
    */
  def q1Parse(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id"),
      Tables.tsNanosToMillis("ts").as("ts_ms"),
      col("user_id"),
      col("event_type"),
      col("value"),
      regexp_extract(col("props"), "([0-9]+)", 1).cast("long").as("k_prop")
    ).orderBy("event_id")

  val q1Sql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value,
      |       CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k_prop
      |FROM events ORDER BY event_id""".stripMargin

  /** Q2 — global bounds (reference O6b: streaming per-QID min/max over all
    * tuples, Generalizer.java:108-115) as its batch equivalent.
    */
  def q2GlobalBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(
      min("l_extendedprice").as("price_lo"), max("l_extendedprice").as("price_hi"),
      min("l_quantity").as("qty_lo"), max("l_quantity").as("qty_hi"),
      min("l_discount").as("disc_lo"), max("l_discount").as("disc_hi"))

  val q2Sql: String =
    """SELECT min(l_extendedprice) AS price_lo, max(l_extendedprice) AS price_hi,
      |       min(l_quantity) AS qty_lo, max(l_quantity) AS qty_hi,
      |       min(l_discount) AS disc_lo, max(l_discount) AS disc_hi
      |FROM lineitem""".stripMargin

  /** Q3 — per-cluster bounding boxes (reference O6f: Cluster.of min/max over a
    * k-group, Cluster.java:18-34) — grouped min/max.
    */
  def q3ClusterBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("grp"))
      .agg(
        min("l_extendedprice").as("price_lo"), max("l_extendedprice").as("price_hi"),
        min("l_quantity").as("qty_lo"), max("l_quantity").as("qty_hi"),
        count(lit(1)).as("n"))
      .orderBy("grp")

  val q3Sql: String =
    """SELECT l_returnflag AS grp,
      |       min(l_extendedprice) AS price_lo, max(l_extendedprice) AS price_hi,
      |       min(l_quantity) AS qty_lo, max(l_quantity) AS qty_hi,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY grp""".stripMargin

  /** The fixed pivot used by Q4/Q5/Q6 (a deterministic stand-in for the FADS
    * pivot tuple; values sit inside every sf's data range).
    */
  private val PivotPrice = 30000.0
  private val PivotQty = 25.0

  private def globalBoundsDF(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(
      min("l_extendedprice").as("g_plo"), max("l_extendedprice").as("g_phi"),
      min("l_quantity").as("g_qlo"), max("l_quantity").as("g_qhi"))

  /** Q4 — kNN top-k (reference O6e: buffered tuples sorted by average
    * per-QID-normalized L1 distance to the pivot, take k-1,
    * Generalizer.java:193-227). Broadcast of the 1-row bounds, then a
    * codegen'd sort+limit (TakeOrderedAndProject — no full sort at scale).
    */
  def q4KnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.crossJoin(broadcast(globalBoundsDF(spark, dir)))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"),
        ((abs(col("l_extendedprice") - lit(PivotPrice)) / (col("g_phi") - col("g_plo"))
          + abs(col("l_quantity") - lit(PivotQty)) / (col("g_qhi") - col("g_qlo"))) / lit(2.0))
          .as("dist"))
      .orderBy(col("dist"), col("l_orderkey"), col("l_linenumber"))
      .limit(9)
  }

  val q4Sql: String =
    s"""WITH g AS (SELECT min(l_extendedprice) AS g_plo, max(l_extendedprice) AS g_phi,
       |                  min(l_quantity) AS g_qlo, max(l_quantity) AS g_qhi FROM lineitem)
       |SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity,
       |       (abs(l_extendedprice - $PivotPrice) / (g.g_phi - g.g_plo)
       |        + abs(l_quantity - $PivotQty) / (g.g_qhi - g.g_qlo)) / 2.0 AS dist
       |FROM lineitem, g
       |ORDER BY dist, l_orderkey, l_linenumber LIMIT 9""".stripMargin

  private def clusterBoxes(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("cluster_id"))
      .agg(
        min("l_extendedprice").as("c_plo"), max("l_extendedprice").as("c_phi"),
        min("l_quantity").as("c_qlo"), max("l_quantity").as("c_qhi"))

  private def infoLossCol: Column =
    (((col("c_phi") - col("c_plo")) / (col("g_phi") - col("g_plo"))
      + (col("c_qhi") - col("c_qlo")) / (col("g_qhi") - col("g_qlo"))) / lit(2.0))
      .as("info_loss")

  /** Q5 — cluster-reuse search (reference O6g: strict containment filter +
    * min-info-loss argmin, Generalizer.java:230-243, Cluster.java:55-62).
    */
  def q5ClusterReuse(spark: SparkSession, dir: String): DataFrame =
    clusterBoxes(spark, dir)
      .crossJoin(broadcast(globalBoundsDF(spark, dir)))
      .where(lit(PivotPrice) > col("c_plo") && lit(PivotPrice) < col("c_phi")
        && lit(PivotQty) > col("c_qlo") && lit(PivotQty) < col("c_qhi"))
      .select(col("cluster_id"), infoLossCol)
      .orderBy(col("info_loss"), col("cluster_id"))
      .limit(1)

  private def q56Cte: String =
    """WITH g AS (SELECT min(l_extendedprice) AS g_plo, max(l_extendedprice) AS g_phi,
      |                  min(l_quantity) AS g_qlo, max(l_quantity) AS g_qhi FROM lineitem),
      |c AS (SELECT l_returnflag || '/' || l_linestatus AS cluster_id,
      |             min(l_extendedprice) AS c_plo, max(l_extendedprice) AS c_phi,
      |             min(l_quantity) AS c_qlo, max(l_quantity) AS c_qhi
      |      FROM lineitem GROUP BY 1)""".stripMargin

  val q5Sql: String =
    s"""$q56Cte
       |SELECT c.cluster_id,
       |       ((c.c_phi - c.c_plo) / (g.g_phi - g.g_plo)
       |        + (c.c_qhi - c.c_qlo) / (g.g_qhi - g.g_qlo)) / 2.0 AS info_loss
       |FROM c, g
       |WHERE $PivotPrice > c.c_plo AND $PivotPrice < c.c_phi
       |  AND $PivotQty > c.c_qlo AND $PivotQty < c.c_qhi
       |ORDER BY info_loss, cluster_id LIMIT 1""".stripMargin

  /** Q6 — information loss (reference O6h: avg of normalized widths,
    * Cluster.java:79-85) for every cluster box.
    */
  def q6InfoLoss(spark: SparkSession, dir: String): DataFrame =
    clusterBoxes(spark, dir)
      .crossJoin(broadcast(globalBoundsDF(spark, dir)))
      .select(col("cluster_id"), infoLossCol)
      .orderBy("cluster_id")

  val q6Sql: String =
    s"""$q56Cte
       |SELECT c.cluster_id,
       |       ((c.c_phi - c.c_plo) / (g.g_phi - g.g_plo)
       |        + (c.c_qhi - c.c_qlo) / (g.g_qhi - g.g_qlo)) / 2.0 AS info_loss
       |FROM c, g
       |ORDER BY cluster_id""".stripMargin

  /** Q7 — interval substitution (reference O6i generalize / O6j suppress,
    * Cluster.java:65-77, Generalizer.java:246-257): each row's QID replaced by
    * its cluster interval (per event_type) and by the global interval.
    * Window min/max — one shuffle on the partition key, no self-join.
    */
  def q7Generalize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    // global "suppress" bounds via a broadcast 1-row agg join — an empty
    // window frame would drag the whole table onto one partition at scale
    val ev = Tables.load(spark, dir, "events")
    val g = ev.agg(min("value").as("g_value_lo"), max("value").as("g_value_hi"))
    ev.select(
      col("event_id"),
      col("event_type"),
      min("value").over(w).as("value_lo"),
      max("value").over(w).as("value_hi")
    ).crossJoin(broadcast(g))
      .select("event_id", "event_type", "value_lo", "value_hi", "g_value_lo", "g_value_hi")
      .orderBy("event_id")
  }

  val q7Sql: String =
    """SELECT event_id, event_type,
      |       min(value) OVER (PARTITION BY event_type) AS value_lo,
      |       max(value) OVER (PARTITION BY event_type) AS value_hi,
      |       min(value) OVER () AS g_value_lo,
      |       max(value) OVER () AS g_value_hi
      |FROM events ORDER BY event_id""".stripMargin

  /** Q8 — arrival enrichment (reference O4, TransactionGeneralizationJob
    * .java:58-61) with a deterministic injected clock (= event time, per
    * SURVEY §2.3 Q8: "deterministic ts injected, not wall clock").
    */
  def q8Enrich(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id"),
      col("user_id"),
      Tables.tsNanosToMillis("ts").as("arrival_ms"),
      Tables.tsNanosToMicros("ts").as("arrival_us")
    ).orderBy("event_id")

  val q8Sql: String =
    """SELECT event_id, user_id, epoch_ms(ts) AS arrival_ms,
      |       epoch_us(ts) AS arrival_us
      |FROM events ORDER BY event_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_parse" -> q1Parse,
    "q2_global_bounds" -> q2GlobalBounds,
    "q3_cluster_bounds" -> q3ClusterBounds,
    "q4_knn_topk" -> q4KnnTopK,
    "q5_cluster_reuse" -> q5ClusterReuse,
    "q6_info_loss" -> q6InfoLoss,
    "q7_generalize" -> q7Generalize,
    "q8_enrich" -> q8Enrich)

  val oracles: Map[String, String] = Map(
    "q1_parse" -> q1Sql,
    "q2_global_bounds" -> q2Sql,
    "q3_cluster_bounds" -> q3Sql,
    "q4_knn_topk" -> q4Sql,
    "q5_cluster_reuse" -> q5Sql,
    "q6_info_loss" -> q6Sql,
    "q7_generalize" -> q7Sql,
    "q8_enrich" -> q8Sql)
}
