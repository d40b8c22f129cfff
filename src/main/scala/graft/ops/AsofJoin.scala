package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** AS-OF (point-in-time) join — the canonical "operator Spark lacks"
  * (SURVEY-prompted custom-operator family, resolution (a): composed from
  * existing ops). Each left row matches the LATEST right row of the same key
  * with right.time <= left.time — the join financial tick data, feature
  * stores, and slowly-changing dimensions all need.
  *
  * Implementation is the scalable union + carry-forward shape: tag both
  * sides, union, ONE shuffle on the key, in-partition sort by (time, tag),
  * then `last(payload, ignoreNulls)` over rows-unbounded-preceding carries
  * the most recent right payload into every left row. No row expansion, no
  * per-key loop, no range explosion — cost is sort-merge of |L|+|R|, which
  * survives any scale the shuffle survives. (A naive `left.join(right,
  * l.t >= r.t).groupBy(argmax)` expands to O(|L|x|R|/keys) first.)
  */
object AsofJoin {

  /** Generic as-of join. `right` must be unique per (key, time) — pre-dedupe
    * if not (ties would make the carried row nondeterministic).
    *
    * The payload is carried as ONE struct column, not per-column: a per-column
    * `last(c, ignoreNulls)` would let a matched right row with a NULL payload
    * field inherit that field from an OLDER right row — true ASOF semantics
    * (and DuckDB's ASOF JOIN) take every field from the single matched row,
    * NULLs included. The struct itself is non-null on every right row, so
    * `last(struct, ignoreNulls)` pins the whole row at once.
    *
    * @param payloadCols right-side columns to carry (become nullable on the
    *                    left rows that precede every right row of their key)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val restCols = leftCols.filterNot(c => c == keyCol || c == timeCol)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(right.schema.fieldIndex(c))))
    // right rows sort BEFORE left rows at equal time (tag 0 < 1): an exact
    // time tie matches (as-of is <=)
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as("__tag"),
        struct(payloadCols.map(col): _*).as("__p")) ++
        restCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(timeCol), lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__p")) ++
        restCols.map(col)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(timeCol), col("__tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.where(col("__tag") === 1)
      .select((Seq(col(keyCol), col(timeCol)) ++
        payloadCols.map(c => col(s"__p.$c").as(c)) ++
        restCols.map(col)): _*)
  }

  /** Driver row: for each event (key = user_id, with a deterministic
    * synthetic day inside the orders' 1995-2001 range — pure integer
    * arithmetic so DuckDB derives the identical axis), the latest order of
    * the matching customer family (o_custkey % 150 = user_id) on or before
    * that day. Orders are pre-deduplicated to one per (key, day) — max
    * o_orderkey wins — so the as-of match is unique and deterministic.
    */
  def asofQuery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
      // is value-preserving and matches DuckDB's naive epoch_us. The
      // 86400000000L here is MICROS-per-day over the date-derived
      // unix_micros — not the events.ts nanos domain (Tables.tsNanosTo*)
      .selectExpr("o_custkey % 150 AS k",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000L AS t",
        "o_orderkey", "o_totalprice")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY k, t ORDER BY o_orderkey DESC)"))
      .where("rk = 1").drop("rk")
    val events = Tables.load(spark, dir, "events")
      .selectExpr("user_id AS k",
        s"9131L + ${Tables.tsNanosToSecondsSql("ts")} % 2400 AS t",
        "event_id")
    asof(events, orders, "k", "t", Seq("o_orderkey", "o_totalprice"))
      .selectExpr("event_id", "k", "t AS event_day", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
  }

  /** DuckDB oracle: native ASOF LEFT JOIN over the same deduped axis. */
  val asofSql: String =
    """WITH o AS (
      |  SELECT k, t, o_orderkey, o_totalprice FROM (
      |    SELECT o_custkey % 150 AS k,
      |           epoch_us(o_orderdate) // 86400000000 AS t,
      |           o_orderkey, o_totalprice,
      |           row_number() OVER (PARTITION BY o_custkey % 150,
      |                              epoch_us(o_orderdate) // 86400000000
      |                              ORDER BY o_orderkey DESC) AS rk
      |    FROM orders) WHERE rk = 1),
      |e AS (SELECT user_id AS k,
      |             9131 + (epoch_us(ts) // 1000000) % 2400 AS t,
      |             event_id
      |      FROM events)
      |SELECT e.event_id, e.k, e.t AS event_day, o.o_orderkey, o.o_totalprice
      |FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t >= o.t
      |ORDER BY event_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_asof_join" -> asofQuery)

  val oracles: Map[String, String] = Map(
    "x_asof_join" -> asofSql)
}
