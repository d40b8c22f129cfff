package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Salting for skew-resistant joins — the manual fallback when AQE's skew
  * handling can't apply (e.g. the skewed side feeds a stateful op, or the
  * optimizer can't split one pathological key).
  *
  * The hot key's rows spread across `nSalts` sub-partitions: the large side
  * gets a deterministic per-row salt, the small side is replicated once per
  * salt value, and the join keys on (key, salt). Partition sizes shrink
  * ~nSalts× for the skewed key at the cost of replicating the small side
  * nSalts× — the standard trade at 100 TB when one customer/doc dominates.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, salted `nSalts` ways.
    * Deterministic (hash-of-row salt, no rand()) so replays are stable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver row: per-nation revenue through an 8-way SALTED lineitem ⋈
    * supplier join. The oracle is the PLAIN join — salting is an internal
    * rewrite that must not change the result multiset, and the hash-gate
    * proves it (exact decimal sums, so aggregation order can't leak in).
    */
  def skewJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_suppkey AS s_suppkey", "CAST(l_extendedprice AS DECIMAL(18,2)) AS price")
    val supp = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    saltedJoin(li, supp, "s_suppkey", nSalts = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum("price").cast("double").as("revenue"))
      .orderBy("s_nationkey")
  }

  val skewJoinSql: String =
    """SELECT s_nationkey, count(*)::BIGINT AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_skew_join" -> skewJoinQuery)

  val oracles: Map[String, String] = Map(
    "x_skew_join" -> skewJoinSql)
}
