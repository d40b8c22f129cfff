package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Bloom-filter semi-join pruning — the 100 TB join-reduction technique:
  * build a bloom sketch of the dimension's join keys, pre-filter the fact
  * scan with `might_contain` BEFORE any shuffle, then confirm with the
  * exact join. Spark ships codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` for its own runtime row-level filtering;
  * [[graft.functions.VectorExpressions.register]] surfaces them as
  * `graft_bloom_agg` / `graft_might_contain` so the pre-filter can be
  * declared EXPLICITLY (Spark's automatic injection only fires on
  * shuffle-heavy plans past size thresholds — at 100 TB you want the
  * guarantee, not the heuristic).
  *
  * Correctness is structural: a bloom filter has NO FALSE NEGATIVES, so
  * bloom-prefilter ∘ exact-semi-join ≡ exact-semi-join — which is exactly
  * what the DuckDB oracle runs (no bloom on its side). False positives
  * only cost the confirm join a few extra probe rows (~1% at the sized
  * bits/item budget below).
  */
object BloomJoin {

  val Segment = "BUILDING"
  /** Sized for sf10 (~1.5 M segment customers) at ~9.6 bits/key ≈ 1% fp;
    * the sketch is ~1.8 MB — broadcast-size regardless of fact cardinality.
    */
  val EstItems = 2000000L
  val NumBits = 1L << 24

  /** Orders of one customer segment, bloom-pruned then exactly confirmed:
    * monthly order counts + exact cents totals. The scalar subquery makes
    * the sketch a foldable input to `graft_might_contain` (the same shape
    * Spark's injected runtime filters take), so the fact scan applies it
    * BEFORE the shuffle/join — the dominant cost saver when the fact side
    * is 1000× the dimension.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""WITH seg AS (SELECT c_custkey FROM customer
         |             WHERE c_mktsegment = '$Segment'),
         |pruned AS (
         |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
         |  FROM orders
         |  WHERE graft_might_contain(
         |          (SELECT graft_bloom_agg(xxhash64(c_custkey), ${EstItems}L, ${NumBits}L)
         |           FROM seg),
         |          xxhash64(o_custkey))
         |    AND o_custkey IN (SELECT c_custkey FROM seg))
         |SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |       CAST(month(o_orderdate) AS BIGINT) AS mth,
         |       count(*) AS n_orders,
         |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         |FROM pruned
         |GROUP BY year(o_orderdate), month(o_orderdate)
         |ORDER BY yr, mth""".stripMargin)
  }

  /** Oracle: the plain exact semi join — bit-identical because bloom
    * pruning admits a superset of the exact-join survivors.
    */
  val bloomSemiJoinSql: String =
    s"""SELECT year(o_orderdate)::BIGINT AS yr, month(o_orderdate)::BIGINT AS mth,
       |       count(*)::BIGINT AS n_orders,
       |       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
       |FROM orders
       |WHERE o_custkey IN (SELECT c_custkey FROM customer
       |                    WHERE c_mktsegment = '$Segment')
       |GROUP BY 1, 2 ORDER BY yr, mth""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bloom_semi_join" -> bloomSemiJoin)

  val oracles: Map[String, String] = Map(
    "x_bloom_semi_join" -> bloomSemiJoinSql)
}
