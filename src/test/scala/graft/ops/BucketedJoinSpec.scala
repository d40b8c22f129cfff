package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** 100 TB join strategy proof: bucketing both fact tables on the join key
  * makes the join shuffle-free (co-located, bucket-local) — on a cluster
  * this is the difference between re-shuffling 100 TB per join and reading
  * pre-partitioned data. Asserts the physical plan has NO shuffle above the
  * bucketed scans.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed fact-fact join plans without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, dir, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        spark.table("li_bucketed")("l_orderkey") === spark.table("o_bucketed")("o_orderkey"))
      .groupBy("o_orderstatus").count()

    joined.collect() // execute so AQE finalizes the plan

    def shufflesIn(plan: org.apache.spark.sql.execution.SparkPlan): Int = plan match {
      case a: AdaptiveSparkPlanExec => shufflesIn(a.executedPlan)
      case p => p.collect { case _: ShuffleExchangeExec => 1 }.sum
    }
    val exec = joined.queryExecution.executedPlan
    // exactly one shuffle is allowed: the final groupBy on o_orderstatus.
    // The JOIN itself must be bucket-local (zero join-side shuffles).
    val n = shufflesIn(exec)
    assert(n <= 1, s"expected bucket-local join (<=1 shuffle for the agg), got $n:\n$exec")

    // and the result is right
    val total = joined.collect().map(_.getLong(1)).sum
    assert(total == Tables.load(spark, dir, "lineitem").count())
  }
}
