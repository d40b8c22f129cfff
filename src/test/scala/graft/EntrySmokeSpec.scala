package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: `SparkEntry.entry` must work on a plain session
  * with NO graft-specific configs (the driver builds its own session) and
  * return rows. Also exercises every query's plan construction (analysis
  * errors surface even without execution).
  */
class EntrySmokeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns rows on a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query analyzes on a vanilla session") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name must analyze")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
