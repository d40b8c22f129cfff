package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("sketch aggregates land within tolerance of exact answers") {
    val rows = Sketches.approxStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_ok"),
        s"HLL outside ${Sketches.DistinctTol} tolerance for ${r.getAs[String]("rf")}")
      assert(r.getAs[Boolean]("median_ok"),
        s"approx median outside ${Sketches.MedianTol} tolerance for ${r.getAs[String]("rf")}")
      assert(r.getAs[Long]("exact_parts") > 0)
    }
  }

  test("BoundsAgg matches min/max and works registered in SQL") {
    BoundsAgg.register(spark)
    graft.Tables.registerAll(spark, dir)
    val r = spark.sql(
      """SELECT graft_bounds(l_extendedprice) AS b,
        |       min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem""".stripMargin).collect()(0)
    val b = r.getStruct(0)
    assert(b.getDouble(0) == r.getDouble(1))
    assert(b.getDouble(1) == r.getDouble(2))
  }
}
