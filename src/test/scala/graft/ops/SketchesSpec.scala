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
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1).toDouble, r.getDouble(2))).toMap
    Sketches.approxStats(spark, dir).collect().foreach { r =>
      val (exactParts, exactMed) = exact(r.getAs[String]("rf"))
      val approxParts = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
        s"HLL off by >5%: $approxParts vs $exactParts")
      val approxMed = r.getAs[Double]("approx_median")
      assert(math.abs(approxMed - exactMed) / exactMed < 0.05,
        s"approx median off by >5%: $approxMed vs $exactMed")
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
