package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout invariants: the Morton bucketing must bound BOTH
  * dimensions inside every bucket — the property a linear sort cannot
  * deliver for its trailing column.
  */
class ZorderSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every z-bucket bounds both dimensions simultaneously") {
    val li = graft.Tables.load(spark, dir, "lineitem")
    val b = li.selectExpr("min(l_partkey) AS pmin", "max(l_partkey) AS pmax",
      "min(l_suppkey) AS smin", "max(l_suppkey) AS smax").head()
    val (pRange, sRange) =
      (b.getLong(1) - b.getLong(0) + 1, b.getLong(3) - b.getLong(2) + 1)
    val rows = Formats.zorderLayout(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == li.count(), "buckets partition rows")
    // 5 bucket bits = 3 high partkey bits + 2 high suppkey bits: spans
    // must shrink to ~range/8 and ~range/4 (+1 for grid-boundary slop)
    rows.foreach { r =>
      val pSpan = r.getLong(3) - r.getLong(2) + 1
      val sSpan = r.getLong(5) - r.getLong(4) + 1
      assert(pSpan <= pRange / 4,
        s"bucket ${r.getLong(0)}: partkey span $pSpan vs range $pRange")
      assert(sSpan <= sRange / 2,
        s"bucket ${r.getLong(0)}: suppkey span $sSpan vs range $sRange")
      // strictly better than a partkey-linear layout's trailing column,
      // which leaves the suppkey span at the FULL range in every bucket
      assert(sSpan < sRange)
    }
  }
}
