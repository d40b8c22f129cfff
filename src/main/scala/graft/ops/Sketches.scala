package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch/approximate aggregates — the cardinality/quantile estimators a
  * 100 TB pipeline leans on when exact distinct/sort is too expensive
  * (HyperLogLog++ `approx_count_distinct`, t-digest-ish `percentile_approx`).
  * Sketches are engine-specific, so there is no cross-engine oracle; the
  * spec checks relative error against the exact answers instead
  * (rows-only driver check).
  */
object Sketches {

  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"))
      .orderBy("rf")
      // exact counterparts live in the SPEC: exact percentile() buffers and
      // sorts every group's values — exactly the cost sketches exist to avoid

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_sketch_stats" -> approxStats)
}

/** Typed `Aggregator` for a per-QID (min, max) interval — SURVEY §4.2's
  * optional convenience: the FADS bounding box as a first-class reusable
  * aggregate (`BoundsAgg.toColumn` / registered UDAF), with a partial-
  * combinable buffer (map-side merge like any built-in agg).
  */
object BoundsAgg extends Aggregator[Double, (Double, Double), (Double, Double)] {
  def zero: (Double, Double) = (Double.PositiveInfinity, Double.NegativeInfinity)
  def reduce(b: (Double, Double), v: Double): (Double, Double) =
    (math.min(b._1, v), math.max(b._2, v))
  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (math.min(a._1, b._1), math.max(a._2, b._2))
  def finish(b: (Double, Double)): (Double, Double) = b
  def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  /** Register as `graft_bounds(col)` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_bounds", org.apache.spark.sql.functions.udaf(this))
}
