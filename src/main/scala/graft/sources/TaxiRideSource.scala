package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Faithful re-expression of the reference's taxi-ride CSV source semantics
  * (/root/reference/src/main/java/datasources/NYCTaxiRideSource.java:204-244,
  * `fromString`) as declarative Spark column expressions — no per-line UDF.
  *
  * Input line: `rideId, "START"|"END", time1, time2, startLon, startLat,
  * endLon, endLat, passengerCnt, taxiId, driverId` where for START rows
  * time1=startTime/time2=endTime and for END rows the two are SWAPPED; times
  * are `yyyy-MM-dd HH:mm:ss` UTC strings → epoch millis; empty lon/lat parse
  * to 0.0; malformed rows throw (the reference throws on bad arity/token —
  * strict mode ≙ ANSI cast failures surfacing as errors).
  *
  * Gzip is transparent: `spark.read.text("*.gz")` inflates per file split —
  * at scale prefer many gz shards (gzip is not splittable) or recompress.
  */
object TaxiRideSource {

  val schema: StructType = StructType(Seq(
    StructField("rideId", LongType),
    StructField("taxiId", LongType),
    StructField("driverId", LongType),
    StructField("isStart", BooleanType),
    StructField("startTime", LongType), // epoch ms (reference keeps Long)
    StructField("endTime", LongType),
    StructField("startLon", DoubleType),
    StructField("startLat", DoubleType),
    StructField("endLon", DoubleType),
    StructField("endLat", DoubleType),
    StructField("passengerCnt", ShortType)))

  private def tsMs(c: Column): Column =
    unix_millis(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"))

  /** Empty string → 0.0, else strict double parse
    * (NYCTaxiRideSource.java:232-239 does the same per field).
    */
  private def coord(c: Column): Column =
    when(c === "", lit(0.0)).otherwise(c.cast(DoubleType))

  /** Parse a DataFrame of raw lines (column `value`) into typed rides. */
  def parse(lines: DataFrame): DataFrame = {
    val t = split(col("value"), ",")
    def f(i: Int): Column = trim(element_at(t, i + 1))
    val isStart = f(1) === "START"
    lines.select(
      f(0).cast(LongType).as("rideId"),
      f(9).cast(LongType).as("taxiId"),
      f(10).cast(LongType).as("driverId"),
      isStart.as("isStart"),
      // START: time1=startTime, time2=endTime; END: swapped
      when(isStart, tsMs(f(2))).otherwise(tsMs(f(3))).as("startTime"),
      when(isStart, tsMs(f(3))).otherwise(tsMs(f(2))).as("endTime"),
      coord(f(4)).as("startLon"),
      coord(f(5)).as("startLat"),
      coord(f(6)).as("endLon"),
      coord(f(7)).as("endLat"),
      f(8).cast(ShortType).as("passengerCnt"))
  }

  /** Batch read of a (possibly gzipped) taxi CSV file. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Streaming read (pair with graft.streaming.PacedReplay for rate pacing). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    parse(spark.readStream.text(dir))

  /** Contiguous synthetic PID column (the reference CSVParser's `addPID`,
    * /root/reference/src/main/java/fads/CSVParser.java:62-64, prepends an
    * auto-increment int). `zipWithIndex` is a narrow op — no shuffle — and
    * unlike `monotonically_increasing_id` the ids are contiguous.
    */
  def withContiguousPid(df: DataFrame, pidCol: String = "pid"): DataFrame = {
    val schema = StructType(StructField(pidCol, LongType, nullable = false) +: df.schema.fields)
    val rows = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
