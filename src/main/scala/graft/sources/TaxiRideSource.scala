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

  /** End-to-end parse check (driver row for O1/O2): synthesize taxi CSV
    * lines in the reference's wire format from the `events` table — every
    * field derived from integer arithmetic + string concat so DuckDB can
    * regenerate the exact expected values — then run them through [[parse]].
    * Covers all fromString semantics: START/END token with time1/time2 SWAP
    * for END rows (NYCTaxiRideSource.java:226-231), UTC `yyyy-MM-dd HH:mm:ss`
    * → epoch-ms, empty lon/lat → 0.0 (:232-239).
    */
  def parseQuery(spark: SparkSession, dir: String): DataFrame =
    syntheticRides(spark, dir).orderBy("rideId")

  /** Reference-format synthetic rides (the [[parseQuery]] generator without
    * the output ordering — also feeds the end-to-end taxi FADS replay).
    */
  def syntheticRides(spark: SparkSession, dir: String): DataFrame = {
    val lines = graft.Tables.load(spark, dir, "events")
      .selectExpr(
        "event_id", "user_id",
        s"from_unixtime(${graft.Tables.tsNanosToSecondsSql("ts")}) AS t_start",
        s"from_unixtime(${graft.Tables.tsNanosToSecondsSql("ts")} + event_id % 3600) AS t_end")
      .selectExpr(
        """concat_ws(',',
          |  CAST(event_id AS STRING),
          |  CASE WHEN event_id % 2 = 0 THEN 'START' ELSE 'END' END,
          |  CASE WHEN event_id % 2 = 0 THEN t_start ELSE t_end END,
          |  CASE WHEN event_id % 2 = 0 THEN t_end ELSE t_start END,
          |  CASE WHEN event_id % 7 = 0 THEN ''
          |       ELSE concat(CAST(user_id % 90 AS STRING), '.', lpad(CAST(event_id % 1000 AS STRING), 3, '0')) END,
          |  CASE WHEN event_id % 11 = 0 THEN ''
          |       ELSE concat(CAST(user_id % 60 AS STRING), '.', lpad(CAST(user_id % 1000 AS STRING), 3, '0')) END,
          |  concat(CAST(event_id % 90 AS STRING), '.', lpad(CAST(user_id % 500 AS STRING), 3, '0')),
          |  CASE WHEN event_id % 13 = 0 THEN ''
          |       ELSE concat(CAST(event_id % 60 AS STRING), '.', lpad(CAST(event_id % 500 AS STRING), 3, '0')) END,
          |  CAST(1 + event_id % 6 AS STRING),
          |  CAST(1000 + user_id AS STRING),
          |  CAST(2000 + user_id AS STRING)) AS value""".stripMargin)
    parse(lines)
  }

  /** DuckDB oracle: the expected parse output computed straight from the
    * source columns (same swap CASE logic, same integer-built coordinate
    * strings parsed to DOUBLE — IEEE nearest in both engines).
    */
  val parseQuerySql: String =
    """SELECT event_id AS rideId,
      |       1000 + user_id AS taxiId,
      |       2000 + user_id AS driverId,
      |       (event_id % 2 = 0) AS isStart,
      |       (epoch_ms(ts) // 1000) * 1000 AS startTime,
      |       (epoch_ms(ts) // 1000 + event_id % 3600) * 1000 AS endTime,
      |       CASE WHEN event_id % 7 = 0 THEN 0.0
      |            ELSE ((user_id % 90)::VARCHAR || '.' || lpad((event_id % 1000)::VARCHAR, 3, '0'))::DOUBLE END AS startLon,
      |       CASE WHEN event_id % 11 = 0 THEN 0.0
      |            ELSE ((user_id % 60)::VARCHAR || '.' || lpad((user_id % 1000)::VARCHAR, 3, '0'))::DOUBLE END AS startLat,
      |       ((event_id % 90)::VARCHAR || '.' || lpad((user_id % 500)::VARCHAR, 3, '0'))::DOUBLE AS endLon,
      |       CASE WHEN event_id % 13 = 0 THEN 0.0
      |            ELSE ((event_id % 60)::VARCHAR || '.' || lpad((event_id % 500)::VARCHAR, 3, '0'))::DOUBLE END AS endLat,
      |       (1 + event_id % 6)::SMALLINT AS passengerCnt
      |FROM events ORDER BY rideId""".stripMargin

  /** Contiguous synthetic PID column (the reference CSVParser's `addPID`,
    * /root/reference/src/main/java/fads/CSVParser.java:62-64, prepends an
    * auto-increment int). `zipWithIndex` is a narrow op — no shuffle — and
    * unlike `monotonically_increasing_id` the ids are contiguous.
    *
    * COST NOTE (round-2 verdict): dropping to `df.rdd` exits Tungsten (full
    * row deserialization) and zipWithIndex runs an extra per-partition
    * count job. That's acceptable ONLY for this PARITY UTILITY, which must
    * number rows in the df's existing (arrival) order with no sort key —
    * do NOT put it in a hot pipeline. Where a sort key exists, use
    * [[graft.ops.Ids.contiguous]] (bucketed rank, stays in codegen — what
    * PacedReplay.stage uses); where contiguity isn't contractual, use
    * `monotonically_increasing_id()` (zero extra jobs, unique but gapped).
    */
  def withContiguousPid(df: DataFrame, pidCol: String = "pid"): DataFrame = {
    val schema = StructType(StructField(pidCol, LongType, nullable = false) +: df.schema.fields)
    val rows = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
