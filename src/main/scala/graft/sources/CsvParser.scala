package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic typed CSV parsing — the reference's CSVParser
  * (/root/reference/src/main/java/fads/CSVParser.java:21-99): N delimited
  * columns with caller-declared types (Int/Double/else-String), optional
  * synthetic auto-increment PID prepended at position 0. Re-expressed as
  * `from_csv` (Catalyst-native, codegen'd, schema-checked) instead of a
  * per-line split loop; rate limiting lives in the source layer
  * (graft.streaming.PacedReplay), not a busy-wait in the parser
  * (CSVParser.java:76-81).
  */
object CsvParser {

  /** Parse a DataFrame of raw lines (column `value`). Strict mode surfaces
    * malformed rows as errors (the reference throws; FAILFAST ≙ same).
    */
  def parse(lines: DataFrame, schema: StructType, delimiter: String = ",",
      strict: Boolean = true): DataFrame = {
    val opts = Map(
      "sep" -> delimiter,
      "mode" -> (if (strict) "FAILFAST" else "PERMISSIVE"))
    lines
      .select(from_csv(col("value"), schema, opts).as("r"))
      .select(col("r.*"))
  }

  /** Reference `addPID` parity: contiguous auto-increment id prepended at
    * field 0 (delegates to the shared zipWithIndex impl).
    */
  def parseWithPid(lines: DataFrame, schema: StructType,
      delimiter: String = ","): DataFrame =
    TaxiRideSource.withContiguousPid(parse(lines, schema, delimiter))

  /** Batch read of a (possibly gzipped) delimited file. */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    parse(spark.read.text(path), schema, delimiter)

  /** Driver row for the error-TOLERANT path (the reference only throws —
    * FAILFAST parity is `strict = true`; production ingest needs PERMISSIVE):
    * synthesize CSV lines where every 13th record carries an unparseable
    * third field, parse with `strict = false`, and account for the damage —
    * bad fields become nulls, rows survive, good values aggregate exactly.
    */
  def permissiveQuery(spark: SparkSession, dir: String): DataFrame = {
    // concat_ws silently SKIPS null arguments — a NULL source field would
    // drop its CSV slot and shift the row's arity; coalesce to '' keeps the
    // slot (an empty field parses to NULL downstream, counted in n_bad like
    // any other bad field) (ADVICE r2)
    val lines = graft.Tables.load(spark, dir, "events").selectExpr(
      """concat_ws(',',
        |  coalesce(CAST(event_id AS STRING), ''),
        |  coalesce(CAST(user_id AS STRING), ''),
        |  CASE WHEN event_id % 13 = 0 THEN 'xx'
        |       ELSE coalesce(CAST(CAST(floor(value) AS BIGINT) AS STRING), '') END) AS value""".stripMargin)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("c", LongType)))
    parse(lines, schema, strict = false)
      .selectExpr(
        "CAST(count(*) AS BIGINT) AS n_rows",
        "CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad",
        "CAST(sum(coalesce(c, 0)) AS BIGINT) AS c_sum")
  }

  /** Oracle mirror of the Spark-side accounting INCLUDING the NULL paths
    * (ADVICE r3): field `c` parses to NULL — and counts in n_bad — when the
    * row was deliberately corrupted (event_id % 13 = 0) OR the source value
    * was NULL (coalesced to an empty CSV slot above). `coalesce(..., false)`
    * keeps a hypothetical NULL event_id on the same branch both engines take
    * (Spark's CASE treats a NULL predicate as false).
    */
  val permissiveSql: String =
    """SELECT count(*)::BIGINT AS n_rows,
      |       sum(CASE WHEN coalesce(event_id % 13 = 0, false) OR value IS NULL
      |                THEN 1 ELSE 0 END)::BIGINT AS n_bad,
      |       sum(CASE WHEN NOT coalesce(event_id % 13 = 0, false) AND value IS NOT NULL
      |                THEN floor(value)::BIGINT ELSE 0 END)::BIGINT AS c_sum
      |FROM events""".stripMargin
}
