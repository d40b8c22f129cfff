package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables}

/** O7 sink parity: the foreachBatch partitioned-parquet writer produces a
  * partitioned layout with every released row.
  */
class SinksSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = FadsStream.configure(
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  test("foreachBatch partitioned parquet sink writes all rows, partitioned") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Event].collect().sortBy(e => (e.ts, e.event_id)).take(300)

    val stream = MemoryStream[Event]
    val outDir = Files.createTempDirectory("sink-out").toString
    val ckpt = Files.createTempDirectory("sink-ckpt").toString
    val gen = FadsStream.anonymize(stream.toDS(), SparkEntry.eventsFadsConfig).toDF()
    val q = Sinks.partitionedParquet(gen, outDir, ckpt, Seq("suppressed")).start()
    try {
      stream.addData(input.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(Event(-1L, Long.MaxValue, 0L, "", 0.0, ""))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == input.length)
    assert(out.columns.contains("suppressed") && out.columns.contains("__batch_id"))
    // partition layout on disk: suppressed=... directories exist
    val dirs = new java.io.File(outDir).listFiles().map(_.getName).filter(_.startsWith("suppressed="))
    assert(dirs.nonEmpty)
  }
}
