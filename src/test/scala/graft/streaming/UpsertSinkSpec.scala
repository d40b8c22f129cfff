package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Upd(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts_us: Long)

/** Streaming upsert sink: after replaying the events table in chunks, the
  * snapshot equals the batch latest-per-key compaction
  * (graft.ops.TableOps.latestByKey) — streaming merge == batch merge.
  */
class UpsertSinkSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming upsert snapshot equals batch latest-by-key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = graft.Tables.load(spark, sfDir, "events")
      .selectExpr("event_id", "user_id", "event_type", "value",
        "ts div 1000L AS ts_us")
      .as[Upd].collect().sortBy(u => (u.ts_us, u.event_id))

    val stream = MemoryStream[Upd]
    val outDir = Files.createTempDirectory("ups-out").toString + "/snap"
    val ckpt = Files.createTempDirectory("ups-ckpt").toString
    val q = Sinks.upsertParquet(stream.toDF(), outDir, ckpt,
      keyCols = Seq("user_id"), versionCols = Seq("ts_us", "event_id")).start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.read.parquet(outDir)
      .selectExpr("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().sorted
    val want = graft.ops.TableOps.latestByKey(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().sorted
    assert(want.nonEmpty)
    assert(got.toSeq == want.toSeq)

    // no leftover tmp/old dirs from the swap protocol
    val parent = new java.io.File(outDir).getParentFile
    assert(parent.listFiles().map(_.getName).count(_.startsWith("snap")) == 1)
  }
}
