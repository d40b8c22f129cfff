package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Per-trigger cost attribution for one declared streaming entry: attach a
  * [[StreamingQueryListener]], run the entry once, print every micro-batch's
  * duration breakdown (trigger/addBatch/getBatch/walCommit) and state-store
  * commit metrics — the measurement step (guide §1) for streaming entries,
  * whose Spark-UI SQL view is gone by the time the entry returns.
  *
  * Usage: runMain graft.tools.StreamDiag <sfDir> <queryName...>
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // match the bench: RocksDB provider default + tmpfs scratch when present
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      builder.config("spark.local.dir", java.nio.file.Files
        .createTempDirectory(shm, "graft-diag-scratch").toString)
    val spark = graft.streaming.FadsStream.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[diag] query started ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def ms(k: String): Long =
          Option(d.get(k)).map(_.longValue).getOrElse(-1L)
        val st = p.stateOperators.map { so =>
          val fsync = Option(so.customMetrics
            .get("rocksdbCommitFileSyncLatencyMs")).map(_.longValue).getOrElse(0L)
          s"commit=${so.commitTimeMs}ms upd=${so.allUpdatesTimeMs}ms " +
            s"fsync=${fsync}ms rows=${so.numRowsTotal} shards=${so.numShufflePartitions}"
        }.mkString(" | ")
        println(s"[diag] batch=${p.batchId} in=${p.numInputRows} " +
          s"trigger=${ms("triggerExecution")}ms addBatch=${ms("addBatch")}ms " +
          s"getBatch=${ms("getBatch")}ms latestOffset=${ms("latestOffset")}ms " +
          s"walCommit=${ms("walCommit")}ms commitOffsets=${ms("commitOffsets")}ms " +
          s"state[$st]")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[diag] $name total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
