package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted query timer: noop-sink materialization, one untimed warmup run,
  * best-of-2 timed — the same protocol as graft.Bench, for a subset of
  * queries while iterating on a plan.
  *
  * Usage: runMain graft.tools.Time <sfDir> <queryName...>
  */
object Time {
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
    // match graft.Bench's session so timings are comparable: RocksDB
    // state-store default + scratch (shuffle/RocksDB working dirs) on
    // tmpfs when present
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      builder.config("spark.local.dir", java.nio.file.Files
        .createTempDirectory(shm, "graft-time-scratch").toString)
    val spark = graft.streaming.FadsStream.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        val t = timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
        t
      }
      run() // warmup
      val best = math.min(run(), run())
      println(f"[time] $name%-32s ${best}%8.3f s")
    }
    spark.stop()
  }
}
