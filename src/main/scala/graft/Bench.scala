package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.{Event, FadsStream, PacedReplay, ThroughputHistory}

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR at local[32] and prints ONE JSON line.
  *
  * Queries are materialized through the `noop` sink — a `.count()` would let
  * Catalyst prune the projections under test and report fake-fast times.
  * Also measures end-to-end streaming throughput of the FADS operator
  * (unthrottled paced replay of `events`), the reference's own benchmark
  * workload (BASELINE.md: ≥1,000 rec/s target; reference offered load).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = FadsStream.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup at the smallest sf: JIT + codegen cache + shuffle
    // machinery, so timed numbers reflect steady state, not first-call cost
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache() // queries cache() internally
    }

    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // best-of-2: absorbs one-off GC/compile hiccups without hiding real cost
      val sec = try {
        val runs = (1 to 2).map { _ =>
          val t = timed(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
          spark.catalog.clearCache() // don't let caches pile up across queries
          t
        }
        runs.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          spark.catalog.clearCache()
          -1.0
      }
      name -> sec
    }

    // streaming throughput: unthrottled replay of `events` through the FADS
    // transformWithState operator, 10 micro-batches
    val (streamSec, streamRows, streamShardedSec) = {
      import spark.implicits._
      val events = Tables.load(spark, sfDir, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      val nRows = events.count()
      val stageDir = Files.createTempDirectory("bench-stage").toString
      val rowsPerFile = math.max(1, (nRows / 10).toInt)
      PacedReplay.stage(events, Seq("ts", "event_id"), rowsPerFile, stageDir)
      val listener = ThroughputHistory.attach(spark)
      // single-key stream: 32 shuffle partitions would mean 32 RocksDB state
      // stores per batch (31 empty) — size state partitioning to the stream
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      def streamOnce(): Double = {
        val ckpt = Files.createTempDirectory("bench-ckpt").toString
        timed {
          val q = FadsStream.anonymize(
              PacedReplay.stream(spark, stageDir, events.schema).as[Event],
              SparkEntry.eventsFadsConfig)
            .writeStream.format("noop").outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(PacedReplay.trigger(0))
            .start()
          q.processAllAvailable()
          q.stop()
        }
      }
      val sec = math.min(streamOnce(), streamOnce()) // best-of-2, like queries
      // scale-out variant: 8 independent FADS shards (hash on user) — the
      // 1000-executor shape; measures the streaming parallel speedup over
      // the parity-faithful single stream
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      def streamOnceSharded(): Double = {
        val ckpt = Files.createTempDirectory("bench-ckpt-sh").toString
        timed {
          val q = FadsStream.anonymizeSharded(
              PacedReplay.stream(spark, stageDir, events.schema).as[Event],
              SparkEntry.eventsFadsConfig, e => e.user_id % 8)
            .writeStream.format("noop").outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(PacedReplay.trigger(0))
            .start()
          q.processAllAvailable()
          q.stop()
        }
      }
      val shardedSec = math.min(streamOnceSharded(), streamOnceSharded())
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.streams.removeListener(listener)
      (sec, nRows, shardedSec)
    }

    // Locale.ROOT: the f-interpolator uses the JVM default locale — a
    // decimal-comma locale would print invalid JSON
    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val validTimes = queryTimes.filter(_._2 >= 0)
    val total = validTimes.map(_._2).sum + streamSec
    val qs = (queryTimes :+ ("streaming_fads_replay" -> streamSec))
      .map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val streamRps = if (streamSec > 0) streamRows / streamSec else 0.0
    val shardedRps = if (streamShardedSec > 0) streamRows / streamShardedSec else 0.0
    println(
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,"sf":"$sfDir","stream_rows_per_sec":${num(streamRps, 1)},"stream_sharded_rows_per_sec":${num(shardedRps, 1)},"n_queries":${queryTimes.size}}""")
    spark.stop()
  }
}
