package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Throughput observability — parity with the reference's
  * ParallelThroughputLogger / ParallelThroughputStatistics
  * (/root/reference/src/main/java/throughputUtils/ParallelThroughputLogger.java:76-101,
  * :36-73): the reference forwards every element through a flatMap that
  * samples elements/sec and prints mean + history on close.
  *
  * In Spark this is NOT an operator: Structured Streaming already measures
  * per-trigger `inputRowsPerSecond` / `processedRowsPerSecond`
  * (SURVEY.md §2.1 O5), so a listener records the history for free — zero
  * cost on the data path.
  */
final class ThroughputHistory extends StreamingQueryListener {

  final case class Sample(
      batchId: Long, timestamp: String,
      numInputRows: Long, inputRowsPerSecond: Double,
      processedRowsPerSecond: Double, batchDurationMs: Long)

  private val samples = mutable.ArrayBuffer.empty[Sample]

  def history: Seq[Sample] = synchronized(samples.toSeq)

  def meanProcessedRowsPerSecond: Double = synchronized {
    val s = samples.filter(x => !x.processedRowsPerSecond.isNaN)
    if (s.isEmpty) 0.0 else s.map(_.processedRowsPerSecond).sum / s.size
  }

  def totalRows: Long = synchronized(samples.map(_.numInputRows).sum)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    samples += Sample(p.batchId, p.timestamp, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond, p.batchDuration)
  }

  /** Reference parity: dump mean + full history when the query stops
    * (ParallelThroughputLogger.close, :44-48).
    */
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = synchronized {
    println(f"[throughput] mean processed rows/s: $meanProcessedRowsPerSecond%.1f over ${samples.size} triggers, ${totalRows} rows")
    samples.foreach(s =>
      println(f"[throughput] batch ${s.batchId}: in=${s.numInputRows} rows, ${s.inputRowsPerSecond}%.1f in/s, ${s.processedRowsPerSecond}%.1f proc/s, ${s.batchDurationMs} ms"))
  }
}

object ThroughputHistory {
  /** Attach a fresh history listener to the session and return it. */
  def attach(spark: SparkSession): ThroughputHistory = {
    val l = new ThroughputHistory
    spark.streams.addListener(l)
    l
  }
}
