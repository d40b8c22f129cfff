package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Output sinks (reference O7: the only observable output was println of
  * each released tuple — SURVEY.md §2.1). Spark-native equivalents:
  * console (println parity), memory (tests), exactly-once parquet (real
  * output), and a foreachBatch writer for partitioned/bucketed layouts the
  * plain file sink can't produce.
  */
object Sinks {

  /** println-parity sink (reference Generalizer.java:129). */
  def console[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.format("console").option("truncate", "false")

  /** Exactly-once parquet file sink (commit log in _spark_metadata). */
  def parquet[T](ds: Dataset[T], path: String, checkpoint: String): DataStreamWriter[T] =
    ds.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)

  /** foreachBatch writer: per-micro-batch control for layouts the file sink
    * cannot express (partitionBy columns, dynamic overwrite, merges).
    * foreachBatch is at-least-once per batch, so the write is made
    * IDEMPOTENT: keyed by a `__batch_id` partition column and written with
    * dynamic partition overwrite — a replayed micro-batch replaces its own
    * partitions instead of appending duplicates.
    */
  def partitionedParquet(df: DataFrame, path: String, checkpoint: String,
      partitionCols: Seq[String]): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("__batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCols :+ "__batch_id": _*)
          .parquet(path)
      }
}
