package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import TextAnalysis.{polyHashExpr, polyHashSql}

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * (image/audio/video) ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local batch functions over those bytes.
  *
  * The container has no media codecs, so the DECODE step is a clearly-marked
  * deterministic STUB (see [[StubCodec]]) — but everything Spark-side is
  * real and tested: the binary schema, the metadata struct, the
  * mapPartitions batch shape (one codec init per partition, streamed rows),
  * and the output feature schema. Swapping [[StubCodec.decodeFrame]] for a
  * real JNI/FFmpeg/JPEG decoder changes no plan shape.
  *
  * Scale: per-row/partition-local only — no shuffle anywhere; binary columns
  * push down column pruning so scans touching only metadata never read the
  * payload bytes (parquet column split).
  */
object Multimodal {

  /** The media "codec" boundary. STUB IMPLEMENTATION — deterministic fake
    * standing in for a real decoder; real pipelines plug libjpeg/ffmpeg here.
    */
  object StubCodec {
    val FrameBytes = 256

    /** STUB "decode": real impl would decode pixels/samples; this computes
      * deterministic surrogate features (mean byte, 8-dim byte-histogram
      * projection) so plumbing and tests are end-to-end real.
      */
    def decodeFrame(bytes: Array[Byte]): (Double, Array[Float]) = {
      if (bytes.isEmpty) (0.0, Array.fill(8)(0.0f))
      else {
        var sum = 0L
        val hist = new Array[Float](8)
        bytes.foreach { b =>
          val u = b & 0xff
          sum += u
          hist(u % 8) += 1.0f
        }
        (sum.toDouble / bytes.length, hist.map(_ / bytes.length))
      }
    }
  }

  /** Resized payload record (the resize output schema). */
  case class Resized(
      doc_id: Long, content: Array[Byte], format: String,
      orig_bytes: Long, new_bytes: Long, scale: Double)

  /** "Resize" a media payload to a byte budget — STUB: a real codec would
    * decode, scale pixels/samples, re-encode; this deterministic stand-in
    * truncates proportionally (head bytes) so schema, batch shape and
    * downstream size accounting are end-to-end real.
    */
  def resize(bin: DataFrame, maxBytes: Int): DataFrame = {
    val out = bin.select("doc_id", "content")
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val resized =
            if (bytes.length <= maxBytes) bytes else bytes.take(maxBytes)
          Resized(docId, resized, "application/octet-stream",
            bytes.length.toLong, resized.length.toLong,
            if (bytes.isEmpty) 1.0 else resized.length.toDouble / bytes.length)
        }
      }(Encoders.product[Resized])
    out.toDF()
  }

  /** One extracted media frame's features (the decode output schema). */
  case class FrameFeature(
      doc_id: Long, frame_idx: Int, n_bytes: Int,
      mean_byte: Double, features: Array[Float])

  /** Attach a binary payload + typed metadata struct to each document (the
    * testdata has no real media, so the payload is the UTF-8 text bytes —
    * shape-identical to an image/audio column).
    */
  def binaryColumns(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").selectExpr(
      "doc_id",
      "CAST(text AS BINARY) AS content",
      "named_struct('format', 'application/octet-stream', " +
        "'n_bytes', CAST(octet_length(CAST(text AS BINARY)) AS BIGINT)) AS meta")

  /** Metadata-only scan (never touches payload bytes thanks to parquet
    * column pruning): sizes + a header fingerprint.
    */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").selectExpr(
      "doc_id",
      "CAST(octet_length(CAST(text AS BINARY)) AS BIGINT) AS n_bytes",
      s"${polyHashExpr("substring(text, 1, 16)")} AS header_fp"
    ).orderBy("doc_id")

  val metadataSql: String =
    s"""SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       |       ${polyHashSql("substring(text, 1, 16)")} AS header_fp
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame-sample + decode: split each payload into fixed-size frames and
    * run the (stub) codec per frame — partition-local batch processing, one
    * codec per partition, iterator-streamed (never materializes a partition).
    */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    val bin = binaryColumns(spark, dir)
    val out = bin.select("doc_id", "content")
      .mapPartitions { rows =>
        // real codecs would init once here (per partition), not per row
        rows.flatMap { r =>
          val docId = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          bytes.grouped(StubCodec.FrameBytes).zipWithIndex.map {
            case (frame, idx) =>
              val (mean, feats) = StubCodec.decodeFrame(frame)
              FrameFeature(docId, idx, frame.length, mean, feats)
          }
        }
      }(Encoders.product[FrameFeature])
    out.toDF().orderBy("doc_id", "frame_idx")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> metadata,
    "mm_frame_features" -> frameFeatures)

  /** mm_frame_features is stub-codec mapPartitions output — rows-only check. */
  val oracles: Map[String, String] = Map(
    "mm_metadata" -> metadataSql)
}
