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
      * projection) so plumbing and tests are end-to-end real. Exact integer
      * accumulation with one final double division keeps the features
      * bit-identical to any engine computing the same integers.
      */
    def decodeFrame(bytes: Array[Byte]): (Double, Array[Double]) = {
      if (bytes.isEmpty) (0.0, Array.fill(8)(0.0))
      else {
        var sum = 0L
        val hist = new Array[Long](8)
        bytes.foreach { b =>
          val u = b & 0xff
          sum += u
          hist(u % 8) += 1L
        }
        (sum.toDouble / bytes.length, hist.map(_.toDouble / bytes.length))
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

  /** One extracted media frame's features (the decode output schema) —
    * FLAT scalar columns rather than an array so every downstream surface
    * (SQL, columnar hashing, pandas-style tooling) consumes it natively.
    */
  case class FrameFeature(
      doc_id: Long, frame_idx: Long, n_bytes: Long, mean_byte: Double,
      f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double)

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
              val (mean, f) = StubCodec.decodeFrame(frame)
              FrameFeature(docId, idx.toLong, frame.length.toLong, mean,
                f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
          }
        }
      }(Encoders.product[FrameFeature])
    out.toDF().orderBy("doc_id", "frame_idx")
  }

  /** DuckDB replays the stub codec byte-for-byte: the testdata payload is
    * the documents' text, which is pure printable ASCII at every sf (verified
    * — so char positions == byte positions and `ord(c) == byte & 0xff`).
    * A real binary codec would make this a rows-only row again; today it
    * buys a full hash-match on the whole mapPartitions plumbing.
    */
  val frameFeaturesSql: String = {
    val fb = StubCodec.FrameBytes
    val hist = (0 until 8).map(k =>
      s"len(list_filter(os, o -> o % 8 = $k))::DOUBLE / len(os) AS f$k").mkString(",\n       ")
    s"""WITH frames AS (
       |  SELECT doc_id, text, length(text) AS n,
       |         unnest(range(0, (length(text) + ${fb - 1}) // $fb)) AS frame_idx
       |  FROM documents WHERE length(text) > 0),
       |fr AS (
       |  SELECT doc_id, frame_idx,
       |         list_transform(range(frame_idx * $fb + 1, least(n, (frame_idx + 1) * $fb) + 1),
       |                        i -> ord(substring(text, i, 1))) AS os
       |  FROM frames)
       |SELECT doc_id, frame_idx::BIGINT AS frame_idx, len(os)::BIGINT AS n_bytes,
       |       list_sum(os)::DOUBLE / len(os) AS mean_byte,
       |       $hist
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Resize as a checked query: byte budget 512, output = size accounting +
    * an md5 fingerprint of the truncated payload (proves the byte-level
    * truncation, not just the bookkeeping).
    */
  val ResizeMaxBytes = 512

  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resize(binaryColumns(spark, dir), ResizeMaxBytes)
      .selectExpr("doc_id", "format", "orig_bytes", "new_bytes",
        "CAST(new_bytes AS DOUBLE) / orig_bytes AS scale",
        "md5(content) AS content_fp")
      .orderBy("doc_id")

  val resizeSql: String =
    s"""SELECT doc_id, 'application/octet-stream' AS format,
       |       length(text)::BIGINT AS orig_bytes,
       |       least(length(text), $ResizeMaxBytes)::BIGINT AS new_bytes,
       |       least(length(text), $ResizeMaxBytes)::DOUBLE / length(text) AS scale,
       |       md5(substring(text, 1, $ResizeMaxBytes)) AS content_fp
       |FROM documents ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> metadata,
    "mm_frame_features" -> frameFeatures,
    "mm_resize" -> resizeQuery)

  val oracles: Map[String, String] = Map(
    "mm_metadata" -> metadataSql,
    "mm_frame_features" -> frameFeaturesSql,
    "mm_resize" -> resizeSql)
}
