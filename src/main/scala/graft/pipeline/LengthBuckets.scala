package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Length-bucketed batch assembly — the group-by-length batching every
  * trainer runs on UNPACKED sequences (HF `group_by_length`, fairseq's
  * length bucketing): batching docs of similar token counts together so
  * per-batch padding (every row pads to its batch max) stops burning
  * compute. The entry assembles batches BOTH ways over the same corpus
  * and puts the per-doc padding waste of each under ONE hash:
  *
  *  - NAIVE: batch = arrival order (doc_id DIV B — ids are dense, so
  *    this is pure arithmetic, no global-order window at any scale);
  *  - BUCKETED: docs map to fixed-width length buckets
  *    (min(tokens DIV [[LbWidth]], [[LbMaxBucket]])), rank within their
  *    bucket by (tokens, doc_id), and batch = rank DIV B.
  *
  * Batch maxima come from a combinable groupBy + join back (never a
  * fat window), so the plan is two bucket-keyed exchanges + the
  * presentation sort at any corpus size. The spec asserts the
  * load-bearing claim — total bucketed waste strictly below naive — and
  * pins the exact waste algebra on hand-built length sets.
  */
object LengthBuckets {

  /** Docs per assembled batch. */
  val LbBatch = 8

  /** Fixed token width of one length bucket. */
  val LbWidth = 64

  /** Top bucket (everything longer folds in). */
  val LbMaxBucket = 15

  /** The core over (doc_id, ws_tokens) rows — exposed for the spec. */
  private[pipeline] def assemble(docs: DataFrame): DataFrame = {
    val based = docs.selectExpr("doc_id", "ws_tokens",
      s"least(ws_tokens DIV $LbWidth, $LbMaxBucket) AS bucket",
      s"doc_id DIV $LbBatch AS naive_batch")
    val ranked = based.withColumn("brk", expr(
        "row_number() OVER (PARTITION BY bucket ORDER BY ws_tokens, doc_id)"))
      .selectExpr("doc_id", "ws_tokens", "bucket", "naive_batch",
        s"CAST((brk - 1) DIV $LbBatch AS BIGINT) AS bucket_batch")
    val bucketMax = ranked.groupBy("bucket", "bucket_batch")
      .agg(max("ws_tokens").as("bucket_batch_max"))
    val naiveMax = ranked.groupBy("naive_batch")
      .agg(max("ws_tokens").as("naive_batch_max"))
    ranked.join(bucketMax, Seq("bucket", "bucket_batch"))
      .join(naiveMax, Seq("naive_batch"))
      .selectExpr("doc_id", "ws_tokens", "bucket", "bucket_batch",
        "bucket_batch_max", "bucket_batch_max - ws_tokens AS bucket_pad",
        "naive_batch", "naive_batch_max",
        "naive_batch_max - ws_tokens AS naive_pad")
      .orderBy("doc_id")
  }

  def query(spark: SparkSession, dir: String): DataFrame =
    assemble(Tables.load(spark, dir, "documents").selectExpr("doc_id",
      "CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens"))

  val sql: String =
    s"""WITH d AS (SELECT doc_id,
       |  len(string_split(text, ' '))::BIGINT AS ws_tokens FROM documents),
       |b AS (SELECT doc_id, ws_tokens,
       |             least(ws_tokens // $LbWidth, $LbMaxBucket) AS bucket,
       |             doc_id // $LbBatch AS naive_batch FROM d),
       |r AS (SELECT doc_id, ws_tokens, bucket, naive_batch,
       |             ((row_number() OVER (PARTITION BY bucket
       |                ORDER BY ws_tokens, doc_id) - 1) // $LbBatch)::BIGINT
       |               AS bucket_batch
       |      FROM b),
       |bm AS (SELECT bucket, bucket_batch,
       |              max(ws_tokens)::BIGINT AS bucket_batch_max
       |       FROM r GROUP BY 1, 2),
       |nm AS (SELECT naive_batch, max(ws_tokens)::BIGINT AS naive_batch_max
       |       FROM r GROUP BY 1)
       |SELECT r.doc_id, r.ws_tokens, r.bucket, r.bucket_batch,
       |       bm.bucket_batch_max,
       |       (bm.bucket_batch_max - r.ws_tokens)::BIGINT AS bucket_pad,
       |       r.naive_batch, nm.naive_batch_max,
       |       (nm.naive_batch_max - r.ws_tokens)::BIGINT AS naive_pad
       |FROM r JOIN bm USING (bucket, bucket_batch)
       |       JOIN nm USING (naive_batch)
       |ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_length_buckets" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_length_buckets" -> sql)
}
