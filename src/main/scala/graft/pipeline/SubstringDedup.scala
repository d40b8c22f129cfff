package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact repeated-substring detection — the character-level dedup pass of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et al.
  * 2022, arXiv:2107.06499, their ExactSubstr): any substring of length ≥ L
  * that occurs at least twice ANYWHERE in the corpus (across docs or within
  * one) marks its occurrences as duplicated text, and maximal runs of
  * duplicated positions are reported as spans. This catches boilerplate,
  * quotes and templated text that document-level MinHash/SimHash dedup
  * ([[Dedup]]) structurally cannot see, because the containing documents
  * are globally dissimilar.
  *
  * Spark-first shape (the reference paper builds a single-node suffix
  * array; a 100 TB corpus cannot):
  *  - every L-gram start position becomes one row `(doc_id, pos, gram)` —
  *    a corpus scan with a ×L char-copy constant, embarrassingly parallel,
  *    no driver state (the MapReduce-standard alternative to suffix
  *    arrays);
  *  - one corpus-sized shuffle keyed on the gram counts occurrences:
  *    `count(*) OVER (PARTITION BY gram)`. The gram itself is the key —
  *    at L=20 the raw gram is SHORTER than an md5 hex of it, and raw-gram
  *    equality keeps the operator exact (no fingerprint collisions to
  *    reason about; at L ≥ 32 a 128-bit fingerprint would win and the
  *    semantics would become hash-equality, as in [[Dedup.exact]]);
  *  - the payload riding that shuffle is (doc_id, pos) — 12 bytes — per
  *    the rank-window lesson (never carry wide columns through a window
  *    shuffle);
  *  - span assembly is gaps-and-islands per document: covered starts with
  *    `pos − row_number()` constant form one island; `[min, max+L−1]` is
  *    the duplicated span. Per-doc partitioned window, combinable aggs.
  *
  * Output is one row per document: covered start count, span count, and
  * duplicated-char total (what the Lee et al. "remove" step would cut) —
  * all BIGINT, zero-filled for clean docs, so the DuckDB hash gate checks
  * every document's verdict including the negatives.
  */
object SubstringDedup {

  /** Minimum duplicated-substring length, in characters. 20 chars ≈ 4
    * synthetic-vocabulary words; measured on the sf0.01 corpus this marks
    * ~15% of start positions duplicated — both verdict classes live (the
    * CmsW lesson: a threshold no row fails, or none passes, gates
    * nothing). Lee et al. use 50 BPE tokens on natural text.
    */
  val GramLen = 20

  def substringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val grams = docs
      .selectExpr("doc_id", "text", "length(text) AS n")
      .where(s"n >= $GramLen")
      // sequence(1, k) is ASCENDING only because the filter above
      // guarantees k ≥ 1 (Spark generates descending sequences when
      // start > stop — an empty-doc foot-gun, hence the explicit where)
      .selectExpr("doc_id", s"explode(sequence(1, n - ${GramLen - 1})) AS pos",
        "text")
      .selectExpr("doc_id", "pos", s"substring(text, pos, $GramLen) AS g")
    val covered = grams
      .withColumn("cnt", expr("count(*) OVER (PARTITION BY g)"))
      .where("cnt >= 2")
      .withColumn("isl", expr(
        "pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)"))
    val spans = covered.groupBy("doc_id", "isl").agg(
      count(lit(1)).as("starts"),
      (max("pos") - min("pos") + lit(GramLen)).cast("long").as("chars"))
    val perDoc = spans.groupBy("doc_id").agg(
      sum("starts").as("c"), count(lit(1)).as("s"), sum("chars").as("d"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "coalesce(c, CAST(0 AS BIGINT)) AS n_covered",
        "coalesce(s, CAST(0 AS BIGINT)) AS n_spans",
        "coalesce(d, CAST(0 AS BIGINT)) AS dup_chars")
      .orderBy("doc_id")
  }

  val substringDedupSql: String = {
    val L = GramLen
    s"""WITH g AS (
       |  SELECT doc_id, unnest(range(1, length(text) - ${L - 2})) AS pos, text
       |  FROM documents WHERE length(text) >= $L),
       |gr AS (SELECT doc_id, pos, substr(text, pos::INT, $L) AS g FROM g),
       |c AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS cnt FROM gr),
       |cov AS (SELECT doc_id, pos,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |        FROM c WHERE cnt >= 2),
       |sp AS (SELECT doc_id, isl, count(*) AS starts,
       |       max(pos) - min(pos) + $L AS chars
       |       FROM cov GROUP BY doc_id, isl),
       |pd AS (SELECT doc_id, sum(starts) AS c, count(*) AS s, sum(chars) AS d
       |       FROM sp GROUP BY doc_id)
       |SELECT d0.doc_id,
       |       coalesce(c, 0)::BIGINT AS n_covered,
       |       coalesce(s, 0)::BIGINT AS n_spans,
       |       coalesce(d, 0)::BIGINT AS dup_chars
       |FROM documents d0 LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_substring_dedup" -> ((s: SparkSession, d: String) => substringDedup(s, d)))

  val oracles: Map[String, String] = Map(
    "text_substring_dedup" -> substringDedupSql)
}
