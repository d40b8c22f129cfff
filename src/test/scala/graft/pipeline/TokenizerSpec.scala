package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer invariants: greedy merge semantics of the bracketed-string
  * representation, monotone pair counts, lossless segmentation, and
  * determinism. Cross-engine value equality is the driver oracle's job.
  */
class TokenizerSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bracketed replace implements greedy left-to-right BPE pairing") {
    import spark.implicits._
    val df = Seq("<a><a><a>", "<a><a><a><a>", "<ab><a>", "<b><a><b>")
      .toDF("syms")
      .selectExpr("syms", "replace(syms, '<a><a>', '<aa>') AS merged")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df("<a><a><a>") == "<aa><a>")     // greedy, non-overlapping
    assert(df("<a><a><a><a>") == "<aa><aa>") // adjacent pairs both merge
    assert(df("<ab><a>") == "<ab><a>")       // no cross-symbol false match
    assert(df("<b><a><b>") == "<b><a><b>")   // pair order matters
  }

  test("merge ranks have non-increasing pair counts and distinct pairs") {
    val merges = Tokenizer.bpeTrain(spark, dir).collect()
    assert(merges.length == Tokenizer.Merges)
    val counts = merges.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "greedy argmax implies non-increasing pair counts")
    val pairs = merges.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("segmentation is lossless and strictly compresses merged words") {
    val rows = Tokenizer.bpeSegment(spark, dir).collect()
    rows.foreach { r =>
      val word = r.getString(0)
      val syms = r.getString(2)
      // stripping brackets reconstructs the word exactly
      assert(syms.stripPrefix("<").stripSuffix(">")
        .split("><").mkString == word, s"lossy segmentation of '$word'")
      val n = r.getLong(3)
      assert(n >= 1 && n <= word.length)
    }
    // at least one word actually got compressed below char count
    assert(rows.exists(r => r.getLong(3) < r.getString(0).length))
  }

  test("training is deterministic across runs") {
    val a = Tokenizer.bpeTrain(spark, dir).collect().map(_.toSeq).toSeq
    val b = Tokenizer.bpeTrain(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
