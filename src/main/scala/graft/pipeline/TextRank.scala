package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TextRank keyword salience (Mihalcea & Tarau 2004): weighted PageRank
  * over the word co-occurrence graph — the canonical iterative
  * graph-analytics workload, expressed Spark-first.
  *
  * Graph derivation touches the corpus EXACTLY ONCE (adjacent-token pair
  * counts, one partial-agg shuffle); the 8 rank iterations then run on
  * the VOCABULARY-bounded edge list (cached) — each iteration is one
  * out-neighbor join + one in-edge aggregation, the textbook distributed
  * PageRank step, on a table whose size is the vocabulary squared at
  * worst, never the corpus.
  *
  * Cross-engine determinism (the [[TextAnalysis.lmScore]] recipe): ranks
  * are BIGINTs in units of 1e-12 of total mass. Per iteration, node v
  * receives s(v) = Σ over in-edges (r(u)·w(u,v)) div W(u) — one integer
  * division PER EDGE, so the sum is exact in any aggregation order — and
  * updates to r'(v) = (15·(Qp div N)) div 100 + (85·s(v)) div 100 (the
  * damping 0.85 as exact integer arithmetic). Truncation loses ≤1 unit
  * of 1e-12 per edge per iteration — immaterial for ranking, and
  * IDENTICAL in both engines, which is what the hash gate needs. The
  * oracle replays all 8 iterations as unrolled SQL stages.
  */
object TextRank {

  /** Rank mass scale (1e-12 units) and iteration count. */
  val Qp = 1000000000000L
  val Iters = 8

  private val pairsExpr =
    "explode(transform(sequence(1, size(t) - 1), " +
      "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))) AS p"

  /** Directed co-occurrence edges (a→b adjacent in text) with weights and
    * the source's total out-weight.
    */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(spark, dir, "documents")
      .selectExpr("split(text, ' ') AS t")
      .where("size(t) >= 2")
      .selectExpr(pairsExpr)
      .where("p.a <> '' AND p.b <> ''")
      .groupBy("p.a", "p.b").agg(count(lit(1)).as("w"))
    val wout = big.groupBy("a").agg(sum("w").as("wa"))
    big.join(wout, "a").select("a", "b", "w", "wa")
  }

  /** The [[Iters]]-round integer PageRank loop over an arbitrary graph —
    * `nodes(node)`, `e(a, b, w, wa)` — factored for reuse by
    * [[LinkRank.domainRank]] (same arithmetic, same truncation, so both
    * oracles replay identically). Caches the node/edge tables (each is
    * read every round) and returns `(node, r)`.
    */
  private[pipeline] def rankLoop(nodes0: DataFrame, e0: DataFrame): DataFrame = {
    val e = e0.cache()
    val nodes = nodes0.cache()
    val n = nodes.count() // node count: metadata-scale driver scalar
    val base = Qp / n
    val base15 = (15L * base) / 100L
    var r = nodes.withColumn("r", lit(base))
    for (_ <- 1 to Iters) {
      val s = e.join(r.withColumnRenamed("node", "a"), "a")
        .selectExpr("b", "(r * w) div wa AS c")
        .groupBy("b").agg(sum("c").as("s"))
      r = nodes.join(s.withColumnRenamed("b", "node"), Seq("node"), "left")
        .selectExpr("node",
          s"CAST($base15 + (85 * coalesce(s, CAST(0 AS BIGINT))) div 100" +
            " AS BIGINT) AS r")
    }
    r
  }

  def textrank(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) AS node")
      .where("node <> ''").distinct()
    rankLoop(nodes, edges(spark, dir))
      .selectExpr("node AS word", "r",
        s"CAST(r AS DOUBLE) / $Qp.0 AS score")
      .orderBy(desc("r"), asc("word"))
  }

  /** The unrolled r1..r[[Iters]] CTE stages over CTEs named `nodes`
    * (column `col`), `e(a, b, w, wa)` and `meta(b15, base)` — shared by
    * the TextRank and [[LinkRank]] oracles.
    */
  private[pipeline] def rankStagesSql(col: String): String =
    (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT n.$col,
         |         (SELECT b15 FROM meta)
         |           + (85 * coalesce(s.s, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.b AS $col, sum((r.r * e.w) // e.wa)::BIGINT AS s
         |    FROM e JOIN r${i - 1} r ON e.a = r.$col
         |    GROUP BY 1) s USING ($col))""".stripMargin
    }.mkString(",\n")

  val textrankSql: String = {
    val stages = rankStagesSql("word")
    s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
       |pairs AS (
       |  SELECT p.a AS a, p.b AS b
       |  FROM (SELECT unnest(list_transform(range(1, len(t)),
       |               i -> {'a': t[i], 'b': t[i + 1]})) AS p
       |        FROM toks WHERE len(t) >= 2)
       |  WHERE p.a <> '' AND p.b <> ''),
       |big AS (SELECT a, b, count(*)::BIGINT AS w FROM pairs GROUP BY 1, 2),
       |e AS (SELECT big.a, big.b, big.w, wo.wa
       |      FROM big JOIN (SELECT a, sum(w)::BIGINT AS wa
       |                     FROM big GROUP BY 1) wo USING (a)),
       |nodes AS (SELECT DISTINCT w AS word
       |          FROM (SELECT unnest(string_split(text, ' ')) AS w
       |                FROM documents) WHERE w <> ''),
       |meta AS (SELECT (15 * ($Qp // count(*))) // 100 AS b15,
       |                $Qp // count(*) AS base
       |         FROM nodes),
       |r0 AS (SELECT word, (SELECT base FROM meta) AS r FROM nodes),
       |$stages
       |SELECT word, r::BIGINT AS r, r::DOUBLE / $Qp.0 AS score
       |FROM r$Iters ORDER BY r DESC, word""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_textrank" -> textrank)

  val oracles: Map[String, String] = Map(
    "text_textrank" -> textrankSql)
}
