package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Host-level link analysis — the crawl-frontier prioritization /
  * spam-demotion signal every web-scale corpus pipeline computes before
  * anything else touches the pages (Common Crawl publishes exactly this
  * as its host-level ranks): PageRank over the DOMAIN graph, so harvest
  * budgets and quality priors follow link reputation instead of raw page
  * counts.
  *
  * Derived surface (the [[UrlDedup]] convention — DuckDB replays the
  * exact construction): every 3 doc_ids form one logical page; 60% of
  * pages sit on ONE head domain, the rest across 97 tail domains. Each
  * page links to page `(7·g + 3) mod G` (a permutation whenever
  * gcd(7, G) = 1, so out-degree is uniform at page level while the
  * DOMAIN graph inherits the head-domain skew); same-domain self-loops
  * are dropped, parallel page links collapse into weighted domain edges.
  *
  * The 8 rank iterations are [[TextRank.rankLoop]] — byte-identical
  * integer arithmetic (1e-12-unit ranks, per-edge integer division,
  * damping 15/85 as exact integer ops), run on the DOMAIN-bounded edge
  * list: graph derivation costs one corpus-key scan + one equi join, the
  * iterations never touch anything corpus-sized.
  */
object LinkRank {

  /** Deterministic page→page link function g → (Mul·g + Off) mod G. */
  val LinkMul = 7L
  val LinkOff = 3L

  private def domSpark(g: String): String =
    s"CASE WHEN ($g) % 5 < 3 THEN 'big.example.com' " +
      s"ELSE concat('site', CAST(($g) % 97 AS STRING), '.example.org') END"

  private def domDuck(g: String): String =
    s"CASE WHEN ($g) % 5 < 3 THEN 'big.example.com' " +
      s"ELSE concat('site', (($g) % 97)::VARCHAR, '.example.org') END"

  /** The weighted domain edge list `(a, b, w, wa)` — exposed for the
    * spec (degree/weight reconciliation against a local replica).
    */
  def domainEdges(spark: SparkSession, dir: String): DataFrame = {
    val pages = Tables.load(spark, dir, "documents")
      .selectExpr("doc_id DIV 3 AS g").distinct()
      .selectExpr("g", s"${domSpark("g")} AS dom")
    val gCount = pages.count() // logical page count: metadata-scale scalar
    val links = pages
      .selectExpr("dom AS a", s"(g * $LinkMul + $LinkOff) % $gCount AS h")
      .join(pages.selectExpr("g AS h", "dom AS b"), "h")
      .where("a <> b")
    val big = links.groupBy("a", "b").agg(count(lit(1)).as("w"))
    val wout = big.groupBy("a").agg(sum("w").as("wa"))
    big.join(wout, "a").select("a", "b", "w", "wa")
  }

  def domainRank(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.load(spark, dir, "documents")
      .selectExpr("doc_id DIV 3 AS g").distinct()
      .selectExpr(s"${domSpark("g")} AS node").distinct()
    TextRank.rankLoop(nodes, domainEdges(spark, dir))
      .selectExpr("node AS domain", "r",
        s"CAST(r AS DOUBLE) / ${TextRank.Qp}.0 AS score")
      .orderBy(desc("r"), asc("domain"))
  }

  /** The full rank derivation as a composable CTE chain (final ranks in
    * `r[[TextRank.Iters]]` as (dom, r)) — shared by [[domainRankSql]] and
    * the [[CrawlFrontier]] whole-chain oracle.
    */
  private[pipeline] val domainRankCtes: String = {
    val stages = TextRank.rankStagesSql("dom")
    s"""gset AS (SELECT DISTINCT doc_id // 3 AS g FROM documents),
       |pages AS (SELECT g, ${domDuck("g")} AS dom FROM gset),
       |gc AS (SELECT count(*)::BIGINT AS n FROM gset),
       |links AS (
       |  SELECT p.dom AS a, q.dom AS b
       |  FROM pages p CROSS JOIN gc
       |  JOIN pages q ON q.g = (p.g * $LinkMul + $LinkOff) % gc.n
       |  WHERE p.dom <> q.dom),
       |big AS (SELECT a, b, count(*)::BIGINT AS w FROM links GROUP BY 1, 2),
       |e AS (SELECT big.a, big.b, big.w, wo.wa
       |      FROM big JOIN (SELECT a, sum(w)::BIGINT AS wa
       |                     FROM big GROUP BY 1) wo USING (a)),
       |nodes AS (SELECT DISTINCT dom FROM pages),
       |meta AS (SELECT (15 * (${TextRank.Qp} // count(*))) // 100 AS b15,
       |                ${TextRank.Qp} // count(*) AS base
       |         FROM nodes),
       |r0 AS (SELECT dom, (SELECT base FROM meta) AS r FROM nodes),
       |$stages""".stripMargin
  }

  val domainRankSql: String =
    s"""WITH $domainRankCtes
       |SELECT dom AS domain, r::BIGINT AS r,
       |       r::DOUBLE / ${TextRank.Qp}.0 AS score
       |FROM r${TextRank.Iters} ORDER BY r DESC, domain""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_domain_rank" -> domainRank)

  val oracles: Map[String, String] = Map(
    "pipeline_domain_rank" -> domainRankSql)
}
