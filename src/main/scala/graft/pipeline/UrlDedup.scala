package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Canonical-URL dedup + per-domain caps — the standard crawl-pipeline
  * ops between fetching and text extraction (r13 verdict item 6): a
  * crawl sees the same page under many SURFACE urls (scheme/host case,
  * default ports, trailing slashes, query-parameter order), and head
  * domains contribute orders of magnitude more pages than the tail, so
  * production pipelines (a) key dedup on a normalized canonical URL and
  * (b) cap documents per registrable domain.
  *
  * Derived surface (the skewed-BM25 convention — DuckDB replays the
  * exact bytes): every 3 consecutive doc_ids form one LOGICAL page
  * (g = doc_id div 3) rendered as 3 surface variants — case-mangled
  * scheme/host, an explicit `:80`, a trailing slash, swapped query
  * order; 60% of pages land on ONE head domain (g % 5 < 3), the rest
  * spread over 97 tail domains; every 11th page has no query string.
  *
  * Canonicalizer (template-blind expressions, both engines): lowercase
  * scheme and host, drop scheme-default ports (http:80 / https:443),
  * strip trailing path slashes, sort query parameters. Dedup keeps the
  * MIN doc_id per canonical URL.
  *
  * Per-domain cap at 100 TB: a plain `row_number() OVER (PARTITION BY
  * domain ...)` funnels the head domain's entire population through one
  * task — the classic skew blowup. The cap here is SALTED two-phase:
  * phase 1 ranks within (domain, doc_id % [[UrlSalts]]) and keeps only
  * per-salt top-[[DomainCap]] (a superset of the global top — ranking
  * is by doc_id, so the global top-cap rows are each within their
  * salt's top-cap); phase 2's window then sees ≤ Salts·Cap rows per
  * domain, bounded regardless of skew. The oracle replays the simple
  * single-window form, which the two-phase plan provably equals.
  */
object UrlDedup {

  /** Max kept documents per domain after canonical dedup. */
  val DomainCap = 40

  /** Salt fan-out of the two-phase cap. */
  val UrlSalts = 16

  /** The derived surface in Spark's dialect as a function of the id
    * expression — [[graft.streaming.CrawlAdmit]]'s row-local self-link
    * derivation substitutes `(doc_id DIV 3) * 3` (the canonical
    * variant-0 id) without a projection rename.
    */
  private[graft] def urlExprSparkFor(id: String): String = {
    val g = s"CAST(($id) DIV 3 AS BIGINT)"
    s"""concat(
       |  CASE ($id) % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'Http' END,
       |  '://',
       |  CASE WHEN $g % 5 < 3 THEN
       |    CASE ($id) % 3 WHEN 0 THEN 'big.example.com'
       |                    WHEN 1 THEN 'Big.Example.Com'
       |                    ELSE 'BIG.EXAMPLE.COM' END
       |  ELSE concat(
       |    CASE ($id) % 3 WHEN 0 THEN 'site' WHEN 1 THEN 'Site' ELSE 'SITE' END,
       |    CAST($g % 97 AS STRING), '.example.org') END,
       |  CASE WHEN ($id) % 3 = 1 THEN ':80' ELSE '' END,
       |  '/doc/', CAST($g AS STRING),
       |  CASE WHEN ($id) % 3 = 2 THEN '/' ELSE '' END,
       |  CASE WHEN $g % 11 = 0 THEN ''
       |       WHEN ($id) % 3 = 0 THEN
       |         concat('?b=', CAST($g % 3 AS STRING), '&a=', CAST($g % 7 AS STRING))
       |       ELSE
       |         concat('?a=', CAST($g % 7 AS STRING), '&b=', CAST($g % 3 AS STRING))
       |  END)""".stripMargin
  }

  /** The derived surface in Spark's dialect: (doc_id, url). */
  private[graft] val urlExprSpark: String = urlExprSparkFor("doc_id")

  /** The identical surface in DuckDB's dialect ([[CrawlFrontier]] composes
    * it into the whole-chain frontier oracle).
    */
  private[pipeline] val urlExprSql: String = {
    val g = "(doc_id // 3)"
    s"""concat(
       |  CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'Http' END,
       |  '://',
       |  CASE WHEN $g % 5 < 3 THEN
       |    CASE doc_id % 3 WHEN 0 THEN 'big.example.com'
       |                    WHEN 1 THEN 'Big.Example.Com'
       |                    ELSE 'BIG.EXAMPLE.COM' END
       |  ELSE concat(
       |    CASE doc_id % 3 WHEN 0 THEN 'site' WHEN 1 THEN 'Site' ELSE 'SITE' END,
       |    ($g % 97)::VARCHAR, '.example.org') END,
       |  CASE WHEN doc_id % 3 = 1 THEN ':80' ELSE '' END,
       |  '/doc/', $g::VARCHAR,
       |  CASE WHEN doc_id % 3 = 2 THEN '/' ELSE '' END,
       |  CASE WHEN $g % 11 = 0 THEN ''
       |       WHEN doc_id % 3 = 0 THEN
       |         concat('?b=', ($g % 3)::VARCHAR, '&a=', ($g % 7)::VARCHAR)
       |       ELSE
       |         concat('?a=', ($g % 7)::VARCHAR, '&b=', ($g % 3)::VARCHAR)
       |  END)""".stripMargin
  }

  // template-blind canonicalization pieces (identical regexes, both
  // engines return '' on no-match)
  private val SchemeRe = "^([A-Za-z]+)://"
  private val HostRe = "^[A-Za-z]+://([^/?:]+)"
  private val PortRe = "^[A-Za-z]+://[^/?:]+:([0-9]+)"
  private val PathRe = "^[A-Za-z]+://[^/?]+([^?]*)"

  /** The canonicalizer + keep-policy core over (doc_id, url) rows —
    * exposed for [[UrlDedupSpec]]'s hand-built urls. Output per input
    * row: the canonical form, its domain, whether this row is the
    * canonical KEEPER (min doc_id of its canonical group), and whether
    * it survives the per-domain cap.
    */
  /** The ROW-LOCAL half of the canonicalizer — parse + normalize to
    * (doc_id, url, domain, canon), no window, no shuffle — so it runs
    * unchanged over a streaming frame ([[graft.streaming.DomainQuota]]).
    */
  def canonCols(urls: DataFrame): DataFrame = canonColsKeep(urls, Nil)

  /** [[canonCols]] with extra passthrough columns appended after `canon`
    * (the [[CrawlFrontier]] composition keeps the raw href alongside the
    * canonical form without a join-back).
    */
  private[graft] def canonColsKeep(urls: DataFrame,
      extra: Seq[String]): DataFrame = {
    val parts = urls.selectExpr(Seq("doc_id", "url") ++ extra ++ Seq(
      s"lower(regexp_extract(url, '$SchemeRe', 1)) AS scheme",
      s"lower(regexp_extract(url, '$HostRe', 1)) AS host",
      s"regexp_extract(url, '$PortRe', 1) AS port",
      s"regexp_replace(regexp_extract(url, '$PathRe', 1), '/+$$', '') AS path",
      "CASE WHEN position('?' IN url) > 0" +
        " THEN substring(url, position('?' IN url) + 1) ELSE '' END AS q"): _*)
    parts.selectExpr(Seq("doc_id", "url", "host AS domain",
      s"""concat(scheme, '://', host,
         |  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
         |            OR (scheme = 'https' AND port = '443')
         |       THEN '' ELSE concat(':', port) END,
         |  path,
         |  CASE WHEN q = '' THEN ''
         |       ELSE concat('?', array_join(array_sort(split(q, '&')), '&'))
         |  END) AS canon""".stripMargin) ++ extra: _*)
  }

  /** The derived crawl surface (doc_id, url) for `dir` — shared by the
    * batch entry and the streaming quota twin.
    */
  def derivedUrls(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", s"$urlExprSpark AS url")

  def canonicalize(urls: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val canon = canonCols(urls)
    val keepers = canon
      .withColumn("krk", expr(
        "row_number() OVER (PARTITION BY canon ORDER BY doc_id)"))
      .withColumn("is_keeper", expr("krk = 1")).drop("krk")
    // salted two-phase per-domain cap over the keepers (rank by doc_id)
    val phase1 = keepers.where("is_keeper")
      .withColumn("srk", expr(
        s"row_number() OVER (PARTITION BY domain, doc_id % $UrlSalts" +
          " ORDER BY doc_id)"))
      .where(s"srk <= $DomainCap")
    val capped = phase1
      .withColumn("drk", expr(
        "row_number() OVER (PARTITION BY domain ORDER BY doc_id)"))
      .where(s"drk <= $DomainCap")
      .select(col("doc_id"), lit(true).as("kept_cap"))
    keepers.join(capped, Seq("doc_id"), "left")
      .selectExpr("doc_id", "url", "canon", "domain", "is_keeper",
        "coalesce(kept_cap, false) AS kept_cap")
      .orderBy("doc_id")
  }

  /** Q — the committed entry: the skewed derived surface through the
    * canonicalizer, dedup and cap. Hash-gates the surface grammar, every
    * normalization rule, the keeper policy, and the cap.
    */
  def query(spark: SparkSession, dir: String): DataFrame =
    canonicalize(derivedUrls(spark, dir))

  /** The canonicalizer in DuckDB's dialect, as a composable SELECT over a
    * relation `rel` carrying ($idCol, url) — produces ($idCol, url,
    * domain, canon). The SQL twin of [[canonCols]]; [[sql]] and the
    * [[CrawlFrontier]] oracle both build on it so the two entries can
    * never drift.
    */
  private[pipeline] def canonSql(rel: String, idCol: String,
      extra: String = ""): String =
    s"""SELECT $idCol, url, host AS domain,
       |       concat(scheme, '://', host,
       |         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |                   OR (scheme = 'https' AND port = '443')
       |              THEN '' ELSE concat(':', port) END,
       |         path,
       |         CASE WHEN q = '' THEN ''
       |              ELSE concat('?', array_to_string(
       |                     list_sort(string_split(q, '&')), '&'))
       |         END) AS canon$extra
       |FROM (
       |  SELECT $idCol, url$extra,
       |         lower(regexp_extract(url, '$SchemeRe', 1)) AS scheme,
       |         lower(regexp_extract(url, '$HostRe', 1)) AS host,
       |         regexp_extract(url, '$PortRe', 1) AS port,
       |         regexp_replace(regexp_extract(url, '$PathRe', 1), '/+$$', '') AS path,
       |         CASE WHEN position('?' IN url) > 0
       |              THEN substring(url, position('?' IN url) + 1)
       |              ELSE '' END AS q
       |  FROM $rel)""".stripMargin

  val sql: String =
    s"""WITH u AS (SELECT doc_id, $urlExprSql AS url FROM documents),
       |c AS (
       |${canonSql("u", "doc_id")}),
       |k AS (
       |  SELECT doc_id, url, canon, domain,
       |         row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1
       |           AS is_keeper
       |  FROM c),
       |capped AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |           row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS drk
       |    FROM k WHERE is_keeper)
       |  WHERE drk <= $DomainCap)
       |SELECT k.doc_id, k.url, k.canon, k.domain, k.is_keeper,
       |       (capped.doc_id IS NOT NULL) AS kept_cap
       |FROM k LEFT JOIN capped ON k.doc_id = capped.doc_id
       |ORDER BY k.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_url_dedup" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_url_dedup" -> sql)
}
