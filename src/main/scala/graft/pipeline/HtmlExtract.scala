package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** HTML main-text extraction — the FIRST stage of a real web-crawl
  * training pipeline (r13 verdict item: the repo previously started from
  * clean `documents.text`; a crawl starts from markup).
  *
  * Two halves, both expression-level (no UDFs, shuffle-free until the
  * presentation sort):
  *
  *  - a DERIVED crawl surface: each document wrapped in a deterministic
  *    page template — nav links, an ad block, the real text as two
  *    `<p>` paragraphs, a footer — so the extractor faces genuine
  *    boilerplate-vs-content mixtures while DuckDB can replay the exact
  *    same page bytes (the skewed-BM25 derived-surface convention).
  *  - a GENERIC extractor with no template knowledge: pages split into
  *    line-delimited DOM blocks, inner tags stripped with one regex,
  *    and blocks selected by TEXT DENSITY (stripped-chars per raw-char,
  *    integer per-mille) plus a minimum-length floor — the classic
  *    jusText/boilerpipe block-classification shape. Link-heavy nav
  *    (density ~0.2) and the footer (density ~0.5 despite ≥20 chars of
  *    real text) are rejected; paragraph blocks pass; SHORT paragraphs
  *    (halves under [[MinTextLen]]) are rejected by the floor, so both
  *    verdict classes stay live on every rule.
  *
  * At 100 TB: scan-project + explode per page, no exchange before the
  * presentation sort; density arithmetic is exact integers so the hash
  * oracle replays bit-for-bit.
  */
object HtmlExtract {

  /** Keep threshold: stripped-text per-mille of raw block length. 700
    * splits the template's classes with margin (paragraphs score ≥ 700
    * once ≥ 17 chars; nav ~200, ad ~90, footer ~530).
    */
  val DensityPm = 700L

  /** Minimum stripped-block length (chars) — density alone would keep
    * tag-free short fragments ("BUY NOW SALE" strips to density 1000 in
    * a bare block); real extractors impose a length floor too.
    */
  val MinTextLen = 20L

  private val TagRegex = "<[^>]+>"

  /** The derived page template as a Spark SQL expression over
    * (doc_id, text). Blocks are newline-delimited (corpus text is
    * single-line by construction); the real text splits into two
    * paragraph halves at the integer midpoint.
    */
  private[pipeline] def pageExpr: String = {
    val id = "CAST(doc_id AS STRING)"
    val half = "(length(text) + 1) DIV 2"
    s"""concat(
       |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/d',
       |  $id, '">Doc ', $id, '</a></nav>', chr(10),
       |  '<div class="ad"><a href="https://ads.example/', $id,
       |  '"><b>BUY</b> <b>NOW</b> <b>SALE</b></a></div>', chr(10),
       |  '<p>', substring(text, 1, CAST($half AS INT)), '</p>', chr(10),
       |  '<p>', substring(text, CAST($half AS INT) + 1), '</p>', chr(10),
       |  '<footer><a href="/tos">Terms of Service</a> | (c) 2026 example.org</footer>')""".stripMargin
  }

  /** The identical page in DuckDB's dialect — byte-for-byte equal. */
  private[pipeline] def pageSql: String = {
    val id = "doc_id::VARCHAR"
    val half = "(length(text) + 1) // 2"
    s"""concat(
       |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/d',
       |  $id, '">Doc ', $id, '</a></nav>', chr(10),
       |  '<div class="ad"><a href="https://ads.example/', $id,
       |  '"><b>BUY</b> <b>NOW</b> <b>SALE</b></a></div>', chr(10),
       |  '<p>', substring(text, 1, $half), '</p>', chr(10),
       |  '<p>', substring(text, $half + 1), '</p>', chr(10),
       |  '<footer><a href="/tos">Terms of Service</a> | (c) 2026 example.org</footer>')""".stripMargin
  }

  /** The generic extractor core over (doc_id, page) rows — exposed so
    * [[HtmlExtractSpec]] can drive it with hand-built pages the template
    * never produces (pure-text blocks, nested tags, empty lines). One
    * block per line; `txt` = trimmed tag-stripped content; density in
    * exact per-mille; kept = density ≥ [[DensityPm]] AND length ≥
    * [[MinTextLen]]. Empty blocks score 0.
    */
  def extractBlocks(pages: DataFrame): DataFrame =
    extractBlocksCore(pages).orderBy("doc_id", "block_idx")

  /** The sort-free extraction core — every step row-local (explode +
    * projections, no shuffle, no state), so the SAME frame runs over a
    * streaming source unchanged; [[extractBlocks]] adds the batch
    * presentation sort.
    */
  def extractBlocksCore(pages: DataFrame): DataFrame = {
    val density =
      "CASE WHEN length(raw) = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(length(txt) * 1000 DIV length(raw) AS BIGINT) END"
    pages
      .selectExpr("doc_id", "posexplode(split(page, chr(10))) AS (block_idx, raw)")
      .selectExpr("doc_id", "CAST(block_idx AS BIGINT) AS block_idx", "raw",
        s"trim(regexp_replace(raw, '$TagRegex', '')) AS txt")
      .selectExpr("doc_id", "block_idx",
        "CAST(length(raw) AS BIGINT) AS raw_len",
        "CAST(length(txt) AS BIGINT) AS text_len",
        s"$density AS density_pm",
        s"$density >= $DensityPm AND length(txt) >= $MinTextLen AS kept",
        "txt AS text")
  }

  /** Q — the committed entry: wrap every document in the derived page,
    * run the generic extractor, emit per-block accounting + stripped
    * text. A drifting page grammar, tag-strip regex, or density rule
    * breaks the hash.
    */
  def query(spark: SparkSession, dir: String): DataFrame =
    extractBlocks(
      Tables.load(spark, dir, "documents").selectExpr("doc_id", s"$pageExpr AS page"))

  val sql: String =
    s"""WITH pages AS (SELECT doc_id, $pageSql AS page FROM documents),
       |b0 AS (SELECT doc_id, string_split(page, chr(10)) AS bl FROM pages),
       |bx AS (SELECT doc_id, unnest(range(1, len(bl) + 1)) AS bi, bl FROM b0),
       |bt AS (SELECT doc_id, (bi - 1)::BIGINT AS block_idx, bl[bi] AS raw,
       |              trim(regexp_replace(bl[bi], '$TagRegex', '', 'g')) AS txt
       |       FROM bx)
       |SELECT doc_id, block_idx,
       |       length(raw)::BIGINT AS raw_len,
       |       length(txt)::BIGINT AS text_len,
       |       (CASE WHEN length(raw) = 0 THEN 0
       |             ELSE length(txt) * 1000 // length(raw) END)::BIGINT AS density_pm,
       |       (CASE WHEN length(raw) = 0 THEN 0
       |             ELSE length(txt) * 1000 // length(raw) END) >= $DensityPm
       |         AND length(txt) >= $MinTextLen AS kept,
       |       txt AS text
       |FROM bt ORDER BY doc_id, block_idx""".stripMargin

  /** STATELESS streaming extraction — the ingest-path twin: crawled
    * pages arrive as real micro-batches and every block classifies
    * row-locally inside the batch that carried it (zero state stores,
    * no watermark — spec-asserted), so extraction rides the fetch hot
    * path instead of waiting for a batch job. Documents are staged and
    * replayed, the page wrap + extraction run INSIDE the stream, and
    * the append-mode result must equal the batch entry — it shares
    * [[sql]] as its oracle.
    */
  def streamQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.PacedReplay
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val stage = graft.TempDirs.scoped("html-extract") + "/docs"
    val rowsPerFile = math.max(1L, docs.count() / 4L).toInt
    PacedReplay.stage(docs, Seq("doc_id"), rowsPerFile, stage)
    val out = extractBlocksCore(
      PacedReplay.stream(spark, stage, docs.schema)
        .selectExpr("doc_id", s"$pageExpr AS page"))
    val qn = "graft_stream_html_extract"
    val q = out.writeStream
      .outputMode("append").format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.table(qn).orderBy("doc_id", "block_idx")
  }

  /** Outlink (href) extraction — the OTHER half of what a crawl does
    * with a fetched page: main text feeds the corpus, outlinks feed the
    * frontier (and the [[LinkRank]] domain graph). One
    * `regexp_extract_all` over the raw page per doc, exploded to
    * (doc_id, link_idx, href) with an internal/external verdict — all
    * row-local, no shuffle before the presentation sort. The template
    * plants both classes on every page: 4 site-relative hrefs (nav ×3 +
    * footer) and 1 absolute ad link.
    */
  private[pipeline] val HrefRegex = "href=\"([^\"]*)\""

  def linksQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", s"$pageExpr AS page")
      .selectExpr("doc_id",
        s"posexplode(regexp_extract_all(page, '$HrefRegex', 1)) AS (link_idx, href)")
      .selectExpr("doc_id", "CAST(link_idx AS BIGINT) AS link_idx", "href",
        "href RLIKE '^[A-Za-z]+://' AS is_external")
      .orderBy("doc_id", "link_idx")

  val linksSql: String =
    s"""WITH pages AS (SELECT doc_id, $pageSql AS page FROM documents),
       |hx AS (SELECT doc_id, regexp_extract_all(page, 'href="([^"]*)"', 1) AS hs
       |       FROM pages),
       |l AS (SELECT doc_id, unnest(range(1, len(hs) + 1)) AS i, hs FROM hx)
       |SELECT doc_id, (i - 1)::BIGINT AS link_idx, hs[i] AS href,
       |       regexp_matches(hs[i], '^[A-Za-z]+://') AS is_external
       |FROM l ORDER BY doc_id, link_idx""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_html_extract" -> query,
    "text_html_links" -> linksQuery,
    "stream_html_extract" -> streamQuery)

  val oracles: Map[String, String] = Map(
    "text_html_extract" -> sql,
    "text_html_links" -> linksSql,
    // streamed == batch: the extraction is row-local, so the replayed
    // stream must reproduce the batch table bit-for-bit
    "stream_html_extract" -> sql)
}
