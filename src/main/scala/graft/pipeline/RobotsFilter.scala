package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt politeness filtering — the gate between frontier and
  * fetcher every compliant crawler runs (RFC 9309): per-domain rule
  * groups selected by User-agent, Allow/Disallow PREFIX rules, and the
  * longest-match-wins / allow-wins-ties resolution order (Google's
  * documented semantics).
  *
  * Derived surface (the [[UrlDedup]] convention): every crawled domain
  * publishes a deterministic robots.txt — a `*` group disallowing
  * /about (plus /tos on every 3rd tail domain), the head domain and
  * every 4th tail domain additionally publishing a `graftbot`-specific
  * group (`Disallow: /` + `Allow: /doc`) that OVERRIDES `*` per the RFC's
  * most-specific-group rule; the ad domain publishes none (no robots =
  * allow all). The PARSE is template-blind: lines split, each directive
  * bound to its governing User-agent via a running max over preceding
  * User-agent line indices (a window both engines replay identically —
  * no IGNORE NULLS dependence), prefixes matched with plain
  * `startswith`, the winner the combinable `max(struct(len, allow))`.
  *
  * Longest-match precedence is LOAD-BEARING on this surface: on bot-ruled
  * domains `/doc/...` matches both `Disallow: /` (len 1) and
  * `Allow: /doc` (len 4) — a resolver that applied first-match or
  * disallow-priority would flip every self-link verdict and break the
  * hash.
  *
  * Scale shape: the rule table is DOMAIN-bounded (parsed once from the
  * distinct candidate domains, broadcast); candidates stream through one
  * join + one combinable argmax — no corpus-sized shuffle beyond the
  * frontier candidates themselves.
  */
object RobotsFilter {

  /** The crawler's User-agent (selects the specific group when present). */
  val BotAgent = "graftbot"

  private def tailK(domainCol: String): String =
    s"CAST(regexp_extract($domainCol, 'site([0-9]+)', 1) AS BIGINT)"

  /** The per-domain robots.txt bytes, Spark dialect. Since r16 the
    * surface also publishes `Crawl-delay` (the de-facto RFC 9309
    * extension real crawlers honor): every bot-specific group declares
    * 1 s; every 2nd tail domain's `*` group declares 2 s — so the
    * politeness classes {1 s, 2 s, none} are all live. The directive is
    * invisible to the Allow/Disallow parse (its LIKE filters skip the
    * line), so the rule entries' hashes are unaffected.
    */
  private val robotsTextSpark: String = {
    val k = tailK("domain")
    s"""CASE WHEN domain = 'ads.example' THEN ''
       |ELSE concat(
       |  'User-agent: *', chr(10),
       |  'Disallow: /about', chr(10),
       |  CASE WHEN domain <> 'big.example.com' AND $k % 2 = 0
       |       THEN concat('Crawl-delay: 2', chr(10)) ELSE '' END,
       |  CASE WHEN domain = 'big.example.com'
       |       THEN concat('Disallow: /d', chr(10), 'Allow: /doc', chr(10))
       |       ELSE '' END,
       |  CASE WHEN domain <> 'big.example.com' AND $k % 3 = 0
       |       THEN concat('Disallow: /tos', chr(10)) ELSE '' END,
       |  CASE WHEN domain = 'big.example.com' OR $k % 4 = 0
       |       THEN concat('User-agent: $BotAgent', chr(10),
       |                   'Disallow: /', chr(10), 'Allow: /doc', chr(10),
       |                   'Crawl-delay: 1', chr(10))
       |       ELSE '' END)
       |END""".stripMargin
  }

  /** The identical bytes in DuckDB's dialect (try_cast: the head domain
    * has no site number).
    */
  private val robotsTextSql: String = {
    val k = "try_cast(regexp_extract(domain, 'site([0-9]+)', 1) AS BIGINT)"
    s"""CASE WHEN domain = 'ads.example' THEN ''
       |ELSE concat(
       |  'User-agent: *', chr(10),
       |  'Disallow: /about', chr(10),
       |  CASE WHEN domain <> 'big.example.com' AND $k % 2 = 0
       |       THEN concat('Crawl-delay: 2', chr(10)) ELSE '' END,
       |  CASE WHEN domain = 'big.example.com'
       |       THEN concat('Disallow: /d', chr(10), 'Allow: /doc', chr(10))
       |       ELSE '' END,
       |  CASE WHEN domain <> 'big.example.com' AND $k % 3 = 0
       |       THEN concat('Disallow: /tos', chr(10)) ELSE '' END,
       |  CASE WHEN domain = 'big.example.com' OR $k % 4 = 0
       |       THEN concat('User-agent: $BotAgent', chr(10),
       |                   'Disallow: /', chr(10), 'Allow: /doc', chr(10),
       |                   'Crawl-delay: 1', chr(10))
       |       ELSE '' END)
       |END""".stripMargin
  }

  /** Template-blind parse of (domain, txt) rows into the rule table
    * (domain, agent, is_allow, prefix, plen) — exposed for the spec's
    * hand-built robots files.
    */
  private[pipeline] def parseRules(robots: DataFrame): DataFrame = {
    val lines = robots
      .selectExpr("domain", "posexplode(split(txt, chr(10))) AS (li, line)")
      .selectExpr("domain", "CAST(li AS BIGINT) AS li", "line")
    val withUa = lines.withColumn("ua_idx", expr(
      "max(CASE WHEN line LIKE 'User-agent: %' THEN li END)" +
        " OVER (PARTITION BY domain ORDER BY li)"))
    val uaNames = lines.where("line LIKE 'User-agent: %'")
      .selectExpr("domain", "li AS ua_idx",
        "substring(line, 13) AS agent")
    withUa
      .where("line LIKE 'Allow: %' OR line LIKE 'Disallow: %'")
      .join(uaNames, Seq("domain", "ua_idx"))
      .selectExpr("domain", "agent",
        "line LIKE 'Allow: %' AS is_allow",
        "CASE WHEN line LIKE 'Allow: %' THEN substring(line, 8)" +
          " ELSE substring(line, 11) END AS prefix")
      .selectExpr("domain", "agent", "is_allow", "prefix",
        "CAST(length(prefix) AS BIGINT) AS plen")
  }

  /** Evaluate candidates (lid, domain, path) against the rule table:
    * RFC group selection (the bot-specific group when the domain has
    * one, else `*`), longest-match-wins with allow on ties, no match =
    * allowed. Exposed for the spec.
    */
  private[pipeline] def evaluate(cand: DataFrame,
      rules: DataFrame): DataFrame = {
    val hasBot = rules.groupBy("domain")
      .agg(max(expr(s"agent = '$BotAgent'")).as("has_bot"))
    val picked = rules.join(hasBot, "domain")
      .where(s"agent = CASE WHEN has_bot THEN '$BotAgent' ELSE '*' END")
      .select("domain", "agent", "is_allow", "prefix", "plen")
    val matched = cand
      .join(broadcast(picked), Seq("domain"))
      .where("startswith(path, prefix)")
      .groupBy("lid")
      .agg(max(struct(col("plen"), col("is_allow"), col("prefix"),
        col("agent"))).as("w"))
      .selectExpr("lid", "w.agent AS agent_used", "w.prefix AS rule",
        "w.is_allow AS rule_allow")
    cand.join(matched, Seq("lid"), "left")
      .selectExpr("lid", "domain", "path",
        "coalesce(agent_used, '') AS agent_used",
        "coalesce(rule, '') AS rule",
        "coalesce(rule_allow, true) AS allowed")
  }

  /** Template-blind parse of `Crawl-delay` directives into
    * (domain, agent, delay_ms) — same line grammar and running-max group
    * binding as [[parseRules]]; seconds scale to ms. Exposed for the spec.
    */
  private[graft] def parseDelays(robots: DataFrame): DataFrame = {
    val lines = robots
      .selectExpr("domain", "posexplode(split(txt, chr(10))) AS (li, line)")
      .selectExpr("domain", "CAST(li AS BIGINT) AS li", "line")
    val withUa = lines.withColumn("ua_idx", expr(
      "max(CASE WHEN line LIKE 'User-agent: %' THEN li END)" +
        " OVER (PARTITION BY domain ORDER BY li)"))
    val uaNames = lines.where("line LIKE 'User-agent: %'")
      .selectExpr("domain", "li AS ua_idx", "substring(line, 13) AS agent")
    withUa
      .where("line LIKE 'Crawl-delay: %'")
      .join(uaNames, Seq("domain", "ua_idx"))
      .selectExpr("domain", "agent",
        "CAST(substring(line, 14) AS BIGINT) * 1000 AS delay_ms")
  }

  /** The per-domain SELECTED rule group folded to ONE broadcastable
    * array row (domain, rules: array<struct<plen, is_allow, prefix>>,
    * delay_ms) — the robots artifact a crawler ships to its fetch hot
    * path: after a broadcast join on domain the verdict is the ROW-LOCAL
    * array argmax [[allowedExpr]] (no groupBy — evaluable inside a
    * streaming micro-batch, [[graft.streaming.CrawlAdmit]]), and
    * `delay_ms` is the selected group's Crawl-delay (0 when the group
    * declares none), driving [[graft.streaming.CrawlPoliteness]]'s
    * per-domain fetch spacing. Domains publishing no rules are absent
    * (no robots = allow all, zero delay — the left-join null case).
    */
  private[graft] def ruleTable(spark: SparkSession,
      domains: DataFrame): DataFrame = {
    val robots = domains.selectExpr("domain", s"$robotsTextSpark AS txt")
    val rules = parseRules(robots)
    val hasBot = rules.groupBy("domain")
      .agg(max(expr(s"agent = '$BotAgent'")).as("has_bot"))
    val picked = rules.join(hasBot, "domain")
      .where(s"agent = CASE WHEN has_bot THEN '$BotAgent' ELSE '*' END")
      .groupBy("domain")
      .agg(sort_array(collect_list(
        struct(col("plen"), col("is_allow"), col("prefix")))).as("rules"))
    val delays = parseDelays(robots).join(hasBot, "domain")
      .where(s"agent = CASE WHEN has_bot THEN '$BotAgent' ELSE '*' END")
      .groupBy("domain").agg(max("delay_ms").as("delay_ms"))
    picked.join(delays, Seq("domain"), "left")
      .selectExpr("domain", "rules",
        "coalesce(delay_ms, CAST(0 AS BIGINT)) AS delay_ms")
  }

  /** Row-local longest-match-wins verdict over a `rules` array + `path`
    * column — the same (plen, is_allow, prefix) struct-max tie-break as
    * [[evaluate]]'s aggregate form (agent is constant within a selected
    * group, so dropping it from the struct changes nothing).
    */
  private[graft] val allowedExpr: String =
    "CASE WHEN rules IS NULL THEN true ELSE coalesce(" +
      "array_max(filter(rules, r -> startswith(path, r.prefix))).is_allow," +
      " true) END"

  /** Q — the committed entry: the frontier's candidate outlinks gated by
    * every domain's robots rules. Emits per candidate the path, the
    * governing group, the winning rule, and the verdict — a drifted
    * grammar, group selection, or precedence order breaks the hash.
    */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val cand = CrawlFrontier.candidates(spark, dir)
      .selectExpr("lid", "domain", "canon",
        "regexp_extract(canon, '^[a-z]+://[^/?]+(/[^?]*)?', 1) AS path")
    val rules = parseRules(cand.select("domain").distinct()
      .selectExpr("domain", s"$robotsTextSpark AS txt"))
    evaluate(cand.select("lid", "domain", "path"), rules)
      .join(cand.select("lid", "canon"), "lid")
      .selectExpr("lid DIV 8 AS doc_id", "lid % 8 AS link_idx", "canon",
        "domain", "path", "agent_used", "rule", "allowed")
      .orderBy("doc_id", "link_idx")
  }

  /** Whole-chain DuckDB replay: candidate derivation (the frontier's
    * stage-1 CTEs), robots generation, template-blind parse (same
    * running-max group binding), group selection, and the
    * longest-match/allow-ties argmax via one row_number.
    * [[verdictCtes]] is the chain up to `cand(lid, domain, canon, path)`
    * + `w1(lid, agent, prefix, is_allow)` — shared with
    * [[graft.streaming.CrawlAdmit]]'s composed oracle.
    */
  private[graft] val verdictCtes: String =
    s"""u AS (SELECT doc_id, ${UrlDedup.urlExprSql} AS url FROM documents),
       |cu AS (
       |${UrlDedup.canonSql("u", "doc_id")}),
       |pgs AS (SELECT doc_id, ${HtmlExtract.pageSql} AS page FROM documents),
       |hx AS (SELECT doc_id, regexp_extract_all(page, 'href="([^"]*)"', 1) AS hs
       |       FROM pgs),
       |lx AS (SELECT doc_id, unnest(range(1, len(hs) + 1)) AS i, hs FROM hx),
       |slf AS (SELECT real_id AS doc_id, link_idx, href FROM (
       |          SELECT real_id, ${CrawlFrontier.SelfLinkIdx}::BIGINT AS link_idx,
       |                 ${UrlDedup.urlExprSql} AS href
       |          FROM (SELECT doc_id AS real_id, (doc_id // 3) * 3 AS doc_id
       |                FROM documents))),
       |lk AS (SELECT doc_id, (i - 1)::BIGINT AS link_idx, hs[i] AS href FROM lx
       |       UNION ALL SELECT doc_id, link_idx, href FROM slf),
       |res AS (SELECT lk.doc_id * 8 + lk.link_idx AS lid, lk.href,
       |               CASE WHEN regexp_matches(lk.href, '^[A-Za-z]+://')
       |                    THEN lk.href
       |                    ELSE concat('http://', cu.domain, lk.href)
       |               END AS url
       |        FROM lk JOIN cu ON lk.doc_id = cu.doc_id),
       |cc AS (
       |${UrlDedup.canonSql("res", "lid")}),
       |cand AS (SELECT lid, domain, canon,
       |                coalesce(regexp_extract(canon,
       |                  '^[a-z]+://[^/?]+(/[^?]*)?', 1), '') AS path
       |         FROM cc),
       |doms AS (SELECT DISTINCT domain FROM cand),
       |rob AS (SELECT domain, $robotsTextSql AS txt FROM doms),
       |ln0 AS (SELECT domain, string_split(txt, chr(10)) AS ls FROM rob),
       |ln AS (SELECT domain, unnest(range(1, len(ls) + 1)) - 1 AS li, ls
       |       FROM ln0),
       |lines AS (SELECT domain, li::BIGINT AS li, ls[(li + 1)::INT] AS line
       |          FROM ln),
       |wua AS (SELECT domain, li, line,
       |               max(CASE WHEN line LIKE 'User-agent: %' THEN li END)
       |                 OVER (PARTITION BY domain ORDER BY li) AS ua_idx
       |        FROM lines),
       |uan AS (SELECT domain, li AS ua_idx, substring(line, 13) AS agent
       |        FROM lines WHERE line LIKE 'User-agent: %'),
       |rules AS (
       |  SELECT w.domain, uan.agent,
       |         w.line LIKE 'Allow: %' AS is_allow,
       |         CASE WHEN w.line LIKE 'Allow: %' THEN substring(w.line, 8)
       |              ELSE substring(w.line, 11) END AS prefix
       |  FROM wua w JOIN uan ON w.domain = uan.domain AND w.ua_idx = uan.ua_idx
       |  WHERE w.line LIKE 'Allow: %' OR w.line LIKE 'Disallow: %'),
       |hb AS (SELECT domain, max(agent = '$BotAgent') AS has_bot
       |       FROM rules GROUP BY 1),
       |picked AS (SELECT r.domain, r.agent, r.is_allow, r.prefix,
       |                  length(r.prefix)::BIGINT AS plen
       |           FROM rules r JOIN hb USING (domain)
       |           WHERE r.agent = CASE WHEN hb.has_bot THEN '$BotAgent'
       |                                ELSE '*' END),
       |m AS (SELECT c.lid, p.agent, p.prefix, p.is_allow,
       |             row_number() OVER (PARTITION BY c.lid ORDER BY
       |               p.plen DESC, p.is_allow DESC, p.prefix DESC,
       |               p.agent DESC) AS rk
       |      FROM cand c JOIN picked p ON c.domain = p.domain
       |      WHERE starts_with(c.path, p.prefix)),
       |w1 AS (SELECT lid, agent, prefix, is_allow FROM m WHERE rk = 1)""".stripMargin

  val sql: String =
    s"""WITH $verdictCtes
       |SELECT (c.lid // 8)::BIGINT AS doc_id, (c.lid % 8)::BIGINT AS link_idx,
       |       c.canon, c.domain, c.path,
       |       coalesce(w1.agent, '') AS agent_used,
       |       coalesce(w1.prefix, '') AS rule,
       |       coalesce(w1.is_allow, true) AS allowed
       |FROM cand c LEFT JOIN w1 USING (lid)
       |ORDER BY doc_id, link_idx""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_robots_filter" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_robots_filter" -> sql)
}
