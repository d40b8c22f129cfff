package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Operator/function families beyond ExtendedQueries' core relational set
  * (SURVEY.md §2.2 "absent in reference, built-in in Spark"): pivot,
  * explode/lateral, non-equi range join, and the date + array scalar
  * function suites. Each is oracle-checked; results flatten to plain
  * columns (the driver hash compare needs flat, dialect-stable values —
  * dates travel as ISO strings, counts as BIGINT).
  */
object FunctionSuites {

  /** PIVOT — wide per-priority revenue by order status. Spark's
    * `groupBy().pivot(values).agg()` compiles to ONE two-phase aggregate
    * (no per-value scans) when the pivot values are explicit — which is
    * also the 100 TB rule: never let pivot infer values with an extra
    * distinct pass over the fact table. Oracle = ANSI conditional
    * aggregation (the pivot's relational desugaring).
    */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double"))
      .select(col("pri"),
        coalesce(col("F"), lit(0.0)).as("spend_f"),
        coalesce(col("O"), lit(0.0)).as("spend_o"),
        coalesce(col("P"), lit(0.0)).as("spend_p"))
      .orderBy("pri")

  val pivotSql: String =
    """SELECT o_orderpriority AS pri,
      |       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS spend_f,
      |       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
      |                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS spend_o,
      |       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
      |                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS spend_p
      |FROM orders GROUP BY o_orderpriority ORDER BY pri""".stripMargin

  /** Explode / lateral — tokenize `documents.text`, explode WITH POSITION,
    * keep each doc's first 5 tokens, re-aggregate. The generate sits
    * between two narrow projections (no shuffle until the final groupBy);
    * the posexplode is Spark's LATERAL VIEW — one pass, output rows ≤ 5/doc.
    */
  def explodeLateral(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (pos, tok)")
      .where("pos < 5")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_head"),
        sum(length(col("tok"))).as("head_chars"),
        max(when(col("pos") === 0, col("tok"))).as("first_tok"))
      .orderBy("doc_id")

  val explodeLateralSql: String =
    """SELECT doc_id, count(*)::BIGINT AS n_head,
      |       sum(length(tok))::BIGINT AS head_chars,
      |       max(CASE WHEN pos = 0 THEN tok END) AS first_tok
      |FROM (SELECT doc_id, i - 1 AS pos, t[i] AS tok
      |      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |           LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i))
      |WHERE pos < 5
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Non-equi RANGE join — classify every order into a literal price-band
    * dimension via `lo <= price < hi`. Spark picks BroadcastNestedLoopJoin:
    * with a small broadcast side that is THE scalable plan (each executor
    * scans its fact partition once against an in-memory 4-row table; no
    * shuffle of the fact). If the band table were large you'd bucketize the
    * join key instead — that shape is x_skew_join's; this entry pins the
    * broadcast-range case.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(Seq(
      ("small", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("large", 150000.0, 300000.0),
      ("huge", 300000.0, 1e9))).toDF("band", "lo", "hi")
    Tables.load(spark, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).cast("double").as("spend"))
      .orderBy("band")
  }

  val rangeJoinSql: String =
    """SELECT band, count(*)::BIGINT AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders
      |JOIN (VALUES ('small', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
      |             ('large', 150000.0, 300000.0), ('huge', 300000.0, 1000000000.0))
      |     AS bands(band, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  /** Date/time function suite — add, diff, truncation, last-day, fields.
    * Per-row only (scales as a scan). Cross-engine notes: result DATEs
    * travel as ISO-8601 strings; DuckDB's dayofweek is 0-based Sunday,
    * Spark's 1-based — the oracle shifts by one.
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").selectExpr(
      "o_orderkey",
      "CAST(o_orderdate AS STRING) AS d",
      "CAST(date_add(o_orderdate, 30) AS STRING) AS d_plus30",
      "CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT) AS days_since_95",
      "CAST(trunc(o_orderdate, 'month') AS STRING) AS month_start",
      "CAST(last_day(o_orderdate) AS STRING) AS month_end",
      "CAST(dayofweek(o_orderdate) AS BIGINT) AS dow",
      "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy",
      "CAST(quarter(o_orderdate) AS BIGINT) AS qtr"
    ).orderBy("o_orderkey")

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(o_orderdate AS VARCHAR) AS d,
      |       CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS d_plus30,
      |       date_diff('day', DATE '1995-01-01', o_orderdate)::BIGINT AS days_since_95,
      |       CAST(date_trunc('month', o_orderdate)::DATE AS VARCHAR) AS month_start,
      |       CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
      |       (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
      |       dayofyear(o_orderdate)::BIGINT AS doy,
      |       quarter(o_orderdate)::BIGINT AS qtr
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Array function suite over tokenized text — distinct/sort/contains/
    * slice/element access, flattened to scalars. Pure per-row expression
    * work: zero shuffles except the output order.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr(
        "doc_id",
        "CAST(size(t) AS BIGINT) AS n_toks",
        "CAST(size(array_distinct(t)) AS BIGINT) AS n_uniq",
        "array_contains(t, 'the') AS has_the",
        "element_at(t, 1) AS tok1",
        "element_at(sort_array(array_distinct(t)), 1) AS tok_min",
        "concat_ws('-', slice(t, 1, 3)) AS head3")
      .orderBy("doc_id")

  val arrayFuncsSql: String =
    """SELECT doc_id,
      |       len(t)::BIGINT AS n_toks,
      |       len(list_distinct(t))::BIGINT AS n_uniq,
      |       list_contains(t, 'the') AS has_the,
      |       t[1] AS tok1,
      |       list_sort(list_distinct(t))[1] AS tok_min,
      |       array_to_string(t[1:3], '-') AS head3
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Higher-order functions — lambda expressions over arrays
    * (filter/aggregate-fold/exists/forall/transform), the expression-level
    * alternative to per-row UDFs. What makes them scale-preferable is NOT
    * codegen — HOF lambdas evaluate interpreted (the Project carrying them
    * sits outside the WholeStageCodegen span; verified in the spec) — but
    * that they stay Catalyst expressions over Tungsten rows: the optimizer
    * sees through them (pruning/pushdown still reach the scan), and there
    * is no serialize-to-object or external-runtime boundary, which is
    * where UDF pipelines actually bleed at 100 TB.
    */
  def hofFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr(
        "doc_id",
        "CAST(size(filter(t, x -> length(x) > 5)) AS BIGINT) AS n_long",
        "aggregate(t, 0L, (a, x) -> a + length(x)) AS total_chars",
        "exists(t, x -> length(x) > 10) AS any_huge",
        "forall(t, x -> length(x) > 0) AS all_nonempty",
        "CAST(array_max(transform(t, x -> length(x))) AS BIGINT) AS max_len")
      .orderBy("doc_id")

  val hofFuncsSql: String =
    """SELECT doc_id,
      |       len(list_filter(t, x -> length(x) > 5))::BIGINT AS n_long,
      |       CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_chars,
      |       len(list_filter(t, x -> length(x) > 10)) > 0 AS any_huge,
      |       len(list_filter(t, x -> length(x) = 0)) = 0 AS all_nonempty,
      |       CAST(list_max(list_transform(t, x -> length(x))) AS BIGINT) AS max_len
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Unpivot (wide → long), [[pivot]]'s inverse: the 4 lineitem measures
    * melt into (metric, val) rows via the native `unpivot` operator — a
    * generate-side expand, NOT 4 self-union scans (one pass over the input,
    * 4 output rows per input row), then one combinable aggregate. Sums are
    * DECIMAL(18,2)-exact before the final double cast, so accumulation
    * order can't shift the result cross-engine. The oracle spells the same
    * melt as UNION ALL, the portable form.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy("l_returnflag", "metric")
      .agg(
        count(lit(1)).as("n"),
        sum(col("val").cast("decimal(18,2)")).cast("double").as("total"),
        min("val").as("mn"), max("val").as("mx"))
      .orderBy("l_returnflag", "metric")

  val unpivotMetricsSql: String =
    """WITH u AS (
      |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      |SELECT l_returnflag, metric, count(*)::BIGINT AS n,
      |       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |       min(val) AS mn, max(val) AS mx
      |FROM u GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_unpivot" -> unpivotMetrics,
    "x_pivot" -> pivot,
    "x_explode" -> explodeLateral,
    "x_range_join" -> rangeJoin,
    "x_date_funcs" -> dateFuncs,
    "x_array_funcs" -> arrayFuncs,
    "x_hof_funcs" -> hofFuncs)

  val oracles: Map[String, String] = Map(
    "x_unpivot" -> unpivotMetricsSql,
    "x_pivot" -> pivotSql,
    "x_explode" -> explodeLateralSql,
    "x_range_join" -> rangeJoinSql,
    "x_date_funcs" -> dateFuncsSql,
    "x_array_funcs" -> arrayFuncsSql,
    "x_hof_funcs" -> hofFuncsSql)
}
