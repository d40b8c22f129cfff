package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Chat-template rendering with loss-mask spans — the SFT-data prep op
  * between raw conversations and the trainer: each conversation renders
  * into ONE training sequence under a fixed special-token template, and
  * the trainer needs the exact character spans of every turn plus the
  * loss mask (user/system content is masked; only assistant turns take
  * loss). Off-by-one span arithmetic silently corrupts SFT corpora,
  * which is why the spans are hash-gated and the spec re-slices the
  * rendered string through them.
  *
  * Derived surface: each document's words split into [[CtTurns]]
  * near-equal turns (the last takes the remainder), roles alternating
  * user/assistant under a constant system prompt — the usual synthetic
  * conversation shape. Everything is row-local array arithmetic (split/
  * slice/length), zero shuffles before the presentation sort, and the
  * span algebra is exact integer accumulation replayed by DuckDB.
  */
object ChatTemplate {

  /** Turns per derived conversation. */
  val CtTurns = 4

  /** The template's fixed pieces. */
  val SysPrefix = "<|system|>You are graft."
  val UserTag = "<|user|>"
  val AsstTag = "<|assistant|>"

  private def roleOf(i: Int): String = if (i % 2 == 1) "user" else "assistant"
  private def tagOf(i: Int): String = if (i % 2 == 1) UserTag else AsstTag

  /** The core over (doc_id, text) rows — exposed for the spec. */
  private[pipeline] def render(docs: DataFrame): DataFrame = {
    // turn word ranges: i in 1..CtTurns gets words (i-1)*q+1 .. i*q,
    // the last turn runs to n (q = n DIV CtTurns)
    val turnsExprs = (1 to CtTurns).map { i =>
      val from = s"(($i - 1) * q + 1)"
      val len =
        if (i == CtTurns) s"greatest(0, n - ($i - 1) * q)"
        else "q"
      s"array_join(slice(ws, $from, $len), ' ') AS t$i"
    }
    val withTurns = docs
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "ws", "size(ws) AS n")
      .selectExpr("doc_id", "ws", "n", s"n DIV $CtTurns AS q")
      .selectExpr(Seq("doc_id") ++ turnsExprs: _*)
    // unrolled span accumulation: off(i) = chars before turn i's tag
    val offs = (1 to CtTurns).scanLeft(s"CAST(${SysPrefix.length} AS BIGINT)") {
      case (acc, i) => s"($acc + ${tagOf(i).length} + length(t$i))"
    }
    val turnRows = (1 to CtTurns).map { i =>
      s"""named_struct(
         |  'turn_idx', CAST($i AS BIGINT),
         |  'role', '${roleOf(i)}',
         |  'start_char', ${offs(i - 1)} + ${tagOf(i).length} + 1,
         |  'end_char', ${offs(i - 1)} + ${tagOf(i).length} + length(t$i),
         |  'n_chars', CAST(length(t$i) AS BIGINT),
         |  'loss_masked', ${roleOf(i) != "assistant"})""".stripMargin
    }.mkString("array(", ", ", ")")
    withTurns
      .selectExpr("doc_id", s"${offs(CtTurns)} AS rendered_len",
        s"explode($turnRows) AS t")
      .selectExpr("doc_id", "rendered_len", "t.turn_idx", "t.role",
        "t.start_char", "t.end_char", "t.n_chars", "t.loss_masked")
      .orderBy("doc_id", "turn_idx")
  }

  /** The full rendered sequence for (doc_id, text) rows — what the spec
    * slices with the emitted spans (the entry itself ships spans, not
    * the redundant rendered bytes).
    */
  private[pipeline] def rendered(docs: DataFrame): DataFrame = {
    val turnsExprs = (1 to CtTurns).map { i =>
      val from = s"(($i - 1) * q + 1)"
      val len =
        if (i == CtTurns) s"greatest(0, n - ($i - 1) * q)"
        else "q"
      s"array_join(slice(ws, $from, $len), ' ') AS t$i"
    }
    val body = (1 to CtTurns)
      .map(i => s"'${tagOf(i)}', t$i").mkString(", ")
    docs.selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id", "ws", "size(ws) AS n")
      .selectExpr("doc_id", "ws", "n", s"n DIV $CtTurns AS q")
      .selectExpr(Seq("doc_id") ++ turnsExprs: _*)
      .selectExpr("doc_id", s"concat('$SysPrefix', $body) AS rendered")
  }

  def query(spark: SparkSession, dir: String): DataFrame =
    render(Tables.load(spark, dir, "documents").select("doc_id", "text"))

  val sql: String = {
    val turnsSel = (1 to CtTurns).map { i =>
      val hi = if (i == CtTurns) "n" else s"$i * q"
      s"array_to_string(list_slice(ws, ($i - 1) * q + 1, $hi), ' ') AS t$i"
    }.mkString(",\n       ")
    val offs = (1 to CtTurns).scanLeft(s"${SysPrefix.length}::BIGINT") {
      case (acc, i) => s"($acc + ${tagOf(i).length} + length(t$i))"
    }
    val rows = (1 to CtTurns).map { i =>
      s"""SELECT doc_id, ${offs(CtTurns)}::BIGINT AS rendered_len,
         |       $i::BIGINT AS turn_idx, '${roleOf(i)}' AS role,
         |       (${offs(i - 1)} + ${tagOf(i).length} + 1)::BIGINT AS start_char,
         |       (${offs(i - 1)} + ${tagOf(i).length} + length(t$i))::BIGINT AS end_char,
         |       length(t$i)::BIGINT AS n_chars,
         |       ${roleOf(i) != "assistant"} AS loss_masked
         |FROM t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |q AS (SELECT doc_id, ws, len(ws) AS n, len(ws) // $CtTurns AS q FROM d),
       |t AS (SELECT doc_id,
       |       $turnsSel
       |       FROM q)
       |$rows
       |ORDER BY doc_id, turn_idx""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_chat_template" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_chat_template" -> sql)
}
