package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Token-ID-level sequence packing — the hand-off between "corpus ops"
  * and what a pretraining dataloader actually reads (r14 verdict item 3):
  * [[CorpusOps.packSequences]] packs by WHITESPACE-token counts; the real
  * trainer packs BPE TOKEN IDS into fixed-[[SeqLen]] training sequences
  * with an EOS separator after every document, and keeps per-sequence
  * (doc_id, span) provenance so any sequence can be traced back to its
  * source bytes.
  *
  * Composition — every stage reuses the shared single-definition
  * machinery:
  *  - the tokenizer model is [[Tokenizer.trainBigCore]]'s 256-merge run
  *    (the `text_bpe_encode_256` artifact): per-word final symbol
  *    sequences, vocabulary-bounded;
  *  - token ids are the final symbols sorted ascending (id 0..V−1 — the
  *    deterministic vocab file every tokenizer ships), EOS = V;
  *  - per-word ID SEQUENCES broadcast onto the corpus words (the
  *    dictionary-join shape of [[Tokenizer.bpeEncodeBig]] carrying lists
  *    instead of counts), flattened per document in word order, EOS
  *    appended;
  *  - packing is SHARD-LOCAL ([[CorpusOps.packSequences]]' contract): the
  *    running token cumsum is a window per shard — [[Shards]] parallel
  *    streams here, thousands at 100 TB, never a global single-partition
  *    cumsum.
  *
  * Output grain: one row per (sequence, document span) — sequence
  * `seq_id` of shard `shard` takes `span_len` tokens starting at
  * `tok_start` of `doc_id`'s token stream (EOS included at stream end),
  * landing at `pos_in_seq`. `span_idsum` (the BIGINT sum of the span's
  * token ids) puts the ACTUAL IDS under the hash without emitting
  * per-token rows: one drifted merge, symbol id, flatten order, or
  * boundary moves some span's sum. [[graft.TokenPackSpec]] pins
  * sequence-length exactness (every non-final sequence sums to exactly
  * [[SeqLen]]) and the provenance round-trip (per doc, spans
  * reconstruct the full stream: contiguous, gap-free, idsum-complete).
  *
  * At 100 TB: the model + id table are vocabulary-bounded broadcasts,
  * the corpus pass is explode → dictionary join → per-doc flatten
  * (doc-bounded lists, the [[CorpusOps.chunkDocuments]] bound), the
  * cumsum is per-shard, span explode is row-local — no corpus-sized
  * driver state and no global shuffle beyond the per-shard window and
  * the presentation sort.
  */
object TokenPack {

  /** Fixed training-sequence length (tokens). */
  val SeqLen = 128L

  /** Independent pack streams (the [[CorpusOps.PackShards]] shape). */
  val Shards = 8L

  /** The trained word → token-id-sequence table + EOS id for `dir`:
    * ids are ranks of the final symbols sorted ascending; EOS = |V|.
    * Driver-side work is vocabulary-sized only.
    */
  private def wordIdTable(spark: SparkSession, dir: String)
      : (DataFrame, Long) = {
    import spark.implicits._
    val seg = Tokenizer.trainBigCore(spark, dir)._2
    val symId: Map[String, Long] = seg.iterator.flatMap(_._2).toSeq
      .distinct.sorted.zipWithIndex.map { case (s, i) => (s, i.toLong) }.toMap
    val eosId = symId.size.toLong
    val rows = seg.toSeq.map { case (w, syms) => (w, syms.map(symId)) }
    (rows.toDF("word", "ids"), eosId)
  }

  /** Per-document token-id stream: (doc_id, ids, dlen) with EOS appended
    * — flatten of the word id sequences in word order. Documents with no
    * non-empty words emit nothing (both engines agree).
    */
  private def docStreams(spark: SparkSession, dir: String): DataFrame = {
    val (wordIds, eosId) = wordIdTable(spark, dir)
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "posexplode(split(text, ' ')) AS (wpos, w0)")
      .where("w0 <> ''")
      .selectExpr("doc_id", "wpos",
        s"concat(w0, '~', CAST(doc_id % ${Tokenizer.VocabMult} AS STRING))" +
          " AS word")
      .join(broadcast(wordIds), "word") // vocabulary is corpus-complete
      .groupBy("doc_id")
      // doc-bounded collect_list: the per-doc id stream, word order
      // restored by the sort key (the chunking per-row length bound)
      .agg(expr("flatten(transform(array_sort(collect_list(" +
        "struct(wpos, ids))), s -> s.ids))").as("ids0"))
      .selectExpr("doc_id",
        s"concat(ids0, array(CAST($eosId AS BIGINT))) AS ids",
        "CAST(size(ids0) + 1 AS BIGINT) AS dlen")
  }

  /** Q — the committed entry: train, encode, pack; one row per
    * (sequence, doc span).
    */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docStreams(spark, dir)
      .selectExpr("doc_id", s"doc_id % $Shards AS shard", "ids", "dlen")
      .withColumn("cum", sum("dlen").over(w))
      .selectExpr("doc_id", "shard", "ids", "dlen", "cum - dlen AS goff")
      .selectExpr("doc_id", "shard", "ids", "dlen", "goff",
        s"explode(sequence(goff div $SeqLen, (goff + dlen - 1) div $SeqLen))" +
          " AS seq_id")
      .selectExpr("shard", "seq_id", "doc_id",
        s"greatest(goff, seq_id * $SeqLen) - seq_id * $SeqLen AS pos_in_seq",
        s"greatest(CAST(0 AS BIGINT), seq_id * $SeqLen - goff) AS tok_start",
        s"least(dlen, (seq_id + 1) * $SeqLen - goff)" +
          s" - greatest(CAST(0 AS BIGINT), seq_id * $SeqLen - goff) AS span_len",
        "ids", "dlen")
      .selectExpr("shard", "seq_id", "doc_id", "pos_in_seq", "tok_start",
        "span_len",
        "aggregate(slice(ids, CAST(tok_start + 1 AS INT), " +
          "CAST(span_len AS INT)), CAST(0 AS BIGINT), (a, v) -> a + v)" +
          " AS span_idsum",
        "dlen AS doc_tokens")
      .orderBy("shard", "seq_id", "pos_in_seq")
  }

  /** Whole-chain DuckDB replay: the 256 unrolled training stages
    * ([[Tokenizer.bigBaseSql]] — shared verbatim with the encode oracle),
    * symbol-id assignment, per-word id lists, per-doc flatten + EOS,
    * per-shard cumsum, span explode, and the span id-sum over a list
    * slice.
    */
  val sql: String = {
    val vm = Tokenizer.VocabMult
    s"""WITH ${Tokenizer.bigBaseSql},
       |wsyms AS MATERIALIZED (
       |  SELECT word, string_split(substring(syms, 2, length(syms) - 2),
       |                            '><') AS sl
       |  FROM w${Tokenizer.MergesBig}),
       |sid AS MATERIALIZED (
       |  SELECT sym, (row_number() OVER (ORDER BY sym) - 1)::BIGINT AS id
       |  FROM (SELECT DISTINCT unnest(sl) AS sym FROM wsyms)),
       |eos AS (SELECT count(*)::BIGINT AS eid FROM sid),
       |wexp AS (SELECT word, unnest(sl) AS sym,
       |                unnest(range(1, len(sl) + 1)) AS spos
       |         FROM wsyms),
       |wid AS MATERIALIZED (
       |  SELECT word, list(id ORDER BY spos) AS ids
       |  FROM (SELECT we.word, we.spos, sd.id
       |        FROM wexp we JOIN sid sd USING (sym))
       |  GROUP BY word),
       |toks AS (
       |  SELECT doc_id, wpos, w0 || '~' || (doc_id % $vm)::VARCHAR AS word
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w0,
       |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS wpos
       |        FROM documents)
       |  WHERE w0 <> ''),
       |dstream AS MATERIALIZED (
       |  SELECT doc_id, flatten(list(ids ORDER BY wpos)) AS ids0
       |  FROM toks JOIN wid USING (word) GROUP BY doc_id),
       |docs2 AS (SELECT doc_id,
       |                 list_append(ids0, (SELECT eid FROM eos)) AS ids,
       |                 (len(ids0) + 1)::BIGINT AS dlen
       |          FROM dstream),
       |offs AS (SELECT doc_id, doc_id % $Shards AS shard, ids, dlen,
       |                (sum(dlen) OVER (PARTITION BY doc_id % $Shards
       |                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING))::BIGINT
       |                  - dlen AS goff
       |         FROM docs2),
       |spans AS (SELECT doc_id, shard, ids, dlen, goff,
       |                 unnest(range(goff // $SeqLen,
       |                              (goff + dlen - 1) // $SeqLen + 1))::BIGINT
       |                   AS seq_id
       |          FROM offs),
       |cut AS (SELECT shard, seq_id, doc_id, ids, dlen,
       |               greatest(goff, seq_id * $SeqLen) - seq_id * $SeqLen
       |                 AS pos_in_seq,
       |               greatest(0, seq_id * $SeqLen - goff) AS tok_start,
       |               least(dlen, (seq_id + 1) * $SeqLen - goff)
       |                 - greatest(0, seq_id * $SeqLen - goff) AS span_len
       |        FROM spans)
       |SELECT shard, seq_id, doc_id, pos_in_seq::BIGINT AS pos_in_seq,
       |       tok_start::BIGINT AS tok_start, span_len::BIGINT AS span_len,
       |       coalesce(list_sum(ids[(tok_start + 1)::INT
       |                             : (tok_start + span_len)::INT]),
       |                0)::BIGINT AS span_idsum,
       |       dlen AS doc_tokens
       |FROM cut ORDER BY shard, seq_id, pos_in_seq""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pack_tokens" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_pack_tokens" -> sql)
}
