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
  private[pipeline] def wordIdTable(spark: SparkSession, dir: String)
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
    * non-empty words emit nothing (both engines agree). Exposed inside the
    * pipeline package: [[SubstringDedup]]'s token-level pass and the
    * best-fit packer consume the same streams.
    */
  private[pipeline] def docStreams(spark: SparkSession, dir: String): DataFrame = {
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

  /** The DuckDB CTE chain up to `docs2(doc_id, ids, dlen)` — the 256
    * unrolled training stages ([[Tokenizer.bigBaseSql]], shared verbatim
    * with the encode oracle), symbol-id assignment, per-word id lists,
    * per-doc flatten + EOS.
    * Shared verbatim by [[sql]], the token-level substring-dedup oracle
    * ([[SubstringDedup.substringDedupTokensSql]]) and the best-fit packer
    * oracle ([[bestFitSql]]), so the three entries can never disagree on
    * what the id streams ARE.
    */
  private[pipeline] val docsCtes: String = {
    val vm = Tokenizer.VocabMult
    s"""${Tokenizer.bigBaseSql},
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
       |docs2 AS MATERIALIZED (SELECT doc_id,
       |                 list_append(ids0, (SELECT eid FROM eos)) AS ids,
       |                 (len(ids0) + 1)::BIGINT AS dlen
       |          FROM dstream)""".stripMargin
  }

  /** Whole-chain DuckDB replay: [[docsCtes]] + per-shard cumsum, span
    * explode, and the span id-sum over a list slice.
    */
  val sql: String =
    s"""WITH $docsCtes,
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

  // ----------------------------------------------------- best-fit packing

  /** A packing item: one whole document (or one SeqLen-bounded chunk of a
    * long document) entering the bin packer.
    */
  private[pipeline] case class PackItem(shard: Long, doc_id: Long,
      tok_start: Long, ilen: Long)

  /** A packed item: its bin and fill offset within the bin. */
  private[pipeline] case class PackedItem(shard: Long, bin_id: Long,
      pos_in_bin: Long, doc_id: Long, tok_start: Long, span_len: Long)

  /** First-fit-decreasing over one shard's items — the classic
    * truncation-free sequence packer (Krell et al. 2021's shortest-pack
    * family; FFD is its deterministic textbook member): items sorted by
    * (length DESC, doc_id, tok_start), each placed into the LOWEST-indexed
    * bin with room, else a new bin; bins fill left to right so
    * `pos_in_bin` is the running fill at placement. Deterministic given
    * the item set — no randomness, no partition-order dependence — which
    * is what lets DuckDB replay the exact assignment. Exposed for
    * [[graft.TokenPackSpec]]'s waste comparison.
    */
  private[pipeline] def ffdPack(items: Seq[PackItem]): Seq[PackedItem] = {
    val sorted = items.sortBy(i => (-i.ilen, i.doc_id, i.tok_start))
    val rems = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { it =>
      val j = rems.indexWhere(_ >= it.ilen)
      if (j < 0) {
        rems += SeqLen - it.ilen
        PackedItem(it.shard, rems.size - 1L, 0L, it.doc_id, it.tok_start,
          it.ilen)
      } else {
        val pos = SeqLen - rems(j)
        rems(j) -= it.ilen
        PackedItem(it.shard, j.toLong, pos, it.doc_id, it.tok_start, it.ilen)
      }
    }.toSeq
  }

  /** The packing items over a [[docStreams]] frame: docs at most
    * [[SeqLen]] tokens enter whole; longer docs split into
    * [[SeqLen]]-sized chunks plus a remainder (full chunks trivially fill
    * a bin each under the same FFD, so one uniform pass handles both).
    */
  private def packItems(streams: DataFrame): DataFrame =
    streams
      .selectExpr("doc_id", s"doc_id % $Shards AS shard", "dlen")
      .selectExpr("shard", "doc_id", "dlen",
        s"explode(sequence(0, (dlen - 1) div $SeqLen)) AS k")
      .selectExpr("shard", "doc_id",
        s"k * $SeqLen AS tok_start",
        s"least($SeqLen, dlen - k * $SeqLen) AS ilen")

  /** Q — `pipeline_pack_tokens_bestfit` (r15 verdict item 6): first-fit-
    * decreasing packing beside [[query]]'s sequential tiling. Tiling
    * splits documents across sequence boundaries (zero padding, but every
    * boundary is a mid-document truncation the trainer pays attention
    * cost for); FFD keeps each document (or SeqLen-chunk) CONTIGUOUS in
    * one sequence and pays padding instead — `bin_fill`/`bin_waste` put
    * the padding accounting under the hash (the `pipeline_length_buckets`
    * convention), and the spec pins waste ≤ the sequential non-splitting
    * (next-fit) packer's.
    *
    * Scale shape: the packer sees (doc_id, tok_start, ilen) METADATA only
    * — groupByKey(shard) + mapGroups holds one shard's item list (the
    * [[CorpusOps.PackShards]] contract: thousands of shards at 100 TB, so
    * a group is corpus/shards-sized metadata, never token data); ids
    * rejoin afterwards for the row-local span_idsum. FFD itself is
    * O(n·bins) per shard — the binary-search best-fit tree is the
    * production upgrade, same semantics.
    */
  def bestFitQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders => E}
    // ONE docStreams frame feeds both the packer's metadata leg and the
    // ids rejoin — two calls would re-run the driver-side BPE trainer
    val streams = docStreams(spark, dir)
    val items = packItems(streams).as[PackItem](E.product[PackItem])
    val packed = items.groupByKey(_.shard)(E.scalaLong)
      .flatMapGroups((_: Long, it: Iterator[PackItem]) =>
        ffdPack(it.toSeq).iterator)(E.product[PackedItem])
      .toDF()
    packed
      .join(streams.select("doc_id", "ids"), "doc_id")
      .withColumn("bin_fill", expr(
        "sum(span_len) OVER (PARTITION BY shard, bin_id)"))
      .selectExpr("shard", "bin_id", "pos_in_bin", "doc_id", "tok_start",
        "span_len",
        "aggregate(slice(ids, CAST(tok_start + 1 AS INT), " +
          "CAST(span_len AS INT)), CAST(0 AS BIGINT), (a, v) -> a + v)" +
          " AS span_idsum",
        "CAST(bin_fill AS BIGINT) AS bin_fill",
        s"CAST($SeqLen - bin_fill AS BIGINT) AS bin_waste")
      .orderBy("shard", "bin_id", "pos_in_bin")
  }

  /** FFD replay in DuckDB: a recursive CTE advances every shard one item
    * per step in the FFD rank order, carrying each shard's bin-remainder
    * list as state (the [[graft.ops.FadsOracle]] sequential-replay
    * pattern) — `list_position` over `rems ≥ ilen` IS first-fit.
    */
  val bestFitSql: String = {
    // first-fit choice: 1-based index of the first bin with room; DuckDB
    // 1.0 returns 0 (not NULL) for not-found, so the no-fit test is
    // coalesce(j, 0) = 0 to be robust across both conventions — inlined
    // at each of its four uses in the recursive arm
    val j = "list_position(list_transform(f.rems, x -> x >= r.ilen), true)"
    s"""WITH RECURSIVE $docsCtes,
       |items AS (
       |  SELECT doc_id % $Shards AS shard, doc_id,
       |         (k * $SeqLen)::BIGINT AS tok_start,
       |         least($SeqLen, dlen - k * $SeqLen)::BIGINT AS ilen
       |  FROM (SELECT doc_id, dlen,
       |               unnest(range(0, (dlen - 1) // $SeqLen + 1)) AS k
       |        FROM docs2)),
       |ranked AS MATERIALIZED (
       |  SELECT shard, doc_id, tok_start, ilen,
       |         row_number() OVER (PARTITION BY shard
       |           ORDER BY ilen DESC, doc_id, tok_start) AS rn
       |  FROM items),
       |ffd AS (
       |  SELECT shard, 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS rems,
       |         NULL::BIGINT AS doc_id, NULL::BIGINT AS tok_start,
       |         NULL::BIGINT AS ilen, NULL::BIGINT AS bin_id,
       |         NULL::BIGINT AS pos_in_bin
       |  FROM (SELECT DISTINCT shard FROM ranked)
       |  UNION ALL
       |  SELECT r.shard, r.rn,
       |         CASE WHEN coalesce($j, 0) = 0
       |              THEN list_append(f.rems, $SeqLen - r.ilen)
       |              ELSE list_transform(range(1, len(f.rems) + 1),
       |                k -> CASE WHEN k = $j THEN f.rems[k::INT] - r.ilen
       |                          ELSE f.rems[k::INT] END)
       |         END,
       |         r.doc_id, r.tok_start, r.ilen,
       |         (CASE WHEN coalesce($j, 0) = 0 THEN len(f.rems)
       |               ELSE $j - 1 END)::BIGINT,
       |         (CASE WHEN coalesce($j, 0) = 0 THEN 0
       |               ELSE $SeqLen - f.rems[($j)::INT] END)::BIGINT
       |  FROM ffd f JOIN ranked r ON r.shard = f.shard AND r.rn = f.rn + 1),
       |placed AS (SELECT shard, bin_id, pos_in_bin, doc_id, tok_start,
       |                  ilen AS span_len
       |           FROM ffd WHERE rn > 0),
       |fills AS (SELECT shard, bin_id, sum(span_len)::BIGINT AS bin_fill
       |          FROM placed GROUP BY shard, bin_id)
       |SELECT p.shard, p.bin_id, p.pos_in_bin, p.doc_id, p.tok_start,
       |       p.span_len,
       |       coalesce(list_sum(d.ids[(p.tok_start + 1)::INT
       |                               : (p.tok_start + p.span_len)::INT]),
       |                0)::BIGINT AS span_idsum,
       |       f.bin_fill, ($SeqLen - f.bin_fill)::BIGINT AS bin_waste
       |FROM placed p JOIN docs2 d USING (doc_id)
       |JOIN fills f ON f.shard = p.shard AND f.bin_id = p.bin_id
       |ORDER BY p.shard, p.bin_id, p.pos_in_bin""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pack_tokens" -> query,
    "pipeline_pack_tokens_bestfit" -> bestFitQuery)

  val oracles: Map[String, String] = Map(
    "pipeline_pack_tokens" -> sql,
    "pipeline_pack_tokens_bestfit" -> bestFitSql)
}
