package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Deterministic epoch shuffle + shard assignment — the LAST stage of a
  * training-data pipeline: the curated corpus must reach the trainer in a
  * reproducible pseudo-random order, split into fixed shards that
  * data-loader workers read in parallel (the WebDataset/Megatron shard
  * convention). "Shuffle" here is an ORDER, not randomness: run N of a
  * 1000-executor job and run N+1 must produce byte-identical shards, so
  * the permutation is a seeded hash of the document key, never `rand()`.
  *
  * Per epoch e: shuffle_key = Knuth-mix(doc_id + e·1000003) (the
  * [[CorpusOps.temperatureSample]] hash family — epoch re-seeds the mix,
  * so epochs are DIFFERENT permutations, spec-proven), shard = key %
  * [[EsShards]], within-shard position = rank by (key, doc_id), and the
  * interleaved global step (pos−1)·S + shard is the order a shard-parallel
  * loader consumes rows. Per-shard token mass rides as a window sum so the
  * hash also gates the balance the hash-mod assignment delivers.
  *
  * At 100 TB this is exactly one hash repartition (the shard exchange) +
  * one per-shard local sort — the minimal physical plan any shard writer
  * must pay; nothing is global: no total order, no driver state. The
  * entry emits both epochs' assignments under one hash.
  */
object EpochShuffle {

  /** Data-loader shard fan-out. */
  val EsShards = 8

  /** Epochs emitted (each a distinct seeded permutation). */
  val EsEpochs = 2

  private def mix(expr: String): String =
    s"((($expr) % 2147483647) * 2654435761) % 2147483647"

  def query(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .selectExpr("doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens")
      .selectExpr("doc_id", "ws_tokens",
        s"explode(sequence(0, ${EsEpochs - 1})) AS epoch")
      .selectExpr("CAST(epoch AS BIGINT) AS epoch", "doc_id", "ws_tokens",
        s"${mix("doc_id + epoch * 1000003")} AS shuffle_key")
      .selectExpr("epoch", "doc_id", "ws_tokens", "shuffle_key",
        s"shuffle_key % $EsShards AS shard")
      .selectExpr("epoch", "doc_id", "ws_tokens", "shuffle_key", "shard",
        "row_number() OVER (PARTITION BY epoch, shard" +
          " ORDER BY shuffle_key, doc_id) AS pos",
        "sum(ws_tokens) OVER (PARTITION BY epoch, shard) AS shard_tokens")
      .selectExpr("epoch", "doc_id", "ws_tokens", "shuffle_key", "shard",
        "CAST(pos AS BIGINT) AS pos",
        s"CAST((pos - 1) * $EsShards + shard AS BIGINT) AS step",
        "shard_tokens")
      .orderBy("epoch", "step")

  val sql: String = {
    val mixSql = s"(((doc_id + epoch * 1000003) % 2147483647)" +
      s" * 2654435761) % 2147483647"
    s"""WITH e AS (SELECT doc_id,
       |  len(string_split(text, ' '))::BIGINT AS ws_tokens,
       |  unnest(range(0, $EsEpochs)) AS epoch FROM documents),
       |k AS (SELECT epoch::BIGINT AS epoch, doc_id, ws_tokens,
       |             $mixSql AS shuffle_key FROM e),
       |s AS (SELECT epoch, doc_id, ws_tokens, shuffle_key,
       |             shuffle_key % $EsShards AS shard FROM k),
       |p AS (SELECT epoch, doc_id, ws_tokens, shuffle_key, shard,
       |             row_number() OVER (PARTITION BY epoch, shard
       |               ORDER BY shuffle_key, doc_id)::BIGINT AS pos,
       |             sum(ws_tokens) OVER (PARTITION BY epoch, shard)::BIGINT
       |               AS shard_tokens
       |      FROM s)
       |SELECT epoch, doc_id, ws_tokens, shuffle_key, shard, pos,
       |       ((pos - 1) * $EsShards + shard)::BIGINT AS step,
       |       shard_tokens
       |FROM p ORDER BY epoch, step""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_epoch_shuffle" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_epoch_shuffle" -> sql)
}
