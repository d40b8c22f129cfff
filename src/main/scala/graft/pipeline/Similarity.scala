package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor similarity search over the `embeddings`
  * table (64-dim float vectors).
  *
  * Two paths (SURVEY-mandated pattern for the north-star extensions):
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    A broadcast of the (tiny) query set against the corpus: one pass,
  *    no shuffle of the corpus, per-partition top-k via window rank.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB scale path. Vectors
  *    hash to sign-pattern buckets (one cheap per-row expression); only
  *    same-bucket candidates are scored, turning O(N·Q) into
  *    O(N/2^bits · Q) with one bucket-key shuffle.
  *
  * Determinism: hyperplane coefficients are integer-derived pseudo-random
  * constants (exact in both engines); dot products fold left-to-right in both
  * engines; scores are rounded to 6 dp in the output to absorb any
  * last-ulp summation divergence.
  */
object Similarity {

  val Dim = 64

  /** Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    * hp(j, i) = (((j*Dim + i + 1) * 2654435761) mod 1000003) / 1000003 - 0.5.
    * Pure integer arithmetic then one exact division — identical across
    * engines.
    */
  private def hpExpr(j: String, i: String): String =
    s"(CAST((($j * $Dim + $i + 1) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5)"

  /** Query vectors = vec_id < 5 (a deterministic, tiny query set). */
  val QuerySetSize = 5
  val TopK = 5

  /** Cosine similarity from precomputed per-vector norms: dot left-to-right
    * fold / (nrm_a * nrm_b). Norms are computed ONCE per vector in
    * [[embDouble]], not per pair — 3× less work in pairwise scoring.
    * `a`,`b` are array<double> column names; `na`,`nb` the norm columns.
    */
  private def cosineExpr(a: String, b: String, na: String, nb: String): String =
    s"graft_dot($a, $b) / ($na * $nb)"

  /** DuckDB cosine with the same fold order and precomputed norms. */
  private def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"""list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i]))
       | / ($na * $nb)""".stripMargin

  private def embDouble(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
      .selectExpr("vec_id", "label", "emb", "sqrt(graft_dot(emb, emb)) AS nrm")
  }

  /** DuckDB emb CTE matching [[embDouble]]. */
  private val embCte: String =
    """emb AS (SELECT vec_id, label, emb,
      |        sqrt(list_sum(list_transform(emb, v -> v * v))) AS nrm
      |        FROM (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings))""".stripMargin

  /** Exact brute-force cosine top-k: broadcast the query rows, score every
    * corpus vector, keep k best per query (rank window over a key with ~N/Q
    * rows — at scale use TakeOrderedAndProject per query or aggregate top-k).
    */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embDouble(spark, dir)
    val queries = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val bruteForceTopKSql: String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM emb e, q WHERE e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** LSH bucket id: sign bits of `NBits` hyperplane dot products. */
  val NBits = 4

  private def bucketExprSpark(emb: String): String = {
    val bits = (0 until NBits).map { j =>
      // hyperplane as an array literal: graft_dot runs one codegen'd loop
      val hp = (0 until Dim).map(i => hpExpr(j.toString, i.toString)).mkString("array(", ", ", ")")
      s"CASE WHEN graft_dot($emb, $hp) > 0 THEN ${1L << j} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  private def bucketSqlDuck(emb: String): String = {
    val bits = (0 until NBits).map { j =>
      s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         | i -> $emb[i] * ${hpExpr(j.toString, "(i - 1)")})) > 0
         | THEN ${1L << j} ELSE 0 END""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  /** LSH-bucketed ANN: score only same-bucket candidates. Bucket assignment
    * is a per-row expression; the candidate join keys on the bucket id —
    * at 100 TB this is the difference between a full cross product and a
    * shuffle-local join.
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = embDouble(spark, dir)
      .withColumn("bucket", expr(bucketExprSpark("emb")))
    val queries = bucketed.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm", "bucket")
    bucketed.join(broadcast(queries), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val lshTopKSql: String =
    s"""WITH $embCte,
       |bucketed AS (SELECT vec_id, emb, nrm, ${bucketSqlDuck("emb")} AS bucket FROM emb),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, bucket FROM bucketed
       |      WHERE vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM bucketed e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** IVF-style ANN — the second scale path besides hyperplane LSH: a
    * deterministic codebook (the first NCentroids corpus vectors — a seeded
    * sample, like one k-means init step), every vector assigned to its
    * nearest centroid's inverted list (argmax cosine, deterministic ties),
    * queries probe the NProbe nearest lists and score only those members.
    * At 100 TB: assignment is a broadcast of the tiny codebook + one
    * shuffle on list id; probing reads NProbe/NCentroids of the corpus.
    */
  val NCentroids = 16
  val NProbe = 4

  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val cent = emb.where(s"vec_id < $NCentroids")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")
    def nearestCentroids(src: DataFrame, idAs: String, keep: Int): DataFrame =
      src.crossJoin(broadcast(cent))
        .selectExpr(s"vec_id AS $idAs", "emb", "nrm", "c_id",
          s"round(${cosineExpr("emb", "c_emb", "nrm", "c_nrm")}, 6) AS csim")
        .withColumn("crk", expr(
          s"row_number() OVER (PARTITION BY $idAs ORDER BY csim DESC, c_id)"))
        .where(s"crk <= $keep")
    val assigned = nearestCentroids(emb, "vec_id", 1)
      .select("vec_id", "emb", "nrm", "c_id")
    val probes = nearestCentroids(emb.where(s"vec_id < $QuerySetSize"), "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    probes.join(assigned, "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val ivfTopKSql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $NCentroids),
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id FROM (
       |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb e, cent c)
       |  WHERE crk = 1),
       |probes AS (
       |  SELECT q_id, q_emb, q_nrm, c_id FROM (
       |    SELECT e.vec_id AS q_id, e.emb AS q_emb, e.nrm AS q_nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb e, cent c WHERE e.vec_id < $QuerySetSize)
       |  WHERE crk <= $NProbe),
       |scored AS (
       |  SELECT p.q_id, a.vec_id,
       |         round(${cosineSql("p.q_emb", "a.emb", "p.q_nrm", "a.nrm")}, 6) AS sim
       |  FROM probes p JOIN assigned a USING (c_id) WHERE a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** Embedding-cosine near-duplicate pairs within each label partition
    * (label = the natural blocking key): sim above threshold ⇒ candidate
    * duplicate. Blocked join — each label bucket joins locally.
    */
  // synthetic testdata has no true near-dups: 0.40 sits at the top of the
  // empirical within-label cosine range, so the query emits real pairs
  val NearDupThreshold = 0.40

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir)
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b", "a.label AS label",
        s"round(${cosineExpr("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) AS sim")
      .where(s"sim >= $NearDupThreshold")
      .orderBy("vec_a", "vec_b")
  }

  val embeddingNearDupSql: String =
    s"""WITH $embCte
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       |       round(${cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) AS sim
       |FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(${cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) >= $NearDupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_bruteforce_topk" -> bruteForceTopK,
    "sim_lsh_topk" -> lshTopK,
    "sim_ivf_topk" -> ivfTopK,
    "dedup_embedding_cosine" -> embeddingNearDup)

  val oracles: Map[String, String] = Map(
    "sim_bruteforce_topk" -> bruteForceTopKSql,
    "sim_lsh_topk" -> lshTopKSql,
    "sim_ivf_topk" -> ivfTopKSql,
    "dedup_embedding_cosine" -> embeddingNearDupSql)
}
