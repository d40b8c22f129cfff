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

  /** The same value computed in Scala (exact: Long arithmetic, one IEEE
    * division — bit-identical to [[hpExpr]] in either engine).
    */
  private def hpVal(j: Int, i: Int): Double =
    (((j.toLong * Dim + i + 1) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  /** Hyperplane j as ONE array literal Column. The string-expression form
    * (64 constant sub-expressions per plane) made Catalyst parse and
    * constant-fold thousands of nodes per plan — a single ArrayType Literal
    * is free. Plan semantics are unchanged (same doubles, same graft_dot).
    */
  private def hpArray(j: Int): org.apache.spark.sql.Column =
    typedlit((0 until Dim).map(i => hpVal(j, i)))

  private def dotSign(emb: org.apache.spark.sql.Column, j: Int, weight: Long): org.apache.spark.sql.Column =
    when(call_function("graft_dot", emb, hpArray(j)) > 0, lit(weight)).otherwise(lit(0L))

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

  /** DuckDB emb CTE matching [[embDouble]] (shared with [[LearnedMix]]'s
    * composed oracle).
    */
  private[pipeline] val embCte: String =
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

  /** Exact cosine ranks at depth `k` — the VECTOR LEG the hybrid RRF
    * entry ([[Retrieval.hybridRrf]]) fuses with lexical BM25 ranks. Same
    * scoring and (sim DESC, vec_id) tie-break as [[bruteForceTopK]], rank
    * depth decoupled from [[TopK]].
    */
  private[pipeline] def cosineRanks(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val corpus = embDouble(spark, dir)
    val queries = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $k")
      .selectExpr("q_id", "vec_id", "CAST(rk AS BIGINT) AS rk")
  }

  /** DuckDB CTE fragment replaying [[cosineRanks]] — defines `emb`, `vq`
    * and `vec_rk(q_id, vec_id, rk)`; splice after WITH in a caller query.
    */
  private[pipeline] def cosineRanksCtes(k: Int): String =
    s"""$embCte,
       |vq AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |       WHERE vec_id < $QuerySetSize),
       |vec_rk AS (
       |  SELECT q_id, vec_id, rk::BIGINT AS rk FROM (
       |    SELECT vq.q_id, e.vec_id,
       |           row_number() OVER (PARTITION BY vq.q_id ORDER BY
       |             round(${cosineSql("vq.q_emb", "e.emb", "vq.q_nrm", "e.nrm")}, 6) DESC,
       |             e.vec_id) AS rk
       |    FROM emb e, vq WHERE e.vec_id <> vq.q_id)
       |  WHERE rk <= $k)""".stripMargin

  /** The window-free brute-force construction — the "aggregate top-k"
    * scale pattern [[bruteForceTopK]]'s scaladoc names: per-query top-k
    * kept by the bounded [[TopKAgg]] typed aggregator instead of a rank
    * window. The agg is map-side combinable, so each partition reduces
    * its candidates to ≤ k rows BEFORE the exchange — the per-query
    * shuffle carries Q·k·partials instead of every scored pair, and
    * nothing sorts N/Q-row partitions. Same output, same oracle; the
    * spec asserts the plan carries NO Window node.
    */
  def bruteForceAggTopK(spark: SparkSession, dir: String): DataFrame = {
    TopKAgg.register(spark)
    val corpus = embDouble(spark, dir)
    val queries = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .groupBy("q_id").agg(expr("graft_topk(sim, vec_id)").as("tk"))
      .selectExpr("q_id", "posexplode(tk) AS (i, p)")
      .selectExpr("q_id", "p._2 AS vec_id", "p._1 AS sim",
        "CAST(i + 1 AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  /** LSH bucket id: sign bits of `NBits` hyperplane dot products. */
  val NBits = 4

  private def bucketColSpark(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until NBits).map(j => dotSign(emb, j, 1L << j)).reduce(_ + _)

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
      .withColumn("bucket", bucketColSpark(col("emb")))
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

  /** Independent hash tables for the multi-table LSH variant. Table `t`
    * draws its [[NBits]] hyperplanes from the same deterministic family at
    * plane indices `t·NBits + b` — disjoint from every other table, so the
    * tables are independent trials. Standard LSH recall amplification
    * (E2LSH / FALCONN construction): a true neighbor at angle θ collides
    * in one table with p = (1 − θ/π)^NBits, and misses ALL tables with
    * (1 − p)^L — at cos 0.7, p ≈ 0.32 per 4-bit table, so 8 tables take
    * the miss rate from 68% to ~5%. Cost is L bucket keys per vector
    * (one shuffle with an L-wide explode), not L corpus copies.
    */
  val LshTables = 8

  private def tableBucketSpark(emb: org.apache.spark.sql.Column, t: Int)
      : org.apache.spark.sql.Column =
    (0 until NBits).map(b => dotSign(emb, t * NBits + b, 1L << b)).reduce(_ + _)

  private def tableBucketSqlDuck(emb: String, t: Int): String = {
    val bits = (0 until NBits).map { b =>
      val j = t * NBits + b
      s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         | i -> $emb[i] * ${hpExpr(j.toString, "(i - 1)")})) > 0
         | THEN ${1L << b} ELSE 0 END""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  /** Multi-table LSH ANN — the recall-amplified form of [[lshTopK]] (whose
    * single 4-bit table is the declared coarse demo, ~12% recall here):
    * candidates are the UNION over [[LshTables]] independent tables of
    * same-(table, bucket) vectors, deduped before the exact scoring pass.
    * At 100 TB the shape is unchanged from the single table — per-row
    * bucket expressions, one equi-join shuffle on (t, bucket) with the
    * query side broadcast, exact cosine only on the deduped candidates —
    * the L× factor rides the (vec_id, t, bucket) key stream, never the
    * vectors themselves (the explode carries ids only; embeddings join
    * back AFTER dedup).
    */
  def lshMultiTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val bucketArr = array(
      (0 until LshTables).map(t => tableBucketSpark(col("emb"), t)): _*)
    val buckets = emb.select(col("vec_id"), posexplode(bucketArr))
      .toDF("vec_id", "t", "bucket")
    val qb = buckets.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "t", "bucket")
    val cand = buckets.join(broadcast(qb), Seq("t", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val queries = emb.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    cand.join(emb.select("vec_id", "emb", "nrm"), "vec_id")
      .join(broadcast(queries), "q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val lshMultiTopKSql: String = {
    val tableSelects = (0 until LshTables).map { t =>
      s"SELECT vec_id, $t AS t, ${tableBucketSqlDuck("emb", t)} AS bucket FROM emb"
    }.mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |bt AS (
       |  $tableSelects),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, e.vec_id
       |  FROM bt e JOIN bt q USING (t, bucket)
       |  WHERE q.vec_id < $QuerySetSize AND e.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.emb", "e.emb", "q.nrm", "e.nrm")}, 6) AS sim
       |  FROM cand c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN emb q ON q.vec_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  /** IVF-style ANN — the second scale path besides hyperplane LSH: a
    * deterministic codebook (the first nCentroids corpus vectors — a seeded
    * sample, like one k-means init step), every vector assigned to its
    * nearest centroid's inverted list (argmax cosine, deterministic ties),
    * queries probe the NProbe nearest lists and score only those members.
    * At 100 TB: assignment is a broadcast of the tiny codebook + one
    * shuffle on list id; probing reads NProbe/nCentroids of the corpus.
    *
    * CORPUS-ADAPTIVE sizing (round-11 verdict item 3): the codebook grows
    * with the corpus — `max(NCentroidsMin, min(NCentroidsMax, N / ListTarget))`
    * lists hold per-list population near [[ListTarget]] vectors, so the
    * probe reads a shrinking FRACTION (NProbe·ListTarget rows) as the
    * corpus grows instead of NProbe/16 of everything. The same formula is
    * computed in the oracle SQL via a scalar subquery over the emb CTE
    * (the adaptive-rerankK pattern), so both engines always agree; the
    * floor binds at every committed sf (≤2,000 vectors), leaving the
    * test-scale constructions — and their hashes — at 16 lists, while a
    * ×100 scale corpus (200k vectors) derives 250 lists (probe fraction
    * 4/250 = 1.6%) with no override. `SPARK_GRAFT_IVF_CENTROIDS` remains
    * a manual escape hatch for experiments; the driver's Verify never
    * sets it.
    */
  val NCentroidsMin = 16

  /** Codebook broadcastability cap: 65,536 centroids × 64 doubles ≈ 34 MB,
    * the most worth shipping as one broadcast. Past this (≳52 B vectors)
    * the next rung is a hierarchical coarse quantizer — an IVF over the
    * centroids themselves — not a bigger flat codebook.
    */
  val NCentroidsMax = 65536

  /** Target inverted-list population (vectors per list). */
  val ListTarget = 800L

  private val centroidsOverride: Option[Int] =
    sys.env.get("SPARK_GRAFT_IVF_CENTROIDS").map { s =>
      val n =
        try s.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SPARK_GRAFT_IVF_CENTROIDS must be a positive integer, got '$s'")
        }
      require(n > 0, s"SPARK_GRAFT_IVF_CENTROIDS must be > 0, got $n")
      n
    }

  /** Effective codebook size for a corpus of `corpusRows` vectors. */
  def nCentroids(corpusRows: Long): Int = centroidsOverride.getOrElse(
    math.max(NCentroidsMin.toLong,
      math.min(NCentroidsMax.toLong, corpusRows / ListTarget)).toInt)

  def nCentroids(spark: SparkSession, dir: String): Int =
    nCentroids(corpusStats(spark, dir)._1)

  /** The same derivation as a DuckDB scalar expression over the `emb` CTE
    * (integer division, like the adaptive-rerankK subquery) — the oracle
    * replays the identical codebook size without the value being baked
    * into the SQL string.
    */
  private def nCentroidsSqlExpr: String = centroidsOverride
    .map(_.toString)
    .getOrElse(s"greatest($NCentroidsMin, least($NCentroidsMax, " +
      s"(SELECT count(*) // $ListTarget FROM emb)))")

  /** Memoized per-corpus stats from ONE aggregate pass: (row count,
    * max vec_id, content fingerprint). The count drives [[nCentroids]]/[[rerankK]]
    * without re-running a corpus scan every time a plan is constructed
    * (round-11 advice: `rerankK(emb.count())` embedded an eager count job
    * into every ivfPqTopK plan build); the fingerprint — an order-free
    * hash-sum over (vec_id, embedding) — keys [[ivfIndexPath]] so a
    * regenerated corpus at the same path can never silently reuse a stale
    * persisted index (the round-10 hazard).
    */
  private val corpusStatsCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, Long)]

  def corpusStats(spark: SparkSession, dir: String): (Long, Long, Long) =
    corpusStatsCache.getOrElseUpdate(dir, {
      val r = Tables.load(spark, dir, "embeddings")
        .agg(count(lit(1)), max("vec_id"),
          sum(expr("CAST(pmod(hash(vec_id, embedding), 1000003) AS BIGINT)")))
        .head()
      (r.getLong(0), r.getLong(1), math.floorMod(r.getLong(2), 1000000007L))
    })

  val NProbe = 4

  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val cent = emb.where(s"vec_id < ${nCentroids(spark, dir)}")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")
    def nearestCentroids(src: DataFrame, idAs: String, keep: Int): DataFrame =
      if (keep == 1) assignOne(src, cent, idAs, "c_id", "c_emb", "c_nrm", "csim", "crk")
      else src.crossJoin(broadcast(cent))
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
       |         WHERE vec_id < $nCentroidsSqlExpr),
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

  // ------------------------------------------- two-level coarse quantizer

  /** Level-1 cell sizing of the hierarchical quantizer: each coarse cell
    * targets [[L1FinePerCell]] fine lists (= ListTarget·64 vectors), with
    * the same floor/cap discipline as [[nCentroids]]. At the
    * [[NCentroidsMax]] cap this derives ~1,024 level-1 cells of ~64 fine
    * lists each — the shape where the fine codebook (34 MB, too big to
    * scan per query row) is itself reached through an index.
    */
  val L1Min = 4
  val L1Max = 1024
  val L1FinePerCell = 64L
  /** Level-1 cells a query expands (the coarse analog of [[NProbe]]). */
  val L1Probe = 2

  def l1Cells(corpusRows: Long): Int = math.max(L1Min.toLong,
    math.min(L1Max.toLong, corpusRows / (ListTarget * L1FinePerCell))).toInt

  private def l1CellsSqlExpr: String =
    s"greatest($L1Min, least($L1Max, " +
      s"(SELECT count(*) // ${ListTarget * L1FinePerCell} FROM emb)))"

  /** Two-level IVF — the rung past the flat-codebook cap that the
    * [[NCentroidsMax]] scaladoc names (the coarse half of an inverted
    * multi-index; Babenko & Lempitsky 2012 reach the same regime with
    * product cells): an IVF over the CENTROIDS themselves. The fine
    * codebook is bucketed by a tiny level-1 codebook at build time; a
    * query first ranks the [[l1Cells]] coarse cells (broadcast of L1
    * rows), expands the best [[L1Probe]], and ranks ONLY those cells'
    * fine centroids (an equi join against the bucketed codebook — per
    * query ~L1Probe·[[L1FinePerCell]] centroid rows instead of all
    * [[nCentroids]]), then probes the winning [[NProbe]] inverted lists
    * exactly as [[ivfTopK]]. Corpus-side cost is IDENTICAL to flat IVF
    * (every vector still joins its one fine list); what the hierarchy
    * bounds is the QUERY-side codebook work, which is what breaks first
    * past ~52 B vectors. Recall trade: the true nearest fine list can sit
    * in an unprobed coarse cell — [[SimilaritySpec]] gates the measured
    * recall floor.
    */
  def ivf2TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val nC = nCentroids(spark, dir)
    val l1 = l1Cells(corpusStats(spark, dir)._1)
    val cent = emb.where(s"vec_id < $nC")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")
    val coarse = emb.where(s"vec_id < $l1")
      .selectExpr("vec_id AS g_id", "emb AS g_emb", "nrm AS g_nrm")
    // fine centroid → owning level-1 cell (codebook-sized, combinable)
    val centCell = assignOne(
      cent.selectExpr("c_id AS vec_id", "c_emb AS emb", "c_nrm AS nrm"),
      coarse, "c_id", "g_id", "g_emb", "g_nrm", "gsim", "grk")
      .select("c_id", "emb", "nrm", "g_id")
    // corpus → fine list: unchanged from flat IVF (build-time, once)
    val assigned = assignOne(emb, cent, "vec_id", "c_id", "c_emb", "c_nrm",
      "csim", "crk").select("vec_id", "emb", "nrm", "c_id")
    val qCells = emb.where(s"vec_id < $QuerySetSize")
      .crossJoin(broadcast(coarse))
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm", "g_id",
        s"round(${cosineExpr("emb", "g_emb", "nrm", "g_nrm")}, 6) AS gsim")
      .withColumn("grk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY gsim DESC, g_id)"))
      .where(s"grk <= $L1Probe")
      .select("q_id", "q_emb", "q_nrm", "g_id")
    val qFine = qCells.join(broadcast(centCell), "g_id")
      .selectExpr("q_id", "q_emb", "q_nrm", "c_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS fsim")
      .withColumn("frk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY fsim DESC, c_id)"))
      .where(s"frk <= $NProbe")
      .select("q_id", "q_emb", "q_nrm", "c_id")
    qFine.join(assigned, "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val ivf2TopKSql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |coarse AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |           WHERE vec_id < $l1CellsSqlExpr),
       |centcell AS (
       |  SELECT c_id, c_emb, c_nrm, g_id FROM (
       |    SELECT c.c_id, c.c_emb, c.c_nrm, g.g_id,
       |           row_number() OVER (PARTITION BY c.c_id ORDER BY
       |             round(${cosineSql("c.c_emb", "g.g_emb", "c.c_nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM cent c, coarse g)
       |  WHERE grk = 1),
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id FROM (
       |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb e, cent c)
       |  WHERE crk = 1),
       |qcells AS (
       |  SELECT q_id, q_emb, q_nrm, g_id FROM (
       |    SELECT e.vec_id AS q_id, e.emb AS q_emb, e.nrm AS q_nrm, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, coarse g WHERE e.vec_id < $QuerySetSize)
       |  WHERE grk <= $L1Probe),
       |qfine AS (
       |  SELECT q_id, q_emb, q_nrm, c_id FROM (
       |    SELECT q.q_id, q.q_emb, q.q_nrm, cc.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "cc.c_emb", "q.q_nrm", "cc.c_nrm")}, 6) DESC,
       |             cc.c_id) AS frk
       |    FROM qcells q JOIN centcell cc USING (g_id))
       |  WHERE frk <= $NProbe),
       |scored AS (
       |  SELECT p.q_id, a.vec_id,
       |         round(${cosineSql("p.q_emb", "a.emb", "p.q_nrm", "a.nrm")}, 6) AS sim
       |  FROM qfine p JOIN assigned a USING (c_id) WHERE a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** IVF with a TRAINED codebook: [[ivfTopK]]'s seeded centroids refined by
    * [[KmRounds]] Lloyd iterations (assign to nearest centroid, recompute
    * means). Cross-engine determinism of the means: per-dimension values are
    * quantized to integers (`floor(x * 2^20 + 0.5)` — floor is unambiguous
    * in both engines, unlike round-half ties), summed EXACTLY as BIGINTs
    * (order-free), and divided once — so Spark and DuckDB derive
    * bit-identical centroids, assignments, and final top-k.
    *
    * Scale: each round is one broadcast of the 16-row codebook + one
    * map-side-combinable 64-sum aggregate — no corpus shuffle; training cost
    * is rounds × scan.
    */
  val KmRounds = 2
  val QScale = 1048576L // 2^20

  /** Materialize a codebook frame to the driver and rebuild it as a local
    * relation: 16 rows × 64 doubles — parameter-server state, like real IVF
    * training. This cuts each Lloyd round's plan off from the previous
    * round's (otherwise round N's lazy plan NESTS every earlier round and
    * every downstream reference re-executes the whole chain) and replaces
    * the round-2 cache-leak pattern. Doubles round-trip the collect exactly;
    * c_nrm is recomputed from the same values — bit-identical either way.
    */
  private def materializeCodebook(spark: SparkSession, cent: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = cent.select("c_id", "c_emb")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    rows.toDF("c_id", "c_emb")
      .selectExpr("c_id", "c_emb", "sqrt(graft_dot(c_emb, c_emb)) AS c_nrm")
  }

  /** [[KmRounds]] Lloyd iterations over the whole corpus (first-K init,
    * quantized-sum means, codebook materialized between rounds) — the
    * training loop shared by [[ivfTrainedTopK]] and [[clusterMix]].
    */
  private def trainedCentroids(spark: SparkSession, dir: String,
      emb: DataFrame): DataFrame = {
    var cent = materializeCodebook(spark,
      emb.where(s"vec_id < ${nCentroids(spark, dir)}")
        .selectExpr("vec_id AS c_id", "emb AS c_emb"))
    for (_ <- 1 to KmRounds) {
      // combinable argmax, not a window — see [[assignOne]] (the Lloyd
      // loop re-assigns the WHOLE corpus every round, so the fat-payload
      // window shuffle would be paid KmRounds+1 times here)
      val assigned = assignOne(emb, cent, "vec_id", "c_id", "c_emb", "c_nrm",
        "csim", "crk")
      val qsums = (0 until Dim).map(i =>
        sum(expr(s"CAST(floor(element_at(emb, ${i + 1}) * $QScale.0 + 0.5) AS BIGINT)")).as(s"s$i"))
      val meanArr = (0 until Dim)
        .map(i => s"CAST(s$i AS DOUBLE) / CAST(cn * $QScale AS DOUBLE)")
        .mkString("array(", ", ", ")")
      cent = materializeCodebook(spark,
        assigned.groupBy("c_id")
          .agg(count(lit(1)).as("cn"), qsums: _*)
          .selectExpr("c_id", s"$meanArr AS c_emb"))
    }
    cent
  }

  def ivfTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val cent = trainedCentroids(spark, dir, emb)
    def nearest(src: DataFrame, idAs: String, keep: Int): DataFrame =
      if (keep == 1) assignOne(src, cent, idAs, "c_id", "c_emb", "c_nrm", "csim", "crk")
      else src.crossJoin(broadcast(cent))
        .selectExpr(s"vec_id AS $idAs", "emb", "nrm", "c_id",
          s"round(${cosineExpr("emb", "c_emb", "nrm", "c_nrm")}, 6) AS csim")
        .withColumn("crk", expr(
          s"row_number() OVER (PARTITION BY $idAs ORDER BY csim DESC, c_id)"))
        .where(s"crk <= $keep")
    val assigned = nearest(emb, "vec_id", 1).select("vec_id", "emb", "nrm", "c_id")
    val probes = nearest(emb.where(s"vec_id < $QuerySetSize"), "q_id", NProbe)
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

  /** DuckDB CTE chain replaying [[trainedCentroids]] + the final whole-
    * corpus assignment: cent0 → (assign, mean) × [[KmRounds]] → cent2 →
    * `assigned(vec_id, emb, nrm, c_id)`. Callers compose after
    * [[embCte]]. Shared by the trained-IVF and cluster-mix oracles.
    */
  private[pipeline] val trainedAssignCtes: String = {
    def assignCte(centName: String, outName: String): String =
      s"""$outName AS (
         |  SELECT vec_id, emb, nrm, c_id FROM (
         |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
         |             c.c_id) AS crk
         |    FROM emb e, $centName c)
         |  WHERE crk = 1)""".stripMargin
    def meanCte(assignName: String, outName: String): String = {
      val sums = (0 until Dim)
        .map(i => s"sum(floor(emb[${i + 1}] * $QScale.0 + 0.5)::BIGINT) AS s$i")
        .mkString(", ")
      val arr = (0 until Dim)
        .map(i => s"s$i::DOUBLE / (cn * $QScale)::DOUBLE")
        .mkString("[", ", ", "]")
      s"""${outName}_m AS (
         |  SELECT c_id, count(*)::BIGINT AS cn, $sums FROM $assignName GROUP BY c_id),
         |${outName}_e AS (SELECT c_id, $arr AS c_emb FROM ${outName}_m),
         |$outName AS (SELECT c_id, c_emb,
         |             sqrt(list_sum(list_transform(c_emb, v -> v * v))) AS c_nrm
         |             FROM ${outName}_e)""".stripMargin
    }
    s"""cent0 AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |${assignCte("cent0", "a1")},
       |${meanCte("a1", "cent1")},
       |${assignCte("cent1", "a2")},
       |${meanCte("a2", "cent2")},
       |${assignCte("cent2", "assigned")}""".stripMargin
  }

  val ivfTrainedTopKSql: String = {
    s"""WITH $embCte,
       |$trainedAssignCtes,
       |probes AS (
       |  SELECT q_id, q_emb, q_nrm, c_id FROM (
       |    SELECT e.vec_id AS q_id, e.emb AS q_emb, e.nrm AS q_nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb e, cent2 c WHERE e.vec_id < $QuerySetSize)
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
  }

  /** Cluster-balanced corpus mixing — the data-curation rebalance over
    * LEARNED topical clusters instead of metadata labels: k-means over
    * the document embeddings (the [[trainedCentroids]] Lloyd loop; the
    * cluster-then-curate shape of SemDeDup/DataComp pipelines), then the
    * α=1/2 temperature accept of [[CorpusOps.temperatureSample]] applied
    * per CLUSTER — group `c` keeps √(c_min/c_c) of its docs, flattening
    * topical skew a `lang`/`source` column can't see. The accept test is
    * the same sqrt-free integer form (u²·n_cluster < c_min·2³², Knuth-
    * hash u on a 2¹⁶ grid); every doc is emitted with its verdict so
    * both classes sit under the hash.
    *
    * Scale shape: training is [[KmRounds]] corpus scans with combinable
    * argmax assignment (no window), cluster counts are one map-side-
    * combinable agg broadcast back, the accept is per-row. No
    * data-sized shuffle anywhere but the presentation sort.
    */
  /** The learned k-means cluster assignment (vec_id, c_id) — the
    * [[trainedCentroids]] Lloyd loop + rank-1 assign, exposed for
    * [[LearnedMix]] (which learns mixture WEIGHTS over these clusters).
    */
  private[pipeline] def clusterAssignments(spark: SparkSession,
      dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val cent = trainedCentroids(spark, dir, emb)
    assignOne(emb, cent, "vec_id", "c_id", "c_emb", "c_nrm",
      "csim", "crk").select("vec_id", "c_id")
  }

  def clusterMix(spark: SparkSession, dir: String): DataFrame = {
    val assigned = clusterAssignments(spark, dir)
    val counts = assigned.groupBy("c_id").agg(count(lit(1)).as("n_cluster"))
    val minc = counts.agg(min("n_cluster").as("c_min"))
    assigned.join(broadcast(counts), "c_id")
      .crossJoin(broadcast(minc))
      .selectExpr("vec_id AS doc_id", "c_id", "n_cluster", "c_min",
        "((vec_id % 2147483647) * 2654435761) % 2147483647 % 65536 AS u_bucket")
      .selectExpr("doc_id", "c_id", "n_cluster", "u_bucket",
        "u_bucket * u_bucket * n_cluster < c_min * 4294967296 AS kept")
      .orderBy("doc_id")
  }

  val clusterMixSql: String =
    s"""WITH $embCte,
       |$trainedAssignCtes,
       |counts AS (SELECT c_id, count(*)::BIGINT AS n_cluster
       |           FROM assigned GROUP BY c_id),
       |m AS (SELECT min(n_cluster)::BIGINT AS c_min FROM counts),
       |u AS (SELECT a.vec_id AS doc_id, a.c_id, c.n_cluster,
       |             ((a.vec_id % 2147483647) * 2654435761) % 2147483647 % 65536 AS u_bucket
       |      FROM assigned a JOIN counts c USING (c_id))
       |SELECT doc_id, c_id, n_cluster, u_bucket,
       |       u_bucket * u_bucket * n_cluster < m.c_min * 4294967296 AS kept
       |FROM u CROSS JOIN m
       |ORDER BY doc_id""".stripMargin

  /** Embedding-cosine near-duplicate pairs, blocked on (label × banded
    * hyperplane-LSH bucket): candidates must share the label AND at least
    * one of [[NdBands]] sign-pattern band buckets; only candidates get the
    * exact cosine confirmation. This is the same band-OR construction as
    * MinHash-LSH banding ([[Dedup.minhashCandidates]]) — per-label blocks
    * are no longer all-pairs, so a dominant label cannot go quadratic.
    * (Banding trades recall for scale: a true near-dup pair colliding in no
    * band is missed — at cosine 0.4 each band matches with p≈0.16, any-of-4
    * p≈0.50; recall rises steeply with similarity, reaching ~0.97 at 0.8.)
    */
  // synthetic testdata has no true near-dups: 0.35 sits near the top of the
  // empirical within-label cosine range (26 exact pairs at sf0.01), so the
  // banded gate still surfaces real pairs after its ~0.5 recall at this sim
  val NearDupThreshold = 0.35
  val NdBands = 4
  val NdBandBits = 4

  /** Spark: array of NdBands band-bucket ids (sign bits of 4 hyperplane
    * dots each), each plane a single array-literal Column.
    */
  private def bandArrCol(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array((0 until NdBands).map { b =>
      (0 until NdBandBits).map { j =>
        dotSign(emb, b * NdBandBits + j, 1L << j)
      }.reduce(_ + _)
    }: _*)

  /** DuckDB: one SELECT per band (mirrors the Spark posexplode rows). */
  private def bandedSqlDuck: String =
    (0 until NdBands).map { b =>
      val bh = (0 until NdBandBits).map { j =>
        val h = b * NdBandBits + j
        s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
           | i -> emb[i] * ${hpExpr(h.toString, "(i - 1)")})) > 0
           | THEN ${1 << j} ELSE 0 END""".stripMargin
      }.mkString("(", " + ", ")")
      s"SELECT vec_id, label, $b AS band, $bh AS bh FROM emb"
    }.mkString("\n  UNION ALL ")

  /** Cache-free: the banded self-join's sides are identical subplans
    * (ReuseExchange shares the shuffle) and the emb re-reads are pruned
    * parquet scans — no cached frame survives the call (round-2 verdict
    * hygiene item).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = embDouble(spark, dir)
    val banded = e
      .withColumn("bands", bandArrCol(col("emb")))
      .selectExpr("vec_id", "label", "posexplode(bands) AS (band, bh)")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.label") === col("y.label") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.label").as("label"))
      .distinct()
    cand
      .join(e.selectExpr("vec_id AS vec_a", "emb AS emb_a", "nrm AS nrm_a"), "vec_a")
      .join(e.selectExpr("vec_id AS vec_b", "emb AS emb_b", "nrm AS nrm_b"), "vec_b")
      .selectExpr("vec_a", "vec_b", "label",
        s"round(${cosineExpr("emb_a", "emb_b", "nrm_a", "nrm_b")}, 6) AS sim")
      .where(s"sim >= $NearDupThreshold")
      .orderBy("vec_a", "vec_b")
  }

  val embeddingNearDupSql: String =
    s"""WITH $embCte,
       |banded AS (
       |  $bandedSqlDuck
       |),
       |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b, x.label AS label
       |         FROM banded x JOIN banded y
       |           ON x.label = y.label AND x.band = y.band AND x.bh = y.bh
       |          AND x.vec_id < y.vec_id)
       |SELECT c.vec_a, c.vec_b, c.label,
       |       round(${cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) AS sim
       |FROM cand c JOIN emb a ON c.vec_a = a.vec_id
       |            JOIN emb b ON c.vec_b = b.vec_id
       |WHERE round(${cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) >= $NearDupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC dedup: two
    * documents are duplicates when their embeddings are near-parallel, even
    * if they share no tokens (the case MinHash/SimHash structurally miss).
    * The paper's construction, re-expressed Spark-first: (1) k-means
    * clusters block the corpus — here the IVF coarse codebook
    * ([[nCentroids]], corpus-adaptive, so per-cluster population stays near
    * [[ListTarget]] whatever the corpus size); (2) pairwise cosine runs
    * ONLY within a cluster (cluster-bounded quadratic: ~ListTarget·N pairs
    * total, linear in N with a constant the codebook formula pins);
    * (3) within each near-dup pair, the vector FARTHER from its centroid
    * survives (the paper keeps low-centroid-similarity examples — they
    * carry more information for training), ties broken by vec_id. A vector
    * is dropped iff some same-cluster near-dup neighbor beats it under
    * that order, so each connected dup group keeps exactly its extremal
    * member — no iterative clustering needed.
    *
    * Plan shape at 100 TB: codebook broadcast + one vec_id window for
    * assignment, self-join shuffled on c_id (both sides cluster-
    * partitioned), and a broadcast anti-ish left join for the verdict.
    * Threshold shares [[NearDupThreshold]] with [[embeddingNearDup]] —
    * the two entries differ ONLY in blocking (label×LSH-band vs k-means
    * cluster) and keep-rule, which is the actual design choice a pipeline
    * owner makes between them.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val k = nCentroids(spark, dir)
    val cent = emb.where(s"vec_id < $k")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")
    // [[assignOne]]: combinable-argmax assignment (the window form cost
    // 163 s at ×100 — the fat-payload shuffle, vs 8.5 s for the entire
    // pairwise phase). Cached: the plan reads `assigned` three times (both
    // self-join sides + verdict); harness clearCache releases it. A
    // production run reads assignments straight from the persisted IVF
    // index ([[incrementalIvf]]) instead of recomputing them at all.
    val assigned = assignOne(emb, cent, "vec_id", "c_id", "c_emb", "c_nrm",
        "csim", "crk")
      .select("vec_id", "emb", "nrm", "c_id", "csim")
      .cache()
    val dropped = assigned.as("a").join(assigned.as("b"),
        expr("a.c_id = b.c_id AND a.vec_id <> b.vec_id"))
      .where(expr(
        s"round(${cosineExpr("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) >= $NearDupThreshold" +
          " AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))"))
      .selectExpr("a.vec_id AS vec_id").distinct()
    assigned.join(dropped.withColumn("is_dropped", lit(1)), Seq("vec_id"), "left")
      .selectExpr("vec_id", "c_id", "csim", "is_dropped IS NULL AS keep")
      .orderBy("vec_id")
  }

  val semDedupSql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id, csim FROM (
       |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
       |           round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) AS csim,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb e, cent c)
       |  WHERE crk = 1),
       |dropped AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON a.c_id = b.c_id AND a.vec_id <> b.vec_id
       |  WHERE round(${cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm")}, 6) >= $NearDupThreshold
       |    AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id)))
       |SELECT s.vec_id, s.c_id, s.csim, d.vec_id IS NULL AS keep
       |FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
       |ORDER BY s.vec_id""".stripMargin

  // ------------------------------------------ product-quantization ANN

  /** PQ geometry: [[Dim]]=64 dims split into [[PqM]]=4 subspaces of
    * [[PqSubDim]]=16 dims, [[PqK]]=16 codes per subspace — each vector
    * compresses to 4 small ints (vs 64 doubles), the memory lever IVF/LSH
    * don't have.
    */
  val PqM = 4
  val PqSubDim = Dim / PqM
  val PqK = 16

  /** Scalar-quantization (SQ8) ANN — the storage-compression path every
    * production vector store ships (FAISS ScalarQuantizer QT_8bit):
    * each vector is stored as 64 signed bytes plus ONE per-vector scale
    * `s = 127 / max|x_i|`, a 4× shrink over float32 with no codebook to
    * train. Scoring decodes nothing: the integer dot of two quantized
    * vectors is rescaled by `1/(s_a·s_b)` and normalized by the ORIGINAL
    * norms. Cross-engine determinism is free here — quantized components
    * are exact small integers, so every product/sum is an exactly-
    * representable double in ANY fold order; only the final rescale
    * divides. At 100 TB this is not an index (it scores everything, like
    * [[pqTopK]]) but the representation the OTHER indexes store their
    * lists in — 25 TB of int8 instead of 100 TB of float32 moving through
    * every probe.
    *
    * Degenerate-vector guard (ADVICE r13): s = 127/max|x| divides by zero
    * on an all-zero vector — Spark would pack floor(NaN)=0 while DuckDB
    * keeps NaN through list_sum, desyncing the oracle. Every pack site in
    * BOTH engines therefore computes s = 127/greatest(max|x|, 1e-300):
    * real vectors are untouched (corpus |x| ≫ 1e-300), an all-zero vector
    * packs to all-zero bytes identically on both sides.
    */
  def sq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val sq = emb
      .selectExpr("vec_id", "nrm",
        "127.0 / greatest(array_max(transform(emb, y -> abs(y))), 1e-300) AS s", "emb")
      .selectExpr("vec_id", "nrm", "s",
        // CAST to DOUBLE: graft_dot takes double arrays; the values stay
        // exact small integers either way
        "transform(emb, x -> CAST(floor(x * s + 0.5) AS DOUBLE)) AS qv")
    val queries = sq.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "qv AS q_qv", "s AS q_s", "nrm AS q_nrm")
    sq.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        "round(graft_dot(qv, q_qv) / (s * q_s) / (nrm * q_nrm), 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val sq8TopKSql: String =
    s"""WITH $embCte,
       |sc AS (SELECT vec_id, nrm, emb,
       |              127.0 / greatest(list_max(list_transform(emb, y -> abs(y))), 1e-300) AS s
       |       FROM emb),
       |sq AS (SELECT vec_id, nrm, s,
       |              list_transform(emb, x -> floor(x * s + 0.5)) AS qv
       |       FROM sc),
       |q AS (SELECT vec_id AS q_id, qv AS q_qv, s AS q_s, nrm AS q_nrm
       |      FROM sq WHERE vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |         round(list_sum(list_transform(range(1, ${Dim + 1}),
       |                 i -> e.qv[i] * q.q_qv[i]))
       |           / (e.s * q.q_s) / (e.nrm * q.q_nrm), 6) AS sim
       |  FROM sq e, q WHERE e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** Product-quantization ANN — the third scale path, orthogonal to
    * LSH (pruning by bucket) and IVF (pruning by inverted list): PQ keeps
    * scoring ALL vectors but against a 16×-compressed representation,
    * then re-scores the adaptive top-[[rerankK]] ADC candidates exactly
    * (the [[ivfPqTopK]] refine contract — without it, solo-PQ recall
    * decayed with corpus growth and its sf0.1 gate flipped false,
    * round-12 finding).
    * Per-subspace codebooks are seeded from the first [[PqK]] corpus rows
    * (same deterministic-init convention as [[ivfTopK]]); encoding picks the
    * L2-nearest code per (vector, subspace); queries score via the classic
    * ADC lookup table — dot(q_sub, centroid) precomputed for Q×M×K cells —
    * so the per-vector score is M table lookups + adds, never a D-wide dot.
    *
    * At 100 TB: the codebook (M×K subvectors) and the LUT (Q×M×K cells)
    * both broadcast; codes are 4 bytes/vector; the only corpus-sized
    * shuffles are the encode argmin and the per-(q, vec) combine, both
    * map-side combinable by key. Cross-engine determinism: ADC partial dots
    * and code norms are quantized to BIGINT ([[QScale]]) so the 4-term sums
    * are order-free; one final division/sqrt chain is IEEE-stable.
    */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val subSlices = (0 until PqM)
      .map(m => s"slice(emb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val subs = emb.selectExpr("vec_id", "nrm",
      s"posexplode(array($subSlices)) AS (m, sub)")
    val cent = subs.where(s"vec_id < $PqK")
      .selectExpr("m", "vec_id AS c_id", "sub AS c_sub",
        s"CAST(floor(graft_dot(sub, sub) * $QScale.0 + 0.5) AS BIGINT) AS cq")
    // encode: per (vector, subspace) argmin of squared L2 to the 16 codes —
    // term-by-term |s|² - 2·s·c + |c|² so both engines fold identically
    val codes = subs.join(broadcast(cent), "m")
      .selectExpr("vec_id", "m", "c_id",
        s"""round(graft_dot(sub, sub) - 2 * graft_dot(sub, c_sub)
           |  + graft_dot(c_sub, c_sub), 6) AS d2""".stripMargin)
      .withColumn("crk", expr(
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, c_id ASC)"))
      .where("crk = 1").select("vec_id", "m", "c_id")
    // ADC lookup table: Q × M × K quantized partial dots (+ code norms)
    val lut = subs.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "nrm AS q_nrm", "m", "sub AS q_sub")
      .join(broadcast(cent), "m")
      .selectExpr("q_id", "q_nrm", "m", "c_id",
        s"CAST(floor(graft_dot(q_sub, c_sub) * $QScale.0 + 0.5) AS BIGINT) AS pq",
        "cq")
    // ADC ranks the WHOLE corpus per query; keep the adaptive top-rerankK
    // and re-score them exactly — the same refine contract as ivfPqTopK,
    // so solo-PQ recall no longer decays as probed populations grow with
    // the corpus (the round-12 sf0.1 gate fragility): the ADC cut is a
    // constant FRACTION of the corpus, and rerankK·Q full-vector reads
    // stay negligible.
    val adc = codes.join(broadcast(lut), Seq("m", "c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(max("q_nrm").as("q_nrm"), sum("pq").as("adcq"), sum("cq").as("rq"))
      .selectExpr("q_id", "vec_id",
        s"""round((CAST(adcq AS DOUBLE) / $QScale.0)
           |  / (q_nrm * sqrt(CAST(rq AS DOUBLE) / $QScale.0)), 6) AS asim""".stripMargin)
      .withColumn("ark", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, vec_id ASC)"))
      .where(s"ark <= ${rerankK(corpusStats(spark, dir)._1)}")
    adc
      .join(emb.select("vec_id", "emb", "nrm"), "vec_id")
      .join(broadcast(emb.where(s"vec_id < $QuerySetSize")
        .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm2")), "q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm2", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val pqTopKSql: String = {
    val subSelects = (0 until PqM)
      .map(m => s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM emb")
      .mkString("\n  UNION ALL ")
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    s"""WITH $embCte,
       |subs AS (
       |  $subSelects),
       |cent AS (SELECT m, vec_id AS c_id, sub AS c_sub,
       |                floor(${normSq("sub")} * $QScale.0 + 0.5)::BIGINT AS cq
       |         FROM subs WHERE vec_id < $PqK),
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM subs s JOIN cent c USING (m))
       |  WHERE crk = 1),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq,
       |         c.cq
       |  FROM subs s JOIN cent c USING (m) WHERE s.vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT l.q_id, c.vec_id, max(l.q_nrm) AS q_nrm,
       |         sum(l.pq)::BIGINT AS adcq, sum(l.cq)::BIGINT AS rq
       |  FROM codes c JOIN lut l ON l.m = c.m AND l.c_id = c.c_id
       |  WHERE c.vec_id <> l.q_id GROUP BY l.q_id, c.vec_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             round((adcq::DOUBLE / $QScale.0)
       |               / (q_nrm * sqrt(rq::DOUBLE / $QScale.0)), 6) DESC,
       |             vec_id ASC) AS ark
       |    FROM scored)
       |  WHERE ark <= greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.emb", "e.emb", "q.nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN emb q ON q.vec_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  // ------------------------------------------------------------- IVF-PQ

  /** Floor of the ADC candidates kept per query for the exact re-rank —
    * 10·[[TopK]], the usual production refine factor: PQ is deliberately
    * lossy (its solo recall here is ~36%), so the ADC pre-cut must keep
    * enough candidates that the exact re-rank can recover the true
    * neighbors the codes mis-rank. Measured on this corpus: recall@5 44%
    * at 3·TopK vs 84% at 10·TopK — the re-rank budget, not the codebook,
    * is the quality knob, and 50·Q full-vector reads stay negligible.
    *
    * The EFFECTIVE budget is `greatest(RerankKMin, corpus/1000)` — computed
    * from the corpus itself in BOTH constructions (Spark `count()`, a
    * scalar subquery in the oracle SQL), so the two stay replay-identical
    * at every scale without a per-corpus constant. A fixed 50 starved the
    * re-rank on the ×100 perturbed corpus (round-11 measurement: recall@5
    * fell to 64% at 200k vectors because probed-list populations grow
    * linearly while the ADC cut stayed flat); proportional K restores the
    * FAISS-style contract that re-rank reads stay a constant FRACTION of
    * the probed candidates, and K·Q full-vector reads remain negligible
    * (200·5 rows at ×100).
    */
  // `final` makes this a compile-time constant, inlined at use sites —
  // pqTopKSql (defined ABOVE in initialization order) interpolates it, and
  // a plain val would still be 0 there when that initializer runs.
  final val RerankKMin = 50

  /** Effective re-rank budget for a corpus of `corpusRows` vectors. */
  def rerankK(corpusRows: Long): Long =
    math.max(RerankKMin.toLong, corpusRows / 1000L)

  /** IVF-PQ with exact re-rank — the billion-scale production composition
    * (what FAISS's IndexIVFPQ + refine does): the coarse quantizer prunes
    * the corpus to [[NProbe]]/[[nCentroids]] inverted lists, PQ codes
    * approximate distances WITHIN the probed lists from the compact
    * code+LUT representation (no full-vector reads), the top-[[rerankK]]
    * ADC candidates are then re-scored with exact cosine and the final
    * top-[[TopK]] re-ranked. At 100 TB the full vectors are touched only
    * for rerankK·Q rows (a key join against candidate ids) — everything
    * before that moves 4-byte-per-subspace codes through one list-id
    * shuffle. Both quantizers reuse the entries' deterministic seeded
    * codebooks, so the oracle replays the identical index.
    */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    // coarse quantizer (g_ prefix: inverted-list id; shared w/ ivfTopK)
    val gcent = emb.where(s"vec_id < ${nCentroids(spark, dir)}")
      .selectExpr("vec_id AS g_id", "emb AS g_emb", "nrm AS g_nrm")
    def nearestCoarse(src: DataFrame, idAs: String, keep: Int): DataFrame =
      if (keep == 1) assignOne(src, gcent, idAs, "g_id", "g_emb", "g_nrm", "gsim", "grk")
      else src.crossJoin(broadcast(gcent))
        .selectExpr(s"vec_id AS $idAs", "emb", "nrm", "g_id",
          s"round(${cosineExpr("emb", "g_emb", "nrm", "g_nrm")}, 6) AS gsim")
        .withColumn("grk", expr(
          s"row_number() OVER (PARTITION BY $idAs ORDER BY gsim DESC, g_id)"))
        .where(s"grk <= $keep")
    val lists = nearestCoarse(emb, "vec_id", 1).select("vec_id", "g_id")
    // PQ encode (same construction as pqTopK: seeded sub-codebooks)
    val subSlices = (0 until PqM)
      .map(m => s"slice(emb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val subs = emb.selectExpr("vec_id", "nrm",
      s"posexplode(array($subSlices)) AS (m, sub)")
    val cent = subs.where(s"vec_id < $PqK")
      .selectExpr("m", "vec_id AS c_id", "sub AS c_sub",
        s"CAST(floor(graft_dot(sub, sub) * $QScale.0 + 0.5) AS BIGINT) AS cq")
    val codes = subs.join(broadcast(cent), "m")
      .selectExpr("vec_id", "m", "c_id",
        s"""round(graft_dot(sub, sub) - 2 * graft_dot(sub, c_sub)
           |  + graft_dot(c_sub, c_sub), 6) AS d2""".stripMargin)
      .withColumn("crk", expr(
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, c_id ASC)"))
      .where("crk = 1").select("vec_id", "m", "c_id")
    val lut = subs.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "nrm AS q_nrm", "m", "sub AS q_sub")
      .join(broadcast(cent), "m")
      .selectExpr("q_id", "q_nrm", "m", "c_id",
        s"CAST(floor(graft_dot(q_sub, c_sub) * $QScale.0 + 0.5) AS BIGINT) AS pq",
        "cq")
    // candidate set = probed lists only; ADC-score candidates from codes
    val probes = nearestCoarse(emb.where(s"vec_id < $QuerySetSize"), "q_id", NProbe)
      .select("q_id", "g_id")
    val cand = probes.join(lists, "g_id")
      .where(col("vec_id") =!= col("q_id")).select("q_id", "vec_id")
    val adc = cand
      .join(codes, "vec_id")
      .join(broadcast(lut), Seq("q_id", "m", "c_id"))
      .groupBy("q_id", "vec_id")
      .agg(max("q_nrm").as("q_nrm"), sum("pq").as("adcq"), sum("cq").as("rq"))
      .selectExpr("q_id", "vec_id",
        s"""round((CAST(adcq AS DOUBLE) / $QScale.0)
           |  / (q_nrm * sqrt(CAST(rq AS DOUBLE) / $QScale.0)), 6) AS adc_sim""".stripMargin)
      .withColumn("ark", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, vec_id ASC)"))
      .where(s"ark <= ${rerankK(corpusStats(spark, dir)._1)}")
    // exact re-rank of the rerankK survivors (the only full-vector reads)
    val qv = emb.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    adc.select("q_id", "vec_id")
      .join(emb.select("vec_id", "emb", "nrm"), "vec_id")
      .join(broadcast(qv), "q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val ivfPqTopKSql: String = {
    val subSelects = (0 until PqM)
      .map(m => s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM emb")
      .mkString("\n  UNION ALL ")
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    s"""WITH $embCte,
       |gcent AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |lists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT e.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, gcent g)
       |  WHERE grk = 1),
       |probes AS (
       |  SELECT q_id, g_id FROM (
       |    SELECT e.vec_id AS q_id, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, gcent g WHERE e.vec_id < $QuerySetSize)
       |  WHERE grk <= $NProbe),
       |subs AS (
       |  $subSelects),
       |cent AS (SELECT m, vec_id AS c_id, sub AS c_sub,
       |                floor(${normSq("sub")} * $QScale.0 + 0.5)::BIGINT AS cq
       |         FROM subs WHERE vec_id < $PqK),
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM subs s JOIN cent c USING (m))
       |  WHERE crk = 1),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq,
       |         c.cq
       |  FROM subs s JOIN cent c USING (m) WHERE s.vec_id < $QuerySetSize),
       |cand AS (
       |  SELECT p.q_id, l.vec_id
       |  FROM probes p JOIN lists l USING (g_id) WHERE l.vec_id <> p.q_id),
       |adc AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT s.q_id, s.vec_id,
       |           row_number() OVER (PARTITION BY s.q_id ORDER BY
       |             round((s.adcq::DOUBLE / $QScale.0)
       |               / (s.q_nrm * sqrt(s.rq::DOUBLE / $QScale.0)), 6) DESC,
       |             s.vec_id ASC) AS ark
       |    FROM (
       |      SELECT n.q_id, n.vec_id, max(l.q_nrm) AS q_nrm,
       |             sum(l.pq)::BIGINT AS adcq, sum(l.cq)::BIGINT AS rq
       |      FROM cand n
       |      JOIN codes c ON c.vec_id = n.vec_id
       |      JOIN lut l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |      GROUP BY n.q_id, n.vec_id) s)
       |  WHERE ark <= greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT a.q_id, a.vec_id,
       |         round(${cosineSql("q.emb", "e.emb", "q.nrm", "e.nrm")}, 6) AS sim
       |  FROM adc a
       |  JOIN emb e ON e.vec_id = a.vec_id
       |  JOIN emb q ON q.vec_id = a.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  // -------------------------------------------------------- recall gate

  /** Minimum recall@[[TopK]] (percent) of each approximate index vs the
    * brute-force truth. Measured on the synthetic embeddings: LSH 12%
    * (coarse 4-bit single-table demo), multi-table LSH 56% (8 tables),
    * IVF 92%, trained IVF 88%, PQ 36% — gates sit under those with margin
    * but high enough that a silently quality-degrading "optimization"
    * flips the row (round-5 verdict item 4).
    */
  val RecallGatePct: Seq[(String, Int)] = Seq(
    "lsh" -> 8, "lsh_multi" -> 40, // single-table 12% / 8-table 56% measured
    "ivf" -> 80, "ivf_trained" -> 80,
    // pq: with the adaptive exact re-rank (round-13) 60% sf0.01 / 64%
    // sf0.1 — scale-stable where raw ADC decayed to 20% at sf0.1
    "pq" -> 48,
    "ivfpq" -> 72, // measured 84% at sf0.01 (rerankK floor); margin matches ivf
    "sq8" -> 90, // int8 storage barely moves top-k (measured 96% at sf0.01)
    "ivf_sq8" -> 80) // quantized lists + exact re-rank tracks ivf (measured 92% sf0.01 / 100% sf0.1)

  /** Retrieval-quality gate: recall of every approximate ANN entry against
    * [[bruteForceTopK]] truth, as EXACT integers (hits, truth) plus a
    * thresholded boolean. The hash oracle recomputes the same constructions
    * in DuckDB (each already individually hash-matched), so hits/truth are
    * bit-identical; the `ok` gate is where the quality contract lives —
    * the `x_sketch_stats` tolerance-gate pattern applied to retrieval.
    */
  def recallGate(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceTopK(spark, dir).select("q_id", "vec_id")
    val truth = bf.agg(count(lit(1)).as("truth"))
    val approx = Map[String, DataFrame](
      "lsh" -> lshTopK(spark, dir),
      "lsh_multi" -> lshMultiTopK(spark, dir),
      "ivf" -> ivfTopK(spark, dir),
      "ivf_trained" -> ivfTrainedTopK(spark, dir),
      "pq" -> pqTopK(spark, dir),
      "ivfpq" -> ivfPqTopK(spark, dir),
      "sq8" -> sq8TopK(spark, dir),
      "ivf_sq8" -> ivfSq8TopK(spark, dir))
    val tagged = RecallGatePct.map { case (name, thr) =>
      approx(name).selectExpr(s"'$name' AS method", "q_id", "vec_id",
        s"CAST($thr AS BIGINT) AS thr_pct")
    }.reduce(_.unionByName(_))
    // methods frame keeps a method visible even at 0 hits
    val methods = RecallGatePct.map { case (name, thr) =>
      s"('$name', CAST($thr AS BIGINT))"
    }.mkString("VALUES ", ", ", "")
    val hits = tagged.join(bf, Seq("q_id", "vec_id"))
      .groupBy("method", "thr_pct").agg(count(lit(1)).as("hits"))
    spark.sql(s"SELECT col1 AS method, col2 AS thr_pct FROM ($methods)")
      .join(hits, Seq("method", "thr_pct"), "left")
      .crossJoin(broadcast(truth))
      .selectExpr("method",
        "coalesce(hits, CAST(0 AS BIGINT)) AS hits", "truth", "thr_pct",
        "coalesce(hits, CAST(0 AS BIGINT)) * 100 >= thr_pct * truth AS ok")
      .orderBy("method")
  }

  def recallGateSql: String = {
    val methodCtes = Seq(
      "lsh" -> lshTopKSql, "lsh_multi" -> lshMultiTopKSql,
      "ivf" -> ivfTopKSql,
      "ivf_trained" -> ivfTrainedTopKSql, "pq" -> pqTopKSql,
      "ivfpq" -> ivfPqTopKSql, "sq8" -> sq8TopKSql,
      "ivf_sq8" -> ivfSq8TopKSql)
      .map { case (n, sql) => s"ap_$n AS (SELECT q_id, vec_id FROM ($sql))" }
      .mkString(",\n")
    val thrRows = RecallGatePct
      .map { case (n, t) => s"('$n', $t::BIGINT)" }.mkString(", ")
    val tagged = RecallGatePct.map { case (n, _) =>
      s"SELECT '$n' AS method, q_id, vec_id FROM ap_$n"
    }.mkString("\nUNION ALL\n")
    s"""WITH bf AS (SELECT q_id, vec_id FROM ($bruteForceTopKSql)),
       |$methodCtes,
       |thr(method, thr_pct) AS (VALUES $thrRows),
       |tagged AS ($tagged),
       |hits AS (
       |  SELECT method, count(*)::BIGINT AS hits
       |  FROM tagged JOIN bf USING (q_id, vec_id) GROUP BY method),
       |truth AS (SELECT count(*)::BIGINT AS truth FROM bf)
       |SELECT t.method, COALESCE(h.hits, 0)::BIGINT AS hits, truth.truth,
       |       t.thr_pct,
       |       COALESCE(h.hits, 0) * 100 >= t.thr_pct * truth.truth AS ok
       |FROM thr t LEFT JOIN hits h USING (method) CROSS JOIN truth
       |ORDER BY method""".stripMargin
  }

  /** Filtered ANN — exact top-k restricted to a metadata predicate (same
    * label as the query): the production vector-search shape where the
    * filter must live INSIDE the search, not after it (post-filtering an
    * approximate candidate list silently returns fewer than k). The label
    * equality rides the join condition, so the candidate set is
    * label-local before any scoring happens — at 100 TB the predicate
    * PRUNES the scan ~|labels|-fold instead of discarding scored results,
    * and composing it with the LSH/IVF bucket key (join on
    * (bucket, label)) is the same one-line change in those entries.
    */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embDouble(spark, dir)
    val queries = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "label AS q_label",
        "emb AS q_emb", "nrm AS q_nrm")
    corpus.join(broadcast(queries),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  val filteredTopKSql: String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb, nrm AS q_nrm
       |      FROM emb WHERE vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM emb e, q
       |  WHERE e.label = q.q_label AND e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  // ------------------------------------------- incremental IVF index

  /** Wave split for the incremental-ANN entries (same shape as
    * [[graft.pipeline.Dedup.IncrSplitMod]] for the dedup index family):
    * historical corpus = `vec_id % IvfSplitMod != 0`; wave 1 =
    * `vec_id % (2·IvfSplitMod) == 0`; wave 2 =
    * `vec_id % (2·IvfSplitMod) == IvfSplitMod`.
    */
  val IvfSplitMod = 4

  /** Name of the build-time inverted-list manifest inside an IVF index
    * dir: one non-empty `c_id` per line. Same metastore-stand-in contract
    * as [[graft.pipeline.Dedup.ManifestFile]] (single-level key here, so
    * the two manifests stay separate implementations): the probe's ONLY
    * pruning input, never the filesystem.
    */
  val ListsManifestFile = "_lists"

  private def hadoopFs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def listsManifestWrite(spark: SparkSession, indexPath: String,
      lists: Set[Long]): Unit = {
    val (fs, _) = hadoopFs(spark, indexPath)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(indexPath, ListsManifestFile), true)
    try out.write(lists.toSeq.sorted.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Committed inverted-list ids. FAILS LOUD when absent — a pruned probe
    * must never silently degrade to an empty result.
    */
  def listsManifestRead(spark: SparkSession, indexPath: String): Set[Long] = {
    val (fs, _) = hadoopFs(spark, indexPath)
    val mf = new org.apache.hadoop.fs.Path(indexPath, ListsManifestFile)
    if (!fs.exists(mf))
      throw new IllegalStateException(
        s"no $ListsManifestFile manifest at $indexPath — index was not " +
          "built by ensureIvfIndex; rebuild the index")
    val in = fs.open(mf)
    val text = try {
      val bs = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 65536, false)
      bs.toString("UTF-8")
    } finally in.close()
    text.split('\n').iterator.filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** The shared coarse codebook: the first `nc` corpus vectors (same
    * seeded rule as [[ivfTopK]]/[[ivfPqTopK]]) — a frozen training
    * artifact. [[ensureIvfIndex]] PERSISTS it inside the index dir
    * ([[CodebookDir]]), and every consumer of a built index (probe,
    * append, stream, the scale harness) reads it back from there rather
    * than re-deriving from whatever corpus happens to be at hand — with
    * corpus-adaptive sizing, an index's codebook and a different corpus's
    * derived codebook need not agree.
    */
  private def coarseCent(emb: DataFrame, nc: Int): DataFrame =
    emb.where(s"vec_id < $nc")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")

  /** Codebook subdir inside an IVF index (leading underscore: invisible
    * to parquet scans of the index root, like `_lists`/`_SUCCESS`).
    */
  val CodebookDir = "_codebook"

  /** The persisted codebook of a built index. Fails loud when absent —
    * probing with a mismatched codebook silently returns wrong neighbors.
    */
  def indexCodebook(spark: SparkSession, indexPath: String): DataFrame = {
    val (fs, _) = hadoopFs(spark, indexPath)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/$CodebookDir/_SUCCESS")))
      throw new IllegalStateException(
        s"no $CodebookDir at $indexPath — index was not built by " +
          "ensureIvfIndex; rebuild the index")
    spark.read.parquet(s"$indexPath/$CodebookDir")
  }

  /** Rank-1 centroid assignment as a MAP-SIDE-COMBINABLE argmax, shared by
    * every keep=1 site in the ANN family: a row_number window over the N×K
    * crossJoin shuffles all N×K candidate rows WITH the 64-double vector
    * riding along (×100 measured: the window form cost `sim_ivf_topk`
    * 122 s, ~27 GB exchanged); `max(struct(csim, -cid))` carries only the
    * score pair, collapses to one row per vector BEFORE the exchange
    * (each vector's K candidate rows are partition-local to the broadcast
    * join), and the vectors rejoin by key. Identical semantics to
    * `ORDER BY csim DESC, cid ASC` rank-1 — struct comparison is
    * lexicographic and `-cid` turns min-id tiebreak into max. Output
    * schema matches the window form (id, emb, nrm, cid, sim, rk=1).
    */
  private def assignOne(src: DataFrame, cent: DataFrame, idAs: String,
      cid: String, cemb: String, cnrm: String, simAs: String,
      rkAs: String): DataFrame = {
    val best = src.crossJoin(broadcast(cent))
      .selectExpr("vec_id",
        s"named_struct('s', round(${cosineExpr("emb", cemb, "nrm", cnrm)}, 6), " +
          s"'nci', -$cid) AS sc")
      .groupBy("vec_id").agg(max("sc").as("sc"))
      .selectExpr("vec_id", s"sc.s AS $simAs", s"-sc.nci AS $cid")
    src.join(best, Seq("vec_id"))
      .selectExpr(s"vec_id AS $idAs", "emb", "nrm", cid, simAs,
        s"CAST(1 AS INT) AS $rkAs")
  }

  /** `src` rows tagged with their `keep` nearest coarse centroids
    * (rank-1 = list assignment; rank ≤ [[NProbe]] = probe set). Rounded
    * cosine with c_id tiebreak, so both engines agree exactly. keep=1
    * routes through [[assignOne]] (combinable aggregate — the corpus-sized
    * case); the window form only ever ranks query batches (Q×K rows).
    */
  private def nearestLists(src: DataFrame, cent: DataFrame, idAs: String,
      keep: Int): DataFrame =
    if (keep == 1) assignOne(src, cent, idAs, "c_id", "c_emb", "c_nrm", "csim", "crk")
    else src.crossJoin(broadcast(cent))
      .selectExpr(s"vec_id AS $idAs", "emb", "nrm", "c_id",
        s"round(${cosineExpr("emb", "c_emb", "nrm", "c_nrm")}, 6) AS csim")
      .withColumn("crk", expr(
        s"row_number() OVER (PARTITION BY $idAs ORDER BY csim DESC, c_id)"))
      .where(s"crk <= $keep")

  /** Persisted-IVF-index location, keyed by corpus dir, codebook size AND
    * the corpus content fingerprint from [[corpusStats]] (same never-share
    * contract as [[graft.pipeline.Dedup.indexPath]]) — a regenerated
    * corpus at the same dir lands on a fresh path and rebuilds instead of
    * silently reusing a stale index (round-11 advice).
    */
  def ivfIndexPath(spark: SparkSession, dir: String): String = {
    val (rows, _, fp) = corpusStats(spark, dir)
    "/tmp/graft_ivf_index/" + dir.replaceAll("[^A-Za-z0-9.]", "_") +
      s"_c${nCentroids(rows)}_n${rows}_f$fp"
  }

  /** Build-once: the historical corpus's inverted lists — (vec_id, emb,
    * nrm) assigned to the nearest coarse centroid — written partitioned
    * by `c_id` (one dir per inverted list, rows sorted by vec_id), plus
    * the [[ListsManifestFile]] manifest. This is the disk-resident form
    * of what [[ivfTopK]] recomputes per query: at 100 TB the assignment
    * pass runs once, and every probe after it reads only its
    * [[NProbe]] touched list dirs — batch-proportional IO, index-size-
    * independent, the same storage contract as the MinHash band index
    * ([[graft.pipeline.Dedup.ensureMinhashIndex]]).
    */
  def ensureIvfIndex(spark: SparkSession, dir: String): String = {
    val path = ivfIndexPath(spark, dir)
    val (fs, root) = hadoopFs(spark, path)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    // build into a temp sibling, publish with ONE atomic rename — racing
    // processes can no longer clobber each other mid-build (IndexCommit)
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      val emb = embDouble(spark, dir)
      val cent = coarseCent(emb, nCentroids(spark, dir))
      nearestLists(emb.where(s"vec_id % $IvfSplitMod <> 0"), cent,
          "vec_id", 1)
        .select("vec_id", "emb", "nrm", "c_id")
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      // codebook travels WITH the index; manifest last = the commit marker
      // inside the temp — the rename then makes all three visible at once
      cent.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    path
  }

  /** Probe an already-built IVF index: nearest [[NProbe]] centroids per
    * query, manifest-intersected, then exact cosine over ONLY the touched
    * `c_id=` dirs (basePath-rooted point lookups — the reader never lists
    * the index root). Output shape matches the other topk entries.
    */
  def incrementalIvfProbe(spark: SparkSession, queries: DataFrame,
      cent: DataFrame, indexPath: String, k: Int = TopK): DataFrame = {
    probeCandidates(spark, queries, cent, indexPath)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $k")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  /** Manifest-pruned candidate scoring over a persisted float IVF index:
    * nearest [[NProbe]] lists per query, only touched `c_id=` dirs read
    * (basePath-rooted point lookups — the reader never lists the index
    * root), one exact rounded cosine per (query, stored vector)
    * candidate. [[incrementalIvfProbe]] ranks and cuts this to top-k;
    * [[decontaminateSemanticIndexed]] thresholds it instead — ALL
    * near-enough candidates matter there, not the k best.
    */
  private def probeCandidates(spark: SparkSession, queries: DataFrame,
      cent: DataFrame, indexPath: String, nprobe: Int = NProbe): DataFrame = {
    val probes = nearestLists(queries, cent, "q_id", nprobe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    val manifest = listsManifestRead(spark, indexPath) // fails loud if absent
    val touchedDirs = probes.select("c_id").distinct()
      .collect() // ≤ Q × NProbe list ids: metadata-scale
      .map(_.getLong(0))
      .filter(manifest.contains) // absent from manifest = empty list
      .sorted.map(c => s"$indexPath/c_id=$c")
    val idx =
      if (touchedDirs.isEmpty) spark.read.parquet(indexPath).limit(0)
      else spark.read.option("basePath", indexPath).parquet(touchedDirs: _*)
    idx.join(broadcast(probes), "c_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
  }

  /** Index-backed semantic decontamination — the production twin
    * [[CorpusOps.decontaminateSemantic]]'s scaladoc promises: at 100 TB
    * you don't brute-force eval×corpus, you probe the PERSISTED float
    * IVF index with the benchmark rows and exact-score only the touched
    * lists. Flagged docs are exactly the indexed-split candidates whose
    * probe cosine clears [[CorpusOps.SemanticTau]] (per doc: nearest
    * eval item, smaller-id tie-break) — IO is probe-proportional, and
    * clean docs outside the probed lists are never read. Approximate by
    * construction (a contaminated doc in an unprobed list is missed —
    * the spec measures recall against the exact entry and gates ≥ 75%);
    * the oracle replays the probe from scratch, so the hash is still
    * exact. Probe depth is [[DeconProbes]], deeper than the search
    * family's [[NProbe]]: a missed contamination costs more than extra
    * list IO, so the recall/IO dial sits recall-ward here (measured
    * 0.50 → 0.82/0.89 going 4 → 10 on the near-uniform synthetic
    * geometry; real clustered embeddings route far better).
    */
  val DeconProbes = 10

  def decontaminateSemanticIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val path = ensureIvfIndex(spark, dir)
    val cent = indexCodebook(spark, path)
    val evalQ = emb.where(s"vec_id % ${CorpusOps.EvalEvery} = 0 AND " +
      s"vec_id < ${CorpusOps.EvalEvery * CorpusOps.SemanticEvalCap}")
    probeCandidates(spark, evalQ, cent, path, DeconProbes)
      .where(s"vec_id % ${CorpusOps.EvalEvery} != 0 AND " +
        s"sim >= ${CorpusOps.SemanticTau}")
      .selectExpr("vec_id AS doc_id",
        "named_struct('sim', sim, 'neg', -q_id) AS c")
      .groupBy("doc_id")
      .agg(max("c").as("m"))
      .selectExpr("doc_id", "-m.neg AS nearest_eval", "m.sim AS max_sim")
      .orderBy("doc_id")
  }

  val decontaminateSemanticIndexedSql: String = {
    def assign(src: String, idAs: String, keep: String): String =
      s"""SELECT $idAs, c_id FROM (
         |    SELECT s.vec_id AS $idAs, c.c_id,
         |           row_number() OVER (PARTITION BY s.vec_id ORDER BY
         |             round(${cosineSql("s.emb", "c.c_emb", "s.nrm", "c.c_nrm")}, 6) DESC,
         |             c.c_id) AS crk
         |    FROM $src s, cent c)
         |  WHERE $keep""".stripMargin
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE vec_id % $IvfSplitMod <> 0),
       |lists AS (${assign("hist", "vec_id", "crk = 1")}),
       |vq AS (SELECT vec_id, emb, nrm FROM emb
       |       WHERE vec_id % ${CorpusOps.EvalEvery} = 0
       |         AND vec_id < ${CorpusOps.EvalEvery * CorpusOps.SemanticEvalCap}),
       |probes AS (${assign("vq", "eval_id", s"crk <= $DeconProbes")}),
       |cand AS (
       |  SELECT l.vec_id AS doc_id, p.eval_id,
       |         round(${cosineSql("q.emb", "e.emb", "q.nrm", "e.nrm")}, 6) AS sim
       |  FROM probes p
       |  JOIN lists l USING (c_id)
       |  JOIN emb e ON e.vec_id = l.vec_id
       |  JOIN vq q ON q.vec_id = p.eval_id
       |  WHERE l.vec_id % ${CorpusOps.EvalEvery} <> 0),
       |m AS (
       |  SELECT doc_id, eval_id, sim,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY sim DESC, eval_id ASC) AS rk
       |  FROM cand WHERE sim >= ${CorpusOps.SemanticTau})
       |SELECT doc_id, eval_id AS nearest_eval, sim AS max_sim
       |FROM m WHERE rk = 1 ORDER BY doc_id""".stripMargin
  }

  /** Manifest-pruned IVF ranks at depth `k` for the standard
    * `vec_id < QuerySetSize` query set — the INDEXED vector leg of
    * [[Retrieval.hybridRrfIndexed]]: same persisted index, codebook and
    * probe IO contract as [[incrementalIvf]], rank depth decoupled.
    */
  private[pipeline] def ivfRanks(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val path = ensureIvfIndex(spark, dir)
    incrementalIvfProbe(spark,
      embDouble(spark, dir).where(s"vec_id < $QuerySetSize"),
      indexCodebook(spark, path), path, k)
      .select("q_id", "vec_id", "rk")
  }

  /** DuckDB CTE fragment replaying [[ivfRanks]] — defines `emb`, `cent`,
    * `hist`, `lists`, `vq`, `probes` and `vec_rk(q_id, vec_id, rk)`;
    * splice after WITH in a caller query.
    */
  private[pipeline] def ivfRanksCtes(k: Int): String =
    s"""$embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE vec_id % $IvfSplitMod <> 0),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM hist h, cent c)
       |  WHERE crk = 1),
       |vq AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |       WHERE vec_id < $QuerySetSize),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT vq.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY vq.q_id ORDER BY
       |             round(${cosineSql("vq.q_emb", "c.c_emb", "vq.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM vq, cent c)
       |  WHERE crk <= $NProbe),
       |vec_rk AS (
       |  SELECT q_id, vec_id, rk::BIGINT AS rk FROM (
       |    SELECT p.q_id, l.vec_id,
       |           row_number() OVER (PARTITION BY p.q_id ORDER BY
       |             round(${cosineSql("vq.q_emb", "e.emb", "vq.q_nrm", "e.nrm")}, 6) DESC,
       |             l.vec_id) AS rk
       |    FROM probes p
       |    JOIN lists l USING (c_id)
       |    JOIN emb e ON e.vec_id = l.vec_id
       |    JOIN vq ON vq.q_id = p.q_id
       |    WHERE l.vec_id <> p.q_id)
       |  WHERE rk <= $k)""".stripMargin

  /** Wave-`rem` query vectors: the first [[QuerySetSize]] wave members. */
  private def waveQueries(emb: DataFrame, rem: Int): DataFrame = {
    val w = 2 * IvfSplitMod
    emb.where(
      s"vec_id % $w = $rem AND vec_id < ${w.toLong * QuerySetSize + rem}")
  }

  /** Wave-1 queries for `dir` — the probe input the scale harness holds
    * fixed while swapping indexes underneath (`graft.tools.Scale
    * ivfprobe`). The codebook is NOT derived here: with adaptive sizing
    * it belongs to the index ([[indexCodebook]]), not the query batch.
    */
  def ivfProbeInputs(spark: SparkSession, dir: String): DataFrame =
    waveQueries(embDouble(spark, dir), 0)

  /** The corpus float vectors (vec_id, emb, nrm) — the exact-re-rank
    * input of the SQ8 probe, exposed for the scale harness
    * (`graft.tools.Scale ivfprobe`'s SQ8 leg).
    */
  def corpusFloats(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)

  /** Incremental ANN, probe leg: wave-1 queries against the PERSISTED
    * historical index — the cross-run "search what is already ingested"
    * operation, reading only probed list dirs, with the index's own
    * persisted codebook choosing the probe set.
    */
  def incrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfIndex(spark, dir)
    val emb = embDouble(spark, dir)
    incrementalIvfProbe(spark, waveQueries(emb, 0),
      indexCodebook(spark, path), path)
  }

  /** Incremental ANN, ingest leg: wave-1 vectors are assigned to their
    * lists and appended IN PLACE — [[graft.streaming.Sinks
    * .partitionedUpsertBatch]] merges and rewrites ONLY the touched
    * `c_id=` dirs, the manifest commit makes new lists probe-visible, and
    * wave-2 queries then probe the augmented index (their top-k can now
    * contain wave-1 vectors). Append cost is O(batch + touched lists),
    * independent of index size — the same deployment-shaped cycle as
    * [[graft.pipeline.Dedup.incrementalAppendInplace]]. The working copy
    * is a hermeticity tax only (the shared index must not be mutated by a
    * query entry); a deployment appends to the live index.
    */
  def incrementalIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfIndex(spark, dir)
    val aug = graft.TempDirs.scoped("ivf-incr") +
      s"/index_c${nCentroids(spark, dir)}"
    // hermeticity tax only: file-level tree copy (inverted lists,
    // codebook, manifest, _SUCCESS travel verbatim) — the shared index
    // stays immutable without a decode/shuffle/re-encode of its rows
    graft.TempDirs.copyTree(spark, path, aug)
    val cent = indexCodebook(spark, aug)

    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave1 = nearestLists(emb.where(s"vec_id % $w = 0"), cent,
        "vec_id", 1)
      .select("vec_id", "emb", "nrm", "c_id")
      .persist() // read twice (touched set, merge+write) — one compute
    val touched = wave1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet
    graft.streaming.Sinks.partitionedUpsertBatch(wave1.toDF(), aug,
      partitionCols = Seq("c_id"), keyCols = Seq("vec_id"),
      versionCols = Seq("vec_id"), sortCols = Seq("vec_id"))
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)

    val out =
      incrementalIvfProbe(spark, waveQueries(emb, IvfSplitMod),
        indexCodebook(spark, aug), aug)
    wave1.unpersist() // probe reads the written files, not the plan
    out
  }

  // ---------------------------------------------- index compaction

  /** LSM-style fast-path ingest into a float-IVF index: the batch lands
    * as NEW part files inside its touched `c_id=` dirs — O(batch) write
    * cost with NO rewrite of existing list bytes. This is the cheap dual
    * of [[incrementalIvfAppend]]'s merge-upsert (which REWRITES every
    * touched list each wave — write amplification a high-rate ingest
    * can't pay at 100 TB). The price is FRAGMENTATION: every wave adds a
    * file per touched list and probes pay per-file open/footer overhead,
    * which [[compactIvfIndex]] — the OPTIMIZE of the index family (r14
    * verdict item 4) — pays back. Caller commits the manifest after.
    */
  private def ivfAppendFiles(spark: SparkSession, indexPath: String,
      batch: DataFrame): Unit =
    batch.select("vec_id", "emb", "nrm", "c_id")
      .repartition(col("c_id"))
      .sortWithinPartitions("c_id", "vec_id")
      .write.mode("append").partitionBy("c_id").parquet(indexPath)

  /** Per-list data-file counts of a committed index — the fragmentation
    * accounting ([[graft.pipeline.IvfCompactSpec]] pins N→1).
    */
  def listFileCounts(spark: SparkSession, indexPath: String)
      : Map[Long, Int] = {
    val (fs, _) = hadoopFs(spark, indexPath)
    listsManifestRead(spark, indexPath).toSeq.sorted.map { c =>
      val d = new org.apache.hadoop.fs.Path(s"$indexPath/c_id=$c")
      c -> fs.listStatus(d).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }.toMap
  }

  /** OPTIMIZE for the persisted float-IVF index: rewrite every
    * FRAGMENTED inverted list (>1 data file) to ONE sorted file, copy
    * single-file lists and the codebook VERBATIM (no decode), and
    * publish the compacted index at `dst` via [[IndexCommit]] — the
    * source index stays fully readable until the single atomic rename,
    * exactly the [[SnapshotMv]] OPTIMIZE contract at index granularity.
    * Probe results are bit-identical pre/post (same rows, re-sorted):
    * the spec asserts it and the committed entry's oracle replays the
    * probe from scratch, so the hash gates it too. At 100 TB compaction
    * IO is proportional to the FRAGMENTED lists only — freshly-compacted
    * lists cost a directory listing, nothing more.
    */
  def compactIvfIndex(spark: SparkSession, src: String, dst: String): Unit = {
    val (fs, dstRoot) = hadoopFs(spark, dst)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    val counts = listFileCounts(spark, src)
    val fragmented = counts.collect { case (c, n) if n > 1 => c }.toSeq.sorted
    IndexCommit.ensure(fs, dstRoot)(committed) { tmp =>
      counts.keysIterator.filter(c => counts(c) <= 1).toSeq.sorted.foreach {
        c => graft.TempDirs.copyTree(spark, s"$src/c_id=$c", s"$tmp/c_id=$c")
      }
      graft.TempDirs.copyTree(spark, s"$src/$CodebookDir",
        s"$tmp/$CodebookDir")
      if (fragmented.nonEmpty) {
        val dirs = fragmented.map(c => s"$src/c_id=$c")
        spark.read.option("basePath", src).parquet(dirs: _*)
          .select("vec_id", "emb", "nrm", "c_id")
          .repartition(col("c_id"))
          .sortWithinPartitions("c_id", "vec_id")
          .write.mode("append").partitionBy("c_id").parquet(tmp.toString)
      }
      val succ = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
      if (!fs.exists(succ)) fs.create(succ).close()
      listsManifestWrite(spark, tmp.toString, counts.keySet)
    }
  }

  /** Q — the committed compaction entry: file-append wave 1 into a
    * working copy (fragmenting its touched lists), OPTIMIZE into a fresh
    * root, probe wave-2 queries against the COMPACTED index. Identical
    * append semantics to [[incrementalIvfAppend]], so the
    * recompute-from-scratch oracle is shared verbatim — a compaction
    * that dropped, duplicated, or re-listed any vector breaks the hash.
    * [[graft.pipeline.IvfCompactSpec]] additionally pins probe equality
    * pre/post-compaction and the N→1 files-per-list collapse.
    */
  def incrementalIvfCompact(spark: SparkSession, dir: String): DataFrame = {
    val (frag, opt) = compactedWorkingIndex(spark, dir)
    val _ = frag
    incrementalIvfProbe(spark, waveQueries(embDouble(spark, dir), IvfSplitMod),
      indexCodebook(spark, opt), opt)
  }

  /** The entry's index pair: (fragmented working copy after a file-append
    * wave, its compacted OPTIMIZE output) — exposed so the spec can
    * probe/count both sides of the same artifacts the entry ships.
    */
  def compactedWorkingIndex(spark: SparkSession, dir: String)
      : (String, String) = {
    val path = ensureIvfIndex(spark, dir)
    val aug = graft.TempDirs.scoped("ivf-compact") + "/frag"
    graft.TempDirs.copyTree(spark, path, aug)
    val cent = indexCodebook(spark, aug)
    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave1 = nearestLists(emb.where(s"vec_id % $w = 0"), cent,
        "vec_id", 1)
      .select("vec_id", "emb", "nrm", "c_id")
      .persist() // read twice (touched set, file append) — one compute
    val touched = wave1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet
    ivfAppendFiles(spark, aug, wave1.toDF())
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)
    wave1.unpersist()
    val opt = graft.TempDirs.scoped("ivf-compact") + "/opt"
    compactIvfIndex(spark, aug, opt)
    (aug, opt)
  }

  // ------------------------------- index refresh under distribution drift

  /** Drift of the refresh surface: an incoming wave whose embedding
    * model has shifted — each vector translated by a common anchor,
    * `d = v + DriftShift·1⃗` (the shift is 2⁻³, binary-exact, so both
    * engines derive identical drifted vectors). Strength calibrated on
    * the unit-norm synthetic embeddings (anchor norm ‖0.125·1⃗‖ = 1 ≈
    * ‖v‖): strong enough that the wave sits OFF the frozen-centroid
    * geometry (its assignments split on anchor-vs-residual boundary
    * noise the query's probe ranking does not share), weak enough that
    * within-wave neighbor structure survives for a RETRAINED codebook to
    * capture — the regime where frozen routing measurably loses recall
    * and Lloyd re-training recovers it (a 4× stronger shift re-
    * concentrates everything into one probed list and recall snaps back;
    * measured in the builder's parameter scan).
    */
  val DriftShift = 0.125

  private def driftDF(src: DataFrame): DataFrame = src
    .selectExpr("vec_id",
      s"transform(emb, x -> x + CAST($DriftShift AS DOUBLE)) AS emb")
    .selectExpr("vec_id", "emb", "sqrt(graft_dot(emb, emb)) AS nrm")

  /** Q — `sim_ivf_refresh` (r15 verdict item 8): quantify what frozen
    * centroids cost under distribution drift, then run the refresh a
    * production index operator would:
    *
    *  1. the DRIFTED wave-1 ([[driftDF]]) is appended to a working copy
    *     of the persisted float index using the FROZEN codebook — the
    *     status-quo ingest path ([[incrementalIvfAppend]]'s cycle);
    *  2. drifted wave-2 queries probe the stale index → top-k; recall is
    *     measured against the EXACT brute-force truth over the index
    *     content (hist ∪ drifted wave);
    *  3. the refresh: centroids are RE-TRAINED on the current content
    *     ([[trainedCentroids]]' Lloyd loop — the same machinery as
    *     `sim_ivf_trained`), every stored vector is RE-CODED
    *     (re-assigned) and written into a NEW root published atomically
    *     via [[IndexCommit]] (the [[compactIvfIndex]] OPTIMIZE contract:
    *     the stale index stays fully readable until one rename);
    *  4. the same queries probe the refreshed index → the after row.
    *
    * Output: one row per phase with EXACT integers
    * `(phase, hits, truth)` — recall numerator/denominator against the
    * shared brute truth, both phases under the hash (a refresh that
    * lost/duplicated a vector, kept stale assignments, or drifted the
    * Lloyd trajectory breaks it). Measured: stale 14/25 → refreshed
    * 25/25 at sf0.01 (16/25 → 25/25 at sf0.001, 17/25 → 25/25 at
    * sf0.1) — the drifted wave routes badly through frozen first-K
    * centroids and fully recovers once Lloyd means cover its region.
    * IvfRefreshSpec pins refreshed > stale and the atomic-publication
    * layout.
    *
    * At 100 TB: the stale append is O(batch + touched lists); the
    * refresh is the expensive path by design — [[KmRounds]] combinable
    * scans + one full re-code shuffle, the cost a deployment pays
    * OFFLINE when drift telemetry (this entry's recall rows) says the
    * codebook no longer fits; publication cost is one rename.
    */
  def ivfRefresh(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfIndex(spark, dir)
    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave = driftDF(emb.where(s"vec_id % $w = 0"))
    val queries = driftDF(waveQueries(emb, IvfSplitMod))

    // 1. stale path: frozen-codebook append into a working copy
    val aug = graft.TempDirs.scoped("ivf-refresh") + "/stale"
    graft.TempDirs.copyTree(spark, path, aug)
    val centF = indexCodebook(spark, aug)
    val w1 = nearestLists(wave, centF, "vec_id", 1)
      .select("vec_id", "emb", "nrm", "c_id")
      .persist() // read twice (touched set, merge+write) — one compute
    val touched = w1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet
    graft.streaming.Sinks.partitionedUpsertBatch(w1.toDF(), aug,
      partitionCols = Seq("c_id"), keyCols = Seq("vec_id"),
      versionCols = Seq("vec_id"), sortCols = Seq("vec_id"))
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)
    w1.unpersist()

    // shared exact truth over the index content
    val content = emb.where(s"vec_id % $IvfSplitMod <> 0")
      .select("vec_id", "emb", "nrm").unionByName(wave)
      // consumed by the truth cross-score, Lloyd training (KmRounds + 1
      // assignment passes), and the re-code write — compute once
      .localCheckpoint()
    val truth = content
      .join(broadcast(queries.selectExpr("vec_id AS q_id", "emb AS q_emb",
        "nrm AS q_nrm")))
      .where("vec_id <> q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK")
      .select("q_id", "vec_id")

    val stale = incrementalIvfProbe(spark, queries,
      indexCodebook(spark, aug), aug)

    // 3. the refresh: re-train on current content, re-code, publish new
    //    root atomically
    val refreshedRoot = refreshIvfIndex(spark, dir, content)
    val refreshed = incrementalIvfProbe(spark, queries,
      indexCodebook(spark, refreshedRoot), refreshedRoot)

    val truthN = truth.agg(count(lit(1)).as("truth"))
    def recallRow(phase: String, topk: DataFrame): DataFrame =
      topk.select("q_id", "vec_id").join(truth, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("h"))
        .crossJoin(broadcast(truthN))
        .selectExpr(s"'$phase' AS phase", "CAST(h AS BIGINT) AS hits",
          "CAST(truth AS BIGINT) AS truth")
    recallRow("refreshed", refreshed)
      .unionByName(recallRow("stale", stale))
      .orderBy("phase")
  }

  /** Re-train + re-code `content` into a fresh index root, published
    * atomically — exposed so the spec can inspect the artifact the entry
    * ships (codebook, manifest, layout).
    */
  private[pipeline] def refreshIvfIndex(spark: SparkSession, dir: String,
      content: DataFrame): String = {
    val cent2 = trainedCentroids(spark, dir, content)
    val dst = graft.TempDirs.scoped("ivf-refresh") + "/refreshed"
    val (fs, root) = hadoopFs(spark, dst)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      nearestLists(content, cent2, "vec_id", 1)
        .select("vec_id", "emb", "nrm", "c_id")
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      cent2.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    dst
  }

  /** DuckDB replay — no persisted state, so both phases are recomputed
    * from the embeddings table: the drift mix, the frozen-codebook
    * assignment of the augmented content, the Lloyd re-train over the
    * SAME content (quantized-sum means, the [[trainedAssignCtes]]
    * pattern re-rooted at the drifted corpus), both probe pipelines, the
    * brute truth, and the two recall rows.
    */
  val ivfRefreshSql: String = {
    val w = 2 * IvfSplitMod
    val drift = s"list_transform(emb, x -> x + $DriftShift::DOUBLE)"
    def assignCte(src: String, centName: String, outName: String): String =
      s"""$outName AS (
         |  SELECT vec_id, emb, nrm, c_id FROM (
         |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             round(${cosineSql("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
         |             c.c_id) AS crk
         |    FROM $src e, $centName c)
         |  WHERE crk = 1)""".stripMargin
    def meanCte(assignName: String, outName: String): String = {
      val sums = (0 until Dim)
        .map(i => s"sum(floor(emb[${i + 1}] * $QScale.0 + 0.5)::BIGINT) AS s$i")
        .mkString(", ")
      val arr = (0 until Dim)
        .map(i => s"s$i::DOUBLE / (cn * $QScale)::DOUBLE")
        .mkString("[", ", ", "]")
      s"""${outName}_m AS (
         |  SELECT c_id, count(*)::BIGINT AS cn, $sums FROM $assignName GROUP BY c_id),
         |${outName}_e AS (SELECT c_id, $arr AS c_emb FROM ${outName}_m),
         |$outName AS (SELECT c_id, c_emb,
         |             sqrt(list_sum(list_transform(c_emb, v -> v * v))) AS c_nrm
         |             FROM ${outName}_e)""".stripMargin
    }
    def probeCte(centName: String, outName: String): String =
      s"""$outName AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q.q_id, c.c_id,
         |           row_number() OVER (PARTITION BY q.q_id ORDER BY
         |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
         |             c.c_id) AS crk
         |    FROM dq q, $centName c)
         |  WHERE crk <= $NProbe)""".stripMargin
    def topkCte(probeName: String, listName: String, outName: String): String =
      s"""$outName AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT p.q_id, l.vec_id,
         |           row_number() OVER (PARTITION BY p.q_id ORDER BY
         |             round(${cosineSql("q.q_emb", "l.emb", "q.q_nrm", "l.nrm")}, 6) DESC,
         |             l.vec_id) AS rk
         |    FROM $probeName p
         |    JOIN $listName l USING (c_id)
         |    JOIN dq q ON q.q_id = p.q_id
         |    WHERE l.vec_id <> p.q_id)
         |  WHERE rk <= $TopK)""".stripMargin
    s"""WITH $embCte,
       |dwave AS (
       |  SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, v -> v * v)))
       |           AS nrm
       |  FROM (SELECT vec_id, $drift AS emb FROM emb WHERE vec_id % $w = 0)),
       |content AS MATERIALIZED (
       |  SELECT vec_id, emb, nrm FROM emb WHERE vec_id % $IvfSplitMod <> 0
       |  UNION ALL SELECT vec_id, emb, nrm FROM dwave),
       |dq AS (
       |  SELECT vec_id AS q_id, emb AS q_emb,
       |         sqrt(list_sum(list_transform(emb, v -> v * v))) AS q_nrm
       |  FROM (SELECT vec_id, $drift AS emb FROM emb
       |        WHERE vec_id % $w = $IvfSplitMod
       |          AND vec_id < ${w.toLong * QuerySetSize + IvfSplitMod})),
       |centf AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |${assignCte("content", "centf", "lists_stale")},
       |centr0 AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm
       |           FROM content WHERE vec_id < $nCentroidsSqlExpr),
       |${assignCte("content", "centr0", "ra1")},
       |${meanCte("ra1", "centr1")},
       |${assignCte("content", "centr1", "ra2")},
       |${meanCte("ra2", "centr2")},
       |${assignCte("content", "centr2", "lists_ref")},
       |${probeCte("centf", "probes_stale")},
       |${probeCte("centr2", "probes_ref")},
       |${topkCte("probes_stale", "lists_stale", "topk_stale")},
       |${topkCte("probes_ref", "lists_ref", "topk_ref")},
       |truth AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.emb", "q.q_nrm", "c.nrm")}, 6) DESC,
       |             c.vec_id) AS rk
       |    FROM dq q, content c WHERE c.vec_id <> q.q_id)
       |  WHERE rk <= $TopK),
       |tn AS (SELECT count(*)::BIGINT AS truth FROM truth),
       |rows AS (
       |  SELECT 'refreshed' AS phase,
       |         (SELECT count(*) FROM topk_ref t
       |          JOIN truth USING (q_id, vec_id))::BIGINT AS hits
       |  UNION ALL
       |  SELECT 'stale',
       |         (SELECT count(*) FROM topk_stale t
       |          JOIN truth USING (q_id, vec_id))::BIGINT)
       |SELECT phase, hits, tn.truth FROM rows, tn ORDER BY phase""".stripMargin
  }

  /** Stream-static incremental ANN probe core — the streaming twin of
    * [[incrementalIvfProbe]] (the embedding analogue of
    * [[graft.pipeline.Dedup.streamProbeBands]]): incoming vectors as an
    * unbounded stream, the persisted inverted lists as the STATIC join
    * side. The probe-list choice per vector is computed STATELESSLY — a
    * rank window cannot run in streaming append mode, so the codebook
    * rides as ONE broadcast array<struct> row cross-joined onto the
    * stream (c_id-sorted for determinism): each row computes all
    * codebook rounded cosines inside a `transform`, `array_sort` over
    * (negated sim, c_id) structs picks the [[NProbe]] probe lists, and
    * one stream-static equi join on list id scores the candidates. No
    * watermark, no state store, and — unlike the previous
    * literals-in-the-expression form — no codebook-size ceiling: at the
    * adaptive cap (65,536 lists) literals would be ~4M constants in one
    * expression tree, while the broadcast array is ~34 MB of data.
    * Output is candidate-level (q_id, vec_id, sim) rows; final top-k is
    * a downstream batch concern, exactly as the dedup twin emits
    * band-level rows.
    */
  def streamProbeIvf(incoming: DataFrame, cent: DataFrame, idx: DataFrame)
      : DataFrame = {
    val centArr = cent.agg(array_sort(collect_list(
      struct(col("c_id"), col("c_emb"), col("c_nrm")))).as("cents"))
    incoming
      .crossJoin(broadcast(centArr))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(expr(
          s"""slice(array_sort(transform(cents, c -> named_struct(
             |  'negsim', CAST(0 AS DOUBLE)
             |    - round(graft_dot(emb, c.c_emb) / (nrm * c.c_nrm), 6),
             |  'c_id', c.c_id))), 1, $NProbe)""".stripMargin)).as("probe"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("probe.c_id").as("c_id"))
      .join(idx.selectExpr("CAST(c_id AS BIGINT) AS c_id", "vec_id",
        "emb", "nrm"), Seq("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
  }

  /** The streaming ANN probe as a batch-checkable entry: the WHOLE
    * incoming wave (not just the query set) probed against the persisted
    * index through the stream-capable plan, ordered for the oracle.
    * `IncrementalIvfSpec` proves the same core produces identical rows
    * from a real MemoryStream across micro-batches with zero state.
    */
  def streamIncrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfIndex(spark, dir)
    val emb = embDouble(spark, dir)
    streamProbeIvf(emb.where(s"vec_id % $IvfSplitMod = 0"),
      indexCodebook(spark, path), spark.read.parquet(path))
      .orderBy("q_id", "vec_id")
  }

  val streamIncrementalIvfSql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE vec_id % $IvfSplitMod <> 0),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM hist h, cent c)
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $IvfSplitMod = 0),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM q, cent c)
       |  WHERE crk <= $NProbe)
       |SELECT p.q_id, l.vec_id,
       |       round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |FROM probes p
       |JOIN lists l USING (c_id)
       |JOIN emb e ON e.vec_id = l.vec_id
       |JOIN q ON q.q_id = p.q_id
       |WHERE l.vec_id <> p.q_id
       |ORDER BY p.q_id, l.vec_id""".stripMargin

  /** Oracle for the incremental entries: the same construction from
    * scratch — DuckDB has no persisted index, so `histPred` names the
    * index CONTENT (historical corpus for the probe leg; historical ∪
    * wave 1 for the append leg) and the rest is the ivf probe replayed.
    */
  private def incrementalIvfSql(histPred: String, rem: Int): String = {
    val w = 2 * IvfSplitMod
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb WHERE $histPred),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM hist h, cent c)
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $w = $rem
       |        AND vec_id < ${w.toLong * QuerySetSize + rem}),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM q, cent c)
       |  WHERE crk <= $NProbe),
       |scored AS (
       |  SELECT p.q_id, l.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM probes p
       |  JOIN lists l USING (c_id)
       |  JOIN emb e ON e.vec_id = l.vec_id
       |  JOIN q ON q.q_id = p.q_id
       |  WHERE l.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  val incrementalIvfSqlProbe: String =
    incrementalIvfSql(s"vec_id % $IvfSplitMod <> 0", 0)

  val incrementalIvfSqlAppend: String = incrementalIvfSql(
    s"vec_id % $IvfSplitMod <> 0 OR vec_id % ${2 * IvfSplitMod} = 0",
    IvfSplitMod)

  // ------------------------- SQ8-stored IVF index (the 100 TB layout)

  /** Path of the SQ8-stored IVF index — the float-lists path plus a
    * layout tag, so the two representations never shadow each other.
    */
  def ivfSq8IndexPath(spark: SparkSession, dir: String): String =
    ivfIndexPath(spark, dir) + "_sq8"

  /** Build-once: the historical corpus's inverted lists stored in SQ8 —
    * per row (vec_id, s, nrm, qb) where `qb` is the 64-byte
    * `graft_sq8_pack` quantization and `s`/`nrm` the per-vector scale and
    * original norm — partitioned by `c_id` exactly like
    * [[ensureIvfIndex]]. This is the honest 100 TB index layout
    * (FAISS IndexIVFScalarQuantizer QT_8bit): the lists hold 1 byte/dim
    * instead of 8 (float64 arrays), so every probe moves ~8× less list
    * IO; the float vectors stay ONLY in the corpus table, touched by the
    * exact re-rank's keyed lookups. Same codebook + `_lists` manifest +
    * atomic [[IndexCommit]] publication as the float index.
    */
  def ensureIvfSq8Index(spark: SparkSession, dir: String): String = {
    val path = ivfSq8IndexPath(spark, dir)
    val (fs, root) = hadoopFs(spark, path)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      val emb = embDouble(spark, dir)
      val cent = coarseCent(emb, nCentroids(spark, dir))
      nearestLists(emb.where(s"vec_id % $IvfSplitMod <> 0"), cent,
          "vec_id", 1)
        .selectExpr("vec_id", "nrm", "c_id",
          "127.0 / greatest(array_max(transform(emb, y -> abs(y))), 1e-300) AS s", "emb")
        .selectExpr("vec_id", "nrm", "c_id", "s",
          "graft_sq8_pack(emb, s) AS qb")
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      cent.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    path
  }

  /** Quantize a probe batch: tag `(q_id, q_emb, q_nrm, c_id)` rows with
    * the query-side SQ8 scale and packed bytes.
    */
  private def sq8Queries(probes: DataFrame): DataFrame = probes
    .selectExpr("q_id", "q_emb", "q_nrm", "c_id",
      "127.0 / greatest(array_max(transform(q_emb, y -> abs(y))), 1e-300) AS q_s")
    .selectExpr("q_id", "q_emb", "q_nrm", "c_id", "q_s",
      "graft_sq8_pack(q_emb, q_s) AS q_qb")

  /** SQ8 probe core, shared by the persisted probe and the recall-gate
    * construction: integer-dot the stored bytes against the quantized
    * queries (the ONLY pass over list rows — no float vectors move), keep
    * the approximate top-`rerank` per query, then re-score exactly
    * against `floats` (rerank·Q keyed full-vector reads) and emit the
    * final top-`k`. The two-stage shape is [[ivfPqTopK]]'s refine
    * contract with SQ8 in place of ADC.
    */
  private def sq8ProbeCore(lists: DataFrame, quantQ: DataFrame,
      floats: DataFrame, rerank: Long, k: Int): DataFrame = {
    val approx = lists.join(broadcast(quantQ), "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "q_emb", "q_nrm", "vec_id",
        s"""round(CAST(graft_sq8_dot(qb, q_qb) AS DOUBLE)
           |  / (s * q_s) / (nrm * q_nrm), 6) AS asim""".stripMargin)
      .withColumn("ark", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, vec_id ASC)"))
      .where(s"ark <= $rerank")
    approx
      .join(floats.select("vec_id", "emb", "nrm"), "vec_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $k")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  /** Probe an already-built SQ8 index: nearest [[NProbe]] centroids per
    * query (float codebook), manifest-intersected touched dirs, then the
    * [[sq8ProbeCore]] two-stage scoring. List IO is the quantized
    * representation only.
    */
  def incrementalIvfSq8Probe(spark: SparkSession, queries: DataFrame,
      cent: DataFrame, indexPath: String, floats: DataFrame,
      rerank: Long, k: Int = TopK): DataFrame = {
    val probes = nearestLists(queries, cent, "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    val manifest = listsManifestRead(spark, indexPath) // fails loud if absent
    val touchedDirs = probes.select("c_id").distinct()
      .collect() // ≤ Q × NProbe list ids: metadata-scale
      .map(_.getLong(0))
      .filter(manifest.contains)
      .sorted.map(c => s"$indexPath/c_id=$c")
    val idx =
      if (touchedDirs.isEmpty) spark.read.parquet(indexPath).limit(0)
      else spark.read.option("basePath", indexPath)
        .parquet(touchedDirs.toIndexedSeq: _*)
    sq8ProbeCore(idx, sq8Queries(probes), floats, rerank, k)
  }

  /** Incremental ANN over the SQ8-stored index, probe leg: wave-1
    * queries against the persisted quantized lists with exact re-rank on
    * the float corpus — [[incrementalIvf]]'s cross-run contract at 1/8th
    * the list IO.
    */
  def incrementalIvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfSq8Index(spark, dir)
    val emb = embDouble(spark, dir)
    incrementalIvfSq8Probe(spark, waveQueries(emb, 0),
      indexCodebook(spark, path), path, emb,
      rerankK(corpusStats(spark, dir)._1))
  }

  /** Stream-static SQ8 probe — the quantized twin of [[streamProbeIvf]]:
    * incoming vectors quantize STATELESSLY in the expression layer
    * (`graft_sq8_pack` on the stream side), probe-list choice via the
    * same broadcast codebook array, then ONE stream-static equi join on
    * list id against the persisted QUANTIZED lists. Emitted sims are the
    * SQ8 ROUTING scores (integer dot rescaled by the stored scales) —
    * exactly what a live path can compute without a rank window; the
    * exact re-rank is the downstream batch consumer's job, as in
    * [[incrementalIvfSq8Probe]]. No watermark, no state store, and the
    * static-side list IO is the 1-byte/dim layout (~8× less than the
    * float twin's).
    */
  def streamProbeIvfSq8(incoming: DataFrame, cent: DataFrame,
      idx: DataFrame): DataFrame = {
    val centArr = cent.agg(array_sort(collect_list(
      struct(col("c_id"), col("c_emb"), col("c_nrm")))).as("cents"))
    incoming
      .crossJoin(broadcast(centArr))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(expr(
          s"""slice(array_sort(transform(cents, c -> named_struct(
             |  'negsim', CAST(0 AS DOUBLE)
             |    - round(graft_dot(emb, c.c_emb) / (nrm * c.c_nrm), 6),
             |  'c_id', c.c_id))), 1, $NProbe)""".stripMargin)).as("probe"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("probe.c_id").as("c_id"))
      .selectExpr("q_id", "q_nrm", "c_id",
        "127.0 / greatest(array_max(transform(q_emb, y -> abs(y))), 1e-300) AS q_s", "q_emb")
      .selectExpr("q_id", "q_nrm", "c_id", "q_s",
        "graft_sq8_pack(q_emb, q_s) AS q_qb")
      .join(idx.selectExpr("CAST(c_id AS BIGINT) AS c_id", "vec_id",
        "nrm", "s", "qb"), Seq("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"""round(CAST(graft_sq8_dot(qb, q_qb) AS DOUBLE)
           |  / (s * q_s) / (nrm * q_nrm), 6) AS asim""".stripMargin)
  }

  /** The SQ8 streaming probe as a batch-checkable entry (the
    * [[streamIncrementalIvf]] convention): the whole incoming wave
    * probed against the persisted quantized index through the
    * stream-capable plan; `IncrementalIvfSpec` proves the same core
    * produces identical rows from a real MemoryStream with zero state.
    */
  def streamIncrementalIvfSq8(spark: SparkSession, dir: String)
      : DataFrame = {
    val path = ensureIvfSq8Index(spark, dir)
    val emb = embDouble(spark, dir)
    streamProbeIvfSq8(emb.where(s"vec_id % $IvfSplitMod = 0"),
      indexCodebook(spark, path), spark.read.parquet(path))
      .orderBy("q_id", "vec_id")
  }

  val streamIncrementalIvfSq8Sql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE vec_id % $IvfSplitMod <> 0),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM hist h, cent c)
       |  WHERE crk = 1),
       |sc AS (SELECT l.vec_id, l.c_id, e.nrm, e.emb,
       |              127.0 / greatest(list_max(list_transform(e.emb, y -> abs(y))), 1e-300) AS s
       |       FROM lists l JOIN emb e USING (vec_id)),
       |sq AS (SELECT vec_id, c_id, nrm, s,
       |              list_transform(emb, x -> floor(x * s + 0.5)) AS qv
       |       FROM sc),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $IvfSplitMod = 0),
       |qq AS (SELECT q_id, q_emb, q_nrm, q_s,
       |              list_transform(q_emb, x -> floor(x * q_s + 0.5)) AS q_qv
       |       FROM (SELECT *,
       |               127.0 / greatest(list_max(list_transform(q_emb, y -> abs(y))), 1e-300) AS q_s
       |             FROM q)),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM q, cent c)
       |  WHERE crk <= $NProbe)
       |SELECT p.q_id, s.vec_id,
       |       round(list_sum(list_transform(range(1, ${Dim + 1}),
       |               i -> s.qv[i] * x.q_qv[i]))
       |         / (s.s * x.q_s) / (s.nrm * x.q_nrm), 6) AS asim
       |FROM probes p
       |JOIN sq s USING (c_id)
       |JOIN qq x ON x.q_id = p.q_id
       |WHERE s.vec_id <> p.q_id
       |ORDER BY p.q_id, s.vec_id""".stripMargin

  /** In-place append to the SQ8-stored index — the ingest leg completing
    * its build/probe/append family (the [[incrementalIvfAppend]] cycle
    * at the quantized layout): wave-1 vectors are assigned by the
    * index's float codebook, QUANTIZED via `graft_sq8_pack`, and
    * upserted into exactly the touched `c_id=` dirs (1/8th the rewritten
    * bytes per touched list vs the float layout); the manifest commit
    * makes new lists probe-visible, then wave-2 queries probe the
    * augmented quantized lists with exact re-rank on the float corpus.
    * Append cost is O(batch + touched lists), independent of index size.
    */
  def incrementalIvfSq8Append(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfSq8Index(spark, dir)
    val aug = graft.TempDirs.scoped("ivfsq8-incr") + "/index"
    graft.TempDirs.copyTree(spark, path, aug) // hermeticity tax only
    val cent = indexCodebook(spark, aug)
    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave1 = nearestLists(emb.where(s"vec_id % $w = 0"), cent,
        "vec_id", 1)
      .selectExpr("vec_id", "nrm", "c_id",
        "127.0 / greatest(array_max(transform(emb, y -> abs(y))), 1e-300) AS s", "emb")
      .selectExpr("vec_id", "nrm", "c_id", "s",
        "graft_sq8_pack(emb, s) AS qb")
      .persist() // read twice (touched set, merge+write) — one compute
    val touched = wave1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet // ≤ |wave| list ids
    graft.streaming.Sinks.partitionedUpsertBatch(wave1.toDF(), aug,
      partitionCols = Seq("c_id"), keyCols = Seq("vec_id"),
      versionCols = Seq("vec_id"), sortCols = Seq("vec_id"))
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)
    val out = incrementalIvfSq8Probe(spark, waveQueries(emb, IvfSplitMod),
      indexCodebook(spark, aug), aug, emb,
      rerankK(corpusStats(spark, dir)._1))
    wave1.unpersist() // probe reads the written files, not the plan
    out
  }

  /** DuckDB replay of [[incrementalIvfSq8]] / [[incrementalIvfSq8Append]]
    * — the same construction from scratch: `histPred` assignment, SQ8
    * quantization (`floor(x·s + 0.5)` exact integers, the
    * [[sq8TopKSql]] arithmetic), approximate top-rerankK per query for
    * the wave-`rem` query set, exact re-rank, top-[[TopK]].
    */
  private def ivfSq8IncrSql(histPred: String, rem: Int): String = {
    val w = 2 * IvfSplitMod
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE $histPred),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM hist h, cent c)
       |  WHERE crk = 1),
       |sc AS (SELECT l.vec_id, l.c_id, e.nrm, e.emb,
       |              127.0 / greatest(list_max(list_transform(e.emb, y -> abs(y))), 1e-300) AS s
       |       FROM lists l JOIN emb e USING (vec_id)),
       |sq AS (SELECT vec_id, c_id, nrm, s,
       |              list_transform(emb, x -> floor(x * s + 0.5)) AS qv
       |       FROM sc),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $w = $rem
       |        AND vec_id < ${w.toLong * QuerySetSize + rem}),
       |qs AS (SELECT q_id, q_emb, q_nrm,
       |              127.0 / greatest(list_max(list_transform(q_emb, y -> abs(y))), 1e-300) AS q_s
       |       FROM q),
       |qq AS (SELECT q_id, q_emb, q_nrm, q_s,
       |              list_transform(q_emb, x -> floor(x * q_s + 0.5)) AS q_qv
       |       FROM qs),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM q, cent c)
       |  WHERE crk <= $NProbe),
       |approx AS (
       |  SELECT p.q_id, s.vec_id,
       |         round(list_sum(list_transform(range(1, ${Dim + 1}),
       |                 i -> s.qv[i] * qq.q_qv[i]))
       |           / (s.s * qq.q_s) / (s.nrm * qq.q_nrm), 6) AS asim
       |  FROM probes p
       |  JOIN sq s USING (c_id)
       |  JOIN qq ON qq.q_id = p.q_id
       |  WHERE s.vec_id <> p.q_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, vec_id ASC) AS ark
       |    FROM approx)
       |  WHERE ark <= greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN qq q ON q.q_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  val incrementalIvfSq8Sql: String =
    ivfSq8IncrSql(s"vec_id % $IvfSplitMod <> 0", 0)

  val incrementalIvfSq8AppendSql: String = ivfSq8IncrSql(
    s"vec_id % $IvfSplitMod <> 0 OR vec_id % ${2 * IvfSplitMod} = 0",
    IvfSplitMod)

  /** Full-corpus SQ8-IVF construction for the recall gate: the same
    * quantized-lists + exact-re-rank scoring as the persisted index,
    * built in-plan over the whole corpus so its recall is measured
    * against [[bruteForceTopK]] truth on equal footing with the other
    * families.
    */
  def ivfSq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val cent = coarseCent(emb, nCentroids(spark, dir))
    val lists = nearestLists(emb, cent, "vec_id", 1)
      .selectExpr("vec_id", "nrm", "c_id",
        "127.0 / greatest(array_max(transform(emb, y -> abs(y))), 1e-300) AS s", "emb")
      .selectExpr("vec_id", "nrm", "c_id", "s",
        "graft_sq8_pack(emb, s) AS qb")
    val probes = nearestLists(emb.where(s"vec_id < $QuerySetSize"), cent,
        "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    sq8ProbeCore(lists, sq8Queries(probes), emb,
      rerankK(corpusStats(spark, dir)._1), TopK)
  }

  val ivfSq8TopKSql: String =
    s"""WITH $embCte,
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM emb
       |         WHERE vec_id < $nCentroidsSqlExpr),
       |lists AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT h.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "c.c_emb", "h.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM emb h, cent c)
       |  WHERE crk = 1),
       |sc AS (SELECT l.vec_id, l.c_id, e.nrm, e.emb,
       |              127.0 / greatest(list_max(list_transform(e.emb, y -> abs(y))), 1e-300) AS s
       |       FROM lists l JOIN emb e USING (vec_id)),
       |sq AS (SELECT vec_id, c_id, nrm, s,
       |              list_transform(emb, x -> floor(x * s + 0.5)) AS qv
       |       FROM sc),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id < $QuerySetSize),
       |qs AS (SELECT q_id, q_emb, q_nrm,
       |              127.0 / greatest(list_max(list_transform(q_emb, y -> abs(y))), 1e-300) AS q_s
       |       FROM q),
       |qq AS (SELECT q_id, q_emb, q_nrm, q_s,
       |              list_transform(q_emb, x -> floor(x * q_s + 0.5)) AS q_qv
       |       FROM qs),
       |probes AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.q_id, c.c_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "c.c_emb", "q.q_nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM q, cent c)
       |  WHERE crk <= $NProbe),
       |approx AS (
       |  SELECT p.q_id, s.vec_id,
       |         round(list_sum(list_transform(range(1, ${Dim + 1}),
       |                 i -> s.qv[i] * qq.q_qv[i]))
       |           / (s.s * qq.q_s) / (s.nrm * qq.q_nrm), 6) AS asim
       |  FROM probes p
       |  JOIN sq s USING (c_id)
       |  JOIN qq ON qq.q_id = p.q_id
       |  WHERE s.vec_id <> p.q_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY asim DESC, vec_id ASC) AS ark
       |    FROM approx)
       |  WHERE ark <= greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN qq q ON q.q_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  // ------------- PQ-coded persisted IVF index (on-disk IndexIVFPQ)

  /** Path of the PQ-coded IVF index — the float-lists path plus a layout
    * tag, so the three list representations (float / SQ8 / PQ) never
    * shadow each other.
    */
  def ivfPqIndexPath(spark: SparkSession, dir: String): String =
    ivfIndexPath(spark, dir) + "_pq"

  /** PQ sub-codebook subdir inside the PQ index (leading underscore:
    * invisible to parquet scans of the index root, like [[CodebookDir]]).
    */
  val PqCodebookDir = "_pqcodebook"

  /** The PQ sub-codebook of a corpus frame: the first [[PqK]] vectors'
    * [[PqM]] subspace slices (the family's frozen seeded-codebook
    * convention, [[pqTopK]]) with the [[QScale]]-quantized code norm.
    * Columns (m, p_id, p_sub, pcq) — the `p_` prefix keeps PQ code ids
    * and coarse list ids (c_id) from ever colliding in a probe plan.
    */
  private def pqCodebook(emb: DataFrame): DataFrame = {
    val subSlices = (0 until PqM)
      .map(m => s"slice(emb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    emb.where(s"vec_id < $PqK")
      .selectExpr("vec_id", s"posexplode(array($subSlices)) AS (m, sub)")
      .selectExpr("m", "vec_id AS p_id", "sub AS p_sub",
        s"CAST(floor(graft_dot(sub, sub) * $QScale.0 + 0.5) AS BIGINT) AS pcq")
  }

  /** PQ-encode `vecs` (vec_id, emb, nrm, c_id): nearest sub-code per
    * (vector, subspace) — the [[pqTopK]] argmin, term-by-term squared L2
    * so both engines fold identically — with the [[PqM]] 4-bit codes
    * packed into ONE 16-bit integer, pcode = Σ code_m·16^m (each code
    * < [[PqK]] = 16). Packing is storage, not semantics: the probe
    * unpacks with exact integer arithmetic, so the oracle can replay
    * from unpacked (m, code) pairs and still hash-match.
    */
  private def pqEncode(vecs: DataFrame, pqc: DataFrame): DataFrame = {
    val subSlices = (0 until PqM)
      .map(m => s"slice(emb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val caseM = (0 until PqM)
      .map(m => s"WHEN $m THEN ${1L << (4 * m)}L").mkString("CASE m ", " ", " END")
    vecs.selectExpr("vec_id", "nrm", "c_id",
        s"posexplode(array($subSlices)) AS (m, sub)")
      .join(broadcast(pqc), "m")
      .selectExpr("vec_id", "nrm", "c_id", "m", "p_id",
        s"""round(graft_dot(sub, sub) - 2 * graft_dot(sub, p_sub)
           |  + graft_dot(p_sub, p_sub), 6) AS d2""".stripMargin)
      .withColumn("prk", expr(
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, p_id ASC)"))
      .where("prk = 1")
      .groupBy("vec_id", "nrm", "c_id")
      .agg(expr(s"CAST(sum(p_id * ($caseM)) AS INT)").as("pcode"))
  }

  /** The persisted PQ sub-codebook of a built PQ index. Fails loud when
    * absent — ADC against a mismatched codebook silently returns wrong
    * neighbors (the [[indexCodebook]] contract).
    */
  def indexPqCodebook(spark: SparkSession, indexPath: String): DataFrame = {
    val (fs, _) = hadoopFs(spark, indexPath)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/$PqCodebookDir/_SUCCESS")))
      throw new IllegalStateException(
        s"no $PqCodebookDir at $indexPath — index was not built by " +
          "ensureIvfPqIndex; rebuild the index")
    spark.read.parquet(s"$indexPath/$PqCodebookDir")
  }

  /** Build-once: the historical corpus's inverted lists stored as PQ
    * CODES — per row (vec_id, nrm, pcode) where `pcode` packs the
    * [[PqM]]×4-bit sub-codes (2 bytes of payload vs SQ8's 64-byte `qb`
    * and the float layout's 512-byte array), partitioned by `c_id`
    * exactly like [[ensureIvfIndex]]/[[ensureIvfSq8Index]]. This
    * completes the FAISS storage ladder (IndexIVFPQ: codes in the lists,
    * codebooks in the index, ADC at probe time, exact re-rank on the
    * corpus): at 100 TB the probed lists move ~16× fewer bytes than SQ8
    * and ~256× fewer than float64. Same persisted coarse codebook,
    * `_lists` manifest, and atomic [[IndexCommit]] publication as the
    * sibling layouts; the PQ sub-codebook travels in [[PqCodebookDir]].
    */
  def ensureIvfPqIndex(spark: SparkSession, dir: String): String = {
    val path = ivfPqIndexPath(spark, dir)
    val (fs, root) = hadoopFs(spark, path)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$PqCodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      val emb = embDouble(spark, dir)
      val cent = coarseCent(emb, nCentroids(spark, dir))
      val pqc = pqCodebook(emb)
      pqEncode(
        nearestLists(emb.where(s"vec_id % $IvfSplitMod <> 0"), cent,
            "vec_id", 1)
          .select("vec_id", "emb", "nrm", "c_id"), pqc)
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      cent.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      pqc.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$PqCodebookDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    path
  }

  /** Probe an already-built PQ index: nearest [[NProbe]] centroids per
    * query (float coarse codebook), manifest-intersected touched dirs,
    * then classic ADC — a broadcast Q×M×K lookup table of quantized
    * partial dots scores the UNPACKED stored codes (the only pass over
    * list rows moves 2-byte codes, never vectors), the adaptive
    * top-`rerank` ADC candidates re-score exactly against `floats`, and
    * the final top-`k` emerges. The [[ivfPqTopK]] refine contract over a
    * persisted code-layout index.
    */
  def incrementalIvfPqProbe(spark: SparkSession, queries: DataFrame,
      cent: DataFrame, pqc: DataFrame, indexPath: String, floats: DataFrame,
      rerank: Long, k: Int = TopK): DataFrame = {
    val probes = nearestLists(queries, cent, "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    val manifest = listsManifestRead(spark, indexPath) // fails loud if absent
    val touchedDirs = probes.select("c_id").distinct()
      .collect() // ≤ Q × NProbe list ids: metadata-scale
      .map(_.getLong(0))
      .filter(manifest.contains)
      .sorted.map(c => s"$indexPath/c_id=$c")
    val idx =
      if (touchedDirs.isEmpty) spark.read.parquet(indexPath).limit(0)
      else spark.read.option("basePath", indexPath)
        .parquet(touchedDirs.toIndexedSeq: _*)
    pqProbeCore(idx, queries, probes, pqc, floats, rerank, k)
  }

  /** ADC probe core over code lists, shared by the persisted probe and
    * the ×10 recall-gate construction: broadcast Q×M×K LUT, unpacked-code
    * scoring (the only pass over list rows moves 2-byte codes), adaptive
    * top-`rerank` cut, exact re-rank on `floats`, final top-`k`.
    */
  private def pqProbeCore(codeLists: DataFrame, queries: DataFrame,
      probes: DataFrame, pqc: DataFrame, floats: DataFrame,
      rerank: Long, k: Int): DataFrame = {
    // ADC lookup table: Q×M×K quantized partial dots + code norms
    val subSlices = (0 until PqM)
      .map(m => s"slice(emb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val lut = queries
      .selectExpr("vec_id AS q_id", "nrm AS q_nrm",
        s"posexplode(array($subSlices)) AS (m, sub)")
      .join(broadcast(pqc), "m")
      .selectExpr("q_id", "q_nrm", "m", "p_id AS code",
        s"CAST(floor(graft_dot(sub, p_sub) * $QScale.0 + 0.5) AS BIGINT) AS pq",
        "pcq")
    // unpack stored codes with exact integer arithmetic and ADC-score
    val unpack = (0 until PqM)
      .map(m => s"CAST((pcode DIV ${1L << (4 * m)}) % $PqK AS BIGINT)")
      .mkString(", ")
    val adc = codeLists.join(broadcast(probes.select("q_id", "c_id")), "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"posexplode(array($unpack)) AS (m, code)")
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy("q_id", "vec_id")
      .agg(max("q_nrm").as("q_nrm"), sum("pq").as("adcq"), sum("pcq").as("rq"))
      .selectExpr("q_id", "vec_id",
        s"""round((CAST(adcq AS DOUBLE) / $QScale.0)
           |  / (q_nrm * sqrt(CAST(rq AS DOUBLE) / $QScale.0)), 6) AS adc_sim""".stripMargin)
      .withColumn("ark", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, vec_id ASC)"))
      .where(s"ark <= $rerank")
    val qv = queries.selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    adc.select("q_id", "vec_id")
      .join(floats.select("vec_id", "emb", "nrm"), "vec_id")
      .join(broadcast(qv), "q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $k")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  /** Refine multiplier of the PQ-index probe over the family's adaptive
    * [[rerankK]]: PQ codes are ~16× lossier than SQ8 bytes (2-byte codes
    * vs 64), so the ADC pre-cut must keep proportionally more candidates
    * for the exact re-rank to recover code-mis-ranked true neighbors —
    * the FAISS refine `k_factor` knob. Measured on this corpus: recall
    * 60%/48% at ×1 (below the 72% gate) vs ≥ the gate at ×4, while
    * 4·rerankK·Q full-vector reads stay negligible at every scale.
    */
  final val PqIdxRefine = 4

  /** Incremental ANN over the PQ-coded index, probe leg: wave-1 queries
    * against the persisted 2-byte-code lists with exact re-rank on the
    * float corpus — [[incrementalIvf]]'s cross-run contract at the
    * smallest rung of the storage ladder.
    */
  def incrementalIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfPqIndex(spark, dir)
    val emb = embDouble(spark, dir)
    incrementalIvfPqProbe(spark, waveQueries(emb, 0),
      indexCodebook(spark, path), indexPqCodebook(spark, path), path, emb,
      PqIdxRefine * rerankK(corpusStats(spark, dir)._1))
  }

  /** In-place append to the PQ-coded index — the ingest leg completing
    * its build/probe/append family: wave-1 vectors are assigned by the
    * index's persisted float codebook, ENCODED with its persisted PQ
    * sub-codebook (a frozen training artifact — appends never retrain),
    * and upserted into exactly the touched `c_id=` dirs; the manifest
    * commit makes new lists probe-visible, then wave-2 queries probe the
    * augmented code lists. Append cost is O(batch + touched lists),
    * independent of index size.
    */
  def incrementalIvfPqAppend(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfPqIndex(spark, dir)
    val aug = graft.TempDirs.scoped("ivfpq-incr") + "/index"
    graft.TempDirs.copyTree(spark, path, aug) // hermeticity tax only
    val cent = indexCodebook(spark, aug)
    val pqc = indexPqCodebook(spark, aug)
    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave1 = pqEncode(
      nearestLists(emb.where(s"vec_id % $w = 0"), cent, "vec_id", 1)
        .select("vec_id", "emb", "nrm", "c_id"), pqc)
      .persist() // read twice (touched set, merge+write) — one compute
    val touched = wave1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet // ≤ |wave| list ids
    graft.streaming.Sinks.partitionedUpsertBatch(wave1.toDF(), aug,
      partitionCols = Seq("c_id"), keyCols = Seq("vec_id"),
      versionCols = Seq("vec_id"), sortCols = Seq("vec_id"))
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)
    val out = incrementalIvfPqProbe(spark, waveQueries(emb, IvfSplitMod),
      indexCodebook(spark, aug), pqc, aug, emb,
      PqIdxRefine * rerankK(corpusStats(spark, dir)._1))
    wave1.unpersist() // probe reads the written files, not the plan
    out
  }

  // --------- residual-coded persisted IVFPQ (the FAISS default form)

  /** Path of the RESIDUAL-coded PQ index. The tag names the LAYOUT
    * GENERATION (seed offset included): a layout change must never
    * silently reuse an index built under the old rules.
    */
  def ivfPqResIndexPath(spark: SparkSession, dir: String): String =
    ivfIndexPath(spark, dir) + "_pqr2"

  /** Residual sub-codebook: [[PqK]] seed vectors' RESIDUALS against
    * their own nearest coarse centroid, sliced into [[PqM]] subspaces —
    * codes then quantize what the coarse assignment CANNOT explain,
    * which is why FAISS's IndexIVFPQ encodes residuals by default: the
    * residual cloud is centered and small, so 4-bit codes spend their
    * 16 cells on the informative part. The seeds are ids
    * [`nc`, `nc`+[[PqK]]): the first `nc` vectors ARE the coarse
    * centroids (their residuals are exactly zero — a degenerate
    * codebook that collapses ADC to coarse-only ranking; measured
    * recall 32% at sf0.1 before this offset). Columns (m, p_id, p_sub).
    */
  private def pqCodebookRes(emb: DataFrame, cent: DataFrame,
      nc: Int, perm: Seq[Int] = Nil): DataFrame = {
    val resSlices = (0 until PqM)
      .map(m => s"slice(res, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    assignOne(emb.where(s"vec_id >= $nc AND vec_id < ${nc + PqK}"), cent,
        "vec_id", "c_id", "c_emb", "c_nrm", "csim", "crk")
      .join(broadcast(cent.select("c_id", "c_emb")), "c_id")
      .selectExpr("vec_id", "zip_with(emb, c_emb, (x, y) -> x - y) AS res")
      .selectExpr("vec_id", s"${permuteExpr(perm, "res")} AS res")
      .selectExpr("vec_id", s"posexplode(array($resSlices)) AS (m, sub)")
      // re-index seed ids to codes 0..PqK-1: pcode packs 4-bit cells
      .selectExpr("m", s"vec_id - $nc AS p_id", "sub AS p_sub")
  }

  /** Reorder an array column by a 0-based source-index permutation —
    * identity when `perm` is empty. The OPQ rotation as an expression
    * (a permutation IS an orthogonal matrix, so norms are untouched).
    */
  private def permuteExpr(perm: Seq[Int], col: String): String =
    if (perm.isEmpty) col
    else perm.map(i => s"element_at($col, ${i + 1})")
      .mkString("array(", ", ", ")")

  /** Residual-encode `vecs` (vec_id, emb, nrm, c_id): nearest residual
    * sub-code per (vector, subspace) against the vector's OWN residual
    * (emb − its list centroid) — the [[pqEncode]] argmin over centered
    * data; packing identical (pcode = Σ code_m·16^m).
    */
  private def pqEncodeRes(vecs: DataFrame, cent: DataFrame,
      pqcr: DataFrame, perm: Seq[Int] = Nil): DataFrame = {
    val resSlices = (0 until PqM)
      .map(m => s"slice(res, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val caseM = (0 until PqM)
      .map(m => s"WHEN $m THEN ${1L << (4 * m)}L").mkString("CASE m ", " ", " END")
    vecs.join(broadcast(cent.select("c_id", "c_emb")), "c_id")
      .selectExpr("vec_id", "nrm", "c_id",
        "zip_with(emb, c_emb, (x, y) -> x - y) AS res")
      .selectExpr("vec_id", "nrm", "c_id",
        s"${permuteExpr(perm, "res")} AS res")
      .selectExpr("vec_id", "nrm", "c_id",
        s"posexplode(array($resSlices)) AS (m, sub)")
      .join(broadcast(pqcr), "m")
      .selectExpr("vec_id", "nrm", "c_id", "m", "p_id",
        s"""round(graft_dot(sub, sub) - 2 * graft_dot(sub, p_sub)
           |  + graft_dot(p_sub, p_sub), 6) AS d2""".stripMargin)
      .withColumn("prk", expr(
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, p_id ASC)"))
      .where("prk = 1")
      .groupBy("vec_id", "nrm", "c_id")
      .agg(expr(s"CAST(sum(p_id * ($caseM)) AS INT)").as("pcode"))
  }

  /** Build-once residual-coded IVFPQ: same 2-byte (vec_id, nrm, pcode)
    * list layout, coarse codebook and manifest as [[ensureIvfPqIndex]],
    * but codes quantize residuals — so an ADC score reconstructs
    * `q·vec ≈ q·centroid + q·residual-codes` with the EXACT stored norm
    * in the denominator, instead of approximating both the dot and the
    * norm from raw-vector codes. Measured on this corpus (wave-0
    * top-5 vs exact truth): refine-for-refine the residual layout wins
    * — 68%/64% at ×1 vs the raw layout's 60%/48% — and it reaches the
    * family's 72% recall gate at ×[[PqResRefine]]=2, HALF the exact
    * re-rank IO of the raw layout's ×[[PqIdxRefine]]=4. That is why
    * FAISS makes residual encoding the default.
    */
  def ensureIvfPqResIndex(spark: SparkSession, dir: String): String = {
    val path = ivfPqResIndexPath(spark, dir)
    val (fs, root) = hadoopFs(spark, path)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$PqCodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      val emb = embDouble(spark, dir)
      val nc = nCentroids(spark, dir)
      val cent = coarseCent(emb, nc)
      val pqcr = pqCodebookRes(emb, cent, nc)
      pqEncodeRes(
        nearestLists(emb.where(s"vec_id % $IvfSplitMod <> 0"), cent,
            "vec_id", 1)
          .select("vec_id", "emb", "nrm", "c_id"), cent, pqcr)
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      cent.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      pqcr.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$PqCodebookDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    path
  }

  /** Residual-ADC probe: the LUT holds `q_m · p_sub_m` partial dots of
    * the RAW query against the residual codebook, each probed (q, list)
    * pair carries one quantized `q · centroid` coarse term, and the ADC
    * score divides by the STORED exact vector norm —
    * `(qc + Σ LUT) / (‖q‖·‖v‖)` — so the only inexactness left is the
    * residual quantization itself. Same manifest-pruned 2-byte list IO
    * and exact re-rank as the raw-code probe.
    */
  def incrementalIvfPqResProbe(spark: SparkSession, queries: DataFrame,
      cent: DataFrame, pqcr: DataFrame, indexPath: String, floats: DataFrame,
      rerank: Long, k: Int = TopK, perm: Seq[Int] = Nil): DataFrame = {
    val probes = nearestLists(queries, cent, "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    val manifest = listsManifestRead(spark, indexPath) // fails loud if absent
    val touchedDirs = probes.select("c_id").distinct()
      .collect() // ≤ Q × NProbe list ids: metadata-scale
      .map(_.getLong(0))
      .filter(manifest.contains)
      .sorted.map(c => s"$indexPath/c_id=$c")
    val idx =
      if (touchedDirs.isEmpty) spark.read.parquet(indexPath).limit(0)
      else spark.read.option("basePath", indexPath)
        .parquet(touchedDirs.toIndexedSeq: _*)
    // q·Pᵀ(P·res-codes) = (P·q)·(P·res)-codes: the query rides through
    // the same rotation the codes were trained under (identity when the
    // index carries no OPQ permutation)
    val subSlices = (0 until PqM)
      .map(m => s"slice(pemb, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val lut = queries
      .selectExpr("vec_id", "nrm", s"${permuteExpr(perm, "emb")} AS pemb")
      .selectExpr("vec_id AS q_id", "nrm AS q_nrm",
        s"posexplode(array($subSlices)) AS (m, sub)")
      .join(broadcast(pqcr), "m")
      .selectExpr("q_id", "q_nrm", "m", "p_id AS code",
        s"CAST(floor(graft_dot(sub, p_sub) * $QScale.0 + 0.5) AS BIGINT) AS pq")
    // one quantized coarse term per probed (query, list) pair
    val qc = probes.join(broadcast(cent.select("c_id", "c_emb")), "c_id")
      .selectExpr("q_id", "c_id",
        s"CAST(floor(graft_dot(q_emb, c_emb) * $QScale.0 + 0.5) AS BIGINT) AS qcq")
    val unpack = (0 until PqM)
      .map(m => s"CAST((pcode DIV ${1L << (4 * m)}) % $PqK AS BIGINT)")
      .mkString(", ")
    val adc = idx.join(broadcast(qc), "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", "nrm", "qcq",
        s"posexplode(array($unpack)) AS (m, code)")
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy("q_id", "vec_id")
      .agg(max("q_nrm").as("q_nrm"), max("nrm").as("nrm"),
        max("qcq").as("qcq"), sum("pq").as("adcq"))
      .selectExpr("q_id", "vec_id",
        s"""round((CAST(qcq + adcq AS DOUBLE) / $QScale.0)
           |  / (q_nrm * nrm), 6) AS adc_sim""".stripMargin)
      .withColumn("ark", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, vec_id ASC)"))
      .where(s"ark <= $rerank")
    val qv = queries.selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    adc.select("q_id", "vec_id")
      .join(floats.select("vec_id", "emb", "nrm"), "vec_id")
      .join(broadcast(qv), "q_id")
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $k")
      .selectExpr("q_id", "vec_id", "sim", "CAST(rk AS BIGINT) AS rk")
      .orderBy("q_id", "rk")
  }

  /** Refine multiplier of the residual probe: ×2 reaches the family's
    * 72% recall gate (measured 72%/72% at sf0.01/sf0.1) — half the
    * raw-code layout's ×[[PqIdxRefine]]; the spec gates this.
    */
  final val PqResRefine = 2

  /** Incremental ANN over the residual-coded index, probe leg. */
  def incrementalIvfPqRes(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfPqResIndex(spark, dir)
    val emb = embDouble(spark, dir)
    incrementalIvfPqResProbe(spark, waveQueries(emb, 0),
      indexCodebook(spark, path), indexPqCodebook(spark, path), path, emb,
      PqResRefine * rerankK(corpusStats(spark, dir)._1))
  }

  /** In-place append to the residual-coded index — family parity with
    * [[incrementalIvfPqAppend]]: wave vectors are assigned by the
    * index's persisted coarse codebook and residual-encoded with its
    * persisted (FROZEN) residual sub-codebook, then upserted into only
    * the touched `c_id=` dirs; wave-2 queries probe the augmented code
    * lists. O(batch + touched lists), independent of index size.
    */
  def incrementalIvfPqResAppend(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfPqResIndex(spark, dir)
    val aug = graft.TempDirs.scoped("ivfpqres-incr") + "/index"
    graft.TempDirs.copyTree(spark, path, aug) // hermeticity tax only
    val cent = indexCodebook(spark, aug)
    val pqcr = indexPqCodebook(spark, aug)
    val emb = embDouble(spark, dir)
    val w = 2 * IvfSplitMod
    val wave1 = pqEncodeRes(
      nearestLists(emb.where(s"vec_id % $w = 0"), cent, "vec_id", 1)
        .select("vec_id", "emb", "nrm", "c_id"), cent, pqcr)
      .persist() // read twice (touched set, merge+write) — one compute
    val touched = wave1.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet // ≤ |wave| list ids
    graft.streaming.Sinks.partitionedUpsertBatch(wave1.toDF(), aug,
      partitionCols = Seq("c_id"), keyCols = Seq("vec_id"),
      versionCols = Seq("vec_id"), sortCols = Seq("vec_id"))
    listsManifestWrite(spark, aug, listsManifestRead(spark, aug) ++ touched)
    val out = incrementalIvfPqResProbe(spark, waveQueries(emb, IvfSplitMod),
      indexCodebook(spark, aug), pqcr, aug, emb,
      PqResRefine * rerankK(corpusStats(spark, dir)._1))
    wave1.unpersist() // probe reads the written files, not the plan
    out
  }

  // ---------------- OPQ: learned-rotation residual-coded IVFPQ

  /** Path of the OPQ index (layout-generation tag, like `_pqr2`). */
  def ivfPqOpqIndexPath(spark: SparkSession, dir: String): String =
    ivfIndexPath(spark, dir) + "_opq1"

  /** OPQ permutation subdir inside the index (the learned rotation — a
    * training artifact that must travel WITH the codes, like the
    * codebooks: probing with a mismatched rotation silently returns
    * wrong neighbors).
    */
  val OpqPermDir = "_opqperm"

  /** The learned OPQ rotation, restricted to PERMUTATION matrices — Ge
    * et al. 2013's parametric allocation initialization: OPQ's job is an
    * orthogonal transform R making the PqM subspaces carry BALANCED
    * information so each 4-bit sub-quantizer works equally hard; a
    * dimension permutation IS orthogonal (norms untouched, exact), it is
    * learnable corpus-driven with one combinable aggregation, and —
    * unlike the SVD alternation of full OPQ — it is bit-replayable in
    * the DuckDB oracle. Training statistic: per-dimension RESIDUAL
    * energy e_i = Σ_v ⌊res_i²·2²⁰+0.5⌋ (quantized-integer sums — exact
    * in any order; ONE 64-column row collected, parameter-server scale);
    * dims are ranked by energy (desc, dim asc) and dealt boustrophedon
    * across the [[PqM]] subspaces — the heaviest dims spread out, each
    * subspace's total energy near-balanced. Returns target→source (0-
    * based): permuted[j] = res[perm(j)].
    */
  private[pipeline] def opqPermutation(hist: DataFrame,
      cent: DataFrame): Seq[Int] = {
    val ranked = opqEnergies(hist, cent).zipWithIndex
      .sortBy { case (e, d) => (-e, d) }
    val assign = ranked.zipWithIndex.map { case ((_, dim), r) =>
      val s0 = r % (2 * PqM)
      (if (s0 < PqM) s0 else 2 * PqM - 1 - s0, r, dim)
    }
    assign.sortBy(t => (t._1, t._2)).map(_._3)
  }

  /** The OPQ training statistic: per-dimension quantized residual energy
    * of `hist` against `cent` — exposed so [[graft.pipeline.OpqSpec]] can
    * independently re-derive the allocation and measure its balance.
    */
  private[pipeline] def opqEnergies(hist: DataFrame,
      cent: DataFrame): Seq[Long] = {
    val res = assignOne(hist, cent, "vec_id", "c_id", "c_emb", "c_nrm",
        "csim", "crk")
      .join(broadcast(cent.select("c_id", "c_emb")), "c_id")
      .selectExpr("zip_with(emb, c_emb, (x, y) -> x - y) AS res")
    val sums = (0 until Dim).map(i => sum(expr(
      s"CAST(floor(element_at(res, ${i + 1}) * element_at(res, ${i + 1})" +
        s" * $QScale.0 + 0.5) AS BIGINT)")).as(s"e$i"))
    val row = res.agg(sums.head, sums.tail: _*).head() // ONE 64-long row
    (0 until Dim).map(row.getLong)
  }

  /** The persisted rotation of a built OPQ index. Fails loud when
    * absent (the [[indexCodebook]] contract).
    */
  def indexOpqPerm(spark: SparkSession, indexPath: String): Seq[Int] = {
    val (fs, _) = hadoopFs(spark, indexPath)
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        s"$indexPath/$OpqPermDir/_SUCCESS")))
      throw new IllegalStateException(
        s"no $OpqPermDir at $indexPath — index was not built by " +
          "ensureIvfPqOpqIndex; rebuild the index")
    spark.read.parquet(s"$indexPath/$OpqPermDir")
      .orderBy("pos").collect().map(_.getInt(1)).toSeq
  }

  /** Build-once OPQ-rotated residual-coded IVFPQ: identical 2-byte list
    * layout, coarse codebook and manifest as [[ensureIvfPqResIndex]],
    * but residuals (codebook seeds AND stored vectors) pass through the
    * learned permutation before sub-slicing — the standard recall
    * upgrade at the SAME byte budget (FAISS `OPQMatrix` + IndexIVFPQ).
    * The rotation persists in [[OpqPermDir]] and every probe reads it
    * back from the index.
    */
  def ensureIvfPqOpqIndex(spark: SparkSession, dir: String): String = {
    val path = ivfPqOpqIndexPath(spark, dir)
    val (fs, root) = hadoopFs(spark, path)
    def committed(r: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(r, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$CodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$PqCodebookDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/$OpqPermDir/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(r, ListsManifestFile))
    IndexCommit.ensure(fs, root)(committed) { tmp =>
      import spark.implicits._
      val emb = embDouble(spark, dir)
      val nc = nCentroids(spark, dir)
      val cent = coarseCent(emb, nc)
      val hist = emb.where(s"vec_id % $IvfSplitMod <> 0")
      val perm = opqPermutation(hist, cent)
      val pqcr = pqCodebookRes(emb, cent, nc, perm)
      pqEncodeRes(
        nearestLists(hist, cent, "vec_id", 1)
          .select("vec_id", "emb", "nrm", "c_id"), cent, pqcr, perm)
        .repartition(col("c_id"))
        .sortWithinPartitions("c_id", "vec_id")
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      cent.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$CodebookDir")
      pqcr.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$PqCodebookDir")
      perm.zipWithIndex.map { case (src, pos) => (pos, src) }
        .toDF("pos", "src").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/$OpqPermDir")
      val lists = fs.listStatus(tmp).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("c_id="))
        .map(_.getPath.getName.stripPrefix("c_id=").toLong).toSet
      listsManifestWrite(spark, tmp.toString, lists)
    }
    path
  }

  /** Incremental ANN over the OPQ index, probe leg — the residual probe
    * with the index's persisted rotation applied to the query side, at
    * the residual family's refine (×[[PqResRefine]]: equal list bytes,
    * equal re-rank IO — the apples-to-apples OPQ comparison).
    */
  def incrementalIvfPqOpq(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIvfPqOpqIndex(spark, dir)
    val emb = embDouble(spark, dir)
    incrementalIvfPqResProbe(spark, waveQueries(emb, 0),
      indexCodebook(spark, path), indexPqCodebook(spark, path), path, emb,
      PqResRefine * rerankK(corpusStats(spark, dir)._1),
      perm = indexOpqPerm(spark, path))
  }

  /** Stream-static PQ probe — the code-layout twin of
    * [[streamProbeIvfSq8]]: incoming vectors pick their [[NProbe]] probe
    * lists via the broadcast codebook array, then ONE stream-static equi
    * join on list id against the persisted CODE lists; each candidate
    * row ADC-scores STATELESSLY from its unpacked 4-bit codes and a
    * second broadcast 1-row array of the M×K PQ cells (`element_at` by
    * m·K+code — the lookup table as an expression, no per-query LUT
    * frame, no aggregation, no state store). Emitted sims are the ADC
    * ROUTING scores — exactly what a live path computes without a rank
    * window; exact re-rank is the downstream batch consumer's job, as in
    * [[incrementalIvfPqProbe]]. Static-side list IO is the 2-byte-code
    * layout (~30× less than SQ8's quantized bytes + scales).
    */
  def streamProbeIvfPq(incoming: DataFrame, cent: DataFrame,
      pqc: DataFrame, idx: DataFrame): DataFrame = {
    val centArr = cent.agg(array_sort(collect_list(
      struct(col("c_id"), col("c_emb"), col("c_nrm")))).as("cents"))
    // the PQ codebook as ONE ordered array: cell m·K+p_id at index
    // m·K+p_id+1 (struct sort is lexicographic and idx is unique)
    val pqArr = pqc.agg(array_sort(collect_list(
      struct(expr(s"m * $PqK + p_id").as("idx"), col("p_sub"),
        col("pcq")))).as("pq"))
    def cell(m: Int) =
      s"element_at(pq, ${m * PqK} + CAST((pcode DIV ${1L << (4 * m)}) % $PqK AS INT) + 1)"
    val adcq = (0 until PqM).map { m =>
      s"""CAST(floor(graft_dot(
         |  slice(q_emb, ${m * PqSubDim + 1}, $PqSubDim),
         |  ${cell(m)}.p_sub) * $QScale.0 + 0.5) AS BIGINT)""".stripMargin
    }.mkString(" + ")
    val rq = (0 until PqM).map(m => s"${cell(m)}.pcq").mkString(" + ")
    incoming
      .crossJoin(broadcast(centArr))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(expr(
          s"""slice(array_sort(transform(cents, c -> named_struct(
             |  'negsim', CAST(0 AS DOUBLE)
             |    - round(graft_dot(emb, c.c_emb) / (nrm * c.c_nrm), 6),
             |  'c_id', c.c_id))), 1, $NProbe)""".stripMargin)).as("probe"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("probe.c_id").as("c_id"))
      .crossJoin(broadcast(pqArr))
      .join(idx.selectExpr("CAST(c_id AS BIGINT) AS c_id", "vec_id",
        "pcode"), Seq("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"""round((CAST($adcq AS DOUBLE) / $QScale.0)
           |  / (q_nrm * sqrt(CAST($rq AS DOUBLE) / $QScale.0)), 6)
           |  AS asim""".stripMargin)
  }

  /** The PQ streaming probe as a batch-checkable entry (the
    * [[streamIncrementalIvfSq8]] convention): the whole incoming wave
    * probed against the persisted code lists through the stream-capable
    * plan; `IncrementalIvfSpec` proves the same core produces identical
    * rows from a real MemoryStream with zero state stores.
    */
  def streamIncrementalIvfPq(spark: SparkSession, dir: String)
      : DataFrame = {
    val path = ensureIvfPqIndex(spark, dir)
    val emb = embDouble(spark, dir)
    streamProbeIvfPq(emb.where(s"vec_id % $IvfSplitMod = 0"),
      indexCodebook(spark, path), indexPqCodebook(spark, path),
      spark.read.parquet(path))
      .orderBy("q_id", "vec_id")
  }

  val streamIncrementalIvfPqSql: String = {
    val subSelects = (0 until PqM)
      .map(m => s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM emb")
      .mkString("\n  UNION ALL ")
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    s"""WITH $embCte,
       |gcent AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb
       |         WHERE vec_id % $IvfSplitMod <> 0),
       |lists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT h.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "g.g_emb", "h.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM hist h, gcent g)
       |  WHERE grk = 1),
       |subs AS (
       |  $subSelects),
       |pcent AS (SELECT m, vec_id AS c_id, sub AS c_sub,
       |                 floor(${normSq("sub")} * $QScale.0 + 0.5)::BIGINT AS cq
       |          FROM subs WHERE vec_id < $PqK),
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM subs s
       |    JOIN hist h ON h.vec_id = s.vec_id
       |    JOIN pcent c USING (m))
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $IvfSplitMod = 0),
       |probes AS (
       |  SELECT q_id, g_id FROM (
       |    SELECT q.q_id, g.g_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "g.g_emb", "q.q_nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM q, gcent g)
       |  WHERE grk <= $NProbe),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq,
       |         c.cq
       |  FROM subs s
       |  JOIN q ON q.q_id = s.vec_id
       |  JOIN pcent c USING (m)),
       |adcs AS (
       |  SELECT n.q_id, n.vec_id,
       |         sum(l.pq)::BIGINT AS adcq, sum(l.cq)::BIGINT AS rq
       |  FROM (SELECT p.q_id, ls.vec_id
       |        FROM probes p JOIN lists ls USING (g_id)
       |        WHERE ls.vec_id <> p.q_id) n
       |  JOIN codes c ON c.vec_id = n.vec_id
       |  JOIN lut l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |  GROUP BY n.q_id, n.vec_id)
       |SELECT a.q_id, a.vec_id,
       |       round((a.adcq::DOUBLE / $QScale.0)
       |         / (q.q_nrm * sqrt(a.rq::DOUBLE / $QScale.0)), 6) AS asim
       |FROM adcs a JOIN q ON q.q_id = a.q_id
       |ORDER BY a.q_id, a.vec_id""".stripMargin
  }

  /** DuckDB CTE chain replaying the PQ-index probe from scratch (DuckDB
    * has no persisted index, so `histPred` names the index CONTENT):
    * coarse assignment, PQ encode (codes as (vec_id, m, c_id) rows — the
    * 16-bit packing is Spark-side storage the unpack inverts exactly),
    * ADC over the probed lists for the wave-`rem` query set, adaptive
    * cut, exact re-rank. Ends in `ranked(q_id, vec_id, sim, rk)` plus
    * `hist`/`q` for callers that need them (the recall gate).
    */
  private def ivfPqIncrCtes(histPred: String, rem: Int): String = {
    val w = 2 * IvfSplitMod
    val subSelects = (0 until PqM)
      .map(m => s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM emb")
      .mkString("\n  UNION ALL ")
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    s"""$embCte,
       |gcent AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb WHERE $histPred),
       |lists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT h.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "g.g_emb", "h.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM hist h, gcent g)
       |  WHERE grk = 1),
       |subs AS (
       |  $subSelects),
       |pcent AS (SELECT m, vec_id AS c_id, sub AS c_sub,
       |                 floor(${normSq("sub")} * $QScale.0 + 0.5)::BIGINT AS cq
       |          FROM subs WHERE vec_id < $PqK),
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM subs s
       |    JOIN hist h ON h.vec_id = s.vec_id
       |    JOIN pcent c USING (m))
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $w = $rem
       |        AND vec_id < ${w.toLong * QuerySetSize + rem}),
       |probes AS (
       |  SELECT q_id, g_id FROM (
       |    SELECT q.q_id, g.g_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "g.g_emb", "q.q_nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM q, gcent g)
       |  WHERE grk <= $NProbe),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq,
       |         c.cq
       |  FROM subs s
       |  JOIN q ON q.q_id = s.vec_id
       |  JOIN pcent c USING (m)),
       |cand AS (
       |  SELECT p.q_id, l.vec_id
       |  FROM probes p JOIN lists l USING (g_id) WHERE l.vec_id <> p.q_id),
       |adcs AS (
       |  SELECT n.q_id, n.vec_id, max(l.q_nrm) AS q_nrm,
       |         sum(l.pq)::BIGINT AS adcq, sum(l.cq)::BIGINT AS rq
       |  FROM cand n
       |  JOIN codes c ON c.vec_id = n.vec_id
       |  JOIN lut l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |  GROUP BY n.q_id, n.vec_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             round((adcq::DOUBLE / $QScale.0)
       |               / (q_nrm * sqrt(rq::DOUBLE / $QScale.0)), 6) DESC,
       |             vec_id ASC) AS ark
       |    FROM adcs)
       |  WHERE ark <= $PqIdxRefine
       |    * greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN q ON q.q_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)""".stripMargin
  }

  private def ivfPqIncrSql(histPred: String, rem: Int): String =
    s"""WITH ${ivfPqIncrCtes(histPred, rem)}
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  /** From-scratch replay of the RESIDUAL-coded probe: coarse assignment,
    * residual codebook/encode (centered slices), raw-query LUT, the
    * per-(query, list) coarse term, stored-norm ADC, refine-×[[PqResRefine]]
    * cut, exact re-rank.
    */
  private def ivfPqResIncrSql(histPred: String, rem: Int): String = {
    val w = 2 * IvfSplitMod
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    def dotFull(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i]))"
    // residual slice m of vector e against its centroid g, per m
    def resSubs(assignName: String, outName: String): String = (0 until PqM)
      .map { m =>
        val off = m * PqSubDim
        s"""SELECT a.vec_id, e.nrm, $m AS m,
           |       list_transform(range(1, ${PqSubDim + 1}),
           |         i -> e.emb[$off + i] - g.g_emb[$off + i]) AS sub
           |FROM $assignName a
           |JOIN emb e ON e.vec_id = a.vec_id
           |JOIN gcent g ON g.g_id = a.g_id""".stripMargin
      }.mkString(s"$outName AS (\n", "\n  UNION ALL ", ")")
    val qSubSelects = (0 until PqM)
      .map(m => s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM emb")
      .mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |gcent AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb WHERE $histPred),
       |lists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT h.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "g.g_emb", "h.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM hist h, gcent g)
       |  WHERE grk = 1),
       |nc AS (SELECT count(*)::BIGINT AS n FROM gcent),
       |cbassign AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT e.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, gcent g
       |    WHERE e.vec_id >= (SELECT n FROM nc)
       |      AND e.vec_id < (SELECT n FROM nc) + $PqK)
       |  WHERE grk = 1),
       |${resSubs("cbassign", "rsubs_cb")},
       |pcentr AS (SELECT m, vec_id - (SELECT n FROM nc) AS c_id, sub AS c_sub
       |           FROM rsubs_cb),
       |${resSubs("lists", "rsubs_h")},
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM rsubs_h s
       |    JOIN pcentr c USING (m))
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $w = $rem
       |        AND vec_id < ${w.toLong * QuerySetSize + rem}),
       |qsubs AS (
       |  $qSubSelects),
       |probes AS (
       |  SELECT q_id, g_id FROM (
       |    SELECT q.q_id, g.g_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "g.g_emb", "q.q_nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM q, gcent g)
       |  WHERE grk <= $NProbe),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq
       |  FROM qsubs s
       |  JOIN q ON q.q_id = s.vec_id
       |  JOIN pcentr c USING (m)),
       |qc AS (
       |  SELECT p.q_id, p.g_id,
       |         floor(${dotFull("q.q_emb", "g.g_emb")} * $QScale.0 + 0.5)::BIGINT AS qcq
       |  FROM probes p
       |  JOIN q ON q.q_id = p.q_id
       |  JOIN gcent g ON g.g_id = p.g_id),
       |cand AS (
       |  SELECT p.q_id, p.g_id, l.vec_id, h.nrm
       |  FROM probes p
       |  JOIN lists l USING (g_id)
       |  JOIN hist h ON h.vec_id = l.vec_id
       |  WHERE l.vec_id <> p.q_id),
       |adcs AS (
       |  SELECT n.q_id, n.vec_id, max(l.q_nrm) AS q_nrm, max(n.nrm) AS nrm,
       |         max(qc.qcq) AS qcq, sum(l.pq)::BIGINT AS adcq
       |  FROM cand n
       |  JOIN codes c ON c.vec_id = n.vec_id
       |  JOIN lut l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |  JOIN qc ON qc.q_id = n.q_id AND qc.g_id = n.g_id
       |  GROUP BY n.q_id, n.vec_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             round(((qcq + adcq)::DOUBLE / $QScale.0)
       |               / (q_nrm * nrm), 6) DESC,
       |             vec_id ASC) AS ark
       |    FROM adcs)
       |  WHERE ark <= $PqResRefine
       |    * greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN q ON q.q_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  val incrementalIvfPqResSql: String =
    ivfPqResIncrSql(s"vec_id % $IvfSplitMod <> 0", 0)

  val incrementalIvfPqResAppendSql: String = ivfPqResIncrSql(
    s"vec_id % $IvfSplitMod <> 0 OR vec_id % ${2 * IvfSplitMod} = 0",
    IvfSplitMod)

  /** DuckDB replay of [[incrementalIvfPqOpq]]: the residual chain with
    * the OPQ permutation learned IN-QUERY — per-dim quantized residual
    * energies, (energy DESC, dim ASC) ranking, boustrophedon deal, and
    * the permutation applied to codebook seeds, stored vectors, and the
    * query LUT slices alike.
    */
  private def ivfPqOpqIncrSql(histPred: String, rem: Int): String = {
    val w = 2 * IvfSplitMod
    def dotSub(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> $a[i] * $b[i]))"
    def normSq(a: String): String =
      s"list_sum(list_transform($a, v -> v * v))"
    def dotFull(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i]))"
    // full residual of the rows selected by assignName against their
    // centroid — feeds BOTH the energy statistic and the permuted slices
    def resFull(assignName: String, outName: String): String =
      s"""$outName AS MATERIALIZED (
         |  SELECT a.vec_id, e.nrm,
         |         list_transform(range(1, ${Dim + 1}),
         |           i -> e.emb[i] - g.g_emb[i]) AS res
         |  FROM $assignName a
         |  JOIN emb e ON e.vec_id = a.vec_id
         |  JOIN gcent g ON g.g_id = a.g_id)""".stripMargin
    // permuted subspace m of a full residual: res[p[m·SubDim + i]]
    def permSubs(fullName: String, outName: String): String = (0 until PqM)
      .map { m =>
        val off = m * PqSubDim
        s"""SELECT r.vec_id, r.nrm, $m AS m,
           |       list_transform(range(1, ${PqSubDim + 1}),
           |         i -> r.res[pt.p[$off + i]]) AS sub
           |FROM $fullName r, permt pt""".stripMargin
      }.mkString(s"$outName AS (\n", "\n  UNION ALL ", ")")
    val qSubSelects = (0 until PqM)
      .map { m =>
        val off = m * PqSubDim
        s"""SELECT vec_id, nrm, $m AS m,
           |       list_transform(range(1, ${PqSubDim + 1}),
           |         i -> e.emb[pt.p[$off + i]]) AS sub
           |FROM emb e, permt pt""".stripMargin
      }.mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |gcent AS (SELECT vec_id AS g_id, emb AS g_emb, nrm AS g_nrm FROM emb
       |          WHERE vec_id < $nCentroidsSqlExpr),
       |hist AS (SELECT vec_id, emb, nrm FROM emb WHERE $histPred),
       |lists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT h.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY h.vec_id ORDER BY
       |             round(${cosineSql("h.emb", "g.g_emb", "h.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM hist h, gcent g)
       |  WHERE grk = 1),
       |permlists AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT e.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, gcent g WHERE e.vec_id % $IvfSplitMod <> 0)
       |  WHERE grk = 1),
       |${resFull("permlists", "rfull_t")},
       |ren AS (SELECT i, sum(floor(res[i] * res[i] * $QScale.0 + 0.5))::BIGINT AS en
       |        FROM rfull_t, range(1, ${Dim + 1}) t(i) GROUP BY i),
       |rrk AS (SELECT i, row_number() OVER (ORDER BY en DESC, i ASC) - 1 AS r
       |        FROM ren),
       |rasg AS (SELECT i, r,
       |               CASE WHEN r % ${2 * PqM} < $PqM THEN r % ${2 * PqM}
       |                    ELSE ${2 * PqM - 1} - (r % ${2 * PqM}) END AS sub
       |        FROM rrk),
       |permt AS MATERIALIZED (SELECT list(i ORDER BY sub, r) AS p FROM rasg),
       |nc AS (SELECT count(*)::BIGINT AS n FROM gcent),
       |cbassign AS (
       |  SELECT vec_id, g_id FROM (
       |    SELECT e.vec_id, g.g_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosineSql("e.emb", "g.g_emb", "e.nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM emb e, gcent g
       |    WHERE e.vec_id >= (SELECT n FROM nc)
       |      AND e.vec_id < (SELECT n FROM nc) + $PqK)
       |  WHERE grk = 1),
       |${resFull("cbassign", "rfull_cb")},
       |${permSubs("rfull_cb", "rsubs_cb")},
       |pcentr AS (SELECT m, vec_id - (SELECT n FROM nc) AS c_id, sub AS c_sub
       |           FROM rsubs_cb),
       |${resFull("lists", "rfull_h")},
       |${permSubs("rfull_h", "rsubs_h")},
       |codes AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(${normSq("s.sub")} - 2 * ${dotSub("s.sub", "c.c_sub")}
       |               + ${normSq("c.c_sub")}, 6) ASC, c.c_id ASC) AS crk
       |    FROM rsubs_h s
       |    JOIN pcentr c USING (m))
       |  WHERE crk = 1),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id % $w = $rem
       |        AND vec_id < ${w.toLong * QuerySetSize + rem}),
       |qsubs AS (
       |  $qSubSelects),
       |probes AS (
       |  SELECT q_id, g_id FROM (
       |    SELECT q.q_id, g.g_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "g.g_emb", "q.q_nrm", "g.g_nrm")}, 6) DESC,
       |             g.g_id) AS grk
       |    FROM q, gcent g)
       |  WHERE grk <= $NProbe),
       |lut AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(${dotSub("s.sub", "c.c_sub")} * $QScale.0 + 0.5)::BIGINT AS pq
       |  FROM qsubs s
       |  JOIN q ON q.q_id = s.vec_id
       |  JOIN pcentr c USING (m)),
       |qc AS (
       |  SELECT p.q_id, p.g_id,
       |         floor(${dotFull("q.q_emb", "g.g_emb")} * $QScale.0 + 0.5)::BIGINT AS qcq
       |  FROM probes p
       |  JOIN q ON q.q_id = p.q_id
       |  JOIN gcent g ON g.g_id = p.g_id),
       |cand AS (
       |  SELECT p.q_id, p.g_id, l.vec_id, h.nrm
       |  FROM probes p
       |  JOIN lists l USING (g_id)
       |  JOIN hist h ON h.vec_id = l.vec_id
       |  WHERE l.vec_id <> p.q_id),
       |adcs AS (
       |  SELECT n.q_id, n.vec_id, max(l.q_nrm) AS q_nrm, max(n.nrm) AS nrm,
       |         max(qc.qcq) AS qcq, sum(l.pq)::BIGINT AS adcq
       |  FROM cand n
       |  JOIN codes c ON c.vec_id = n.vec_id
       |  JOIN lut l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |  JOIN qc ON qc.q_id = n.q_id AND qc.g_id = n.g_id
       |  GROUP BY n.q_id, n.vec_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             round(((qcq + adcq)::DOUBLE / $QScale.0)
       |               / (q_nrm * nrm), 6) DESC,
       |             vec_id ASC) AS ark
       |    FROM adcs)
       |  WHERE ark <= $PqResRefine
       |    * greatest($RerankKMin, (SELECT count(*) // 1000 FROM emb))),
       |reranked AS (
       |  SELECT c.q_id, c.vec_id,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM cut c
       |  JOIN emb e ON e.vec_id = c.vec_id
       |  JOIN q ON q.q_id = c.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM reranked)
       |SELECT q_id, vec_id, sim, rk::BIGINT AS rk
       |FROM ranked WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin
  }

  val incrementalIvfPqOpqSql: String =
    ivfPqOpqIncrSql(s"vec_id % $IvfSplitMod <> 0", 0)

  val incrementalIvfPqSql: String =
    ivfPqIncrSql(s"vec_id % $IvfSplitMod <> 0", 0)

  val incrementalIvfPqAppendSql: String = ivfPqIncrSql(
    s"vec_id % $IvfSplitMod <> 0 OR vec_id % ${2 * IvfSplitMod} = 0",
    IvfSplitMod)

  /** Recall floor (percent) of the persisted PQ layout — the in-plan
    * ivfpq gate's threshold ([[RecallGatePct]]): the stored-code layout
    * must not retrieve worse than the same construction computed
    * in-query.
    */
  val IvfPqIdxRecallPct = 72

  /** Retrieval-quality gate for the PERSISTED PQ layout, apples to
    * apples: truth = exact top-[[TopK]] of the wave-1 queries over the
    * INDEX CONTENT (the historical corpus — the only population the
    * index can return), hits = the [[incrementalIvfPq]] probe's
    * intersection with that truth, thresholded at [[IvfPqIdxRecallPct]].
    * Exact integers + a boolean, hash-oracled like [[recallGate]].
    */
  def ivfPqIdxRecallGate(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val hist = emb.where(s"vec_id % $IvfSplitMod <> 0")
    val q = waveQueries(emb, 0)
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    val bf = hist.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK").select("q_id", "vec_id")
    val hits = incrementalIvfPq(spark, dir).select("q_id", "vec_id")
      .join(bf, Seq("q_id", "vec_id"))
      .agg(count(lit(1)).as("hits"))
    val truth = bf.agg(count(lit(1)).as("truth"))
    hits.crossJoin(broadcast(truth))
      .selectExpr("'ivf_pq_idx' AS method", "hits", "truth",
        s"CAST($IvfPqIdxRecallPct AS BIGINT) AS thr_pct",
        s"hits * 100 >= $IvfPqIdxRecallPct * truth AS ok")
  }

  val ivfPqIdxRecallGateSql: String =
    s"""WITH ${ivfPqIncrCtes(s"vec_id % $IvfSplitMod <> 0", 0)},
       |bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, h.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosineSql("q.q_emb", "h.emb", "q.q_nrm", "h.nrm")}, 6) DESC,
       |             h.vec_id ASC) AS rk
       |    FROM hist h, q WHERE h.vec_id <> q.q_id)
       |  WHERE rk <= $TopK),
       |pk AS (SELECT q_id, vec_id FROM ranked WHERE rk <= $TopK),
       |h2 AS (SELECT count(*)::BIGINT AS hits FROM pk JOIN bf USING (q_id, vec_id)),
       |t AS (SELECT count(*)::BIGINT AS truth FROM bf)
       |SELECT 'ivf_pq_idx' AS method, h2.hits, t.truth,
       |       $IvfPqIdxRecallPct::BIGINT AS thr_pct,
       |       h2.hits * 100 >= $IvfPqIdxRecallPct * t.truth AS ok
       |FROM h2 CROSS JOIN t""".stripMargin

  // ------------------------- recall gate on a derived ×10 corpus

  /** ×10 in-process corpus replication for [[recallGateX10]] — the Scale
    * harness's replication protocol (key-shifted copies with copy-graded
    * perturbation, NOTES_r2/r11) re-expressed in CROSS-ENGINE-EXACT
    * arithmetic so recall at 10× the corpus becomes a hash-checked
    * invariant instead of a notes-table claim (round-11 verdict item 7).
    * Differences from `Scale gen` forced by oracle replayability:
    * Spark's `hash()` (murmur3) does not exist in DuckDB, so the noise is
    * integer-arithmetic pseudo-random (the [[hpExpr]] precedent):
    * `amp(c) · (((v0·2654435761 + c·40503 + i·97003) mod 1000003)/1000003
    * · 2 − 1)` with `amp(c) = 0.03 + 0.29·((c·37) mod 97)/96` spanning
    * cosine-to-original ≈0.99 (genuine near-neighbor) down to ≈0.6
    * (distractor); each noisy component is then quantized to the 2^-20
    * grid (floor — the k-means QScale trick) so both engines hold
    * bit-identical doubles before any fold.
    */
  val X10Copies = 10

  private def emb10(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val vBase = corpusStats(spark, dir)._2 + 1
    Tables.load(spark, dir, "embeddings")
      .selectExpr("vec_id AS v0",
        s"explode(sequence(0, ${X10Copies - 1})) AS c",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS e0")
      .selectExpr(s"v0 + c * ${vBase}L AS vec_id",
        s"""CASE WHEN c = 0 THEN e0 ELSE transform(sequence(1, $Dim), i ->
           |  floor((element_at(e0, i)
           |    + (0.03 + 0.29 * CAST((c * 37) % 97 AS DOUBLE) / 96.0)
           |    * (CAST((v0 * 2654435761L + c * 40503 + i * 97003) % 1000003 AS DOUBLE)
           |       / 1000003.0 * 2.0 - 1.0))
           |  * 1048576.0 + 0.5) / 1048576.0) END AS emb""".stripMargin)
      .selectExpr("vec_id", "emb", "sqrt(graft_dot(emb, emb)) AS nrm")
  }

  /** The emb10 corpus as a DuckDB CTE chain ending in `embx` (vec_id,
    * emb, nrm) — byte-for-byte the same vectors as [[emb10]].
    */
  private val emb10Cte: String =
    s"""e0 AS (SELECT vec_id AS v0, embedding::DOUBLE[] AS e0 FROM embeddings),
       |vb AS (SELECT max(v0) + 1 AS v FROM e0),
       |reps AS (SELECT v0, unnest(range(0, $X10Copies)) AS c, e0 FROM e0),
       |embq AS (
       |  SELECT v0 + c * (SELECT v FROM vb) AS vec_id,
       |         CASE WHEN c = 0 THEN e0 ELSE list_transform(range(1, ${Dim + 1}), i ->
       |           floor((e0[i]
       |             + (0.03 + 0.29 * ((c * 37) % 97)::DOUBLE / 96.0)
       |             * (((v0 * 2654435761 + c * 40503 + i * 97003) % 1000003)::DOUBLE
       |                / 1000003.0 * 2.0 - 1.0))
       |           * 1048576.0 + 0.5) / 1048576.0) END AS emb
       |  FROM reps),
       |embx AS (SELECT vec_id, emb,
       |         sqrt(list_sum(list_transform(emb, v -> v * v))) AS nrm
       |         FROM embq)""".stripMargin

  /** Minimum recall@[[TopK]] (percent) of IVF at the ×10 corpus. */
  val RecallGateX10Pct = 60

  /** Retrieval quality AT SCALE as a committed, hash-oracled entry: IVF
    * (corpus-adaptively sized codebook, the committed formula — no env
    * override) vs brute-force truth on the ×10 derived corpus. A quality
    * regression in the index construction at scale — where probed lists
    * hold real neighbor/distractor mixtures rather than sf-toy ones —
    * now flips a hash-checked row instead of only a NOTES table.
    */
  def recallGateX10(spark: SparkSession, dir: String): DataFrame = {
    val emb = emb10(spark, dir).cache()
    val nc = nCentroids(corpusStats(spark, dir)._1 * X10Copies)
    def topk(cand: DataFrame): DataFrame = cand
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $TopK").select("q_id", "vec_id")
    val queries = emb.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    val bf = topk(emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim"))
      .cache()
    val cent = emb.where(s"vec_id < $nc")
      .selectExpr("vec_id AS c_id", "emb AS c_emb", "nrm AS c_nrm")
    val assigned = nearestLists(emb, cent, "vec_id", 1)
      .select("vec_id", "emb", "nrm", "c_id")
    val probes = nearestLists(emb.where(s"vec_id < $QuerySetSize"), cent,
        "q_id", NProbe)
      .selectExpr("q_id", "emb AS q_emb", "nrm AS q_nrm", "c_id")
    val ivf = topk(probes.join(assigned, "c_id")
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim"))
    // the SQ8-stored layout at the same ×10 scale: quantized lists over
    // the same assignment, integer-dot probe, adaptive exact re-rank —
    // recall-at-scale of the quantized index is a gate too, not only the
    // float layout's (round-13, completing verdict item 4's evidence)
    val sq8Lists = assigned
      .selectExpr("vec_id", "nrm", "c_id",
        "127.0 / greatest(array_max(transform(emb, y -> abs(y))), 1e-300) AS s", "emb")
      .selectExpr("vec_id", "nrm", "c_id", "s",
        "graft_sq8_pack(emb, s) AS qb")
    val sq8 = sq8ProbeCore(sq8Lists, sq8Queries(probes), emb,
        rerankK(corpusStats(spark, dir)._1 * X10Copies), TopK)
      .select("q_id", "vec_id")
    // the PQ-coded layout at the same ×10 scale: codes over the same
    // assignment, ADC probe, ×PqIdxRefine adaptive exact re-rank —
    // recall-at-scale is now a hash-checked gate for ALL THREE list
    // layouts (round-14, completing the storage-ladder evidence)
    val pqc10 = pqCodebook(emb)
    val pq = pqProbeCore(pqEncode(assigned, pqc10),
        emb.where(s"vec_id < $QuerySetSize"), probes, pqc10, emb,
        PqIdxRefine * rerankK(corpusStats(spark, dir)._1 * X10Copies), TopK)
      .select("q_id", "vec_id")
    val truth = bf.agg(count(lit(1)).as("truth"))
    def gateRow(hits: DataFrame, name: String): DataFrame = hits
      .join(bf, Seq("q_id", "vec_id"))
      .agg(count(lit(1)).as("hits"))
      .crossJoin(broadcast(truth))
      .selectExpr(s"'$name' AS method", "hits", "truth",
        s"CAST($RecallGateX10Pct AS BIGINT) AS thr_pct",
        s"hits * 100 >= $RecallGateX10Pct * truth AS ok")
    gateRow(ivf, "ivf_x10").unionByName(gateRow(sq8, "ivf_sq8_x10"))
      .unionByName(gateRow(pq, "ivf_pq_x10"))
      .orderBy("method")
  }

  val recallGateX10Sql: String = {
    def cosX(a: String, b: String, na: String, nb: String) =
      cosineSql(a, b, na, nb)
    val ncSql = centroidsOverride.map(_.toString).getOrElse(
      s"greatest($NCentroidsMin, least($NCentroidsMax, " +
        s"(SELECT count(*) // $ListTarget FROM embx)))")
    s"""WITH $emb10Cte,
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM embx
       |      WHERE vec_id < $QuerySetSize),
       |bf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             round(${cosX("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) DESC,
       |             e.vec_id ASC) AS rk
       |    FROM embx e, q WHERE e.vec_id <> q.q_id)
       |  WHERE rk <= $TopK),
       |cent AS (SELECT vec_id AS c_id, emb AS c_emb, nrm AS c_nrm FROM embx
       |         WHERE vec_id < $ncSql),
       |assigned AS (
       |  SELECT vec_id, emb, nrm, c_id FROM (
       |    SELECT e.vec_id, e.emb, e.nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosX("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM embx e, cent c)
       |  WHERE crk = 1),
       |probes AS (
       |  SELECT q_id, q_emb, q_nrm, c_id FROM (
       |    SELECT e.vec_id AS q_id, e.emb AS q_emb, e.nrm AS q_nrm, c.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(${cosX("e.emb", "c.c_emb", "e.nrm", "c.c_nrm")}, 6) DESC,
       |             c.c_id) AS crk
       |    FROM embx e, cent c WHERE e.vec_id < $QuerySetSize)
       |  WHERE crk <= $NProbe),
       |ivf AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT p.q_id, a.vec_id,
       |           row_number() OVER (PARTITION BY p.q_id ORDER BY
       |             round(${cosX("p.q_emb", "a.emb", "p.q_nrm", "a.nrm")}, 6) DESC,
       |             a.vec_id ASC) AS rk
       |    FROM probes p JOIN assigned a USING (c_id) WHERE a.vec_id <> p.q_id)
       |  WHERE rk <= $TopK),
       |sc AS (SELECT a.vec_id, a.c_id, a.nrm, a.emb,
       |              127.0 / greatest(list_max(list_transform(a.emb, y -> abs(y))), 1e-300) AS s
       |       FROM assigned a),
       |sq AS (SELECT vec_id, c_id, nrm, s,
       |              list_transform(emb, x -> floor(x * s + 0.5)) AS qv
       |       FROM sc),
       |qq AS (SELECT q_id, q_emb, q_nrm, c_id, q_s,
       |              list_transform(q_emb, x -> floor(x * q_s + 0.5)) AS q_qv
       |       FROM (SELECT *,
       |               127.0 / greatest(list_max(list_transform(q_emb, y -> abs(y))), 1e-300) AS q_s
       |             FROM probes)),
       |approx AS (
       |  SELECT p.q_id, s.vec_id,
       |         round(list_sum(list_transform(range(1, ${Dim + 1}),
       |                 i -> s.qv[i] * p.q_qv[i]))
       |           / (s.s * p.q_s) / (s.nrm * p.q_nrm), 6) AS asim
       |  FROM qq p JOIN sq s USING (c_id)
       |  WHERE s.vec_id <> p.q_id),
       |cut AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY asim DESC, vec_id ASC) AS ark
       |    FROM approx)
       |  WHERE ark <= greatest($RerankKMin, (SELECT count(*) // 1000 FROM embx))),
       |sq8 AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT c.q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY c.q_id ORDER BY
       |             round(${cosX("qx.q_emb", "e.emb", "qx.q_nrm", "e.nrm")}, 6) DESC,
       |             c.vec_id ASC) AS rk
       |    FROM cut c
       |    JOIN embx e ON e.vec_id = c.vec_id
       |    JOIN q qx ON qx.q_id = c.q_id)
       |  WHERE rk <= $TopK),
       |subs10 AS (
       |  ${(0 until PqM).map(m =>
            s"SELECT vec_id, nrm, $m AS m, emb[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS sub FROM embx")
            .mkString("\n  UNION ALL ")}),
       |pcent10 AS (SELECT m, vec_id AS c_id, sub AS c_sub,
       |                   floor(list_sum(list_transform(sub, v -> v * v))
       |                     * $QScale.0 + 0.5)::BIGINT AS cq
       |            FROM subs10 WHERE vec_id < $PqK),
       |codes10 AS (
       |  SELECT vec_id, m, c_id FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             round(list_sum(list_transform(s.sub, v -> v * v))
       |               - 2 * list_sum(list_transform(range(1, ${PqSubDim + 1}),
       |                     i -> s.sub[i] * c.c_sub[i]))
       |               + list_sum(list_transform(c.c_sub, v -> v * v)), 6)
       |             ASC, c.c_id ASC) AS crk
       |    FROM subs10 s JOIN pcent10 c USING (m))
       |  WHERE crk = 1),
       |lut10 AS (
       |  SELECT s.vec_id AS q_id, s.nrm AS q_nrm, s.m, c.c_id,
       |         floor(list_sum(list_transform(range(1, ${PqSubDim + 1}),
       |                 i -> s.sub[i] * c.c_sub[i]))
       |           * $QScale.0 + 0.5)::BIGINT AS pq,
       |         c.cq
       |  FROM subs10 s JOIN pcent10 c USING (m)
       |  WHERE s.vec_id < $QuerySetSize),
       |adcs10 AS (
       |  SELECT n.q_id, n.vec_id, max(l.q_nrm) AS q_nrm,
       |         sum(l.pq)::BIGINT AS adcq, sum(l.cq)::BIGINT AS rq
       |  FROM (SELECT p.q_id, a.vec_id
       |        FROM probes p JOIN assigned a USING (c_id)
       |        WHERE a.vec_id <> p.q_id) n
       |  JOIN codes10 c ON c.vec_id = n.vec_id
       |  JOIN lut10 l ON l.q_id = n.q_id AND l.m = c.m AND l.c_id = c.c_id
       |  GROUP BY n.q_id, n.vec_id),
       |cut10 AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             round((adcq::DOUBLE / $QScale.0)
       |               / (q_nrm * sqrt(rq::DOUBLE / $QScale.0)), 6) DESC,
       |             vec_id ASC) AS ark
       |    FROM adcs10)
       |  WHERE ark <= $PqIdxRefine
       |    * greatest($RerankKMin, (SELECT count(*) // 1000 FROM embx))),
       |pqr AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT c.q_id, c.vec_id,
       |           row_number() OVER (PARTITION BY c.q_id ORDER BY
       |             round(${cosX("qx.q_emb", "e.emb", "qx.q_nrm", "e.nrm")}, 6) DESC,
       |             c.vec_id ASC) AS rk
       |    FROM cut10 c
       |    JOIN embx e ON e.vec_id = c.vec_id
       |    JOIN q qx ON qx.q_id = c.q_id)
       |  WHERE rk <= $TopK),
       |h AS (SELECT count(*)::BIGINT AS hits FROM ivf JOIN bf USING (q_id, vec_id)),
       |h2 AS (SELECT count(*)::BIGINT AS hits FROM sq8 JOIN bf USING (q_id, vec_id)),
       |h3 AS (SELECT count(*)::BIGINT AS hits FROM pqr JOIN bf USING (q_id, vec_id)),
       |t AS (SELECT count(*)::BIGINT AS truth FROM bf)
       |SELECT * FROM (
       |  SELECT 'ivf_x10' AS method, h.hits, t.truth,
       |         $RecallGateX10Pct::BIGINT AS thr_pct,
       |         h.hits * 100 >= $RecallGateX10Pct * t.truth AS ok
       |  FROM h CROSS JOIN t
       |  UNION ALL
       |  SELECT 'ivf_sq8_x10' AS method, h2.hits, t.truth,
       |         $RecallGateX10Pct::BIGINT AS thr_pct,
       |         h2.hits * 100 >= $RecallGateX10Pct * t.truth AS ok
       |  FROM h2 CROSS JOIN t
       |  UNION ALL
       |  SELECT 'ivf_pq_x10' AS method, h3.hits, t.truth,
       |         $RecallGateX10Pct::BIGINT AS thr_pct,
       |         h3.hits * 100 >= $RecallGateX10Pct * t.truth AS ok
       |  FROM h3 CROSS JOIN t)
       |ORDER BY method""".stripMargin
  }

  // ------------------------------------------------------------- MMR

  /** Candidate pool depth for MMR re-ranking. */
  val MmrPoolK = 20

  /** Diversified picks per query. */
  val MmrK = 5

  /** Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversified
    * top-k — the re-rank a RAG serving stack applies so the k retrieved
    * passages aren't k near-copies of the same best hit: greedily pick
    * argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), λ = 0.7.
    *
    * Spark shape: the only corpus-sized work is the exact top-[[MmrPoolK]]
    * pool per query (the [[bruteForceTopK]] scan — swap in any indexed
    * retriever at scale); everything after is bounded by Q·PoolK rows
    * (pool) and Q·PoolK² (pairwise sims), localCheckpoint-ed so the
    * [[MmrK]]−1 greedy rounds iterate tiny tables, the Lloyd-rounds
    * precedent. Scores are integer end-to-end: cosines quantize to
    * [[QScale]] grid BIGINTs (the family's floor(x·2²⁰+0.5) pattern),
    * λ clears to score = 7·relq − 3·divq, ties break on vec_id — so the
    * greedy argmax is replayable exactly by the [[mmrTopKSql]] unrolled
    * CTE stages and shuffle order can't perturb the hash. Round 1 has no
    * selected set; its score is 7·relq by convention (pure relevance).
    */
  def mmrTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embDouble(spark, dir)
    val queries = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "emb AS q_emb", "nrm AS q_nrm")
    val pool = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", "emb", "nrm",
        s"CAST(floor(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")} * $QScale.0 + 0.5) AS BIGINT) AS relq")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id ORDER BY relq DESC, vec_id ASC)"))
      .where(s"rk <= $MmrPoolK")
      .select("q_id", "vec_id", "emb", "nrm", "relq")
      .localCheckpoint() // Q·PoolK rows — everything below is pool-bounded
    val psim = pool.selectExpr("q_id", "vec_id AS a_id", "emb AS a_emb", "nrm AS a_nrm")
      .join(pool.selectExpr("q_id", "vec_id AS b_id", "emb AS b_emb", "nrm AS b_nrm"),
        Seq("q_id"))
      .where("a_id <> b_id")
      .selectExpr("q_id", "a_id", "b_id",
        s"CAST(floor(${cosineExpr("a_emb", "b_emb", "a_nrm", "b_nrm")} * $QScale.0 + 0.5) AS BIGINT) AS ps")
      .localCheckpoint() // Q·PoolK² rows
    val cand = pool.select("q_id", "vec_id", "relq")
    def argmax(scored: DataFrame, rk: Int): DataFrame =
      scored.groupBy("q_id")
        .agg(max(expr("named_struct('sc', score, 'nv', -vec_id)")).as("m"))
        .selectExpr("q_id", s"CAST($rk AS BIGINT) AS rk",
          "-m.nv AS vec_id", "m.sc AS score")
    var sel = argmax(cand.selectExpr("q_id", "vec_id", "7 * relq AS score"), 1)
      .localCheckpoint()
    for (r <- 2 to MmrK) {
      val divq = psim
        .join(sel.selectExpr("q_id", "vec_id AS b_id"), Seq("q_id", "b_id"))
        .groupBy("q_id", "a_id").agg(max("ps").as("divq"))
        .withColumnRenamed("a_id", "vec_id")
      val scored = cand
        .join(sel.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_anti")
        .join(divq, Seq("q_id", "vec_id"))
        .selectExpr("q_id", "vec_id", "7 * relq - 3 * divq AS score")
      sel = sel.unionByName(argmax(scored, r)).localCheckpoint()
    }
    sel.orderBy("q_id", "rk")
  }

  val mmrTopKSql: String = {
    def qz(cos: String) = s"floor(($cos) * $QScale + 0.5)::BIGINT"
    // greedy stage r: score candidates outside sel<r-1> against it, keep rn=1
    def stage(r: Int): String =
      s"""s$r AS (SELECT q_id, $r::BIGINT AS rk, vec_id, score FROM (
         |  SELECT c.q_id, c.vec_id, 7 * c.relq - 3 * d.divq AS score,
         |         row_number() OVER (PARTITION BY c.q_id
         |           ORDER BY 7 * c.relq - 3 * d.divq DESC, c.vec_id) AS rn
         |  FROM pool c
         |  JOIN (SELECT p.q_id, p.a_id, max(p.ps) AS divq
         |        FROM ps p JOIN sel${r - 1} s
         |          ON p.q_id = s.q_id AND p.b_id = s.vec_id
         |        GROUP BY p.q_id, p.a_id) d
         |    ON c.q_id = d.q_id AND c.vec_id = d.a_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s
         |                    WHERE s.q_id = c.q_id AND s.vec_id = c.vec_id)
         |) WHERE rn = 1),
         |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM emb
       |      WHERE vec_id < $QuerySetSize),
       |pool AS (SELECT q_id, vec_id, emb, nrm, relq FROM (
       |  SELECT q_id, vec_id, emb, nrm, relq,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY relq DESC, vec_id) AS rk
       |  FROM (SELECT q.q_id, e.vec_id, e.emb, e.nrm,
       |               ${qz(cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm"))} AS relq
       |        FROM emb e, q WHERE e.vec_id <> q.q_id))
       |  WHERE rk <= $MmrPoolK),
       |ps AS (SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
       |              ${qz(cosineSql("a.emb", "b.emb", "a.nrm", "b.nrm"))} AS ps
       |       FROM pool a JOIN pool b
       |         ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
       |s1 AS (SELECT q_id, 1::BIGINT AS rk, vec_id, score FROM (
       |  SELECT q_id, vec_id, 7 * relq AS score,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY 7 * relq DESC, vec_id) AS rn FROM pool) WHERE rn = 1),
       |sel1 AS (SELECT * FROM s1),
       |${(2 to MmrK).map(stage).mkString(",\n")}
       |SELECT q_id, rk, vec_id, score FROM sel$MmrK ORDER BY q_id, rk""".stripMargin
  }

  // --------------------------------------------------- hard negatives

  /** Picks per role per anchor. */
  val HnK = 5

  /** Hard-negative mining for contrastive training (the data side of
    * triplet/InfoNCE fine-tuning): for each anchor, the [[HnK]] most
    * similar SAME-label vectors are its positives and the [[HnK]] most
    * similar CROSS-label vectors its hard negatives — the near-boundary
    * examples a random-negative sampler almost never draws, which is
    * precisely why mined batches train better (e.g. SimCSE/DPR practice).
    * One broadcast of the anchor batch scores the corpus once; both roles
    * rank in a single window partitioned by (anchor, role), so the mining
    * pass costs exactly one corpus scan regardless of role count — at
    * scale, swap the scan for the IVF probe exactly as [[ivfTopK]] does.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embDouble(spark, dir)
    val anchors = corpus.where(s"vec_id < $QuerySetSize")
      .selectExpr("vec_id AS q_id", "label AS q_label",
        "emb AS q_emb", "nrm AS q_nrm")
    corpus.join(broadcast(anchors), col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id",
        "CASE WHEN label = q_label THEN 'positive' ELSE 'hard_negative' END AS role",
        s"round(${cosineExpr("q_emb", "emb", "q_nrm", "nrm")}, 6) AS sim")
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY q_id, role ORDER BY sim DESC, vec_id ASC)"))
      .where(s"rk <= $HnK")
      .selectExpr("q_id", "role", "CAST(rk AS BIGINT) AS rk", "vec_id", "sim")
      .orderBy("q_id", "role", "rk")
  }

  val hardNegativesSql: String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS q_id, label AS q_label, emb AS q_emb,
       |             nrm AS q_nrm
       |      FROM emb WHERE vec_id < $QuerySetSize),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |         CASE WHEN e.label = q.q_label THEN 'positive'
       |              ELSE 'hard_negative' END AS role,
       |         round(${cosineSql("q.q_emb", "e.emb", "q.q_nrm", "e.nrm")}, 6) AS sim
       |  FROM emb e, q WHERE e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, role, vec_id, sim,
       |         row_number() OVER (PARTITION BY q_id, role
       |           ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM scored)
       |SELECT q_id, role, rk::BIGINT AS rk, vec_id, sim
       |FROM ranked WHERE rk <= $HnK ORDER BY q_id, role, rk""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_filtered_topk" -> filteredTopK,
    "sim_mmr_topk" -> mmrTopK,
    "sim_hard_negatives" -> hardNegatives,
    "sim_bruteforce_topk" -> bruteForceTopK,
    "sim_bruteforce_agg_topk" -> bruteForceAggTopK,
    "sim_lsh_topk" -> lshTopK,
    "sim_lsh_multi_topk" -> lshMultiTopK,
    "sim_ivf_topk" -> ivfTopK,
    "sim_ivf2_topk" -> ivf2TopK,
    "sim_ivf_trained_topk" -> ivfTrainedTopK,
    "pipeline_cluster_mix" -> clusterMix,
    "pipeline_decontaminate_semantic_indexed" -> decontaminateSemanticIndexed,
    "sim_pq_topk" -> pqTopK,
    "sim_sq8_topk" -> sq8TopK,
    "sim_ivfpq_topk" -> ivfPqTopK,
    "sim_recall_gate" -> recallGate,
    "sim_recall_gate_x10" -> recallGateX10,
    "sim_incremental_ivf" -> incrementalIvf,
    "sim_incremental_ivf_sq8" -> incrementalIvfSq8,
    "sim_incremental_ivf_sq8_append" -> incrementalIvfSq8Append,
    "stream_incremental_ivf_sq8" -> streamIncrementalIvfSq8,
    "sim_incremental_ivf_pq" -> incrementalIvfPq,
    "sim_incremental_ivf_pq_res" -> incrementalIvfPqRes,
    "sim_incremental_ivf_opq" -> incrementalIvfPqOpq,
    "sim_incremental_ivf_pq_res_append" -> incrementalIvfPqResAppend,
    "sim_incremental_ivf_pq_append" -> incrementalIvfPqAppend,
    "stream_incremental_ivf_pq" -> streamIncrementalIvfPq,
    "sim_ivfpq_idx_recall_gate" -> ivfPqIdxRecallGate,
    "sim_incremental_ivf_append" -> incrementalIvfAppend,
    "sim_incremental_ivf_compact" -> incrementalIvfCompact,
    "sim_ivf_refresh" -> ivfRefresh,
    "stream_incremental_ivf" -> streamIncrementalIvf,
    "sim_semdedup" -> semDedup,
    "dedup_embedding_cosine" -> embeddingNearDup)

  val oracles: Map[String, String] = Map(
    "sim_filtered_topk" -> filteredTopKSql,
    "sim_mmr_topk" -> mmrTopKSql,
    "sim_hard_negatives" -> hardNegativesSql,
    "sim_bruteforce_topk" -> bruteForceTopKSql,
    // window-free construction, identical output — shared oracle
    "sim_bruteforce_agg_topk" -> bruteForceTopKSql,
    "sim_lsh_topk" -> lshTopKSql,
    "sim_lsh_multi_topk" -> lshMultiTopKSql,
    "sim_ivf_topk" -> ivfTopKSql,
    "sim_ivf2_topk" -> ivf2TopKSql,
    "sim_ivf_trained_topk" -> ivfTrainedTopKSql,
    "pipeline_cluster_mix" -> clusterMixSql,
    "pipeline_decontaminate_semantic_indexed" -> decontaminateSemanticIndexedSql,
    "sim_pq_topk" -> pqTopKSql,
    "sim_sq8_topk" -> sq8TopKSql,
    "sim_ivfpq_topk" -> ivfPqTopKSql,
    "sim_recall_gate" -> recallGateSql,
    "sim_recall_gate_x10" -> recallGateX10Sql,
    "sim_incremental_ivf" -> incrementalIvfSqlProbe,
    "sim_incremental_ivf_sq8" -> incrementalIvfSq8Sql,
    "sim_incremental_ivf_sq8_append" -> incrementalIvfSq8AppendSql,
    "stream_incremental_ivf_sq8" -> streamIncrementalIvfSq8Sql,
    "sim_incremental_ivf_pq" -> incrementalIvfPqSql,
    "sim_incremental_ivf_pq_res" -> incrementalIvfPqResSql,
    "sim_incremental_ivf_opq" -> incrementalIvfPqOpqSql,
    "sim_incremental_ivf_pq_res_append" -> incrementalIvfPqResAppendSql,
    "sim_incremental_ivf_pq_append" -> incrementalIvfPqAppendSql,
    "stream_incremental_ivf_pq" -> streamIncrementalIvfPqSql,
    "sim_ivfpq_idx_recall_gate" -> ivfPqIdxRecallGateSql,
    "sim_incremental_ivf_append" -> incrementalIvfSqlAppend,
    // identical append semantics (file-append + OPTIMIZE instead of
    // merge-upsert), so the recompute-from-scratch oracle is shared
    "sim_incremental_ivf_compact" -> incrementalIvfSqlAppend,
    "sim_ivf_refresh" -> ivfRefreshSql,
    "stream_incremental_ivf" -> streamIncrementalIvfSql,
    "sim_semdedup" -> semDedupSql,
    "dedup_embedding_cosine" -> embeddingNearDupSql)
}

/** Bounded per-group top-k as a typed `Aggregator` (registered as
  * `graft_topk(sim, id)`): the buffer holds at most [[Similarity.TopK]]
  * (sim, id) pairs ordered by (sim DESC, id ASC) — map-side combinable,
  * so a rank window's partition-wide sort shuffle is replaced by
  * partial-reduced ≤ k-row partials per group per partition. Determinism:
  * sims arrive pre-rounded (the family's round(·, 6) discipline) and ties
  * break on id, exactly the window form's ORDER BY.
  */
object TopKAgg extends org.apache.spark.sql.expressions.Aggregator[
    (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  private def insert(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= Similarity.TopK && !better(v, b.last)) b
    else {
      val nb = (b :+ v).sortWith(better)
      if (nb.size > Similarity.TopK) nb.take(Similarity.TopK) else nb
    }
  def zero: Seq[(Double, Long)] = Vector.empty
  def reduce(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    insert(b, v)
  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
  def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  /** Register as `graft_topk(sim, id)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("graft_topk", org.apache.spark.sql.functions.udaf(this))
}
