package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEARNED domain-mixture weights (DoReMi-lite, r14 verdict item 6) —
  * the published next step after static mixing: instead of hand-set
  * ([[CorpusOps.temperatureSample]]) or size-balanced
  * ([[Similarity.clusterMix]]) cluster weights, LEARN per-cluster
  * sampling weights from a proxy model's excess loss (Xie et al. 2023's
  * DoReMi, reduced to the integer-exact machinery this repo already
  * ships): clusters whose documents the quality proxy finds HARD
  * (above-average loss) are up-weighted, easy clusters down-weighted.
  *
  * Composition — both inputs are this repo's trained artifacts:
  *  - domains = the learned k-means clusters over the document
  *    embeddings ([[Similarity.clusterAssignments]], the
  *    `pipeline_cluster_mix` trainer);
  *  - proxy loss = the batch perceptron's margins
  *    ([[QualityClassifier.marginFrame]], the
  *    `pipeline_quality_classifier` trainer): ℓ_d = max(0, −y·m_d),
  *    capped at [[LossCap]] so every downstream product stays in
  *    BIGINT range.
  *
  * The [[Rounds]] multiplicative-weights rounds are a genuine feedback
  * loop, integer-exact end to end (the perceptron-trajectory
  * convention): round t samples with the CURRENT weights (accept iff
  * u_t < w_c, u_t a round-salted Knuth hash on the 2¹⁶ grid — the
  * [[CorpusOps.temperatureSample]] accept form), measures each
  * cluster's average loss ON THE SAMPLE against the global average,
  * and updates w_c ← clamp(w_c · r_c / [[Scale]]) with
  * r_c = [[Scale]] · (ℓ̄_c + 1)/(ℓ̄ + 1) as an exact integer ratio,
  * clamped to [½, 2]×[[Scale]] per round and [[WMin]], [[WMax]]
  * overall. Every quantity is a BIGINT; `div` truncation = DuckDB `//`
  * floor on the all-positive operands.
  *
  * Scale shape: each round is ONE combinable per-cluster aggregation
  * (map-side partials) with a K-row collect — parameter-server state,
  * the Lloyd-round/perceptron convention; sampling and scoring are
  * row-local against the broadcast-literal weight CASE. The base
  * (doc, cluster, loss) frame is cached for the T+1 scans and released
  * before return.
  *
  * The final per-doc row carries its cluster's LEARNED weight and the
  * resulting keep verdict, so the hash gates the entire weight
  * trajectory (one drifted round moves every w_final) and both
  * up-weighted and down-weighted clusters stay live.
  */
object LearnedMix {

  /** Multiplicative-weights rounds. */
  val Rounds = 3

  /** Fixed-point scale of the per-round ratio. */
  val Scale = 256L

  /** Per-doc loss cap. The ratio numerator Scale·(L_c + n_c)·N is up to
    * 256·(n_c·(10⁶+1))·N ≈ 2.6e8·n_c·N — past 2⁶³ once n_c·N > ~3.6e10
    * (a ~190k-doc cluster at equal accept counts), so the ratio is
    * computed in WIDE integers on both engines (BigInt here, HUGEINT in
    * the oracle — r15 ADVICE finding 1); only the clamped [128, 512]
    * result re-enters 64-bit arithmetic.
    */
  val LossCap = 1000000L

  /** Initial / minimum / maximum weight on the 2¹⁶ accept grid. */
  val W0 = 32768L
  val WMin = 1024L
  val WMax = 65536L

  /** Round-salted accept hash on the 2¹⁶ grid (round 1..Rounds+1; the
    * final verdict uses round Rounds+1 — fresh randomness, the same
    * Knuth-hash family as [[Similarity.clusterMix]]).
    */
  private def uExpr(round: Int): String =
    s"(((doc_id + $round * 1000003) % 2147483647) * 2654435761)" +
      " % 2147483647 % 65536"

  private def uSql(round: Int): String =
    s"(((doc_id + $round * 1000003) % 2147483647) * 2654435761)" +
      " % 2147483647 % 65536"

  /** The (doc_id, c_id, loss) base frame: cluster assignment joined to
    * the proxy margins on doc_id = vec_id (the corpora are id-aligned by
    * construction).
    */
  private def baseFrame(spark: SparkSession, dir: String): DataFrame =
    Similarity.clusterAssignments(spark, dir)
      .join(QualityClassifier.marginFrame(spark, dir),
        col("vec_id") === col("doc_id"))
      .selectExpr("doc_id", "c_id",
        s"CAST(least(greatest(0, -y * margin), $LossCap) AS BIGINT) AS loss")

  /** One multiplicative-weights update from the per-cluster sample
    * stats — pure integer driver arithmetic, K-sized (shared by the
    * entry and [[graft.pipeline.LearnedMixSpec]]'s replica).
    */
  private[pipeline] def updateWeights(w: Map[Long, Long],
      stats: Map[Long, (Long, Long)]): Map[Long, Long] = {
    val ltot = stats.valuesIterator.map(_._1).sum
    val nacc = stats.valuesIterator.map(_._2).sum
    w.map { case (c, wv) =>
      val (lc, nc) = stats.getOrElse(c, (0L, 0L))
      // BigInt: the un-clamped numerator exceeds 2⁶³ for clusters past
      // ~190k docs (LossCap scaladoc) — Long would wrap silently while
      // DuckDB's HUGEINT replay stays exact, diverging the engines
      val r =
        if (nc == 0 || ltot + nacc == 0) Scale
        else math.min(2 * Scale, math.max(Scale / 2,
          ((BigInt(Scale) * (BigInt(lc) + BigInt(nc)) * BigInt(nacc)) /
            (BigInt(nc) * (BigInt(ltot) + BigInt(nacc)))).toLong))
      c -> math.min(WMax, math.max(WMin, (wv * r) / Scale))
    }
  }

  private def wCase(w: Map[Long, Long]): String =
    w.toSeq.sorted
      .map { case (c, v) => s"WHEN $c THEN CAST($v AS BIGINT)" }
      .mkString("CASE c_id ", " ", " ELSE CAST(0 AS BIGINT) END")

  /** Q — the committed entry: assign clusters, score losses, run the
    * [[Rounds]]-round weight-learning loop, emit every doc with its
    * cluster, loss, learned final weight, and keep verdict.
    */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val base = baseFrame(spark, dir).cache()
    try {
      var w: Map[Long, Long] = base.select("c_id").distinct()
        .collect().map(_.getLong(0) -> W0).toMap // K-sized
      for (t <- 1 to Rounds) {
        val stats = base
          .selectExpr("c_id", "loss", s"${uExpr(t)} AS u",
            s"${wCase(w)} AS wc")
          .where("u < wc")
          .groupBy("c_id")
          .agg(sum("loss").as("lc"), count(lit(1)).as("nc"))
          .collect() // K rows per round — parameter-server state
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        w = updateWeights(w, stats)
      }
      base
        .selectExpr("doc_id", "c_id", "loss",
          s"${wCase(w)} AS w_final", s"${uExpr(Rounds + 1)} AS u")
        .selectExpr("doc_id", "c_id", "loss", "w_final",
          "u < w_final AS kept")
        .orderBy("doc_id")
    } finally base.unpersist(false)
  }

  /** Whole-chain DuckDB replay: the k-means assignment CTEs + the full
    * perceptron training chain (both shared verbatim with their source
    * entries' oracles) + the [[Rounds]] unrolled weight rounds as
    * materialized K-row weight tables.
    */
  val sql: String = {
    val rounds = (1 to Rounds).map { t =>
      val p = t - 1
      s"""k$t AS (SELECT b.doc_id, b.c_id, b.loss, ${uSql(t)} AS u
         |        FROM mixbase b),
         |s$t AS (SELECT k.c_id,
         |          coalesce(sum(CASE WHEN k.u < m.w THEN k.loss END),
         |                   0)::BIGINT AS lc,
         |          coalesce(sum(CASE WHEN k.u < m.w THEN 1 END),
         |                   0)::BIGINT AS nc
         |        FROM k$t k JOIN mix$p m USING (c_id) GROUP BY k.c_id),
         |t$t AS (SELECT sum(lc)::BIGINT AS ltot, sum(nc)::BIGINT AS nacc
         |        FROM s$t),
         |mix$t AS MATERIALIZED (
         |  SELECT s.c_id,
         |    least($WMax, greatest($WMin,
         |      (m.w * (CASE WHEN s.nc = 0 OR t.ltot + t.nacc = 0 THEN $Scale
         |              ELSE least(${2 * Scale}, greatest(${Scale / 2},
         |                (($Scale::HUGEINT * (s.lc + s.nc) * t.nacc)
         |                  // (s.nc::HUGEINT * (t.ltot + t.nacc)))::BIGINT))
         |              END))
         |        // $Scale))::BIGINT AS w
         |  FROM s$t s JOIN mix$p m USING (c_id) CROSS JOIN t$t t)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Similarity.embCte},
       |${Similarity.trainedAssignCtes},
       |${QualityClassifier.marginCtes},
       |mixbase AS MATERIALIZED (
       |  SELECT q.doc_id, a.c_id,
       |         least(greatest(0, -q.y * q.margin), $LossCap)::BIGINT AS loss
       |  FROM assigned a JOIN qc q ON q.doc_id = a.vec_id),
       |mix0 AS MATERIALIZED (
       |  SELECT c_id, $W0::BIGINT AS w
       |  FROM (SELECT DISTINCT c_id FROM mixbase)),
       |$rounds,
       |fin AS (SELECT b.doc_id, b.c_id, b.loss, ${uSql(Rounds + 1)} AS u
       |        FROM mixbase b)
       |SELECT f.doc_id, f.c_id, f.loss, m.w AS w_final, (f.u < m.w) AS kept
       |FROM fin f JOIN mix$Rounds m USING (c_id)
       |ORDER BY f.doc_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_learned_mix" -> query)

  val oracles: Map[String, String] = Map(
    "pipeline_learned_mix" -> sql)
}
