package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{SparkEntry, Tables}

/** Scale-evidence harness (round-7 verdict item 1): replicate the sf0.1
  * tables k-fold with key shifts and per-copy text salting, then time the
  * headline entries at 1×/10×/100× so the 100 TB story is MEASURED, not
  * argued from plan shapes.
  *
  * Replication design (same protocol as the round-2 study, NOTES_r2.md):
  * - documents: `doc_id += c·D`; every 4th token of copies c>0 gets a
  *   `~c` suffix, so replicas are NOT near-duplicates of their originals —
  *   candidate growth then measures the ALGORITHM's scaling, not an
  *   artificial 10-clone quadratic blowup. `n_chars` is recomputed.
  * - embeddings: `vec_id += c·V`; each copy's vectors nudged by `c/1000`
  *   per component (distinct but bucket-compatible neighborhoods).
  * - orders/lineitem: `o_orderkey/l_orderkey += c·O` (fact-side weak
  *   scaling; dimensions stay 1× — the broadcast sides are meant to stay
  *   small while facts grow, which is exactly the 100 TB shape).
  * - events: `event_id += c·E`, everything else unchanged (10× sequential
  *   load through the same FADS parameter envelope; ts surfaces as LONG
  *   nanos via Tables.load, so the copy preserves it bit-for-bit).
  * - dims (region/nation/customer/supplier/part): copied as-is.
  *
  * Usage:
  *   runMain graft.tools.Scale gen   <baseSfDir> <outDir> <k> [corpusOnly]
  *   runMain graft.tools.Scale run   <dir> <label> <query...>
  *   runMain graft.tools.Scale probe <batchDir> <indexDir>
  *
  * `run` prints one JSON line per query: best-of-2 after one untimed
  * warmup (noop sink), plus the result row count for candidate-shaped
  * surfaces. `probe` times ONLY the incremental-dedup probe, holding the
  * incoming batch fixed (batchDir's) while using indexDir's persisted
  * index — the batch-cost-vs-index-size measurement.
  */
object Scale {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: base :: out :: k :: rest =>
      gen(session(), base, out, k.toInt, corpusOnly = rest.contains("corpusOnly"),
        eventsOnly = rest.contains("eventsOnly"))
    case "run" :: dir :: label :: names if names.nonEmpty =>
      run(session(), dir, label, names)
    case "probe" :: batchDir :: indexDir :: Nil =>
      probe(session(), batchDir, indexDir)
    case "stream" :: dir :: Nil =>
      stream(dir)
    case other =>
      sys.error(s"usage: gen <base> <out> <k> [corpusOnly] | run <dir> <label> <q...> | probe <batchDir> <indexDir> | stream <dir>; got $other")
  }

  def gen(spark: SparkSession, base: String, out: String, k: Int,
      corpusOnly: Boolean, eventsOnly: Boolean = false): Unit = {

    def copies(df: DataFrame): DataFrame =
      df.selectExpr(s"explode(sequence(0, ${k - 1})) AS c", "*")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] wrote $out/$name.parquet")
    }

    if (eventsOnly) {
      val e = Tables.load(spark, base, "events").agg(org.apache.spark.sql.functions
        .max("event_id")).head().getLong(0) + 1
      write(copies(Tables.load(spark, base, "events"))
        .withColumn("event_id",
          org.apache.spark.sql.functions.expr(s"event_id + c * ${e}L"))
        .drop("c"), "events")
      spark.stop()
      return
    }

    val d = Tables.load(spark, base, "documents").agg(org.apache.spark.sql.functions
      .max("doc_id")).head().getLong(0) + 1
    write(copies(Tables.load(spark, base, "documents"))
      .selectExpr(
        s"doc_id + c * ${d}L AS doc_id",
        // salt every 4th token of copies c>0: replicas share no 3-gram
        // run longer than 3 tokens with the original, so they are not
        // near-dups at the 0.15/0.5 thresholds (round-2 protocol)
        """CASE WHEN c = 0 THEN text
          |ELSE array_join(transform(split(text, ' '),
          |       (w, i) -> CASE WHEN i % 4 = 0
          |                 THEN concat(w, '~', CAST(c AS STRING)) ELSE w END), ' ')
          |END AS text""".stripMargin,
        "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars"),
      "documents")

    val v = Tables.load(spark, base, "embeddings").agg(org.apache.spark.sql.functions
      .max("vec_id")).head().getLong(0) + 1
    write(copies(Tables.load(spark, base, "embeddings"))
      .selectExpr(
        s"vec_id + c * ${v}L AS vec_id",
        "transform(embedding, x -> CAST(x + c * 0.001 AS FLOAT)) AS embedding",
        "label"),
      "embeddings")

    if (!corpusOnly) {
      val o = Tables.load(spark, base, "orders").agg(org.apache.spark.sql.functions
        .max("o_orderkey")).head().getLong(0) + 1
      write(copies(Tables.load(spark, base, "orders"))
        .withColumn("o_orderkey",
          org.apache.spark.sql.functions.expr(s"o_orderkey + c * ${o}L"))
        .drop("c"), "orders")
      write(copies(Tables.load(spark, base, "lineitem"))
        .withColumn("l_orderkey",
          org.apache.spark.sql.functions.expr(s"l_orderkey + c * ${o}L"))
        .drop("c"), "lineitem")

      val e = Tables.load(spark, base, "events").agg(org.apache.spark.sql.functions
        .max("event_id")).head().getLong(0) + 1
      write(copies(Tables.load(spark, base, "events"))
        .withColumn("event_id",
          org.apache.spark.sql.functions.expr(s"event_id + c * ${e}L"))
        .drop("c"), "events")

      Seq("region", "nation", "customer", "supplier", "part")
        .foreach(n => write(Tables.load(spark, base, n), n))
    }
    spark.stop()
  }

  /** Entries whose output cardinality is itself scale evidence (candidate
    * pairs / survivors) — `run` counts them once, untimed.
    */
  private val countShaped = Set(
    "dedup_minhash_lsh", "dedup_jaccard_lsh_gated", "dedup_simhash_wide",
    "dedup_incremental_batch", "dedup_components", "pipeline_clean_corpus")

  def run(spark: SparkSession, dir: String, label: String,
      names: Seq[String]): Unit = {
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t = timed(fn(spark, dir).write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
        t
      }
      once() // untimed warmup
      val best = math.min(once(), once())
      val rows =
        if (countShaped(name)) { val n = fn(spark, dir).count(); spark.catalog.clearCache(); n }
        else -1L
      println(f"""[scale] {"label":"$label","query":"$name","sec":$best%.3f,"rows":$rows}""")
    }
    spark.stop()
  }

  /** Streaming FADS throughput at scale: unthrottled paced replay of the
    * given dir's `events` through the transformWithState operator (the
    * graft.Bench streaming leg, parameterized by corpus) — single-stream
    * and 8-shard, best-of-2. At 10× events per trigger the per-batch
    * RocksDB commit floor amortizes (NOTES_r2 predicted streaming shards
    * converge to the batch ratio at production batch sizes; this measures
    * it).
    */
  def stream(dir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.streaming.FadsStream.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.streaming.{Event, FadsStream, PacedReplay}

    val events = Tables.load(spark, dir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
    val nRows = events.count()
    val stageDir = java.nio.file.Files.createTempDirectory("scale-stage").toString
    val rowsPerFile = math.max(5000, (nRows / 10).toInt)
    PacedReplay.stage(events, Seq("ts", "event_id"), rowsPerFile, stageDir)

    def streamOnce(parts: String,
        wire: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[_]): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val ckpt = java.nio.file.Files.createTempDirectory("scale-ckpt").toString
      val t = timed {
        val q = wire(PacedReplay.stream(spark, stageDir, events.schema).as[Event])
          .writeStream.format("noop").outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(PacedReplay.trigger(0))
          .start()
        q.processAllAvailable()
        q.stop()
      }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      t
    }

    val cfg = graft.SparkEntry.eventsFadsConfig
    def single() = streamOnce("2", ds => FadsStream.anonymize(ds, cfg))
    def sharded() = streamOnce("8",
      ds => FadsStream.anonymizeSharded(ds, cfg, e => e.user_id % 8))
    val s1 = math.min(single(), single())
    val s8 = math.min(sharded(), sharded())
    println(f"""[scale] {"stream_dir":"$dir","rows":$nRows,"single_sec":$s1%.3f,"single_rps":${nRows / s1}%.1f,"sharded_sec":$s8%.3f,"sharded_rps":${nRows / s8}%.1f}""")
    spark.stop()
  }

  def probe(spark: SparkSession, batchDir: String, indexDir: String): Unit = {
    import graft.pipeline.Dedup
    val indexPath = Dedup.ensureMinhashIndex(spark, indexDir)
    val indexRows = spark.read.parquet(indexPath).count()
    val incoming = Tables.load(spark, batchDir, "documents")
      .where(s"doc_id % ${Dedup.IncrSplitMod} = 0")
    val batchRows = incoming.count()
    def once(): Double = {
      val t = timed(Dedup.incrementalProbe(spark, incoming, indexPath)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      t
    }
    once() // untimed warmup
    val best = math.min(once(), once())
    val cand = Dedup.incrementalProbe(spark, incoming, indexPath).count()
    println(f"""[scale] {"probe_batch":"$batchDir","index":"$indexDir","index_rows":$indexRows,"batch_rows":$batchRows,"sec":$best%.3f,"candidates":$cand}""")
    spark.stop()
  }
}
