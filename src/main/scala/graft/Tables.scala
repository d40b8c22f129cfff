package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata loaders (TESTDATA.md): one parquet file per table under
  * `/root/testdata/sf{0.001,0.01,0.1}/`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path goes through here: make graft's native expressions
    // (graft_dot, graft_polyhash) available to selectExpr/spark.sql
    graft.functions.VectorExpressions.register(spark)
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // unless told to surface it as a raw nanos-since-epoch LONG. Set at
      // read time so callers need no special session config; `tsNanos`
      // converts where timestamp semantics are needed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events.ts (nanos-since-epoch LONG, see [[load]]) → epoch milliseconds.
    * Integral `div` — `Column./` round-trips through DOUBLE, which cannot
    * represent nanos-since-epoch (~1.7e18 > 2^53) exactly.
    */
  def tsNanosToMillis(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"$colName div 1000000L")

  /** events.ts LONG nanos → epoch microseconds, exact integral arithmetic. */
  def tsNanosToMicros(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"$colName div 1000L")

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's naming. Memoized per (session, dir): registering reads 10
    * parquet footers (~0.5-0.9 s), which dominated every sql_shared_* row
    * when repeated per query — one registration per session now serves all
    * of them (re-registering only when the data dir changes). The memo is
    * only a fast path: any view a caller dropped (or shadowed and then
    * dropped) since the last call is re-registered via a per-name catalog
    * check, and the map is weak-keyed so stopped sessions don't accumulate
    * (ADVICE r4).
    */
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    val sameDir = registeredDir.get(spark) == sfDir
    names.foreach { n =>
      if (!sameDir || !spark.catalog.tableExists(n))
        load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    registeredDir.put(spark, sfDir)
  }

  /** Drop the memo for a session — callers that replace views with foreign
    * data (tests, tools) can force the next [[registerAll]] to rebuild.
    */
  def invalidate(spark: SparkSession): Unit = synchronized {
    registeredDir.remove(spark)
  }
}
