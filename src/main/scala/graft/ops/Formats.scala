package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** File-format round-trips beyond parquet: ORC, JSON-lines, and gzip CSV.
  * Each entry writes a deterministic slice of `events` in the target format,
  * reads it back with an explicit schema, and aggregates — proving the
  * source/sink actually moves bytes, not just that the writer ran. The
  * DuckDB oracle computes the same aggregate straight from the parquet
  * table, so any loss or corruption in the round-trip breaks the hash.
  *
  * Values that cross a TEXT format (JSON/CSV) are quantized to integer
  * cents BEFORE writing — double→text→double round-trips are exact in both
  * engines for integers, while raw double formatting is a cross-engine
  * hazard the repo avoids everywhere (the momentStats rule).
  */
object Formats {

  /** Deterministic round-trip payload: integer-quantized, ordered. */
  private def payload(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_c"),
        Tables.tsNanosToMicros("ts").as("ts_us"))

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("value_c").as("sum_value_c"),
        min("ts_us").as("min_ts_us"),
        max("event_id").as("max_event_id"))
      .orderBy("event_type")

  private val aggregateSql =
    """SELECT event_type, count(*)::BIGINT AS n,
      |       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_value_c,
      |       min(epoch_us(ts))::BIGINT AS min_ts_us,
      |       max(event_id)::BIGINT AS max_event_id
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  private def roundTrip(spark: SparkSession, dir: String, format: String,
      writeOpts: Map[String, String] = Map.empty): DataFrame = {
    val out = graft.TempDirs.scoped(s"fmt-$format") + "/data"
    val src = payload(spark, dir)
    src.write.options(writeOpts).format(format).mode("overwrite").save(out)
    // explicit schema on read: text formats must not re-infer types
    aggregate(spark.read.schema(src.schema).format(format)
      .options(writeOpts).load(out))
  }

  /** ORC round-trip (Spark-native columnar sibling of parquet). */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "orc")

  /** JSON-lines round-trip (the interchange format every ingestion pipeline
    * meets; gzip-compressed like real data drops).
    */
  def jsonlRoundTrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "json", Map("compression" -> "gzip"))

  /** Gzip CSV round-trip with header (reference's wire format family —
    * NYCTaxiRideSource reads gzip CSV; this proves the generic compressed
    * CSV source/sink path on arbitrary tables).
    */
  def csvGzipRoundTrip(spark: SparkSession, dir: String): DataFrame =
    roundTrip(spark, dir, "csv",
      Map("compression" -> "gzip", "header" -> "true"))

  /** Hive-partitioned parquet layout + partition-pruned read: write events
    * partitioned by event_type, read back ONE partition through a
    * partition-column filter (PartitionFilters at the scan — the layout
    * trick that turns a 100 TB table scan into a directory listing), and
    * aggregate the surviving slice. The oracle aggregates the same slice
    * from the raw table, so a broken pruning path (missing rows) or a
    * broken layout (extra rows) both break the hash.
    */
  def partitionedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.TempDirs.scoped("fmt-partitioned") + "/data"
    payload(spark, dir).write.mode("overwrite")
      .partitionBy("event_type").parquet(out)
    aggregate(spark.read.parquet(out).where("event_type = 'click'"))
  }

  // single source of truth: the shared aggregate SQL with the partition
  // predicate inserted (keeps Spark and oracle sides from drifting)
  val partitionedRoundTripSql: String = aggregateSql.replace(
    "FROM events GROUP BY 1", "FROM events WHERE event_type = 'click' GROUP BY 1")

  /** DYNAMIC partition pruning — the star-join sibling of
    * [[partitionedRoundTrip]]'s static pruning: the fact table is written
    * hive-partitioned by day, and the filter that prunes its scan is NOT a
    * literal but the runtime key set of a broadcast-joined dimension (the
    * even days). Catalyst plants a `dynamicpruningexpression` in the fact
    * scan's PartitionFilters, so only the dimension's surviving days are
    * ever read — at 100 TB this is the difference between scanning a year
    * and scanning the week the dimension selects, with no literal in the
    * query to push statically. `DppSpec` pins the plan shape (the scan
    * must carry the dynamic filter); the oracle recomputes the aggregate
    * with the same even-day predicate, so missing or extra partitions
    * break the hash.
    */
  private[ops] def dppJoined(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.TempDirs.scoped("fmt-dpp") + "/data"
    payload(spark, dir)
      .withColumn("day", expr("ts_us div 86400000000L"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    // the dim's day set is only known at runtime (distinct over the raw
    // table), typed to match the inferred INT partition column so the
    // join key needs no cast on the partition side
    val dim = Tables.load(spark, dir, "events")
      .selectExpr(s"CAST(${Tables.tsNanosToDaysSql("ts")} AS INT) AS day")
      .distinct()
      .where("pmod(day, 2) = 0")
    spark.read.parquet(out).join(broadcast(dim), "day")
  }

  def dppJoin(spark: SparkSession, dir: String): DataFrame =
    aggregate(dppJoined(spark, dir))

  val dppJoinSql: String = aggregateSql.replace(
    "FROM events GROUP BY 1",
    "FROM events WHERE (epoch_ns(ts) // 86400000000000) % 2 = 0 GROUP BY 1")

  // ------------------------------------------------------------- z-order

  /** Z-order (Morton-curve) data layout — the multi-dimensional clustering
    * every lakehouse `OPTIMIZE ZORDER BY` runs so that range predicates on
    * EITHER clustered dimension prune files: each (l_partkey, l_suppkey)
    * pair is min/max-normalized onto a 16-bit grid and its bits
    * interleaved into one 32-bit Morton key; range-bucketing rows by that
    * key then bounds BOTH dimensions inside every bucket simultaneously
    * (the top 5 bucket bits fix 3 high partkey bits AND 2 high suppkey
    * bits — span ≤ range/8 and range/4 respectively), which a linear sort
    * can only do for its leading column. The ENTRY output is the layout
    * quality itself: per-bucket row counts and min/max spans of both
    * dimensions — hash-checked, so the interleaving arithmetic and the
    * locality claim are both under the oracle. Pure integer div/mod
    * arithmetic (no shift builtins), identical text in both engines.
    */
  val ZGrid = 65536L
  val ZBucketShift: Long = 1L << 27 // 2^32 z-space / 32 buckets

  private def zExpr(div: String): String =
    (0 until 16).map { i =>
      s"((pa $div ${1L << i}) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((pb $div ${1L << i}) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
    val bounds = li.agg(
      min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
      min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
    li.crossJoin(broadcast(bounds))
      .selectExpr("l_partkey", "l_suppkey",
        s"((l_partkey - pmin) * $ZGrid) div (pmax - pmin + 1) AS pa",
        s"((l_suppkey - smin) * $ZGrid) div (smax - smin + 1) AS pb")
      .selectExpr("l_partkey", "l_suppkey", s"(${zExpr("div")}) AS z")
      .selectExpr("l_partkey", "l_suppkey", s"z div $ZBucketShift AS zb")
      .groupBy("zb")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("p_lo"), max("l_partkey").as("p_hi"),
        min("l_suppkey").as("s_lo"), max("l_suppkey").as("s_hi"))
      .orderBy("zb")
  }

  val zorderLayoutSql: String =
    s"""WITH b AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |                  min(l_suppkey) AS smin, max(l_suppkey) AS smax
       |           FROM lineitem),
       |g AS (SELECT l_partkey, l_suppkey,
       |             ((l_partkey - pmin) * $ZGrid) // (pmax - pmin + 1) AS pa,
       |             ((l_suppkey - smin) * $ZGrid) // (smax - smin + 1) AS pb
       |      FROM lineitem CROSS JOIN b),
       |z AS (SELECT l_partkey, l_suppkey,
       |             (${zExpr("//")}) // $ZBucketShift AS zb
       |      FROM g)
       |SELECT zb, count(*)::BIGINT AS n_rows,
       |       min(l_partkey) AS p_lo, max(l_partkey) AS p_hi,
       |       min(l_suppkey) AS s_lo, max(l_suppkey) AS s_hi
       |FROM z GROUP BY zb ORDER BY zb""".stripMargin

  /** Zone-map layout geometry: equi-width ship-date buckets, one file per
    * non-empty bucket.
    */
  val ZmBuckets = 8L

  /** Build the sort-clustered layout once per (session, corpus): lineitem
    * re-clustered into [[ZmBuckets]] equi-width ship-date buckets (one
    * task — hence one file — per bucket), then ONE read-back pass derives
    * the per-file (min, max) zone map via `input_file_name()`. Returns
    * (all files with their zones, the probe's literal day range).
    */
  private[graft] def zonemapLayout(spark: SparkSession, dir: String)
      : (Seq[(String, Long, Long)], Long, Long) = {
    val out = graft.TempDirs.scoped("zonemap") + "/lineitem"
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr(
        "CAST(datediff(CAST(l_shipdate AS DATE), CAST('1970-01-01' AS DATE)) AS BIGINT) AS d",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
    val b = li.agg(min("d"), max("d")).head()
    val (dmin, dmax) = (b.getLong(0), b.getLong(1))
    val w = dmax - dmin + 1
    // exactly ONE file per non-empty bucket in ONE corpus pass: the
    // partitionBy writer splits a task's rows per partition VALUE (a hash
    // repartition on zb alone can co-locate two buckets in one task = one
    // wide-zone file), then the staged files move into the flat layout
    val staging = graft.TempDirs.scoped("zonemap-stage")
    li.selectExpr("d", "cents",
        s"((d - $dmin) * $ZmBuckets) div $w AS zb")
      .repartition(col("zb")).sortWithinPartitions("zb", "d")
      .write.mode("overwrite").partitionBy("zb").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(out))
    fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("zb="))
      .foreach { dDir =>
        val zb = dDir.getPath.getName.stripPrefix("zb=")
        fs.listStatus(dDir.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            if (!fs.rename(f.getPath, new org.apache.hadoop.fs.Path(
                out, s"zb$zb-${f.getPath.getName}")))
              throw new java.io.IOException(s"failed to place ${f.getPath}")
          }
      }
    val zones = spark.read.parquet(out)
      .select(expr("input_file_name()").as("f"), col("d"))
      .groupBy("f").agg(min("d").as("lo"), max("d").as("hi"))
      .collect() // ≤ ZmBuckets rows: the zone map is metadata by design
      .map(r => (r.getString(0), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1).toSeq
    // probe range: the middle quarter of the day span (buckets ~2..3)
    (zones, dmin + (w * 2) / ZmBuckets, dmin + (w * 4) / ZmBuckets - 1)
  }

  /** Zone-map file skipping over a SORT-CLUSTERED flat layout — the
    * lakehouse pruning primitive the partition-dir entries
    * ([[partitionedRoundTrip]], [[dppJoin]]) don't cover: no hive dirs,
    * just data files whose per-file (min, max) of the cluster key is
    * recorded in a metadata zone map (what parquet footers / Delta
    * file stats hold); a range query consults the zone map FIRST and
    * opens only overlapping files. The emitted surface hash-gates both
    * halves: the aggregate over the range (correctness — computed from
    * ONLY the pruned files) and `files_read`/`files_total` (the skipping
    * itself — the oracle re-derives the expected overlap count from the
    * same equi-width arithmetic, so a mispruned or over-read layout
    * changes the row). The spec additionally pins the probe plan's
    * `inputFiles` to exactly the pruned set — proving skipped IO, not
    * just matching arithmetic.
    */
  def zonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    val (zones, plo, phi) = zonemapLayout(spark, dir)
    val pruned = zones.filter { case (_, lo, hi) => hi >= plo && lo <= phi }
    require(pruned.nonEmpty, "zone-map probe range matched no file")
    spark.read.parquet(pruned.map(_._1): _*)
      .where(s"d BETWEEN $plo AND $phi")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
      .selectExpr("n_rows", "sum_cents",
        s"CAST(${pruned.size} AS BIGINT) AS files_read",
        s"CAST(${zones.size} AS BIGINT) AS files_total")
  }

  val zonemapPruneSql: String =
    s"""WITH src AS (
       |  SELECT date_diff('day', DATE '1970-01-01', l_shipdate::DATE)::BIGINT AS d,
       |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem),
       |b AS (SELECT min(d) AS dmin, max(d) AS dmax,
       |             max(d) - min(d) + 1 AS w FROM src),
       |z AS (SELECT d, cents, ((d - dmin) * $ZmBuckets) // w AS zb
       |      FROM src CROSS JOIN b),
       |pr AS (SELECT dmin + (w * 2) // $ZmBuckets AS plo,
       |              dmin + (w * 4) // $ZmBuckets - 1 AS phi FROM b),
       |zones AS (SELECT zb, min(d) AS lo, max(d) AS hi FROM z GROUP BY 1)
       |SELECT
       |  (SELECT count(*) FROM z, pr WHERE d BETWEEN plo AND phi)::BIGINT AS n_rows,
       |  (SELECT sum(cents) FROM z, pr WHERE d BETWEEN plo AND phi)::BIGINT AS sum_cents,
       |  (SELECT count(*) FROM zones, pr WHERE hi >= plo AND lo <= phi)::BIGINT AS files_read,
       |  (SELECT count(*) FROM zones)::BIGINT AS files_total""".stripMargin

  /** Schema evolution across file generations — the operational reality of
    * any long-lived 100 TB table: generation 1 is written WITHOUT the
    * `quality` column (docs ranked ≤ half per source — the structural wave
    * of the compaction/snapshot family), generation 2 adds it; one
    * `mergeSchema` read reconciles both (parquet's per-file schema union —
    * old files surface the new column as NULL, no rewrite/backfill of
    * historical data). The emitted surface proves BOTH halves: per-source
    * totals over the unioned read, the NULL accounting (`n_legacy` = rows
    * whose file predates the column), and the backfill-expression result
    * (`sum_q` over `coalesce(quality, 0)`) — a reader that dropped legacy
    * rows, mis-unified the schema, or defaulted wrongly breaks the hash.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.TempDirs.scoped("schema-evo") + "/docs"
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("srk", expr(
        "row_number() OVER (PARTITION BY source ORDER BY doc_id)"))
      .withColumn("nsrc", expr("count(*) OVER (PARTITION BY source)"))
    docs.where("srk * 2 <= nsrc")
      .select("doc_id", "source") // generation 1: no quality column
      .write.mode("append").parquet(out)
    docs.where("srk * 2 > nsrc")
      .selectExpr("doc_id", "source", "n_chars AS quality") // generation 2
      .write.mode("append").parquet(out)
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN quality IS NULL THEN 1 ELSE 0 END")).as("n_legacy"),
        sum(expr("coalesce(quality, CAST(0 AS BIGINT))")).as("sum_q"))
      .orderBy("source")
  }

  val schemaEvolutionSql: String =
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS srk,
      |         count(*) OVER (PARTITION BY source) AS nsrc
      |  FROM documents)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |       sum(CASE WHEN srk * 2 <= nsrc THEN 1 ELSE 0 END)::BIGINT AS n_legacy,
      |       sum(CASE WHEN srk * 2 > nsrc THEN n_chars ELSE 0 END)::BIGINT AS sum_q
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------- bloom skip

  /** Bloom parameters, shared literally by the Spark build, the driver-side
    * probe mirror, and the DuckDB oracle. Two affine FpMod hashes (the
    * [[graft.pipeline.Dedup.As]] family); per-file WORD count scales with
    * the file's row count — L = ⌈n/2⌉ words of 63 USABLE bits (bit 63 stays clear: DuckDB refuses `1 << 63` with an overflow error — the mm_phash BIGINT-weight lesson applied to filters) ≈ 31 bits/key, so the
    * filter never saturates as the corpus grows (a fixed-size bloom goes
    * all-ones at 10× and admits everything — the CmsW vacuity lesson
    * applied to filters). doc_id stays well inside BIGINT for these
    * multipliers at test scale; a production build would swap in xxhash64
    * and lose only the cross-engine replay, not the layout.
    */
  val BloomA1 = 2654435761L
  val BloomB1 = 97L
  val BloomA2 = 1099511628211L
  val BloomB2 = 31L
  val BloomMod = 1000000007L

  /** Per-file BLOOM skip index over a key UNCORRELATED with the layout —
    * the lakehouse point-lookup primitive [[zonemapPrune]] cannot cover:
    * zone maps only skip on the CLUSTER key; for any other column the
    * (min, max) spans everything and every file reads. Here documents lie
    * in one file per `source` (the layout a real corpus has), the lookup
    * batch is a set of doc_ids, and a per-file bloom sidecar (built in one
    * read-back pass, [[zonemapLayout]]-style) admits only files that might
    * hold a probe. The sidecar is rows-proportional (L = ⌈n_file/2⌉ words
    * per file ≈ 31 bits/key), so it lives as a PERSISTED parquet table and
    * admission is computed executor-side (probe hashes join the sidecar on
    * (file, lane)); the driver only ever holds the per-file geometry and
    * the admitted file list — both files-proportional. Bloom admission
    * is a SUPERSET (false positives possible, never negatives), so the
    * fetched rows are exact by construction and the surface hash-gates
    * both halves: the fetched aggregate AND files_read — the oracle
    * rebuilds the identical integer blooms in SQL and re-derives the
    * admitted-file count, so a mis-set bit, wrong lane arithmetic, or
    * saturated filter changes the row.
    */
  def bloomskipPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.TempDirs.scoped("bloomskip") + "/documents"
    val staging = graft.TempDirs.scoped("bloomskip-stage")
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    // one file per source: repartition(source) routes each value to one
    // task, partitionBy splits per value (the compaction-entry guarantee)
    docs.repartition(col("source")).sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite").partitionBy("source").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(out))
    fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("source="))
      .foreach { sDir =>
        val src = sDir.getPath.getName.stripPrefix("source=")
        fs.listStatus(sDir.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            if (!fs.rename(f.getPath, new org.apache.hadoop.fs.Path(
                out, s"$src-${f.getPath.getName}")))
              throw new java.io.IOException(s"failed to place ${f.getPath}")
          }
      }
    // sidecar build: per-file row count fixes L, then each key sets one
    // bit per hash; bit_or folds map-side. The (file, lane, word) sidecar
    // is rows-proportional (≈ rows/2 words total), so it is PERSISTED as a
    // parquet table next to the data — never collected: at 10^10 rows the
    // sidecar is tens of GB, which is fine on disk and fatal on the driver.
    val filed = spark.read.parquet(out)
      .select(expr("input_file_name()").as("f"), col("doc_id"))
    val sized = filed.groupBy("f").agg(count(lit(1)).as("n"))
      .selectExpr("f", "CAST((n + 1) div 2 AS BIGINT) AS L")
    val sidecarPath = graft.TempDirs.scoped("bloomskip") + "/documents_bloom"
    filed.join(broadcast(sized), "f")
      .selectExpr("f", "L", s"explode(array(" +
        s"($BloomA1 * doc_id + $BloomB1) % $BloomMod, " +
        s"($BloomA2 * doc_id + $BloomB2) % $BloomMod)) AS h")
      .selectExpr("f", "L",
        "CAST((h % (63 * L)) div 63 AS INT) AS lane",
        "CAST((h % (63 * L)) % 63 AS INT) AS bit")
      .groupBy("f", "L", "lane")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("word"))
      .write.mode("overwrite").parquet(sidecarPath)
    // the per-file geometry (one row per FILE) is the only build metadata
    // the driver holds — files-proportional, like zonemapLayout's zones
    val files = sized.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    // executor-side admission: probe hashes join the persisted sidecar on
    // (file, lane) — one lane lookup per hash; a file is admitted iff BOTH
    // bits of SOME probe are set. Only the ADMITTED FILE LIST (and the
    // probe count) come back to the driver — files-proportional, exactly
    // the zonemapPrune shape. A lane with no set bits has no sidecar row,
    // so the inner join IS the missing-word = 0 semantics.
    val sidecar = spark.read.parquet(sidecarPath)
    val probes = docs.where("doc_id % 500 = 7").select("doc_id")
    val nProbes = probes.count()
    val geometry = broadcast(sized)
    val probeLanes = probes.crossJoin(geometry)
      .selectExpr("f", "L", "doc_id",
        s"($BloomA1 * doc_id + $BloomB1) % $BloomMod AS h1",
        s"($BloomA2 * doc_id + $BloomB2) % $BloomMod AS h2")
      .selectExpr("f", "doc_id",
        "CAST((h1 % (63 * L)) div 63 AS INT) AS l1",
        "CAST((h1 % (63 * L)) % 63 AS INT) AS b1",
        "CAST((h2 % (63 * L)) div 63 AS INT) AS l2",
        "CAST((h2 % (63 * L)) % 63 AS INT) AS b2")
    val admitted = probeLanes.as("p")
      .join(sidecar.as("w1"),
        expr("w1.f = p.f AND w1.lane = p.l1 AND " +
          "(w1.word & shiftleft(CAST(1 AS BIGINT), p.b1)) <> 0"))
      .join(sidecar.as("w2"),
        expr("w2.f = p.f AND w2.lane = p.l2 AND " +
          "(w2.word & shiftleft(CAST(1 AS BIGINT), p.b2)) <> 0"))
      .select(col("p.f")).distinct()
      .collect().map(_.getString(0)).sorted // admitted FILES only
    require(admitted.nonEmpty, "bloom probe batch admitted no file")
    spark.read.parquet(admitted.toIndexedSeq: _*)
      .where(s"doc_id % 500 = 7")
      .agg(count(lit(1)).as("n_hits"), sum("n_chars").as("sum_chars"))
      .selectExpr(
        s"CAST($nProbes AS BIGINT) AS n_probes", "n_hits",
        "sum_chars",
        s"CAST(${admitted.length} AS BIGINT) AS files_read",
        s"CAST(${files.size} AS BIGINT) AS files_total")
  }

  /** The identical integer blooms rebuilt in SQL: per-source word counts,
    * bit_or lanes, probe admission via two lane joins (a lane with no set
    * bits has no row — exactly the missing-word = 0 driver mirror).
    */
  val bloomskipPruneSql: String =
    s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
       |c AS (SELECT source, (count(*) + 1) // 2 AS L FROM d GROUP BY 1),
       |hh AS (SELECT d.source, c.L, u.h
       |       FROM d JOIN c USING (source), LATERAL (
       |         SELECT ($BloomA1 * d.doc_id + $BloomB1) % $BloomMod AS h
       |         UNION ALL
       |         SELECT ($BloomA2 * d.doc_id + $BloomB2) % $BloomMod) u),
       |lanes AS (SELECT source, L, (h % (63 * L)) // 63 AS lane,
       |                 bit_or(1::BIGINT << ((h % (63 * L)) % 63)::INT) AS word
       |          FROM hh GROUP BY 1, 2, 3),
       |p AS (SELECT doc_id AS pid, n_chars FROM d WHERE doc_id % 500 = 7),
       |pbj AS (SELECT pid, source, L,
       |               (h1 % (63 * L)) // 63 AS l1, (h1 % (63 * L)) % 63 AS b1,
       |               (h2 % (63 * L)) // 63 AS l2, (h2 % (63 * L)) % 63 AS b2
       |        FROM (SELECT pid, source, L,
       |                ($BloomA1 * pid + $BloomB1) % $BloomMod AS h1,
       |                ($BloomA2 * pid + $BloomB2) % $BloomMod AS h2
       |              FROM p CROSS JOIN c)),
       |admit AS (SELECT DISTINCT pb.source
       |          FROM pbj pb
       |          JOIN lanes w1 ON w1.source = pb.source AND w1.lane = pb.l1
       |          JOIN lanes w2 ON w2.source = pb.source AND w2.lane = pb.l2
       |          WHERE (w1.word & (1::BIGINT << pb.b1::INT)) <> 0
       |            AND (w2.word & (1::BIGINT << pb.b2::INT)) <> 0)
       |SELECT (SELECT count(*) FROM p)::BIGINT AS n_probes,
       |       (SELECT count(*) FROM p)::BIGINT AS n_hits,
       |       (SELECT sum(n_chars) FROM p)::BIGINT AS sum_chars,
       |       (SELECT count(*) FROM admit)::BIGINT AS files_read,
       |       (SELECT count(*) FROM c)::BIGINT AS files_total""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_schema_evolution" -> schemaEvolution,
    "x_zonemap_prune" -> zonemapPrune,
    "x_bloomskip_prune" -> bloomskipPrune,
    "x_orc_roundtrip" -> orcRoundTrip,
    "x_jsonl_roundtrip" -> jsonlRoundTrip,
    "x_csv_gzip_roundtrip" -> csvGzipRoundTrip,
    "x_partitioned_roundtrip" -> partitionedRoundTrip,
    "x_dpp_join" -> dppJoin,
    "x_zorder_layout" -> zorderLayout)

  val oracles: Map[String, String] = Map(
    "x_schema_evolution" -> schemaEvolutionSql,
    "x_zonemap_prune" -> zonemapPruneSql,
    "x_bloomskip_prune" -> bloomskipPruneSql,
    "x_orc_roundtrip" -> aggregateSql,
    "x_jsonl_roundtrip" -> aggregateSql,
    "x_csv_gzip_roundtrip" -> aggregateSql,
    "x_partitioned_roundtrip" -> partitionedRoundTripSql,
    "x_dpp_join" -> dppJoinSql,
    "x_zorder_layout" -> zorderLayoutSql)
}
