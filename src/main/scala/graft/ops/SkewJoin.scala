package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skew-resistant joins — the manual fallback when AQE's skew
  * handling can't apply (e.g. the skewed side feeds a stateful op, or the
  * optimizer can't split one pathological key).
  *
  * The hot key's rows spread across `nSalts` sub-partitions: the large side
  * gets a deterministic per-row salt, the small side is replicated once per
  * salt value, and the join keys on (key, salt). Partition sizes shrink
  * ~nSalts× for the skewed key at the cost of replicating the small side
  * nSalts× — the standard trade at 100 TB when one customer/doc dominates.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, salted `nSalts` ways.
    * Deterministic (hash-of-row salt, no rand()) so replays are stable.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
