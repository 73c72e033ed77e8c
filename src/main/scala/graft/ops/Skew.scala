package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hot join key (one user with 10^9 events, one null-ish default id) sends
  * its entire partition to a single reducer — the canonical 100 TB straggler
  * /OOM. AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here) splits oversized partitions at runtime and is the
  * first line of defense; explicit salting is the deterministic fallback
  * when AQE can't help (e.g. a skewed aggregation key, or join types AQE
  * won't split).
  */
object Skew {

  /** Salted inner equi-join of a skewed `big` side against a `small` side.
    *
    * Each big-side row gets one of `salt` deterministic pseudo-random salt
    * values (hash of the whole row, not a counter — stable under
    * repartitioning); the small side is replicated `salt` times so every
    * (key, salt) bucket can match. The hot key's rows now spread over
    * `salt` reducers. Cost: small side shuffles `salt`×, so pick
    * salt ≈ (hot-key rows / target partition rows), not hundreds.
    */
  /** The salt is a per-row ordinal round-robin
    * (`monotonically_increasing_id` = partition id ⧺ position, mod salt):
    * unique per row, so BYTE-IDENTICAL rows — the degenerate hot key, one
    * default record repeated millions of times — spread too, and perfectly
    * evenly (a content hash both fails on identical rows and costs a
    * per-row hash of every column for no added guarantee). The ordinal is
    * deterministic for a given partitioning (a retried task re-reads its
    * partition in the same order, so attempts agree); across different
    * partitionings only the salt ASSIGNMENT changes, never join results,
    * since the small side matches every salt value. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted two-phase count: partial counts per (key, salt), then a final
    * sum per key — breaks a hot groupBy key across `salt` reducers. The
    * same shape generalizes to any algebraic aggregate (sum/min/max/avg as
    * sum+count); count is provided because it is the one that shows up in
    * every skewed-corpus audit. */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
  }
}
