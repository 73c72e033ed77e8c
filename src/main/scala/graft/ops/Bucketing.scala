package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout — the co-located-join tool for
  * recurring joins at 100 TB. A fact table joined to the same key every day
  * should not shuffle every day: write both sides bucketed (+ sorted) on
  * the join key and every subsequent sort-merge join reads matching buckets
  * directly — zero Exchange, zero Sort in the plan (PlanSpec pins this).
  *
  * Bucket count is a LAYOUT decision: pick `buckets` so one bucket of the
  * big side ≈ one task's worth of data (e.g. ~128–512 MB); both tables must
  * use the same count for bucket-wise joins. Spark's native (non-Hive)
  * bucketing is used — no external metastore dependency.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table named `table`.
    * `overwrite` replaces an existing layout; with it false, an existing
    * table of that name is an error rather than silently clobbered. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    overwrite: Boolean = true): Unit =
    df.write.mode(if (overwrite) "overwrite" else "errorifexists")
      .format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key. The plan
    * must contain no Exchange on either side — that is the point. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
