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

  /** Hive-style partitioned layout (`path/col=value/part-*.parquet`) — the
    * scan-time pruning dual of [[writeBucketed]]: bucketing co-locates JOIN
    * keys, directory partitioning prunes SCANS. A filter on the partition
    * column never opens non-matching directories (static pruning), and a
    * join whose OTHER side filters selectively prunes at RUNTIME via
    * dynamic partition pruning — Catalyst injects a
    * `DynamicPruningExpression` into the fact scan's PartitionFilters,
    * reusing the dim side's broadcast result as the IN-list (PlanSpec pins
    * both the expression and the pruned partition count). At 100 TB this
    * is the difference between scanning 84 months and scanning 12.
    *
    * `coalesceToOnePerPartition` repartitions by the partition column
    * first so each directory holds one file per distinct value instead of
    * one per input task — the small-files discipline a daily-partitioned
    * fact table needs (a 1000-task write would otherwise cut every
    * partition into 1000 shards).
    *
    * HOT-PARTITION guard: one-file-per-value means one TASK per value —
    * a skewed partition value (today's date in an event table) would
    * serialize its entire write through a single task. `filesPerPartition
    * > 1` salts the repartition key (deterministic row hash mod N) so a
    * hot value's write spreads over up to N parallel tasks/files while
    * cold values still coalesce (their rows mostly share a salt bucket by
    * luck of the hash — worst case N small files, bounded). Orthogonally,
    * `maxRecordsPerFile > 0` caps rows per physical file (Spark's native
    * option), splitting an oversized task-file without extra parallelism.
    * Both default off — the demo-layout behavior is unchanged. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       coalesceToOnePerPartition: Boolean = true,
                       filesPerPartition: Int = 1,
                       maxRecordsPerFile: Long = 0L): Unit = {
    require(filesPerPartition >= 1,
      s"filesPerPartition must be ≥ 1: $filesPerPartition")
    require(maxRecordsPerFile >= 0L,
      s"maxRecordsPerFile must be ≥ 0: $maxRecordsPerFile")
    import org.apache.spark.sql.functions._
    val out =
      if (!coalesceToOnePerPartition) df
      else if (filesPerPartition == 1) df.repartition(col(partitionCol))
      else df.repartition(col(partitionCol),
        pmod(xxhash64(df.columns.map(col): _*), lit(filesPerPartition)))
    val writer = out.write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .partitionBy(partitionCol).parquet(path)
  }

  /** Z-ORDER layout: cluster rows by the Morton interleave of two bucketed
    * key columns (the Delta/Iceberg OPTIMIZE ZORDER recipe as a plain
    * deterministic transform — `z_value` codegen expression + range
    * repartition + in-partition sort). Rows near each other in EITHER
    * dimension land in the same output files, so per-file min/max
    * statistics prune scans filtered on either key — a single-column sort
    * gives perfect pruning on one key and none on the other.
    *
    * `xBucket`/`yBucket` must be non-negative 32-bit grid coordinates
    * (bucket real keys first: ids modulo a grid, timestamps to coarse
    * units — interleaving is only meaningful over bounded grids). The
    * range repartition samples z-values, so output files tile the
    * z-curve evenly regardless of key skew. */
  def zorderBy(df: DataFrame, xBucket: org.apache.spark.sql.Column,
               yBucket: org.apache.spark.sql.Column,
               partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be ≥ 1: $partitions")
    val z = graft.functions.GraftFunctions.z_value(xBucket, yBucket)
    df.withColumn("_z", z)
      .repartitionByRange(partitions, org.apache.spark.sql.functions.col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
