package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst can push filters
  * and prune columns into the scan — callers should `select`/`filter` on
  * the returned DataFrame rather than materialize it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One resolved relation per (session, path): `spark.read.parquet` lists
    * files and reads footers for schema inference on EVERY call, which a
    * deployment does once at catalog registration, not once per query.
    * Caching the DataFrame (its logical relation — never materialized data)
    * removes that repeated driver-side I/O; filters/column pruning still
    * plan per query against the shared relation.
    *
    * Weakly keyed by session: a stopped session's relations (and the
    * session itself) become collectable instead of pinning driver memory
    * for the JVM lifetime. The cached file listing assumes these dataset
    * dirs are IMMUTABLE (true for the generated testdata); call
    * [[invalidate]] after rewriting a directory in-process. */
  private val relationCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val perSession = relationCache.synchronized {
      var m = relationCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        relationCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(s"$sfDir/$table.parquet",
      spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  /** Drop cached relations for a session (all of them, or one path). */
  def invalidate(spark: SparkSession, path: Option[String] = None): Unit =
    relationCache.synchronized {
      path match {
        case Some(p) => Option(relationCache.get(spark)).foreach(_.remove(p))
        case None    => relationCache.remove(spark)
      }
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true` the
    * column arrives as a nano-epoch long; convert (truncating to micros,
    * lossless for this micro-precision data) back to a real timestamp so
    * downstream operators see the declared schema. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
