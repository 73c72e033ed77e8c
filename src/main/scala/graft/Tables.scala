package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    * Keyed by `sessionUUID` — a plain string that does NOT reference the
    * session (a WeakHashMap keyed by the session would never collect:
    * each cached DataFrame strongly references its session, the exact
    * value→key cycle the WeakHashMap javadoc warns about). Classic-mode
    * sessions cannot outlive their SparkContext, so an application-end
    * listener clears the cache when the context stops; within an
    * application's lifetime entries persist like a catalog's would, and
    * [[invalidate]] drops them early. The cached file listing assumes
    * these dataset dirs are IMMUTABLE (true for the generated testdata);
    * call [[invalidate]] after rewriting a directory in-process. */
  private val relationCache =
    scala.collection.concurrent.TrieMap
      .empty[String, scala.collection.concurrent.TrieMap[String, DataFrame]]
  private val hookedApps = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Session identity as a plain string: a UUID stamped into the session's
    * runtime conf on first use. `newSession()` starts from fresh session
    * state, so sibling sessions get distinct tokens. */
  private def sessionToken(spark: SparkSession): String = synchronized {
    spark.conf.getOption("graft.session.token").getOrElse {
      val t = java.util.UUID.randomUUID().toString
      spark.conf.set("graft.session.token", t)
      t
    }
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val sc = spark.sparkContext
    if (hookedApps.putIfAbsent(sc.applicationId, ()).isEmpty)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          relationCache.clear(); hookedApps.clear()
        }
      })
    relationCache
      .getOrElseUpdate(sessionToken(spark),
        scala.collection.concurrent.TrieMap.empty[String, DataFrame])
      .getOrElseUpdate(s"$sfDir/$table.parquet",
        spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  /** Drop cached relations for a session (all of them, or one path). */
  def invalidate(spark: SparkSession, path: Option[String] = None): Unit = {
    val token = sessionToken(spark)
    path match {
      case Some(p) => relationCache.get(token).foreach(_.remove(p))
      case None    => relationCache.remove(token)
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Normalize `events.ts` to a real TIMESTAMP regardless of the parquet
    * flavor the generator happened to write — the engine owns its logical
    * schema; it must not assume the writer's physical encoding.
    *
    * Flavors seen from the driver's generator so far:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/
    *    TestSpark) it arrives as a nano-epoch long → convert via
    *    `timestamp_micros(ts div 1000)` (truncation lossless here, the
    *    data is micro-precision).
    *  - Timestamp(isAdjustedToUTC=false, MICROS): Spark 4 reads it as
    *    TIMESTAMP_NTZ; all entry points pin the session to UTC, so a cast
    *    to TIMESTAMP maps wall-clock to the identical instant — exact. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
