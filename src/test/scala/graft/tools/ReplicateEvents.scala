package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write a k×-replicated events table (user and event ids shifted per
  * replica, so users — and therefore sessions, funnels, cohorts and
  * rolling-active populations — pair only within their replica and all
  * per-user structure scales linearly in k) — the event-analytics
  * analogue of [[ReplicateDocs]], used to adjudicate whether a paired
  * ratio at sf0.1 is plan shape or per-stage fixed cost. Timestamps are
  * left untouched: the day spine stays fixed while the user population
  * grows, the production shape of a product gaining users.
  *
  * Usage: Test/runMain graft.tools.ReplicateEvents <k> <outDir>
  */
object ReplicateEvents {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val outDir = args(1)
    require(k >= 1 && k <= 16, s"k in 1..16: $k")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val step = 10000000L
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val rep = (0 until k).map { r =>
      ev.withColumn("user_id", col("user_id") + lit(r * step))
        .withColumn("event_id", col("event_id") + lit(r * step))
    }.reduce(_ unionByName _)
    rep.coalesce(4).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"wrote ${rep.count()} events to $outDir/events.parquet")
    spark.stop()
  }
}
