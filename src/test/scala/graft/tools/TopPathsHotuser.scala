package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 verdict item 2 — adjudicate the one ScaleCheck entry sitting on
  * the 2.0 bound (`top_paths_hotuser`: settled 1.99, standalone re-run
  * 2.31, full-sweep 0.85): the r8 event-analytics protocol. Build the
  * k×-replicated events table WITH the planted hot user (one bot whose
  * single gap-free "session" holds 20000·k events — the adversarial
  * shape: its window work concentrates on ONE task), write it to /tmp,
  * time Spark's Funnel.topPaths min-of-3 in ONE warm JVM at k = 1, 4, 8,
  * and print the timings as JSON; the DuckDB restatement (the q_top_paths
  * oracle SQL) is then timed on the SAME parquet by the driver-side
  * python, and the fixed/marginal fit closes the adjudication in
  * BENCH_LOCAL_r19.json.
  *
  * Why the hot user cannot be salted: gap sessionization is a prefix
  * scan over the user's ordered timeline — a salt boundary would split a
  * session whose gap never fires, changing the result. The per-user
  * window cost is therefore inherently O(m log m) on one task for an
  * m-event user; `maxEvents` bounds the OUTPUT (prefix path) but the
  * sort must still see every row. The adjudication decides whether that
  * term's constant is a plan defect or the honest cost both engines pay.
  *
  * Usage: Test/runMain graft.tools.TopPathsHotuser [outDirBase]
  */
object TopPathsHotuser {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/tmp/events_hot"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val step = 10000000L
    val ev0 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select("user_id", "ts", "event_id", "event_type", "value")
    def hot(k: Int): DataFrame = {
      val n = 20000 * k
      val bot = spark.range(n).select(
        lit(888888888L).as("user_id"),
        expr("timestamp_micros(cast(1704067200000000 + id * 1000000 as long))").as("ts"),
        (col("id") + 500000000L).as("event_id"),
        when(col("id") < n - 2, "view")
          .when(col("id") === n - 2, "click").otherwise("purchase").as("event_type"),
        lit(1.0).as("value"))
      (0 until k).map { r =>
        ev0.withColumn("user_id", col("user_id") + lit(r * step))
          .withColumn("event_id", col("event_id") + lit(r * step))
      }.reduce(_ unionByName _).unionByName(bot)
    }
    val ks = Seq(1, 4, 8)
    val paths = ks.map { k =>
      val p = s"$base${k}x/events.parquet"
      hot(k).coalesce(8).write.mode("overwrite").parquet(p)
      k -> p
    }
    // warm the JVM/codegen on a shape not being measured
    graft.ops.Funnel.topPaths(
      spark.read.parquet(paths.head._2).limit(1000),
      "user_id", "ts", "event_id", "event_type", 1800000000L, 15)
      .write.format("noop").mode("overwrite").save()
    val times = paths.map { case (k, p) =>
      val ev = spark.read.parquet(p)
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.ops.Funnel.topPaths(ev, "user_id", "ts", "event_id",
          "event_type", gapMicros = 1800000000L, n = 15)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = Seq(once(), once(), once()).min
      k -> s
    }
    val rows = times.map { case (k, s) =>
      f"""{"k":$k,"spark_min3_s":$s%.3f}""" }.mkString("[", ",", "]")
    println(s"""{"op":"top_paths_hotuser","calib":${f"${graft.Bench.calibrate()}%.3f"},"runs":$rows}""")
    spark.stop()
  }
}
