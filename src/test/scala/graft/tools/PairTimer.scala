package graft.tools
import org.apache.spark.sql.SparkSession

/** Calibration-stamped pairing timer (r20): like ExplainKn but prints
  * EVERY warm sample plus the single-thread and all-cores calibration
  * probes before/after — so a host-contention-contaminated measurement is
  * visible per line instead of silently poisoning a min-of-3. Usage:
  *   Test/runMain graft.tools.PairTimer <sfDir> <warmRuns> q_a q_b … */
object PairTimer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val warms = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c0 = graft.Bench.calibrate()
    val p0 = graft.Bench.calibrateParallel()
    println(f"CALIB single=$c0%.3f par=$p0%.3f")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold
      val samples = (1 to warms).map(_ => run())
      println(f"PAIR $n min=${samples.min}%.3f samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }
    val c1 = graft.Bench.calibrate()
    val p1 = graft.Bench.calibrateParallel()
    println(f"CALIB single=$c1%.3f par=$p1%.3f")
    spark.stop()
  }
}
