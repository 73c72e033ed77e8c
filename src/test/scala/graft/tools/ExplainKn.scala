package graft.tools
import org.apache.spark.sql.SparkSession
/** Warm-JVM pairing timer: min-of-3 per named SparkEntry query after a
  * cold run, all in one session (the BENCH_LOCAL pairing methodology —
  * removes the single-query session floor a cold Bench launch pays). */
object ExplainKn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold
      val best = (1 to 3).map(_ => run()).min
      println(f"PAIR $n $best%.3f")
    }
    spark.stop()
  }
}
