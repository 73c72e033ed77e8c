package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Execution-shape evidence for iterative/checkpointed queries whose
  * final explain() cannot show per-round work (lineage truncation): runs
  * each named query once warm, then once counted, and prints the total
  * Spark jobs, stages, tasks and shuffle bytes the execution submitted.
  * Usage: Test/runMain graft.tools.StageCount <sfDir> q_a q_b … */
object StageCount {
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
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shuffleRead = new AtomicLong
    val listening = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (listening.get) jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (listening.get) stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (listening.get) {
          tasks.incrementAndGet()
          if (t.taskMetrics != null)
            shuffleRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
        }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Unit =
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      run() // warm (codegen/classload)
      Thread.sleep(1500) // drain the async listener bus of warm-run events
      jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0)
      listening.set(true)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(1500)
      listening.set(false)
      println(f"SHAPE $n sec=$sec%.3f jobs=${jobs.get} stages=${stages.get} " +
        s"tasks=${tasks.get} shuffleReadMB=${shuffleRead.get / 1024 / 1024}")
    }
    spark.stop()
  }
}
