package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Per-STAGE wall/CPU profile for a named query — the §1 empirical step
  * StageCount can't do (it only counts). Runs the query once warm, then
  * once profiled, and prints every completed stage's name (callsite),
  * duration, task-time sum, shuffle read/write bytes and record counts,
  * slowest first. Usage: Test/runMain graft.tools.StageTime <sfDir> q_a … */
object StageTime {
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
    final case class S(name: String, wallMs: Long, taskMs: Long,
                       srMB: Double, swMB: Double, inRec: Long, outRec: Long)
    val stages = TrieMap.empty[Int, S]
    val listening = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (listening.get) {
          val si = ev.stageInfo
          val m = si.taskMetrics
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          stages.put(si.stageId, S(
            si.name.takeWhile(_ != '\n'),
            wall, m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead,
            m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten))
        }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Unit =
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      run() // warm
      Thread.sleep(1500) // drain the async listener bus of warm-run events
      stages.clear()
      listening.set(true)
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      listening.set(false)
      println(f"QUERY $n sec=$sec%.3f stages=${stages.size} " +
        f"wallSum=${stages.values.map(_.wallMs).sum / 1e3}%.3f " +
        f"taskSum=${stages.values.map(_.taskMs).sum / 1e3}%.3f")
      stages.toSeq.sortBy(-_._2.wallMs).take(25).foreach { case (id, s) =>
        println(f"  stage=$id%4d wall=${s.wallMs / 1e3}%7.3f task=${s.taskMs / 1e3}%7.3f " +
          f"sr=${s.srMB}%7.1fMB sw=${s.swMB}%7.1fMB inRec=${s.inRec}%9d outRec=${s.outRec}%9d  ${s.name}")
      }
    }
    spark.stop()
  }
}
