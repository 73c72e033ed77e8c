package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_incremental_components (r21): times the two
  * componentsStar phases separately. Usage:
  *   Test/runMain graft.tools.IncCompProfile <sfDir> <reps> */
object IncCompProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(body: => Unit): Unit = {
      val samples = (0 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      // drop the cold first sample
      println(f"PHASE $label min=${samples.tail.min}%.3f " +
        s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    val ids = graft.Tables.documents(spark, dir).select(col("doc_id"))
      .localCheckpoint(true)
    val basePairs = ids.select(col("doc_id").as("id_a"))
      .filter(pmod(col("id_a"), lit(50)) =!= 49 &&
        pmod(col("id_a"), lit(50)) =!= 24)
      .join(ids.select(col("doc_id").as("id_b")),
        col("id_b") === col("id_a") + 1)
      .unionByName(ids.select(col("doc_id").as("id_a"),
        col("doc_id").as("id_b")))
    val delta = ids.select(col("doc_id").as("id_a"))
      .filter(pmod(col("id_a"), lit(50)) === 24)
      .join(ids.select(col("doc_id").as("id_b")),
        col("id_b") === col("id_a") + 1)
      .localCheckpoint(true)
    t("phase1_base_star") {
      graft.ops.Graph.componentsStar(basePairs)
        .write.format("noop").mode("overwrite").save()
    }
    val standing = graft.ops.Graph.componentsStar(basePairs)
      .localCheckpoint(true)
    t("phase2_incremental_from_pinned") {
      graft.ops.Graph.incrementalComponents(standing, delta)
        .write.format("noop").mode("overwrite").save()
    }
    t("full_query") {
      val st = graft.ops.Graph.componentsStar(basePairs)
      graft.ops.Graph.incrementalComponents(st, delta)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
