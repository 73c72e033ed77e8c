package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write a k×-replicated embeddings table for engine-vs-engine pairing at
  * amortized scale (the ReplicateDocs recipe for vectors): replica r keeps
  * every vector's norm but circularly shifts its coordinates by r·16 of
  * 64 dims, so replicas occupy rotated regions of the space — cluster
  * structure replicates instead of collapsing onto itself, and the paired
  * computation (kmeans fit/assign + within-cell pair stage) sees k× data
  * with the same per-cell geometry. Used to adjudicate whether a paired
  * sf0.1 ratio is plan shape or per-stage fixed cost.
  *
  * Usage: Test/runMain graft.tools.ReplicateEmbeddings <k> <outDir>
  */
object ReplicateEmbeddings {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val outDir = args(1)
    require(k >= 1 && k <= 5, s"k in 1..5: $k")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val step = 10000000L
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rep = (0 until k).map { r =>
      val shift = (r * 16) % dim
      val withId = emb.withColumn("vec_id", col("vec_id") + lit(r * step))
      if (shift == 0) withId
      else withId.withColumn("embedding",
        concat(slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift)))
    }.reduce(_ unionByName _)
    rep.coalesce(4).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"wrote ${rep.count()} vectors to $outDir/embeddings.parquet")
    spark.stop()
  }
}
