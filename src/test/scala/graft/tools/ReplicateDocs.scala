package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write a k×-replicated documents table (ScaleCheck's vowel-rotation
  * dissimilarity transform, so true-pair structure stays linear in k) for
  * engine-vs-engine pairing at amortized scale — used to adjudicate
  * whether a paired ratio at sf0.1 is plan shape or per-stage fixed cost
  * (the floor collapses as data grows; a shape defect does not).
  *
  * Usage: Test/runMain graft.tools.ReplicateDocs <k> <outDir>
  */
object ReplicateDocs {
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
    val vowelMaps = Array("aeiou", "eioua", "iouae", "ouaei", "uaeio")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val rep = (0 until k).map { r =>
      val withId = docs.withColumn("doc_id", col("doc_id") + lit(r * step))
      if (r == 0) withId
      else withId.withColumn("text",
        translate(col("text"), "aeiou", vowelMaps(r)))
    }.reduce(_ unionByName _)
    rep.coalesce(4).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"wrote ${rep.count()} docs to $outDir/documents.parquet")
    spark.stop()
  }
}
