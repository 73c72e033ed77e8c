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
    // k ≤ 5 keeps cross-replica PAIR structure linear (5 distinct vowel
    // alphabets); k in 6..10 cycles the alphabets — duplicate text across
    // replicas, which is fine for PER-DOC trajectory pairings (tokenizer
    // train/segment/budget never pairs docs) but would re-introduce the
    // quadratic-output trap for dedup-family pairings. Callers above 5
    // are asserting the per-doc use case.
    require(k >= 1 && k <= 10, s"k in 1..10: $k")
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
        translate(col("text"), "aeiou", vowelMaps(r % vowelMaps.length)))
    }.reduce(_ unionByName _)
    rep.coalesce(4).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"wrote ${rep.count()} docs to $outDir/documents.parquet")
    spark.stop()
  }
}
