package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudication tool for the r9 verdict's driver-local BPE item: time
  * `bpeMergesLocal(nMerges)` on a real corpus, split into the one
  * corpus-scale pass (vocab collect) vs the driver-local merge loop —
  * the claim under test is that merges beyond the first cost driver CPU,
  * not one Spark job each (the distributed trainer's flat floor).
  *
  * Usage: Test/runMain graft.tools.BpeLocalTiming <sfDir> <nMerges>
  */
object BpeLocalTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `synth:<V>` simulates a REAL tokenizer-training vocab (the sf*
    // corpora only carry 31 distinct words): V distinct base-26 words,
    // zipf-ish counts — the shape a 100 TB web corpus collapses to.
    val docs =
      if (sfDir.startsWith("synth:")) {
        val v = sfDir.stripPrefix("synth:").toInt
        import org.apache.spark.sql.functions._
        spark.range(v.toLong).select(
          concat_ws(" ", (0 until 1).map(_ =>
            conv(col("id") + 100000, 10, 26)): _*).as("text"))
      } else graft.Tables.documents(spark, sfDir).select("text")
    docs.cache().count()   // isolate the trainer from parquet-read cost
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm codegen/classes with a small run, then measure
    graft.ops.TextAnalysis.bpeMergesLocal(docs, "text", 2).count()
    val (n, sec) = time(
      graft.ops.TextAnalysis.bpeMergesLocal(docs, "text", nMerges).count())
    println(f"""{"tool":"bpe_local","sf":"$sfDir","n_merges":$nMerges,"merges_returned":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
