package graft.tools
import org.apache.spark.sql.SparkSession
object BpeCompare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1").select("text")
    docs.cache().count()
    val t0 = System.nanoTime()
    val dist = graft.ops.TextAnalysis.bpeMerges(docs, "text", 256).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
    val tDist = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val loc = graft.ops.TextAnalysis.bpeMergesLocal(docs, "text", 256).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
    val tLoc = (System.nanoTime() - t1) / 1e9
    println(f"""{"dist_n":${dist.size},"local_n":${loc.size},"equal":${dist == loc},"dist_sec":$tDist%.2f,"local_sec":$tLoc%.2f}""")
    spark.stop()
  }
}
