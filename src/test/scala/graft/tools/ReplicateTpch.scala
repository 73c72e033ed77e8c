package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write k×-replicated lineitem+orders tables (order keys shifted per
  * replica, so every replica is an independent order population and join
  * cardinalities stay linear in k) — the TPC-H analogue of
  * [[ReplicateDocs]], used to adjudicate whether a fact-side paired ratio
  * at sf0.1 is plan shape or per-stage fixed cost.
  *
  * Usage: Test/runMain graft.tools.ReplicateTpch <k> <outDir>
  */
object ReplicateTpch {
  def main(args: Array[String]): Unit = {
    val k = args(0).toInt
    val outDir = args(1)
    require(k >= 1 && k <= 16, s"k in 1..16: $k")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val step = 100000000L
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
    val ord = graft.Tables.orders(spark, "/root/testdata/sf0.1")
    val liRep = (0 until k).map { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * step))
    }.reduce(_ unionByName _)
    val ordRep = (0 until k).map { r =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * step))
    }.reduce(_ unionByName _)
    liRep.coalesce(8).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    ordRep.coalesce(4).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    println(s"wrote ${liRep.count()} lineitem + ${ordRep.count()} orders to $outDir")
    spark.stop()
  }
}
