package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z_value: hand-interleaved examples and bit structure") {
    assert(ZOrder.zValue(0, 0) === 0L)
    assert(ZOrder.zValue(1, 0) === 1L)
    assert(ZOrder.zValue(0, 1) === 2L)
    assert(ZOrder.zValue(3, 5) === 39L)     // x=011, y=101 → 100111
    assert(ZOrder.zValue(0xFFFFFFFFL, 0) === 0x5555555555555555L)
    assert(ZOrder.zValue(0, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
    // bit-exact reference: interleave loop
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      var ref = 0L
      for (b <- 0 until 32) {
        ref |= ((x >> b) & 1L) << (2 * b)
        ref |= ((y >> b) & 1L) << (2 * b + 1)
      }
      assert(ZOrder.zValue(x, y) === ref)
    }
    // Column path = kernel
    val got = Seq((3, 5), (7, 0)).toDF("x", "y")
      .select(z_value($"x", $"y")).as[Long].collect().toSeq
    assert(got === Seq(39L, 21L))
  }

  test("zorderBy: partitions tile BOTH dimensions — per-file spans shrink vs a one-column sort") {
    // 64×64 grid, one row per cell; 16 output partitions. A sort by x
    // alone gives files spanning the FULL y range (span 63); the z-order
    // layout keeps both spans near sqrt(cells-per-file) — min/max pruning
    // then works on either key.
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("_pid", spark_partition_id())
        .groupBy("_pid")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
      s
    }
    val (zx, zy) = spans(graft.ops.Bucketing.zorderBy(pts, $"x", $"y", 16))
    val (lx, ly) = spans(pts.repartitionByRange(16, $"x").sortWithinPartitions("x"))
    assert(lx <= 4.0, s"x-sort baseline should have tight x spans: $lx")
    assert(ly >= 60.0, s"x-sort baseline spans ~all of y: $ly")
    assert(zx <= 20.0 && zy <= 20.0,
      s"z-order must bound BOTH spans (got x=$zx y=$zy vs 64-wide grid)")
  }
}
