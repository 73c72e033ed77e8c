package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `roundAway` must implement EXACT C round() semantics (half away from
  * zero on the binary double value) — that is what DuckDB's round() does,
  * and every money-sum oracle depends on the two engines agreeing. The
  * naive floor(x+0.5) fails within 1 ulp below a .5 boundary because the
  * addition itself rounds; these cases pin the fix. */
class RoundingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cRound(x: Double): Double =
    // exact binary value (new BigDecimal(double), NOT valueOf) rounded
    // half-away — the C round() definition
    new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  private def viaSpark(xs: Seq[Double]): Seq[Double] =
    xs.toDF("x").select(SparkEntry.roundAway(col("x")).as("r"))
      .as[Double].collect().toSeq

  test("halves round away from zero; ulp-below-half rounds down") {
    val cases = Seq(
      2.5, -2.5, 3.5, -3.5, 0.5, -0.5,
      0.49999999999999994, -0.49999999999999994, // largest |x| < 0.5: floor(x+0.5) would give 1
      267.49999999999997, -267.49999999999997,
      1e11 + 0.5, -(1e11 + 0.5),
      0.0, 42.0, -17.0)
    assert(viaSpark(cases) === cases.map(cRound))
  }

  test("agrees with exact-binary half-away on randomized scaled-money values") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(2000) {
      val raw = (rnd.nextDouble() - 0.5) * 2e7
      raw * 100 // decSum's scale-2 shape
    }
    assert(viaSpark(xs) === xs.map(cRound))
  }

  test("integral doubles above 2^52 pass through unchanged") {
    val xs = Seq(math.pow(2, 53) - 1, -(math.pow(2, 53) - 1), math.pow(2, 60))
    assert(viaSpark(xs) === xs)
  }
}
