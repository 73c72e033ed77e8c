package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import ThetaExpressions._

  test("exact mode below 2^lgK: estimates, intersections, and differences are exact") {
    // A = 1..300, B = 200..500 → |A|=300, |B|=301, |A∩B|=101,
    // |A\B|=199, |B\A|=200 — all far below 2^12 nominal entries
    val a = (1L to 300L).toDF("v").agg(thetaSketchAgg($"v").as("sk"))
    val b = (200L to 500L).toDF("v").agg(thetaSketchAgg($"v").as("sk"))
    val r = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(
        round(thetaEstimate($"sk")).cast("long"),
        round(thetaEstimate($"sk2")).cast("long"),
        round(thetaEstimate(thetaIntersect($"sk", $"sk2"))).cast("long"),
        round(thetaEstimate(thetaANotB($"sk", $"sk2"))).cast("long"),
        round(thetaEstimate(thetaANotB($"sk2", $"sk"))).cast("long"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r === ((300L, 301L, 101L, 199L, 200L)))
  }

  test("slice-union fold ≡ single build, repeats never double-count") {
    // three overlapping slices whose union is 1..900
    val slices = Seq((0, 1L, 400L), (1, 300L, 700L), (2, 600L, 900L))
      .flatMap { case (s, lo, hi) => (lo to hi).map(v => (s, v)) }
      .toDF("slice", "v")
    val perSlice = slices.groupBy($"slice").agg(thetaSketchAgg($"v").as("sk"))
    val folded = perSlice.agg(
        round(thetaEstimate(thetaUnionAgg($"sk"))).cast("long"))
      .as[Long].head()
    val direct = slices.agg(
        round(thetaEstimate(thetaSketchAgg($"v"))).cast("long"))
      .as[Long].head()
    assert(folded === 900L)
    assert(direct === 900L)
  }

  test("estimate mode above 2^lgK stays inside the published error bounds") {
    // 200k distinct at lgK=12 (4096 entries): RSE ≈ 1/√4096 ≈ 1.56 %;
    // assert a generous 5 % envelope
    val est = spark.range(1, 200001).toDF("v")
      .agg(thetaEstimate(thetaSketchAgg($"v", lgK = 12)))
      .as[Double].head()
    assert(math.abs(est - 200000.0) / 200000.0 < 0.05, s"est=$est")
  }

  test("SQL surface: the five theta functions run through the session registry") {
    val s = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s)
    s.range(1, 101).createOrReplaceTempView("t_theta")
    val r = s.sql(
      """SELECT CAST(round(theta_estimate(theta_sketch_agg(id, 12))) AS BIGINT)
        |FROM t_theta""".stripMargin).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
    assert(r === 100L)
  }
}
