package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketches: the mergeability contract (per-slice sketches
  * unioned ≡ single-build, both inside the k=200 rank-error envelope of
  * exact), probe semantics, and the SQL surface. */
class KllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic, non-uniform, shuffled values in [0, 1000)
  private def values(n: Int): Seq[Double] =
    (0 until n).map(i => ((i * 2654435761L) % 1000000L).toDouble / 1000.0)

  // k=200 → ε ≈ 1.65 % normalized rank error at 99 % confidence; assert 2ε
  private val eps2 = 0.033

  test("per-slice sketches union to the single-build contract: rank error ≤ 2ε") {
    val n = 20000
    val vs = values(n)
    val sortedVs = vs.sorted
    def exactRank(v: Double): Double = sortedVs.count(_ <= v).toDouble / n
    val df = vs.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("slice", "x")
      .repartition(4)
    val slices = graft.ops.CorpusStats.quantileSketches(df, "x", "slice")
    assert(slices.count() === 7)
    val out = graft.ops.CorpusStats
      .quantilesFromSketches(slices, Seq(0.1, 0.5, 0.9, 0.99))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(out.length === 4)
    out.foreach { case (p, v, cnt) =>
      assert(cnt === n.toLong)
      assert(math.abs(exactRank(v) - p) <= eps2, s"p=$p est=$v rank=${exactRank(v)}")
    }
    // single global build agrees with the merged path inside the envelope
    val g = df.agg(KllExpressions.kllSketchAgg(col("x")).as("sk"))
      .select(KllExpressions.kllQuantile(col("sk"), lit(0.5)))
      .as[Double].head()
    assert(math.abs(exactRank(g) - 0.5) <= eps2)
  }

  test("kll_rank inverts kll_quantile within the envelope; kll_n exact; nulls skipped") {
    val df = (values(5000).map(Some(_)) ++ Seq.fill(100)(Option.empty[Double]))
      .toDF("x")
    val sk = df.agg(KllExpressions.kllSketchAgg(col("x")).as("sk"))
    val (n, r) = sk.select(
        KllExpressions.kllCount(col("sk")),
        KllExpressions.kllRank(col("sk"),
          KllExpressions.kllQuantile(col("sk"), lit(0.75))))
      .as[(Long, Double)].head()
    assert(n === 5000L)          // nulls never enter the sketch
    assert(math.abs(r - 0.75) <= eps2)
  }

  test("empty input: probes return null, n = 0") {
    val df = Seq.empty[Double].toDF("x")
    val row = df.agg(KllExpressions.kllSketchAgg(col("x")).as("sk"))
      .select(KllExpressions.kllQuantile(col("sk"), lit(0.5)).as("q"),
        KllExpressions.kllCount(col("sk")).as("n"))
      .collect().head
    assert(row.isNullAt(0) && row.getLong(1) === 0L)
  }

  test("SQL surface: kll_* registered via the shared function list") {
    values(2000).toDF("x").createOrReplaceTempView("kll_vals")
    val med = spark.sql(
      """SELECT kll_quantile(kll_sketch_agg(CAST(x AS DOUBLE), 200), CAST(0.5 AS DOUBLE))
        |FROM kll_vals""".stripMargin).as[Double].head()
    assert(med > 400 && med < 600, med.toString)
    // union over per-group sketches in SQL
    val un = spark.sql(
      """SELECT kll_n(kll_union_agg(sk, 200)) FROM (
        |  SELECT kll_sketch_agg(CAST(x AS DOUBLE), 200) AS sk
        |  FROM kll_vals GROUP BY CAST(x AS INT) % 5)""".stripMargin)
      .as[Long].head()
    assert(un === 2000L)
  }
}
