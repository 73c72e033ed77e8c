package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SpectralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("power iteration: hand 2-D corpus converges to the planted direction, sign fixed") {
    // three vectors along (0.6, 0.8) (one negated) + a tiny orthogonal
    // perturbation: the Gram matrix is ~3·outer((.6,.8)) whose dominant
    // eigenvector is (.6,.8) → grid-normalized (750k, 1M)
    val rows = Seq(
      (1L, Seq(0.6f, 0.8f)), (2L, Seq(0.6f, 0.8f)),
      (3L, Seq(-0.6f, -0.8f)), (4L, Seq(0.01f, 0.0f)))
      .toDF("vec_id", "embedding")
    val tri = Spectral.gramMatrix(rows, "embedding", dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger)))
    // r20: gramMatrix emits the UPPER TRIANGLE only (j ≥ i) — the matrix
    // is symmetric and the mirror carries no information
    assert(tri.forall { case (i, j, _) => j >= i }, tri.toSeq.toString)
    val gram = tri.flatMap { case t @ (i, j, v) =>
      if (i == j) Seq(t) else Seq(t, (j, i, v)) }
    // exact integer Gram: G11 = 3·(8e5)² = 1.92e12 dominates G00
    val g = gram.map { case (i, j, v) => (i, j) -> v }.toMap
    assert(g((1, 1)) === BigInt("1920000000000"))
    assert(g((0, 1)) === g((1, 0)))
    val v = Spectral.powerIterate(gram, dim = 2, iterations = 3)
    assert(v(1) === 1000000L, s"max component must normalize to +1e6: ${v.toSeq}")
    assert(v(0) > 740000L && v(0) < 760000L, s"direction ratio ~0.75: ${v.toSeq}")
    // projections = exact integer dot / 1e12, rounded — verify against a
    // hand recomputation with the operator's own direction
    val proj = Spectral.dominantProjection(rows, "embedding", "vec_id",
        dim = 2, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def hand(x: Double, y: Double): Double = {
      val qx = math.round(x * 1e6); val qy = math.round(y * 1e6)
      BigDecimal((qx * v(0) + qy * v(1)).toDouble / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(proj(1L) === hand(0.6, 0.8))
    assert(proj(3L) === hand(-0.6, -0.8))
    assert(proj(1L) > 1.0 && proj(3L) < -1.0)
  }

  test("power iteration: sign convention makes a negatively-planted corpus positive") {
    val rows = Seq((1L, Seq(-0.9f, 0.1f)), (2L, Seq(-0.9f, 0.1f)),
      (3L, Seq(-0.9f, 0.12f))).toDF("vec_id", "embedding")
    val gram = Spectral.gramMatrix(rows, "embedding", dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger)))
      .flatMap { case t @ (i, j, g) => if (i == j) Seq(t) else Seq(t, (j, i, g)) }
    val v = Spectral.powerIterate(gram, dim = 2, iterations = 3)
    // dominant axis is dim 0 (all mass at -0.9): the sign flip must leave
    // the max-|·| component POSITIVE regardless of the data's sign
    assert(v(0) === 1000000L, v.toSeq.toString)
    assert(v(1) < 0L) // and the minor component flips with it
  }

  test("dominant projection is repartition-invariant on real embeddings") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(300)
    val a = Spectral.dominantProjection(e, "embedding", "vec_id", 64, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Spectral.dominantProjection(e.repartition(11), "embedding", "vec_id", 64, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
  test("removeDominant: exact BigInt mirror, near-orthogonal residual, repartition-invariant") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .where(col("embedding").isNotNull).limit(200)
      .select(col("vec_id"), col("embedding"))
    val got = Spectral.removeDominant(e, "embedding", "vec_id", 64, 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // driver-side BigInt mirror of the documented arithmetic
    val v = Spectral.fitDirection(e, "embedding", 64, 2)
    val n2 = v.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * BigInt(x))
    def roundDiv(a: BigInt, m: BigInt): BigInt = {
      val ab = a.abs
      val q = ab / m
      val r = ab - q * m
      val u = if (r * 2 >= m) q + 1 else q
      if (a < 0) -u else u
    }
    val rows = e.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000L).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    rows.foreach { case (id, qv) =>
      val dot = qv.indices.foldLeft(BigInt(0))((a, i) => a + BigInt(qv(i)) * v(i))
      val expect = qv.indices.map(i =>
        (BigInt(qv(i)) - roundDiv(dot * v(i), n2)).toLong).toArray
      assert(got(id).sameElements(expect), s"vec $id")
      // residual ⊥ direction up to per-coordinate rounding (≤ 0.5 grid
      // units each → |c·v| ≤ 0.5·Σ|v_i| ≤ 0.5·64·10⁶)
      val cd = qv.indices.foldLeft(BigInt(0))((a, i) => a + BigInt(got(id)(i)) * v(i))
      assert(cd.abs <= BigInt(32L * 1000000L), s"vec $id residual $cd")
    }
    // repartition invariance (plan-literal direction, per-row rejection)
    val re = Spectral.removeDominant(e.repartition(13), "embedding", "vec_id", 64, 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(re.keySet === got.keySet)
    re.foreach { case (id, arr) => assert(arr.sameElements(got(id))) }
  }

}
