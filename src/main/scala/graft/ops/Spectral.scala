package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral embedding analytics — the PCA-direction primitive behind
  * whitening / all-but-the-top (Mu & Viswanath 2018) post-processing and
  * anisotropy diagnostics for embedding corpora: the dominant principal
  * direction of the second-moment (Gram) matrix, extracted by power
  * iteration, and each row's projection onto it.
  *
  * Determinism (the oracle stance of [[Knn.kmeansFit]]/[[Graph.pageRank]]
  * applied to an eigen-ish algorithm): coordinates quantize once to
  * round(v·10⁶) LONGs, the d×d Gram matrix is an EXACT integer aggregate,
  * and the whole power-iteration trajectory runs in exact integer
  * arithmetic on the 10⁶ grid — init at the largest-diagonal axis (ties →
  * smaller dim), each step w = G·v re-normalized by w's max-abs component
  * with remainder-based round-half-away, sign fixed so the max-|v|
  * component is positive (ties → smaller dim). Every step is replayable
  * bit-for-bit as unrolled SQL CTEs; no float enters until the final
  * projection display division.
  *
  * Scale shape: the corpus is touched ONCE to build the Gram matrix —
  * a (d², partial-aggregated) shuffle of at most d²·partitions rows,
  * never the vectors; power iteration runs driver-side on the bounded
  * d×d artifact (BigInt — |G·v| ≤ d·Σ|q|²·10⁶ overflows a LONG long
  * before it overflows the analysis); the projection pass is a second
  * scan with the direction riding as a plan-time literal inside one
  * codegen'd HOF dot product. At 100 TB: two scans, one d²-bounded
  * exchange, zero corpus-sized shuffles.
  */
object Spectral {

  /** The exact integer Gram matrix of the quantized embedding column,
    * UPPER TRIANGLE only (r20 §2.3 — the matrix is symmetric, so the
    * lower triangle is pure duplicate work: emitting both halves doubled
    * the exploded row stream and the shuffled bytes for no information):
    * (i, j, g) with g = Σ_rows q_i·q_j as DECIMAL(38,0), 0 ≤ i ≤ j < d.
    * Consumers mirror driver-side ([[fitDirection]]) — the mirrored value
    * is the SAME integer, so every downstream trajectory is bit-identical
    * to the full-matrix form. Null vectors are excluded; all vectors must
    * share length `dim`. */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int,
                 quantScale: Long = 1000000L): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = df.where(col(vecCol).isNotNull)
      .select(transform(col(vecCol),
        x => round(x.cast("double") * quantScale).cast("long")).as("_qv"))
    q.select(posexplode(col("_qv")).as(Seq("i", "_qi")), col("_qv"))
      // slice from 1-based position i+1: pairs (i, j) with j ≥ i only —
      // d(d+1)/2 rows per vector instead of d²
      .select(col("i"), col("_qi"),
        posexplode(slice(col("_qv"), col("i") + lit(1), lit(dim))))
      .select(col("i"), (col("i") + col("pos")).as("j"),
        (col("_qi").cast(dec38) * col("col")).as("_p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("_p")).as("g"))
  }

  /** Driver-side exact-integer power iteration over a collected Gram
    * matrix. `gram` is (i, j, g) from [[gramMatrix]]; returns the
    * direction as d components on the ±10⁶ grid. */
  def powerIterate(gram: Array[(Int, Int, BigInt)], dim: Int,
                   iterations: Int, quantScale: Long = 1000000L): Array[Long] = {
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    val G = Array.ofDim[BigInt](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) G(i)(j) = BigInt(0)
    gram.foreach { case (i, j, g) => G(i)(j) = g }
    // init: unit grid vector at the largest diagonal entry (ties → smaller d)
    var d0 = 0
    for (d <- 1 until dim) if (G(d)(d) > G(d0)(d0)) d0 = d
    require(G(d0)(d0) > 0, "power iteration needs a non-zero Gram matrix")
    val scale = BigInt(quantScale)
    var v = Array.tabulate(dim)(d => if (d == d0) scale else BigInt(0))
    // remainder-based round-half-away of a/m (a ≥ 0, m > 0)
    def roundDiv(a: BigInt, m: BigInt): BigInt = {
      val q = a / m
      val r = a - q * m
      if (r * 2 >= m) q + 1 else q
    }
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(dim)(d =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + G(d)(j) * v(j)))
      val m = w.map(_.abs).max
      require(m > 0, "power iteration collapsed to the zero vector")
      var next = w.map { wd =>
        val u = roundDiv(wd.abs * scale, m)
        if (wd < 0) -u else u
      }
      // sign convention: the max-|component| (ties → smaller d) is positive
      var dm = 0
      for (d <- 1 until dim) if (next(d).abs > next(dm).abs) dm = d
      if (next(dm) < 0) next = next.map(x => -x)
      v = next
    }
    v.map(_.toLong)
  }

  /** Each row's projection onto the power-iterated dominant direction,
    * as a display double round(Σ q_d·v_d / (quantScale² as double), 6) —
    * the integer dot is exact on both engines, the single final division
    * and round are the shared display convention. Output: (idCol, proj).
    *
    * The full operator: one Gram scan + driver iteration + one
    * projection scan (the direction rides as a plan-time literal). */
  /** Fit the dominant direction: one Gram scan + the driver-side BigInt
    * power trajectory. Shared by [[dominantProjection]] and
    * [[removeDominant]] so projection and rejection can never disagree
    * on the direction. */
  def fitDirection(df: DataFrame, vecCol: String, dim: Int, iterations: Int,
                   quantScale: Long = 1000000L): Array[Long] = {
    // mirror the upper triangle (same integer both sides — symmetry is
    // exact, not approximate), so powerIterate sees the full matrix
    val gram = gramMatrix(df, vecCol, dim, quantScale).collect()
      .map(r => (r.getInt(0), r.getInt(1), BigInt(r.getDecimal(2).toBigInteger)))
      .flatMap { case t @ (i, j, g) =>
        if (i == j) Seq(t) else Seq(t, (j, i, g))
      }
    powerIterate(gram, dim, iterations, quantScale)
  }

  def dominantProjection(df: DataFrame, vecCol: String, idCol: String,
                         dim: Int, iterations: Int,
                         quantScale: Long = 1000000L): DataFrame = {
    val v = fitDirection(df, vecCol, dim, iterations, quantScale)
    val vLit = array(v.map(lit(_)): _*)
    val qv = transform(col(vecCol),
      x => round(x.cast("double") * quantScale).cast("long"))
    val dot = aggregate(zip_with(qv, vLit, (a, b) => a * b), lit(0L), _ + _)
    df.where(col(vecCol).isNotNull)
      .select(col(idCol),
        round(dot.cast("double") /
          lit(quantScale.toDouble * quantScale.toDouble), 6).as("proj"))
  }

  /** ALL-BUT-THE-TOP (Mu & Viswanath 2018, public) — remove the dominant
    * direction from every embedding, the standard isotropy repair for
    * anisotropic embedding corpora (the top component encodes frequency,
    * not meaning; retrieval and clustering both improve without it).
    * Exact-integer orthogonal rejection under the [[dominantProjection]]
    * replay stance:
    *
    *   c_i = q_i − roundHalfAway(dot · v_i / ‖v‖²),
    *   dot = Σ q_j·v_j  (exact LONG),  ‖v‖² = Σ v_j²  (a plan literal),
    *
    * with the per-coordinate product dot·v_i taken in DECIMAL(38,0) (the
    * gramMatrix overflow stance — a LONG product would wrap silently for
    * large-magnitude corpora) and the division exact because the
    * remainder is subtracted first. Per-coordinate error vs the real
    * rejection is ≤ 0.5 grid units — deterministic, engine-replayable.
    * Corrected vectors stay on the quantScale grid (`corrected[i] / 10⁶`
    * to rescale). No mean-centering (matches the uncentered Gram
    * convention documented on [[gramMatrix]]).
    *
    * Scale shape: one Gram scan + one projection scan — the direction
    * AND ‖v‖² ride as plan-time literals, so the rejection is a per-row
    * codegen HOF with no join and no shuffle. */
  def removeDominant(df: DataFrame, vecCol: String, idCol: String,
                     dim: Int, iterations: Int,
                     quantScale: Long = 1000000L): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = fitDirection(df, vecCol, dim, iterations, quantScale)
    val n2 = v.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * BigInt(x))
    require(n2 > 0 && n2.isValidLong, s"direction norm² out of LONG range: $n2")
    val n2L = n2.toLong
    val vLit = array(v.map(lit(_)): _*)
    val qv = transform(col(vecCol),
      x => round(x.cast("double") * quantScale).cast("long"))
    // round-half-away(a / n2) on DECIMAL a: remainder-subtracted division
    // is exact (the quotient is an integer, representable at scale 6)
    def roundDiv(a: Column): Column = {
      val ab = abs(a)
      val r = pmod(ab, lit(n2L).cast(dec38))
      val q0 = ((ab - r) / lit(n2L).cast(dec38)).cast("long")
      val up = when(r * 2 >= n2L, q0 + 1).otherwise(q0)
      when(a < 0, -up).otherwise(up)
    }
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), qv.as("_qv"))
      .withColumn("_dot",
        aggregate(zip_with(col("_qv"), vLit, (a, b) => a * b), lit(0L), _ + _))
      .select(col(idCol),
        zip_with(col("_qv"), vLit,
          (q, u) => q - roundDiv(col("_dot").cast(dec38) * u)).as("corrected"))
  }
}
