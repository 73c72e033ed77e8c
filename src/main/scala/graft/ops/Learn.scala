package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed trained-model primitives beyond the Naive-Bayes family
  * ([[TextAnalysis.langidNb]]/[[TextAnalysis.qualityNb]] train in ONE
  * aggregate pass because NB's statistics are counts): LOGISTIC
  * REGRESSION needs iterative optimization, and this is the canonical
  * distributed shape for it — full-batch gradient descent where each
  * iteration is ONE map-side-combined aggregate over the feature table
  * and the model is a d-vector of driver state (the bounded-artifact
  * class: d + 1 doubles per iteration cross the driver boundary, never
  * rows). The fastText-recipe quality classifiers (Joulin et al. 2017)
  * are exactly this: hashed features + a linear model + sigmoid.
  */
object Learn {

  /** Round half AWAY from zero at 6 decimals — matching SQL `round()`
    * semantics on both engines (Scala's `math.round` rounds half toward
    * +∞, which disagrees on negatives). */
  private def micro6(x: Double): Double =
    (if (x >= 0) math.round(x * 1e6) else -math.round(-x * 1e6)) / 1e6

  /** Full-batch gradient descent on logistic loss, DETERMINISTIC by
    * construction: weights start at 0 and are quantized to 6 decimals
    * after every update, so the whole trajectory is reproducible across
    * engines, partitionings, and runs — per-iteration gradient sums are
    * doubles whose association order varies with partitioning (~1e-13
    * relative), but the micro-quantized update absorbs it (a flip needs
    * the true update within 1e-13 of a 5e-7 boundary — the round(…,6)
    * oracle stance used across the repo).
    *
    *   w ← round₆( w − lr · Σ(σ(w·x) − y)·x / n )
    *
    * `featCols` must be bounded-magnitude (≈[0,1]-scaled) columns — the
    * caller includes an explicit all-ones bias column if wanted; z folds
    * LEFT-ASSOCIATIVELY over `featCols` order (the oracle replays the
    * same association). Each iteration scans the feature frame once:
    * MATERIALIZE features first (localCheckpoint/parquet) or pay
    * `iters` recomputes of the upstream pipeline — at 100 TB the
    * feature table is the artifact, the corpus is not rescanned.
    *
    * Returns the weight vector in `featCols` order. */
  def lrTrain(df: DataFrame, featCols: Seq[String], labelCol: String,
              iters: Int = 8, lr: Double = 1.0): Array[Double] = {
    require(featCols.nonEmpty, "no features")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val d = featCols.length
    val f = df.select(featCols.map(c => col(c).cast("double").as(c)) :+
      col(labelCol).cast("double").as("_y"): _*)
    var w = Array.fill(d)(0.0)
    for (it <- 0 until iters) {
      val err = sigmoid(z(featCols.map(col), w)) - col("_y")
      // The gradient denominator is count(*) while the numerators are
      // null-skipping sums — a null feature/label row would silently
      // deflate the gradient instead of failing. Enforce the non-null
      // precondition: count over the full z·y expression equals count(*)
      // iff no row carries a null anywhere in features or label.
      val aggs = featCols.map(c => sum(err * col(c))) :+
        count(lit(1L)) :+ count(err)
      val row = f.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(d)
      require(n > 0L, "empty training frame")
      if (it == 0) require(row.getLong(d + 1) == n,
        s"lrTrain requires non-null features and label: ${n - row.getLong(d + 1)} " +
          s"of $n rows carry a NULL in ${featCols.mkString(",")}/$labelCol")
      w = Array.tabulate(d)(j => micro6(w(j) - lr * row.getDouble(j) / n))
    }
    w
  }

  /** z = ((w₀·x₀ + w₁·x₁) + w₂·x₂) + … — fixed left association, the
    * exact shape the oracle restates. */
  private def z(feats: Seq[Column], w: Array[Double]): Column =
    feats.zipWithIndex.map { case (c, j) => c * lit(w(j)) }.reduceLeft(_ + _)

  private def sigmoid(zc: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-zc))

  /** Scan-side scoring under literal weights: `lr_score` =
    * round₆(σ(w·x)), `lr_pred` = σ(w·x) ≥ 0.5. Both engines compute the
    * same expression tree, but `exp()` is not correctly-rounded — JVM
    * Math.exp vs libm can differ in the last ulp, so a sigmoid landing
    * within an ulp of the 0.5 boundary (or of a 5e-7 round₆ boundary)
    * could in principle flip; the same probabilistic round(…,6) stance
    * as the rest of the repo, not an exactness guarantee. Zero shuffle,
    * zero joins — the model is d literals in the projection. */
  def lrScore(df: DataFrame, featCols: Seq[String],
              weights: Array[Double]): DataFrame = {
    require(weights.length == featCols.length,
      s"${weights.length} weights for ${featCols.length} features")
    val p = sigmoid(z(featCols.map(c => col(c).cast("double")), weights))
    df.withColumn("lr_score", round(p, 6))
      .withColumn("lr_pred", p >= 0.5)
  }

  /** The [[lrTrain]] weight vector as a persistable ONE-ROW model frame
    * (r18 verdict item 3 — artifact parity with [[Selection.knTrain]] and
    * the NB family: train once, score many runs). Columns are the feature
    * names in `featCols` order, values the weights; the frame round-trips
    * parquet exactly because the weights are already micro-quantized
    * doubles (6 decimals — representable, and parquet stores the binary64
    * verbatim either way). */
  def lrModelFrame(spark: org.apache.spark.sql.SparkSession,
                   featCols: Seq[String], weights: Array[Double]): DataFrame = {
    require(weights.length == featCols.length,
      s"${weights.length} weights for ${featCols.length} features")
    spark.range(1).select(
      featCols.zipWithIndex.map { case (c, j) => lit(weights(j)).as(c) }: _*)
  }

  /** Read a weight vector back out of a [[lrModelFrame]] (possibly
    * parquet-reloaded) in `featCols` order — one driver row of d doubles,
    * the bounded-artifact class. */
  def lrWeights(model: DataFrame, featCols: Seq[String]): Array[Double] = {
    val rows = model.select(featCols.map(c => col(c).cast("double")): _*).collect()
    require(rows.length == 1,
      s"LR model frame must have exactly one row, got ${rows.length}")
    Array.tabulate(featCols.length)(rows(0).getDouble)
  }

  /** Mean logistic loss −[y·ln p + (1−y)·ln(1−p)] under literal weights,
    * as one aggregate — the convergence-audit readout (SelectionSpec
    * pins monotone decrease along the [[lrTrain]] trajectory). */
  def lrLoss(df: DataFrame, featCols: Seq[String], labelCol: String,
             weights: Array[Double]): Double = {
    val p = sigmoid(z(featCols.map(c => col(c).cast("double")), weights))
    val y = col(labelCol).cast("double")
    df.agg(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
      .head().getDouble(0)
  }
}
