package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain mixing for training corpora: resample documents so domain
  * shares follow a TEMPERATURE-flattened distribution rather than the
  * natural one — the standard recipe for balancing low-resource domains
  * (multilingual sampling, corpus-mixture weighting): target share of
  * domain d is p_d ∝ n_d^α. α = 1 keeps natural proportions; α → 0
  * approaches uniform across domains; 0 < α < 1 upsamples the tail
  * relatively (still never above fraction 1 — this samples without
  * replacement).
  *
  * Scale shape: the domain histogram is a tiny driver-side aggregate
  * (#domains rows), the sampling itself is `sampleBy` — a seeded
  * per-row Bernoulli filter in one scan, no shuffle.
  */
object Mixing {

  /** Per-domain sampling fractions for a target corpus of `targetSize`
    * documents: f_d = min(1, p_d · targetSize / n_d), p_d = n_d^α / Σ n^α.
    * Domains are folded in sorted order so the Σ n^α accumulation is
    * deterministic. */
  def temperatureFractions(df: DataFrame, domainCol: String, alpha: Double,
                           targetSize: Long): Map[String, Double] = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(domainCol).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val weights = counts.map { case (d, n) => (d, n, math.pow(n.toDouble, alpha)) }
    val z = weights.map(_._3).sum
    weights.map { case (d, n, w) =>
      d -> math.min(1.0, w / z * targetSize / n)
    }.toMap
  }

  /** The mixed corpus: seeded, deterministic `sampleBy` under
    * [[temperatureFractions]]. */
  def mixByTemperature(df: DataFrame, domainCol: String, alpha: Double,
                       targetSize: Long, seed: Long = 42L): DataFrame =
    df.stat.sampleBy(domainCol,
      temperatureFractions(df, domainCol, alpha, targetSize), seed)
}
