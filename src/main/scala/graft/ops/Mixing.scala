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
  *
  * `T` is the domain column's external type (String, Int, …) — it must
  * match what the column actually holds, exactly as with `sampleBy`.
  */
object Mixing {

  /** One collected (domain, count) histogram, in deterministic sorted
    * order so downstream float folds don't depend on task order. */
  private def histogram[T](df: DataFrame, domainCol: String): Array[(T, Long)] =
    df.filter(col(domainCol).isNotNull)
      .groupBy(domainCol).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getAs[T](0) -> r.getLong(1))
      .sortBy(_._1.toString)

  private def fractions[T](counts: Array[(T, Long)], alpha: Double,
                           targetSize: Long): Map[T, Double] = {
    val weights = counts.map { case (d, n) => (d, n, math.pow(n.toDouble, alpha)) }
    val z = weights.map(_._3).sum
    weights.map { case (d, n, w) =>
      d -> math.min(1.0, w / z * targetSize / n)
    }.toMap
  }

  /** Per-domain sampling fractions for a target corpus of `targetSize`
    * documents: f_d = min(1, p_d · targetSize / n_d), p_d = n_d^α / Σ n^α. */
  def temperatureFractions[T](df: DataFrame, domainCol: String, alpha: Double,
                              targetSize: Long): Map[T, Double] = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    fractions(histogram[T](df, domainCol), alpha, targetSize)
  }

  /** Like [[temperatureFractions]] but the target is a SHARE of the
    * corpus (0 < share ≤ 1) — total size comes from the same collected
    * histogram, no extra count job. */
  def temperatureFractionsByShare[T](df: DataFrame, domainCol: String,
                                     alpha: Double, share: Double): Map[T, Double] = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(share > 0 && share <= 1, s"share must be in (0, 1], got $share")
    val counts = histogram[T](df, domainCol)
    fractions(counts, alpha, math.round(counts.map(_._2).sum * share))
  }

  /** The mixed corpus: seeded, deterministic `sampleBy` under
    * [[temperatureFractions]]. */
  def mixByTemperature[T](df: DataFrame, domainCol: String, alpha: Double,
                          targetSize: Long, seed: Long = 42L): DataFrame =
    df.stat.sampleBy(domainCol,
      temperatureFractions[T](df, domainCol, alpha, targetSize), seed)

  /** Deterministic train/val/test assignment by CONTENT hash — not a
    * random split. `cuts` are (name, weight) slices of the
    * `pmod(fnv64(key), Σweights)` bucket space, e.g.
    * `Seq("train" → 8, "val" → 1, "test" → 1)`. Hashing the content (or a
    * stable key) rather than rolling dice is the production recipe for two
    * reasons: the split is REPRODUCIBLE across reruns, engines, and
    * repartitions (no seed plumbing, no row-order sensitivity), and
    * byte-identical duplicate documents land in the SAME split — a random
    * split leaks duplicated text across the train/test boundary. Pure
    * per-row projection: one scan, no shuffle, no driver state. */
  def splitByHash(df: DataFrame, keyCol: String,
                  cuts: Seq[(String, Int)],
                  splitCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_._2 > 0),
      s"cuts must be non-empty positive weights: $cuts")
    val total = cuts.map(_._2).sum
    val bucket = pmod(graft.functions.GraftFunctions.fnv64(col(keyCol)), lit(total))
    // a null key gets a NULL split, not a silent bucket: fnv64(null) is
    // null, and without the explicit guard the when-chain would fall
    // through to `otherwise` and dump the whole null population into the
    // LAST cut (contaminating the smallest split, typically 'test')
    val assigned = cuts.init.foldLeft(
      (when(col(keyCol).isNull, lit(null).cast("string")), 0)) {
      case ((chain, acc), (name, w)) =>
        (chain.when(bucket < acc + w, name), acc + w)
    }._1.otherwise(cuts.last._1)
    df.withColumn(splitCol, assigned)
  }

  /** EXACTLY-balanced stratified k-fold assignment — the
    * cross-validation splitter [[splitByHash]] can't be: a hash-mod
    * split is only binomially balanced (a 5-fold over a 1 000-doc
    * stratum routinely lands 180/220 folds, and rare strata can miss a
    * fold entirely), while model comparison wants every fold to carry
    * the SAME stratum composition. Here fold = (global rank of the row's
    * hash within its stratum − 1) mod k, so per stratum every fold's
    * size differs by at most one — and the hash order makes the folds
    * pseudo-random with respect to any data attribute.
    *
    * Scale shape: NO stratum-sized window (row_number over a corpus-
    * scale stratum is the single-task OOM shape). Rows hash-bucket into
    * `buckets` sub-blocks per stratum; within-(stratum, bucket) ranks
    * are bucket-bounded windows, and the bucket's global offset comes
    * from a cumulative window over the tiny (stratum × buckets) count
    * grain — the [[graft.ops.CorpusStats]] partition-offset idea with
    * hash buckets instead of range partitions. Global rank = offset +
    * local rank: exact, deterministic, partitioning-independent.
    * Output: (idCol, stratumCol, fold 0..k−1); null id/stratum rows
    * excluded. */
  def stratifiedKFold(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int, buckets: Int = 1024): DataFrame = {
    require(k >= 2, s"k must be ≥ 2: $k")
    require(buckets >= 1, s"buckets must be ≥ 1: $buckets")
    val W = org.apache.spark.sql.expressions.Window
    val h = graft.functions.GraftFunctions.fnv64(col(idCol).cast("string"))
    val base = df.where(col(idCol).isNotNull && col(stratumCol).isNotNull)
      .select(col(idCol), col(stratumCol),
        h.as("_h"), pmod(h, lit(buckets.toLong)).as("_b"))
    val counts = base.groupBy(col(stratumCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(
        W.partitionBy(col(stratumCol)).orderBy(col("_b"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .drop("_c")
    base
      .withColumn("_rn", row_number().over(
        W.partitionBy(col(stratumCol), col("_b"))
          .orderBy(col("_h"), col(idCol))))
      .join(counts, Seq(stratumCol.replace("`", ""), "_b"))
      .select(col(idCol), col(stratumCol),
        pmod(col("_off") + col("_rn") - 1, lit(k.toLong)).cast("int")
          .as("fold"))
  }

  /** Deterministic EXACT-k sample per group — the fraction-free sibling of
    * [[mixByTemperature]] (a `sampleBy` fraction only hits its target size
    * in expectation; eval-set carving and per-domain caps need exactly k).
    * Rows rank by a seeded content-independent hash of their id
    * (`fnv64(seed:id)`), so the sample is reproducible across reruns,
    * engines, and repartitionings, and extending k by one only ADDS a row
    * (prefix-stable, like a shuffled deck dealt from the top). Output:
    * (groupCol, idCol, rn) with rn in 1..k per group; groups smaller than
    * k return whole.
    *
    * Scale shape: NOT a window — `row_number() OVER (PARTITION BY group)`
    * sorts each whole group in one task, the OOM shape when a group is a
    * domain with 10⁹ docs. The bounded [[graft.functions.TopKByScore]]
    * partial aggregation trims every input partition to k before the
    * exchange, so the shuffle carries ≤ partitions × groups × k tiny rows
    * regardless of group skew. The hash ranks through its DOUBLE image
    * (ties broken by id) — deterministic, and order-equivalent to the
    * exact 64-bit order except on 2⁻¹¹-rare mantissa collisions, where
    * the id tiebreak keeps both engines aligned anyway. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int, seed: String = "s0"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require({
        import org.apache.spark.sql.types._
        Seq(LongType, IntegerType, ShortType, ByteType)
          .contains(df.schema(idCol).dataType)
      },
      s"idCol '$idCol' must be integral (the top-k buffer carries LONG ids; " +
        s"a string id would cast to NULL and crash the aggregator): " +
        s"${df.schema(idCol).dataType}")
    val topk = udaf(new graft.functions.TopKByScore(k))
    df.select(col(groupCol),
        col(idCol).cast("long").as("_id"),
        negate(graft.functions.GraftFunctions.fnv64(
          concat(lit(seed + ":"), col(idCol).cast("string")))
          .cast("double")).as("_ord"))
      .groupBy(col(groupCol))
      .agg(topk(col("_ord"), col("_id")).as("_top"))
      .select(col(groupCol), posexplode(col("_top")))
      .select(col(groupCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Deterministic WEIGHTED sample of k rows without replacement
    * (Efraimidis–Spirakis 2006): rank every row by ln(u)/w with u a
    * hash-derived uniform in (0,1) and keep the k largest — inclusion
    * probability ∝ weight, so "sample the corpus ∝ quality^β" becomes one
    * scan + the bounded top-k aggregation. Hash-derived u (not a seeded
    * RNG): the sample is reproducible across reruns, engines, and
    * repartitionings. Output: (idCol, rn), rn = 1..k in key order.
    *
    * Cross-engine exactness: the E-S key ln(u^{1/w}) = ln(u)/w ranks
    * identically; it quantizes to round(ln(u)/w · 10⁶) micro-LONGs
    * (ties → id) so both engines pick the identical set — libm ulp
    * differences vanish in the micro-rounding. u = (pmod(fnv64, 2⁵³) +
    * 0.5) / 2⁵³: 53-bit, exactly representable, never 0 or 1. Weights
    * must be > 0 (rows with NULL or non-positive weight are dropped —
    * they have no defined inclusion probability), and are floored at
    * 10⁻⁹: below that the micro-key \|ln(u)/w·10⁶\| can pass 2⁶³, where
    * the non-ANSI double→long cast clamps to Long.MinValue and every
    * tiny-weight row collapses into one tied key (selection by id order,
    * not ∝ weight — and diverging from an oracle's HUGEINT arithmetic).
    * At the floor the key tops out at ~3.7·10¹⁶, comfortably inside
    * LONG; weights spanning more than 9 orders of magnitude below 1
    * have indistinguishable inclusion probability anyway. */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
                      k: Int, seed: String = "w0"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val topk = udaf(new graft.functions.TopKByScore(k))
    val two53 = 9007199254740992.0 // 2^53
    val u = (pmod(graft.functions.GraftFunctions.fnv64(
        concat(lit(seed + ":"), col(idCol).cast("string"))),
      lit(9007199254740992L)).cast("double") + lit(0.5)) / lit(two53)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol).cast("long").as("_id"),
        round(log(u) / greatest(col(weightCol).cast("double"), lit(1e-9))
            * lit(1e6))
          .cast("long").cast("double").as("_key"))
      .groupBy()
      .agg(topk(col("_key"), col("_id")).as("_top"))
      .select(posexplode(col("_top")))
      .select(col("col.id").as(idCol), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Deterministic GLOBAL training-order shuffle — the last step before a
    * corpus ships to a trainer: every row gets a shard and a position
    * such that reading shards 0..n−1 each in position order yields a
    * fixed pseudo-random permutation of the corpus. Shard =
    * pmod(fnv64(seed:id), nShards); position = rank of (hash, id) within
    * the shard. Hash-derived (not seeded-random): reproducible across
    * reruns, engines, and repartitionings — two pipelines that materialize
    * the same corpus produce byte-identical training order, so a resumed
    * or re-run job sees the same batches.
    *
    * Scale shape: one exchange by shard, one sort per shard — exactly the
    * work of WRITING sorted shards, which is what the result feeds
    * (`write.partitionBy(shard)` with `sortWithinPartitions(pos)`).
    * Choose nShards so a shard fits one task (corpus/nShards ≈ a few
    * hundred MB); the per-shard sort is the contract, not an accident —
    * a global row_number would be one task sorting the corpus. */
  def shuffleDeterministic(df: DataFrame, idCol: String, nShards: Int,
                           seed: String = "t0"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", graft.functions.GraftFunctions.fnv64(
        concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  /** Epoch materialization — the step that turns mixture weights into an
    * actual training corpus: each row repeats `epochs(domain)` times, with
    * the fractional part decided by a DETERMINISTIC per-row hash coin
    * (`pmod(fnv64(key), 10⁶) < frac·10⁶`), so de×2.5 yields 2 copies of
    * every German doc plus a 3rd for a reproducible half of them, and
    * zh×0.4 is deterministic subsampling (0 full copies, coin keeps 40 %).
    * Domains absent from `epochs` drop — the spec is exhaustive.
    *
    * Output: input columns + `epochCol` (1..copies). (key, epoch) is a
    * stable identity for downstream shard shuffling — hash it to spread
    * repeats across shards.
    *
    * Scale shape: one scan, a per-row when-chain + generator, NO shuffle
    * and no driver state; reproducible across reruns/engines/partitionings
    * (the [[splitByHash]] argument — a seeded random upsample would
    * scatter copies differently every run). */
  def materializeEpochs(df: DataFrame, domainCol: String, keyCol: String,
                        epochs: Map[String, Double],
                        epochCol: String = "epoch"): DataFrame = {
    require(epochs.nonEmpty, "epochs must name at least one domain")
    require(epochs.values.forall(e => e >= 0 && e.isFinite),
      s"epoch factors must be finite and >= 0: $epochs")
    val full = epochs.map { case (d, e) => d -> math.floor(e).toInt }
    // fractional parts scaled to the 10⁶ coin space, rounded ONCE on the
    // driver so both engines compare against the same integer
    val frac = epochs.map { case (d, e) =>
      d -> math.round((e - math.floor(e)) * 1e6)
    }
    val coin = pmod(graft.functions.GraftFunctions.fnv64(
      col(keyCol).cast("string")), lit(1000000L))
    val copies = (element_at(typedLit(full), col(domainCol)) +
      when(coin < element_at(typedLit(frac), col(domainCol)), 1).otherwise(0))
      .as("_copies")
    df.filter(col(domainCol).isin(epochs.keys.toSeq: _*))
      .withColumn("_copies", copies)
      .filter(col("_copies") >= 1)
      .withColumn(epochCol, explode(sequence(lit(1), col("_copies"))))
      .drop("_copies")
  }
}
