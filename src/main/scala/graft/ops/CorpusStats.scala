package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.GraftFunctions._

/** Corpus-level monitoring metrics — the numbers a training-data pipeline
  * tracks BETWEEN runs (is this snapshot more repetitive / less diverse /
  * drifted vs the last one?), as distinct from the per-document scores in
  * [[Selection]] and [[TextAnalysis]]. Both operators return one (or a
  * handful of) rows from a single distributed pass, and both do their
  * accumulation in exact integer space so the result is identical across
  * engines, partitionings, and reruns — the property every oracle in this
  * repo leans on, applied to metrics whose naive formulation (double sums
  * over millions of rows) is order-dependent.
  */
object CorpusStats {

  /** Mean pairwise cosine similarity across ALL n·(n−1) ordered pairs of
    * the corpus — without materializing a single pair. Identity: with
    * normalized vectors v̂, Σ_{i≠j} cos(v_i,v_j) = ‖Σv̂‖² − Σ‖v̂‖², so one
    * pass accumulating per-dimension sums is enough: O(n·d) work, no join,
    * no n² anywhere. Low mean similarity = diverse corpus; a climbing
    * value between snapshots flags template/boilerplate creep that
    * per-document dedup scores miss. Output: (n, dim, avg_pairwise_cos).
    *
    * Exactness: each normalized coordinate quantizes to round(v̂_d·10⁶)
    * (a LONG), so the per-dimension sums S_d and self-energy Σq² are
    * exact integers; ‖Σ‖² recombines as DECIMAL(38,0) — the metric is
    * bit-identical across engines/partitionings, defined on the
    * 10⁻⁶-quantized unit sphere (bias ≤ ~10⁻⁵, shared by both engines).
    *
    * Scale shape: the only exchange carries d partial-sum rows per input
    * partition (map-side combined) — bytes, not vectors; the final
    * combine over d rows is a scalar job. */
  def corpusDiversity(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val qd = df
      .select(v.as("_v"), sqrt(dot_product(v, v)).as("_nm"))
      // a zero vector has no direction: excluding it is the only defined
      // semantics (0/0 per coordinate would otherwise NaN-poison the one
      // global output row)
      .filter(col("_nm") > 0)
      .select(posexplode(col("_v")).as(Seq("_i", "_x")), col("_nm"))
      .select(col("_i"),
        round(col("_x") / col("_nm") * lit(1e6)).cast("long").as("_q"))
    val dims = qd.groupBy(col("_i"))
      .agg(sum(col("_q")).as("_s"),
        sum((col("_q").cast(DecimalType(38, 0))
          * col("_q").cast(DecimalType(38, 0)))).as("_self"),
        count(lit(1)).as("_cnt"))
    // n rides out of the same pass (every dimension row-counts the same
    // corpus) — a separate df.count() would re-execute the input lineage
    dims.agg(
        sum(col("_s").cast(DecimalType(38, 0)) * col("_s").cast(DecimalType(38, 0)))
          .as("_ss"),
        sum(col("_self")).as("_selfss"),
        count(lit(1)).cast("int").as("dim"),
        max(col("_cnt")).as("n"))
      .select(col("n"), col("dim"),
        round((col("_ss").cast("double") - col("_selfss").cast("double"))
          / lit(1e12)
          / nullif(col("n").cast("double") * (col("n").cast("double") - lit(1.0)),
            lit(0.0)), 6)
          .as("avg_pairwise_cos"))
  }

  /** Per-group z-scores over an INTEGRAL value column — the "drop length
    * outliers per domain" gate (a 2-character doc and a 2 MB doc are both
    * suspect, but what counts as extreme differs by language/source).
    * Output: input group/value plus (mu, sigma, z); population σ from the
    * exact integer moment sums Σx and Σx², so μ/σ/z are bit-identical
    * across engines and partitionings. Single-value groups (σ = 0) get a
    * NULL z — there is no deviation scale to score against.
    *
    * Scale shape: one map-side-combined aggregate to a \|groups\|-row
    * stats table, broadcast back; z is then a per-row projection. */
  def zScores(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    require({
        import org.apache.spark.sql.types._
        Seq(LongType, IntegerType, ShortType, ByteType)
          .contains(df.schema(valueCol).dataType)
      },
      s"valueCol '$valueCol' must be integral — exact moment sums are what " +
        s"make z cross-engine-reproducible: ${df.schema(valueCol).dataType}")
    val v = col(valueCol).cast("long")
    // moment sums in DECIMAL(38,0), not LONG: Σx² over 10⁷ docs of ~10⁶
    // chars is ~10¹⁹ — past 2⁶³, where the non-ANSI LONG sum would wrap
    // silently while the oracle's HUGEINT keeps going (same discipline as
    // corpusDiversity/vocabKl above)
    val vd = v.cast(DecimalType(38, 0))
    val st = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(vd).as("_sx"), sum(vd * vd).as("_sxx"))
      .select(col(groupCol),
        (col("_sx").cast("double") / col("_n")).as("mu"),
        sqrt(col("_sxx").cast("double") / col("_n")
          - (col("_sx").cast("double") / col("_n"))
          * (col("_sx").cast("double") / col("_n"))).as("sigma"))
    df.join(broadcast(st), Seq(groupCol))
      .withColumn("z",
        (v.cast("double") - col("mu")) / nullif(col("sigma"), lit(0.0)))
  }

  /** Equi-DEPTH histogram: `k` buckets holding ~equal row counts, split at
    * the 1/k..(k−1)/k percentile boundaries — the profiling companion to an
    * equi-width histogram (which starves on skewed distributions: one hot
    * bucket, many empty). Output: (bucket, n, lo, hi) with bucket 0-based;
    * boundary ties land in the lower bucket. Boundaries round to 6
    * decimals so the bucket predicate is engine-stable.
    *
    * Boundaries come from `approx_percentile` (Greenwald–Khanna sketch,
    * bounded memory per partial), NOT exact `percentile`: the exact
    * aggregation buffers every distinct value of the column in one
    * aggregation buffer — the unbounded-memory shape this operator must
    * not have at corpus scale. The sketch's contract is a rank error of
    * ≤ n/`accuracy` per boundary, so every bucket's depth is within
    * 2·n/`accuracy` rows of the ideal n/k — at the default accuracy
    * 10 000 that is 0.02 % of the corpus per boundary, far inside any
    * profiling use. The [[graft.SparkEntry]] oracle states exactly this
    * contract (the `q_percentile_approx` validation-aggregate pattern).
    *
    * Scale shape: one sketch aggregate produces the (k−1)-element
    * boundary row, broadcast back; bucketing is a per-row HOF count over
    * that array and the final count is an ordinary k-row aggregate. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, k: Int,
                         accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"need at least 2 buckets: $k")
    val qs = (1 until k).map(i => i.toDouble / k).mkString(",")
    val bounds = df.agg(expr(
      s"transform(approx_percentile(`$valueCol`, array($qs), $accuracy), " +
        "x -> round(x, 6))").as("_b"))
    df.crossJoin(broadcast(bounds))
      .select(col(valueCol).as("_v"),
        size(filter(col("_b"), b => b < col(valueCol))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("_v")), 6).as("lo"), round(max(col("_v")), 6).as("hi"))
  }

  /** Corpus snapshot diff — what changed between two versions of a table:
    * per id, `added` (only in v2), `removed` (only in v1), `changed`
    * (present in both, normalized content key differs), or `unchanged`.
    * The audit every pipeline wants between crawl refreshes before
    * re-running the expensive downstream stages. Output:
    * (idCol, status STRING).
    *
    * Scale shape: content hashes computed map-side on each version; the
    * full-outer join exchanges 16-byte (id, hash) rows — document bodies
    * never shuffle. */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def keyed(df: DataFrame, hashName: String) = df.select(
      col(idCol), Dedup.contentKey(col(textCol)).as(hashName))
    keyed(v1, "_h1").join(keyed(v2, "_h2")
        .withColumnRenamed(idCol, "_id2"),
        col(idCol) === col("_id2"), "full_outer")
      .select(coalesce(col(idCol), col("_id2")).as(idCol),
        when(col(idCol).isNull, "added")
          .when(col("_id2").isNull, "removed")
          .when(col("_h1") <=> col("_h2"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Unigram-distribution KL divergence KL(P‖Q) between two sub-corpora —
    * the drift monitor between a target slice and the rest (or between two
    * corpus snapshots): 0 = identical token distributions, growing values
    * flag vocabulary shift before it shows up in eval loss. Add-1
    * smoothing over the JOINT vocabulary keeps every term finite.
    * `pPred` selects the P side; rows are P where true, Q where false.
    * Output: (n_vocab, p_tokens, q_tokens, kl_nats).
    *
    * Exactness: per-word ln p and ln q quantize to round(ln·10⁶) LONGs;
    * the sum Σ (c_p+1)·(L_p − L_q) is exact integer arithmetic, and the
    * final division by the smoothed P mass rounds once in integer
    * micro-units (the [[Selection.bigramLogProb]] half-case discipline).
    *
    * Scale shape: one token-grain explode feeds one vocab-grain count
    * aggregation (map-side combined); everything after operates on the
    * vocab-bounded count table. */
  def vocabKl(df: DataFrame, textCol: String,
              pPred: org.apache.spark.sql.Column): DataFrame = {
    val ex = df.select(pPred.as("_p"),
      explode(Dedup.tokens(col(textCol))).as("_w"))
    // vocab-bounded stage boundary (lazy checkpoint): two consumers below
    // — without it the token-grain explode + count aggregation would run
    // twice, once for the totals and once for the scoring pass
    val counts = ex.groupBy(col("_w"))
      .agg(sum(when(col("_p"), 1L).otherwise(0L)).as("_cp"),
        sum(when(col("_p"), 0L).otherwise(1L)).as("_cq"))
      .localCheckpoint(false)
    klFromJointCounts(counts)
  }

  /** Per-slice vocabulary count table — the drift-monitoring member of
    * the additive-artifact family (bm25Stats row, band table, HLL
    * sketches): a standing pipeline materializes ONE (word, cnt) table
    * per ingested slice or snapshot (counts are additive —
    * [[mergeVocabCounts]] collapses appended slices exactly), and any two
    * snapshots compare by [[vocabKlFromCounts]] over their vocab-bounded
    * tables alone — the corpora themselves are never rescanned. */
  def vocabCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Collapse appended per-slice count tables into the current snapshot —
    * exact, counts are additive over disjoint slices. */
  def mergeVocabCounts(counts: DataFrame): DataFrame =
    counts.groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))

  /** [[vocabKl]] from two MATERIALIZED count tables ([[vocabCounts]]) —
    * identical math and output (full-outer join supplies the zero counts
    * the one-pass predicate form produces implicitly), so
    * `vocabKlFromCounts(vocabCounts(p), vocabCounts(q)) ≡ vocabKl(p ∪ q)`
    * bit-for-bit; cost is vocab-bounded, not corpus-bounded. */
  def vocabKlFromCounts(p: DataFrame, q: DataFrame): DataFrame =
    klFromJointCounts(
      p.select(col("word").as("_w"), col("cnt").as("_cp"))
        .join(q.select(col("word").as("_w"), col("cnt").as("_cq")),
          Seq("_w"), "full_outer")
        .select(col("_w"), coalesce(col("_cp"), lit(0L)).as("_cp"),
          coalesce(col("_cq"), lit(0L)).as("_cq"))
        .localCheckpoint(false))

  /** Shared KL tail over a joint (_w, _cp, _cq) count table. */
  private def klFromJointCounts(counts: DataFrame): DataFrame = {
    // totals via a partial-aggregated pass + broadcast — an unpartitioned
    // window here would funnel the entire vocab table through ONE task,
    // the single-partition shape this metric exists at web scale to avoid
    val totals = counts.agg(count(lit(1)).as("_v"),
      sum(col("_cp")).as("_tp"), sum(col("_cq")).as("_tq"))
    counts
      .crossJoin(broadcast(totals))
      .select(col("_v"), col("_tp"), col("_tq"),
        // DECIMAL product: count × ln-micro reaches ~10¹⁹ at web scale —
        // past LONG, comfortably inside DECIMAL(38)
        ((col("_cp") + lit(1L)).cast(DecimalType(38, 0)) *
          (round(log((col("_cp").cast("double") + lit(1.0))
              / (col("_tp").cast("double") + col("_v").cast("double"))) * lit(1e6))
            .cast("long")
            - round(log((col("_cq").cast("double") + lit(1.0))
              / (col("_tq").cast("double") + col("_v").cast("double"))) * lit(1e6))
            .cast("long")).cast(DecimalType(38, 0))).as("_t"))
      .groupBy(col("_v"), col("_tp"), col("_tq"))
      .agg(sum(col("_t")).as("_s"))
      .select(col("_v").as("n_vocab"), col("_tp").as("p_tokens"),
        col("_tq").as("q_tokens"),
        (round(col("_s").cast("double")
          / (col("_tp").cast("double") + col("_v").cast("double")))
          .cast("long").cast("double") / lit(1e6)).as("kl_nats"))
  }

  /** Jensen–Shannon divergence between two sub-corpora's unigram
    * distributions — [[vocabKl]]'s SYMMETRIC, BOUNDED sibling (0 ≤ JS ≤
    * ln 2): the drift metric to publish on a dashboard, because unlike KL
    * it doesn't explode when one side has mass the other lacks and it
    * doesn't change when you swap "base" and "current". Same add-1
    * smoothing over the joint vocabulary, same predicate split.
    *
    * Exactness (the [[vocabKl]] micro-log discipline, per side): with
    * smoothed p_w, q_w and mixture m_w = (p_w + q_w)/2, ln p_w, ln q_w,
    * ln m_w quantize to round(ln·10⁶) LONGs; Σ(c_p+1)·(L_p − L_m) and
    * Σ(c_q+1)·(L_q − L_m) are exact DECIMAL(38) integer sums; each
    * divides once by its smoothed mass in integer micro-units and the
    * final JS = (half_p + half_q)/2 is one fixed-shape step. Output:
    * (n_vocab, p_tokens, q_tokens, js_nats).
    *
    * Scale shape: identical to vocabKl — token-grain explode into a
    * vocab-bounded count table; everything after is vocab-grain. */
  def vocabJs(df: DataFrame, textCol: String,
              pPred: org.apache.spark.sql.Column): DataFrame = {
    val ex = df.select(pPred.as("_p"),
      explode(Dedup.tokens(col(textCol))).as("_w"))
    val counts = ex.groupBy(col("_w"))
      .agg(sum(when(col("_p"), 1L).otherwise(0L)).as("_cp"),
        sum(when(col("_p"), 0L).otherwise(1L)).as("_cq"))
      .localCheckpoint(false)
    jsFromJointCounts(counts)
  }

  /** [[vocabJs]] from two MATERIALIZED count tables ([[vocabCounts]]) —
    * the standing-artifact form; identical math and output. */
  def vocabJsFromCounts(p: DataFrame, q: DataFrame): DataFrame =
    jsFromJointCounts(
      p.select(col("word").as("_w"), col("cnt").as("_cp"))
        .join(q.select(col("word").as("_w"), col("cnt").as("_cq")),
          Seq("_w"), "full_outer")
        .select(col("_w"), coalesce(col("_cp"), lit(0L)).as("_cp"),
          coalesce(col("_cq"), lit(0L)).as("_cq"))
        .localCheckpoint(false))

  /** Shared JS tail over a joint (_w, _cp, _cq) count table. */
  private def jsFromJointCounts(counts: DataFrame): DataFrame = {
    val totals = counts.agg(count(lit(1)).as("_v"),
      sum(col("_cp")).as("_tp"), sum(col("_cq")).as("_tq"))
    def micLog(c: Column): Column =
      round(log(c) * lit(1e6)).cast("long")
    val pw = (col("_cp").cast("double") + lit(1.0))
    val qw = (col("_cq").cast("double") + lit(1.0))
    val tp = (col("_tp").cast("double") + col("_v").cast("double"))
    val tq = (col("_tq").cast("double") + col("_v").cast("double"))
    val lp = micLog(pw / tp)
    val lq = micLog(qw / tq)
    val lm = micLog((pw / tp + qw / tq) / lit(2.0))
    counts
      .crossJoin(broadcast(totals))
      .select(col("_v"), col("_tp"), col("_tq"),
        ((col("_cp") + lit(1L)).cast(DecimalType(38, 0)) *
          (lp - lm).cast(DecimalType(38, 0))).as("_sp"),
        ((col("_cq") + lit(1L)).cast(DecimalType(38, 0)) *
          (lq - lm).cast(DecimalType(38, 0))).as("_sq"))
      .groupBy(col("_v"), col("_tp"), col("_tq"))
      .agg(sum(col("_sp")).as("_ssp"), sum(col("_sq")).as("_ssq"))
      .select(col("_v").as("n_vocab"), col("_tp").as("p_tokens"),
        col("_tq").as("q_tokens"),
        ((round(col("_ssp").cast("double")
            / (col("_tp").cast("double") + col("_v").cast("double")))
            .cast("long").cast("double")
          + round(col("_ssq").cast("double")
            / (col("_tq").cast("double") + col("_v").cast("double")))
            .cast("long").cast("double")) / lit(2e6)).as("js_nats"))
  }

  /** Per-slice mergeable distinct-count sketches (Apache DataSketches HLL,
    * Spark's built-in `hll_sketch_agg`) — the cardinality analogue of the
    * additive [[graft.ops.Retrieval.bm25Stats]] row and the
    * [[graft.ops.Dedup.minhashBandTable]] artifact: a standing pipeline
    * keeps ONE small binary sketch per ingested slice (per batch, day, or
    * shard) and answers "how many distinct values corpus-wide?" by
    * UNIONING sketches ([[distinctFromSketches]]) — never re-scanning
    * history. HLL union is register-LOSSLESS at equal lgK (register-wise
    * max ≡ the single-pass sketch's registers); the ESTIMATE can still
    * differ from a single global build by a few counts in dense mode
    * because DataSketches applies its HIP estimator to streamed sketches
    * but the composite estimator after a union — both sit inside the same
    * lgK error envelope of the true cardinality, which is the contract the
    * oracle pins. Output: one (sliceCol, sketch BINARY) row per slice. */
  def distinctSketches(df: DataFrame, valueCol: String, sliceCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(sliceCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Union per-slice sketches to the corpus-wide distinct estimate: one
    * row (n_estimate LONG). Work is O(slices · 2^lgK) — independent of
    * corpus size, the point of keeping sketches. */
  def distinctFromSketches(sketches: DataFrame,
                           sketchCol: String = "sketch"): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("n_estimate"))

  /** Per-slice mergeable QUANTILE sketches (DataSketches KLL via
    * [[graft.functions.KllSketchAgg]]) — the rank/percentile member of the
    * additive-artifact family, exactly parallel to [[distinctSketches]]:
    * one small binary sketch per slice, kept as batches land, so
    * "corpus-wide p95 of this score" is a union over sketch rows
    * ([[quantilesFromSketches]]) — history is never re-scanned. KLL union
    * runs the same compaction as the streamed build, so the merged sketch
    * carries the single-build normalized rank-error guarantee at equal
    * `k` (ε ≈ 1.65 % at k = 200, 99 % conf). Output: (sliceCol, sketch
    * BINARY). */
  def quantileSketches(df: DataFrame, valueCol: String, sliceCol: String,
                       k: Int = 200): DataFrame =
    df.groupBy(col(sliceCol))
      .agg(graft.functions.KllExpressions
        .kllSketchAgg(col(valueCol).cast("double"), k).as("sketch"))

  /** EXACT interpolated quantiles (the `quantile_cont` / Spark
    * `percentile` convention: q = (⌈h⌉−h)·lo + (h−⌊h⌋)·hi at
    * h = (n−1)·p over the ascending order statistics — IEEE-identical
    * operation order to Spark's own aggregate, so results hash-match
    * engines using the standard formula) via distributed sort +
    * partition-offset selection.
    *
    * Spark's built-in `percentile` buffers every value of a group in an
    * OpenHashMap with BOXED keys — measured 1.9 s for one 600k-row group
    * where this whole op takes ~0.4 s. Here: range-partition + local
    * sort (the only corpus-scale work), ONE counting pass fixes each
    * partition's global offset (driver traffic: numPartitions longs),
    * and the selection pass touches only the partitions holding the
    * ≤ 2·|ps| target order statistics, stopping at the last needed local
    * index. No group buffer, no boxing; memory per task is the sort
    * spill's, so the op survives any corpus size.
    *
    * `countAtOrBelow`: optional thresholds folded into the counting pass
    * for free — returns, per threshold v, the exact number of rows ≤ v
    * (the sketch-rank verification companion; saves its own scan).
    * Returns (quantiles aligned with `ps`, counts aligned with
    * `countAtOrBelow`) as driver values — a bounded artifact (|ps| + |t|
    * doubles), the collected-centroids convention. Nulls are excluded,
    * matching both engines' aggregate semantics. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                     countAtOrBelow: Seq[Double] = Nil,
                     partitions: Int = 0): (Seq[Double], Seq[Long]) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"ranks must be in [0,1]: $ps")
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.select(col(valueCol).cast("double").as("_x"))
      .where(col("_x").isNotNull)
      .repartitionByRange(nPart, col("_x"))
      .sortWithinPartitions("_x")
    val rdd = sorted.rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val thr = countAtOrBelow.toArray
      val stats = rdd.mapPartitionsWithIndex { (i, it) =>
        var n = 0L
        val le = new Array[Long](thr.length)
        while (it.hasNext) {
          val v = it.next(); n += 1
          var j = 0
          while (j < thr.length) { if (v <= thr(j)) le(j) += 1; j += 1 }
        }
        Iterator((i, n, le))
      }.collect().sortBy(_._1)
      val sizes = stats.map(_._2)
      val leTotals = countAtOrBelow.indices.map(j => stats.map(_._3(j)).sum)
      val n = sizes.sum
      require(n > 0, "exactQuantiles over an empty input")
      val offsets = sizes.scanLeft(0L)(_ + _)
      val need = ps.flatMap { p =>
        val h = (n - 1) * p
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }.distinct.sorted.toArray
      val found = rdd.mapPartitionsWithIndex { (i, it) =>
        val want = need.filter(ix => ix >= offsets(i) && ix < offsets(i) + sizes(i))
        if (want.isEmpty) Iterator.empty
        else {
          val res = new scala.collection.mutable.ArrayBuffer[(Long, Double)](want.length)
          var idx = offsets(i); var wi = 0
          while (it.hasNext && wi < want.length) {
            val v = it.next()
            if (idx == want(wi)) { res += ((idx, v)); wi += 1 }
            idx += 1
          }
          res.iterator
        }
      }.collect().toMap
      // Spark Percentile.getPercentile's exact two-sided interpolation,
      // operation-order included: (⌈h⌉−h)·lo + (h−⌊h⌋)·hi, lower==higher
      // short-circuits to the value itself
      val qs = ps.map { p =>
        val h = (n - 1) * p
        val lo = math.floor(h).toLong; val hi = math.ceil(h).toLong
        if (lo == hi) found(lo)
        else (hi - h) * found(lo) + (h - lo) * found(hi)
      }
      (qs, leTotals)
    } finally { rdd.unpersist(false); () }
  }

  /** Vocabulary COVERAGE CURVE — the tokenizer-sizing question: how many
    * vocabulary entries (most-frequent-first, count-desc word-asc
    * deterministic order) cover p of the corpus token mass? The smallest
    * prefix whose cumulative count reaches p·total, per requested p —
    * exact integers throughout (the crossing compare is LONG cum vs the
    * engine-identical p·total double).
    *
    * Scale note: the ranking window runs on the VOCAB grain (the
    * corpus collapses in the one vocabCounts pass), so the single-order
    * window is vocab-bounded — the paretoFront collapsed-grain stance —
    * never corpus-bounded. Output: (p, vocab_size, covered_tokens,
    * total_tokens). */
  def vocabCoverage(counts: DataFrame, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"ranks must be in (0,1]: $ps")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("cnt").desc, col("word"))
    val ranked = counts
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    val total = counts.agg(sum(col("cnt"))).head.getLong(0)
    ranked.crossJoin(
        broadcast(counts.sparkSession.createDataFrame(ps.map(Tuple1(_))).toDF("p")))
      .filter(col("cum") >= col("p") * lit(total.toDouble))
      .groupBy(col("p"))
      .agg(min(col("rn")).as("vocab_size"),
        min(col("cum")).as("covered_tokens"))
      .withColumn("total_tokens", lit(total))
  }

  /** Population Stability Index — THE production drift monitor for a
    * numeric feature between a baseline corpus and a new batch:
    * PSI = Σᵢ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over the BASELINE's equal-frequency
    * buckets (boundaries from ONE [[exactQuantiles]] pass, rounded — the
    * reusable artifact [[assignByBounds]] scores any later batch
    * against). Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted. Laplace (+1) smoothing keeps empty buckets finite, the
    * vocabKl convention.
    *
    * Cross-engine: bucket counts are exact integers from an exact-integer
    * assignment (round-6 cut points, ties low), the per-bucket fractions
    * are identical rationals cast to double, and only ≤ nBuckets+1
    * ln/multiply/add steps run in floating point before round-6.
    * Output: (bucket, n_base, n_cur, contrib) per bucket plus the total
    * as bucket 0 with contrib = PSI. */
  def psi(base: DataFrame, cur: DataFrame, valueCol: String,
          nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be ≥ 2: $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val (qs, _) = exactQuantiles(base, valueCol, ps)
    val bounds = qs.map(q => BigDecimal(q)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    psiFromCounts(bucketCounts(base, valueCol, bounds),
      bucketCounts(cur, valueCol, bounds), nBuckets)
  }

  /** The ADDITIVE ARTIFACT behind [[psi]]: per-bucket counts against a
    * fixed cut-point list — a standing pipeline keeps one (bucket, cnt)
    * table per ingested slice ([[mergeBucketCounts]] folds them exactly,
    * counts are additive over disjoint slices) and drift against any
    * baseline is answered from the artifacts alone, never rescanning
    * corpora — the dailyCounts / vocabCounts lifecycle. */
  def bucketCounts(df: DataFrame, valueCol: String,
                   bounds: Seq[Double]): DataFrame =
    assignByBounds(df.where(col(valueCol).isNotNull), valueCol, bounds)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Fold accumulated bucket-count slices — a plain keyed sum. */
  def mergeBucketCounts(slices: DataFrame): DataFrame =
    slices.groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** [[psi]] from two prebuilt (bucket, cnt) tables. Counts are joined
    * onto an EXPLICIT 1..nBuckets spine (the benfordAudit pattern), so a
    * bucket empty on BOTH sides still contributes its nonzero smoothed
    * term — the add-1 definition holds even under heavy baseline ties. */
  def psiFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
                    nBuckets: Int): DataFrame = {
    val spine = baseCounts.sparkSession.range(1, nBuckets + 1)
      .select(col("id").cast("int").as("bucket"))
    val joint = spine
      .join(baseCounts.select(col("bucket"), col("cnt").as("n_base")),
        Seq("bucket"), "left_outer")
      .join(curCounts.select(col("bucket"), col("cnt").as("n_cur")),
        Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      // nBuckets-row artifact pinned eagerly: the totals .head, the
      // per-bucket frame and the PSI union otherwise each replay both
      // corpus-sized bucket-count scans (3× each side)
      .localCheckpoint(true)
    val t = joint.agg(sum(col("n_base")), sum(col("n_cur"))).head
    val (nb, nc) = (t.getLong(0), t.getLong(1))
    val p = (col("n_base") + 1).cast("double") / lit((nb + nBuckets).toDouble)
    val q = (col("n_cur") + 1).cast("double") / lit((nc + nBuckets).toDouble)
    val perBucket = joint
      .withColumn("contrib", round((p - q) * (log(p) - log(q)), 6))
    perBucket.unionByName(
      perBucket.agg(lit(0).as("bucket"),
        sum(col("n_base")).as("n_base"), sum(col("n_cur")).as("n_cur"),
        round(sum((p - q) * (log(p) - log(q))), 6).as("contrib")))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the DISTRIBUTION-SHAPE
    * drift test next to [[psi]]'s binned divergence: D = max_x
    * |F_a(x) − F_b(x)| over the pooled empirical CDFs, sensitive to ANY
    * shape change (location, spread, tails) without choosing buckets.
    * The classic pre-/post-deploy feature-drift gate.
    *
    * Exactness: both samples collapse to the shared DISTINCT-VALUE grain
    * (the [[giniConcentration]] convention — pre-quantize a continuous
    * column to a grid if its value grain is unbounded), cumulative counts
    * come from one ordered window over that grain, and the maximized
    * quantity is the INTEGER cross-product |c_a·n_b − c_b·n_a| in
    * DECIMAL(38) — the max is found in exact arithmetic; one double
    * division + round-6 at the very end. Output: (n_a, n_b, ks).
    *
    * Scale shape: one map-side-combined aggregate to value grain, one
    * ordered window over the collapsed grain (value-grain-sized, not
    * row-grain), one 1-row reduce. */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = a.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("_v"), lit(1L).as("_ma"), lit(0L).as("_mb"))
      .unionByName(b.where(col(valueCol).isNotNull)
        .select(col(valueCol).as("_v"), lit(0L).as("_ma"), lit(1L).as("_mb")))
      .groupBy(col("_v"))
      .agg(sum(col("_ma")).as("_ma"), sum(col("_mb")).as("_mb"))
    val wCum = W.orderBy(col("_v")).rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.orderBy(col("_v"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    grain
      .select(sum(col("_ma")).over(wCum).as("_ca"),
        sum(col("_mb")).over(wCum).as("_cb"),
        sum(col("_ma")).over(wAll).as("_na"),
        sum(col("_mb")).over(wAll).as("_nb"))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        max(abs(big(col("_ca")) * big(col("_nb"))
          - big(col("_cb")) * big(col("_na")))).as("_d"))
      .select(col("n_a"), col("n_b"),
        round(col("_d").cast("double")
          / (big(col("n_a")) * big(col("n_b"))).cast("double"), 6).as("ks"))
  }

  /** Per-group one-vs-rest Kolmogorov–Smirnov — [[ksStatistic]] run for
    * EVERY group against its complement in one pass: "which sources'
    * value distributions diverge from everything else", the fan-out form
    * the per-source drift dashboard wants (feed the p-values to
    * [[bhAdjust]] for an FDR-controlled reject set).
    *
    * Exactness: the value grain carries global cumulative counts c(v);
    * the dense (group × value) frame (both grains COLLAPSED and bounded —
    * D must be evaluated at every pooled value, including values the
    * group never takes) carries per-group cumulatives c_g(v); D's
    * numerator max|c_g·n_b − (c − c_g)·n_g| is maximized in exact
    * DECIMAL(38). The asymptotic two-sample p-value
    * min(1, 2·exp(−2·D²·n_a·n_b/(n_a+n_b))) is one fixed-shape IEEE
    * expression, micro-rounded. Groups with an empty complement (one
    * group total) yield null ks/p.
    *
    * Scale shape: one (group, value)-grain aggregate + one value-grain
    * aggregate, a |groups|×|values| crossJoin of two broadcast-sized
    * collapsed grains, per-group ordered windows over that frame, one
    * group-grain reduce. Output: (group, n_a, n_b, ks, p_micro). */
  def ksStatisticBy(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame =
    ksStatisticByFromCounts(
      valueCountSlice(df, groupCol, valueCol), groupCol, valueCol, "cnt")

  /** The per-batch ADDITIVE ARTIFACT behind [[ksStatisticByFromCounts]]:
    * one (group, value, cnt) slice at the collapsed value grain — counts
    * are additive over disjoint slices, so a standing pipeline appends
    * one slice per ingested micro-batch and answers the per-source drift
    * dashboard from the accumulated slices alone, never rescanning
    * corpora (the [[bucketCounts]]/[[mergeBucketCounts]] lifecycle at
    * value grain, for the bucket-free KS test). */
  def valueCountSlice(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame =
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))

  /** [[ksStatisticBy]] from prebuilt (group, value, cnt) rows. Slices
    * need NOT be pre-merged: the first aggregate folds repeated
    * (group, value) rows exactly, so accumulated [[valueCountSlice]]
    * appends feed straight in — the streaming drift monitor's read path.
    * Everything downstream of that fold is identical to the raw-row
    * form: same dense frame, same DECIMAL(38) max, same p-value. */
  def ksStatisticByFromCounts(counts: DataFrame, groupCol: String,
                              valueCol: String, cntCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    // value×group collapsed grain with FOUR consumers below (vals, groups,
    // tot, dense) — pin it lazily so the corpus-sized slice aggregation
    // runs once per action, not four times
    val gv = counts
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"),
        col(cntCol).cast("long").as("_cnt"))
      .groupBy(col("_g"), col("_v")).agg(sum(col("_cnt")).as("_mg"))
      .localCheckpoint(false)
    val vals = gv.groupBy(col("_v")).agg(sum(col("_mg")).as("_m"))
      .select(col("_v"),
        sum(col("_m")).over(
          W.orderBy(col("_v")).rowsBetween(W.unboundedPreceding, 0)).as("_c"))
    val groups = gv.groupBy(col("_g")).agg(sum(col("_mg")).as("_ng"))
    val tot = gv.agg(sum(col("_mg")).as("_N"))
    val dense = vals.crossJoin(groups)
      .join(gv, Seq("_g", "_v"), "left_outer")
      .select(col("_g"), col("_v"), col("_c"), col("_ng"),
        coalesce(col("_mg"), lit(0L)).as("_mg"))
      .withColumn("_cg", sum(col("_mg")).over(
        W.partitionBy(col("_g")).orderBy(col("_v"))
          .rowsBetween(W.unboundedPreceding, 0)))
    val perGroup = dense
      .crossJoin(broadcast(tot))
      .groupBy(col("_g"), col("_ng"), col("_N"))
      .agg(max(abs(big(col("_cg")) * (big(col("_N")) - col("_ng"))
        - (big(col("_c")) - col("_cg")) * big(col("_ng")))).as("_d"))
    val na = col("_ng"); val nb = col("_N") - col("_ng")
    val ks = (col("_d").cast("double")
      / (big(na) * big(nb)).cast("double"))
    val p = least(lit(1.0), lit(2.0) * exp(lit(-2.0) * ks * ks
      * (big(na) * big(nb)).cast("double") / col("_N").cast("double")))
    perGroup.select(col("_g").as(groupCol), na.as("n_a"), nb.as("n_b"),
      when(nb === 0, lit(null).cast("double")).otherwise(round(ks, 6))
        .as("ks"),
      when(nb === 0, lit(null).cast("long"))
        .otherwise(round(p * lit(1e6)).cast("long")).as("p_micro"))
  }

  /** Benjamini–Hochberg step-up FDR adjustment — turn a table of
    * per-hypothesis p-values (one per source/segment, e.g. from
    * [[ksStatisticBy]]) into an FDR-α-controlled reject set plus
    * adjusted p-values: the multiple-testing guard without which a
    * 50-source drift dashboard "finds" 2-3 drifting sources by chance
    * every refresh.
    *
    * p-values arrive as micro-integers (the engine-reproducibility
    * contract). Ranks are assigned by (p_micro, key) — a total order.
    * The reject rule p_(i) ≤ i·α/m is evaluated as the EXACT integer
    * comparison p_micro·m ≤ i·α_micro; the largest passing rank k*
    * rejects ranks 1..k* (step-up). Adjusted p: raw_i = round(p_micro·m
    * / i) (one IEEE divide on exact longs), then a running MIN over
    * ranks ≥ i (integer min over the suffix window), clamped at 1.
    *
    * Scale: the hypothesis table is group-grain (tens to thousands of
    * rows); one global sort window over it is the algorithm's floor.
    * Output: (key, p, p_adj, rejected). */
  def bhAdjust(pvals: DataFrame, keyCol: String, pMicroCol: String,
               alphaMicro: Long = 50000L): DataFrame = {
    require(alphaMicro > 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6]: $alphaMicro")
    val W = org.apache.spark.sql.expressions.Window
    val base = pvals
      .where(col(keyCol).isNotNull && col(pMicroCol).isNotNull)
      .select(col(keyCol).as("_k"), col(pMicroCol).cast("long").as("_p"))
    val m = base.agg(count(lit(1)).as("_m"))
    val ranked = base.crossJoin(broadcast(m))
      .withColumn("_i", row_number().over(
        W.orderBy(col("_p"), col("_k"))))
      .withColumn("_pass", col("_p") * col("_m") <= col("_i") * lit(alphaMicro))
      .withColumn("_kstar", max(when(col("_pass"), col("_i"))).over(
        W.orderBy(col("_p"), col("_k"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("_raw", round((col("_p") * col("_m")).cast("double")
        / col("_i").cast("double")).cast("long"))
      .withColumn("_adj", least(lit(1000000L),
        min(col("_raw")).over(W.orderBy(col("_p"), col("_k"))
          .rowsBetween(W.currentRow, W.unboundedFollowing))))
    ranked.select(col("_k").as(keyCol),
      round(col("_p").cast("double") / 1e6, 6).as("p"),
      round(col("_adj").cast("double") / 1e6, 6).as("p_adj"),
      (col("_kstar").isNotNull && col("_i") <= col("_kstar")).as("rejected"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the LOCATION-shift companion
    * to [[ksStatistic]]'s any-shape test: "does sample A tend to produce
    * larger values than sample B", robust to outliers and any monotone
    * transform. The A/B gate for skewed metrics (latencies, lengths,
    * scores) where the t-test's normality assumption is junk.
    *
    * Exactness: both samples collapse to the shared distinct-value grain;
    * DOUBLED pooled midranks 2·cum_before + m + 1 (always integer, the
    * [[spearmanCorrelation]] device) come from one ordered window over
    * that grain, so 2·R_a = Σ m_a·r2 and 2·U_a = 2·R_a − n_a(n_a+1) are
    * exact DECIMAL(38) integers, as is the tie term Σ(t³−t). The
    * normal approximation z = (U_a − n_a·n_b/2) / σ with the standard
    * tie-corrected σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))) is ONE
    * fixed-shape IEEE expression over those exact integers, evaluated
    * identically on any engine before round-6. All-tied degenerate input
    * (σ = 0) yields null z. Output: (n_a, n_b, u_a, z) with u_a exact
    * (2·U_a halved — at most one .5, exact in a double to n ≈ 2⁵²).
    *
    * Scale shape: identical to [[ksStatistic]] — one map-side-combined
    * aggregate to value grain, one ordered window over the COLLAPSED
    * grain, one 1-row reduce. */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = a.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("_v"), lit(1L).as("_ma"), lit(0L).as("_mb"))
      .unionByName(b.where(col(valueCol).isNotNull)
        .select(col(valueCol).as("_v"), lit(0L).as("_ma"), lit(1L).as("_mb")))
      .groupBy(col("_v"))
      .agg(sum(col("_ma")).as("_ma"), sum(col("_mb")).as("_mb"))
    val m = col("_ma") + col("_mb")
    val r2 = (lit(2L) * coalesce(sum(m).over(
        W.orderBy(col("_v")).rowsBetween(W.unboundedPreceding, -1)), lit(0L))
      + m + lit(1L)).as("_r2")
    val sums = grain
      .select(col("_ma"), col("_mb"), r2, (big(m) * m * m - m).as("_t3"))
      .agg(coalesce(sum(col("_ma")), lit(0L)).as("n_a"),
        coalesce(sum(col("_mb")), lit(0L)).as("n_b"),
        coalesce(sum(big(col("_ma")) * col("_r2")), big(lit(0))).as("_ra2"),
        coalesce(sum(col("_t3")), big(lit(0))).as("_ties"))
    val na = big(col("n_a")); val nb = big(col("n_b"))
    val n = na + nb
    val u2 = col("_ra2") - na * (na + 1)   // 2·U_a, exact
    val mu2 = na * nb                       // 2·μ = n_a·n_b
    val varD = (na * nb).cast("double") / 12.0
    // NB: parens are load-bearing — a leading `-` on a continuation line
    // is parsed as a new unary-minus statement, silently dropping the
    // tie-correction term
    val tieD = ((n + 1).cast("double")
      - col("_ties").cast("double") / (n * (n - 1)).cast("double"))
    val sigma = sqrt(varD * tieD)
    sums.select(col("n_a"), col("n_b"),
      (u2.cast("double") / 2.0).as("u_a"),
      when(col("n_a") === 0 || col("n_b") === 0 || sigma === 0.0,
        lit(null).cast("double"))
        .otherwise(round((u2 - mu2).cast("double") / (lit(2.0) * sigma), 6))
        .as("z"))
  }

  /** 1-D Wasserstein-1 distance (earth mover's distance) — "how much
    * work to morph distribution A into B": the MAGNITUDE-aware drift
    * measure next to [[ksStatistic]] (max ECDF gap, scale-free) and
    * [[psi]] (binned). Two distributions can have tiny KS but huge EMD
    * (a long shifted tail) — this is the stat that sees it. Standard in
    * embedding/score drift monitoring.
    *
    * W₁ = ∫|F_a − F_b| dx over an INTEGER-valued column (pre-quantize to
    * a grid — cents, micro — the ksStatistic convention): on the sorted
    * distinct-value grain, Σ_i |c_a·n_b − c_b·n_a|·(v_{i+1} − v_i) is an
    * exact DECIMAL(38) integer (bounded by n_a·n_b·range — inside 38
    * digits to n ≈ 10¹² at range 10¹²), divided once by n_a·n_b at the
    * end. Output: (n_a, n_b, emd) in the column's value units.
    *
    * Scale shape: identical to [[ksStatistic]] plus one `lead` over the
    * same collapsed-grain window. */
  def wasserstein1(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = a.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"),
        lit(1L).as("_ma"), lit(0L).as("_mb"))
      .unionByName(b.where(col(valueCol).isNotNull)
        .select(col(valueCol).cast("long").as("_v"),
          lit(0L).as("_ma"), lit(1L).as("_mb")))
      .groupBy(col("_v"))
      .agg(sum(col("_ma")).as("_ma"), sum(col("_mb")).as("_mb"))
    val wOrd = W.orderBy(col("_v"))
    val wCum = wOrd.rowsBetween(W.unboundedPreceding, 0)
    // totals as a separate 1-row aggregate so a ≤1-distinct-value input
    // (every gap null) still reports its counts with emd = 0
    val totals = grain.agg(
      coalesce(sum(col("_ma")), lit(0L)).as("n_a"),
      coalesce(sum(col("_mb")), lit(0L)).as("n_b"))
    val area = grain
      .select(sum(col("_ma")).over(wCum).as("_ca"),
        sum(col("_mb")).over(wCum).as("_cb"),
        (lead(col("_v"), 1).over(wOrd) - col("_v")).as("_gap"))
      .where(col("_gap").isNotNull)   // last grain point carries no area
      .crossJoin(broadcast(totals))
      .agg(coalesce(sum(abs(big(col("_ca")) * big(col("n_b"))
            - big(col("_cb")) * big(col("n_a")))
          * big(col("_gap"))), big(lit(0))).as("_w"))
    totals.crossJoin(broadcast(area))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
          .otherwise(round(col("_w").cast("double")
            / (big(col("n_a")) * big(col("n_b"))).cast("double"), 6))
          .as("emd"))
  }

  /** Cohen's kappa — chance-corrected agreement between two label
    * assignments over the same items (two annotators, or an annotation
    * vs a classifier): κ = (p_o − p_e)/(1 − p_e), the standard
    * label-quality gate before training on human or model-generated
    * labels (κ < 0.4 = don't trust the labels).
    *
    * Integer-exact formulation: with n items, `agree` diagonal matches,
    * and per-label marginals ra_k/rb_k, κ = (n·agree − Σ_k ra_k·rb_k) /
    * (n² − Σ_k ra_k·rb_k) — every term an exact DECIMAL(38) integer, one
    * double division + round-6 at the end. Degenerate case (both raters
    * constant on the same single label → denominator 0) yields NULL, the
    * undefined-κ convention. Rows with either label null are excluded.
    *
    * Scale shape: two label-grain aggregates + a |labels|-grain equi-join
    * for p_e and one global count-sum — nothing beyond label cardinality
    * ever shuffles. Output: (n_items, n_agree, kappa). */
  def cohenKappa(ratings: DataFrame, raterACol: String,
                 raterBCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val r = ratings
      .where(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).as("_a"), col(raterBCol).as("_b"))
    val ra = r.groupBy(col("_a")).agg(count(lit(1)).as("_na"))
    val rb = r.groupBy(col("_b")).agg(count(lit(1)).as("_nb"))
    val pe = ra.join(rb, col("_a") === col("_b"))
      .agg(coalesce(sum(big(col("_na")) * big(col("_nb"))),
        big(lit(0))).as("_pe"))
    r.agg(count(lit(1)).as("n_items"),
        coalesce(sum(when(col("_a") === col("_b"), 1L).otherwise(0L)), lit(0L))
          .as("n_agree"))
      .crossJoin(broadcast(pe))
      .select(col("n_items"), col("n_agree"),
        when(big(col("n_items")) * big(col("n_items")) === col("_pe"),
          lit(null).cast("double"))
          .otherwise(round(
            (big(col("n_items")) * big(col("n_agree")) - col("_pe"))
              .cast("double")
            / (big(col("n_items")) * big(col("n_items")) - col("_pe"))
              .cast("double"), 6)).as("kappa"))
  }

  /** DOUBLED pooled midranks (2·midrank = 2·cum_before + m + 1, always
    * integer) for every distinct value of `vCol` in `base` — computed at
    * ANY grain size, including value grains the size of the corpus
    * (prices, scores): an unpartitioned cumulative window here would
    * funnel the whole grain through ONE task, the single-partition shape
    * a 100 TB rank table cannot survive. Instead the [[exactQuantiles]]
    * partition-offset scheme: range-partition the collapsed grain, one
    * counting pass fixes each partition's global mass offset (driver
    * traffic: numPartitions longs — the bounded-collect class), and the
    * cumulative is offset + a WITHIN-partition window, P-way parallel.
    * The lazy localCheckpoint pins the range partitioning so the offset
    * pass and the window pass see identical partitions (repartitionByRange
    * samples nondeterministically across recomputes). Rank VALUES are
    * partitioning-independent, so results are bit-identical to the
    * single-window formulation. */
  private def distributedDoubledRanks(base: DataFrame, vCol: String,
                                      out: String): DataFrame =
    distributedCumCounts(
      base.groupBy(col(vCol)).agg(count(lit(1)).as("_m")), vCol)
      .select(col(vCol),
        (lit(2L) * col("_cum_before") + col("_m") + lit(1L)).as(out))

  /** Cumulative mass over a sorted (value, _m) grain table, distributed:
    * range-partition the grain, one counting pass fixes each partition's
    * global mass offset (driver traffic: numPartitions longs — the
    * bounded-collect class), cumulative = offset + a WITHIN-partition
    * window, P-way parallel. The lazy localCheckpoint pins the range
    * partitioning so the offset pass and the window pass see identical
    * partitions (repartitionByRange samples nondeterministically across
    * recomputes). Values are partitioning-independent. Output: every
    * grain column plus `_cum_before` (mass strictly below the value);
    * inclusive cumulative = `_cum_before` + `_m`. */
  private[ops] def distributedCumCounts(grains0: DataFrame,
                                        vCol: String): DataFrame = {
    val spark = grains0.sparkSession
    val W = org.apache.spark.sql.expressions.Window
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val grains = grains0
      .repartitionByRange(nPart, col(vCol).asc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val ptot = grains.groupBy(col("_pid")).agg(sum(col("_m")).as("_pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = ptot.scanLeft((0, 0L)) {
      case ((_, acc), (pid, pt)) => (pid, acc + pt)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toSeq
    import spark.implicits._
    val offDf = offsets.toDF("_pid", "_off")
    val w = W.partitionBy(col("_pid")).orderBy(col(vCol).asc)
    grains.join(broadcast(offDf), Seq("_pid"))
      .withColumn("_cum_before",
        coalesce(sum(col("_m")).over(
          w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)) + col("_off"))
      .drop("_pid", "_off")
  }

  /** Lorenz concentration curve — the decile curve BEHIND
    * [[giniConcentration]]'s scalar: "the bottom 50 % of users hold 9 %
    * of the value, the top decile holds 44 %" — the shape the gini
    * number summarizes away, and the dashboard view every whale-risk /
    * data-concentration conversation actually needs.
    *
    * Tie-exact without any per-row decile assignment: rows collapse to
    * the value grain with [[distributedCumCounts]] rank intervals
    * (partition-offset, no single-task window); decile d covers ranks
    * ((d−1)·n) div B + 1 … (d·n) div B, and each grain row contributes
    * its INTEGER rank-interval overlap × its value — tied rows straddle
    * a boundary deterministically because every unit of overlap carries
    * the same value. Counts and value sums are exact DECIMAL(38)
    * integers; shares are one divide each, round-6; the cumulative runs
    * over the B-row result. Output: (decile 1..B, n_rows, value_share,
    * cum_share) with cum_share(B) = 1.
    *
    * Scale shape: one value-grain aggregate + the partition-offset
    * cumulative + a ≤ B-per-grain-row explode; the B-row tail is free. */
  def lorenzCurve(df: DataFrame, valueCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be ≥ 2: $buckets")
    val dec38 = DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grains = distributedCumCounts(
      df.where(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_m")), "_v")
    val totals = grains.agg(
      coalesce(sum(col("_m")), lit(0L)).as("_n"),
      coalesce(sum(big(col("_v")) * col("_m")), big(lit(0))).as("_tv"))
    val contrib = grains.crossJoin(broadcast(totals))
      .select(col("_v"), col("_m"), col("_cum_before"), col("_n"), col("_tv"),
        explode(sequence(lit(1), lit(buckets))).as("decile"))
      .withColumn("_bLo", expr(s"(CAST(decile - 1 AS BIGINT) * _n) div $buckets"))
      .withColumn("_bHi", expr(s"(CAST(decile AS BIGINT) * _n) div $buckets"))
      .withColumn("_ov", greatest(lit(0L),
        least(col("_cum_before") + col("_m"), col("_bHi"))
          - greatest(col("_cum_before"), col("_bLo"))))
      .where(col("_ov") > 0)
    contrib.groupBy(col("decile"))
      .agg(max(col("_tv")).as("_tv"),
        sum(col("_ov")).as("n_rows"),
        coalesce(sum(big(col("_ov")) * col("_v")), big(lit(0))).as("_dv"))
      .select(col("decile"), col("n_rows"),
        round(col("_dv").cast("double") / col("_tv").cast("double"), 6)
          .as("value_share"),
        round(sum(col("_dv")).over(
            W.orderBy(col("decile")).rowsBetween(W.unboundedPreceding, 0))
          .cast("double") / col("_tv").cast("double"), 6).as("cum_share"))
  }

  /** Spearman rank correlation — [[exactCorrelation]]'s Pearson run on
    * midranks: monotone-association strength that outlier magnitudes and
    * nonlinear (but monotone) relationships can't distort, the robust
    * companion every metric-vs-metric eval dashboard wants next to
    * Pearson. Ties get midranks (the standard tie convention).
    *
    * Exactness: midranks are kept DOUBLED (2·midrank = 2·cum_before +
    * m + 1 — always an integer, never a .5), each column's rank table is
    * built on its distinct-value grain and joined back by value, and the
    * five Pearson sums over doubled ranks are exact DECIMAL(38) integers
    * assembled to the closed form driver-side in BigDecimal (the
    * exactCorrelation convention) — one double divide + sqrt at the end.
    * Doubled ranks ≤ 2n keep n·Σr² ≈ 4n³ inside DECIMAL(38)/HUGEINT to
    * n ≈ 10¹². Rows with a null in either column are excluded; zero
    * variance (a constant column) yields a null rho.
    *
    * Scale shape: two value-grain aggregates + ordered windows over the
    * COLLAPSED grains (the [[giniConcentration]] stance), two value-keyed
    * equi-joins back, one 1-row aggregate. Output: (n, rho). */
  def spearmanCorrelation(df: DataFrame, colA: String,
                          colB: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dec38 = DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val base = df.where(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("_x"), col(colB).as("_y"))
    // r20 §2.6: each rank table pays one driver collect (the partition-
    // offset pass inside distributedCumCounts); the x and y tables are
    // independent, so build them as CONCURRENT jobs (the
    // q_artifact_dashboard thread-pool stance) instead of serializing
    // two full scans of the input back to back.
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    import Par.{blockingFuture => bf}
    val fx = bf { distributedDoubledRanks(base, "_x", "_rx") }
    val fy = bf { distributedDoubledRanks(base, "_y", "_ry") }
    val j = base
      .join(Await.result(fx, Duration.Inf), Seq("_x"))
      .join(Await.result(fy, Duration.Inf), Seq("_y"))
    val row = j.agg(count(lit(1)).cast(dec38).as("_n"),
      sum(big(col("_rx"))).as("_sx"), sum(big(col("_ry"))).as("_sy"),
      sum(big(col("_rx")) * big(col("_rx"))).as("_qx"),
      sum(big(col("_ry")) * big(col("_ry"))).as("_qy"),
      sum(big(col("_rx")) * big(col("_ry"))).as("_pxy")).head
    val n = row.getDecimal(0)
    if (n == null || n.signum == 0)
      return Seq.empty[(Long, Option[Double])].toDF("n", "rho")
    def d(i: Int) = row.getDecimal(i)
    val da = n.multiply(d(3)).subtract(d(1).multiply(d(1)))
    val db = n.multiply(d(4)).subtract(d(2).multiply(d(2)))
    val rho =
      if (da.signum <= 0 || db.signum <= 0) None
      else {
        val num = n.multiply(d(5)).subtract(d(1).multiply(d(2)))
        Some(BigDecimal(num.doubleValue()
            / math.sqrt(da.doubleValue() * db.doubleValue()))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    Seq((n.longValueExact(), rho)).toDF("n", "rho")
  }

  /** Wilson score interval per group — the confidence interval for a
    * binomial rate that stays honest at small n and extreme p̂ (where the
    * naive normal interval collapses or escapes [0,1]): the quality-gate
    * dashboard stat for per-source pass rates. z defaults to 1.96 (95 %).
    *
    * lo/hi = (p̂ + z²/2n ∓ z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
    * Cross-engine: n and k are exact integers, and the bound is ONE
    * fixed-shape IEEE expression (shared literal z, correctly-rounded
    * sqrt) evaluated identically on any engine before round-6. One
    * group-grain aggregate; output (group, n, k, p_hat, lo, hi), rows
    * with null group or null success excluded. */
  def wilsonInterval(df: DataFrame, groupCol: String, successCol: String,
                     z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val g = df.where(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val center = p + z2 / (lit(2.0) * nD)
    val rad = lit(z) * sqrt(p * (lit(1.0) - p) / nD
      + z2 / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z2 / nD
    g.select(col(groupCol), col("n"), col("k"), round(p, 6).as("p_hat"),
      round((center - rad) / denom, 6).as("lo"),
      round((center + rad) / denom, 6).as("hi"))
  }

  /** Quantile normalization — map every group's value distribution onto
    * the GLOBAL quantile function: a value at within-group rank fraction
    * q is replaced by the global q-quantile (type-1/lower convention).
    * The cross-source score calibrator: after it, "top 10 % by quality
    * score" means the same thing in every source even when one source's
    * scorer runs hot — the curation counterpart of per-model score
    * normalization in retrieval fusion.
    *
    * ENTIRELY integer-exact — no floating point anywhere: within-group
    * cumulative counts c_g and group sizes n_g live on the collapsed
    * (group, value) grain, global cumulatives c on the value grain, the
    * target global rank is t = ⌈c_g·N / n_g⌉ = (c_g·N + n_g − 1) div n_g
    * (DECIMAL(38) product, integral division), and the mapped value is
    * the smallest global value with c ≥ t — equivalently, the value whose
    * rank interval (c_before, c] contains t (intervals partition [1, N],
    * so every row matches exactly once), resolved by a fixed-width
    * rank-BUCKET equi-join: never a pair expansion, never a global sort.
    *
    * Scale shape: two map-side-combined aggregates to the (group, value)
    * and value grains, one group-partitioned window over the collapsed
    * group grain, the partition-offset cumulative pass for the global
    * grain, and one hash join on 256 rank buckets (right intervals
    * replicate only into buckets they overlap — Σ widths = N bounds the
    * replication at grain + 256 rows). Every stage is partition-parallel;
    * no single-task window or merge anywhere. Output one row per
    * distinct (group, value): (group, value, norm_value, n). */
  def quantileNormalize(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"))
    val gg = base.groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_m"))
    val wg = W.partitionBy(col("_g")).orderBy(col("_v"))
    val gcum = gg.select(col("_g"), col("_v"), col("_m"),
      sum(col("_m")).over(wg.rowsBetween(W.unboundedPreceding, 0)).as("_cg"),
      sum(col("_m")).over(
        wg.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).as("_ng"))
    // global cumulative via the partition-offset scheme — a score-grain
    // the size of the corpus must not funnel through one window task
    val gl = base.groupBy(col("_v")).agg(count(lit(1)).as("_m"))
      .localCheckpoint(false)   // two consumers: cum table + total
    val nTot = gl.agg(coalesce(sum(col("_m")), lit(0L)).as("_N"))
    // Rank-range-bucketed interval lookup (r12 ADVICE: the previous
    // single-constant-key AsOf merge sorted BOTH corpus-sized grains in
    // one task — the exact shape distributedCumCounts exists to avoid).
    // The global value with smallest c ≥ t is the one whose rank interval
    // (c_before, c] CONTAINS t — intervals partition [1, N] — so the
    // lookup is an equi-join on fixed-width rank buckets: left rows hash
    // by bucket(t), each right interval replicates into every bucket it
    // overlaps (Σ interval widths = N ⇒ total replication ≤ grain + nB
    // rows, bounded), and the containment filter runs bucket-locally.
    // 256 buckets spread the rank axis across the cluster; no global
    // sort, no single-task stage anywhere in this operator.
    val nB = 256L
    val widthExpr = s"greatest(CAST(1 AS BIGINT), (_N + ${nB - 1}) div $nB)"
    val tgt = gcum.crossJoin(broadcast(nTot))
      .withColumn("_t",
        expr("CAST((CAST(_cg AS DECIMAL(38,0)) * _N + _ng - 1) div _ng AS BIGINT)"))
      .withColumn("_bkt", expr(s"(_t - 1) div ($widthExpr)"))
    val rightB = distributedCumCounts(gl, "_v")
      .crossJoin(broadcast(nTot))
      .select(col("_v").as("_normv"), col("_cum_before").as("_cb"),
        (col("_cum_before") + col("_m")).as("_c"), col("_N"))
      .withColumn("_bkt",
        explode(expr(s"sequence(_cb div ($widthExpr), (_c - 1) div ($widthExpr))")))
      .select(col("_bkt"), col("_cb"), col("_c"), col("_normv"))
    tgt.join(rightB, Seq("_bkt"))
      .where(col("_cb") < col("_t") && col("_t") <= col("_c"))
      .select(col("_g").as(groupCol), col("_v").as(valueCol),
        col("_normv").as("norm_value"), col("_m").as("n"))
  }

  /** Chi-square test of independence + Cramér's V — "are these two
    * categorical columns related, and how strongly": the
    * composition-drift gate for label × source, lang × domain,
    * quality-bucket × time-slice tables. χ² says whether the association
    * could be chance; V = √(χ²/(n·min(R−1, C−1))) ∈ [0,1] says how big
    * it is independently of n (the effect size the raw χ² hides).
    *
    * Determinism discipline: per cell, o·n − r·c and n·r·c are EXACT
    * DECIMAL(38) integers (≤ n²·max(o) and n³ — inside 38 digits to
    * n ≈ 10¹²); each cell's (o·n − r·c)²/(n·r·c) is ONE fixed-shape IEEE
    * expression over those integers, immediately micro-rounded to a LONG
    * (the vocab-KL device) so the cross-cell SUM is exact integer
    * arithmetic — no float-sum order dependence. Zero-marginal cells
    * can't occur (cells only exist where o ≥ 1). Single-level rows or
    * columns (min(R−1, C−1) = 0) yield χ² = 0 and null V.
    *
    * Scale shape: one (a,b)-grain aggregate + two marginal-grain
    * aggregates joined back by key + a broadcast 1-row total; nothing
    * beyond cell cardinality shuffles. Output: (n, r_levels, c_levels,
    * chi2, cramers_v). */
  def chiSquareIndependence(df: DataFrame, colA: String,
                            colB: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val base = df.where(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("_a"), col(colB).as("_b"))
    val cells = base.groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val ra = base.groupBy(col("_a")).agg(count(lit(1)).as("_r"))
    val cb = base.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
    val tot = base.agg(count(lit(1)).as("_n"),
      countDistinct(col("_a")).as("r_levels"),
      countDistinct(col("_b")).as("c_levels"))
    val diff = big(col("_o")) * col("_n") - big(col("_r")) * col("_c")
    val den = big(col("_n")) * col("_r") * col("_c")
    val contrib = cells
      .join(ra, Seq("_a")).join(cb, Seq("_b"))
      .crossJoin(broadcast(tot))
      .select(round(diff.cast("double") * diff.cast("double")
          / den.cast("double") * lit(1e6)).cast("long").as("_micro"),
        col("_n"), col("r_levels"), col("c_levels"))
    contrib
      .groupBy(col("_n"), col("r_levels"), col("c_levels"))
      .agg(coalesce(sum(col("_micro")), lit(0L)).as("_chi2m"))
      .select(col("_n").as("n"), col("r_levels"), col("c_levels"),
        (col("_chi2m").cast("double") / 1e6).as("chi2"),
        when(least(col("r_levels"), col("c_levels")) <= 1,
          lit(null).cast("double"))
          .otherwise(round(sqrt((col("_chi2m").cast("double") / 1e6)
            / (col("_n").cast("double")
              * (least(col("r_levels"), col("c_levels")) - 1)
                .cast("double"))), 6))
          .as("cramers_v"))
  }

  /** Mutual information + Theil's uncertainty coefficients between two
    * categorical columns — the information-theoretic completion of the
    * association triangle next to [[chiSquareIndependence]] (significance
    * / effect size) and [[cohenKappa]] (agreement on a SHARED label
    * space): MI says how many nats knowing one label tells you about the
    * other; U(A|B) = MI/H(A) and U(B|A) = MI/H(B) normalize it per
    * DIRECTION (asymmetric — "source determines lang" and "lang
    * determines source" are different claims, which Cramér's V can't
    * distinguish).
    *
    * The [[vocabKl]] micro-log discipline: each cell's ln(o·n/(r·c)) and
    * each marginal's ln(n/r) quantize to round(ln·10⁶) LONGs; Σ o·L and
    * Σ r·L are exact DECIMAL(38) integer sums (order-independent), each
    * divided ONCE by n in integer micro-units. Degenerate single-level
    * marginals (H = 0) yield null for that direction's U. Output:
    * (n, h_a, h_b, mi_nats, u_ab, u_ba).
    *
    * Scale shape: identical to chiSquareIndependence — one cell-grain
    * aggregate, two marginal joins, broadcast total. */
  def mutualInformation(df: DataFrame, colA: String,
                        colB: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    def micLog(c: Column): Column = round(log(c) * lit(1e6)).cast("long")
    def micOut(sum38: Column): Column =
      round(sum38.cast("double") / col("_n").cast("double")).cast("long")
    val base = df.where(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("_a"), col(colB).as("_b"))
    val cells = base.groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val ra = base.groupBy(col("_a")).agg(count(lit(1)).as("_r"))
    val cb = base.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
    val tot = base.agg(count(lit(1)).as("_n"))
    val miSum = cells
      .join(ra, Seq("_a")).join(cb, Seq("_b")).crossJoin(broadcast(tot))
      .select(col("_n"),
        (big(col("_o")) * micLog((big(col("_o")) * col("_n")).cast("double")
          / (big(col("_r")) * col("_c")).cast("double"))).as("_t"))
      .groupBy(col("_n")).agg(coalesce(sum(col("_t")), big(lit(0))).as("_mi"))
    def entropy(marg: DataFrame, cnt: String, out: String): DataFrame =
      marg.crossJoin(broadcast(tot))
        .select(col("_n"),
          (big(col(cnt)) * micLog(col("_n").cast("double")
            / col(cnt).cast("double"))).as("_t"))
        .groupBy(col("_n")).agg(coalesce(sum(col("_t")), big(lit(0))).as(out))
    val j = miSum
      .join(entropy(ra, "_r", "_ha"), Seq("_n"))
      .join(entropy(cb, "_c", "_hb"), Seq("_n"))
    j.select(col("_n").as("n"),
      (micOut(col("_ha")).cast("double") / 1e6).as("h_a"),
      (micOut(col("_hb")).cast("double") / 1e6).as("h_b"),
      (micOut(col("_mi")).cast("double") / 1e6).as("mi_nats"),
      when(micOut(col("_ha")) === 0, lit(null).cast("double"))
        .otherwise(round(micOut(col("_mi")).cast("double")
          / micOut(col("_ha")).cast("double"), 6)).as("u_ab"),
      when(micOut(col("_hb")) === 0, lit(null).cast("double"))
        .otherwise(round(micOut(col("_mi")).cast("double")
          / micOut(col("_hb")).cast("double"), 6)).as("u_ba"))
  }

  /** Benford first-digit audit — the classic fabricated-data detector:
    * organically-generated positive amounts follow P(d) = log10(1+1/d);
    * synthetic or tampered figures usually don't. Reports per-digit
    * observed vs expected shares and the χ² statistic (rule of thumb:
    * χ² > 15.5 rejects Benford at α = 0.05 with 8 df).
    *
    * Portability: values round once to 10^scale-grid LONGs; the first
    * significant digit is the first character of the positive integer's
    * DECIMAL STRING (exact on any engine — no log10 float edge at powers
    * of ten); the nine expected shares are shared 17-significant-digit
    * literals, so only the final 9-term χ² accumulation is float.
    * Output: (digit 1..9, n, obs_p, exp_p, chi2_contrib) + a digit-0
    * total row whose chi2_contrib is the statistic. Non-positive values
    * are excluded (Benford is defined on positive magnitudes). */
  def benfordAudit(df: DataFrame, valueCol: String, scale: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val digits = df
      .select(graft.SparkEntry.roundAway(col(valueCol).cast("double")
        * math.pow(10, scale).toLong).cast("long").as("_v"))
      .where(col("_v") > 0)
      .select(substring(col("_v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val spine = spark.range(1, 10).select(col("id").cast("int").as("digit"))
    // 9-row artifact pinned eagerly: the total .head, the per-digit frame
    // and the chi² union otherwise each replay the full corpus scan (3×)
    val joint = spine.join(digits, Seq("digit"), "left_outer")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .localCheckpoint(true)
    val total = joint.agg(sum(col("n"))).head.getLong(0)
    require(total > 0, "benfordAudit over an empty positive domain")
    val expP = benfordP.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (p, i)) => when(col("digit") === i + 1, lit(p)).otherwise(acc) }
    val contrib = {
      val e = lit(total.toDouble) * expP
      (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
    }
    val perDigit = joint.select(col("digit"), col("n"),
      round(col("n").cast("double") / total, 6).as("obs_p"),
      round(expP, 6).as("exp_p"),
      round(contrib, 6).as("chi2_contrib"))
    perDigit.unionByName(joint.agg(
      lit(0).as("digit"), sum(col("n")).as("n"),
      round(sum(col("n")).cast("double") / total, 6).as("obs_p"),
      round(lit(1.0), 6).as("exp_p"),
      round(sum(contrib), 6).as("chi2_contrib")))
  }

  /** log10(1 + 1/d) for d = 1..9 — the Benford expected shares, shared
    * verbatim with the oracle SQL via [[benfordPLiterals]]. */
  val benfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
  def benfordPLiterals: Seq[String] = benfordP.map(p => f"$p%.17g")

  /** MAD-based robust outlier detection per group — the data-cleaning
    * staple mean/stddev z-scores can't provide (one bot inflates the
    * stddev that is supposed to catch it; the median and MAD have 50 %
    * breakdown). Flags x with |x − median| > (kNum/kDen)·MAD, where
    * MAD = median(|x − median|).
    *
    * INTEGER-EXACT throughout (the [[exactCorrelation]] discipline):
    * values round once onto the 10^scale grid; medians are kept DOUBLED
    * (m2 = v(⌊(n−1)/2⌋) + v(⌊n/2⌋), exact LONG — no .5 ever
    * materializes), deviations as d = |2v − m2|, the MAD doubled again
    * (mad2x = 2·median(d) = 4·MAD), and the flag |v−m| > k·MAD becomes
    * the integer comparison 2·kDen·d > kNum·mad2x — bit-reproducible on
    * any engine, no float boundary for a row to flip across.
    *
    * Shape: two keyed rank windows (value order, then deviation order)
    * and two group-keyed joins of a per-group 2-long artifact — the
    * [[groupedQuantiles]] single-exchange pattern twice. Output:
    * (groupCol, n, median, mad, n_outliers). */
  /** EMBEDDING-distribution drift between two corpus slices — the vector
    * companion of [[psi]]'s scalar drift: compare the per-dimension MEAN
    * vectors (centroids) of base vs current. Reports centroid cosine
    * (≈1 = same direction — retraining/provider swaps show up here
    * first), centroid L2 shift, and the single most-drifted dimension.
    * This is the cheap standing monitor a 100 TB embedding pipeline runs
    * per ingest batch before anything expensive (recall evals, re-index).
    *
    * Exactness: elements round once to micro-LONGs; per-dim sums are
    * exact; cosine is computed on the SUM vectors directly (scale-
    * invariance makes the n divisions unnecessary), mean differences on
    * the common-denominator integers sb·nc − sc·nb — every comparison and
    * accumulation is DECIMAL(38,0)-exact, with one sqrt/divide in double
    * at the end. Shape: one posexplode scan per slice into a dim-grain
    * aggregate (dim rows, broadcast-sized), everything after is over that
    * artifact. Output: ONE row (n_base, n_cur, centroid_cos, centroid_l2,
    * max_dim_shift, drift_dim — 0-based, min dim on ties). */
  def embeddingDrift(base: DataFrame, cur: DataFrame,
                     vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def dimSums(df: DataFrame, name: String): DataFrame = df
      .where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)))
      .select(col("pos").as("dim"),
        graft.SparkEntry.roundAway(col("col").cast("double") * 1000000.0)
          .cast("long").as("_m"))
      .groupBy(col("dim")).agg(sum(col("_m")).as(name))
    val counts = base.where(col(vecCol).isNotNull)
      .agg(count(lit(1)).as("_nb"))
      .crossJoin(cur.where(col(vecCol).isNotNull)
        .agg(count(lit(1)).as("_nc")))
    val t = dimSums(base, "_sb").join(dimSums(cur, "_sc"), Seq("dim"), "full_outer")
      .select(col("dim"),
        coalesce(col("_sb"), lit(0L)).as("_sb"),
        coalesce(col("_sc"), lit(0L)).as("_sc"))
      .crossJoin(counts)
      .withColumn("_dnum",
        col("_sb").cast(dec) * col("_nc").cast(dec) -
          col("_sc").cast(dec) * col("_nb").cast(dec))
      .localCheckpoint(false)   // dim-grain artifact; two consumers below
    val a = t.agg(max(col("_nb")).as("n_base"), max(col("_nc")).as("n_cur"),
      sum(col("_sb").cast(dec) * col("_sc").cast(dec)).as("_dot"),
      sum(col("_sb").cast(dec) * col("_sb").cast(dec)).as("_b2"),
      sum(col("_sc").cast(dec) * col("_sc").cast(dec)).as("_c2"),
      sum(col("_dnum") * col("_dnum")).as("_l2n"),
      max(abs(col("_dnum"))).as("_mx"))
    val argmax = t.crossJoin(a.select(col("_mx").as("_mx2")))
      .filter(abs(col("_dnum")) === col("_mx2"))
      .agg(min(col("dim")).as("drift_dim"))
    a.crossJoin(argmax).select(
      col("n_base"), col("n_cur"),
      round(col("_dot").cast("double") /
        (sqrt(col("_b2").cast("double")) * sqrt(col("_c2").cast("double"))), 6)
        .as("centroid_cos"),
      round(sqrt(col("_l2n").cast("double")) /
        (col("n_base").cast("double") * col("n_cur").cast("double") *
          lit(1000000.0)), 6).as("centroid_l2"),
      round(col("_mx").cast("double") /
        (col("n_base").cast("double") * col("n_cur").cast("double") *
          lit(1000000.0)), 6).as("max_dim_shift"),
      col("drift_dim"))
  }

  /** TRIMMED mean — the third robust-location member next to
    * [[madOutliers]]' median and [[exactQuantiles]]: per group, drop the
    * k smallest and k largest values (k = ⌊n·trimPermille/1000⌋) and
    * average the remainder — the standard heavy-tail-resistant mean for
    * latency/price aggregates where a handful of sentinel or bot values
    * poison avg(). Trim depth is a PERMILLE integer, so k is an exact
    * integer on every engine (a double trimFrac·n can straddle the floor
    * boundary). Ties at the trim edge: ranked by value then arbitrary —
    * any k of equal values leaves the same surviving multiset, so the
    * result is tie-order-independent. One keyed rank window; sums are
    * scaled LONGs, one final division. Output: (groupCol, n, k_trimmed,
    * mean, trimmed_mean) — groups left empty by trimming are absent. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimPermille: Int = 100, scale: Int = 2): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"trimPermille in [0, 500): $trimPermille")
    val W = org.apache.spark.sql.expressions.Window
    val f = math.pow(10, scale).toLong
    val ranked = df
      .select(col(groupCol),
        graft.SparkEntry.roundAway(col(valueCol).cast("double") * f)
          .cast("long").as("_v"))
      .where(col("_v").isNotNull)
      .withColumn("_rn", row_number().over(
        W.partitionBy(col(groupCol)).orderBy(col("_v"))).cast("long"))
      .withColumn("_n", count(lit(1)).over(W.partitionBy(col(groupCol))))
      .withColumn("_k",
        floor((col("_n") * trimPermille).cast("double") / 1000.0).cast("long"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"), max(col("_k")).as("k_trimmed"),
        sum(col("_v")).as("_s"),
        sum(when(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"),
          col("_v")).otherwise(lit(0L))).as("_st"),
        sum(when(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"),
          1L).otherwise(0L)).as("_nt"))
      .filter(col("_nt") > 0)
      .select(col(groupCol), col("n"), col("k_trimmed"),
        round(col("_s").cast("double") / (col("n") * f).cast("double"), 6)
          .as("mean"),
        round(col("_st").cast("double") / (col("_nt") * f).cast("double"), 6)
          .as("trimmed_mean"))
  }

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  scale: Int = 2, kNum: Long = 3, kDen: Long = 1): DataFrame = {
    require(kNum > 0 && kDen > 0, s"k must be positive: $kNum/$kDen")
    val W = org.apache.spark.sql.expressions.Window
    // MATERIALIZE the (group, value) projection once (lazy — the first
    // med2 action computes it): `base` is consumed by THREE passes (the
    // median rank window, the MAD rank window via `dev`, and the final
    // aggregate via `dev` again), and without the checkpoint each pass
    // replays the CALLER's upstream pipeline — q_seasonal_anomaly paid
    // the full seasonal decomposition (daily agg + two windows) three
    // times over (r21 §2.4, the selectToTokenBudget stance). The cached
    // bytes are the narrow 16-byte (group, long) projection.
    val base = df
      .select(col(groupCol),
        graft.SparkEntry.roundAway(col(valueCol).cast("double")
          * math.pow(10, scale).toLong).cast("long").as("_v"))
      .where(col("_v").isNotNull)
      .localCheckpoint(false)
    // doubled median of column c per group: value-at-⌊(n−1)/2⌋ +
    // value-at-⌊n/2⌋ over the group's ascending order (equal for odd n,
    // so the sum double-counts the single median row — exactly 2·median)
    def med2(in: DataFrame, c: String, out: String): DataFrame =
      in.withColumn("_rn",
          row_number().over(W.partitionBy(col(groupCol)).orderBy(col(c)))
            .cast("long") - 1)
        .withColumn("_n", count(lit(1)).over(W.partitionBy(col(groupCol))))
        .filter(col("_rn") === expr("(_n - 1) div 2") ||
          col("_rn") === expr("_n div 2"))
        .groupBy(col(groupCol))
        .agg((sum(when(col("_rn") === expr("(_n - 1) div 2"), col(c))) +
          sum(when(col("_rn") === expr("_n div 2"), col(c)))).as(out))
    // group-grain 2-long artifacts pinned eagerly: dev (and through it the
    // meds window subtree) is consumed by BOTH the MAD pass and the final
    // aggregate — unpinned, the corpus scan + rank window replay per use.
    // The broadcast hint is GATED on group count (ADVICE r13): at per-user
    // grain the meds artifact can exceed the broadcast/driver limit, where
    // a shuffle join scales fine — the count is free, the frame is pinned.
    val bcastMaxGroups = 2000000L
    def pinAndHint(d: DataFrame): DataFrame = {
      val pinned = d.localCheckpoint(true)
      if (pinned.count() <= bcastMaxGroups) broadcast(pinned) else pinned
    }
    val meds = pinAndHint(med2(base, "_v", "_m2"))
    val dev = base.join(meds, Seq(groupCol))
      .withColumn("_d", abs(lit(2L) * col("_v") - col("_m2")))
    val mads = pinAndHint(med2(dev.select(col(groupCol), col("_d")), "_d", "_mad2x"))
    val f = math.pow(10, scale)
    dev.join(mads, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("_m2")).cast("double") / lit(2 * f), 6).as("median"),
        round(max(col("_mad2x")).cast("double") / lit(4 * f), 6).as("mad"),
        sum(when(lit(2 * kDen) * col("_d") > lit(kNum) * col("_mad2x"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** EXACT Pearson correlation matrix over fixed-scale numeric columns —
    * the [[graft.ops.Funnel.trendSlopes]] integer discipline applied to
    * correlation: values round ONCE onto their 10^scale grid (correlation
    * is scale-invariant, so the grid only fixes rounding fidelity), all
    * five sums per pair (n, Σx, Σy, Σx², Σy², Σxy) are exact integers,
    * and the only floating-point steps are the final casts, one multiply,
    * one sqrt and one divide — written in the same operation order on
    * both engines, so results agree at round-6 everywhere.
    *
    * corr = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²)), each
    * parenthesized term assembled in DECIMAL(38,0). Per-row work stays
    * codegen'd LONG arithmetic (products ≤ ~10¹⁴ at 10⁷-scaled values)
    * via the decSum hi/lo split — Σlo wraps at 2⁴⁵ rows per group, Σhi
    * at ~|product|/2¹⁸·rows ≈ 2⁴⁵ too, so exact to ~3.5·10¹³ rows; the
    * assembled DECIMAL terms hold to ~10³⁸ (n·Σx² ≈ 10³⁸ at 10¹² rows —
    * the documented ceiling). ONE scan, one 1-row aggregate; rows with a
    * null in ANY column are excluded (pairwise-complete would make the
    * pairs incomparable). Columns with zero variance drop their pairs.
    * Output: (col_a, col_b, corr, n) for each unordered pair. */
  def exactCorrelation(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns: $cols")
    val spark = df.sparkSession
    val dec38 = DecimalType(38, 0)
    def splitSum(e: Column): Column =
      sum(shiftright(e, 18)).cast(dec38) * lit(262144L).cast(dec38) +
        sum(e.bitwiseAND(lit(262143L))).cast(dec38)
    val nonNull = cols.map { case (c, _) => col(c).isNotNull }.reduce(_ && _)
    val scaled = df.filter(nonNull).select(cols.map { case (c, sc) =>
      graft.SparkEntry.roundAway(col(c).cast("double") * math.pow(10, sc).toLong)
        .cast("long").as(s"_$c")
    }: _*)
    val names = cols.map(_._1)
    val pairs = for (i <- names.indices; j <- (i + 1) until names.size) yield (i, j)
    val aggs =
      names.map(c => splitSum(col(s"_$c")).as(s"_s_$c")) ++
      names.map(c => splitSum(col(s"_$c") * col(s"_$c")).as(s"_q_$c")) ++
      pairs.map { case (i, j) =>
        splitSum(col(s"_${names(i)}") * col(s"_${names(j)}"))
          .as(s"_p_${names(i)}_${names(j)}") }
    val row = scaled.agg(count(lit(1)).cast(dec38).as("_n"), aggs: _*).head
    val n = row.getDecimal(0)
    def d(name: String) = row.getDecimal(row.fieldIndex(name))
    val out = pairs.flatMap { case (i, j) =>
      val (a, b) = (names(i), names(j))
      val da = n.multiply(d(s"_q_$a")).subtract(d(s"_s_$a").multiply(d(s"_s_$a")))
      val db = n.multiply(d(s"_q_$b")).subtract(d(s"_s_$b").multiply(d(s"_s_$b")))
      if (da.signum <= 0 || db.signum <= 0) None
      else {
        val num = n.multiply(d(s"_p_${a}_$b")).subtract(d(s"_s_$a").multiply(d(s"_s_$b")))
        val corr = num.doubleValue() /
          math.sqrt(da.doubleValue() * db.doubleValue())
        Some((a, b,
          BigDecimal(corr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          n.longValueExact()))
      }
    }
    spark.createDataFrame(out).toDF("col_a", "col_b", "corr", "n")
  }

  /** EXACT WEIGHTED quantiles (lower / type-1 convention): the smallest
    * value x whose cumulative weight over the ascending value order
    * reaches p·W — "the document length below which half the TOKENS
    * live", the curation stat plain quantiles get wrong (a million tiny
    * docs ≠ a million tokens). Same distributed shape as
    * [[exactQuantiles]]: range-sort once, ONE counting pass fixes each
    * partition's cumulative-weight offset (driver traffic numPartitions
    * longs), and the selection pass scans only the partitions where a
    * p·W threshold crosses, stopping at its last crossing.
    *
    * Weights are LONGs (token counts, bytes — exact sums); the p·W
    * thresholds are doubles computed identically on any engine from the
    * same (p, W), so the ≥-crossing row is engine-reproducible even for
    * non-dyadic p. Zero- and negative-weight rows are excluded (a
    * zero-weight value carries no mass; negative mass is undefined). */
  def exactWeightedQuantiles(df: DataFrame, valueCol: String,
                             weightCol: String, ps: Seq[Double],
                             partitions: Int = 0): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"ranks must be in (0,1]: $ps")
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.select(col(valueCol).cast("double").as("_x"),
        col(weightCol).cast("long").as("_w"))
      .where(col("_x").isNotNull && col("_w") > 0)
      .repartitionByRange(nPart, col("_x"))
      .sortWithinPartitions("_x")
    val rdd = sorted.rdd.map(r => (r.getDouble(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = rdd.mapPartitionsWithIndex { (i, it) =>
        var w = 0L
        while (it.hasNext) w += it.next()._2
        Iterator((i, w))
      }.collect().sortBy(_._1).map(_._2)
      val total = sizes.sum
      require(total > 0, "exactWeightedQuantiles over an empty/weightless input")
      val offsets = sizes.scanLeft(0L)(_ + _)
      val thresholds = ps.map(p => p * total).toArray
      val found = rdd.mapPartitionsWithIndex { (i, it) =>
        // thresholds crossed inside THIS partition: cumulative weight
        // passes t strictly after offsets(i) and at-or-before the end.
        // Scan ASCENDING regardless of caller order — results map back
        // through the preserved original index.
        val want = thresholds.zipWithIndex.filter { case (t, _) =>
          t > offsets(i) && t <= offsets(i) + sizes(i) }.sortBy(_._1)
        if (want.isEmpty) Iterator.empty
        else {
          val res = new scala.collection.mutable.ArrayBuffer[(Int, Double)](want.length)
          var cum = offsets(i)   // exact LONG cumulative weight
          var wi = 0
          while (it.hasNext && wi < want.length) {
            val (x, w) = it.next()
            cum += w
            while (wi < want.length && cum.toDouble >= want(wi)._1) {
              res += ((want(wi)._2, x)); wi += 1
            }
          }
          res.iterator
        }
      }.collect().toMap
      ps.indices.map(found(_))
    } finally { rdd.unpersist(false); () }
  }

  /** PER-GROUP exact interpolated quantiles (the grouped companion of
    * [[exactQuantiles]], same `quantile_cont` two-sided formula): rank
    * every value inside its group with ONE keyed window (row_number +
    * group count share a single (group)-grain exchange and sort), keep
    * only the ≤ 2·|ps| rows per group sitting at a target order
    * statistic, and interpolate on that tiny remainder. No per-group
    * value buffer — Spark's `percentile` builds a boxed hash map per
    * group; here per-row state is a rank.
    *
    * Output: (groupCol, p, value, n) — n the group's non-null count.
    * Scale note: a window partitioned by group sorts each group within
    * one task (spillable, but serial per group) — the right shape when
    * groups are plentiful; for a handful of mega-groups call
    * [[exactQuantiles]] per group instead (range-partitioned sort). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"ranks must be in [0,1]: $ps")
    val W = org.apache.spark.sql.expressions.Window
    val wOrd = W.partitionBy(col(groupCol)).orderBy(col("_x"))
    val wAll = W.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(valueCol).cast("double").as("_x"))
      .where(col("_x").isNotNull)
      .withColumn("_rn", row_number().over(wOrd).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wAll))
    val keep = ps.map { p =>
      val h = (col("_n") - 1).cast("double") * lit(p)
      col("_rn") === floor(h).cast("long") || col("_rn") === ceil(h).cast("long")
    }.reduce(_ || _)
    ranked.filter(keep)
      .select(col(groupCol), col("_x"), col("_rn"), col("_n"),
        explode(lit(ps.toArray)).as("p"))
      .withColumn("_h", (col("_n") - 1).cast("double") * col("p"))
      .filter(col("_rn") === floor(col("_h")).cast("long") ||
        col("_rn") === ceil(col("_h")).cast("long"))
      .groupBy(col(groupCol), col("p"), col("_n"), col("_h"))
      .agg(min(col("_x")).as("_lo"), max(col("_x")).as("_hi"))
      .select(col(groupCol), col("p"),
        when(floor(col("_h")) === ceil(col("_h")), col("_lo"))
          .otherwise((ceil(col("_h")) - col("_h")) * col("_lo") +
            (col("_h") - floor(col("_h"))) * col("_hi")).as("value"),
        col("_n").cast("long").as("n"))
  }

  /** Equal-frequency bucketing — NTILE at scale: `nBuckets−1` boundary
    * values come from ONE [[exactQuantiles]] pass (rounded to `roundTo`
    * decimals so the cut points are engine-portable), broadcast as
    * literals, and every row is assigned by a scan-side when-chain —
    * bucket i (1-based) is the first boundary ≥ x, else `nBuckets`.
    *
    * Contrast with `ntile(n) OVER (ORDER BY x)`: an unpartitioned window
    * funnels the entire corpus through ONE task's sort. Here the only
    * corpus-scale work is the quantile sort (range-partitioned) and a
    * stateless scan — and the boundaries are a reusable artifact: score a
    * NEW batch into the same buckets without recomputing anything.
    * Boundary ties: every row equal to a cut point lands in the LOWER
    * bucket (`<=`), so bucket populations are exactly reproducible —
    * equal-frequency is approximate in the presence of ties, which is the
    * standard NTILE-vs-cut distinction. */
  def quantileBuckets(df: DataFrame, valueCol: String, nBuckets: Int,
                      roundTo: Int = 6): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be ≥ 2: $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val (qs, _) = exactQuantiles(df, valueCol, ps)
    val bounds = qs.map(q => BigDecimal(q)
      .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assignByBounds(df, valueCol, bounds)
  }

  /** Scan-side bucket assignment against a PRE-COMPUTED ascending cut
    * list (the reusable-artifact half of [[quantileBuckets]]: score a new
    * batch into an existing bucketing, the [[psi]] consumer). Bucket i
    * (1-based) = first bound ≥ x, else bounds.size+1; ties go low; null
    * stays null. */
  def assignByBounds(df: DataFrame, valueCol: String,
                     bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted,
      s"bounds must be non-empty ascending: $bounds")
    val x = col(valueCol).cast("double")
    val chain = bounds.zipWithIndex.foldRight(lit(bounds.size + 1)) {
      case ((b, i), acc) => when(x <= b, lit(i + 1)).otherwise(acc)
    }
    // a null value would otherwise fall through every `when` into the
    // last bucket — keep it null, like ntile over a null-last sort wouldn't
    df.withColumn("bucket",
      when(x.isNull, lit(null).cast("int")).otherwise(chain))
  }

  /** Union per-slice KLL sketches and probe the requested normalized
    * ranks: one row per rank — (p DOUBLE, value DOUBLE, n LONG). Work is
    * O(slices · k log n), independent of corpus size. */
  def quantilesFromSketches(sketches: DataFrame, ranks: Seq[Double],
                            sketchCol: String = "sketch",
                            k: Int = 200): DataFrame = {
    import graft.functions.KllExpressions._
    sketches
      .agg(kllUnionAgg(col(sketchCol), k).as("_u"))
      .select(explode(lit(ranks.toArray)).as("p"), col("_u"))
      .select(col("p"), kllQuantile(col("_u"), col("p")).as("value"),
        kllCount(col("_u")).as("n"))
  }

  /** Per-document out-of-vocabulary rate against the corpus' own
    * top-`vocabSize` word vocabulary — the tokenizer-coverage stat: a
    * fixed-size vocab trained on this corpus would leave `oov_rate` of
    * each document's token mass unrepresented (split to sub-word/bytes).
    * Rising OOV on an incoming slice flags domain shift before training.
    * Output: (idCol, n_tokens, n_oov, oov_rate), one row per document.
    *
    * Determinism: the vocab boundary tie-breaks (count DESC, word ASC) —
    * without the word tie-break the cut among equal-frequency words would
    * be partition-order-dependent and the oracle unreproducible.
    *
    * Scale shape: the vocab is top-k over the word-count aggregate — one
    * map-side-combined token-grain shuffle into TakeOrderedAndProject
    * (bounded k, never a global sort), and the resulting ≤ vocabSize words
    * BROADCAST back against the token stream, so the membership test is a
    * per-row hash probe at the scan; the only other exchange is the
    * per-doc count aggregation (id-grain, partial-agg'd). Corpus bodies
    * shuffle zero times. */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val words = df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("_w"))
    val vocab = words.groupBy(col("_w")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("_w")).limit(vocabSize)
      .select(col("_w"), lit(1).as("_in"))
    words
      .join(broadcast(vocab), Seq("_w"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Exact Gini coefficient of a non-negative LONG measure across rows —
    * the concentration audit ("is 1 % of documents carrying 50 % of the
    * token mass?") every curation pipeline should run before sampling
    * decisions. Rank formulation with the tie-safe identity: within a
    * tie group of value v, count m, and cumBefore a strictly-smaller
    * rows, Σ rank·x over the group is v·m·(2a+m+1)/2 regardless of
    * intra-group order, so the whole statistic computes on the COLLAPSED
    * distinct-value grain — G = (Σ_v v·m·(2a+m+1) − (n+1)·T) / (n·T),
    * every term an exact DECIMAL(38,0) integer, ONE final division.
    *
    * Scale shape: one map-side-combined aggregate to the distinct-value
    * grain, a running-sum window over that bounded table, a 1-row
    * reduce. Output: (n_rows, total, gini), empty if the total is 0. */
  def giniConcentration(df: DataFrame, valueCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = df.groupBy(col(valueCol).cast("long").as("_v"))
      .agg(count(lit(1)).as("_m"))
    val ranked = grain.withColumn("_a",
      coalesce(sum(col("_m")).over(
        W.orderBy(col("_v")).rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    ranked
      .agg(sum(col("_m")).as("n_rows"),
        sum(big(col("_v")) * big(col("_m"))).cast("long").as("total"),
        sum(big(col("_v")) * big(col("_m")) *
          (big(lit(2)) * big(col("_a")) + big(col("_m")) + big(lit(1))))
          .as("_rs"))
      .filter(col("total") > 0)
      .select(col("n_rows"), col("total"),
        round((col("_rs") - (big(col("n_rows")) + big(lit(1))) * big(col("total")))
          .cast("double") /
          (big(col("n_rows")) * big(col("total"))).cast("double"), 6).as("gini"))
  }

  /** Top-k collocations by pointwise mutual information: adjacent word
    * pairs whose corpus frequency most exceeds what their unigram
    * frequencies predict (Church & Hanks 1990). Reported as LIFT =
    * P(xy)/(P(x)·P(y)) = c_xy·N_tok²/(N_bg·c_x·c_y) — exp(PMI), the same
    * ranking since ln is monotone — so the score is ONE arithmetic
    * expression over exact integer counts, identical IEEE-double term
    * order on any engine; no transcendental whose libm could differ.
    *
    * Output: (w1, w2, c_xy, c_x, c_y, lift), `topK` rows by lift DESC
    * with (w1, w2) tie-break; pairs below `minCount` are noise-floored
    * out BEFORE scoring (the classic PMI rare-pair pathology: a
    * singleton pair of two singleton words scores N_tok²/N_bg — pure
    * noise at maximal score).
    *
    * Scale shape: bigram and unigram counts are two map-side-combined
    * aggregations over the token stream (bigrams via a slice-zip, no
    * per-row array duplication); the scored join keys on single words —
    * shuffle mass is the POST-minCount bigram vocabulary, not the corpus;
    * totals ride along as a broadcast 1-row cross; top-k is
    * TakeOrdered, never a global sort. */
  /** Corpus-wide adjacent-bigram counts (w1, w2, c_xy): one
    * map-side-combined aggregation over the token stream, bigrams via a
    * slice-zip so the exploded rows carry two words, never the doc's
    * whole token array. Shared by [[pmiCollocations]] and the word-graph
    * consumers ([[Graph.pageRank]]). */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(Dedup.tokens(col(textCol)).as("_tk"))
      .filter(size(col("_tk")) >= 2)
      .select(explode(arrays_zip(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1))).as("_p"))
      .select(col("_p.0").as("w1"), col("_p.1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))

  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be ≥ 1: $minCount")
    require(topK >= 1, s"topK must be ≥ 1: $topK")
    val tk = df.select(Dedup.tokens(col(textCol)).as("_tk"))
    val uni = tk.select(explode(col("_tk")).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_c"))
    val bg = bigramCounts(df, textCol)
    val totals = uni.agg(sum(col("_c")).as("_ntok"))
      .crossJoin(bg.agg(sum(col("c_xy")).as("_nbg")))
    bg.filter(col("c_xy") >= minCount)
      .join(uni.select(col("_w").as("w1"), col("_c").as("c_x")), Seq("w1"))
      .join(uni.select(col("_w").as("w2"), col("_c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        round(col("c_xy").cast("double") * col("_ntok").cast("double") *
            col("_ntok").cast("double") /
            (col("_nbg").cast("double") * col("c_x").cast("double") *
             col("c_y").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }
  /** Exact φ-heavy hitters over an ARBITRARILY LARGE key space — the
    * boilerplate/hot-URL/hot-n-gram detector whose shuffle cost must not
    * depend on key cardinality. Two bounded passes:
    *
    *  1. CANDIDATES: a [[graft.functions.MisraGries]] summary with
    *     k = max(16, ⌈2/φ⌉) counters — partial per partition, merged
    *     through an exchange of ≤ k rows per partition (never the
    *     distinct-key set). The survivor set provably contains every
    *     item with count ≥ φ·n (undercount ≤ n/(k+1) < φ·n).
    *  2. VERIFY: one scan counting ONLY the ≤ k candidates (an `isin`
    *     filter, then a groupBy whose key space is ≤ k) plus the row
    *     total, and the exact threshold cut count ≥ ⌈φ·n⌉.
    *
    * Output (value, cnt) is EXACT and deterministic — arrival-order
    * dependence of MG weights is confined to the candidate superset,
    * which the verify pass replaces with true counts. Contrast with a
    * plain groupBy-HAVING: same answer, but its exchange carries every
    * distinct key; over 100 TB of 5-gram shingles that IS the job. */
  def heavyHitters(df: DataFrame, valueCol: String, phi: Double): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1]: $phi")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("value"))
      .where(col("value").isNotNull)
    // three actions share this lineage (sketch, n, verify) — persist once
    // so an expensive upstream (a token explode) runs once, not thrice
    // (r15 ADVICE); released below, after the ≤ 2k-row result materializes
    vals.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val k = math.max(16, math.ceil(2.0 / phi).toInt)
      val mg = new graft.functions.MisraGries(k).toColumn
      val candidates = vals.as[String].select(mg).head().map(_.value)
      val n = vals.count()
      val threshold = math.ceil(phi * n).toLong
      val out =
        if (candidates.isEmpty) {
          vals.limit(0).groupBy("value").agg(count(lit(1)).as("cnt"))
        } else {
          // broadcast semi-join, not isin: an isin inlines every candidate
          // as a plan literal (plan size grows with 1/φ); the semi-join
          // keeps the candidate set a broadcast relation of ≤ 2k rows
          val cand = broadcast(candidates.toSeq.toDF("value"))
          vals.join(cand, Seq("value"), "left_semi")
            .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") >= threshold)
        }
      // bounded materialize (≤ candidate count ≤ 2k rows by construction):
      // the verify pass must run while the persist is live
      val rows = out.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), out.schema)
    } finally vals.unpersist()
  }

  /** Corpus-law diagnostics — the two classic health checks of a text
    * corpus (both public: Zipf 1949, Heaps 1978), one row:
    *
    *  - `zipf_slope`: OLS slope of ln(freq) against ln(rank) over the
    *    top `topR` words (rank by count DESC, word ASC — deterministic).
    *    Natural prose sits near −1; templated/boilerplate corpora go
    *    shallower, spam goes steeper.
    *  - `heaps_beta`: two-point Heaps exponent
    *    (ln V − ln V_h)/(ln N − ln N_h) between the even-`idCol` half and
    *    the full corpus. Prose sits β ≈ 0.4–0.6; β → 0 means vocabulary
    *    saturation (heavy duplication), β → 1 means id-like token churn.
    *
    * Determinism: the OLS sums accumulate as round(·10⁹) LONGs over the
    * bounded top-R artifact (integer addition is order-free, so the sum
    * is partitioning- and engine-independent up to libm ln ulps — the
    * bm25 stance), and the final slope/β are one fixed-shape double
    * expression each, round-6. Scale shape: one token scan → vocab-grain
    * count (map-side combined) → top-R collect (bounded artifact) + two
    * count/countDistinct aggregates. Output: (zipf_slope, heaps_beta,
    * n_tokens, vocab, n_half, vocab_half). */
  def corpusLaws(df: DataFrame, textCol: String, idCol: String,
                 topR: Int = 100): DataFrame = {
    require(topR >= 2, s"topR must be ≥ 2: $topR")
    val spark = df.sparkSession
    val tok = df.where(col(textCol).isNotNull)
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("_w"))
    val top = tok.groupBy(col("_w")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_w")).limit(topR)
      .select(col("_c")).collect().map(_.getLong(0))
    require(top.length >= 2, "corpus has fewer than 2 distinct words")
    val rn = top.length
    def s9(x: Double): Long = math.round(x * 1e9)
    var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L
    top.zipWithIndex.foreach { case (c, i) =>
      val lr = math.log(i + 1.0); val lc = math.log(c.toDouble)
      sx += s9(lr); sy += s9(lc); sxy += s9(lr * lc); sxx += s9(lr * lr)
    }
    val slope = (rn * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9)) /
      (rn * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9))
    val full = tok.agg(count(lit(1)).as("n"),
      countDistinct(col("_w")).as("v")).head()
    val half = tok.filter(pmod(col(idCol), lit(2)) === 0)
      .agg(count(lit(1)).as("n"), countDistinct(col("_w")).as("v")).head()
    val (n, v) = (full.getLong(0), full.getLong(1))
    val (nh, vh) = (half.getLong(0), half.getLong(1))
    val beta = (math.log(v.toDouble) - math.log(vh.toDouble)) /
      (math.log(n.toDouble) - math.log(nh.toDouble))
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    import spark.implicits._
    Seq((r6(slope), r6(beta), n, v, nh, vh))
      .toDF("zipf_slope", "heaps_beta", "n_tokens", "vocab",
        "n_half", "vocab_half")
  }

}
