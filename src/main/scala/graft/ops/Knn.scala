package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Replaces the reference's server-side OpenSearch HNSW index
  * (`index-creation-function/lambda_function.py:69-96`) with engine-side
  * operators:
  *
  *  - [[topK]] — exact brute-force scan. Catalyst plans
  *    `orderBy(score).limit(k)` as `TakeOrderedAndProject`: each partition
  *    keeps a k-element heap, only k rows per partition reach the driver.
  *    At 100 TB this is a single full scan with no shuffle — the right
  *    baseline, and embarrassingly parallel.
  *  - [[lshBucketed]] — random-hyperplane LSH: probe only corpus rows whose
  *    signature matches the query's in ≥1 band. At scale the bucket column
  *    becomes a partition/bucket key so a probe touches a small fraction of
  *    files; here it demonstrates the plan shape (scan → bucket-filter →
  *    exact re-rank).
  */
object Knn {

  /** The bounded k×d maintenance artifact of [[centroidBatchState]]:
    * per-cell member counts and per-dimension exact grid sums. Additive —
    * [[fold]] of two disjoint slices' states is the union's state, the
    * property that makes one-scan-per-micro-batch quantizer maintenance
    * exact. Value equality is deep (array contents). */
  final case class CentroidState(counts: Array[Long], sums: Array[Array[Long]]) {
    def fold(other: CentroidState): CentroidState = {
      require(counts.length == other.counts.length,
        s"cell count mismatch: ${counts.length} vs ${other.counts.length}")
      CentroidState(
        Array.tabulate(counts.length)(c => counts(c) + other.counts(c)),
        Array.tabulate(counts.length)(c =>
          Array.tabulate(sums(c).length)(i => sums(c)(i) + other.sums(c)(i))))
    }
    def sameAs(other: CentroidState): Boolean =
      counts.sameElements(other.counts) &&
        sums.length == other.sums.length &&
        sums.indices.forall(c => sums(c).sameElements(other.sums(c)))
  }

  /** Round-half-away-from-zero mean on the grid, exact integer
    * arithmetic. Remainder-based (NOT the (2·|s|+n)/(2·n) form, whose
    * doubling halves the usable LONG range and would wrap silently at
    * |s| > 2⁶²): quotient + round-up when the remainder reaches half of
    * n — r and n−r are both < n, so no intermediate exceeds |s|, and the
    * documented ~9·10¹² row bound holds over the FULL LONG range. Shared
    * by [[kmeansFit]] and [[refreshCentroids]] so the incremental
    * maintenance path reproduces the trainer bit-for-bit. */
  private def meanQ(s: Long, n: Long): Long = {
    val a = math.abs(s)
    val m = a / n
    val r = a - m * n
    val up = if (r >= n - r) m + 1 else m
    if (s < 0) -up else up
  }

  /** Exact top-k by metric ("cosine" → highest similarity first,
    * "l2" → smallest distance first). Deterministic tiebreak on `idCol`. */
  def topK(corpus: DataFrame, vecCol: String, idCol: String,
           queryVec: Array[Float], k: Int, metric: String = "cosine"): DataFrame = {
    val q = typedLit(queryVec)
    val (scoreCol, order) = metric match {
      case "cosine" =>
        val s = cosine_sim(col(vecCol), q); (s, Seq(col("score").desc, col(idCol).asc))
      case "l2" =>
        val s = l2_dist(col(vecCol), q); (s, Seq(col("score").asc, col(idCol).asc))
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    corpus.withColumn("score", scoreCol).orderBy(order: _*).limit(k)
  }

  /** Random-hyperplane signature: one codegen'd expression computing all
    * `bands` band signatures in a single pass (see
    * [[graft.functions.HyperplaneLsh]]). Deterministic planes derived from
    * splitmix64, so signatures are stable across runs/executors. */
  def hyperplaneSignature(vecCol: Column, dim: Int, bands: Int, bitsPerBand: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(graft.functions.HyperplaneLsh(
      GraftBridge.toExpression(vecCol), dim, bands, bitsPerBand))
  }

  /** ANN: restrict the exact re-rank to corpus rows sharing ≥1 LSH band
    * with the query vector, then exact top-k on the survivors. */
  def lshBucketed(corpus: DataFrame, vecCol: String, idCol: String,
                  queryVec: Array[Float], k: Int, dim: Int,
                  bands: Int = 8, bitsPerBand: Int = 12): DataFrame = {
    // The query's band signature is a pure function of the literal query
    // vector: evaluate the expression on the driver instead of launching a
    // one-row Spark job for it (the job-submit floor was ~0.2 s — pure
    // overhead the probe path doesn't need).
    val qsig = graft.functions.HyperplaneLsh(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          queryVec, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        dim, bands, bitsPerBand)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val sig = hyperplaneSignature(col(vecCol), dim, bands, bitsPerBand)
    val matchesAnyBand = (0 until bands)
      .map(b => element_at(col("_sig"), b + 1) === lit(qsig(b)))
      .reduce(_ || _)
    val candidates = corpus.withColumn("_sig", sig).filter(matchesAnyBand).drop("_sig")
    topK(candidates, vecCol, idCol, queryVec, k, "cosine")
  }

  // ------------------------------------------------------------------- IVF

  /** DISTRIBUTED Lloyd k-means on the 10⁻⁶ fixed-point grid — corpus-scale
    * centroid refinement where [[trainCentroids]]' driver-side sample loop
    * stops being representative (embedding clustering for curation: domain
    * discovery, SemDeDup cell assignment, IVF coarse quantizers trained on
    * the full corpus rather than a sample).
    *
    * Determinism (the property every oracle here leans on, applied to an
    * ITERATIVE float algorithm): coordinates quantize to round(v·10⁶)
    * LONGs once at entry, so every distance is an exact integer, argmin
    * ties break to the smaller cell id, means round half-away-from-zero
    * back onto the grid after each update, and init is the k
    * smallest-`idCol` vectors — the whole trajectory is bit-reproducible
    * across engines, partitionings and reruns (each iteration's centroid
    * error from true means is ≤ 0.5 grid units per coordinate — the
    * standard fixed-point Lloyd argument).
    *
    * Scale shape per iteration: centroids are a k×d LONG artifact
    * broadcast as literals — assignment is a per-row codegen'd HOF argmin
    * (NO join, NO shuffle, no n×k row blowup); the update is one
    * partial-aggregated groupBy(cell) with d per-dim sums collecting k
    * rows to the driver (the bounded-artifact loop every iterative op here
    * uses: histogram boundaries, centroid seeds). Driver traffic per
    * iteration: k·d longs. Σ per dim fits LONG to ~9·10¹² rows at |v| ≤ 1
    * (10⁶ grid · 9.2·10¹⁸ / 10⁶); beyond that widen the sums to DECIMAL.
    * The driver-side mean is remainder-based (no 2·Σ doubling), so that
    * sum bound is the ONLY bound — the rounding step never overflows
    * before the sum itself would.
    * Empty cells keep their previous centroid (n = 0 in the report).
    *
    * Returns (cell INT, n LONG, centroid ARRAY<LONG>): the final grid
    * centroids with the member counts of the LAST update step. */
  def kmeansFit(df: DataFrame, vecCol: String, idCol: String, k: Int,
                iterations: Int, quantScale: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    val spark = df.sparkSession
    val q = df.select(col(idCol),
      transform(col(vecCol), x => round(x.cast("double") * quantScale).cast("long"))
        .as("_qv"))
    val init = q.orderBy(col(idCol)).limit(k).select(col("_qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(init.nonEmpty, "need a non-empty corpus")
    val dim = init.head.length
    var centroids: Array[Array[Long]] = init
    var counts: Array[Long] = Array.fill(centroids.length)(0L)
    for (_ <- 0 until iterations) {
      val assigned = q.select(col(idCol), col("_qv"),
        gridArgminCell(col("_qv"), centroids.map(_.toSeq).toSeq).as("_cell"))
      val aggs = (0 until dim).map(i =>
        sum(element_at(col("_qv"), i + 1)).as(s"_s$i")) :+ count(lit(1)).as("_n")
      val rows = assigned.groupBy(col("_cell")).agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = centroids.map(_.clone())
      val nextCounts = Array.fill(centroids.length)(0L)
      rows.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(dim + 1)
        nextCounts(cell) = n
        var i = 0
        while (i < dim) { next(cell)(i) = meanQ(r.getLong(i + 1), n); i += 1 }
      }
      centroids = next
      counts = nextCounts
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      centroids.zipWithIndex.map { case (cv, cid) =>
        org.apache.spark.sql.Row(cid, counts(cid), cv.toSeq)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false))))
  }

  /** argmin exact integer squared distance over k grid centroids riding
    * as a plan-time literal: a per-row codegen'd HOF fold carrying
    * (best d², best cid) — strict < keeps the earlier (smaller) cid on
    * ties since the literal is cid-ascending. NO join, NO shuffle, no
    * n×k row blowup — the assignment expression [[kmeansFit]] trains
    * with and [[kmeansAssign]] serves with, shared so the two can never
    * disagree. */
  private def gridArgminCell(qv: Column, centroids: Seq[Seq[Long]]): Column = {
    val cLit = array(centroids.zipWithIndex.map { case (cv, cid) =>
      struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
    }: _*)
    aggregate(cLit,
      struct(lit(Long.MaxValue).as("d"), lit(-1).as("cid")),
      (acc, c) => {
        val d2 = aggregate(
          zip_with(qv, c.getField("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x)
        when(d2 < acc.getField("d"),
          struct(d2.as("d"), c.getField("cid").as("cid"))).otherwise(acc)
      }).getField("cid")
  }

  /** Serve-time cell assignment for a [[kmeansFit]] artifact: quantize
    * each vector with the trainer's round(v·quantScale) and argmin the
    * exact integer squared distance over the k grid centroids, ties to
    * the smaller cell id — the trainer's own metric and conventions, so
    * train-time and serve-time assignments agree bit-for-bit (the
    * SemDeDup / IVF-routing wiring). One scan-side projection; the
    * centroid table is a k×d literal. */
  def kmeansAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Long]],
                   quantScale: Long = 1000000L,
                   cellCol: String = "_cell"): DataFrame = {
    require(centroids.nonEmpty, "kmeansAssign needs at least one centroid")
    df.withColumn("_kq",
        transform(col(vecCol), x => round(x.cast("double") * quantScale).cast("long")))
      .withColumn(cellCol, gridArgminCell(col("_kq"), centroids))
      .drop("_kq")
  }

  /** Additive per-cell Lloyd-update state: member counts and per-dimension
    * GRID SUMS of a corpus slice assigned to standing centroids with the
    * trainer's own literal-argmin metric ([[kmeansFit]]/[[kmeansAssign]]),
    * so maintenance and training can never disagree on a cell. ONE
    * distributed scan — per-row codegen argmin, map-side-combined
    * `groupBy(cell)` — collecting a k×(d+1) LONG artifact to the driver.
    *
    * States of DISJOINT slices are additive ([[CentroidState.fold]]):
    * base-corpus state + Σ micro-batch states = the grown corpus's state
    * exactly, so a streaming vector index repairs the quantizer drift
    * [[CorpusStats.embeddingDrift]] detects — fold each arriving batch's
    * state into the standing artifact and [[refreshCentroids]] — without
    * ever rescanning the base corpus. The same LONG-sum bound as
    * kmeansFit applies (~9·10¹² rows at |v| ≤ 1 on the 10⁶ grid). */
  def centroidBatchState(df: DataFrame, vecCol: String,
                         centroids: Seq[Seq[Long]],
                         quantScale: Long = 1000000L): CentroidState = {
    require(centroids.nonEmpty, "centroidBatchState needs standing centroids")
    val dim = centroids.head.length
    val q = df.where(col(vecCol).isNotNull)
      .select(transform(col(vecCol),
        x => round(x.cast("double") * quantScale).cast("long")).as("_qv"))
      .select(col("_qv"), gridArgminCell(col("_qv"), centroids).as("_cell"))
    val aggs = (0 until dim).map(i =>
      sum(element_at(col("_qv"), i + 1)).as(s"_s$i")) :+ count(lit(1)).as("_n")
    val rows = q.groupBy(col("_cell")).agg(aggs.head, aggs.tail: _*).collect()
    val counts = Array.fill(centroids.length)(0L)
    val sums = Array.fill(centroids.length, dim)(0L)
    rows.foreach { r =>
      val cell = r.getInt(0)
      counts(cell) = r.getLong(dim + 1)
      var i = 0
      while (i < dim) { sums(cell)(i) = r.getLong(i + 1); i += 1 }
    }
    CentroidState(counts, sums)
  }

  /** The kmeansFit update step applied to an accumulated [[CentroidState]]:
    * each non-empty cell moves to the exact round-half-away grid mean of
    * its members; empty cells KEEP their previous centroid (kmeansFit's
    * own convention). Driver arithmetic on the bounded k×d artifact. */
  def refreshCentroids(state: CentroidState,
                       prev: Seq[Seq[Long]]): Array[Array[Long]] = {
    require(state.counts.length == prev.length,
      s"state is ${state.counts.length} cells, prev is ${prev.length}")
    prev.indices.map { c =>
      val n = state.counts(c)
      if (n == 0L) prev(c).toArray
      else state.sums(c).map(s => meanQ(s, n))
    }.toArray
  }

  /** Reassignment audit for a quantizer refresh: of the corpus rows, how
    * many would land in a DIFFERENT cell under the refreshed centroids?
    * One scan carrying BOTH literal argmins — no join, no shuffle beyond
    * the 1-row aggregate. High `n_changed`/`n_total` means the cell
    * routing (IVF lists, SemDeDup cells, [[VectorIndex]] buckets) must be
    * re-encoded; low means the refresh was cosmetic. */
  def reassignmentAudit(df: DataFrame, vecCol: String,
                        oldCentroids: Seq[Seq[Long]],
                        newCentroids: Seq[Seq[Long]],
                        quantScale: Long = 1000000L): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(transform(col(vecCol),
        x => round(x.cast("double") * quantScale).cast("long")).as("_qv"))
      .select(gridArgminCell(col("_qv"), oldCentroids).as("_a"),
        gridArgminCell(col("_qv"), newCentroids).as("_b"))
      .agg(count(lit(1)).as("n_total"),
        coalesce(sum(when(col("_a") =!= col("_b"), 1L).otherwise(0L)),
          lit(0L)).as("n_changed"))

  /** Deterministic Lloyd k-means over a driver-side sample — the coarse
    * quantizer of an IVF index. The sample is bounded (caller controls it);
    * training a coarse quantizer on a sample is the standard recipe (FAISS
    * IVF does exactly this), so the driver-side loop is not a scale hazard:
    * nCells × dim floats is all that ships back to executors. */
  def trainCentroids(samples: Array[Array[Float]], nCells: Int,
                     iterations: Int = 10, seed: Long = 42L): Array[Array[Float]] = {
    require(samples.nonEmpty, "need a non-empty sample")
    val k = math.min(nCells, samples.length)
    val dim = samples.head.length
    // deterministic init: distinct sample indices from splitmix64
    val chosen = scala.collection.mutable.LinkedHashSet.empty[Int]
    var s = seed
    while (chosen.size < k) {
      s = graft.functions.TextHashing.splitmix64(s)
      chosen += java.lang.Math.floorMod(s, samples.length.toLong).toInt
    }
    var centroids = chosen.toArray.map(i => samples(i).clone())
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      samples.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      iter += 1
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      val ct = centroids(c)
      while (i < v.length) { val x = v(i) - ct(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Assign each corpus row to its nearest centroid cell (`_cell` column)
    * via the single-loop [[graft.functions.NearestCentroid]] codegen kernel
    * — no UDF in the scan path. (The earlier
    * `array_position(array(l2_dist×k), array_min(…))` composition built the
    * distance array twice through 2·k inlined loops; at nCells=16 the fused
    * stage ran ~4× slower than this kernel.) At 100 TB the result is
    * written out partitioned/bucketed by `_cell` so probes prune at the
    * source. */
  def ivfAssign(corpus: DataFrame, vecCol: String,
                centroids: Array[Array[Float]]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val dim = centroids.head.length
    val flat = new Array[Float](centroids.length * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    corpus.withColumn("_cell", GraftBridge.toColumn(
      graft.functions.NearestCentroid(
        GraftBridge.toExpression(col(vecCol)), centroids.length, dim,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(flat))))
  }

  /** The `nProbe` cell ids whose centroids are nearest `queryVec` —
    * driver-side over the (bounded, nCells × dim) quantizer. */
  private def nearestCells(centroids: Array[Array[Float]],
                           queryVec: Array[Float], nProbe: Int): Array[Int] =
    centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < queryVec.length) { val x = queryVec(j) - c(j); d += x * x; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(math.max(1, nProbe)).map(_._1)

  /** IVF probe: exact top-k restricted to the `nProbe` cells whose
    * centroids are nearest the query. Scans only ~nProbe/nCells of the
    * corpus (a partition-pruned scan once assigned data is laid out by
    * cell). Recall is tunable via nProbe, exact when nProbe = nCells. */
  def ivfSearch(assigned: DataFrame, vecCol: String, idCol: String,
                centroids: Array[Array[Float]], queryVec: Array[Float],
                k: Int, nProbe: Int): DataFrame = {
    val probeCells = nearestCells(centroids, queryVec, nProbe)
    topK(assigned.filter(col("_cell").isin(probeCells.map(Integer.valueOf): _*)),
      vecCol, idCol, queryVec, k, "cosine").drop("_cell")
  }

  /** Metadata-filtered IVF probe — every production RAG deployment filters
    * by tenant/date/ACL at query time (the reference's own index stores a
    * `date` field next to the vector for exactly this,
    * `index-creation-function/lambda_function.py:82-84`). The predicate is
    * applied BEFORE the shortlist (pre-filter pushdown into the cell scan),
    * which preserves the top-k contract over the filtered corpus: the
    * result is the exact top-k of {rows in probed cells satisfying
    * `predicate`}. The naive alternative — post-filtering an unfiltered
    * top-k — silently under-returns whenever non-matching rows occupy
    * shortlist slots (k results shrink to however many matches happened to
    * rank; DedupKnnSpec demonstrates the recall loss). Catalyst merges the
    * predicate with the cell IN-filter into one scan-side Filter, so at
    * 100 TB a cell-partitioned layout still prunes partitions first and
    * the metadata predicate (on scan-pushable columns) lands in
    * PushedFilters next to it — filter-then-score, never score-then-drop. */
  def ivfSearchFiltered(assigned: DataFrame, vecCol: String, idCol: String,
                        centroids: Array[Array[Float]], queryVec: Array[Float],
                        k: Int, nProbe: Int,
                        predicate: Column): DataFrame = {
    val probeCells = nearestCells(centroids, queryVec, nProbe)
    topK(assigned.filter(col("_cell").isin(probeCells.map(Integer.valueOf): _*))
           .filter(predicate),
      vecCol, idCol, queryVec, k, "cosine").drop("_cell")
  }

  /** knn join: for every row of `queries`, its top-k nearest corpus rows
    * (cosine; `cIdCol` must be integral). Plan shape: broadcast the (small)
    * query set against the (huge) corpus — one corpus scan, no shuffle of
    * the corpus — then per-query top-k via the bounded
    * [[graft.functions.TopKByScore]] aggregator. Partial aggregation trims
    * each input partition to k candidates per query BEFORE the exchange, so
    * the shuffle carries ≤ (partitions × queries × k) tiny (score, id)
    * rows — never the corpus. (A window rank here would shuffle the whole
    * scored product into one partition per query: the 100 TB OOM shape.) */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    val scored = corpus
      .select(col(cIdCol).cast("long").as("_cid"), col(cVecCol))
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .select(col(qIdCol), col("_cid"),
        cosine_sim(col(cVecCol), col(qVecCol)).as("_score"))
    scored.groupBy(col(qIdCol))
      .agg(topk(col("_score"), col("_cid")).as("_top"))
      .select(col(qIdCol), posexplode(col("_top")))
      .select(col(qIdCol),
        col("col.id").as(cIdCol),
        col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Contrastive hard-negative mining: for every query row, the top-k
    * most-similar corpus rows whose label DIFFERS from the query's — the
    * standard negative-selection step when building contrastive /
    * embedding-model training pairs (the "hard" negatives are the
    * near-misses that actually move the loss). Same plan shape as
    * [[knnJoin]] — broadcast the query set, one corpus scan, bounded
    * [[graft.functions.TopKByScore]] partial aggregation — with the
    * label-mismatch predicate applied BEFORE the top-k, so positives
    * never occupy shortlist slots and the mining stays a single pass.
    * Output: (qIdCol, cIdCol, score, rn). */
  def hardNegatives(queries: DataFrame, qIdCol: String, qVecCol: String,
                    qLabelCol: String,
                    corpus: DataFrame, cIdCol: String, cVecCol: String,
                    cLabelCol: String, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    val scored = corpus
      .select(col(cIdCol).cast("long").as("_cid"), col(cVecCol),
        col(cLabelCol).as("_clab"))
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol),
        col(qLabelCol).as("_qlab"))))
      // null-SAFE inequality: an unlabeled row differs from every label —
      // plain =!= would null-drop every pair of a NULL-label query,
      // silently returning it zero negatives
      .filter(!(col("_clab") <=> col("_qlab")))
      .select(col(qIdCol), col("_cid"),
        cosine_sim(col(cVecCol), col(qVecCol)).as("_score"))
    scored.groupBy(col(qIdCol))
      .agg(topk(col("_score"), col("_cid")).as("_top"))
      .select(col(qIdCol), posexplode(col("_top")))
      .select(col(qIdCol),
        col("col.id").as(cIdCol),
        col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  // -------------------------------------------------------------------- PQ

  /** Train per-subspace PQ codebooks over a bounded driver-side sample —
    * the same recipe (and the same deterministic Lloyd loop) as
    * [[trainCentroids]], run independently on each of `m` contiguous
    * `dim/m`-dim subspaces. Returns `[m][ksub][dsub]`. */
  def trainPq(samples: Array[Array[Float]], m: Int, ksub: Int = 256,
              iterations: Int = 10, seed: Long = 42L): Array[Array[Array[Float]]] = {
    require(samples.nonEmpty, "need a non-empty sample")
    val dim = samples.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = samples.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      trainCentroids(sub, ksub, iterations, seed + s)
    }
  }

  /** Flatten `[m][ksub][dsub]` codebooks for the codegen kernels. Clamps
    * ksub to what training actually produced (small samples yield fewer
    * centroids than requested). */
  private def flatCodebooks(cb: Array[Array[Array[Float]]]): (Array[Float], Int, Int, Int) = {
    val m = cb.length; val ksub = cb.head.length; val dsub = cb.head.head.length
    val flat = new Array[Float](m * ksub * dsub)
    for (s <- 0 until m; j <- 0 until ksub)
      System.arraycopy(cb(s)(j), 0, flat, (s * ksub + j) * dsub, dsub)
    (flat, m, ksub, dsub)
  }

  /** Append the `codesCol` byte column (one byte per subspace) — the
    * encode-at-ingest step. At 100 TB the codes table (plus ids) is what a
    * probe scans: m bytes/row instead of 4·dim. */
  def pqEncode(corpus: DataFrame, vecCol: String,
               codebooks: Array[Array[Array[Float]]],
               codesCol: String = "_pq"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val (flat, m, ksub, dsub) = flatCodebooks(codebooks)
    corpus.withColumn(codesCol, GraftBridge.toColumn(
      graft.functions.PqEncode(GraftBridge.toExpression(col(vecCol)), m, ksub, dsub,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(flat))))
  }

  /** ADC distance of each row's PQ codes to `queryVec` under a
    * driver-built lookup table (approximate squared l2). */
  def pqAdcScore(codesCol: Column, codebooks: Array[Array[Array[Float]]],
                 queryVec: Array[Float]): Column = {
    import org.apache.spark.sql.GraftBridge
    val m = codebooks.length; val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var d = 0.0; var t = 0
        while (t < dsub) {
          val qi = s * dsub + t
          val x = (if (qi < queryVec.length) queryVec(qi) else 0.0f) - codebooks(s)(j)(t)
          d += x * x; t += 1
        }
        lut(s * ksub + j) = d
        j += 1
      }
      s += 1
    }
    GraftBridge.toColumn(graft.functions.PqAdcScore(
      GraftBridge.toExpression(codesCol), m, ksub,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(lut)))
  }

  /** PQ ANN probe: ADC-score every row's codes (m byte lookups/row — the
    * 100 TB scan path reads codes, never float vectors), keep the
    * `shortlist` best via TakeOrderedAndProject, then exact cosine re-rank
    * of the shortlist to top-k. Recall is tunable via `shortlist`
    * (shortlist = corpus size ≡ exact). `corpus` may already carry a
    * `_pq` codes column (encode-at-ingest); otherwise codes are computed
    * on the fly from `vecCol`. Pre-encoded codes MUST come from these same
    * `codebooks`: a code ≥ ksub fails fast in the ADC kernel, but codes
    * from a different equal-shape codebook are indistinguishable and score
    * garbage — version your codes column with its codebook at ingest.
    * Null-embedding rows carry null codes/scores and sort AFTER every
    * scored row (`asc_nulls_last`), so they can never evict real
    * candidates from the shortlist. */
  def pqSearch(corpus: DataFrame, vecCol: String, idCol: String,
               codebooks: Array[Array[Array[Float]]], queryVec: Array[Float],
               k: Int, shortlist: Int = 64): DataFrame = {
    val coded =
      if (corpus.columns.contains("_pq")) corpus
      else pqEncode(corpus, vecCol, codebooks)
    val short = coded
      .withColumn("_adc", pqAdcScore(col("_pq"), codebooks, queryVec))
      .orderBy(col("_adc").asc_nulls_last, col(idCol).asc)
      .limit(math.max(k, shortlist))
    topK(short, vecCol, idCol, queryVec, k, "cosine").drop("_pq", "_adc")
  }

  /** IVF-PQ probe — the composed batch-ANN recipe (coarse quantizer ×
    * product quantizer, as in FAISS's IndexIVFPQ): prune to the `nProbe`
    * nearest cells, ADC-score only those rows' PQ codes, shortlist, exact
    * cosine re-rank. At 100 TB the codes table is laid out partitioned by
    * `_cell`, so a probe reads ~nProbe/nCells of an already m-bytes-per-row
    * table — cell pruning cuts the rows scanned, PQ cuts the bytes per row,
    * and the two compose multiplicatively. `assigned` must carry the
    * `_cell` column from [[ivfAssign]]; a pre-encoded `_pq` column is
    * reused (encode-at-ingest), otherwise codes are computed from `vecCol`
    * — the same codebook-versioning caveat as [[pqSearch]] applies. */
  def ivfPqSearch(assigned: DataFrame, vecCol: String, idCol: String,
                  centroids: Array[Array[Float]],
                  codebooks: Array[Array[Array[Float]]],
                  queryVec: Array[Float], k: Int,
                  nProbe: Int, shortlist: Int = 64): DataFrame = {
    val probeCells = nearestCells(centroids, queryVec, nProbe)
    val pruned = assigned.filter(col("_cell").isin(probeCells.map(Integer.valueOf): _*))
    pqSearch(pruned, vecCol, idCol, codebooks, queryVec, k, shortlist).drop("_cell")
  }

  /** One point of an [[annRecallCurve]]: mean recall@k of the IVF and
    * IVF-PQ probes at `nProbe`, and the mean fraction of corpus rows the
    * probed cells make the scan read (the cost axis). */
  final case class AnnCurvePoint(nProbe: Int, recallIvf: Double,
                                 recallIvfPq: Double, scanFrac: Double)

  /** Recall@k vs probe-cost curve for the IVF / IVF-PQ indexes against
    * brute-force truth — the index-tuning evidence a deployment reads
    * before picking nProbe (the FAISS-benchmark recall/QPS plot's batch
    * analogue). For each query: truth = exact cosine top-k over the full
    * corpus; per nProbe, recall = |ann ∩ truth| / k averaged over queries,
    * and scan_frac = Σ|probed cells| / n from the (≤ nCells-row) cell
    * histogram — the rows a cell-partitioned layout actually reads.
    *
    * IVF recall is provably monotone in nProbe: probed cells are a PREFIX
    * of the centroid-distance order (stable sort), so the candidate set
    * only grows, and a truth id in the candidates can only be evicted
    * from the exact-rerank top-k by globally-better rows — of which there
    * are < k by definition. IVF-PQ holds the `shortlist` fixed, so its
    * curve isolates the cell-pruning axis the same way.
    *
    * Driver-side loop over queries × nProbes (each iteration a bounded
    * k-row job): the curve is an OFFLINE index-build diagnostic over a
    * bounded query panel, not a serving path — `queries` is small by
    * contract (the [[trainCentroids]] bounded-sample stance). `assigned`
    * must carry `_cell`; codes are encoded once and cached across the
    * whole sweep. */
  def annRecallCurve(assigned: DataFrame, vecCol: String, idCol: String,
                     centroids: Array[Array[Float]],
                     codebooks: Array[Array[Array[Float]]],
                     queries: Seq[Array[Float]], k: Int,
                     nProbes: Seq[Int],
                     shortlist: Int = 64): Seq[AnnCurvePoint] = {
    require(queries.nonEmpty, "need at least one query")
    require(nProbes.nonEmpty, "need at least one nProbe")
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val coded = pqEncode(assigned, vecCol, codebooks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = coded.count().toDouble
      val hist = coded.groupBy(col("_cell")).agg(count(lit(1)).as("_n"))
        .collect()
        .map(r => r.getAs[Number](0).intValue() -> r.getLong(1)).toMap
      def ids(df: DataFrame): Set[Long] =
        df.select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
      val truth = queries.map(qv => ids(topK(coded, vecCol, idCol, qv, k)))
      nProbes.map { p =>
        var rIvf = 0.0; var rPq = 0.0; var frac = 0.0
        queries.indices.foreach { qi =>
          val qv = queries(qi)
          frac += nearestCells(centroids, qv, p)
            .map(c => hist.getOrElse(c, 0L)).sum / n
          rIvf += (ids(ivfSearch(coded, vecCol, idCol, centroids, qv, k, p))
            intersect truth(qi)).size.toDouble / k
          rPq += (ids(ivfPqSearch(coded, vecCol, idCol, centroids, codebooks,
            qv, k, p, shortlist)) intersect truth(qi)).size.toDouble / k
        }
        val q = queries.size.toDouble
        AnnCurvePoint(p, r6(rIvf / q), r6(rPq / q), r6(frac / q))
      }
    } finally coded.unpersist()
  }

  /** One point of an [[annShortlistCurve]]: mean IVF-PQ recall@k at
    * (nProbe, shortlist). */
  final case class ShortlistCurvePoint(nProbe: Int, shortlist: Int,
                                       recallIvfPq: Double)

  /** The SECOND axis of the ANN tuning evidence — recall@k vs SHORTLIST
    * for the IVF-PQ probe at fixed nProbe values, against the same
    * brute-force truth as [[annRecallCurve]]. The nProbe sweep alone
    * cannot tell "PQ quantization loss" apart from "shortlist too small":
    * a recall plateau under growing nProbe may just mean the truth ids are
    * ADC-scored well enough to reach the candidate set but the shortlist
    * is too short to hold them. Reading BOTH curves resolves it — if
    * recall climbs with shortlist at fixed nProbe, the shortlist was the
    * binding constraint; if it plateaus at shortlist = corpus, what
    * remains is genuine quantization loss (at full shortlist the ADC
    * ordering is irrelevant: every probed row reaches the exact re-rank).
    *
    * Recall is monotone non-decreasing in shortlist BY THE SAME PREFIX
    * THEOREM as nProbe: the shortlist is a prefix of the deterministic
    * ADC order (ties broken by id), so the candidate set only grows, and
    * the exact re-rank can only improve. At nProbe = nCells and shortlist
    * ≥ corpus size the probe degenerates to exact search (recall 1.0).
    *
    * Same offline-diagnostic stance as [[annRecallCurve]]: driver loop
    * over a bounded query panel, codes encoded once and cached. */
  def annShortlistCurve(assigned: DataFrame, vecCol: String, idCol: String,
                        centroids: Array[Array[Float]],
                        codebooks: Array[Array[Array[Float]]],
                        queries: Seq[Array[Float]], k: Int,
                        nProbes: Seq[Int],
                        shortlists: Seq[Int]): Seq[ShortlistCurvePoint] = {
    require(queries.nonEmpty, "need at least one query")
    require(nProbes.nonEmpty && shortlists.nonEmpty,
      "need at least one nProbe and one shortlist")
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val coded = pqEncode(assigned, vecCol, codebooks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def ids(df: DataFrame): Set[Long] =
        df.select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
      val truth = queries.map(qv => ids(topK(coded, vecCol, idCol, qv, k)))
      for (p <- nProbes.toSeq; sl <- shortlists) yield {
        var r = 0.0
        queries.indices.foreach { qi =>
          r += (ids(ivfPqSearch(coded, vecCol, idCol, centroids, codebooks,
            queries(qi), k, p, sl)) intersect truth(qi)).size.toDouble / k
        }
        ShortlistCurvePoint(p, sl, r6(r / queries.size))
      }
    } finally coded.unpersist()
  }
}
