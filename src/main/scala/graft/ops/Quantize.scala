package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the memory/bandwidth lever for
  * vector search at 100 TB: a float32 corpus scan moves 4 bytes per
  * dimension; the int8 code moves 1, and the scoring loop becomes integer
  * multiply-add. Per-vector max-abs scaling (the symmetric-quantization
  * recipe every production ANN stack uses): q_i = round(x_i · 127 / amax),
  * so each vector's full dynamic range maps onto [-127, 127] and
  * reconstruction error is bounded by amax/254 per element.
  *
  * Determinism is the design point here: quantized codes are small
  * INTEGERS, and an int8 dot product of any realistic dimensionality
  * (|dot| ≤ d·127² — fits a 53-bit mantissa for d up to ~5·10¹¹) is EXACT
  * in both integer and double arithmetic, immune to the accumulation-order
  * ULP drift that makes float scores engine-dependent. A quantized search
  * is therefore bit-reproducible across engines — which is also what makes
  * it oracle-checkable.
  *
  * Encode and dot are native codegen kernels ([[graft.functions.Int8Encode]]
  * / [[graft.functions.Int8Dot]], SQL names `int8_encode` / `int8_dot`) —
  * no UDF, no HOF-lambda re-evaluation, no driver-side work.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization of an array<float|double>
    * column: round-half-away(x · 127 / max|x|) as array<int> in
    * [-127, 127]. The all-zero vector quantizes to all zeros (guarded —
    * 127/0 would poison the row with NaNs). Codegen'd single-pass kernel
    * ([[graft.functions.Int8Encode]]): the HOF formulation re-evaluates the
    * max-abs subexpression per ELEMENT (lambdas are exempt from
    * subexpression elimination) — O(d²) per row, measured 14× slower. */
  def int8(vec: Column): Column =
    graft.functions.GraftFunctions.int8_encode(vec)

  /** The scale factor that dequantizes [[int8]] codes: x ≈ q · amax / 127.
    * Stored once per vector — the standard code-table layout. */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Exact integer dot product of two quantized vectors (LONG — see the
    * object doc for the overflow bound). Codegen'd loop kernel. */
  def dotInt(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.int8_dot(a, b)

  /** Top-k corpus rows by quantized dot product against one probe vector:
    * quantize both sides, broadcast the 1-row probe, score with the exact
    * integer dot, TakeOrderedAndProject caps the result. The scan reads
    * int8 codes — at scale, materialize `int8(vec)` once at ingest (4×
    * smaller than the float column) and probe against the codes table. */
  def topKInt8(corpus: DataFrame, vecCol: String, idCol: String,
               probe: DataFrame, k: Int): DataFrame = {
    val q = corpus.select(col(idCol), int8(col(vecCol)).as("_qv"))
    // Single-probe contract: a multi-row probe would cross-join and
    // interleave scores from different probes into one top-k. limit(1)
    // makes the contract structural rather than a runtime surprise.
    val p = probe.limit(1).select(int8(col(vecCol)).as("_pv"))
    q.join(broadcast(p))
      .select(col(idCol), dotInt(col("_qv"), col("_pv")).as("qdot"))
      .orderBy(col("qdot").desc, col(idCol))
      .limit(k)
  }

  /** Matryoshka (MRL-style) truncated retrieval: exact cosine top-k on the
    * vector PREFIX — embeddings trained with matryoshka losses keep most
    * ranking signal in their leading dimensions, so a dims-of-d prefix
    * scan reads dims/d of the vector bytes (the cheap first stage before
    * a full-dimension re-rank of the shortlist). Cosine is
    * scale-invariant, so truncation needs no re-normalization. Same
    * TakeOrderedAndProject shape as [[graft.ops.Knn.topK]]. */
  def matryoshkaTopK(corpus: DataFrame, vecCol: String, idCol: String,
                     queryVec: Array[Float], k: Int, dims: Int): DataFrame = {
    require(dims > 0 && dims <= queryVec.length,
      s"dims must be in 1..${queryVec.length}: $dims")
    Knn.topK(
      corpus.withColumn(vecCol, slice(col(vecCol), 1, dims)),
      vecCol, idCol, queryVec.take(dims), k, "cosine")
  }

  /** SIGN (1-bit) quantization — the extreme end of the compression
    * ladder next to [[int8]]: dimension i contributes bit 1 iff
    * `vec[i] ≥ 0`, packing the vector into ⌈dim/32⌉ LONG words of 32
    * bits each (32, not 64 — a `1 << 63` overflows engines with checked
    * shifts, and two `bit_count(xor)` words cost the same as one). A
    * 64-dim float vector (256 B) becomes 2 longs (16 B): at 100 TB of
    * embeddings the Hamming index fits where the float corpus cannot,
    * and the scan is XOR+popcount — no FMA, no sqrt. Sign-of-dimension
    * is the classic SimHash/LSH bit for RANDOM-projection-style
    * embeddings; the exact-integer distance also makes the cross-engine
    * oracle bit-exact. Output: input columns + `bits` ARRAY<LONG>. */
  def signPack(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be ≥ 1: $dim")
    val words = (dim + 31) / 32
    val wordCols = (0 until words).map { w =>
      val lo = w * 32
      val n = math.min(32, dim - lo)
      // Spark SQL array indexing is 0-based; shiftleft accepts a column
      // shift amount in SQL (the Scala helper pins it to Int literals)
      expr(s"aggregate(sequence(0, ${n - 1}), 0L, " +
        s"(acc, i) -> acc + IF($vecCol[i + $lo] >= 0, shiftleft(1L, i), 0L))")
    }
    df.withColumn("bits", array(wordCols: _*))
  }

  /** Hamming-distance top-k retrieval over [[signPack]]ed vectors — the
    * binary-embedding serving path: probes broadcast, ONE corpus scan
    * computes per-word `bit_count(xor)` sums, and per-probe results
    * reduce through the bounded [[graft.functions.TopKByScore]] partial
    * aggregation (map-side k-bounded buffers — never a corpus-scale
    * window sort; the [[Knn.knnJoin]] plan shape). Ties break by corpus
    * id ascending (the aggregator's (score DESC, id ASC) order with
    * score = −hamming). Output: (q_id, idCol, hamming INT, rank 1..k). */
  def hammingTopK(corpus: DataFrame, vecCol: String, idCol: String,
                  probes: DataFrame, pIdCol: String, k: Int,
                  dim: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // Null embeddings (a real condition in any 100 TB corpus: failed
    // embed calls, late backfills) would produce a null `bits` → null
    // `_score` feeding TopKByScore's non-nullable ScoredId.score — a
    // runtime crash. Drop them up front on BOTH sides, the
    // [[graft.ops.CorpusStats.embeddingDrift]] convention.
    val c = signPack(corpus.where(col(vecCol).isNotNull), vecCol, dim)
      .select(col(idCol).cast("long").as("_cid"), col("bits"))
    val p = signPack(probes.where(col(vecCol).isNotNull), vecCol, dim)
      .select(col(pIdCol).as("q_id"), col("bits").as("_pbits"))
    val topk = udaf(new graft.functions.TopKByScore(k))
    val ham = aggregate(
      zip_with(col("bits"), col("_pbits"), (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)
    c.crossJoin(broadcast(p))
      .select(col("q_id"), col("_cid"), (-ham).cast("double").as("_score"))
      .groupBy(col("q_id"))
      .agg(topk(col("_score"), col("_cid")).as("_top"))
      .select(col("q_id"), posexplode(col("_top")))
      .select(col("q_id"), col("col.id").as(idCol),
        (-col("col.score")).cast("int").as("hamming"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
