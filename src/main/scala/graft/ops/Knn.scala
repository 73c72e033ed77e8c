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
    val spark = corpus.sparkSession
    import spark.implicits._
    val qDf = Seq(Tuple1(queryVec)).toDF("qv")
      .select(hyperplaneSignature(col("qv"), dim, bands, bitsPerBand).as("qsig"))
    val qsig = qDf.head().getSeq[Long](0)
    val sig = hyperplaneSignature(col(vecCol), dim, bands, bitsPerBand)
    val matchesAnyBand = (0 until bands)
      .map(b => element_at(col("_sig"), b + 1) === lit(qsig(b)))
      .reduce(_ || _)
    val candidates = corpus.withColumn("_sig", sig).filter(matchesAnyBand).drop("_sig")
    topK(candidates, vecCol, idCol, queryVec, k, "cosine")
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
}
