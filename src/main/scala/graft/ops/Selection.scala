package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Data-selection scoring for training-corpus curation — which documents to
  * KEEP, after dedup ([[Dedup]]) has decided which are copies. Both
  * operators follow the same 100 TB shape: a bounded model table (vocab /
  * feature-bucket distribution) built in one aggregate pass and BROADCAST,
  * then per-document scoring as a single scan whose only shuffle is the
  * doc-grain aggregation. Per-token log-probabilities are accumulated as
  * round(ln·10⁶) LONGs — exact, order-independent integer sums (the decSum
  * discipline), so scores hash-match the DuckDB oracle regardless of
  * accumulation order.
  *
  *  - [[unigramLogProb]] — per-doc mean token log-probability under the
  *    corpus's own unigram LM: the perplexity-proxy quality signal (the
  *    CCNet recipe scores documents with a language model and keeps the
  *    low-perplexity tail; a unigram LM is the degenerate-but-distributed
  *    case with no external model artifact). Gibberish / rare-token soup
  *    scores low; template-heavy repetition scores high — useful as both a
  *    quality gate and a repetition flag next to
  *    [[TextAnalysis.repetitionSignals]].
  *  - [[dsirLogWeights]] — Data Selection via Importance Resampling (Xie
  *    et al. 2023): log w(x) = Σ_f count_x(f)·(ln p_target(f) − ln
  *    p_raw(f)) over hashed bigram features, add-1 smoothed. Documents
  *    whose feature distribution resembles the target domain get high
  *    weights; resampling ∝ w(x) (or keeping the top tail) shifts the raw
  *    corpus toward the target without training a classifier.
  */
object Selection {

  /** Per-document mean token log-probability under the corpus unigram LM.
    *
    * Output: (idCol, n_tok, avg_logprob) — avg_logprob =
    * round(Σ round(ln(cnt_w/total)·10⁶) / 10⁶ / n_tok, 6). Documents with
    * zero tokens have no distribution to score under and are absent.
    *
    * Scale shape: the vocab table (word, scaled log-prob) is one groupBy
    * over the token stream and is bounded by vocabulary size, not corpus
    * size → broadcast to the scoring scan; the only doc-grain shuffle is
    * the final per-doc sum. */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ex = df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("_w"))
    val vocabCounts = ex.groupBy(col("_w")).agg(count(lit(1)).as("_cnt"))
    // corpus total via an unpartitioned window over the (small) vocab table
    // — computed inside the same broadcast-build job instead of a separate
    // aggregate + cross-join chain (one fewer serial job per run)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val vocab = vocabCounts
      .withColumn("_total", sum(col("_cnt")).over(wAll))
      .select(col("_w"),
        round(log(col("_cnt").cast("double") / col("_total").cast("double")) * lit(1e6))
          .cast("long").as("_lp"))
    ex.join(broadcast(vocab), "_w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("_lp")).as("_s"))
      .select(col(idCol), col("n_tok"),
        round((col("_s").cast("double") / lit(1e6)) / col("n_tok").cast("double"), 6)
          .as("avg_logprob"))
  }

  /** DSIR importance log-weights over hashed bigram features.
    *
    * Feature = fnv64(bigram) mod `buckets`; keep `buckets` a POWER OF TWO so
    * the signed-LONG (Spark) and unsigned-HUGEINT (oracle) views of the hash
    * agree without a sign shim (2^k divides 2^64). Both distributions are
    * add-1 smoothed over the bucket space: p(b) = (c(b)+1)/(C+buckets).
    *
    * Output: (idCol, n_feat, log_weight) — log_weight =
    * round(Σ_occurrences round((ln p_t(b) − ln p_r(b))·10⁶) / 10⁶, 6).
    * Documents with < 2 tokens have no bigram features and are absent.
    *
    * Scale shape: both count tables are ≤ `buckets` rows regardless of
    * corpus size (the point of feature hashing) → the log-ratio table
    * broadcasts; the target side is one filtered aggregate of the same
    * feature stream. `targetPred` selects the in-domain exemplar rows
    * (typically a small curated slice; the raw side is the whole input). */
  def dsirLogWeights(df: DataFrame, textCol: String, idCol: String,
                     targetPred: Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two for engine-agnostic hash mod: $buckets")
    val tk = df
      .select(col(idCol), targetPred.as("_in_target"),
        Dedup.tokens(col(textCol)).as("_tk"))
      .filter(size(col("_tk")) >= 2)
    val feats = tk
      .select(col(idCol), col("_in_target"), col("_tk"),
        explode(sequence(lit(0), size(col("_tk")) - 2)).as("_s"))
      .select(col(idCol), col("_in_target"),
        pmod(fnv64(concat_ws(" ",
          element_at(col("_tk"), col("_s") + 1),
          element_at(col("_tk"), col("_s") + 2))), lit(buckets.toLong))
          .as("_b"))
    // ONE aggregation pass yields both distributions (raw = every row,
    // target = the conditional sum) — target-absent buckets count 0 by
    // construction, no outer join or fill needed. The bucket list derives
    // from the raw side: a feature occurring in any doc occurs in raw.
    val counts = feats.groupBy(col("_b")).agg(
      count(lit(1)).as("_cr"),
      sum(when(col("_in_target"), 1L).otherwise(0L)).as("_ct"))
    val totals = counts.agg(sum(col("_cr")).as("_R"), sum(col("_ct")).as("_T"))
    val ratios = counts
      .crossJoin(broadcast(totals))
      .select(col("_b"),
        round((log((col("_ct") + lit(1)).cast("double") /
                   (col("_T") + lit(buckets)).cast("double")) -
               log((col("_cr") + lit(1)).cast("double") /
                   (col("_R") + lit(buckets)).cast("double"))) * lit(1e6))
          .cast("long").as("_lr"))
    feats.join(broadcast(ratios), "_b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"), sum(col("_lr")).as("_s"))
      .select(col(idCol), col("n_feat"),
        round(col("_s").cast("double") / lit(1e6), 6).as("log_weight"))
  }
}
