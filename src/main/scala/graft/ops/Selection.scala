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
  *  - [[selectToTokenBudget]] — the assembly step the scores feed: keep the
  *    best documents, in (score DESC, id) order, until a global token
  *    budget is exhausted — without the naive global-window sort.
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

  /** Per-document mean BIGRAM log-probability under the corpus's own
    * add-1-smoothed bigram LM — one order up from [[unigramLogProb]]
    * toward the CCNet recipe's KenLM: P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V),
    * so word-ORDER anomalies (shuffled text, keyword stuffing) now score
    * low even when every individual token is common. Output: (idCol,
    * n_bigrams, avg_logprob); docs with < 2 tokens have no bigram to
    * score and are absent. Same scaled-LONG discipline as the unigram LM:
    * per-bigram ln accumulates as round(ln·10⁶) integers, order-exact.
    *
    * Scale shape: the model table is bounded by DISTINCT BIGRAMS — unlike
    * the unigram vocab it is NOT broadcastable at corpus scale, so the
    * scoring join runs at bigram grain (the stream side carries only
    * (id, bigram) pairs, never documents); the history-count and
    * vocab-size factors fold into the model build (one groupBy + one
    * vocab-bounded join). */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tk = df.select(col(idCol), Dedup.tokens(col(textCol)).as("_tk"))
      .filter(size(col("_tk")) >= 2)
    val n = size(col("_tk"))
    // w1 rides along from construction (the zip_with lambda has it in
    // hand) — re-splitting every bigram string downstream would run a
    // per-row regex over the corpus-scale stream to recover it
    val bg = tk.select(col(idCol),
      explode(zip_with(
        slice(col("_tk"), lit(1), n - 1), slice(col("_tk"), lit(2), n - 1),
        (a, b) => struct(concat(a, lit(" "), b).as("bg"), a.as("w1")))).as("_e"))
      .select(col(idCol), col("_e.bg").as("_bg"), col("_e.w1").as("_w1"))
    val c12 = bg.groupBy(col("_bg"), col("_w1"))
      .agg(count(lit(1)).as("_c12"))
    val c1 = bg.groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
    val vRow = df.select(explode(Dedup.tokens(col(textCol))).as("_w"))
      .agg(countDistinct(col("_w")).cast("double").as("_V"))
    val model = c12.join(broadcast(c1), Seq("_w1"))
      .crossJoin(broadcast(vRow))
      .select(col("_bg"),
        round(log((col("_c12").cast("double") + lit(1.0))
          / (col("_c1").cast("double") + col("_V"))) * lit(1e6))
          .cast("long").as("_lp"))
    bg.join(model, Seq("_bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lp")).as("_s"))
      // average in integer MICRO-units, then divide: round(Σlp/n) of a
      // ≤2⁵³ integer quotient is exact in both engines, whereas
      // round(Σlp/10⁶/n, 6) lands on .xxxxxx5 half-cases (e.g. n=20,
      // Σ≡10 mod 20) where Spark's BigDecimal and DuckDB's C round
      // disagree on the binary expansion — caught at sf0.1
      .select(col(idCol), col("n_bigrams"),
        (round(col("_s").cast("double") / col("n_bigrams").cast("double"))
          .cast("long").cast("double") / lit(1e6)).as("avg_logprob"))
  }

  /** The (idCol?, w1, w2, w3, h12, h23, g3) trigram stream of `df` — one
    * zip_with pass over the token array (the [[bigramLogProb]] stance:
    * every join key rides along from construction, no downstream
    * re-splitting). Docs with < 3 tokens contribute nothing. */
  private def triStream(df: DataFrame, textCol: String,
                        idCols: Seq[Column]): DataFrame = {
    val tk = df.select(idCols :+ Dedup.tokens(col(textCol)).as("_tk"): _*)
      .filter(size(col("_tk")) >= 3)
    val n = size(col("_tk"))
    val z = zip_with(
      zip_with(slice(col("_tk"), lit(1), n - 2),
        slice(col("_tk"), lit(2), n - 2),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      slice(col("_tk"), lit(3), n - 2),
      (ab, c) => struct(ab.getField("w1").as("w1"),
        ab.getField("w2").as("w2"), c.as("w3")))
    tk.select(idCols :+ explode(z).as("_e"): _*)
      .select(idCols ++ Seq(
        col("_e.w1").as("_w1"), col("_e.w2").as("_w2"),
        col("_e.w3").as("_w3"),
        concat_ws(" ", col("_e.w1"), col("_e.w2")).as("_h12"),
        concat_ws(" ", col("_e.w2"), col("_e.w3")).as("_h23"),
        concat_ws(" ", col("_e.w1"), col("_e.w2"), col("_e.w3")).as("_g3")): _*)
  }

  /** Per-document mean trigram log-probability under an interpolated
    * KNESER-NEY LM trained on `train` — the real CCNet rung above
    * [[bigramLogProb]] (public arithmetic: Kneser & Ney 1995 absolute
    * discounting with CONTINUATION counts at the lower orders, the Chen
    * & Goodman 1999 interpolated formulation KenLM implements):
    *
    *   P(w3|w1w2) = (max(c(w1w2w3)−D, 0) + D·N1+(w1w2·)·P(w3|w2)) / c(w1w2·)
    *   P(w3|w2)   = (max(N1+(·w2w3)−D, 0) + D·N1+(w2·)·P(w3)) / N1+(·w2·)
    *   P(w3)      = (N1+(·w3) + 1) / (N1+(··) + V + 1)
    *
    * with fixed discount D, all N1+ counts over DISTINCT trigram types of
    * the training stream (a frequent-only-in-one-context word — "Francisco"
    * — gets a LOW continuation weight even though its raw count is high:
    * the whole point of KN over add-k), and the base distribution add-1
    * smoothed over continuation types (KenLM's interpolate-with-uniform
    * analogue — reserves mass for out-of-vocabulary words instead of
    * ln(0)). Backoff at score time: an unseen history w1w2 falls to
    * P(w3|w2); an unseen w2 falls to P(w3) (left joins + when, exercised
    * by the held-out-perplexity unit; on self-scoring every branch is a
    * hit and the when-guards are identities).
    *
    * Output: (idCol, n_trigrams, avg_logprob) — the [[bigramLogProb]]
    * scaled-LONG discipline: per-trigram round(ln·10⁶) integers, integer
    * micro-average, order-exact. Docs with < 3 tokens absent.
    *
    * Scale shape: the model lives at N-GRAM grain, never broadcast (the
    * bigram-LM join discipline — trigram-type tables are corpus-sized
    * artifacts): the score stream carries only (id, grams), the five
    * model joins all key on n-gram/unigram types, and the only doc-grain
    * exchange is the final per-doc sum. Every model table derives from
    * ONE trigram-type aggregate (t123), which Spark's ReuseExchange
    * dedupes across the five consumers. */
  def knLogProb(train: DataFrame, score: DataFrame, textCol: String,
                idCol: String, d: Double = 0.75): DataFrame =
    knScore(knTrain(train, textCol), score, textCol, idCol, d)

  /** Trained KN model as ONE persistable, grain-tagged frame — the KenLM
    * artifact discipline (train once, materialize, score many runs;
    * before r18 `knLogProb(df, df, …)` retrained per call). Schema:
    * (groupCols…, grain, _k, _c1, _c2) with grain ∈
    * {trig, hist, cont, mid, uni, nv}:
    *
    *  - trig: _k = trigram type,  _c1 = c(w1w2w3)         — PRUNABLE
    *  - hist: _k = history w1w2,  _c1 = c(w1w2·), _c2 = N1+(w1w2·)
    *  - cont: _k = w2w3,          _c1 = N1+(·w2w3)
    *  - mid:  _k = w2,            _c1 = N1+(·w2·), _c2 = N1+(w2·)
    *  - uni:  _k = w3,            _c1 = N1+(·w3)
    *  - nv:   _k = "",            _c1 = N1+(··), _c2 = V
    *
    * Pruning (`minCount`): only the TRIGRAM grain is thresholded — the
    * KenLM count-pruning shape: a pruned trigram scores through the
    * already-present backoff path (hist hits, trig misses →
    * p = D·N1+(w1w2·)·P(w3|w2) / c(w1w2·), the count-0 value), and every
    * lower-order table keeps its unpruned statistics, so pruning can only
    * LOWER a scored trigram's probability (max(c−D,0)/c(w1w2·) ≥ 0 mass
    * is dropped, the interpolation weight stays) — held-out log-prob is
    * therefore monotone non-increasing in `minCount`, which SelectionSpec
    * pins. The trigram grain is the corpus-sized table; pruning it is
    * where the artifact shrinks.
    *
    * `groupCols` trains ONE INDEPENDENT model per group value (the CCNet
    * per-language shape): every grain gains the group key, nothing is
    * shared across groups. Scale shape unchanged from the fused
    * formulation: all six grains derive from ONE trigram-type aggregate
    * (ReuseExchange dedupes it across the union branches), each grain is
    * a map-side-combined aggregate at its own n-gram grain, nothing is
    * corpus-×-group sized beyond the trigram types themselves. */
  def knTrain(train: DataFrame, textCol: String, minCount: Long = 1L,
              groupCols: Seq[String] = Nil): DataFrame =
    // r20 §2.4: materialize the trigram-type aggregate ONCE. The six
    // grain branches below each reference t123, and Spark's ReuseExchange
    // does NOT dedupe them once the branches sit under different
    // broadcast/aggregate parents — the r19 q_kn_logprob plan scanned and
    // trigram-exploded the corpus SIX times (plans/r20/
    // q_kn_logprob_before.txt: six `Scan parquet` + `Generate` chains).
    // A lazy localCheckpoint pins one scan + one type-grain shuffle; every
    // grain then aggregates the bounded type table. A real pipeline
    // writes the type table to storage at this seam (it IS the
    // incremental artifact — see [[knTypes]]); the checkpoint is the
    // in-session equivalent, inside the timed region.
    // CLUSTER CAVEAT (r20 verdict): localCheckpoint stores blocks
    // unreplicated on executor storage and severs lineage — on a real
    // cluster an executor loss fails the job. Fine on local[*]; a
    // cluster deployment should write the type table to reliable storage
    // (or use reliable `checkpoint()`) at this seam instead.
    // r21 §2.6 NEGATIVE RESULT (journal): widening the pinned type table
    // to the session's parallelism (Par.widen by _g3) before the
    // checkpoint was implemented and measured WORSE at sf0.1/local[32]
    // (interleaved PairTimer: q_kn_logprob 2.14 → 3.03 s, q_kn_curate
    // 2.90 → 4.15 s). The six grain aggregates' map sides are
    // allocation-heavy and contend at 32-way on this box (StageTime:
    // task-time sum inflated ~10× with no wall win), so the AQE-coalesced
    // narrow layout is the right local shape. Reverted; at cluster scale
    // the type table arrives wide from its own grain exchange anyway.
    knFromTypes(knTypes(train, textCol, groupCols).localCheckpoint(false),
      minCount, groupCols)

  /** The TRIGRAM-TYPE count table every [[knTrain]] grain derives from:
    * (groupCols…, _g3, _h12, _h23, _w2, _w3, _c123) — one row per distinct
    * trigram type with its occurrence count. This is the model's
    * INCREMENTAL seam: occurrence counts are additive over doc-disjoint
    * batches (each trigram occurrence lives in exactly one doc), so
    * folding batches with [[knUpdateTypes]] and deriving the model with
    * [[knFromTypes]] is ≡ retraining on the union BY CONSTRUCTION — while
    * the model grains themselves are NOT additive (hist/cont/mid/uni are
    * distinct-TYPE counts: a type seen in two batches must count once,
    * which summing two models would double). Maintain types, derive
    * models — the same fold discipline as [[graft.ops.Dedup]]'s
    * incremental base and the BM25 stats rows. */
  def knTypes(train: DataFrame, textCol: String,
              groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    triStream(train, textCol, g)
      .groupBy(g ++ Seq(col("_g3"), col("_h12"), col("_h23"), col("_w2"),
        col("_w3")): _*)
      .agg(count(lit(1)).as("_c123"))
  }

  /** Fold a new doc batch into a [[knTypes]] table: union + re-sum at
    * type grain. At 100 TB the prev table arrives partitioned by its
    * group keys from parquet; only the NEW batch's types shuffle at full
    * width. `prev` may be empty (the bootstrap case). */
  def knUpdateTypes(prev: DataFrame, newDocs: DataFrame, textCol: String,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols ++ Seq("_g3", "_h12", "_h23", "_w2", "_w3")
    prev.unionByName(knTypes(newDocs, textCol, groupCols))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_c123")).as("_c123"))
  }

  /** Derive the six-grain [[knTrain]] model frame from a [[knTypes]]
    * table — the second half of the incremental split (see [[knTypes]]
    * for why distinct-type statistics must be computed HERE, from the
    * folded type table, never folded themselves). */
  def knFromTypes(t123: DataFrame, minCount: Long = 1L,
                  groupCols: Seq[String] = Nil): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val g = groupCols.map(col)
    def gs(cs: Column*): Seq[Column] = g ++ cs
    val nil = lit(null).cast("long")
    def row(grain: String, k: Column, c1: Column, c2: Column) =
      gs(lit(grain).as("grain"), k.as("_k"), c1.as("_c1"), c2.as("_c2"))
    val trig = t123.filter(col("_c123") >= minCount)
      .select(row("trig", col("_g3"), col("_c123"), nil): _*)
    val hist = t123.groupBy(gs(col("_h12")): _*)
      .agg(sum(col("_c123")).as("_c1"), count(lit(1)).as("_c2"))
      .select(row("hist", col("_h12"), col("_c1"), col("_c2")): _*)
    // cont grain = (w2,w3) continuation types; its count = distinct w1
    val contFull = t123.groupBy(gs(col("_h23"), col("_w2"), col("_w3")): _*)
      .agg(count(lit(1)).as("_ndot23"))
    val cont = contFull.select(row("cont", col("_h23"), col("_ndot23"), nil): _*)
    val mid = contFull.groupBy(gs(col("_w2")): _*)
      .agg(sum(col("_ndot23")).as("_c1"), count(lit(1)).as("_c2"))
      .select(row("mid", col("_w2"), col("_c1"), col("_c2")): _*)
    val uni = contFull.groupBy(gs(col("_w3")): _*)
      .agg(count(lit(1)).as("_c1"))
      .select(row("uni", col("_w3"), col("_c1"), nil): _*)
    val nv = (if (groupCols.isEmpty) contFull.groupBy()
              else contFull.groupBy(g: _*))
      .agg(count(lit(1)).as("_c1"), countDistinct(col("_w3")).as("_c2"))
      .select(row("nv", lit(""), col("_c1"), col("_c2")): _*)
    trig.unionByName(hist).unionByName(cont).unionByName(mid)
      .unionByName(uni).unionByName(nv)
  }

  /** Score `score` docs under a [[knTrain]] model frame (lazy or reloaded
    * from parquet — the artifact reuse path). Arithmetic and output
    * contract identical to the fused r17 formulation; `groupCols` must
    * match the model's and ride through to the output. Backoff at score
    * time is the documented left-join ladder; with pruning, a trigram
    * whose type was thresholded out hits hist but misses trig — the
    * count-0 branch the grain filters make explicit. Docs in a group
    * absent from the model have no base distribution and are absent from
    * the output (inner nv join). */
  def knScore(model: DataFrame, score: DataFrame, textCol: String,
              idCol: String, d: Double = 0.75,
              groupCols: Seq[String] = Nil): DataFrame = {
    require(d > 0.0 && d < 1.0, s"discount must be in (0,1): $d")
    val g = groupCols.map(col)
    def grain(name: String, k: String, c1: String, c2: Option[String]) =
      model.filter(col("grain") === name)
        .select(g ++ Seq(col("_k").as(k), col("_c1").as(c1)) ++
          c2.map(col("_c2").as(_)): _*)
    val trig = grain("trig", "_g3", "_c123", None)
    val hist = grain("hist", "_h12", "_c12tot", Some("_n1p12"))
    val cont = grain("cont", "_h23", "_ndot23", None)
    val mid  = grain("mid", "_w2", "_ndotw2dot", Some("_n1pw2dot"))
    val uni  = grain("uni", "_w3", "_ndotw3", None)
    val nv   = model.filter(col("grain") === "nv")
      .select(g ++ Seq(col("_c1").as("_N"), col("_c2").as("_V")): _*)
    val dd = lit(d)
    val sc = triStream(score, textCol, col(idCol) +: g)
    // REVERT JOURNAL (r20, measured): a distinct-TYPE restructure — score
    // each distinct trigram type once, then re-attach the per-type logprob
    // to the occurrence stream with one g3-keyed join (h12/h23/w2/w3 are
    // functions of g3, so it is semantics-preserving) — was implemented
    // and measured 15–30 % SLOWER at sf0.1 than the five-join ladder
    // below: the extra type-grain aggregate + re-attach join cost more
    // than the five (mostly broadcast at this scale) model joins save.
    // At 100 TB the trade may invert (each model join becomes a
    // full-width shuffle of the corpus trigram stream); re-measure there
    // before re-applying. The code below is the ORIGINAL occurrence-
    // stream ladder.
    val j0 = sc
      .join(trig, groupCols :+ "_g3", "left")
      .join(hist, groupCols :+ "_h12", "left")
      .join(cont, groupCols :+ "_h23", "left")
      .join(mid, groupCols :+ "_w2", "left")
      .join(uni, groupCols :+ "_w3", "left")
    val j = if (groupCols.isEmpty) j0.crossJoin(broadcast(nv))
            else j0.join(broadcast(nv), groupCols)
    val p1 = (coalesce(col("_ndotw3"), lit(0L)).cast("double") + lit(1.0)) /
      (col("_N").cast("double") + col("_V").cast("double") + lit(1.0))
    val p2 = when(col("_ndotw2dot").isNull, p1).otherwise(
      (greatest(coalesce(col("_ndot23"), lit(0L)).cast("double") - dd,
        lit(0.0)) + dd * col("_n1pw2dot").cast("double") * p1) /
        col("_ndotw2dot").cast("double"))
    val p3 = when(col("_c12tot").isNull, p2).otherwise(
      (greatest(coalesce(col("_c123"), lit(0L)).cast("double") - dd,
        lit(0.0)) + dd * col("_n1p12").cast("double") * p2) /
        col("_c12tot").cast("double"))
    j.select(col(idCol) +: (g :+ (round(log(p3) * lit(1e6)).cast("long")
        .as("_lp"))): _*)
      .groupBy(col(idCol) +: g: _*)
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_lp")).as("_s"))
      .select(col(idCol) +: (g ++ Seq(col("n_trigrams"),
        (round(col("_s").cast("double") / col("n_trigrams").cast("double"))
          .cast("long").cast("double") / lit(1e6)).as("avg_logprob"))): _*)
  }

  /** [[knLogProb]] scoring the corpus under its own KN LM — the
    * perplexity-proxy quality gate, like [[bigramLogProb]]. */
  def knLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame =
    knLogProb(df, df, textCol, idCol)

  /** Select documents in priority order until a global token budget is hit:
    * keep exactly those rows whose running token total — over the total
    * order (scoreCol DESC, idCol ASC) — stays ≤ `budget`. The "assemble the
    * best N tokens" step every training-data pipeline ends with.
    *
    * Scale shape: the naive formulation is a GLOBAL unpartitioned window
    * (one task sorts the corpus — the exact anti-pattern WindowExec warns
    * about). Instead: (1) one aggregate gets min/max score + grand total;
    * (2) rows bucket into `buckets` fixed-width score ranges, descending,
    * and per-bucket token totals collect to the driver (≤ `buckets` rows —
    * bounded, like the k-means sample); (3) the driver finds the single
    * BOUNDARY bucket where the cumulative crosses the budget — every
    * earlier bucket is selected wholesale, every later bucket rejected
    * wholesale, with no sort at all; (4) only the boundary bucket (~1/
    * `buckets` of the data) pays an exact prefix-sum window against the
    * remaining budget. Skew note: a single score value shared by > 1/
    * `buckets` of the corpus concentrates the boundary bucket — recurse the
    * same split on the boundary slice if that tail matters.
    *
    * Token counts must be ≥ 0 (running totals are assumed monotone). Rows
    * with a NULL score or token count are dropped — they have no place in
    * the priority order. Returns the input schema, filtered; `total ≤
    * budget` short-circuits to the input unchanged. */
  def selectToTokenBudget(df0: DataFrame, idCol: String, tokCol: String,
                          scoreCol: String, budget: Long,
                          buckets: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    // MATERIALIZE the input once (lazy — the first action below computes
    // it): the op drives two driver-scheduled aggregates (range+total,
    // per-bucket totals) plus the final filtered output, and without the
    // checkpoint Spark recomputes the caller's upstream pipeline for
    // EACH — q_unigram_budget paid the corpus-wide Viterbi segmentation
    // three times over (the r19 verdict's one weak mark; the lrTrain
    // "materialize features first" stance). Callers pass the narrow
    // (id, tok, score) projection, so the cached bytes are ~24/row even
    // at 100 TB corpus scale.
    val df = df0.filter(col(scoreCol).isNotNull && col(tokCol).isNotNull)
      .localCheckpoint(false)
    val stats = df.agg(
      min(col(scoreCol)).cast("double"), max(col(scoreCol)).cast("double"),
      sum(col(tokCol)).cast("long")).head()
    if (stats.isNullAt(0)) return df.limit(0)
    val (mn, mx, total) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    if (total <= budget) return df
    // bucket 0 = best scores; equal scores always share a bucket, and
    // bucket id is monotone in descending score, so global priority order
    // is (bucket ASC, score DESC, id ASC)
    val width = (mx - mn) / buckets
    val bucketCol =
      if (width == 0.0) lit(0)
      else least(lit(buckets - 1), greatest(lit(0),
        floor((lit(mx) - col(scoreCol).cast("double")) / lit(width)).cast("int")))
    val withB = df.withColumn("_tb", bucketCol)
    val btots = withB.groupBy(col("_tb"))
      .agg(sum(col(tokCol)).cast("long").as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cum = 0L; var boundary = -1; var before = 0L
    var i = 0
    while (i < buckets && boundary < 0) {
      val t = btots.getOrElse(i, 0L)
      if (cum + t > budget) { boundary = i; before = cum } else cum += t
      i += 1
    }
    // total > budget guarantees some bucket crosses
    val keepWhole = withB.filter(col("_tb") < boundary)
    val remaining = budget - before
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val keepBoundary = withB.filter(col("_tb") === boundary)
      .withColumn("_run", sum(col(tokCol)).over(w))
      .filter(col("_run") <= remaining)
      .drop("_run")
    keepWhole.unionByName(keepBoundary).drop("_tb")
  }

  /** Mixture assembly: [[selectToTokenBudget]] with a PER-GROUP budget —
    * "50 % web / 30 % code / 20 % books, by tokens" as explicit per-domain
    * token budgets. Within each group, keep rows whose running token total
    * over (scoreCol DESC, idCol ASC) stays ≤ that group's budget; groups
    * absent from `budgets` are dropped (the mixture spec is exhaustive).
    *
    * Scale shape: one aggregate for the global score range, one
    * per-(group, bucket) totals pass collecting ≤ |groups|·`buckets` rows
    * (groups are a driver-provided map — bounded by definition), wholesale
    * bucket pass/fail per group from the driver cumulative, and ONE
    * boundary window partitioned BY GROUP over only the per-group boundary
    * slices (~1/`buckets` of each group). No global sort; the group window
    * is keyed, so boundary work distributes across the cluster. */
  def selectToTokenBudgetByGroup(df: DataFrame, groupCol: String,
                                 idCol: String, tokCol: String,
                                 scoreCol: String, budgets: Map[String, Long],
                                 buckets: Int = 1024): DataFrame = {
    require(budgets.nonEmpty, "budgets must name at least one group")
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0: $budgets")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    // NULL score/tok rows have no place in the priority order (and would
    // null the driver-side bucket key); isin already excludes null groups.
    // Lazily checkpointed for the same reason as selectToTokenBudget:
    // two driver aggregates + the output must not re-run the upstream.
    val eligible = df.filter(col(groupCol).isin(budgets.keys.toSeq: _*) &&
      col(scoreCol).isNotNull && col(tokCol).isNotNull)
      .localCheckpoint(false)
    val stats = eligible.agg(
      min(col(scoreCol)).cast("double"), max(col(scoreCol)).cast("double")).head()
    if (stats.isNullAt(0)) return df.limit(0)
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val width = (mx - mn) / buckets
    val bucketCol =
      if (width == 0.0) lit(0)
      else least(lit(buckets - 1), greatest(lit(0),
        floor((lit(mx) - col(scoreCol).cast("double")) / lit(width)).cast("int")))
    val withB = eligible.withColumn("_tb", bucketCol)
    val btots = withB.groupBy(col(groupCol), col("_tb"))
      .agg(sum(col(tokCol)).cast("long").as("_t"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // per-group boundary bucket + remaining budget; boundary = `buckets`
    // (past the last bucket) when the whole group fits
    val bounds: Map[String, (Int, Long)] = budgets.map { case (g, budget) =>
      var cum = 0L; var boundary = buckets; var before = 0L
      var i = 0
      while (i < buckets && boundary == buckets) {
        val t = btots.getOrElse((g, i), 0L)
        if (cum + t > budget) { boundary = i; before = cum } else cum += t
        i += 1
      }
      g -> (boundary, budget - before)
    }
    val bMap = typedLit(bounds.map { case (g, (b, _)) => g -> b })
    val rMap = typedLit(bounds.map { case (g, (_, r)) => g -> r })
    val keepWhole = withB.filter(col("_tb") < element_at(bMap, col(groupCol)))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val keepBoundary = withB
      .filter(col("_tb") === element_at(bMap, col(groupCol)))
      .withColumn("_run", sum(col(tokCol)).over(w))
      .filter(col("_run") <= element_at(rMap, col(groupCol)))
      .drop("_run")
    keepWhole.unionByName(keepBoundary).drop("_tb")
  }

  /** Per-group perplexity-TERCILE bucketing — the actual CCNet step
    * (Wenzek et al. 2020): within each language, rank documents by LM
    * score and cut the population into head / middle / tail thirds; the
    * head is kept outright, the middle sampled, the tail dropped.
    * Assigns `ppl_bucket` ∈ {head, middle, tail} over the total order
    * (scoreCol DESC, idCol ASC) per group, with ntile(3) sizes (first
    * `n mod 3` terciles get the extra row) so the DuckDB oracle's
    * `ntile(3) OVER (PARTITION BY group ORDER BY score DESC, id)`
    * reproduces the assignment row-for-row. Rows with a null group or
    * score are dropped (no place in the order). Output: input schema +
    * `ppl_bucket` string.
    *
    * Scale shape: the [[selectToTokenBudgetByGroup]] histogram
    * discipline — no global sort, no per-group window over the corpus:
    * one aggregate for the score range, one per-(group, bucket) COUNT
    * pass collecting ≤ |groups|·`buckets` rows to the driver, wholesale
    * tercile assignment for every non-boundary bucket, and ONE window
    * partitioned by (group, bucket) over only the ≤ 2 boundary buckets
    * per group (~2/`buckets` of each group pays an exact row_number).
    * Skew note: a single score value shared by > 1/`buckets` of a group
    * concentrates its boundary bucket — recurse the split on that slice
    * if the tie mass matters. */
  def pplTerciles(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val eligible = df.filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
    val stats = eligible.agg(
      min(col(scoreCol)).cast("double"), max(col(scoreCol)).cast("double")).head()
    if (stats.isNullAt(0)) return df.limit(0).withColumn("ppl_bucket", lit(""))
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val width = (mx - mn) / buckets
    // bucket 0 = best scores; monotone in descending score, ties share
    val bucketCol =
      if (width == 0.0) lit(0)
      else least(lit(buckets - 1), greatest(lit(0),
        floor((lit(mx) - col(scoreCol).cast("double")) / lit(width)).cast("int")))
    val withB = eligible.withColumn("_tb", bucketCol)
    val bcnts = withB.groupBy(col(groupCol), col("_tb"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // ntile(3) sizes per group: first (n mod 3) terciles get the extra row
    final case class GB(b1: Int, before1: Long, t1: Long,
                        b2: Int, before2: Long, t2: Long)
    val bounds: Map[String, GB] = bcnts.keys.map(_._1).toSet.map { g: String =>
      val n = (0 until buckets).map(i => bcnts.getOrElse((g, i), 0L)).sum
      val q = n / 3; val r = n % 3
      val t1 = q + (if (r >= 1) 1L else 0L)
      val t2 = t1 + q + (if (r >= 2) 1L else 0L)
      // boundary bucket = first whose cumulative EXCEEDS the target;
      // sentinel `buckets` = never crossed (the whole group fits before)
      def cross(target: Long): (Int, Long) = {
        var cum = 0L; var i = 0
        while (i < buckets) {
          val t = bcnts.getOrElse((g, i), 0L)
          if (cum + t > target) return (i, cum)
          cum += t; i += 1
        }
        (buckets, cum)
      }
      val (b1, before1) = cross(t1)
      val (b2, before2) = cross(t2)
      g -> GB(b1, before1, t1, b2, before2, t2)
    }.toMap
    def m(f: GB => Long) = typedLit(bounds.map { case (g, b) => g -> f(b) })
    val b1 = m(_.b1.toLong); val b2 = m(_.b2.toLong)
    val before = typedLit(bounds.map { case (g, b) =>
      // per-boundary-bucket offset: rows before THAT bucket, keyed later
      // by which boundary the row sits in
      g -> Map(b.b1.toLong -> b.before1, b.b2.toLong -> b.before2)
    })
    val t1 = m(_.t1); val t2 = m(_.t2)
    val gB1 = element_at(b1, col(groupCol))
    val gB2 = element_at(b2, col(groupCol))
    val whole = withB
      .filter(col("_tb") =!= gB1 && col("_tb") =!= gB2)
      .withColumn("ppl_bucket",
        when(col("_tb") < gB1, lit("head"))
          .when(col("_tb") < gB2, lit("middle"))
          .otherwise(lit("tail")))
    val w = Window.partitionBy(col(groupCol), col("_tb"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val edge = withB
      .filter(col("_tb") === gB1 || col("_tb") === gB2)
      .withColumn("_rank",
        element_at(element_at(before, col(groupCol)), col("_tb").cast("long"))
          + row_number().over(w))
      .withColumn("ppl_bucket",
        when(col("_rank") <= element_at(t1, col(groupCol)), lit("head"))
          .when(col("_rank") <= element_at(t2, col(groupCol)), lit("middle"))
          .otherwise(lit("tail")))
      .drop("_rank")
    whole.unionByName(edge).drop("_tb")
  }

  /** The CCNet curation ACTION over a [[pplTerciles]]-bucketed frame —
    * the one step of Wenzek et al. 2020 that q_ccnet_buckets' assignment
    * left unimplemented (r18 verdict item 6): the HEAD tercile is kept
    * outright, the MIDDLE is *sampled* at a per-language rate, the TAIL
    * is dropped. The sampling coin is deterministic and engine-agnostic:
    * fnv64(id as decimal string) mod 64 — content-stable and seed-free,
    * so the identical row set falls out of any engine, any partitioning,
    * any run (`sampleBy`'s seeded RNG is Spark-private and cannot be
    * oracled; the q_split_by_hash stance). The modulus is a power of two,
    * so the signed-LONG (Spark pmod) and unsigned-HUGEINT (DuckDB) views
    * of the hash agree on the low 6 bits with no sign shim — the DSIR
    * 2^k-divides-2^64 argument.
    *
    * `keep64` maps group value → middle-keep threshold in 64ths (0 =
    * drop all middle, 64 = keep all); groups not in the map use
    * `defaultKeep64`. Output: the kept rows, input schema unchanged.
    *
    * Scale shape: one scan-side filter — zero joins, zero shuffles, zero
    * driver state beyond the bounded rate map (a literal). */
  def ccnetSample(bucketed: DataFrame, groupCol: String, idCol: String,
                  keep64: Map[String, Int],
                  defaultKeep64: Int = 0): DataFrame = {
    require((keep64.values ++ Seq(defaultKeep64)).forall(v => v >= 0 && v <= 64),
      s"middle-keep thresholds are 64ths, must be in [0,64]: $keep64 / $defaultKeep64")
    val thresh =
      if (keep64.isEmpty) lit(defaultKeep64.toLong)
      else coalesce(
        element_at(typedLit(keep64.map { case (k, v) => k -> v.toLong }),
          col(groupCol)),
        lit(defaultKeep64.toLong))
    val coin = pmod(graft.functions.GraftFunctions.fnv64(
      col(idCol).cast("string")), lit(64L))
    bucketed.filter(col("ppl_bucket") === "head" ||
      (col("ppl_bucket") === "middle" && coin < thresh))
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
  /** Per-group quality floor — keep the top `keepFrac` of each group's
    * rows by score: the per-SOURCE gate curation pipelines apply before
    * mixing (a global floor lets one high-scoring source crowd out entire
    * low-scoring domains; flooring within the group preserves every
    * domain's presence while dropping its worst tail). Keeps
    * ceil(keepFrac·n_g) rows per group in (score DESC, id ASC) order —
    * ties break on id, so the cut is deterministic and engine-reproducible
    * (a percent_rank gate would admit a tie-dependent, order-ambiguous
    * boundary set). Schema passes through unchanged.
    *
    * Scale shape: ONE hash(groupCol) exchange serves both windows (the
    * group-count and the row_number share the partition key); no global
    * sort, no driver state. Skew note: a group is a window partition, so
    * one giant domain sorts in one task — for web-scale single-domain
    * corpora use [[selectToTokenBudget]]'s histogram split instead; this
    * op is for the many-domain mixing stage where groups are balanced. */
  def qualityFloor(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0,1]: $keepFrac")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wg = Window.partitionBy(col(groupCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wg))
      .filter(col("_rn") <= ceil(col("_n").cast("double") * lit(keepFrac)))
      .drop("_rn", "_n")
  }

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

  /** Effective sample size of importance weights, per group — the
    * diagnostic that tells you whether [[dsirLogWeights]]-style
    * reweighting left you any data: ESS = (Σw)²/Σw² collapses toward 1
    * when a handful of documents dominate the weight mass (your "1M-doc
    * corpus" is statistically a dozen documents) and equals n when
    * weights are uniform. Report ess_ratio = ESS/n; below ~0.1 the
    * weighted sample is too degenerate to train on.
    *
    * Determinism: log-weights arrive on the round-6 grid (the dsir
    * output contract); w = exp(lw) quantizes immediately to
    * w_micro = round(w·10⁶) LONG, and both sums are exact DECIMAL(38)
    * integer sums of w_micro and w_micro² — order-independent; the 10¹²
    * scale factors cancel in (Σw)²/Σw², so ESS is one double division at
    * the end. Weights micro-rounding to 0 (lw < −14) contribute nothing;
    * a group whose every weight underflows yields null.
    *
    * Scale shape: one group-grain aggregate — nothing else. Output:
    * (group, n, ess, ess_ratio). */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
                          logWeightCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    // Overflow guard (r12 ADVICE, exactified r13 ADVICE): when
    // round(exp(lw)·10⁶) exceeds Long.MaxValue, Spark's cast would
    // silently saturate where the DuckDB oracle's CAST raises, and a few
    // saturated weights push sum(wm²) past DECIMAL(38) into null:
    // divergent/NULL ESS instead of a loud failure. Guard on the EXACT
    // quantity the cast consumes — round(exp(lw)·1e6) as a double vs
    // Long.MaxValue — rather than a hand-rounded log-space constant
    // (29.8526 was a hair below ln(Long.MaxValue/1e6) ≈ 29.85268, leaving
    // a narrow band where Spark raised but DuckDB's CAST still fit).
    val wRounded = round(exp(col(logWeightCol)) * lit(1e6))
    // (>= not >: Long.MaxValue.toDouble rounds UP to exactly 2⁶³, and a
    // double at exactly 2⁶³ still saturates on the long cast. Doubles near
    // 2⁶³ are 1024 apart, so the next value down, 2⁶³−1024, casts cleanly
    // on both engines — >= is exact.)
    val wm = when(wRounded >= lit(Long.MaxValue.toDouble),
        raise_error(concat(
          lit("effectiveSampleSize: log_weight overflows the micro-LONG weight grid: "),
          col(logWeightCol).cast("string"))))
      .otherwise(wRounded.cast("long"))
    val g = df.where(col(groupCol).isNotNull && col(logWeightCol).isNotNull)
      .select(col(groupCol).as("_g"), wm.as("_wm"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n"), sum(big(col("_wm"))).as("_sw"),
        sum(big(col("_wm")) * col("_wm")).as("_sw2"))
    val ess = ((col("_sw") * col("_sw")).cast("double")
      / col("_sw2").cast("double"))
    g.select(col("_g").as(groupCol), col("n"),
      when(col("_sw2") === 0, lit(null).cast("double"))
        .otherwise(round(ess, 6)).as("ess"),
      when(col("_sw2") === 0, lit(null).cast("double"))
        .otherwise(round(ess / col("n").cast("double"), 6)).as("ess_ratio"))
  }

  /** 2-D Pareto frontier (skyline): every row not STRICTLY dominated under
    * (minimize `minCol`, maximize `maxCol`) — b dominates a iff b.min ≤
    * a.min ∧ b.max ≥ a.max with at least one strict. The curation
    * trade-off query ("cheapest document at every quality level", "best
    * order at every date") that naive SQL states as an O(n²) NOT-EXISTS
    * self-join.
    *
    * Shape: collapse to the distinct-`minCol` grain first (per-key max,
    * one map-side-combined exchange — the only pass over the corpus),
    * then a running-max window over that collapsed table keeps keys whose
    * max strictly exceeds every earlier key's. A row survives iff its key
    * is on the front AND its value equals the key's max — a broadcast
    * equi-join back, since the front is at most |distinct minCol| rows.
    * Total: one aggregate + one join; the global-order window runs on the
    * COLLAPSED grain only (dates, price bands — thousands of rows at any
    * corpus size; pre-bucket a continuous minCol before calling).
    *
    * Equivalence to the dominance definition: a is dominated ⟺ some
    * earlier key has max ≥ a.max (strict-earlier dominance) or a's own
    * key has max > a.max (same-key dominance) — exactly the two filters.
    * Equal rows (same key, same max) don't dominate each other and are
    * all kept. */
  def paretoFront(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val dmax = df.groupBy(col(minCol).as("_x")).agg(max(col(maxCol)).as("_ymax"))
    val front = dmax
      .withColumn("_rm", max(col("_ymax")).over(
        Window.orderBy(col("_x")).rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("_rm").isNull || col("_ymax") > col("_rm"))
      .select(col("_x"), col("_ymax"))
    df.join(broadcast(front),
      df(minCol) === col("_x") && df(maxCol) === col("_ymax"))
      .drop("_x", "_ymax")
  }
}
