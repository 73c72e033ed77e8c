package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-side retrieval scoring — the engine-side stand-in for the serving
  * half of the reference's RAG loop. The reference's OpenSearch index holds
  * BOTH a `knn_vector` field and an analyzed `text` field
  * (`index-creation-function/lambda_function.py:69-96`): at query time a RAG
  * application runs keyword (BM25) search, vector knn, or the hybrid of the
  * two, fused by reciprocal rank. The knn side already exists here
  * ([[Knn]]); this object adds the keyword side and the fusion:
  *
  *  - [[bm25TopK]] — Okapi BM25 over whitespace tokens. Corpus statistics
  *    (N, Σdl, per-term document frequency) reduce to ONE broadcast row in a
  *    single aggregate pass; scoring + top-k is then one scan ending in
  *    `TakeOrderedAndProject` — per query-term work is a codegen'd array
  *    probe, no explode, no inverted-index shuffle. At 100 TB a deployment
  *    computes the stats row once per corpus snapshot and reuses it across
  *    every query (the same artifact-reuse shape as the ANN quantizers).
  *  - [[rrfFuse]] — reciprocal-rank fusion (Cormack et al. 2009), the
  *    standard hybrid-search combiner (OpenSearch ships it as the default
  *    hybrid processor). Inputs are already-reduced top-n rank lists, so
  *    the fusion join touches O(n·lists) rows regardless of corpus size.
  *
  * Determinism: ranks are assigned over `(round(score, 6) DESC, id)` so the
  * DuckDB oracle reproduces the exact ordering; RRF scores are sums of exact
  * double reciprocals 1/(k0+rank) of integer ranks — bit-identical across
  * engines given identical ranks.
  */
object Retrieval {

  /** Okapi BM25 top-k keyword retrieval over `terms` (lowercase; matching is
    * against [[Dedup.tokens]]' lowercase whitespace tokenization — the same
    * tokenization every dedup/text oracle uses).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative
    * variant of the Robertson–Sparck Jones idf).
    *
    * Output: (id, bm25 DOUBLE rounded to 6, n_matched INT), docs with at
    * least one matching term, ordered bm25 DESC then id, limited to k.
    */
  /** Tokenized view shared by the stats and scoring passes. Null-text
    * guard: size(null tokens) is -1 and would poison Σdl (the avgdl
    * statistic) — a null-text doc can match nothing, so excluding it from
    * N/avgdl matches what a NULL-skipping SQL sum computes. */
  private def tokenized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), Dedup.tokens(col(textCol)).as("_tk"))
      .withColumn("_dl", size(col("_tk")).cast("double"))

  /** The BM25 corpus-statistics row for `terms`: one row
    * (_n, _sumdl, _df0 … _df{n-1}) — corpus size, total token mass,
    * per-term document frequency. Every column is a SUM over documents, so
    * stats are ADDITIVE across disjoint corpus slices: a streaming
    * pipeline maintains an exact running row by appending per-batch rows
    * and summing ([[mergeStats]]) — the keyword-side analogue of the
    * streaming-maintained vector index, and the once-per-snapshot artifact
    * a 100 TB deployment reuses across every query. */
  def bm25Stats(df: DataFrame, textCol: String, idCol: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tk = tokenized(df, textCol, idCol)
    val dfAggs = sum(col("_dl")).as("_sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("_tk"), t), 1L).otherwise(0L))
          .cast("double").as(s"_df$i")
      }
    tk.agg(count(lit(1)).cast("double").as("_n"), dfAggs: _*)
  }

  /** Collapse appended per-batch stats rows into the single current row —
    * exact because every statistic is additive over disjoint batches. */
  def mergeStats(statsRows: DataFrame, nTerms: Int): DataFrame = {
    val sums = sum(col("_sumdl")).as("_sumdl") +:
      (0 until nTerms).map(i => sum(col(s"_df$i")).as(s"_df$i"))
    statsRows.agg(sum(col("_n")).as("_n"), sums: _*)
  }

  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKWithStats(df, textCol, idCol,
      bm25Stats(df, textCol, idCol, terms), terms, k, k1, b)

  /** Score + top-k against a PRE-BUILT stats row ([[bm25Stats]], possibly
    * streaming-maintained via [[mergeStats]]) — one scan into
    * TakeOrderedAndProject, no corpus-wide reduction at query time. */
  def bm25TopKWithStats(df: DataFrame, textCol: String, idCol: String,
                        stats: DataFrame, terms: Seq[String], k: Int,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k must be positive: $k")
    val tk = tokenized(df, textCol, idCol)
    val scored = tk.crossJoin(broadcast(stats))
    // Per-term contribution. Arithmetic shape (literal constants, operation
    // order) is mirrored verbatim by the oracle SQL so double results agree
    // bit-for-bit up to libm ln ulps — absorbed by the round-6.
    val termScore: Seq[Column] = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("_tk"), x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("_n") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / (col("_sumdl") / col("_n"))))
    }
    val matched: Column = terms.map(t =>
      when(array_contains(col("_tk"), t), 1).otherwise(0): Column)
      .reduce(_ + _)
    scored
      .select(col(idCol),
        round(termScore.reduce(_ + _), 6).as("bm25"),
        matched.cast("int").as("n_matched"))
      .filter(col("n_matched") > 0)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Multi-query BM25 retrieval join — the keyword analogue of
    * [[Knn.knnJoin]]: score a TABLE of queries against the corpus in one
    * pass and keep the top `k` docs per query. Where [[bm25TopK]] serves
    * one ad-hoc query with a scan, this is the batch-retrieval shape: the
    * corpus explodes ONCE into an inverted index at (doc, word) grain
    * (shuffled once, by word), the query table's distinct terms broadcast
    * against it (postings for non-query words are pruned BEFORE the
    * document-frequency join), and per-(query, doc) scores accumulate as
    * exact round(score·10⁶) LONGs — join-row order is nondeterministic, so
    * unlike the fixed-term-list scan the sum here must be
    * order-independent. Ranking is on the exact scaled LONG (doc id
    * tie-break), never the rounded double.
    *
    * Output: (qIdCol, idCol, bm25, rank), rank 1..k per query. Query term
    * frequency is ignored (standard Robertson for short queries); query
    * terms are the DISTINCT tokens of `qTextCol`. */
  def bm25Join(queries: DataFrame, qIdCol: String, qTextCol: String,
               corpus: DataFrame, idCol: String, textCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tk = tokenized(corpus, textCol, idCol)
    val stats = tk.agg(count(lit(1)).cast("double").as("_n"),
      sum(col("_dl")).as("_sumdl"))
    val qTerms = queries
      .filter(col(qTextCol).isNotNull)
      .select(col(qIdCol), explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("_w"))
    // prune the exploded token stream to query words BEFORE the inverted-
    // index aggregation — the broadcast semi probe is a per-row hash
    // lookup, so only matching postings ever shuffle. Locally this is
    // noise (the synthetic vocab is 31 words and query terms cover ~⅓ of
    // the token mass); at a real vocabulary the difference is the whole
    // corpus token mass vs the query-term postings.
    val relevant = tk
      .select(col(idCol), col("_dl"), explode(col("_tk")).as("_w"))
      .join(broadcast(qTerms.select("_w").distinct()), Seq("_w"), "left_semi")
      // ONE exchange serves both the tf aggregation and the df window:
      // hash(_w) satisfies the clustered-distribution requirement of
      // groupBy(id, _w, _dl) (partitioning exprs ⊆ grouping exprs) AND of
      // the term window below — letting the aggregate pick its own
      // (id, _w, _dl) exchange would force a second shuffle for the
      // window. Trade (documented): the shuffle carries raw postings
      // instead of map-side-combined tf rows, and a hot term lands on one
      // partition — acceptable for query-term-pruned postings, which are
      // probe-set-bounded, not corpus-bounded.
      .repartition(col("_w"))
      .groupBy(col(idCol), col("_w"), col("_dl"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    // postings are unique per (doc, word) by construction, so counting
    // rows per word IS the document frequency — no distinct needed. The
    // count comes from a window over the postings themselves: a separate
    // dfTab aggregate would make `relevant` a two-consumer subtree and
    // re-run the explode + semi-prune + tf aggregation from scratch
    // (measured ~2× on this query); the window re-shuffles only the
    // already-pruned postings, once, by term.
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("_w"))
    val scored = relevant
      .withColumn("_df", count(lit(1)).over(wTerm).cast("double"))
      .join(broadcast(qTerms), "_w")
      .crossJoin(broadcast(stats))
      .select(col(qIdCol), col(idCol),
        round((log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))) *
          (col("_tf") * lit(k1 + 1.0)) /
          (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / (col("_sumdl") / col("_n"))))
          ) * lit(1e6)).cast("long").as("_s"))
      // same one-exchange trick query-side: hash(qId) serves the
      // (qId, id) score aggregation and the per-query top-k window
      .repartition(col(qIdCol))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("_s")).as("_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("_score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol),
        round(col("_score").cast("double") / lit(1e6), 6).as("bm25"),
        col("rank"))
  }

  /** Reciprocal-rank fusion of already-ranked retrieval lists. Each input
    * must carry (`idCol`, `rank` starting at 1); output is
    * (id, rrf DOUBLE rounded to 6, n_lists INT) ordered rrf DESC then id,
    * limited to `k`. rrf(d) = Σ_lists 1/(k0 + rank_list(d)) — a document
    * missing from a list contributes nothing (the standard convention).
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int,
              k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k > 0 && k0 >= 0, s"bad k/k0: $k/$k0")
    val tagged = lists.map(_.select(col(idCol), col("rank")))
    tagged.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as("_rrf"),
        count(lit(1)).cast("int").as("n_lists"))
      .select(col(idCol), round(col("_rrf"), 6).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Score-NORMALIZED hybrid fusion — the other production hybrid
    * combiner next to [[rrfFuse]] (OpenSearch's `normalization-processor`
    * default: min–max per list, weighted arithmetic sum). Unlike RRF it
    * keeps score MAGNITUDE: a doc that wins its list by a mile outranks
    * one that wins by a hair, which rank-only fusion erases.
    *
    * Each input is an already-reduced top-n list carrying
    * (`idCol`, `scoreCol`) plus a caller weight. Per list:
    * norm = (s − min)/(max − min), a degenerate single-score list
    * normalizing to 1.0 (the OpenSearch convention); fused(d) =
    * Σ_lists w_l · norm_l(d), a missing doc contributing nothing.
    * Output (id, fused ROUND 6, n_lists INT), ordered fused DESC then id,
    * limited to `k`.
    *
    * Scale shape: inputs are top-n bounded by construction, so each
    * min/max is a 1-row aggregate broadcast back over its own tiny list —
    * nothing here touches a corpus. Determinism: norms are IEEE-identical
    * expressions over round-6 input scores, and the two-list weighted sum
    * is a commutative two-term add, so round-6 output matches any engine
    * evaluating the same formula. */
  def normalizedFuse(lists: Seq[(DataFrame, Double)], idCol: String,
                     scoreCol: String, k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one scored list")
    require(k > 0, s"k must be positive: $k")
    val normed = lists.map { case (df, w) =>
      val s = df.select(col(idCol), col(scoreCol).cast("double").as("_s"))
      val mm = s.agg(min(col("_s")).as("_lo"), max(col("_s")).as("_hi"))
      s.crossJoin(broadcast(mm))
        .select(col(idCol),
          (lit(w) * when(col("_hi") === col("_lo"), lit(1.0))
            .otherwise((col("_s") - col("_lo")) / (col("_hi") - col("_lo"))))
            .as("_ns"))
    }
    normed.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(col("_ns")), 6).as("fused"),
        count(lit(1)).cast("int").as("n_lists"))
      .orderBy(col("fused").desc, col(idCol))
      .limit(k)
  }

  /** Late-interaction MaxSim re-rank (ColBERT serving shape, public
    * arithmetic — Khattab & Zaharia 2020) of a BOUNDED candidate set:
    * `cands` is (qIdCol, dIdCol) pairs from a first-stage retriever
    * (ANN shortlist, BM25 top-n, [[Knn.knnJoin]]) — the multi-vector
    * O(|q|·|d|·dim) kernel runs on those pairs ONLY, never corpus ×
    * queries. Output: (qIdCol, dIdCol, maxsim, rn), rn = 1..k per query
    * over (maxsim DESC, id ASC).
    *
    * Plan shape: the candidate set and the query multi-vectors are
    * bounded by construction → both BROADCAST into one pass over the doc
    * side (the [[Knn.knnJoin]] stance: the corpus scans once, its
    * multi-vector payloads never shuffle); per-query top-k is the bounded
    * [[graft.functions.TopKByScore]] partial aggregate, so the only
    * exchange carries ≤ partitions × queries × k (score, id) rows. */
  def maxSimRerank(cands: DataFrame, queries: DataFrame, qIdCol: String,
                   qVecsCol: String, docs: DataFrame, dIdCol: String,
                   dVecsCol: String, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    val scored = docs
      .select(col(dIdCol).cast("long").as("_did"), col(dVecsCol))
      .join(broadcast(cands.select(col(qIdCol),
        col(dIdCol).cast("long").as("_did"))), Seq("_did"))
      .join(broadcast(queries.select(col(qIdCol), col(qVecsCol))), Seq(qIdCol))
      .select(col(qIdCol), col("_did"),
        graft.functions.GraftFunctions.max_sim(col(qVecsCol), col(dVecsCol))
          .as("_score"))
    scored.groupBy(col(qIdCol))
      .agg(topk(col("_score"), col("_did")).as("_top"))
      .select(col(qIdCol), posexplode(col("_top")))
      .select(col(qIdCol), col("col.id").as(dIdCol),
        col("col.score").as("maxsim"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Maximal-Marginal-Relevance re-rank of a retrieval SHORTLIST — the
    * serving-side diversity stage: greedily pick the candidate maximizing
    * λ·rel − (1−λ)·max-sim-to-already-picked, so near-duplicate hits
    * stop crowding out distinct ones. Input is a top-n (bounded by
    * construction — the collect here is O(n·d), the k-means-sample class
    * of driver read, not a corpus read); output (idCol, rn), rn = 1..k in
    * pick order.
    *
    * Determinism: relevance and pairwise similarities quantize to
    * round(cos·10⁶) LONGs and λ enters as TENTHS, so every greedy
    * comparison is pure integer arithmetic (score = λ₁₀·rel − (10−λ₁₀)·
    * maxSim, tie → smaller id) — bit-identical across engines; FP
    * differences in the underlying cosines (~10⁻¹⁵) vanish in the
    * micro-rounding. */
  def mmrRerank(shortlist: DataFrame, idCol: String, vecCol: String,
                relCol: String, k: Int, lambdaTenths: Int = 7): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be 0..10: $lambdaTenths")
    val spark = shortlist.sparkSession
    import spark.implicits._
    val rows = shortlist
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"),
        col(relCol).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      // a MERGED shortlist (union of retrievers) can repeat an id: keep
      // its best relevance — without the dedup the greedy would try to
      // pick the same id twice and exhaust the candidate pool early
      .groupBy(_._1).map { case (_, dups) => dups.maxBy(_._3) }.toArray
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round(dot / math.sqrt(na) / math.sqrt(nb) * 1e6)
    }
    val relMicro = rows.map { case (id, _, rel) => id -> math.round(rel * 1e6) }.toMap
    val vecs = rows.map(r => r._1 -> r._2).toMap
    val ids = rows.map(_._1).sorted
    val picked = scala.collection.mutable.ArrayBuffer[Long]()
    while (picked.length < math.min(k, ids.length)) {
      val best = ids.filterNot(picked.contains).minBy { c =>
        val pen =
          if (picked.isEmpty) 0L
          else picked.map(p => cosMicro(vecs(c), vecs(p))).max
        (-(lambdaTenths * relMicro(c) - (10L - lambdaTenths) * pen), c)
      }
      picked += best
    }
    picked.zipWithIndex
      .map { case (id, i) => (id, i + 1) }.toSeq.toDF(idCol, "rn")
  }

  /** Retrieval CONTEXT ASSEMBLY — the last serving step between a fused
    * shortlist and the LLM call: near-dup-drop then token-budget pack,
    * composing three already-oracled operators (a fusion ranker upstream,
    * [[Dedup.hammingNearDups]] on SimHash passage signatures,
    * [[Packing.packNextFit]] for the budget cut). A RAG caller does
    * exactly this with the reference's index output — fused hits are
    * rife with near-identical passages, and the context window is a hard
    * token budget (`…/DataStreamJob.java:172-193` writes the vectors;
    * this is what the query side does with them).
    *
    * Semantics:
    *  1. Null-text shortlist rows are DROPPED up front (they carry
    *     nothing packable and would otherwise all be Hamming-0 dups of
    *     each other); every surviving row gets a 64-bit SimHash
    *     signature of its whitespace tokens.
    *  2. Near-dup pairs within the shortlist (Hamming ≤ `maxHamming`)
    *     drop their WORSE-ranked member — so any two surviving passages
    *     are ≥ maxHamming apart (the completeness contract; a chain
    *     a~b~c with a best keeps only the members with no better-ranked
    *     partner, a deliberate conservative over-drop that stays
    *     SQL-expressible without recursion).
    *  3. Survivors pack NEXT-FIT in rank order against `budgetTokens`;
    *     the context is bin 0 — the maximal rank-prefix whose token sum
    *     fits, except the top survivor always enters (oversized flag
    *     true when it alone exceeds the budget — caller truncates).
    *
    * Keep `maxHamming` ≤ 7: the 8×8-bit chunk blocking underneath is
    * recall-EXACT through Hamming 7, so a brute-force oracle and the
    * blocked operator agree bit-for-bit (and a ≤ top-n shortlist can
    * never saturate buckets). Scale shape: everything here is top-n
    * bounded — the corpus-scale work (retrieval, fusion) happened
    * upstream; the single-partition pack is over the survivors of a
    * bounded list, never a corpus.
    *
    * Output: (idCol, ctx_pos 1.., n_tokens, cum_tokens, oversized),
    * ordered by ctx_pos — the concatenation order of the final context. */
  def assembleContext(shortlist: DataFrame, idCol: String, textCol: String,
                      rankCol: String, budgetTokens: Int,
                      maxHamming: Int = 7): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be 0..7 (exact-recall blocking range): $maxHamming")
    val W = org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.simhash64
    // Null-text shortlist rows are dropped outright (matching the DuckDB
    // oracle's `WHERE text IS NOT NULL` inner join): an empty token list
    // would simhash to 0 and make any two text-less docs Hamming-0
    // "near-dups" of each other, which is noise, not dedup.
    val base = shortlist.filter(col(textCol).isNotNull)
      .select(col(idCol), col(rankCol).cast("int").as("_rk"),
        Dedup.tokens(col(textCol)).as("_tk"))
      .withColumn("_h64", simhash64(col("_tk")))
      .withColumn("_nt", size(col("_tk")))
      // shortlist-sized artifact with three consumers (pair join both
      // sides + survivor pack) — pin it, don't replay the fusion upstream
      .localCheckpoint(true)
    val pairs = Dedup.hammingNearDups(
      base.select(col(idCol), col("_h64")), idCol, "_h64", maxHamming)
    val drops = pairs
      .join(base.select(col(idCol).as("id_a"), col("_rk").as("_ra")), "id_a")
      .join(base.select(col(idCol).as("id_b"), col("_rk").as("_rb")), "id_b")
      .select(when(col("_ra") < col("_rb"), col("id_b"))
        .otherwise(col("id_a")).as(idCol))
      .distinct()
    val survivors = base.join(drops, Seq(idCol), "left_anti")
    val packed = Packing.packNextFit(
        survivors.select(col("_rk"), col("_nt")), "_rk", "_nt",
        budgetTokens, partitions = 1)
      .filter(col("bin_id") === 0)
      .select(col("_rk").cast("int").as("_rk"), col("oversized"))
    val wR = W.orderBy(col("_rk"))
    survivors.join(packed, "_rk")
      .withColumn("ctx_pos", row_number().over(wR))
      .withColumn("cum_tokens",
        sum(col("_nt")).over(wR.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .select(col(idCol), col("ctx_pos"), col("_nt").as("n_tokens"),
        col("cum_tokens"), col("oversized"))
      .orderBy(col("ctx_pos"))
  }

  /** Attach 1-based `rank` to an already-reduced top-n list by
    * `(orderCol [DESC], idCol)` — deterministic tie-break by id. The input
    * is expected to be small (a top-n result); the single-partition window
    * this plans is over n rows, not the corpus. */
  def ranked(topN: DataFrame, idCol: String, orderCol: String,
             descending: Boolean = true): DataFrame = {
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord, col(idCol))
    topN.withColumn("rank", row_number().over(w))
  }

  /** Item-item co-occurrence with lift — the "users who touched X also
    * touched Y" recommendation table, the degenerate-but-distributed
    * collaborative filter (item-based CF, Sarwar et al. 2001 /
    * Amazon-style item-to-item).
    *
    * Per user, the DISTINCT items are capped at `maxItemsPerUser`
    * (smallest item values win — deterministic, and the cap is what keeps
    * a bot who touched the whole catalog from minting |catalog|² pairs;
    * the [[Funnel.topPaths]] maxEvents stance). Pair counts come from the
    * per-user self-join of that capped set — shuffle mass is
    * Σ_user min(items, cap)², never |users|·|catalog|. `n_a`/`n_b` are
    * item supports over the SAME capped set, so lift =
    * n_ab·U/(n_a·n_b) — exp(PMI) over user-item incidence, the
    * [[CorpusStats.pmiCollocations]] exact-integer-ratio discipline — is
    * internally consistent. Output: top `topK` pairs by
    * (n_ab DESC, item_a, item_b), with lift rounded to 1e-6. */
  def itemCooccurrence(events: DataFrame, userCol: String, itemCol: String,
                       maxItemsPerUser: Int, minPairCount: Long,
                       topK: Int): DataFrame =
    basketPairs(events, userCol, itemCol, maxItemsPerUser, minPairCount)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") * col("_U").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
      .limit(topK)

  /** Shared basket machinery for [[itemCooccurrence]] and
    * [[associationRules]]: distinct (user, item), baskets capped at
    * `maxItemsPerUser` (the skew guard — pair count is quadratic in
    * basket size), unordered co-occurrence counts with per-item supports
    * and the basket total `_U` riding along. */
  private def basketPairs(events: DataFrame, userCol: String,
                          itemCol: String, maxItemsPerUser: Int,
                          minPairCount: Long): DataFrame = {
    require(maxItemsPerUser >= 2, s"maxItemsPerUser must be ≥ 2: $maxItemsPerUser")
    val W = org.apache.spark.sql.expressions.Window
    val ui = events.select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .distinct()
      .withColumn("_rn", row_number().over(
        W.partitionBy(col("_u")).orderBy(col("_i"))))
      .filter(col("_rn") <= maxItemsPerUser)
      .select(col("_u"), col("_i"))
    val users = ui.agg(countDistinct(col("_u")).as("_U"))
    val support = ui.groupBy(col("_i")).agg(count(lit(1)).as("_n"))
    ui.select(col("_u"), col("_i").as("item_a"))
      .join(ui.select(col("_u"), col("_i").as("item_b")), Seq("_u"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .join(support.select(col("_i").as("item_a"), col("_n").as("n_a")), Seq("item_a"))
      .join(support.select(col("_i").as("item_b"), col("_n").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(users))
  }

  /** Association rules — [[itemCooccurrence]] made DIRECTIONAL: each
    * frequent pair emits both `antecedent → consequent` rules with
    * support = n_ab/U, confidence = n_ab/n_ant (the direction-dependent
    * stat lift can't give), and lift. The classic market-basket /
    * next-item-suggestion miner; in a training-data pipeline it's the
    * "which labels/topics co-occur and which way does the implication
    * run" audit.
    *
    * Determinism: counts are exact integers; support/confidence/lift are
    * one divide each, round-6. Top-k by (confidence DESC, antecedent,
    * consequent) on the ROUNDED value — a total order both engines sort
    * identically. Scale shape: identical to itemCooccurrence (capped
    * baskets, pair-grain shuffle); the direction union doubles the
    * pair-grain rows only. */
  def associationRules(events: DataFrame, userCol: String, itemCol: String,
                       maxItemsPerUser: Int, minPairCount: Long,
                       topK: Int): DataFrame = {
    val p = basketPairs(events, userCol, itemCol, maxItemsPerUser, minPairCount)
    val fwd = p.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("n_ab"),
      col("n_a").as("n_ant"), col("n_b").as("n_cons"), col("_U"))
    val rev = p.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("n_ab"),
      col("n_b").as("n_ant"), col("n_a").as("n_cons"), col("_U"))
    fwd.unionByName(rev)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ant"), col("n_cons"),
        round(col("n_ab").cast("double") / col("_U").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_ant").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("_U").cast("double") /
          (col("n_ant").cast("double") * col("n_cons").cast("double")), 6)
          .as("lift"))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** Retrieval-QUALITY evaluation — recall@k, precision@k, MRR@k, and
    * graded nDCG@k for a ranked result list against a relevance-judgment
    * table: the measurement half the serving stack (bm25 / knn / RRF /
    * MMR) exists to be judged by, and the first thing a RAG operator asks
    * of an index. Inputs: `results` (qId, docId, 1-based rank — any of
    * the stack's rankers via [[ranked]]/[[bm25Join]]) and `truth`
    * (qId, docId, graded rel > 0; binary truth = all-1s).
    *
    * Per query: n_rel, hits (relevant retrieved at rank ≤ k),
    * recall_k = hits/n_rel, precision_k = hits/k, rr = 1/first relevant
    * rank within k (0 if none — MRR@k, the bounded form), and
    * nDCG@k = DCG/IDCG with gain 2^rel − 1 and discount log2(rank+1)
    * (Järvelin & Kekäläinen 2002), IDCG over the rel-DESC ideal ordering.
    * Plus ONE macro row (qId = −1): n_rel carries the query count, hits
    * the total, and each metric the macro average.
    *
    * Exactness discipline: every per-query metric is computed as a
    * round-half-away micro-integer LONG (ranks and counts are exact; the
    * only float steps are ≤ 2k log/divide terms before the rounding), and
    * the macro average is sum(LONG)/n — order-independent, so the number
    * is engine-reproducible at any parallelism. Scale: one equi-join of
    * the (already top-k-bounded) results with truth on (qId, docId), two
    * qId-grain aggregates; the ideal-ranking window partitions by qId —
    * judgment lists are per-query-bounded, never corpus-scale. */
  def retrievalEval(results: DataFrame, truth: DataFrame, qIdCol: String,
                    docIdCol: String, rankCol: String, relCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    val W = org.apache.spark.sql.expressions.Window
    val mic = lit(1000000.0)
    def micLong(c: Column): Column = graft.SparkEntry.roundAway(c).cast("long")
    val rel = truth.filter(col(relCol) > 0)
      .select(col(qIdCol), col(docIdCol), col(relCol).cast("int").as("_rel"))
    val wI = W.partitionBy(col(qIdCol)).orderBy(col("_rel").desc, col(docIdCol))
    val ideal = rel.withColumn("_i", row_number().over(wI))
      .groupBy(col(qIdCol))
      .agg(count(lit(1)).as("_n_rel"),
        sum(when(col("_i") <= k,
          (pow(lit(2.0), col("_rel")) - 1) / log2(col("_i") + 1))
          .otherwise(lit(0.0))).as("_idcg"))
    val hit = results.filter(col(rankCol) <= k)
      .join(rel, Seq(qIdCol, docIdCol))
      .groupBy(col(qIdCol))
      .agg(count(lit(1)).as("_hits"), min(col(rankCol)).as("_first"),
        sum((pow(lit(2.0), col("_rel")) - 1) / log2(col(rankCol) + 1))
          .as("_dcg"))
    val per = ideal.join(hit, Seq(qIdCol), "left_outer")
      .select(col(qIdCol), col("_n_rel"),
        coalesce(col("_hits"), lit(0L)).as("_hits"),
        micLong(coalesce(col("_hits"), lit(0L)) * mic / col("_n_rel")).as("_rec_m"),
        micLong(coalesce(col("_hits"), lit(0L)) * mic / lit(k)).as("_prec_m"),
        when(col("_first").isNull, lit(0L))
          .otherwise(micLong(mic / col("_first"))).as("_rr_m"),
        when(col("_dcg").isNull || col("_idcg") <= 0, lit(0L))
          .otherwise(micLong(mic * col("_dcg") / col("_idcg"))).as("_ndcg_m"))
    val qType = per.schema(qIdCol).dataType
    val perOut = per.select(col(qIdCol),
      col("_n_rel").as("n_rel"), col("_hits").as("hits"),
      (col("_rec_m") / mic).as("recall_k"),
      (col("_prec_m") / mic).as("precision_k"),
      (col("_rr_m") / mic).as("rr"),
      (col("_ndcg_m") / mic).as("ndcg"))
    val macroRow = per.agg(count(lit(1)).as("_nq"),
        sum(col("_hits")).as("_th"), sum(col("_rec_m")).as("_sr"),
        sum(col("_prec_m")).as("_sp"), sum(col("_rr_m")).as("_srr"),
        sum(col("_ndcg_m")).as("_sn"))
      .select(lit(-1).cast(qType).as(qIdCol),
        col("_nq").as("n_rel"), col("_th").as("hits"),
        (micLong(col("_sr") * 1.0 / col("_nq")) / mic).as("recall_k"),
        (micLong(col("_sp") * 1.0 / col("_nq")) / mic).as("precision_k"),
        (micLong(col("_srr") * 1.0 / col("_nq")) / mic).as("rr"),
        (micLong(col("_sn") * 1.0 / col("_nq")) / mic).as("ndcg"))
    perOut.unionByName(macroRow)
  }
  /** RAG grounding / attribution score — the post-generation check after
    * [[assembleContext]] hands the packed context to the model: what
    * fraction of the ANSWER's distinct word n-grams appear in the cited
    * context? Public ROUGE-precision / RAGAS-faithfulness-proxy
    * arithmetic (n-gram support, no LLM judge): a grounded answer reuses
    * the context's phrasing, a hallucinated one introduces n-grams the
    * context never contained. n = 2 (bigrams) is the standard
    * specificity/robustness trade — unigrams over-credit stopwords,
    * n ≥ 3 over-penalizes light paraphrase.
    *
    * Per row: `n_ngrams` (distinct answer n-grams), `n_grounded` (those
    * present among the context's n-grams — DISTINCT set semantics both
    * sides), `grounding_score` = n_grounded / n_ngrams rounded to 6
    * (0.0 when the answer has no n-gram). Null answer or context counts
    * as empty. Tokenization is [[Dedup.tokens]] (lowercase, whitespace);
    * n-grams are [[Dedup.shingles]] — ONE codegen pass per side, so the
    * whole score is scan-side: no shuffle, no join, linear in corpus
    * size, embarrassingly parallel at 100 TB. Thresholding (e.g. flag
    * answers under 0.5) is the caller's policy knob.
    */
  def groundingScore(df: DataFrame, answerCol: String, contextCol: String,
                     n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 8, s"n-gram order out of range: $n")
    df.withColumn("_ang",
        coalesce(Dedup.shingles(col(answerCol), n), array()))
      .withColumn("_cng",
        coalesce(Dedup.shingles(col(contextCol), n), array()))
      .withColumn("n_ngrams", size(col("_ang")).cast("long"))
      .withColumn("n_grounded",
        size(array_intersect(col("_ang"), col("_cng"))).cast("long"))
      .withColumn("grounding_score",
        when(col("n_ngrams") > 0,
          round(col("n_grounded").cast("double") / col("n_ngrams"), 6))
          .otherwise(lit(0.0)))
      .drop("_ang", "_cng")
  }

}
