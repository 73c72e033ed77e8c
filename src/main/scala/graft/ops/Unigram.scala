package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, UnigramLattice}

/** SentencePiece-style UNIGRAM-LM tokenizer training (Kudo 2018, public
  * arithmetic) — the tokenizer-family rung above BPE that production data
  * pipelines actually train (r18 verdict item 4). The distributed shape:
  *
  *  1. ONE corpus-scale pass collapses the corpus to the word-frequency
  *     table (the [[TextAnalysis.bpeMerges]] stance) — everything after
  *     runs at the vocabulary grain.
  *  2. SEED vocabulary: every substring of length 1..`maxPieceLen` of
  *     every distinct word, weighted by word frequency; ALL single
  *     characters survive (the coverage floor — every training word stays
  *     segmentable), plus the top-`vocabSize` multi-char pieces by
  *     (count DESC, piece ASC) — a deterministic TakeOrdered, the public
  *     high-frequency-substring seeding.
  *  3. HARD-EM iterations (`iters`): E-step = Viterbi segmentation of
  *     each distinct word under the current piece log-probs
  *     ([[graft.functions.UnigramViterbi]] — scan-side, the AhoCorasick
  *     codegen-reference-object discipline); M-step = ONE
  *     map-side-combined aggregate of frequency-weighted piece counts,
  *     re-estimating lp(p) = ln((c(p)+1)/(C+V)) micro-quantized (add-1 so
  *     unused pieces stay usable; the lrTrain determinism stance — the
  *     model is ≤ |vocab| driver rows per iteration, the bounded-artifact
  *     class, so the whole trajectory is reproducible across engines and
  *     partitionings).
  *
  * PRUNING ([[unigramPrune]]) restricts the LATTICE without renormalizing:
  * multi-char pieces below `minCount` hard count are removed, single-char
  * pieces never are, and surviving log-probs are UNCHANGED — so any
  * word's Viterbi score under the pruned lattice is a max over a SUBSET
  * of the unpruned segmentations, and total corpus log-prob is monotone
  * non-increasing in `minCount` by construction (the KN count-pruning
  * theorem, a property of the formulation that UnigramSpec asserts).
  *
  * Scale shape: the corpus is scanned once for word counts and once per
  * scoring pass; EM iterations run over the distinct-word table (bounded
  * by vocabulary dynamics, not corpus size); the model is ≤ charset +
  * `vocabSize` rows — broadcast/reference-object sized at any corpus
  * scale; no join, no window, no per-word driver loop anywhere.
  */
object Unigram {

  /** Round half away from zero at micro grain — SQL round() semantics on
    * both engines (the Learn.micro6 convention, integer-scaled). */
  private def microLn(x: Double): Long = {
    val v = math.log(x) * 1e6
    if (v >= 0) math.round(v) else -math.round(-v)
  }

  /** The one corpus-scale pass: distinct words with occurrence counts. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_f"))

  /** Train the unigram model; returns the persistable model frame
    * (piece string, lp long micro, cnt long) — lp/cnt from the FINAL
    * EM iteration, all integers so the parquet round trip is exact (the
    * knTrain artifact discipline). */
  def unigramTrain(df: DataFrame, textCol: String, vocabSize: Int = 48,
                   maxPieceLen: Int = 4, iters: Int = 2): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = df.sparkSession
    // materialized ONCE: every EM iteration re-reads this table; without
    // the checkpoint Spark's lazy recomputation would re-run the corpus
    // explode per iteration (the bpeMerges lesson)
    val wc = wordCounts(df, textCol).localCheckpoint(true)
    val cand = wc
      .select(col("_w"), col("_f"),
        explode(sequence(lit(1), length(col("_w")))).as("_i"))
      .select(col("_w"), col("_f"), col("_i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("_w")) - col("_i") + lit(1))))
          .as("_l"))
      .select(col("_w").substr(col("_i"), col("_l")).as("_p"), col("_f"))
      .groupBy("_p").agg(sum(col("_f")).as("_cnt"))
    val singles = cand.filter(length(col("_p")) === 1)
    val multis = cand.filter(length(col("_p")) > 1)
      .orderBy(col("_cnt").desc, col("_p")).limit(vocabSize)
    // bounded collect: ≤ charset + vocabSize rows — the kmeans-centroid
    // convention; sorted so the lattice arrays are canonical
    val vocabRows = singles.unionByName(multis)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(vocabRows.nonEmpty, "unigramTrain: empty corpus")
    val pieces = vocabRows.map(_._1)
    val v = pieces.length
    val seedTotal = vocabRows.map(_._2).sum.toDouble
    var lps = vocabRows.map(r => microLn(r._2 / seedTotal))
    var cnts = new Array[Long](v)
    for (_ <- 1 to iters) {
      val lat = new UnigramLattice(pieces, lps, maxPieceLen)
      val hard = wc
        .select(col("_f"),
          GraftFunctions.unigram_viterbi(col("_w"), lat).as("_s"))
        .filter(col("_s").isNotNull)
        .select(col("_f"), explode(col("_s").getField("pieces")).as("_p"))
        .groupBy("_p").agg(sum(col("_f")).as("_c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = hard.values.sum.toDouble
      cnts = pieces.map(p => hard.getOrElse(p, 0L))
      lps = cnts.map(c => microLn((c + 1).toDouble / (total + v)))
    }
    spark.createDataFrame(
      pieces.indices.map(i => (pieces(i), lps(i), cnts(i))).toSeq)
      .toDF("piece", "lp", "cnt")
  }

  /** Lattice restriction, log-probs UNCHANGED (see object doc for why
    * that makes corpus log-prob monotone non-increasing in `minCount`):
    * multi-char pieces need `cnt >= minCount`; single chars always stay. */
  def unigramPrune(model: DataFrame, minCount: Long): DataFrame = {
    require(minCount >= 0, s"minCount must be >= 0: $minCount")
    model.filter(length(col("piece")) === 1 || col("cnt") >= minCount)
  }

  /** SOFT-EM training (Kudo 2018's actual E-step, r19 verdict item 4 —
    * the rung above [[unigramTrain]]'s hard-EM/Viterbi counts): the
    * E-step is forward–backward EXPECTED piece counts over every word's
    * segmentation lattice ([[graft.functions.UnigramExpect]] — scan-side
    * codegen, posterior mass micro-quantized per word so the
    * frequency-weighted M-step sum is exact integer arithmetic,
    * order-independent across any partitioning); the M-step re-estimates
    * lp(p) = ln((c_micro/1e6 + 1)/(C_micro/1e6 + V)) micro-rounded. The
    * α/β DP cells themselves are micro-LONG integers rounded per cell
    * (the cross-engine contract the SQL oracle replays — see
    * [[graft.functions.UnigramLattice.expectations]]).
    *
    * Same seed, same corpus-pass structure, same bounded-model shape as
    * the hard path; returned `cnt` is the MICRO expected count (1e6 ≙
    * one expected occurrence) — [[unigramPrune]]/[[unigramPruneToVocab]]
    * thresholds are in the same micro units. */
  def unigramTrainSoft(df: DataFrame, textCol: String, vocabSize: Int = 48,
                       maxPieceLen: Int = 4, iters: Int = 2): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = df.sparkSession
    val wc = wordCounts(df, textCol).localCheckpoint(true)
    val cand = wc
      .select(col("_w"), col("_f"),
        explode(sequence(lit(1), length(col("_w")))).as("_i"))
      .select(col("_w"), col("_f"), col("_i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("_w")) - col("_i") + lit(1))))
          .as("_l"))
      .select(col("_w").substr(col("_i"), col("_l")).as("_p"), col("_f"))
      .groupBy("_p").agg(sum(col("_f")).as("_cnt"))
    val singles = cand.filter(length(col("_p")) === 1)
    val multis = cand.filter(length(col("_p")) > 1)
      .orderBy(col("_cnt").desc, col("_p")).limit(vocabSize)
    val vocabRows = singles.unionByName(multis)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(vocabRows.nonEmpty, "unigramTrainSoft: empty corpus")
    val pieces = vocabRows.map(_._1)
    val v = pieces.length
    val seedTotal = vocabRows.map(_._2).sum.toDouble
    var lps = vocabRows.map(r => microLn(r._2 / seedTotal))
    var cnts = new Array[Long](v)
    for (_ <- 1 to iters) {
      val lat = new UnigramLattice(pieces, lps, maxPieceLen)
      val soft = wc
        .select(col("_f"),
          GraftFunctions.unigram_expect(col("_w"), lat).as("_e"))
        .filter(col("_e").isNotNull)
        .select(explode(col("_e")).as("_pe"), col("_f"))
        .select(col("_pe").getField("piece").as("_p"),
          (col("_f") * col("_pe").getField("post")).as("_c"))
        .groupBy("_p").agg(sum(col("_c")).as("_c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = soft.values.sum
      cnts = pieces.map(p => soft.getOrElse(p, 0L))
      lps = cnts.map(c =>
        microLn((c.toDouble / 1e6 + 1.0) / (total.toDouble / 1e6 + v)))
    }
    spark.createDataFrame(
      pieces.indices.map(i => (pieces(i), lps(i), cnts(i))).toSeq)
      .toDF("piece", "lp", "cnt")
  }

  /** Kudo's prune-to-target rung under the EXPECTED-COUNT proxy for
    * likelihood loss (a piece's posterior mass bounds what removing it
    * can cost): keep every single-char piece (the coverage floor) plus
    * the top `keepMulti` multi-char pieces by (cnt DESC, piece ASC) —
    * log-probs UNCHANGED, so the [[unigramPrune]] lattice-restriction
    * theorem applies verbatim: corpus log-prob is monotone
    * non-increasing as `keepMulti` shrinks. */
  def unigramPruneToVocab(model: DataFrame, keepMulti: Int): DataFrame = {
    require(keepMulti >= 0, s"keepMulti must be >= 0: $keepMulti")
    model.filter(length(col("piece")) === 1)
      .unionByName(model.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(keepMulti))
  }

  /** Segment + score `df` under a [[unigramTrain]] model frame (lazy,
    * pruned, or parquet-reloaded — the artifact-reuse path). Output:
    * (idCol, n_pieces, tok_logprob) per document with ≥ 1 segmentable
    * word; tok_logprob = round(Σ micro-LONG piece lp / 1e6, 6). One
    * corpus scan, one id-grain aggregate — the model is a bounded
    * reference object, never a join side.
    *
    * The DP span length is DERIVED from the model (longest piece), never
    * a caller parameter (ADVICE r19): a caller-supplied bound smaller
    * than the model's longest piece would leave those pieces in the
    * lattice but unreachable by the length-1..maxLen scan — a silently
    * different segmentation instead of an error. */
  def unigramSegment(model: DataFrame, df: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    val rows = model.select("piece", "lp").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(rows.nonEmpty, "unigramSegment: empty model")
    val lat = new UnigramLattice(rows.map(_._1), rows.map(_._2),
      rows.iterator.map(_._1.length).max)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("_w"))
      .select(col(idCol),
        GraftFunctions.unigram_viterbi(col("_w"), lat).as("_s"))
      .filter(col("_s").isNotNull)
      .groupBy(col(idCol))
      .agg(sum(size(col("_s").getField("pieces"))).cast("long").as("n_pieces"),
        round(sum(col("_s").getField("lp")).cast("double") / lit(1e6), 6)
          .as("tok_logprob"))
  }
}
