package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.GraftBridge

/** Column-API and SQL-registry facade for graft's custom expressions.
  *
  * Column functions work without registration; `registerAll(spark)` also
  * exposes them to `spark.sql(...)` under the same names.
  */
object GraftFunctions {
  private def e(c: Column): Expression = GraftBridge.toExpression(c)
  private def col(x: Expression): Column = GraftBridge.toColumn(x)

  def cosine_sim(a: Column, b: Column): Column = col(CosineSimilarity(e(a), e(b)))
  def l2_dist(a: Column, b: Column): Column   = col(L2Distance(e(a), e(b)))
  def dot_product(a: Column, b: Column): Column = col(DotProduct(e(a), e(b)))
  def max_sim(q: Column, d: Column): Column = col(MaxSim(e(q), e(d)))
  def fnv64(c: Column): Column                = col(Fnv64(e(c)))
  def simhash64(tokens: Column): Column       = col(SimHash64(e(tokens)))
  def minhash_sig(tokens: Column, k: Int): Column = col(MinHashSignature(e(tokens), k))
  def minhash_bands(tokens: Column, k: Int, bands: Int): Column =
    col(MinHashBands(e(tokens), k, bands))
  def winnow_fingerprint(text: Column, ngram: Int, window: Int): Column =
    col(WinnowFingerprint(e(text), ngram, window))
  def cdc_chunks(text: Column, window: Int, maskBits: Int): Column =
    col(CdcChunks(e(text), window, maskBits))
  def trigram_buckets(text: Column, buckets: Long): Column =
    col(CharTrigramBuckets(e(text), buckets))
  def nb_trigram_argmax(text: Column, buckets: Int, lut: Array[Long],
                        priors: Array[Long]): Column =
    col(NbTrigramArgmax(e(text), buckets,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(lut),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(priors)))
  /** One-pass Aho–Corasick phrase counter: struct(hits, phrases) — total
    * overlapping lexicon-phrase occurrences + distinct phrases matched. */
  def ac_count(text: Column, phrases: Seq[String]): Column =
    col(AhoCorasickCount(e(text),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(phrases.toArray)))
  /** Unigram-LM Viterbi segmentation under a driver-built lattice:
    * struct(pieces, lp) or NULL if the word is uncoverable. */
  def unigram_viterbi(word: Column, lattice: UnigramLattice): Column =
    col(UnigramViterbi(e(word), lattice))
  /** Forward–backward expected piece counts (micro units) under a
    * driver-built lattice — the soft-EM E-step: array of (piece, post)
    * or NULL if the word is uncoverable. */
  def unigram_expect(word: Column, lattice: UnigramLattice): Column =
    col(UnigramExpect(e(word), lattice))
  def word_shingles(tokens: Column, n: Int): Column = col(WordShingles(e(tokens), n))
  def sorted_intersect_count(a: Column, b: Column): Column =
    col(SortedIntersectCount(e(a), e(b)))
  def top_ngram_run(tokens: Column, n: Int): Column = col(TopNgramRun(e(tokens), n))
  def token_entropy(tokens: Column): Column = col(TokenEntropy(e(tokens)))
  def z_value(x: Column, y: Column): Column = col(ZValue(e(x), e(y)))
  def jaro_sim(a: Column, b: Column): Column = col(JaroSim(e(a), e(b)))
  def jaro_winkler(a: Column, b: Column): Column = col(JaroWinklerSim(e(a), e(b)))
  def bpe_encode(tokens: Column, merges: Column): Column =
    col(BpeEncode(e(tokens), e(merges)))
  /** bpe_encode with the trainer's collected (left, right) merge artifact
    * baked in as a literal — the production shape: nMerges-bounded
    * broadcast, parsed once at plan time. */
  def bpe_encode(tokens: Column, merges: Seq[(String, String)]): Column =
    bpe_encode(tokens,
      org.apache.spark.sql.functions.lit(merges.map { case (l, r) => s"$l $r" }.toArray))
  def unicode_norm(text: Column, form: String): Column = col(UnicodeNormalize(e(text), form))
  def strip_accents(text: Column): Column = col(StripAccents(e(text)))
  def int8_encode(vec: Column): Column = col(Int8Encode(e(vec)))
  def int8_dot(a: Column, b: Column): Column = col(Int8Dot(e(a), e(b)))

  /** Idempotent per-session SQL registration — same builder list the
    * [[graft.GraftExtensions]] session extension injects. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, _, builder) =>
      reg.createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
  }
}
