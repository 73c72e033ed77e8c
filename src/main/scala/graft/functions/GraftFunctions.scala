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
  def fnv64(c: Column): Column                = col(Fnv64(e(c)))
  def simhash64(tokens: Column): Column       = col(SimHash64(e(tokens)))
  def minhash_sig(tokens: Column, k: Int): Column = col(MinHashSignature(e(tokens), k))
  def minhash_bands(tokens: Column, k: Int, bands: Int): Column =
    col(MinHashBands(e(tokens), k, bands))
  def winnow_fingerprint(text: Column, ngram: Int, window: Int): Column =
    col(WinnowFingerprint(e(text), ngram, window))
  def word_shingles(tokens: Column, n: Int): Column = col(WordShingles(e(tokens), n))

  private def intArg(x: Expression, what: String): Int = x match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Idempotent per-session SQL registration. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      xs => CosineSimilarity(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_dist",
      xs => L2Distance(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      xs => DotProduct(xs(0), xs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("fnv64",
      xs => Fnv64(xs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      xs => SimHash64(xs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      xs => MinHashSignature(xs(0), intArg(xs(1), "minhash k")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      xs => MinHashBands(xs(0), intArg(xs(1), "minhash k"), intArg(xs(2), "bands")),
      "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      xs => WinnowFingerprint(xs(0), intArg(xs(1), "ngram"), intArg(xs(2), "window")),
      "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      xs => WordShingles(xs(0), intArg(xs(1), "shingle n")), "scala_udf")
  }
}
