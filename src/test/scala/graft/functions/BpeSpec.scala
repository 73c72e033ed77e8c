package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** String-based reference: the trainer's own double-space replace chain
    * applied per word — the semantics BpeCodec's array scan must match. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val cps = word.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))
    var s = " " + cps.mkString("  ") + " "
    merges.foreach { case (l, r) => s = s.replace(s" $l  $r ", s" $l$r ") }
    s.trim.split("  ").toSeq
  }

  private def enc(tokens: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(tokens)).toDF("tk")
      .select(bpe_encode($"tk", merges).as("s"))
      .as[Seq[String]].collect().head

  test("greedy left-to-right within a pass: aaaa -> [aa,aa], aaa -> [aa,a]") {
    val m = Seq(("a", "a"))
    assert(enc(Seq("aaaa"), m) === Seq("aa", "aa"))
    assert(enc(Seq("aaa"), m) === Seq("aa", "a"))
    assert(enc(Seq("aaaaa"), m) === Seq("aa", "aa", "a"))
  }

  test("merge priority order decides the segmentation") {
    assert(enc(Seq("abc"), Seq(("b", "c"), ("a", "b"))) === Seq("a", "bc"))
    assert(enc(Seq("abc"), Seq(("a", "b"), ("b", "c"))) === Seq("ab", "c"))
    // a later merge consumes an earlier merge's output symbol
    assert(enc(Seq("abab"), Seq(("a", "b"), ("ab", "ab"))) === Seq("abab"))
  }

  test("merges never cross word boundaries; per-word sequences concatenate in order") {
    val m = Seq(("a", "b"))
    // "…a" + "b…" adjacent across tokens must NOT merge
    assert(enc(Seq("xa", "by"), m) === Seq("x", "a", "b", "y"))
    assert(enc(Seq("ab", "ab"), m) === Seq("ab", "ab"))
    assert(enc(Seq.empty[String], m) === Seq.empty)
  }

  test("the low/lower/newest corpus: learned merges re-segment their own corpus") {
    // trainer corpus (5×low, 2×lower, 6×newest, 3×widest — the Sennrich
    // example family); encode applies whatever it learned
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, "text", nMerges = 6)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news"))
      assert(enc(Seq(w), merges) === refEncode(w, merges), s"word=$w")
    // a fully-merged frequent word collapses to few symbols
    assert(enc(Seq("newest"), merges).length < 6)
  }

  test("property: random words under random trained merges match the replace-chain reference") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcdé𝌆"  // includes a 2-char accent and a surrogate pair
    def word() = Seq.fill(1 + rnd.nextInt(8))(
      alpha.codePoints().toArray.apply(rnd.nextInt(5))).map(
      cp => new String(Character.toChars(cp))).mkString
    val corpus = Seq.fill(120)(word())
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, "text", nMerges = 8)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = corpus.distinct.take(40)
    val got = enc(words, merges)
    val exp = words.flatMap(w => refEncode(w, merges))
    assert(got === exp)
  }

  test("SQL surface: bpe_encode registered, literal merges fold into the kernel") {
    val out = spark.sql(
      "SELECT bpe_encode(array('abab', 'ba'), array('a b', 'ab ab')) AS s")
      .as[Seq[String]].collect().head
    assert(out === Seq("abab", "b", "a"))
  }

  test("null tokens skip; malformed merge entries reject") {
    val got = Seq(Tuple1(Seq[String]("ab", null, "b")))
      .toDF("tk").select(bpe_encode($"tk", Seq(("a", "b"))).as("s"))
      .as[Seq[String]].collect().head
    assert(got === Seq("ab", "b"))
    intercept[Exception] {
      spark.sql("SELECT bpe_encode(array('ab'), array('nospace'))").collect()
    }
  }
}
