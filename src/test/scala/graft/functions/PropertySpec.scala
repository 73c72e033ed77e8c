package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Randomized-property tests (seeded → deterministic) pinning the custom
  * kernels to naive reference implementations. */
class PropertySpec extends AnyFunSuite {

  private val words = Array("a", "bb", "ccc", "dog", "cat", "fish", "x")

  private def toArrayData(toks: Seq[String]): ArrayData =
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])

  test("WordShingles kernel equals naive sliding-window distinct shingles") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val toks = List.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
      val n = 1 + rnd.nextInt(5)
      val got = TextShingling.wordShingles(toArrayData(toks), n)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .toList.distinct
      assert(gotSeq === expected, s"toks=$toks n=$n")
    }
  }

  test("TopKByScore equals sort-take under arbitrary reduce/merge splits") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val rows = List.fill(1 + rnd.nextInt(80))(
        ScoredId((rnd.nextInt(201) - 100) / 10.0, rnd.nextInt(20).toLong))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKByScore(k)
      val (p1, p2) = rows.splitAt(rnd.nextInt(rows.size + 1))
      val b1 = p1.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val b2 = p2.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val got = agg.finish(agg.merge(b1, b2)).map(s => (s.score, s.id))
      val expected = rows.map(s => (s.score, s.id))
        .sortBy { case (score, id) => (-score, id) }.take(k)
      assert(got === expected, s"k=$k rows=${rows.size}")
    }
  }

  test("minhash band hashes are permutation- and duplication-invariant in the token set") {
    val rnd = new scala.util.Random(13)
    def bands(ts: Seq[String]): Seq[Long] = {
      val expr = MinHashBands(
        org.apache.spark.sql.catalyst.expressions.Literal.create(null,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        16, 4)
      val r = expr.nullSafeEval(toArrayData(ts)).asInstanceOf[ArrayData]
      (0 until r.numElements()).map(r.getLong)
    }
    for (_ <- 1 to 100) {
      val toks = List.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.length)))
      val shuffled = rnd.shuffle(toks)
      val duplicated = toks ++ toks.take(rnd.nextInt(toks.size + 1))
      assert(bands(toks) === bands(shuffled))
      assert(bands(toks) === bands(duplicated),
        "minhash is a set statistic — duplicate tokens must not change it")
    }
  }
}
