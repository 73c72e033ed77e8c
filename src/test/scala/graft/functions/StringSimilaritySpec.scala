package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._

class StringSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference values probed from DuckDB 1.x jaro_similarity /
  // jaro_winkler_similarity (the oracle engine) — byte-based comparison,
  // boost threshold 0.7, prefix cap 4, empties → 0.0
  private val cases = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8222222222222223, 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
    ("abc", "", 0.0, 0.0),
    ("", "", 0.0, 0.0),
    ("a", "a", 1.0, 1.0),
    ("ab", "ba", 0.0, 0.0),
    ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
    ("aaapppp", "ap", 0.7619047619047619, 0.7857142857142857),
    ("héllo", "hello", 0.8222222222222223, 0.8400000000000001), // BYTES: é is 2
    ("aaXXXXXXXX", "aaYYYYYYYY", 0.4666666666666666, 0.4666666666666666), // no boost ≤ 0.7
    ("ax", "ay", 0.6666666666666666, 0.6666666666666666),
    ("aaaax", "aaaay", 0.8666666666666667, 0.92),
    ("x", "y", 0.0, 0.0))

  test("jaro / jaro_winkler match the DuckDB reference values to 1e-12") {
    val got = cases.map { case (a, b, _, _) => (a, b) }.toDF("a", "b")
      .select($"a", $"b", jaro_sim($"a", $"b"), jaro_winkler($"a", $"b"))
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    for ((a, b, j, jw) <- cases) {
      val (gj, gjw) = got((a, b))
      assert(math.abs(gj - j) < 1e-12, s"jaro('$a','$b') $gj vs $j")
      assert(math.abs(gjw - jw) < 1e-12, s"jw('$a','$b') $gjw vs $jw")
    }
  }

  test("SQL surface, null propagation, symmetry") {
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT round(jaro_winkler('MARTHA','MARHTA'), 6)")
      .as[Double].head() === 0.961111)
    assert(spark.sql("SELECT jaro_sim('a', CAST(NULL AS STRING))")
      .head().isNullAt(0))
    val rnd = new scala.util.Random(5)
    val ws = Seq.fill(30)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    val df = (for (a <- ws; b <- ws) yield (a, b)).toDF("a", "b")
    // symmetry: max |jw(a,b) − jw(b,a)| == 0
    val mx = df.select(abs(jaro_winkler($"a", $"b") - jaro_winkler($"b", $"a")).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(mx === 0.0)
  }
}
