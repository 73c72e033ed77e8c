package graft.functions

import scala.collection.immutable.ArraySeq

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.ops.TextAnalysis

class AhoCorasickSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force overlapping substring counts — the oracle the automaton
    * must reproduce exactly. */
  private def brute(text: String, phrases: Seq[String]): (Long, Int) = {
    val counts = phrases.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))
    }
    (counts.map(_.toLong).sum, counts.count(_ > 0))
  }

  private def acDf(texts: Seq[String], phrases: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select($"id", ac_count($"t", phrases).as("ac"))
      .select($"id", $"ac.hits", $"ac.phrases")
      .orderBy("id").as[(Long, Long, Int)].collect()

  test("textbook fixture: {he, she, his, hers} over 'ushers' = 3 overlapping hits") {
    val phrases = Seq("he", "she", "his", "hers")
    val Array((_, hits, distinct)) = acDf(Seq("ushers"), phrases)
    assert(hits === 3L)      // she@1, he@2, hers@2
    assert(distinct === 3)   // his never matches
  }

  test("overlapping occurrences all counted: 'aa' in 'aaaa' = 3; suffix phrases both emit") {
    val Array((_, h1, d1)) = acDf(Seq("aaaa"), Seq("aa"))
    assert(h1 === 3L && d1 === 1)
    // 'a' ends at 4 positions, 'aa' at 3 — the failure-chain emit rollup
    val Array((_, h2, d2)) = acDf(Seq("aaaa"), Seq("a", "aa"))
    assert(h2 === 7L && d2 === 2)
  }

  test("matches brute-force counts on a varied fixture incl. multi-byte UTF-8") {
    val phrases = Seq("batch batch", "he", "café", "é", "xyz absent", "a b")
    val texts = Seq(
      "batch batch batch stream", "the shepherd", "un café très café",
      "a b a b a", "", "no match here", "éé")
    val got = acDf(texts, phrases)
    texts.zipWithIndex.foreach { case (t, i) =>
      val (eh, ed) = brute(t, phrases)
      val (_, gh, gd) = got(i)
      assert(gh === eh, s"hits mismatch on '$t'")
      assert(gd === ed, s"distinct mismatch on '$t'")
    }
    // spot-check the interesting ones by hand: overlapping two-word phrase
    assert(got(0)._2 === 2L)   // "batch batch" twice in "batch batch batch"
    assert(got(6)._2 === 2L)   // "éé": é@0 and é@1 — multi-byte positions both hit
  }

  test("codegen ≡ interpreted on the full fixture") {
    val phrases = Seq("he", "she", "hers", "batch batch", "é")
    val texts = Seq("ushers", "batch batch batch", "échérs hé", "", "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val viaDf = df.select($"id", ac_count($"t", phrases).as("ac"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getStruct(1).getLong(0), r.getStruct(1).getInt(1)))
    val expr = AhoCorasickCount(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      ArraySeq.unsafeWrapArray(phrases.toArray))
    val interp = texts.map { t =>
      val row = expr.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getLong(0), row.getInt(1))
    }
    viaDf.zipWithIndex.foreach { case ((_, h, d), i) =>
      assert((h, d) === interp(i), s"codegen/interpreted split on '${texts(i)}'")
    }
  }

  test("byte-level matching never fires mid-code-point") {
    // '©' is 0xC2 0xA9; 'é' is 0xC3 0xA9. A phrase equal to the TAIL byte
    // string of a different char must not match: search "©" in "é".
    val Array((_, hits, _)) = acDf(Seq("é"), Seq("©"))
    assert(hits === 0L)
  }

  test("null text → null struct; empty text → zero; duplicate phrase rejected") {
    val df = Seq((1L, null: String), (2L, "")).toDF("id", "t")
      .select($"id", ac_count($"t", Seq("x")).as("ac")).orderBy("id").collect()
    assert(df(0).isNullAt(1))
    assert(df(1).getStruct(1).getLong(0) === 0L)
    intercept[IllegalArgumentException] {
      AcAutomaton.build(Seq("dup", "dup"))
    }
  }

  test("property: automaton ≡ brute force on seeded random phrase sets and texts") {
    val rnd = new scala.util.Random(180818)
    val alphabet = "abcé"
    def randStr(maxLen: Int): String =
      Seq.fill(1 + rnd.nextInt(maxLen))(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 10).foreach { trial =>
      // small alphabet forces dense overlaps, shared prefixes/suffixes,
      // and phrases embedded in each other — the failure-link hot paths
      val phrases = Seq.fill(3 + rnd.nextInt(6))(randStr(4)).distinct
      val texts = Seq.fill(8)(randStr(40))
      val got = acDf(texts, phrases)
      texts.zipWithIndex.foreach { case (t, i) =>
        val (eh, ed) = brute(t, phrases)
        assert((got(i)._2, got(i)._3) === ((eh, ed)),
          s"trial $trial text '$t' phrases $phrases")
      }
    }
  }

  test("phraseBlocklist plan: one scan, zero exchanges — lexicon size never touches the plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.phraseBlocklist(docs, "text", "doc_id",
        (1 to 500).map(i => s"phrase $i"), maxHits = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("phraseBlocklist op: verdict threshold, null docs absent, SQL surface") {
    val df = Seq((0L, "batch batch batch"), (1L, "clean text"),
      (2L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.phraseBlocklist(df, "text", "doc_id",
      Seq("batch batch", "clean"), maxHits = 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === 2)                       // null doc absent
    assert(out(0) === ((0L, 2L, 1L, true)))        // 2 overlapping hits > 1
    assert(out(1) === ((1L, 1L, 1L, false)))
    GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT ac_count('ushers', 'he|she|his|hers') AS ac").head()
    assert(viaSql.getStruct(0).getLong(0) === 3L)
  }
}
