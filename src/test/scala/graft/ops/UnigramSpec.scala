package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.UnigramLattice

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lattice Viterbi: hand-checked segmentation, exact LONG scores, shortest-piece tie-break") {
    // lp in micro units; "abc" coverable as a|b|c, ab|c, a|bc
    val pieces = Array("a", "ab", "b", "bc", "c")
    val lps    = Array(-3000000L, -4000000L, -3000000L, -4000000L, -3000000L)
    val lat = new UnigramLattice(pieces, lps, maxLen = 4)
    // a|b|c = -9e6; ab|c = -7e6; a|bc = -7e6 → tie between ab|c and a|bc.
    // dp(0) = max over first piece: a(-3e6)+dp(1) vs ab(-4e6)+dp(2).
    // dp(2)=c=-3e6, dp(1)=max(b+dp(2), bc+dp(3)) = max(-6e6, -4e6) = -4e6.
    // a: -3e6 + -4e6 = -7e6; ab: -4e6 + -3e6 = -7e6 → tie; SHORTEST first
    // piece wins → a | bc.
    val (segd, lp) = lat.segment("abc")
    assert(segd.map(_.toString).toSeq === Seq("a", "bc"))
    assert(lp === -7000000L)
    // unambiguous: strictly better multi-char path taken
    val lat2 = new UnigramLattice(Array("a", "b", "ab"),
      Array(-5000000L, -5000000L, -2000000L), 4)
    val (s2, lp2) = lat2.segment("abab")
    assert(s2.map(_.toString).toSeq === Seq("ab", "ab") && lp2 === -4000000L)
    // uncoverable char → null
    assert(lat2.segment("abxab") == null)
    assert(lat2.segment("") == null)
    // duplicate piece rejected at build
    intercept[IllegalArgumentException] {
      new UnigramLattice(Array("a", "a"), Array(-1L, -2L), 4)
    }
  }

  test("property: Viterbi equals brute-force max over ALL segmentations; pieces cover the word; lp = sum of piece lps") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val alphabet = "ab"
      val multis = (1 to (1 + rnd.nextInt(6))).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(2))).mkString)
        .distinct
      val pieces = (alphabet.map(_.toString) ++ multis).distinct.toArray
      val lps = pieces.map(_ => -(1L + rnd.nextInt(1000000)) * 10)
      val lpMap = pieces.zip(lps).toMap
      val lat = new UnigramLattice(pieces, lps, maxLen = 4)
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(2))).mkString
      def best(s: String): Option[Long] =
        if (s.isEmpty) Some(0L)
        else {
          val xs = (1 to math.min(4, s.length)).flatMap { l =>
            lpMap.get(s.take(l)).flatMap(lp => best(s.drop(l)).map(lp + _))
          }
          if (xs.isEmpty) None else Some(xs.max)
        }
      val got = Option(lat.segment(w))
      assert(got.map(_._2) === best(w), s"vocab=${pieces.toSeq} word=$w")
      got.foreach { case (segd, lp) =>
        assert(segd.map(_.toString).mkString === w,
          s"pieces must concatenate to the word: ${segd.toSeq} vs $w")
        assert(segd.map(s => lpMap(s.toString)).sum === lp)
      }
    }
  }

  private lazy val corpus = Seq(
    (1L, "banana bandana"),
    (2L, "banana banana band"),
    (3L, "ana band bandana"),
    (4L, "nab nab banana")).toDF("doc_id", "text")

  test("unigramTrain: deterministic under repartition; model frame round-trips parquet bit-for-bit") {
    val m1 = Unigram.unigramTrain(corpus.coalesce(1), "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
      .orderBy("piece").collect().toSeq
    val m7 = Unigram.unigramTrain(corpus.repartition(7), "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
      .orderBy("piece").collect().toSeq
    assert(m1 === m7, "micro-quantized EM must not depend on partitioning")
    // coverage floor: every corpus character survives as a single piece
    val singles = m1.filter(_.getString(0).length == 1).map(_.getString(0)).toSet
    assert(Set("a", "b", "n", "d") subsetOf singles)
    // parquet round trip exact (all-integer model)
    val model = Unigram.unigramTrain(corpus, "text", 8, 3, 2)
    val dir = java.nio.file.Files.createTempDirectory("ug-model").toString
    model.write.mode("overwrite").parquet(dir)
    val re = spark.read.parquet(dir)
    assert(model.exceptAll(re).isEmpty && re.exceptAll(model).isEmpty)
    val a = Unigram.unigramSegment(model, corpus, "text", "doc_id")
      .orderBy("doc_id").collect()
    val b = Unigram.unigramSegment(re, corpus, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(a.length === 4 && a.toSeq === b.toSeq)
  }

  test("property: forward-backward expectations match brute-force enumeration; covered mass equals word length") {
    val rnd = new scala.util.Random(29)
    var coverable = 0
    for (_ <- 1 to 300) {
      val alphabet = "ab"
      val multis = (1 to (1 + rnd.nextInt(6))).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(2))).mkString)
        .distinct
      val pieces = (alphabet.map(_.toString) ++ multis).distinct.toArray
      val lps = pieces.map(_ => -(1L + rnd.nextInt(1000000)) * 10)
      val lpMap = pieces.zip(lps).toMap
      val lat = new UnigramLattice(pieces, lps, maxLen = 4)
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(2))).mkString
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { l =>
          val p = s.take(l)
          if (lpMap.contains(p)) segs(s.drop(l)).map(p :: _) else Nil
        }
      val all = segs(w)
      val got = Option(lat.expectations(w))
      assert(got.isDefined === all.nonEmpty,
        s"coverability must agree: vocab=${pieces.toSeq} word=$w")
      got.foreach { exp =>
        coverable += 1
        // brute force, UNQUANTIZED: posterior of piece p = Σ over
        // segmentations containing p (with multiplicity) of
        // exp(score−m)/Z — the ground truth the micro-quantized DP
        // approximates to ≤ ~(word len)·1e-6 relative per cell chain
        val scores = all.map(seg => seg.map(lpMap).sum.toDouble / 1e6)
        val m = scores.max
        val weights = scores.map(x => math.exp(x - m))
        val z = weights.sum
        val bf = scala.collection.mutable.Map.empty[String, Double]
          .withDefaultValue(0.0)
        all.zip(weights).foreach { case (seg, wt) =>
          seg.foreach(p => bf(p) += wt / z)
        }
        val fb = exp.map { case (id, pm) => pieces(id) -> pm.toDouble / 1e6 }
          .toMap
        val tol = 1e-3 * (1 + w.length)
        (bf.keySet ++ fb.keySet).foreach { p =>
          assert(math.abs(bf(p) - fb.getOrElse(p, 0.0)) <= tol,
            s"posterior mismatch on '$p': bf=${bf(p)} fb=${fb.get(p)} " +
              s"vocab=${pieces.toSeq} lps=${lps.toSeq} word=$w")
        }
        // every segmentation covers each char exactly once, so
        // Σ_p len(p)·E[count(p)] must equal the word length
        val cover = fb.map { case (p, c) => p.length * c }.sum
        assert(math.abs(cover - w.length) <= tol * 4,
          s"covered mass $cover != |$w| vocab=${pieces.toSeq}")
      }
    }
    assert(coverable > 100, s"fixture degenerate: only $coverable coverable")
  }

  test("unigramTrainSoft: deterministic under repartition; parquet round trip; expected counts sane") {
    val m1 = Unigram.unigramTrainSoft(corpus.coalesce(1), "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
      .orderBy("piece").collect().toSeq
    val m7 = Unigram.unigramTrainSoft(corpus.repartition(7), "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
      .orderBy("piece").collect().toSeq
    assert(m1 === m7,
      "micro-quantized soft EM must not depend on partitioning")
    // soft counts live in micro units: the corpus has ~14 words of ~5
    // chars, so total expected piece mass is a few dozen occurrences
    val totalMicro = m1.map(_.getLong(2)).sum
    assert(totalMicro > 10L * 1000000L && totalMicro < 200L * 1000000L,
      s"implausible total expected mass: $totalMicro micro")
    val model = Unigram.unigramTrainSoft(corpus, "text", 8, 3, 2)
    val dir = java.nio.file.Files.createTempDirectory("ug-soft").toString
    model.write.mode("overwrite").parquet(dir)
    val re = spark.read.parquet(dir)
    assert(model.exceptAll(re).isEmpty && re.exceptAll(model).isEmpty)
    val seg = Unigram.unigramSegment(re, corpus, "text", "doc_id")
    assert(seg.count() === 4L)
  }

  test("unigramPruneToVocab: corpus log-prob monotone non-increasing as the kept vocab shrinks") {
    val model = Unigram.unigramTrainSoft(corpus, "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
    def totalLp(keep: Int): Double =
      Unigram.unigramSegment(Unigram.unigramPruneToVocab(model, keep),
        corpus, "text", "doc_id")
        .agg(sum(col("tok_logprob"))).head().getDouble(0)
    val grid = Seq(8, 4, 2, 0)
    val lps = grid.map(totalLp)
    lps.sliding(2).foreach { case Seq(hi, lo) =>
      assert(lo <= hi + 1e-9,
        s"shrinking the kept vocab must never raise corpus log-prob: $lps")
    case _ => }
    assert(lps.last < lps.head,
      s"singles-only segmentation should score strictly lower: $lps")
  }

  test("prune step: corpus log-prob monotone non-increasing in minCount (lattice restriction, no renorm)") {
    val model = Unigram.unigramTrain(corpus, "text",
      vocabSize = 8, maxPieceLen = 3, iters = 2)
    val counts = model.filter(length(col("piece")) > 1)
      .select("cnt").as[Long].collect().sorted
    assert(counts.nonEmpty, "fixture must learn at least one multi-char piece")
    def totalLp(minCount: Long): Double =
      Unigram.unigramSegment(Unigram.unigramPrune(model, minCount),
        corpus, "text", "doc_id")
        .agg(sum(col("tok_logprob"))).head().getDouble(0)
    val grid = Seq(0L, 1L, 2L, 4L, 8L, 1000000L)
    val lps = grid.map(totalLp)
    lps.sliding(2).foreach { case Seq(hi, lo) =>
      assert(lo <= hi + 1e-9,
        s"pruning must never raise corpus log-prob: $lps over $grid")
    case _ => }
    // the extreme prune (singles only) must be strictly worse than the
    // full lattice if any multi-char piece was ever chosen
    assert(lps.last < lps.head,
      s"singles-only segmentation should score strictly lower: $lps")
    // and every doc still segments (single-char coverage floor)
    assert(Unigram.unigramSegment(Unigram.unigramPrune(model, 1000000L),
      corpus, "text", "doc_id").count() === 4L)
  }

  test("segment contract: docs with uncoverable or no words are absent; n_pieces exact") {
    val model = Unigram.unigramTrain(corpus, "text", 8, 3, 2)
    val probe = Seq((10L, "banana"), (11L, "zzz"), (12L, "   "))
      .toDF("doc_id", "text")
    val got = Unigram.unigramSegment(model, probe, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 'z' never appeared in the corpus → no single-char floor → absent;
    // token-less doc absent
    assert(got.keySet === Set(10L))
    assert(got(10L) >= 2L && got(10L) <= 6L)
  }
}
