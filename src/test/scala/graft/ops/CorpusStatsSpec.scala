package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactWeightedQuantiles: crossings match a sequential replay; weight dominance") {
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(2000)((rnd.nextDouble() * 100, 1L + rnd.nextInt(50))) ++
      Seq((200.0, 100000L))   // one heavy row owns most of the mass
    val df = rows.map { case (x, w) => (x, w.toLong) }.toDF("x", "w")
      .repartition(9)
    val ps = Seq(0.1, 0.5, 0.9, 0.95, 1.0)
    val got = CorpusStats.exactWeightedQuantiles(df, "x", "w", ps)
    // sequential reference: sort, accumulate, first crossing
    val sortedRows = rows.sortBy(_._1)
    val total = rows.map(_._2).sum
    val ref = ps.map { p =>
      val t = p * total
      var cum = 0L
      sortedRows.find { case (_, w) => cum += w; cum.toDouble >= t }.get._1
    }
    assert(got === ref)
    // the heavy row owns >90% of mass -> every p >= 0.5 lands on it,
    // where the UNWEIGHTED median would sit near 50
    assert(got(1) === 200.0 && got(3) === 200.0)
    val (uq, _) = CorpusStats.exactQuantiles(df, "x", Seq(0.5))
    assert(uq.head < 110.0)
    // zero/negative weights excluded
    val z = Seq((1.0, 0L), (2.0, 5L), (3.0, -4L)).toDF("x", "w")
    assert(CorpusStats.exactWeightedQuantiles(z, "x", "w", Seq(0.5, 1.0))
      === Seq(2.0, 2.0))
    // caller order is NOT a contract: a descending/shuffled ps list must
    // return the same per-rank values as the ascending call (r9 ADVICE —
    // the in-partition scan crosses thresholds ascending and maps results
    // back by original index)
    val shuffled = Seq(0.95, 0.1, 1.0, 0.5, 0.9)
    val gotShuffled = CorpusStats.exactWeightedQuantiles(df, "x", "w", shuffled)
    val byRank = ps.zip(got).toMap
    assert(gotShuffled === shuffled.map(byRank))
  }

  test("embedding drift: orthogonal centroid shift, tie on drift dim takes min") {
    val base = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    val cur = Seq(Seq(0.0f, 1.0f)).map(Tuple1(_)).toDF("embedding")
    val got = CorpusStats.embeddingDrift(base, cur, "embedding")
      .as[(Long, Long, Double, Double, Double, Int)].collect().head
    // means (1,0) vs (0,1): cos 0, L2 sqrt(2), both dims shift 1.0 -> dim 0
    assert(got._1 === 2L && got._2 === 1L)
    assert(got._3 === 0.0)
    assert(got._4 === BigDecimal(math.sqrt(2.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._5 === 1.0 && got._6 === 0)
    // identical slices: cos 1, zero shift
    val same = CorpusStats.embeddingDrift(base, base, "embedding")
      .as[(Long, Long, Double, Double, Double, Int)].collect().head
    assert(same._3 === 1.0 && same._4 === 0.0 && same._5 === 0.0)
  }

  test("trimmed mean: symmetric outliers drop, plain mean stays poisoned") {
    val vals = (1 to 8).map(_.toDouble) ++ Seq(1000.0, -1000.0)
    val df = vals.map(v => ("a", v)).toDF("g", "x")
    val got = CorpusStats.trimmedMean(df, "g", "x", trimPermille = 100)
      .as[(String, Long, Long, Double, Double)].collect().head
    // n=10, k=1: drop -1000 and 1000 -> mean(1..8) = 4.5; raw mean 3.6
    assert(got === (("a", 10L, 1L, 3.6, 4.5)))
    // trim depth 0 = plain mean; groups fully trimmed away are absent
    val g0 = CorpusStats.trimmedMean(df, "g", "x", trimPermille = 0)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(g0._4 === g0._5 && g0._3 === 0L)
  }

  test("psiFromCounts: explicit spine keeps both-sides-empty buckets in the add-1 sum") {
    // 5 buckets; bucket 3 observed in NEITHER table, bucket 4 only in cur.
    // With unequal totals the smoothed fractions differ on EVERY bucket,
    // so dropping an empty one changes the statistic (r9 ADVICE).
    val baseC = Seq((1, 10L), (2, 30L), (5, 60L)).toDF("bucket", "cnt")
    val curC = Seq((1, 5L), (2, 5L), (4, 20L), (5, 20L)).toDF("bucket", "cnt")
    val out = CorpusStats.psiFromCounts(baseC, curC, nBuckets = 5)
      .orderBy("bucket")
      .as[(Int, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(0, 1, 2, 3, 4, 5))  // spine + total row
    def term(nb: Long, nc: Long): Double = {
      val p = (nb + 1).toDouble / 105.0; val q = (nc + 1).toDouble / 55.0
      (p - q) * (math.log(p) - math.log(q))
    }
    val byB = out.map(r => r._1 -> r._4).toMap
    assert(byB(3) === BigDecimal(term(0, 0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byB(3) != 0.0)   // the dropped-bucket term is genuinely nonzero
    val expectTotal = Seq((10L, 5L), (30L, 5L), (0L, 0L), (0L, 20L), (60L, 20L))
      .map { case (nb, nc) => term(nb, nc) }.sum
    assert(byB(0) === BigDecimal(expectTotal).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("exactQuantiles: bit-identical to Spark percentile, fused counts exact") {
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 1000 - 200) ++
      Seq.fill(50)(42.0) ++ Seq(-1e9, 1e9)   // heavy tie run + extremes
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
      .repartition(7)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.999, 1.0)
    val thr = Seq(-500.0, 0.0, 42.0, 900.0)
    val (qs, les) = CorpusStats.exactQuantiles(df, "x", ps, countAtOrBelow = thr)
    val ref = df.agg(percentile(col("x"), lit(ps.toArray))).head().getSeq[Double](0)
    // BIT-identical, not approximately: same order statistics, same
    // two-sided interpolation with the same operation order
    assert(qs.map(java.lang.Double.doubleToLongBits) ===
      ref.map(java.lang.Double.doubleToLongBits))
    val refLe = thr.map(t => vals.count(_ <= t).toLong)
    assert(les === refLe)
    // degenerate inputs: single row, all-equal rows
    val one = Seq((1L, 7.5)).toDF("id", "x")
    assert(CorpusStats.exactQuantiles(one, "x", Seq(0.0, 0.5, 1.0))._1 ===
      Seq(7.5, 7.5, 7.5))
    val same = (1 to 100).map(i => (i.toLong, 3.25)).toDF("id", "x")
    assert(CorpusStats.exactQuantiles(same, "x", Seq(0.33))._1 === Seq(3.25))
  }

  test("madOutliers: hand-planted outliers flagged, odd/even medians exact") {
    // group a (odd n): 1,2,3,4,100 -> median 3, d=|x-3|: 2,1,0,1,97 ->
    // MAD 1 -> outliers: |x-3| > 3 -> only 100
    // group b (even n): 10,20,30,40 -> median 25, d: 15,5,5,15 -> MAD 10
    // -> |x-25| > 30 -> none
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _)) ++
      Seq(10.0, 20.0, 30.0, 40.0).map(("b", _))).toDF("g", "x")
    val got = CorpusStats.madOutliers(df, "g", "x", scale = 2)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") === ((5L, 3.0, 1.0, 1L)))
    assert(got("b") === ((4L, 25.0, 10.0, 0L)))
    // 50% breakdown: mean/stddev z at 3 sigma misses 100 in a tiny group
    // where MAD catches it - and a constant group flags nothing
    val const = Seq.fill(6)(("c", 7.0)).toDF("g", "x")
    val gc = CorpusStats.madOutliers(const, "g", "x")
      .as[(String, Long, Double, Double, Long)].collect().head
    assert(gc === (("c", 6L, 7.0, 0.0, 0L)))
  }

  test("vocabCoverage: hand-computed crossings on a skewed vocabulary") {
    // counts: the 10, of 5, a 3, b 1, c 1 -> total 20
    // p=0.5 -> cum 10 at rank 1; p=0.75 -> cum 15 at rank 2;
    // p=0.95 -> 19 needed -> rank 4 (cum 19); p=1.0 -> rank 5
    val docs = Seq((1L, ("the " * 10) + ("of " * 5) + "a a a b c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(
        CorpusStats.vocabCounts(docs, "text"), Seq(0.5, 0.75, 0.95, 1.0))
      .as[(Double, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0.5) === ((1L, 10L, 20L)))
    assert(got(0.75) === ((2L, 15L, 20L)))
    assert(got(0.95) === ((4L, 19L, 20L)))
    assert(got(1.0) === ((5L, 20L, 20L)))
  }

  test("psi: identical distributions score ~0, a shifted batch scores high") {
    val rnd = new scala.util.Random(47)
    val base = Seq.fill(4000)(rnd.nextGaussian() * 10 + 50).map(Tuple1(_)).toDF("x")
    val same = Seq.fill(1000)(rnd.nextGaussian() * 10 + 50).map(Tuple1(_)).toDF("x")
    val shifted = Seq.fill(1000)(rnd.nextGaussian() * 10 + 80).map(Tuple1(_)).toDF("x")
    def total(b: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      CorpusStats.psi(b, c, "x").filter($"bucket" === 0)
        .select($"contrib").as[Double].head()
    assert(total(base, same) < 0.1, "same distribution must read stable")
    assert(total(base, shifted) > 0.25, "an 3-sigma mean shift must read shifted")
    // per-bucket rows cover every decile and sum (unrounded) to the total
    val rows = CorpusStats.psi(base, same, "x").collect()
    assert(rows.length === 11)
  }

  test("benford: planted benford-ish data passes, uniform first digits fail") {
    val rnd = new scala.util.Random(53)
    // log-uniform magnitudes follow Benford closely
    val benfordish = Seq.fill(5000)(math.pow(10, rnd.nextDouble() * 4))
      .map(Tuple1(_)).toDF("x")
    // scale 2: coarse scale-0 rounding would distort the [1,10) decade
    // (1.5..2.5 all collapse to 2), which is a grid artifact, not a
    // first-digit property
    val chiB = CorpusStats.benfordAudit(benfordish, "x", scale = 2)
      .filter($"digit" === 0).select($"chi2_contrib").as[Double].head()
    assert(chiB < 30, s"log-uniform data should be near-Benford: $chiB")
    // uniform [1, 2): every first digit is 1 -> chi2 explodes
    val uni = Seq.fill(2000)(1.0 + rnd.nextDouble()).map(Tuple1(_)).toDF("x")
    val chiU = CorpusStats.benfordAudit(uni, "x", scale = 2)
      .filter($"digit" === 0).select($"chi2_contrib").as[Double].head()
    assert(chiU > 1000, s"single-digit concentration must fail: $chiU")
    // digit spine complete even when digits are missing
    assert(CorpusStats.benfordAudit(uni, "x", scale = 2).count() === 10)
  }

  test("exactCorrelation: hand cases and exact-integer replay on random data") {
    // y = 2x -> corr 1; z = -x -> corr -1 with both; constant column drops
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0)).toDF("x", "y", "z", "k")
    val got = CorpusStats.exactCorrelation(df,
        Seq(("x", 2), ("y", 2), ("z", 2), ("k", 2)))
      .as[(String, String, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("x", "y") -> 1.0, ("x", "z") -> -1.0, ("y", "z") -> -1.0))
    // random data with a null row (excluded): replay the integer sums
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { _ =>
      (Some(rnd.nextDouble() * 10), Some(rnd.nextDouble() * 10 + rnd.nextInt(3)))
    } :+ ((Option.empty[Double], Some(1.0)))
    val df2 = rows.toDF("a", "b")
    val res = CorpusStats.exactCorrelation(df2, Seq(("a", 6), ("b", 6)))
      .as[(String, String, Double, Long)].collect().head
    assert(res._4 === 400L, "null row excluded")
    val xs = rows.collect { case (Some(a), Some(b)) =>
      (math.round(a * 1e6), math.round(b * 1e6)) }
    val n = BigInt(xs.size)
    val (sa, sb) = (xs.map(v => BigInt(v._1)).sum, xs.map(v => BigInt(v._2)).sum)
    val qa = xs.map(v => BigInt(v._1) * v._1).sum
    val qb = xs.map(v => BigInt(v._2) * v._2).sum
    val pab = xs.map(v => BigInt(v._1) * v._2).sum
    val expect = (n * pab - sa * sb).toDouble /
      math.sqrt((n * qa - sa * sa).toDouble * (n * qb - sb * sb).toDouble)
    assert(math.abs(res._3 - expect) < 1e-6, s"${res._3} vs $expect")
  }

  test("groupedQuantiles: bit-identical to Spark percentile per group, nulls excluded") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { i =>
      (Seq("a", "b", "c", "d")(rnd.nextInt(4)),
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextDouble() * 500 - 100))
    } :+ (("e", Some(7.0)))   // singleton group
    val df = rows.toDF("g", "x")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = CorpusStats.groupedQuantiles(df, "g", "x", ps)
      .as[(String, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val ref = df.filter($"x".isNotNull).groupBy($"g")
      .agg(percentile($"x", lit(ps.toArray)).as("qs"), count($"x").as("n"))
      .as[(String, Seq[Double], Long)].collect()
    for ((g, qs, n) <- ref; (p, i) <- ps.zipWithIndex) {
      val (v, gn) = got((g, p))
      assert(gn === n, s"g=$g")
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(qs(i)), s"g=$g p=$p $v vs ${qs(i)}")
    }
    assert(got(("e", 0.5)) === ((7.0, 1L)))
  }

  test("quantileBuckets: quartiles of 1..100 split 25/25/25/25, ties go low, nulls stay null") {
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+ None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val got = CorpusStats.quantileBuckets(df, "x", nBuckets = 4)
    val sizes = got.filter($"x".isNotNull).groupBy($"bucket").count()
      .as[(Int, Long)].collect().toMap
    // quantile_cont boundaries of 1..100 at .25/.5/.75 = 25.75, 50.5, 75.25
    assert(sizes === Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    assert(got.filter($"x".isNull).select($"bucket").head().isNullAt(0))
    // a value exactly AT a cut point lands in the LOWER bucket
    val tied = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")  // median boundary = 2.5; p25 = 1.75
    val tb = CorpusStats.quantileBuckets(tied, "x", 2)
      .as[(Double, Int)].collect().toMap
    assert(tb === Map(1.0 -> 1, 2.0 -> 1, 3.0 -> 2, 4.0 -> 2))
    val atCut = Seq(1.0, 2.5, 4.0).toDF("x")      // median = 2.5 exactly
    assert(CorpusStats.quantileBuckets(atCut, "x", 2)
      .filter($"x" === 2.5).select($"bucket").as[Int].head() === 1)
  }

  test("corpus diversity: matches hand-computed mean pairwise cosine") {
    // (1,0), (0,1), (1,0): ordered pairs average = 2·(0+1+0)/(3·2) = 1/3
    val e = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 0f))
    ).toDF("vec_id", "embedding")
    val r = CorpusStats.corpusDiversity(e, "embedding")
      .as[(Long, Int, Double)].collect().head
    assert(r._1 === 3L && r._2 === 2)
    assert(math.abs(r._3 - 1.0 / 3.0) < 1e-5)
    // two identical vectors → 1; two orthogonal → 0
    val same = Seq((1L, Array(0.6f, 0.8f)), (2L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    assert(math.abs(CorpusStats.corpusDiversity(same, "embedding")
      .as[(Long, Int, Double)].collect().head._3 - 1.0) < 1e-5)
    val orth = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(math.abs(CorpusStats.corpusDiversity(orth, "embedding")
      .as[(Long, Int, Double)].collect().head._3) < 1e-5)
    // partitioning must not change a single bit of the result
    val full = graft.Tables.embeddings(spark, TestSpark.sf)
    val a = CorpusStats.corpusDiversity(full, "embedding").collect().head
    val b = CorpusStats.corpusDiversity(full.repartition(13), "embedding")
      .collect().head
    assert(a === b)
  }

  test("z-scores: hand-checked per group, sigma-zero group scores null") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),  // mu=20, sigma=sqrt(200/3)
      ("b", 4L, 7L), ("b", 5L, 7L)                     // constant → z null
    ).toDF("g", "id", "v")
    val got = CorpusStats.zScores(df, "g", "v")
      .select("id", "z").as[(Long, Option[Double])].collect().toMap
    val sigA = math.sqrt(200.0 / 3.0)
    assert(math.abs(got(1L).get - (-10.0 / sigA)) < 1e-9)
    assert(math.abs(got(2L).get) < 1e-9)
    assert(math.abs(got(3L).get - 10.0 / sigA) < 1e-9)
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("equi-depth histogram: balanced buckets, ordered ranges, skew-proof") {
    val vals = (1 to 80).map(_.toDouble) ++ Seq.fill(20)(1000.0) // heavy tail
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val h = CorpusStats.equiDepthHistogram(df, "v", k = 4)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq === Seq(0, 1, 2, 3))
    // ~equal depth despite the hot value (100 rows / 4 ≈ 25 each)
    h.foreach { case (b, n, _, _) => assert(n >= 20 && n <= 30, s"bucket $b: $n") }
    // ranges ordered and non-overlapping
    h.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) case _ => }
  }

  test("corpus diff: added/removed/changed/unchanged classified per id") {
    val v1 = Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a  B"),          // whitespace/case only → unchanged
      (2L, "c d EDIT"),                  // changed
      (9L, "new doc")                    // added; 3 missing → removed
    ).toDF("doc_id", "text")
    val got = CorpusStats.corpusDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 9L -> "added"))
  }

  test("vocab KL: zero for identical distributions, positive under drift") {
    val same = Seq(
      (1L, "en", "a a b"), (2L, "de", "a a b")).toDF("doc_id", "lang", "text")
    val r0 = CorpusStats.vocabKl(same, "text", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r0 === ((2L, 3L, 3L, 0.0)))
    val drift = Seq(
      (1L, "en", "a a a a"), (2L, "de", "b b b b")).toDF("doc_id", "lang", "text")
    val r1 = CorpusStats.vocabKl(drift, "text", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r1._1 === 2L && r1._4 > 0.5, s"expected strong drift: $r1")
    // KL is asymmetric but both directions positive here
    val r2 = CorpusStats.vocabKl(drift, "text", col("lang") =!= "en")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r2._4 > 0.5)
  }

  test("oov rate: top-k vocab cut is deterministic, per-doc fractions exact") {
    // counts: a=5, b=3, c=2, d=2, e=1 — vocabSize=3 must cut {a, b, c}
    // (c beats d on the word tie-break at equal count 2)
    val docs = Seq(
      (1L, "a a b c"),        // all in vocab → 0/4
      (2L, "a b d e"),        // d, e OOV → 2/4
      (3L, "a b c d"),        // d OOV → 1/4
      (4L, "a")               // 0/1
    ).toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, "text", "doc_id", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 0L, 0.0)))
    assert(got(2L) === ((2L, 4L, 2L, 0.5)))
    assert(got(3L) === ((3L, 4L, 1L, 0.25)))
    assert(got(4L) === ((4L, 1L, 0L, 0.0)))
    // vocabSize beyond the vocabulary → nothing is OOV
    val all = CorpusStats.oovRate(docs, "text", "doc_id", vocabSize = 100)
      .agg(sum("n_oov")).as[Long].collect().head
    assert(all === 0L)
  }

  test("vocab count artifacts: KL from materialized tables ≡ one-pass, merge additive") {
    val en = Seq((1L, "the cat sat on the mat"), (2L, "the dog ran"))
      .toDF("doc_id", "text")
    val de = Seq((3L, "der hund lief schnell"), (4L, "die katze sass"))
      .toDF("doc_id", "text")
    // one-pass predicate form over the union ≡ artifact form over the parts
    val both = en.withColumn("lang", lit("en"))
      .unionByName(de.withColumn("lang", lit("de")))
    val onePass = CorpusStats.vocabKl(both, "text", col("lang") === "en")
      .collect().toSeq
    val viaArtifacts = CorpusStats.vocabKlFromCounts(
      CorpusStats.vocabCounts(en, "text"),
      CorpusStats.vocabCounts(de, "text")).collect().toSeq
    assert(viaArtifacts === onePass)
    // counts are additive: per-slice tables merge to the direct count
    val slices = CorpusStats.vocabCounts(en.limit(1), "text")
      .unionByName(CorpusStats.vocabCounts(en.orderBy(col("doc_id").desc).limit(1), "text"))
    val merged = CorpusStats.mergeVocabCounts(slices)
      .as[(String, Long)].collect().toMap
    val direct = CorpusStats.vocabCounts(en, "text")
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
  }

  test("vocabJs: symmetric, bounded by ln2, zero on identical, artifact ≡ one-pass") {
    val en = Seq((1L, "the cat sat on the mat"), (2L, "the dog ran"))
      .toDF("doc_id", "text")
    val de = Seq((3L, "der hund lief schnell"), (4L, "die katze sass"))
      .toDF("doc_id", "text")
    val both = en.withColumn("lang", lit("en"))
      .unionByName(de.withColumn("lang", lit("de")))
    def js(pred: org.apache.spark.sql.Column): (Long, Long, Long, Double) =
      CorpusStats.vocabJs(both, "text", pred)
        .as[(Long, Long, Long, Double)].collect().head
    val fwd = js(col("lang") === "en")
    val rev = js(col("lang") === "de")
    // symmetric up to the swapped token totals; bounded by ln 2
    assert(fwd._4 === rev._4, s"$fwd vs $rev")
    assert(fwd._4 > 0.0 && fwd._4 <= math.log(2.0))
    // identical sub-corpora -> lp = lq = lm -> exactly 0
    val same = en.withColumn("lang", lit("en"))
      .unionByName(en.withColumn("doc_id", col("doc_id") + 10)
        .withColumn("lang", lit("de")))
    assert(CorpusStats.vocabJs(same, "text", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect().head._4 === 0.0)
    // artifact form ≡ one-pass form (the vocabKl contract)
    val viaArtifacts = CorpusStats.vocabJsFromCounts(
      CorpusStats.vocabCounts(en, "text"),
      CorpusStats.vocabCounts(de, "text")).collect().toSeq
    assert(viaArtifacts ===
      CorpusStats.vocabJs(both, "text", col("lang") === "en").collect().toSeq)
    // KL relation sanity: JS well below the asymmetric KL on this split
    val kl = CorpusStats.vocabKl(both, "text", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect().head._4
    assert(fwd._4 < kl)
  }

  test("distinct sketches: slice-union estimate ≡ global build, near exact") {
    // 10k rows, 1000 distinct values spread across 4 slices with overlap.
    // At this cardinality (< 2^lgK registers) the sketch is in sparse/exact
    // mode, where union and single-pass builds agree EXACTLY — asserting
    // equality here pins register-losslessness without tripping over the
    // HIP-vs-composite estimator gap of dense mode (which the registered
    // q_distinct_sketch contract covers via the error envelope instead)
    val rows = spark.range(10000)
      .select((col("id") % 4).as("slice"),
        concat(lit("v"), (col("id") % 1000)).as("v"))
    val perSlice = CorpusStats.distinctSketches(rows.toDF(), "v", "slice")
    assert(perSlice.count() === 4)
    val merged = CorpusStats.distinctFromSketches(perSlice)
      .as[Long].collect().head
    val global = rows.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))).as[Long].collect().head
    assert(merged === global, "lossless union: merged must equal global build")
    val exact = 1000.0
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"estimate $merged outside 5% of $exact")
    // the artifact is additive: re-sketching only a NEW slice and unioning
    // with the old rows reproduces the full-corpus answer
    val more = spark.range(10000, 12000)
      .select(lit(9L).as("slice"), concat(lit("v"), col("id")).as("v"))
    val newSlice = CorpusStats.distinctSketches(more.toDF(), "v", "slice")
    val incr = CorpusStats.distinctFromSketches(perSlice.unionByName(newSlice))
      .as[Long].collect().head
    val full = rows.unionByName(more).agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))).as[Long].collect().head
    assert(incr === full)
  }
  test("pmi collocations: exact lift on a hand-computed corpus, deterministic tie order") {
    val df = Seq("a b a b", "a b c").toDF("text")
    val got = CorpusStats.pmiCollocations(df, "text", minCount = 1, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // N_tok=7, N_bg=5; c(a)=3 c(b)=3 c(c)=1; c_ab=3 c_ba=1 c_bc=1
    // lift(ab)=3*49/(5*9)=3.266667, lift(bc)=49/(5*3)=3.266667 (exact tie),
    // lift(ba)=49/45=1.088889; tie breaks (a,b) < (b,c)
    assert(got === Seq(
      ("a", "b", 3L, 3L, 3L, 3.266667),
      ("b", "c", 1L, 3L, 1L, 3.266667),
      ("b", "a", 1L, 3L, 3L, 1.088889)))
  }

  test("gini: hand-computed concentration, ties exact, uniform is 0") {
    def gini(xs: Seq[Long]) =
      CorpusStats.giniConcentration(xs.toDF("v"), "v")
        .as[(Long, Long, Double)].collect().toSeq
    // [1,1,2,4]: 2*sum(i*x)=50, G=(50-5*8)/(4*8)=0.3125
    assert(gini(Seq(1L, 1L, 2L, 4L)) === Seq((4L, 8L, 0.3125)))
    assert(gini(Seq(7L, 7L, 7L)) === Seq((3L, 21L, 0.0)))
    // all mass on one row of n=4 -> (n-1)/n = 0.75
    assert(gini(Seq(0L, 0L, 0L, 10L)) === Seq((4L, 10L, 0.75)))
    // zero-total input is undefined -> empty
    assert(gini(Seq(0L, 0L)).isEmpty)
  }

  test("ksStatistic: hand ECDF max, identical samples 0, disjoint samples 1") {
    def ks(a: Seq[Long], b: Seq[Long]) =
      CorpusStats.ksStatistic(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Double)].collect().head
    // a = {1,2,3,4}, b = {3,4,5,6}: max |F_a - F_b| at v=2 (or 4): |2/4 - 0/4| = 0.5
    assert(ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)) === ((4L, 4L, 0.5)))
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === ((3L, 3L, 0.0)))
    assert(ks(Seq(1L, 2L), Seq(8L, 9L, 10L)) === ((2L, 3L, 1.0)))
    // ties + unequal sizes: a={1,1,2}, b={1,2}: at v=1 |2/3-1/2|=1/6; at v=2 0
    assert(ks(Seq(1L, 1L, 2L), Seq(1L, 2L)) === ((3L, 2L, 0.166667)))
    // nulls excluded
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("v")
    assert(CorpusStats.ksStatistic(withNull, Seq(1L, 2L).toDF("v"), "v")
      .as[(Long, Long, Double)].collect().head === ((2L, 2L, 0.0)))
  }

  test("cohenKappa: textbook 2x2 table, perfect and chance agreement, degenerate null") {
    def kap(pairs: Seq[(String, String)]) =
      CorpusStats.cohenKappa(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Option[Double])].collect().head
    // classic example: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    // po=35/50, pe=(25*30 + 25*20)/2500 = 0.5, kappa = (0.7-0.5)/0.5 = 0.4
    val tbl = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    assert(kap(tbl) === ((50L, 35L, Some(0.4))))
    // perfect agreement on 2+ labels -> 1.0
    assert(kap(Seq(("x", "x"), ("y", "y"))) === ((2L, 2L, Some(1.0))))
    // both raters constant on one label: pe = 1 -> undefined (null)
    assert(kap(Seq(("x", "x"), ("x", "x"))) === ((2L, 2L, None)))
    // null labels excluded; the surviving single row is itself the
    // degenerate constant-label case (pe = 1 -> null kappa)
    val withNull = Seq((Some("x"), Some("x")), (None, Some("y")),
      (Some("y"), None)).toDF("a", "b")
    assert(CorpusStats.cohenKappa(withNull, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head === ((1L, 1L, None)))
  }

  test("spearmanCorrelation: monotone invariance, ties, replay vs midranks") {
    def rho(rows: Seq[(Long, Long)]): (Long, Option[Double]) =
      CorpusStats.spearmanCorrelation(rows.toDF("x", "y"), "x", "y")
        .as[(Long, Option[Double])].collect().head
    // any strictly increasing map of x -> rho 1 regardless of magnitudes
    assert(rho(Seq((1L, 10L), (2L, 1000L), (3L, 1001L), (4L, 999999L)))
      === ((4L, Some(1.0))))
    // strictly decreasing -> -1 (outlier magnitude irrelevant)
    assert(rho(Seq((1L, 50L), (2L, 3L), (3L, -999999L))) === ((3L, Some(-1.0))))
    // constant column -> zero rank variance -> null rho
    assert(rho(Seq((1L, 7L), (2L, 7L), (3L, 7L))) === ((3L, None)))
    // null in either column excluded
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(9L)),
      (Some(3L), None), (Some(2L), Some(4L))).toDF("x", "y")
    assert(CorpusStats.spearmanCorrelation(withNull, "x", "y")
      .as[(Long, Option[Double])].collect().head === ((2L, Some(1.0))))
    // tied data: replay Pearson over hand-computed midranks.
    // x: 1,1,2,3  -> midranks 1.5,1.5,3,4 ; y: 5,6,6,6 -> 1,3,3,3
    val tied = Seq((1L, 5L), (1L, 6L), (2L, 6L), (3L, 6L))
    val rx = Seq(1.5, 1.5, 3.0, 4.0); val ry = Seq(1.0, 3.0, 3.0, 3.0)
    val n = 4.0
    val (sx, sy) = (rx.sum, ry.sum)
    val (qx, qy) = (rx.map(v => v * v).sum, ry.map(v => v * v).sum)
    val pxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val expect = (n * pxy - sx * sy) /
      math.sqrt((n * qx - sx * sx) * (n * qy - sy * sy))
    val got = rho(tied)
    assert(got._1 === 4L)
    assert(math.abs(got._2.get - expect) < 1e-6, s"${got._2} vs $expect")
    // random replay: midrank Pearson computed naively driver-side
    val rnd = new scala.util.Random(43)
    val rows = (1 to 300).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(15).toLong))
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val grouped = vs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      var cum = 0L
      grouped.map { case (v, m) =>
        val r = cum + (m + 1) / 2.0; cum += m; v -> r
      }.toMap
    }
    val mx = midranks(rows.map(_._1)); val my = midranks(rows.map(_._2))
    val rxs = rows.map(r => mx(r._1)); val rys = rows.map(r => my(r._2))
    val nn = rows.size.toDouble
    val ex = (nn * rxs.zip(rys).map { case (a, b) => a * b }.sum
        - rxs.sum * rys.sum) /
      math.sqrt((nn * rxs.map(v => v * v).sum - rxs.sum * rxs.sum)
        * (nn * rys.map(v => v * v).sum - rys.sum * rys.sum))
    val gr = rho(rows)
    assert(gr._1 === 300L)
    assert(math.abs(gr._2.get - ex) < 1e-6, s"${gr._2} vs $ex")
  }

  test("ksStatisticBy: one-vs-rest equals pairwise ksStatistic per group") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 300).map { i =>
      val g = s"g${i % 3}"
      (g, (rnd.nextInt(30) + (i % 3) * 8).toLong) // shifted per group
    }
    val df = rows.toDF("g", "v")
    val got = CorpusStats.ksStatisticBy(df, "g", "v")
      .as[(String, Long, Long, Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val a = rows.filter(_._1 == g).map(_._2).toDF("v")
      val b = rows.filter(_._1 != g).map(_._2).toDF("v")
      val exp = CorpusStats.ksStatistic(a, b, "v")
        .as[(Long, Long, Double)].collect().head
      assert(got(g)._2 === exp._1 && got(g)._3 === exp._2)
      assert(got(g)._4.get === exp._3, s"group $g")
    }
    // D attained at a value the group does NOT take: g=[10], rest=[1..5]
    // F_a jumps at 10; max gap is at v=5 (F_a=0, F_b=1) -> D=1
    val gap = Seq(("a", 10L), ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val ga = CorpusStats.ksStatisticBy(gap, "g", "v")
      .as[(String, Long, Long, Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r._4.get).toMap
    assert(ga("a") === 1.0)
    // single group: empty complement -> null ks and p
    val solo = CorpusStats.ksStatisticBy(
      Seq(("only", 1L), ("only", 2L)).toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Option[Double], Option[Long])].collect().head
    assert(solo._3 === 0L && solo._4 === None && solo._5 === None)
  }

  test("bhAdjust: textbook step-up, adjusted p suffix-min, edges") {
    def bh(ps: Seq[(String, Long)], alpha: Long = 50000L)
        : Map[String, (Double, Double, Boolean)] =
      CorpusStats.bhAdjust(ps.toDF("k", "p_micro"), "k", "p_micro", alpha)
        .as[(String, Double, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // classic: p=[.01,.02,.03,.04,.2], alpha=.05, m=5 -> reject first 4;
    // adjusted = [.05,.05,.05,.05,.2]
    val g = bh(Seq(("a", 10000L), ("b", 20000L), ("c", 30000L),
      ("d", 40000L), ("e", 200000L)))
    assert(g("a") === ((0.01, 0.05, true)) && g("d") === ((0.04, 0.05, true)))
    assert(g("e") === ((0.2, 0.2, false)))
    // step-up: a later passing rank rescues earlier failures.
    // p=[.03,.04], m=2: i=1 threshold .025 fails, i=2 threshold .05
    // passes -> BOTH rejected
    val up = bh(Seq(("x", 30000L), ("y", 40000L)))
    assert(up("x")._3 && up("y")._3)
    // nothing passes -> kstar null -> all false; adjusted p is the
    // suffix min of raw m*p/i (clamped at 1): min(1.8->1.0, 0.99) = 0.99
    val none = bh(Seq(("x", 900000L), ("y", 990000L)))
    assert(!none("x")._3 && !none("y")._3)
    assert(none("x")._2 === 0.99 && none("y")._2 === 0.99)
    // deterministic tie order: equal p ranks by key
    val tie = bh(Seq(("b", 25000L), ("a", 25000L)))
    assert(tie("a")._3 && tie("b")._3) // both under i*alpha/m at i=2
  }

  test("mannWhitneyU: hand U and z, ties, symmetry, degenerate") {
    def mw(a: Seq[Long], b: Seq[Long]): (Long, Long, Double, Option[Double]) =
      CorpusStats.mannWhitneyU(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Double, Option[Double])].collect().head
    // disjoint a < b: R_a = 6, U_a = 0; z = -4.5/sqrt(5.25)
    val lo = mw(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))
    assert(lo._1 === 3L && lo._2 === 3L && lo._3 === 0.0)
    assert(math.abs(lo._4.get - (-4.5 / math.sqrt(5.25))) < 1e-6)
    // swapped: U_a = n_a*n_b = 9, z mirrors positive
    val hi = mw(Seq(4L, 5L, 6L), Seq(1L, 2L, 3L))
    assert(hi._3 === 9.0 && math.abs(hi._4.get + lo._4.get) < 1e-9)
    // all values tied across both samples: sigma = 0 -> null z, U = mu
    val tied = mw(Seq(5L, 5L), Seq(5L, 5L))
    assert(tied._3 === 2.0 && tied._4 === None)
    // tie-corrected replay on random data with heavy ties
    val rnd = new scala.util.Random(47)
    val as = (1 to 200).map(_ => rnd.nextInt(12).toLong)
    val bs = (1 to 150).map(_ => rnd.nextInt(12).toLong + 2)
    val pooled = as ++ bs
    val mr: Map[Long, Double] = {
      val grouped = pooled.groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy(_._1)
      var cum = 0L
      grouped.map { case (v, m) =>
        val r = cum + (m + 1) / 2.0; cum += m; v -> r }.toMap
    }
    val ra = as.map(mr).sum
    val ua = ra - as.size.toDouble * (as.size + 1) / 2.0
    val n = pooled.size.toDouble
    val ties = pooled.groupBy(identity).values
      .map(g => g.size.toDouble).map(t => t * t * t - t).sum
    val sigma = math.sqrt(as.size.toDouble * bs.size / 12.0
      * ((n + 1) - ties / (n * (n - 1))))
    val ez = (ua - as.size.toDouble * bs.size / 2.0) / sigma
    val got = mw(as, bs)
    assert(got._3 === ua, s"${got._3} vs $ua")
    assert(math.abs(got._4.get - ez) < 1e-6, s"${got._4} vs $ez")
  }

  test("wasserstein1: hand areas, identity, single value, replay") {
    def emd(a: Seq[Long], b: Seq[Long]): (Long, Long, Option[Double]) =
      CorpusStats.wasserstein1(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Option[Double])].collect().head
    // point masses 10 apart -> distance 10
    assert(emd(Seq(0L), Seq(10L)) === ((1L, 1L, Some(10.0))))
    // a = {0,0}, b = {5,10}: |F| = 1 on [0,5), 0.5 on [5,10) -> 7.5
    assert(emd(Seq(0L, 0L), Seq(5L, 10L)) === ((2L, 2L, Some(7.5))))
    // identical distributions -> 0 (multiple grains, all gaps cancel)
    assert(emd(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === ((3L, 3L, Some(0.0))))
    // single shared distinct value: no gaps at all, still 0 with counts
    assert(emd(Seq(7L, 7L), Seq(7L)) === ((2L, 1L, Some(0.0))))
    // one side empty -> null emd (undefined), counts preserved
    assert(emd(Seq(1L, 2L), Seq.empty[Long]) === ((2L, 0L, None)))
    // replay vs naive sorted-ECDF area on random integer data
    val rnd = new scala.util.Random(53)
    val as = (1 to 180).map(_ => rnd.nextInt(40).toLong)
    val bs = (1 to 140).map(_ => rnd.nextInt(40).toLong + 5)
    val grid = (as ++ bs).distinct.sorted
    val naive = grid.zip(grid.tail).map { case (v, nx) =>
      val fa = as.count(_ <= v).toDouble / as.size
      val fb = bs.count(_ <= v).toDouble / bs.size
      math.abs(fa - fb) * (nx - v)
    }.sum
    val got = emd(as, bs)
    assert(math.abs(got._3.get - naive) < 1e-6, s"${got._3} vs $naive")
  }

  test("chiSquareIndependence: textbook 2x2, independence, degenerate") {
    def chi(rows: Seq[(String, String)])
        : (Long, Long, Long, Double, Option[Double]) =
      CorpusStats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Double, Option[Double])].collect().head
    // 2x2 [[20,5],[10,15]]: chi2 = n(ad-bc)^2 / (r1 r2 c1 c2)
    //   = 50*(300-50)^2/(25*25*30*20) = 8.3333; V = sqrt(8.3333/50)
    val tbl = Seq.fill(20)(("x", "p")) ++ Seq.fill(5)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(15)(("y", "q"))
    val got = chi(tbl)
    assert(got._1 === 50L && got._2 === 2L && got._3 === 2L)
    assert(math.abs(got._4 - 50.0 * 250 * 250 / (25.0 * 25 * 30 * 20)) < 1e-4)
    assert(math.abs(got._5.get - math.sqrt(got._4 / 50.0)) < 1e-4)
    // perfectly proportional table -> chi2 = 0, V = 0
    val ind = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(5)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val gi = chi(ind)
    assert(gi._4 === 0.0 && gi._5.get === 0.0)
    // single-level column -> chi2 0, V undefined (null)
    val deg = chi(Seq(("x", "p"), ("x", "q"), ("x", "p")))
    assert(deg._2 === 1L && deg._4 === 0.0 && deg._5 === None)
    // nulls excluded
    val withNull = Seq((Some("x"), Some("p")), (None, Some("q")),
      (Some("y"), None), (Some("y"), Some("q"))).toDF("a", "b")
    assert(CorpusStats.chiSquareIndependence(withNull, "a", "b")
      .as[(Long, Long, Long, Double, Option[Double])].collect().head._1 === 2L)
  }

  test("lorenzCurve: uniform flat, whale concentration, boundary ties exact") {
    def lz(vals: Seq[Long], b: Int = 10): Seq[(Int, Long, Double, Double)] =
      CorpusStats.lorenzCurve(vals.toDF("v"), "v", b)
        .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // 20 equal values: every decile holds 2 rows and exactly 0.1 share
    val flat = lz(Seq.fill(20)(5L))
    assert(flat.map(_._2) === Seq.fill(10)(2L))
    assert(flat.forall(r => r._3 === 0.1))
    assert(flat.last._4 === 1.0)
    // 99 rows of value 1 + one whale of 9901: top decile = 0.9901 + 9/10000
    val whale = lz(Seq.fill(99)(1L) :+ 9901L)
    assert(whale.map(_._2).sum === 100L)
    assert(whale.last._3 === (9901.0 + 9) / 10000.0)
    assert(whale.take(9).forall(r => r._3 === 10.0 / 10000.0))
    assert(whale.last._4 === 1.0)
    // a tie block straddling a boundary splits deterministically: 15 rows
    // over 10 deciles -> sizes floor-interval pattern, total preserved
    val tied = lz((1 to 5).map(_.toLong) ++ Seq.fill(10)(3L))
    assert(tied.map(_._2).sum === 15L)
    assert(tied.map(_._2).max - tied.map(_._2).min <= 1)
    assert(tied.last._4 === 1.0)
    // cum_share is the running sum of value_share (round-6 consistent)
    val cums = tied.scanLeft(0.0)((a, r) => a + r._3).tail
    tied.zip(cums).foreach { case (r, c) =>
      assert(math.abs(r._4 - c) < 5e-6, s"decile ${r._1}") }
  }

  test("mutualInformation: perfect dependence, independence, degenerate, replay") {
    def mi(rows: Seq[(String, String)])
        : (Long, Double, Double, Double, Option[Double], Option[Double]) =
      CorpusStats.mutualInformation(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Double, Double, Double, Option[Double], Option[Double])]
        .collect().head
    // perfect 1:1 dependence -> MI = H(A) = H(B), both U = 1
    val dep = mi(Seq.fill(3)(("x", "p")) ++ Seq.fill(3)(("y", "q")))
    assert(dep._1 === 6L && dep._2 === dep._3 && dep._4 === dep._2)
    assert(dep._5 === Some(1.0) && dep._6 === Some(1.0))
    assert(math.abs(dep._2 - math.log(2.0)) < 1e-5)
    // exact proportional independence -> every cell ratio is 1 -> MI = 0
    val ind = mi(Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(2)(("y", "p")) ++ Seq.fill(2)(("y", "q")))
    assert(ind._4 === 0.0 && ind._5 === Some(0.0))
    // single-level A -> H(A) = 0 -> u_ab null; u_ba = 0/H(B) = 0
    val deg = mi(Seq(("x", "p"), ("x", "q")))
    assert(deg._2 === 0.0 && deg._5 === None && deg._6 === Some(0.0))
    // replay on a skewed 2x3 table vs the direct formula
    val rows = Seq.fill(5)(("x", "p")) ++ Seq.fill(1)(("x", "q")) ++
      Seq.fill(2)(("x", "s")) ++ Seq.fill(1)(("y", "p")) ++
      Seq.fill(4)(("y", "q")) ++ Seq.fill(3)(("y", "s"))
    val got = mi(rows)
    val n = rows.size.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.size.toDouble)
    val rm = rows.groupBy(_._1).view.mapValues(_.size.toDouble)
    val cm = rows.groupBy(_._2).view.mapValues(_.size.toDouble)
    val exp = cells.map { case ((a, b), o) =>
      o / n * math.log(o * n / (rm(a) * cm(b))) }.sum
    assert(math.abs(got._4 - exp) < 1e-4, s"${got._4} vs $exp")
    val expHa = rm.values.map(r => r / n * math.log(n / r)).sum
    assert(math.abs(got._2 - expHa) < 1e-4)
    assert(math.abs(got._5.get - got._4 / got._2) < 1e-4)
  }

  test("quantileNormalize: hand mapping, identity, ties, null exclusion") {
    def qn(rows: Seq[(String, Long)]): Map[(String, Long), (Long, Long)] =
      CorpusStats.quantileNormalize(rows.toDF("g", "v"), "g", "v")
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // g1=[1,2,3,4], g2=[100,200]; global sorted [1,2,3,4,100,200], N=6
    // g1: t = ceil(c*6/4) = 2,3,5,6 -> Q = 2,3,100,200
    // g2: t = ceil(c*6/2) = 3,6     -> Q = 3,200
    val two = qn(Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L),
      ("g2", 100L), ("g2", 200L)))
    assert(two === Map(
      ("g1", 1L) -> ((2L, 1L)), ("g1", 2L) -> ((3L, 1L)),
      ("g1", 3L) -> ((100L, 1L)), ("g1", 4L) -> ((200L, 1L)),
      ("g2", 100L) -> ((3L, 1L)), ("g2", 200L) -> ((200L, 1L))))
    // single group: the map is the identity (t = c -> Q(c) = v)
    val one = qn(Seq(("g", 5L), ("g", 9L), ("g", 9L), ("g", 30L)))
    assert(one === Map(("g", 5L) -> ((5L, 1L)), ("g", 9L) -> ((9L, 2L)),
      ("g", 30L) -> ((30L, 1L))))
    // nulls in group or value excluded
    val withNull = Seq((Some("a"), Some(1L)), (None, Some(2L)),
      (Some("a"), None)).toDF("g", "v")
    val r = CorpusStats.quantileNormalize(withNull, "g", "v")
      .as[(String, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(("a", 1L, 1L, 1L)))
  }

  test("wilsonInterval: hand-checked bounds, edge rates, null exclusion") {
    def wi(rows: Seq[(String, Boolean)]): Map[String, (Long, Long, Double, Double, Double)] =
      CorpusStats.wilsonInterval(rows.toDF("g", "ok"), "g", "ok")
        .as[(String, Long, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // textbook case: n=10, k=7, z=1.96 -> (0.3968, 0.8922) (4dp refs)
    val g = wi(Seq.fill(7)(("a", true)) ++ Seq.fill(3)(("a", false)))("a")
    assert(g._1 === 10L && g._2 === 7L && g._3 === 0.7)
    assert(math.abs(g._4 - 0.396847) < 1e-4, s"lo ${g._4}")
    assert(math.abs(g._5 - 0.892188) < 1e-4, s"hi ${g._5}")
    // p=0 and p=1 stay inside [0,1] (the whole point vs the naive CI)
    val zeros = wi(Seq.fill(5)(("z", false)))("z")
    assert(zeros._4 === 0.0 && zeros._5 > 0.0 && zeros._5 < 1.0)
    val ones = wi(Seq.fill(5)(("o", true)))("o")
    assert(ones._4 > 0.0 && ones._4 < 1.0 && ones._5 === 1.0)
    // null group / null success excluded
    val withNull = Seq((Some("a"), Some(true)), (None, Some(true)),
      (Some("a"), None)).toDF("g", "ok")
    val r = CorpusStats.wilsonInterval(withNull, "g", "ok")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(r.length === 1 && r.head._2 === 1L && r.head._3 === 1L)
  }

  test("heavyHitters: exact over a huge tail key space, partitioning-invariant, boundary-exact") {
    import org.apache.spark.sql.functions._
    // 1 hot value (5000 rows) drowned in 50k distinct singletons: the MG
    // candidate exchange is bounded (k = 40 counters for phi = 0.05) while
    // a naive groupBy would shuffle 50k+1 keys; the verify pass restores
    // exact counts. n = 55000, threshold = ceil(0.05*55000) = 2750.
    val hot = spark.range(5000).select(lit("hot").as("v"))
    val tail = spark.range(50000).select(concat(lit("t"), col("id")).as("v"))
    val df = hot.unionByName(tail)
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusStats.heavyHitters(d, "v", 0.05)
        .as[(String, Long)].collect().toSet
    val expect = Set(("hot", 5000L))
    assert(run(df) === expect)
    // MG weights are arrival-order dependent; the FINAL output must not be
    assert(run(df.repartition(3)) === expect)
    assert(run(df.repartition(17)) === expect)
    // boundary exactness: n = 100, phi = 0.1 → threshold 10; a count-10
    // value is in, count-9 out
    val b = (Seq.fill(10)("at") ++ Seq.fill(9)("below") ++
      (1 to 81).map(i => s"x$i")).toDF("v")
    assert(CorpusStats.heavyHitters(b, "v", 0.1)
      .as[(String, Long)].collect().toSet === Set(("at", 10L)))
    // null values are ignored, not counted
    val withNull = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    assert(CorpusStats.heavyHitters(withNull, "v", 0.5)
      .as[(String, Long)].collect().toSet === Set(("a", 2L)))
    // adversarial arrival order for the r16 amortized purge: the heavy
    // value arrives LAST, after the tail has saturated (and repeatedly
    // purged) the 2k-slot buffer in a single partition — the survival
    // bound (undercount ≤ n/(k+1) < φ·n) must hold regardless
    val lateHot = (1 to 30000).map(i => s"t$i") ++ Seq.fill(4000)("hot")
    val lateDf = lateHot.toDF("v").coalesce(1) // one partition = one buffer
    assert(CorpusStats.heavyHitters(lateDf, "v", 0.1)
      .as[(String, Long)].collect().toSet === Set(("hot", 4000L)))
  }

  test("corpusLaws: uniform counts → slope 0; saturated vocab → beta 0; hand OLS cross-check") {
    import org.apache.spark.sql.functions._
    // every word appears exactly twice → ln(freq) constant → slope 0.0;
    // both halves carry the full vocabulary → heaps beta 0.0
    val unif = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val u = CorpusStats.corpusLaws(unif, "text", "doc_id", topR = 10)
      .as[(Double, Double, Long, Long, Long, Long)].head()
    assert(u._1 === 0.0 && u._2 === 0.0)
    assert((u._3, u._4, u._5, u._6) === ((8L, 4L, 4L, 4L)))
    // skewed corpus: counts 4/2/1 → hand OLS on (ln r, ln c), r = 1..3
    val skew = Seq((0L, "a a b"), (1L, "a a b c")).toDF("doc_id", "text")
    val g = CorpusStats.corpusLaws(skew, "text", "doc_id", topR = 10)
      .as[(Double, Double, Long, Long, Long, Long)].head()
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val hand = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(g._1 - hand) < 1e-5, s"got ${g._1}, hand $hand")
    assert(g._3 === 7L && g._4 === 3L && g._5 === 3L && g._6 === 2L)
    // deterministic under repartition
    val re = CorpusStats.corpusLaws(skew.repartition(5), "text", "doc_id", topR = 10)
      .as[(Double, Double, Long, Long, Long, Long)].head()
    assert(re === g)
  }

}
