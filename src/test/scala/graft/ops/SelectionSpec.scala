package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigram log-prob: hand-computed scores; empty docs absent") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val got = Selection.unigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // counts: a=2, b=2, c=1, total=5
    val lpA = math.round(math.log(2.0 / 5.0) * 1e6) // == lp(b)
    val lpC = math.round(math.log(1.0 / 5.0) * 1e6)
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._2 === 3L && got(2L)._2 === 2L)
    assert(math.abs(got(1L)._3 - (3 * lpA) / 1e6 / 3.0) < 2e-6)
    assert(math.abs(got(2L)._3 - (lpA + lpC) / 1e6 / 2.0) < 2e-6)
    // common-token docs outscore rare-token docs: p(a)=p(b) > p(c)
    assert(got(1L)._3 > got(2L)._3)
  }

  test("bigram log-prob: add-1 smoothing hand-checked; single-token docs absent") {
    val docs = Seq((1L, "a b a b"), (2L, "a a"), (3L, "x")).toDF("doc_id", "text")
    val got = Selection.bigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // bigrams: d1 = (a b)×2, (b a); d2 = (a a). histories: a→3, b→1. V=3.
    // P(b|a) = (2+1)/(3+3) = 0.5; P(a|b) = (1+1)/(1+3) = 0.5;
    // P(a|a) = (1+1)/(3+3) = 1/3
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._2 === 3L && got(2L)._2 === 1L)
    assert(math.abs(got(1L)._3 - math.log(0.5)) < 2e-6)
    assert(math.abs(got(2L)._3 - math.log(1.0 / 3.0)) < 2e-6)
    // word order matters now: scrambled text scores differ from natural
    // even with identical token multiset (unigram LM can't see this)
    val pair = Seq((10L, "a b a b a b"), (11L, "a a a b b b"))
      .toDF("doc_id", "text")
    val s = Selection.bigramLogProb(pair, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(10L) > s(11L), s"frequent-bigram doc must outscore: $s")
  }

  test("KN trigram LM: backoff branches finite and ordered; <3-token docs absent") {
    import spark.implicits._
    val train = Seq((1L, "a b c a b d a b c e b c"),
      (2L, "x y z x y w")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c"),    // fully seen trigram
      (11L, "z b c"),    // unseen history (z b) -> backoff to P(c|b)
      (12L, "a q c"),    // unseen middle word q -> backoff to P(c)
      (13L, "a b oov"),  // OOV continuation -> add-1 unigram floor
      (14L, "a b"),      // < 3 tokens -> absent
      (15L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Selection.knLogProb(train, score, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 13L))
    got.values.foreach { case (id, n, lp) =>
      assert(n === 1L)
      assert(lp < 0.0 && !lp.isNaN && !lp.isInfinite, s"doc $id: $lp")
    }
    // more evidence -> higher probability: seen trigram > backed-off
    // history > OOV floor
    assert(got(10L)._3 > got(11L)._3, s"${got(10L)} vs ${got(11L)}")
    assert(got(11L)._3 > got(13L)._3, s"${got(11L)} vs ${got(13L)}")
  }

  test("KN trigram LM beats add-1 trigram on held-out text") {
    import spark.implicits._
    // train: patterned sentences + filler vocab (inflates V, the add-1
    // denominator); heldout: same pattern language, partially novel
    // trigram combinations whose CONTINUATIONS are well-attested — the
    // case KN's continuation counts exist for
    val trainDocs = (0 until 60).map(i =>
      (i.toLong, s"the n${i % 10} v${i % 7} on the n${(i + 3) % 10}")) ++
      (0 until 30).map(i =>
        (100L + i, s"filler$i filler${(i + 1) % 30} filler${(i + 2) % 30}"))
    val heldDocs = (0 until 10).map(j =>
      (200L + j, s"the n$j v${(j + 1) % 7} on the n${(j + 5) % 10}"))
    val train = trainDocs.toDF("doc_id", "text")
    val held = heldDocs.toDF("doc_id", "text")
    val kn = Selection.knLogProb(train, held, "text", "doc_id")
      .agg(sum(col("avg_logprob") * col("n_trigrams")),
        sum(col("n_trigrams"))).as[(Double, Long)].head()
    val knAvg = kn._1 / kn._2
    // add-1 trigram reference, computed straight from the train counts
    def toks(s: String) = s.toLowerCase.trim.split("\\s+")
      .filter(_.nonEmpty).toSeq
    val trainTok = trainDocs.map(d => toks(d._2))
    val c123 = scala.collection.mutable.Map.empty[Seq[String], Long]
    val c12 = scala.collection.mutable.Map.empty[Seq[String], Long]
    trainTok.foreach(ts => ts.sliding(3).filter(_.size == 3).foreach { g =>
      c123(g) = c123.getOrElse(g, 0L) + 1
      c12(g.take(2)) = c12.getOrElse(g.take(2), 0L) + 1
    })
    val vocab = trainTok.flatten.distinct.size.toDouble
    val heldTris = heldDocs.flatMap(d =>
      toks(d._2).sliding(3).filter(_.size == 3))
    val add1Avg = heldTris.map(g => math.log(
      (c123.getOrElse(g, 0L) + 1.0) /
        (c12.getOrElse(g.take(2), 0L) + vocab))).sum / heldTris.size
    assert(knAvg > add1Avg,
      f"KN must beat add-1 on held-out text: kn=$knAvg%.4f add1=$add1Avg%.4f")
    // the win is a property of the discounting, not of one lucky D: every
    // discount in the standard range beats add-1 on the same held-out set
    for (dd <- Seq(0.25, 0.5, 0.9)) {
      val k2 = Selection.knLogProb(train, held, "text", "doc_id", d = dd)
        .agg(sum(col("avg_logprob") * col("n_trigrams")),
          sum(col("n_trigrams"))).as[(Double, Long)].head()
      assert(k2._1 / k2._2 > add1Avg,
        f"KN at D=$dd must beat add-1: ${k2._1 / k2._2}%.4f vs $add1Avg%.4f")
    }
  }

  test("KN split API: knTrain+knScore ≡ fused; pruned held-out log-prob monotone in minCount; model round-trips parquet") {
    import spark.implicits._
    val train = (0 until 60).map(i =>
      (i.toLong, s"the n${i % 10} v${i % 7} on the n${(i + 3) % 10}"))
      .toDF("doc_id", "text")
    val held = (0 until 10).map(j =>
      (200L + j, s"the n$j v${(j + 1) % 7} on the n${(j + 5) % 10}"))
      .toDF("doc_id", "text")
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(col("avg_logprob") * col("n_trigrams"))).as[Double].head()
    // split API at minCount=1 is the fused formulation, bit-for-bit
    val fused = Selection.knLogProb(train, held, "text", "doc_id")
      .orderBy("doc_id").collect()
    val split = Selection.knScore(Selection.knTrain(train, "text"),
      held, "text", "doc_id").orderBy("doc_id").collect()
    assert(fused.toSeq === split.toSeq)
    // pruning only LOWERS per-trigram probability (max(c-D,0) mass is
    // dropped, the interpolation weight stays) -> held-out log-prob is
    // monotone non-increasing in the threshold — a theorem of the
    // formulation, not fixture luck
    val lps = Seq(1L, 2L, 3L, 4L).map { mc =>
      mc -> total(Selection.knScore(Selection.knTrain(train, "text", mc),
        held, "text", "doc_id"))
    }
    lps.sliding(2).foreach {
      case Seq((m1, a), (m2, b)) =>
        assert(b <= a + 1e-9,
          s"pruning must not raise held-out log-prob: minCount=$m1 -> $a, minCount=$m2 -> $b")
      case _ =>
    }
    // a threshold that actually prunes must strictly degrade SOMETHING
    assert(lps.last._2 < lps.head._2,
      s"minCount=4 should prune real mass on this fixture: $lps")
    // the KenLM artifact path: model persists to parquet and scores
    // identically after reload
    val dir = java.nio.file.Files.createTempDirectory("graft-kn").toString
    Selection.knTrain(train, "text", minCount = 2)
      .write.mode("overwrite").parquet(dir)
    val reloaded = Selection.knScore(spark.read.parquet(dir),
      held, "text", "doc_id").orderBy("doc_id").collect()
    val lazyModel = Selection.knScore(Selection.knTrain(train, "text", 2),
      held, "text", "doc_id").orderBy("doc_id").collect()
    assert(reloaded.toSeq === lazyModel.toSeq)
  }

  test("incremental KN: batch fold over knTypes ≡ one-shot retrain; summing MODELS would double-count; bootstrap from empty prev") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
      (i.toLong, s"the n${i % 10} v${i % 7} on the n${(i + 3) % 10}"))
      .toDF("doc_id", "text")
    val held = (0 until 10).map(j =>
      (200L + j, s"the n$j v${(j + 1) % 7} on the n${(j + 5) % 10}"))
      .toDF("doc_id", "text")
    def slice(i: Int) = docs.filter(col("doc_id") % 3 === i)
    // fold three doc-disjoint batches at TYPE grain, derive the model
    val folded = Seq(slice(1), slice(2)).foldLeft(
      Selection.knTypes(slice(0), "text")) { (t, b) =>
      Selection.knUpdateTypes(t, b, "text")
    }
    // type tables identical as sets (occurrence counts are additive)
    val oneShot = Selection.knTypes(docs, "text")
    assert(folded.collect().map(_.toSeq).toSet ===
      oneShot.collect().map(_.toSeq).toSet)
    // and scoring through the derived model is bit-for-bit the retrain
    val viaFold = Selection.knScore(Selection.knFromTypes(folded),
      held, "text", "doc_id").orderBy("doc_id").collect()
    val viaRetrain = Selection.knScore(Selection.knTrain(docs, "text"),
      held, "text", "doc_id").orderBy("doc_id").collect()
    assert(viaFold.toSeq === viaRetrain.toSeq)
    // bootstrap: empty prev table folds to exactly knTypes(batch)
    val empty = oneShot.filter(lit(false))
    val boot = Selection.knUpdateTypes(empty, slice(0), "text")
    assert(boot.collect().map(_.toSeq).toSet ===
      Selection.knTypes(slice(0), "text").collect().map(_.toSeq).toSet)
    // the trap the type-grain seam exists to avoid: distinct-TYPE counts
    // are NOT additive — a history type seen in two batches counts once
    // in the true model but twice in a naive model sum
    val histTrue = Selection.knTrain(docs, "text")
      .filter(col("grain") === "hist").count()
    val histSummed = (0 to 2).map(i => Selection.knTrain(slice(i), "text")
      .filter(col("grain") === "hist").count()).sum
    assert(histSummed > histTrue,
      s"fixture must have cross-batch history types: $histSummed vs $histTrue")
  }

  test("pplTerciles: ntile(3) assignment per group matches the window definition; planted extremes land head/tail") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // two groups with different sizes incl. non-divisible-by-3 counts,
    // plus score ties sharing a histogram bucket
    val rows = (0 until 17).map(i => ("en", i.toLong, rnd.nextInt(8).toDouble)) ++
      (0 until 8).map(i => ("de", 100L + i, rnd.nextInt(4).toDouble)) ++
      Seq(("en", 50L, 99.0), ("en", 51L, -99.0)) // planted best/worst
    val df = rows.toDF("lang", "doc_id", "score")
    val got = Selection.pplTerciles(df, "lang", "doc_id", "score", buckets = 4)
      .as[(String, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // brute-force ntile(3) over (score DESC, id ASC)
    val exp = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (-r._3, r._2))
      val n = sorted.size; val q = n / 3; val r = n % 3
      val c1 = q + (if (r >= 1) 1 else 0)
      val c2 = c1 + q + (if (r >= 2) 1 else 0)
      sorted.zipWithIndex.map { case (row, i) =>
        (g, row._2) -> (if (i < c1) "head" else if (i < c2) "middle" else "tail")
      }
    }
    assert(got.size === exp.size)
    exp.foreach { case (k, v) =>
      assert(got(k) === v, s"row $k: got ${got(k)}, want $v")
    }
    assert(got(("en", 50L)) === "head" && got(("en", 51L)) === "tail")
    // a null-score row has no place in the order and is dropped
    val withNull = df.unionByName(Seq(("en", 998L)).toDF("lang", "doc_id")
      .withColumn("score", lit(null).cast("double")))
    assert(Selection.pplTerciles(withNull, "lang", "doc_id", "score",
      buckets = 4).count() === rows.size)
  }

  test("ccnetSample: head kept, tail dropped, middle kept iff hash-coin under the group rate") {
    import spark.implicits._
    // every (group, bucket) combination, ids spread so coins vary
    val rows = for {
      g <- Seq("en", "de"); b <- Seq("head", "middle", "tail")
      i <- 0 until 40
    } yield (g, (g.hashCode.abs % 97) * 1000L + Seq("head", "middle", "tail").indexOf(b) * 100 + i, b)
    val df = rows.toDF("lang", "doc_id", "ppl_bucket")
    val rates = Map("en" -> 16, "de" -> 48)
    val got = Selection.ccnetSample(df, "lang", "doc_id", rates)
      .as[(String, Long, String)].collect().map(r => (r._1, r._2)).toSet
    def coin(id: Long): Long = {
      val h = graft.functions.TextHashing.fnv64(id.toString)
      ((h % 64) + 64) % 64
    }
    val exp = rows.filter { case (g, id, b) =>
      b == "head" || (b == "middle" && coin(id) < rates(g))
    }.map { case (g, id, _) => (g, id) }.toSet
    assert(got === exp)
    // all three buckets are represented in the expectation (fixture sanity:
    // the middle filter is neither vacuous nor total)
    val midKept = exp.count { case (_, id) => rows.exists(r => r._2 == id && r._3 == "middle") }
    assert(midKept > 0 && midKept < 80, s"middle kept $midKept of 80")

    // degenerate rates: 0 drops every middle row, 64 keeps every one
    assert(Selection.ccnetSample(df, "lang", "doc_id",
      Map("en" -> 0, "de" -> 0)).filter(col("ppl_bucket") === "middle")
      .count() === 0L)
    assert(Selection.ccnetSample(df, "lang", "doc_id",
      Map("en" -> 64, "de" -> 64)).filter(col("ppl_bucket") === "middle")
      .count() === 80L)
    // a group missing from the map uses defaultKeep64 (0 = head only)
    val onlyEn = Selection.ccnetSample(df, "lang", "doc_id", Map("en" -> 64))
    assert(onlyEn.filter(col("lang") === "de" && col("ppl_bucket") === "middle")
      .count() === 0L)
    assert(onlyEn.filter(col("lang") === "de" && col("ppl_bucket") === "head")
      .count() === 40L)
    // threshold out of range throws
    intercept[IllegalArgumentException] {
      Selection.ccnetSample(df, "lang", "doc_id", Map("en" -> 65))
    }
  }

  test("dsir: target-like feature distributions get higher weights; stable under repartition") {
    // non-en docs use a disjoint bigram vocabulary from en docs
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta alpha"),
      (2L, "en", "alpha beta gamma"),
      (3L, "de", "rot blau rot blau"),
      (4L, "de", "rot blau grun"),
      (5L, "en", "rot blau rot"), // en doc that LOOKS like the target
      (6L, "fr", "x")             // single token → no features → absent
    ).toDF("doc_id", "lang", "text")
    val out = Selection.dsirLogWeights(docs, "text", "doc_id",
      targetPred = col("lang") =!= "en", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L)._2 === 4L && out(4L)._2 === 2L) // n_feat = n_tokens - 1
    // every target-vocab doc outweighs every en-vocab doc — including the
    // en doc whose CONTENT matches the target distribution (DSIR scores
    // content, not labels)
    val tgtLike = Seq(out(3L)._3, out(4L)._3, out(5L)._3)
    val enLike = Seq(out(1L)._3, out(2L)._3)
    assert(tgtLike.min > enLike.max)
    val re = Selection.dsirLogWeights(docs.repartition(7), "text", "doc_id",
      targetPred = col("lang") =!= "en", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(re === out)
  }

  test("selection plans: model tables broadcast — scoring never shuffle-joins the corpus") {
    val docs = (1L to 30L).map(i => (i, if (i % 3 == 0) "de" else "en",
      s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5}")).toDF("doc_id", "lang", "text")
    val p1 = Selection.unigramLogProb(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin"))
    assert(!p1.contains("SortMergeJoin"))
    val p2 = Selection.dsirLogWeights(docs, "text", "doc_id",
      targetPred = col("lang") =!= "en")
      .queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"))
    assert(!p2.contains("SortMergeJoin"))
  }

  // brute-force reference: max prefix of (score DESC, id ASC) with running
  // Σtok ≤ budget
  private def budgetRef(rows: Seq[(Long, Long, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, _, sc) => (-sc, id) }.flatMap { case (id, tok, _) =>
      cum += tok
      if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("token budget: matches the brute-force prefix across budgets and bucket counts") {
    // ties on score, a zero-token doc at the top, varied token counts
    val rows = Seq(
      (1L, 10L, 90L), (2L, 0L, 95L), (3L, 25L, 90L), (4L, 7L, 80L),
      (5L, 40L, 70L), (6L, 13L, 70L), (7L, 5L, 60L), (8L, 21L, 50L),
      (9L, 3L, 50L), (10L, 100L, 40L), (11L, 1L, 30L), (12L, 17L, 95L))
    val df = rows.toDF("doc_id", "n_tok", "score")
    for (budget <- Seq(0L, 5L, 27L, 60L, 111L, 150L, 10000L);
         buckets <- Seq(1, 2, 4, 64)) {
      val got = Selection.selectToTokenBudget(df, "doc_id", "n_tok", "score",
        budget, buckets).select("doc_id").as[Long].collect().toSet
      assert(got === budgetRef(rows, budget),
        s"budget=$budget buckets=$buckets")
    }
  }

  test("token budget: edge cases — empty input, all-equal scores, zero-tok at budget 0") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_tok", "score")
    assert(Selection.selectToTokenBudget(empty, "doc_id", "n_tok", "score",
      10L).count() === 0L)
    // width == 0 path: every row lands in bucket 0, the window does all work
    val flat = Seq((1L, 4L, 7L), (2L, 4L, 7L), (3L, 4L, 7L))
      .toDF("doc_id", "n_tok", "score")
    assert(Selection.selectToTokenBudget(flat, "doc_id", "n_tok", "score",
      8L, 16).select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    // zero-token docs at the best score survive a zero budget (cum stays 0)
    val z = Seq((1L, 0L, 9L), (2L, 3L, 8L)).toDF("doc_id", "n_tok", "score")
    assert(Selection.selectToTokenBudget(z, "doc_id", "n_tok", "score",
      0L, 8).select("doc_id").as[Long].collect().toSet === Set(1L))
    // null score/tok rows drop instead of NPE-ing the driver bucket read
    val withNull = Seq((1L, Some(4L), Some(9L)), (2L, None, Some(8L)),
      (3L, Some(2L), None)).toDF("doc_id", "n_tok", "score")
    assert(Selection.selectToTokenBudget(withNull, "doc_id", "n_tok", "score",
      3L, 8).select("doc_id").as[Long].collect().toSet === Set.empty[Long])
    assert(Selection.selectToTokenBudget(withNull, "doc_id", "n_tok", "score",
      4L, 8).select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("token budget: stable under repartition; boundary window sees only its bucket") {
    val rows = (1L to 200L).map(i => (i, (i % 13) + 1, (i * 37) % 101))
    val df = rows.toDF("doc_id", "n_tok", "score")
    val ref = budgetRef(rows.map(t => (t._1, t._2, t._3)), 400L)
    val got = Selection.selectToTokenBudget(df.repartition(7), "doc_id",
      "n_tok", "score", 400L, 32).select("doc_id").as[Long].collect()
    assert(got.length === got.toSet.size && got.toSet === ref)
    // scale contract: the single-partition (global-sort) exchange exists
    // only on the boundary-bucket branch, fed by a bucket filter — the
    // wholesale branch never sorts
    val plan = Selection.selectToTokenBudget(df, "doc_id", "n_tok", "score",
      400L, 32).queryExecution.executedPlan.toString
    assert(plan.split("Exchange SinglePartition").length - 1 === 1, plan)
    assert(plan.contains("Union"), plan)
  }

  test("mixture budget: per-group prefixes match brute force; unspecified groups dropped") {
    val rows = (1L to 120L).map { i =>
      val g = Seq("a", "b", "c")(i.toInt % 3)
      (i, g, (i % 11) + 1, (i * 53) % 97)
    }
    val df = rows.toDF("doc_id", "grp", "n_tok", "score")
    val budgets = Map("a" -> 60L, "b" -> 150L) // c absent; b binds loosely
    for (buckets <- Seq(1, 8, 64)) {
      val got = Selection.selectToTokenBudgetByGroup(df.repartition(5), "grp",
        "doc_id", "n_tok", "score", budgets, buckets)
        .select("doc_id").as[Long].collect().toSet
      val ref = budgets.keys.flatMap { g =>
        budgetRef(rows.filter(_._2 == g).map(t => (t._1, t._3, t._4)), budgets(g))
      }.toSet
      assert(got === ref, s"buckets=$buckets")
      assert(!got.exists(id => rows.find(_._1 == id).get._2 == "c"))
    }
    // a group whose total fits its budget is kept whole (boundary past the
    // last bucket — no window rows for it)
    val all = Selection.selectToTokenBudgetByGroup(df, "grp", "doc_id",
      "n_tok", "score", Map("a" -> 100000L), 16)
      .select("doc_id").as[Long].collect().toSet
    assert(all === rows.filter(_._2 == "a").map(_._1).toSet)
    // the boundary window is keyed by group — no single-partition exchange
    val plan = Selection.selectToTokenBudgetByGroup(df, "grp", "doc_id",
      "n_tok", "score", budgets, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("quality floor: ceil(frac*n) kept per group, deterministic on ties") {
    val df = Seq(
      // group a: 5 rows, scores 5..1 → keepFrac=0.5 keeps ceil(2.5)=3
      (1L, "a", 5.0), (2L, "a", 4.0), (3L, "a", 3.0), (4L, "a", 2.0), (5L, "a", 1.0),
      // group b: 3 rows all TIED → keeps ceil(1.5)=2, smallest ids win
      (10L, "b", 7.0), (11L, "b", 7.0), (12L, "b", 7.0),
      // group c: 1 row → ceil(0.5)=1, a tiny group is never emptied
      (20L, "c", 0.1)
    ).toDF("doc_id", "src", "score")
    val kept = Selection.qualityFloor(df, "src", "score", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 10L, 11L, 20L))
    // keepFrac=1 is the identity; schema passes through
    val all = Selection.qualityFloor(df, "src", "score", "doc_id", 1.0)
    assert(all.count() === 9L && all.columns.toSeq === df.columns.toSeq)
    // both windows share one hash(src) exchange — exactly 1, never 2
    val plan = Selection.qualityFloor(df, "src", "score", "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
  test("pareto front equals brute-force strict dominance on random data with ties") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 5) {
      val rows = (1 to 200).map(i =>
        (i.toLong, rnd.nextInt(15), rnd.nextInt(20).toDouble))
      val brute = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, x2, y2) =>
          x2 <= x && y2 >= y && (x2 < x || y2 > y) }
      }.map(_._1).toSet
      val got = Selection.paretoFront(rows.toDF("id", "x", "y"), "x", "y")
        .select("id").as[Long].collect().toSet
      assert(got === brute, s"trial=$trial")
    }
  }

  test("effectiveSampleSize: uniform = n, dominance collapses, underflow null") {
    def ess(rows: Seq[(String, Double)]): Map[String, (Long, Option[Double], Option[Double])] =
      Selection.effectiveSampleSize(rows.toDF("g", "lw"), "g", "lw")
        .as[(String, Long, Option[Double], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // uniform weights (any shared log-weight) -> ESS = n, ratio 1
    val u = ess(Seq.fill(5)(("u", -2.5)))("u")
    assert(u === ((5L, Some(5.0), Some(1.0))))
    // one dominant weight: lw = [ln 1e6, 0, 0] -> w = [1e6, 1, 1]
    // ESS ~ 1 (ratio ~ 1/3): the corpus is effectively one document
    val d = ess(Seq(("d", math.log(1e6)), ("d", 0.0), ("d", 0.0)))("d")
    assert(d._1 === 3L && d._2.get < 1.001 && d._2.get >= 1.0)
    // hand case: w = [2, 1] -> ESS = 9/5 = 1.8, ratio 0.9
    val h = ess(Seq(("h", math.log(2.0)), ("h", 0.0)))("h")
    assert(h === ((2L, Some(1.8), Some(0.9))))
    // every weight underflows the micro grid (lw << -14) -> null
    val z = ess(Seq(("z", -40.0), ("z", -50.0)))("z")
    assert(z === ((2L, None, None)))
    // null group / null weight rows excluded
    val withNull = Seq((Some("a"), Some(0.0)), (None, Some(0.0)),
      (Some("a"), None)).toDF("g", "lw")
    assert(Selection.effectiveSampleSize(withNull, "g", "lw")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .head._2 === 1L)
  }

}
