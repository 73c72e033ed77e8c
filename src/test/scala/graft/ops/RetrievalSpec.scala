package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffle join spark spark"), // tf(spark)=3, dl=5
    (2L, "spark join"),                     // tf(spark)=1, dl=2
    (3L, "merge sort merge"),               // no 'spark'
    (4L, "the quick brown fox"),            // no query terms at all
    (5L, "")                                // empty doc
  ).toDF("doc_id", "text")
    // null text must not poison the corpus stats (size(null)=-1 into Σdl);
    // the hand-computed N=5/avgdl=2.8 assertions below only hold if this
    // row is excluded from the statistics entirely
    .unionByName(Seq((6L, Option.empty[String])).toDF("doc_id", "text"))

  test("bm25: hand-computed scores, ordering, and non-matching docs excluded") {
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Double, Int)].collect()
    // N=5, df=2, avgdl=(5+2+3+4+0)/5 = 2.8
    val n = 5.0; val df = 2.0; val avgdl = 14.0 / 5.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expect1 = BigDecimal(s(3, 5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect2 = BigDecimal(s(1, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // only matching docs, ranked
    assert(math.abs(out(0)._2 - expect1) < 1e-9)
    assert(math.abs(out(1)._2 - expect2) < 1e-9)
    assert(out.forall(_._3 == 1))
  }

  test("bm25: repeated rare term outranks longer doc; multi-term n_matched") {
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "merge"), k = 10).as[(Long, Double, Int)].collect()
    // docs 1,2 match 'spark'; doc 3 matches 'merge'; 4,5 excluded
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(out.forall(_._3 == 1)) // no doc contains both terms
  }

  test("rrf: fusion favors a doc present in both lists; k0 formula exact") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", k = 10)
      .as[(Long, Double, Int)].collect()
    // doc 20: 1/62 + 1/61; doc 10: 1/61; doc 40: 1/62; doc 30: 1/63
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._1 === 20L && out.head._3 === 2)
    assert(out.head._2 === r6(1.0 / 62 + 1.0 / 61))
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
  }

  test("ranked: deterministic id tie-break on equal scores") {
    val top = Seq((5L, 1.0), (2L, 1.0), (9L, 2.0)).toDF("id", "score")
    val out = Retrieval.ranked(top, "id", "score").orderBy($"rank")
      .select($"id").as[Long].collect()
    assert(out.toSeq === Seq(9L, 2L, 5L)) // score desc, then id asc
  }

  test("mmr: near-duplicate of the top hit is demoted below a diverse candidate") {
    // a and b identical (rel ≈ 1), c diagonal (rel ≈ 0.707): pure-relevance
    // order is a, b, c; at λ=0.3 the redundancy penalty flips b and c
    val shortlist = Seq(
      (1L, Array(1.0f, 0.0f), 1.0),
      (2L, Array(1.0f, 0.0f), 1.0),
      (3L, Array(0.7f, 0.7f), 0.7071)
    ).toDF("vec_id", "embedding", "score")
    val diverse = Retrieval.mmrRerank(shortlist, "vec_id", "embedding",
        "score", k = 3, lambdaTenths = 3)
      .as[(Long, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(diverse === Seq(1L, 3L, 2L))
    // at λ=10 the penalty vanishes and MMR degenerates to relevance order
    val pure = Retrieval.mmrRerank(shortlist, "vec_id", "embedding",
        "score", k = 3, lambdaTenths = 10)
      .as[(Long, Int)].collect().sortBy(_._2).map(_._1).toSeq
    assert(pure === Seq(1L, 2L, 3L))
  }

  test("assembleContext: near-dup drops worse rank, budget packs a prefix, oversized flags") {
    // ranks 1..5; doc 30 is a token-identical copy of rank-1 doc 10 (hamming
    // 0 → dropped); doc 50 differs in every token (survives). Budget 9:
    // survivors 10(4 tok) + 20(4 tok) fit (cum 8), 40 (4 tok) overflows and
    // closes the context — 50 stays out even though it would fit alone
    // (next-fit, not best-fit).
    val shortlist = Seq(
      (10L, "alpha beta gamma delta", 1),
      (20L, "epsilon zeta eta theta", 2),
      (30L, "alpha beta gamma delta", 3), // near-dup of 10, worse rank
      (40L, "iota kappa lambda mu", 4),
      (50L, "nu xi omicron pi", 5)
    ).toDF("doc_id", "text", "rank")
    val out = Retrieval.assembleContext(shortlist, "doc_id", "text", "rank",
        budgetTokens = 9, maxHamming = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(out === Seq((10L, 1, 4, 4L, false), (20L, 2, 4, 8L, false)))
    // rank-1 oversized doc still enters alone, flagged
    val big = Seq(
      (1L, (1 to 20).map("w" + _).mkString(" "), 1),
      (2L, "short text", 2)
    ).toDF("doc_id", "text", "rank")
    val out2 = Retrieval.assembleContext(big, "doc_id", "text", "rank",
        budgetTokens = 5, maxHamming = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSeq
    assert(out2 === Seq((1L, 1, 20, 20L, true)))
  }

  test("retrievalEval: MMR beats plain top-k on a redundancy-planted judgment set") {
    // Corpus: three near-identical copies of the best passage (vectors
    // collinear) + two distinct relevant passages. Plain cosine top-3 is
    // the three clones — only ONE counts as relevant (clones share one
    // judged doc's content but only doc 1 is judged relevant; 2,3 are
    // judged 0). MMR at λ=0.5 picks 1, then the diverse 4 and 5.
    val shortlist = Seq(
      (1L, Array(1.00f, 0.00f, 0f), 0.99),
      (2L, Array(0.999f, 0.01f, 0f), 0.98),
      (3L, Array(0.998f, 0.02f, 0f), 0.97),
      (4L, Array(0.0f, 1.0f, 0f), 0.60),
      (5L, Array(0.0f, 0.0f, 1f), 0.55)
    ).toDF("doc_id", "embedding", "score")
    val truth = Seq((7L, 1L, 1), (7L, 4L, 1), (7L, 5L, 1))
      .toDF("q_id", "doc_id", "rel")
    def evalOf(results: org.apache.spark.sql.DataFrame): Double =
      Retrieval.retrievalEval(results, truth, "q_id", "doc_id", "rank", "rel", k = 3)
        .filter($"q_id" === 7L).select($"recall_k").as[Double].head()
    val plain = Retrieval.ranked(shortlist, "doc_id", "score")
      .select(lit(7L).as("q_id"), $"doc_id", $"rank")
    val mmr = Retrieval.mmrRerank(shortlist, "doc_id", "embedding", "score",
        k = 3, lambdaTenths = 5)
      .select(lit(7L).as("q_id"), $"doc_id", $"rn".as("rank"))
    val (rPlain, rMmr) = (evalOf(plain), evalOf(mmr))
    assert(math.abs(rPlain - 1.0 / 3.0) < 1e-5) // clones crowd out 4 and 5
    assert(rMmr === 1.0)                        // diversity recovers full recall
  }

  test("bm25 equals a naive reference on random corpora (seeded)") {
    val vocab = Array("u", "v", "w", "xx", "yy")
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val docs = (1L to 15L).map(i =>
        i -> Array.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))))
      val terms = rnd.shuffle(vocab.toSeq).take(1 + rnd.nextInt(2))
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
      val got = Retrieval.bm25TopK(df, "text", "doc_id", terms, k = 100)
        .as[(Long, Double, Int)].collect()
      // naive reference
      val n = docs.size.toDouble
      val avgdl = docs.map(_._2.length).sum.toDouble / n
      val dfs = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
      def score(toks: Array[String]): Double = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
      }.sum
      val expect = docs
        .map { case (i, t) => (i, score(t), terms.count(t.contains)) }
        .filter(_._3 > 0)
        .sortBy { case (i, s, _) => (-s, i) }
      assert(got.map(_._1).toSeq === expect.map(_._1),
        s"trial=$trial terms=$terms")
      got.zip(expect).foreach { case ((_, gs, gm), (_, es, em)) =>
        assert(math.abs(gs - es) < 2e-6 && gm === em, s"trial=$trial")
      }
    }
  }

  test("bm25Join ranks each query like a per-query bm25TopK; unmatched queries vanish") {
    val corpus = Seq(
      (1L, "spark shuffle join spark spark"),
      (2L, "spark join"),
      (3L, "merge sort merge"),
      (4L, "the quick brown fox"),
      (5L, "sort merge join spark")
    ).toDF("doc_id", "text")
    val queries = Seq(
      (100L, "spark join"),
      (200L, "merge"),
      (300L, "zzz")  // matches nothing → no output rows for this query
    ).toDF("q_id", "q_text")
    val got = Retrieval.bm25Join(queries, "q_id", "q_text",
      corpus, "doc_id", "text", k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._4).map(_._2).toSeq }
    assert(got.keySet === Set(100L, 200L))
    // per-query reference: the single-query scan with the same term sets
    def ref(terms: Seq[String]) = Retrieval.bm25TopK(
      corpus, "text", "doc_id", terms, k = 5)
      .as[(Long, Double, Int)].collect().map(_._1).toSeq
    assert(got(100L) === ref(Seq("spark", "join")))
    assert(got(200L) === ref(Seq("merge")))
  }

  test("streaming-maintained bm25 stats: per-batch appends merge to the exact batch stats") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val terms = Seq("spark", "merge")
    val all = (1L to 60L).map(i =>
      (i, s"spark doc$i " + (if (i % 3 == 0) "merge join " else "scan ") * (1 + (i % 4).toInt)))
    val ms = MemoryStream[(Long, String)](spark)
    val statsRows = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the additive per-batch stats row — what a real pipeline appends
        // to its stats table each micro-batch
        statsRows ++= Retrieval.bm25Stats(batch, "text", "doc_id", terms).collect()
        ()
      }
      .start()
    try {
      all.grouped(20).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    assert(statsRows.size === 3)
    val statsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(statsRows.toSeq),
      Retrieval.bm25Stats(all.toDF("doc_id", "text"), "text", "doc_id", terms).schema)
    val merged = Retrieval.mergeStats(statsDf, terms.size)
    val batchStats = Retrieval.bm25Stats(all.toDF("doc_id", "text"), "text", "doc_id", terms)
    assert(merged.collect().toSeq === batchStats.collect().toSeq)
    // and a probe against the maintained stats equals the batch probe
    val corpus = all.toDF("doc_id", "text")
    val viaMaintained = Retrieval.bm25TopKWithStats(
      corpus, "text", "doc_id", merged, terms, k = 10).collect().toSeq
    val viaBatch = Retrieval.bm25TopK(corpus, "text", "doc_id", terms, k = 10)
      .collect().toSeq
    assert(viaMaintained === viaBatch)
  }

  test("bm25 plan: one broadcast stats row + TakeOrderedAndProject, no extra shuffle") {
    // Needs more input rows than k: Catalyst's EliminateLimits drops the
    // Limit (and with it the TakeOrdered pattern) when child maxRows <= k.
    val many = (1L to 40L).map(i => (i, s"spark doc $i")).toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(many, "text", "doc_id", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    // the only Exchange is the stats row's single-partition aggregate +
    // broadcast — scoring itself must not shuffle the corpus
    assert(!plan.contains("rangepartitioning"))
  }
  test("item cooccurrence: hand counts, per-user cap bounds a catalog bot") {
    // users 1..4 share items; user 9 is a bot touching 100 items but the
    // cap=3 keeps only its 3 smallest, so it mints 3 pairs, not 4950
    val ev = Seq(
      (1L, 10), (1L, 20), (2L, 10), (2L, 20), (3L, 10), (3L, 20),
      (4L, 10), (4L, 30), (1L, 10) // duplicate touch — distinct'd
    ).toDF("user_id", "item")
    val bot = (0 until 100).map(i => (9L, i + 1000)).toDF("user_id", "item")
    val got = Retrieval.itemCooccurrence(ev.unionByName(bot), "user_id", "item",
        maxItemsPerUser = 3, minPairCount = 1L, topK = 10)
      .as[(Int, Int, Long, Long, Long, Double)].collect().toSeq
    // U = 5 capped users; supports: 10->4, 20->3, 30->1, bot items 1000..1002 -> 1
    // pairs: (10,20)x3 lift=3*5/(4*3)=1.25; (10,30)x1 lift=5/4=1.25;
    //        bot pairs (1000,1001),(1000,1002),(1001,1002) lift=5
    assert(got.head === ((10, 20, 3L, 4L, 3L, 1.25)))
    assert(got.length === 5)
    assert(got.count(_._1 >= 1000) === 3)
    assert(got.filter(_._1 >= 1000).forall(p => p._3 == 1L && p._6 == 5.0))
  }

  test("associationRules: directional confidence, hand stats, top-k order") {
    // users 1..4: supports 10->4, 20->3, 30->1; pair (10,20)x3, (10,30)x1
    val ev = Seq(
      (1L, 10), (1L, 20), (2L, 10), (2L, 20), (3L, 10), (3L, 20),
      (4L, 10), (4L, 30)
    ).toDF("user_id", "item")
    val got = Retrieval.associationRules(ev, "user_id", "item",
        maxItemsPerUser = 10, minPairCount = 1L, topK = 10)
      .as[(Int, Int, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.length === 4) // two pairs, both directions
    val byRule = got.map(r => (r._1, r._2) -> r).toMap
    // 20 -> 10: conf 3/3 = 1.0; 30 -> 10: conf 1/1 = 1.0
    // 10 -> 20: conf 3/4 = 0.75; 10 -> 30: conf 1/4 = 0.25
    assert(byRule((20, 10))._7 === 1.0 && byRule((30, 10))._7 === 1.0)
    assert(byRule((10, 20))._7 === 0.75 && byRule((10, 30))._7 === 0.25)
    // support n_ab/U, lift symmetric: (10,20): 3*4/(4*3)=1; (10,30): 4/4=1
    assert(byRule((10, 20))._6 === 0.75 && byRule((10, 20))._8 === 1.0)
    assert(byRule((10, 30))._6 === 0.25 && byRule((30, 10))._8 === 1.0)
    // deterministic order: conf desc, then antecedent, consequent
    assert(got.map(r => (r._1, r._2)) ===
      Seq((20, 10), (30, 10), (10, 20), (10, 30)))
    // topK truncation happens on the sorted stream
    val top1 = Retrieval.associationRules(ev, "user_id", "item",
        maxItemsPerUser = 10, minPairCount = 1L, topK = 1)
      .as[(Int, Int, Long, Long, Long, Double, Double, Double)].collect()
    assert(top1.map(r => (r._1, r._2)).toSeq === Seq((20, 10)))
  }

  test("retrievalEval: hand-computed recall/precision/MRR/nDCG and exact macro") {
    // q=1: truth 10(rel3) 12(rel2) 11(rel1); ranked: 11@1, 99@2, 10@3.
    //   hits@3 = {11,10} = 2; recall 2/3; precision 2/3; rr = 1/1.
    //   DCG  = (2^1-1)/log2(2) + (2^3-1)/log2(4) = 1 + 3.5 = 4.5
    //   IDCG = 7/log2(2) + 3/log2(3) + 1/log2(4)
    // q=2: truth 20(rel1); ranked 5@1 only -> all zeros, hits 0.
    val results = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3), (2L, 5L, 1))
      .toDF("q_id", "doc_id", "rank")
    val truth = Seq((1L, 10L, 3), (1L, 12L, 2), (1L, 11L, 1), (2L, 20L, 1))
      .toDF("q_id", "doc_id", "rel")
    val got = Retrieval.retrievalEval(results, truth, "q_id", "doc_id",
        "rank", "rel", k = 3)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    def mic(x: Double): Double = math.round(x * 1e6) / 1e6
    val idcg = 7.0 / 1.0 + 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val ndcg1 = mic(4.5 / idcg)
    assert(got(1L) === ((1L, 3L, 2L, 0.666667, 0.666667, 1.0, ndcg1)))
    assert(got(2L) === ((2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // macro row: averages of the per-query micro-LONGs, exactly
    val m = got(-1L)
    assert(m._2 === 2L && m._3 === 2L)            // 2 queries, 2 total hits
    assert(m._4 === 0.333334)   // (666667 + 0)/2 = 333333.5 -> half-away 333334
    assert(m._6 === 0.5)
    assert(m._7 === math.round(ndcg1 * 1e6 / 2).toDouble / 1e6)
  }

  test("normalizedFuse: min-max per list, weights, missing docs, degenerate list") {
    // list A scores: 10 -> 1.0, 5 -> 0.5, 0 -> 0.0 after min-max
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("doc_id", "score")
    // list B scores: 2 -> 1.0, 1 -> 0.0; doc 4 only in B
    val b = Seq((2L, 2.0), (4L, 1.0)).toDF("doc_id", "score")
    val got = Retrieval.normalizedFuse(Seq((a, 0.7), (b, 0.3)),
        "doc_id", "score", k = 10)
      .as[(Long, Double, Int)].collect().toSeq
    // fused: d1 = 0.7*1.0 = 0.7; d2 = 0.7*0.5 + 0.3*1.0 = 0.65;
    //        d4 = 0.3*0.0 = 0.0; d3 = 0.7*0.0 = 0.0 (tie -> id order)
    assert(got === Seq((1L, 0.7, 1), (2L, 0.65, 2), (3L, 0.0, 1), (4L, 0.0, 1)))
    // single-score list normalizes to 1.0 (max == min convention)
    val single = Seq((9L, 42.0)).toDF("doc_id", "score")
    assert(Retrieval.normalizedFuse(Seq((single, 1.0)), "doc_id", "score", 5)
      .as[(Long, Double, Int)].collect().toSeq === Seq((9L, 1.0, 1)))
    // k caps the output by (fused DESC, id)
    assert(Retrieval.normalizedFuse(Seq((a, 1.0)), "doc_id", "score", 2)
      .as[(Long, Double, Int)].collect().map(_._1).toSeq === Seq(1L, 2L))
  }

  test("groundingScore: exact bigram coverage, hallucination penalized, edge cases") {
    val rows = Seq(
      // fully grounded: all 4 answer bigrams appear in the context
      (1L, "the quick brown fox jumps", "the quick brown fox jumps over the lazy dog"),
      // fully hallucinated: 0 of 3
      (2L, "purple elephants dance tonight", "the quick brown fox"),
      // partial: "the quick" grounded, "quick purple"/"purple fox" not → 1/3
      (3L, "the quick purple fox", "the quick brown fox"),
      // one-token answer → no bigram → score 0.0 by convention
      (4L, "single", "anything goes here"),
      // null answer → empty → 0
      (5L, null: String, "some context text"),
      // DISTINCT set semantics: repeated bigram counts once on both sides
      (6L, "the the the the", "the the")
    ).toDF("id", "answer", "context")
    val got = Retrieval.groundingScore(rows, "answer", "context", n = 2)
      .select("id", "n_ngrams", "n_grounded", "grounding_score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 4L, 4L, 1.0),
      (2L, 3L, 0L, 0.0),
      (3L, 3L, 1L, 0.333333),
      (4L, 0L, 0L, 0.0),
      (5L, 0L, 0L, 0.0),
      (6L, 1L, 1L, 1.0)))
    // unigram mode over-credits: row 3 scores 3/4 on tokens vs 1/3 on bigrams
    val uni = Retrieval.groundingScore(rows, "answer", "context", n = 1)
      .select("id", "grounding_score").as[(Long, Double)].collect().toMap
    assert(uni(3L) === 0.75)
  }

}
