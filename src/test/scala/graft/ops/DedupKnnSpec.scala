package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    Seq(
      (1L, base),
      (2L, base),                                        // exact dup of 1
      (3L, base.replace("kappa", "lambda")),             // near dup of 1
      (4L, "totally different words nothing shared here at all whatsoever"),
      (5L, "Alpha  Beta gamma delta epsilon zeta eta theta iota kappa " * 3) // case/space dup
    ).toDF("doc_id", "text")
  }

  test("exact dedup finds normalized duplicates, keeps smallest id") {
    val groups = Dedup.exact(corpus, "text", "doc_id").collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[Long]("n_dups") === 3)        // 1, 2, 5 normalize equal
    assert(groups(0).getAs[Long]("keeper_id") === 1L)
    val kept = Dedup.exactDedup(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("dedupCdcChunks: exact copy stores nothing, edited copy keeps only touched chunks, reassembly byte-exact") {
    // unique words so the original's chunks are globally unique — its
    // reassembly must then be the identity
    val baseText = (1 to 200).map(i => s"w${i * 37 % 211}q$i").mkString(" ")
    val edited = "EDIT! " + baseText
    val docs = Seq((1L, baseText), (2L, edited), (3L, baseText),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = Dedup.dedupCdcChunks(docs, "text", "id",
      window = 8, maskBits = 5)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is first in (id, chunk_idx) order: keeps every chunk, and
    // byte-exact reassembly returns the original text verbatim
    assert(got(1L)._2 === baseText)
    assert(got(1L)._3 === got(1L)._4, "doc 1 must keep all chunks")
    assert(got(1L)._5 === baseText.getBytes("UTF-8").length)
    // doc 3 is an exact copy: every chunk first occurred in doc 1
    assert(got(3L)._4 === 0L, "exact copy must store nothing")
    assert(got(3L)._2 === "")
    assert(got(3L)._5 === 0L)
    // doc 2 (front insertion): CDC re-sync means only the edited head
    // chunks survive — the entire shared tail dedups away
    assert(got(2L)._4 >= 1L && got(2L)._4 <= 2L,
      s"edited copy must keep only the touched head chunks: ${got(2L)}")
    assert(edited.startsWith(got(2L)._2),
      "survivors of a front edit are a prefix of the edited text")
    // null text → absent
    assert(!got.contains(4L))
    // chunk totals agree with the chunker
    val nCh = TextAnalysis.cdcChunks(docs, "text", "id", 8, 5)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(got(1L)._3 === nCh(1L) && got(2L)._3 === nCh(2L))
  }

  test("incremental dedup: delta tested against base AND within itself") {
    val base = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "Alpha  beta GAMMA"),   // normalizes equal to base 1 → drops
      (11L, "eta theta iota"),      // new content → survives
      (12L, "eta theta iota"),      // within-delta dup of 11 → drops
      (13L, "delta epsilon zeta"),  // equal to base 2 → drops
      (14L, "kappa lambda mu")      // new → survives
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(base, delta, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 14L))
    // idempotence: re-running the surviving delta against base ∪ survivors
    // (the post-ingest state) keeps nothing — the exactly-once ingest shape
    val base2 = base.unionByName(delta.filter(col("doc_id").isin(11L, 14L)))
    assert(Dedup.incrementalDedup(base2, delta, "text", "doc_id").count() === 0L)
  }

  test("incremental near-dups: pairs touching the delta only, cross and within") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val base = Seq(
      (1L, long),                                       // near-dup source in base
      (2L, "delta epsilon zeta completely other content right here"),
      (3L, "unrelated base words nothing shared anywhere at all")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (11L, long.replace("kappa", "lambda")),           // near dup of base 1
      (12L, long.replace("kappa", "lambda").replace("iota", "pi")), // near dup of 11 (and 1)
      (13L, "fresh delta content with no duplicate partner present")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(base, delta, "text", "doc_id",
      threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 11L)), "cross base-delta near dup must surface")
    assert(got.contains((11L, 12L)), "within-delta near dup must surface")
    assert(!got.exists(p => p._1 == 13L || p._2 == 13L), "unique delta doc must not pair")
    assert(got.forall(p => p._1 >= 11L || p._2 >= 11L),
      s"every pair must touch the delta: $got")
    // the materialized-artifact path returns the identical pair set
    val bandTable = Dedup.minhashBandTable(base, "text", "doc_id",
      shingleN = 3, numHashes = 64, bands = 32)
    val viaArtifact = Dedup.incrementalNearDups(base, delta, "text", "doc_id",
      threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32,
      baseBandTable = Some(bandTable))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaArtifact === got)
    // saturated buckets are skipped PER SLICE (the batch op's stop-bucket
    // trade applied to each side): with two near-identical base docs most
    // cross buckets hold 2 base members — at cap 2 they are admitted; at
    // cap 1 they drop and only bands where the base copies differ can
    // still surface a cross pair. Within-delta buckets are capped by
    // DELTA membership alone (11,12 share size-2 buckets → alive at cap 2).
    val base2 = base.unionByName(Seq((4L, long + " extra tail word")).toDF("doc_id", "text"))
    val cap2 = Dedup.incrementalNearDups(base2, delta, "text", "doc_id",
      threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32, maxBucket = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.incrementalNearDups(base2, delta, "text", "doc_id",
      threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cap2.subsetOf(uncapped))
    assert(cap2.contains((11L, 12L)),
      "within-delta pair must survive a cap its bucket respects")
  }

  test("appendBandTable: appended counts are GLOBAL — row-identical to a from-scratch rebuild") {
    // three base copies + two slice copies of one text share every band
    // bucket: the rebuilt table counts 5 everywhere, while a bare union of
    // per-slice builds would carry 3 and 2 — the eroded-saturation-guard
    // bug this helper exists to prevent (a bucket over maxBucket globally
    // but under it per-slice would never be skipped)
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base = Seq((1L, t), (2L, t), (3L, t),
      (4L, "unrelated base words nothing shared anywhere at all")).toDF("doc_id", "text")
    val slice = Seq((11L, t), (12L, t),
      (13L, "fresh slice content with no duplicate partner here")).toDF("doc_id", "text")
    val args = (3, 16, 8) // shingleN, numHashes, bands
    val appended = Dedup.appendBandTable(
      Dedup.minhashBandTable(base, "text", "doc_id", args._1, args._2, args._3),
      slice, "text", "doc_id", args._1, args._2, args._3)
      .select("doc_id", "band_idx", "band_hash", "_bucket_n")
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    val rebuilt = Dedup.minhashBandTable(base.unionByName(slice), "text", "doc_id",
      args._1, args._2, args._3)
      .select("doc_id", "band_idx", "band_hash", "_bucket_n")
      .as[(Long, Int, Long, Long)].collect().sorted.toSeq
    assert(appended === rebuilt)
    assert(appended.exists(_._4 === 5L), "shared buckets must count base+slice members")
  }

  test("minhash near-dups find the planted near-duplicate pair") {
    // 32 bands × 2 rows: P(candidate) = 1-(1-J²)^32 ≈ 1 at J ≥ 0.5
    val pairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup must surface")
    assert(pairs.contains((1L, 3L)), "near dup must surface")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("simhash near-dups agree") {
    val pairs = Dedup.simhashNearDups(corpus, "text", "doc_id", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardPairs matches brute-force jaccard") {
    val pairs = Dedup.jaccardPairs(corpus, "text", "doc_id", shingleN = 1, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    val docs = corpus.collect().map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    for { a <- docs.keys; b <- docs.keys if a < b } {
      val inter = docs(a).intersect(docs(b)).size
      val uni = docs(a).union(docs(b)).size
      val exp = inter.toDouble / uni
      if (inter > 0) assert(math.abs(pairs((a, b)) - exp) < 1e-12)
      else assert(!pairs.contains((a, b)))
    }
  }

  test("prefixJaccardPairs ≡ jaccardPairs: full recall from prefix candidates only") {
    // a corpus where the inverted index is dominated by stop-words the
    // prefix filter must never need: 40 docs sharing a 12-word template
    // with per-doc rare suffix words, plus planted near-dup pairs at
    // several similarity levels and a couple of tiny/disjoint docs
    val template = "the quick brown fox jumps over a lazy dog near some river"
    val docs = (0 until 40).map { i =>
      (i.toLong, s"$template unique$i token$i extra${i % 7} tail${i % 3}")
    } ++ Seq(
      (100L, s"$template unique1 token1 extra1 tail1"),   // near dup of doc 1
      (101L, template),                                    // template only
      (102L, "completely disjoint vocabulary entirely separate words"),
      (103L, "tiny doc"))
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8, 0.95)) {
      val exact = Dedup.jaccardPairs(df, "text", "doc_id", shingleN = 1, threshold = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val pp = Dedup.prefixJaccardPairs(df, "text", "doc_id", shingleN = 1, threshold = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(pp.keySet === exact.keySet, s"threshold $t")
      pp.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-12, s"$k at $t") }
    }
    // 2-gram shingles agree too
    val e2 = Dedup.jaccardPairs(df, "text", "doc_id", shingleN = 2, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = Dedup.prefixJaccardPairs(df, "text", "doc_id", shingleN = 2, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === e2)
    // the candidate join is an equi-join on prefix shingles — no nested
    // loop / cartesian anywhere in the plan
    val plan = Dedup.prefixJaccardPairs(df, "text", "doc_id", 1, 0.8)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("distributed quantized k-means: hand-checked clusters, repartition-stable") {
    // two tight 2-D clusters; init = first k by id → ids 1,2 (both in the
    // left cluster) — Lloyd must still separate: after iter 1 centroid 0
    // keeps the left points and centroid 1 captures the right cluster
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.0f, 0.1f)),
      (4L, Array(5.0f, 5.0f)), (5L, Array(5.1f, 5.0f)), (6L, Array(5.0f, 5.1f))
    ).toDF("vec_id", "embedding")
    val got = Knn.kmeansFit(pts, "embedding", "vec_id", k = 2, iterations = 3)
      .orderBy("cell")
      .as[(Int, Long, Seq[Long])].collect()
    assert(got.length === 2)
    assert(got(0)._2 + got(1)._2 === 6L)
    // converged means: left cluster ≈ (0.033, 0.033), right ≈ (5.033, 5.033)
    val left = got(0)._3.map(_ / 1e6); val right = got(1)._3.map(_ / 1e6)
    assert(math.abs(left(0) - 0.0333) < 0.001 && math.abs(left(1) - 0.0333) < 0.001, left)
    assert(math.abs(right(0) - 5.0333) < 0.001 && math.abs(right(1) - 5.0333) < 0.001, right)
    // bit-stable under repartition — the determinism contract
    val re = Knn.kmeansFit(pts.repartition(7), "embedding", "vec_id",
      k = 2, iterations = 3).orderBy("cell")
      .as[(Int, Long, Seq[Long])].collect()
    assert(re.toSeq === got.toSeq)
    // an empty cell keeps its previous centroid with n = 0: k = 3 with
    // init ids 1,2,3 — centroid 1 (id 2's point) loses every member to
    // centroids 0/2 only if geometry says so; just assert counts sum and
    // determinism of the report shape
    val k3 = Knn.kmeansFit(pts, "embedding", "vec_id", k = 3, iterations = 2)
      .as[(Int, Long, Seq[Long])].collect()
    assert(k3.map(_._2).sum === 6L)
    assert(k3.map(_._1).sorted.toSeq === Seq(0, 1, 2))
  }

  test("containmentPairs: subset scores 1.0 where jaccard stays low; df cap drops stop-shingles") {
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, page),                       // the source page (10 distinct tokens)
      (2L, "alpha beta gamma"),         // 3-token quote: containment 1.0, jaccard 0.3
      (3L, "mu nu xi omicron")          // disjoint
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", 1, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)))
    // the same pair is invisible to symmetric jaccard at 0.9
    assert(Dedup.jaccardPairs(docs, "text", "doc_id", 1, 0.9).isEmpty)
    // maxDocFreq drops a corpus-wide stop token from the index: a pair
    // held together ONLY by the hot token disappears (under-counting near
    // the threshold is the documented trade)
    val hot = Seq(
      (1L, "the alpha beta"), (2L, "the gamma delta"), (3L, "the epsilon zeta")
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(hot, "text", "doc_id", 1, 0.3).count() === 3L)
    assert(Dedup.containmentPairs(hot, "text", "doc_id", 1, 0.3,
      maxDocFreq = 2).isEmpty)
  }

  test("centroid maintenance: batch-state fold ≡ one kmeansFit iteration over the grown corpus") {
    val base = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(5.0f, 5.0f)), (3L, Array(0.0f, 0.1f)),
      (4L, Array(5.1f, 5.0f))).toDF("vec_id", "embedding")
    val b1 = Seq((5L, Array(0.2f, 0.1f)), (6L, Array(5.0f, 5.2f)))
      .toDF("vec_id", "embedding")
    val b2 = Seq((7L, Array(0.1f, 0.3f)), (8L, Array(4.8f, 5.1f)))
      .toDF("vec_id", "embedding")
    // standing centroids = kmeansFit's init over the GROWN corpus (first
    // k by id: ids 1, 2) — so fold-then-refresh must reproduce
    // kmeansFit(grown, iterations = 1) bit-for-bit
    val standing: Seq[Seq[Long]] = Seq(Seq(0L, 0L), Seq(5000000L, 5000000L))
    val grown = base.unionByName(b1).unionByName(b2)
    val folded = Knn.centroidBatchState(base, "embedding", standing)
      .fold(Knn.centroidBatchState(b1, "embedding", standing))
      .fold(Knn.centroidBatchState(b2, "embedding", standing))
    val direct = Knn.centroidBatchState(grown, "embedding", standing)
    assert(folded.sameAs(direct))
    val refreshed = Knn.refreshCentroids(folded, standing)
    val fit = Knn.kmeansFit(grown, "embedding", "vec_id", k = 2, iterations = 1)
      .orderBy("cell").as[(Int, Long, Seq[Long])].collect()
    assert(fit.map(_._3.toSeq).toSeq === refreshed.map(_.toSeq).toSeq)
    assert(fit.map(_._2).toSeq === folded.counts.toSeq)
    // an empty cell keeps its previous centroid through the refresh
    val phantom: Seq[Seq[Long]] = standing :+ Seq(99000000L, 99000000L)
    val st = Knn.centroidBatchState(grown, "embedding", phantom)
    assert(st.counts(2) === 0L)
    assert(Knn.refreshCentroids(st, phantom)(2).toSeq === Seq(99000000L, 99000000L))
    // reassignment audit: the refresh moves no point across the two
    // well-separated cells; a swapped quantizer flips every row
    val audit = Knn.reassignmentAudit(grown, "embedding", standing,
      refreshed.map(_.toSeq).toSeq).as[(Long, Long)].head()
    assert(audit === ((8L, 0L)))
    val swapped = Knn.reassignmentAudit(grown, "embedding", standing,
      standing.reverse).as[(Long, Long)].head()
    assert(swapped === ((8L, 8L)))
  }

  test("kmeansAssign: serve-time cells match a brute integer argmin, ties to smaller cid") {
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.0f, 0.1f)),
      (4L, Array(5.0f, 5.0f)), (5L, Array(5.1f, 5.0f)), (6L, Array(5.0f, 5.1f)),
      (7L, Array(2.5f, 2.5f))  // exactly equidistant from symmetric centroids
    ).toDF("vec_id", "embedding")
    val cents: Seq[Seq[Long]] =
      Seq(Seq(0L, 0L), Seq(5000000L, 5000000L), Seq(0L, 0L)) // cid 2 duplicates cid 0
    val got = Knn.kmeansAssign(pts, "embedding", cents)
      .select($"vec_id", $"_cell").as[(Long, Int)].collect().toMap
    def d2(v: Seq[Long], c: Seq[Long]) =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    val brute = Seq(1L -> Seq(0L, 0L), 2L -> Seq(100000L, 0L), 3L -> Seq(0L, 100000L),
      4L -> Seq(5000000L, 5000000L), 5L -> Seq(5100000L, 5000000L),
      6L -> Seq(5000000L, 5100000L), 7L -> Seq(2500000L, 2500000L))
      .map { case (id, qv) =>
        id -> cents.zipWithIndex.minBy { case (c, cid) => (d2(qv, c), cid) }._2
      }.toMap
    assert(got === brute)
    assert(got(7L) === 0)   // tie (cid 0 vs 1 equidistant) → smaller cid
    assert(!got.values.exists(_ == 2)) // duplicate centroid never wins a tie
    // serve-time assignment of the trainer's OWN final update reproduces
    // the fit trajectory: assigning under fit centroids and re-running
    // one more update step changes nothing once converged
    val fit = Knn.kmeansFit(pts, "embedding", "vec_id", k = 2, iterations = 4)
      .orderBy("cell").as[(Int, Long, Seq[Long])].collect()
    val served = Knn.kmeansAssign(pts, "embedding", fit.map(_._3).toSeq)
      .groupBy("_cell").count().orderBy("_cell")
      .as[(Int, Long)].collect().toMap
    fit.foreach { case (cell, n, _) => assert(served.getOrElse(cell, 0L) === n) }
  }

  test("knn topK matches brute force on real embeddings") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val probe = e.filter($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    val got = Knn.topK(e, "embedding", "vec_id", probe, 5, "cosine")
      .select("vec_id").as[Long].collect().toSeq
    // brute force via collect
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val exp = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), cos(r.getSeq[Float](1), probe.toSeq)))
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    assert(got === exp)
  }

  test("lsh knn finds the planted nearly-identical vector") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val probe = e.filter($"vec_id" === 11).select("embedding").head().getSeq[Float](0).toArray
    val got = Knn.lshBucketed(e, "embedding", "vec_id", probe, 3, dim = 64)
      .select("vec_id").as[Long].collect()
    assert(got.contains(11L), "the probe's own vector must be retrieved")
  }

  test("knnJoin returns k neighbors per query") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val queries = e.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val nn = Knn.knnJoin(queries, "q_id", "q_vec", e, "vec_id", "embedding", 4)
    val counts = nn.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 4))
    // self is always the nearest neighbor at rank 1
    val rank1 = nn.filter($"rn" === 1).select("q_id", "vec_id").as[(Long, Long)].collect()
    rank1.foreach { case (q, v) => assert(q == v) }
  }

  test("embedding near-dup exact vs lsh variants agree on high threshold") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(120)
    val exact = Dedup.embeddingNearDupsExact(e, "embedding", "vec_id", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(e, "embedding", "vec_id", 64, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "lsh candidates that verify must be true pairs")
  }

  test("registered LSH embedding near-dup ≡ exact O(n²) cross-check, pairs planted") {
    // q_embedding_neardup's oracle is the exact all-pairs SQL, so the LSH
    // variant must EQUAL the exact variant — not just under-approximate it.
    // The natural corpus has no pairs ≥ 0.9; plant noisy copies (cosine
    // ≈ 0.999, the near-duplicate class LSH exists for) and a byte-identical
    // copy (the collapseExact star path), then require set equality under
    // the registered parameters (bands = 16, bitsPerBand = 12).
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val originals = e.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().take(12)
    val planted = originals.take(10).map { case (id, v) =>
      (id + 1000000L, v.zipWithIndex.map { case (x, i) =>
        x + (if (i % 7 == 0) 0.003f else -0.002f) })
    } ++ originals.slice(10, 12).map { case (id, v) => (id + 2000000L, v) }
    val corpus = e.select($"vec_id", $"embedding")
      .unionByName(planted.toSeq.toDF("vec_id", "embedding"))
    val exact = Dedup.embeddingNearDupsExact(corpus, "embedding", "vec_id", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(corpus, "embedding", "vec_id",
        dim = 64, threshold = 0.9, bands = 16, bitsPerBand = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 12, s"planting failed: only ${exact.size} true pairs")
    assert(lsh === exact, "registered LSH variant must match the exact oracle")
  }

  test("semdedup: planted near-dups pair within their cell, cross-cell pairs are skipped by design") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val seeds = e.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding")
    // plant a noisy copy of vec 20 (cosine ≈ 0.999): it must land in the
    // same cell as its original and the pair must surface
    val original = e.filter($"vec_id" === 20)
      .select($"embedding").as[Seq[Float]].head()
    val noisy = original.zipWithIndex.map { case (x, i) =>
      x + (if (i % 5 == 0) 0.002f else -0.001f) }
    val corpus = e.select($"vec_id", $"embedding")
      .unionByName(Seq((900000L, noisy)).toDF("vec_id", "embedding"))
    val pairs = Dedup.semanticNearDups(corpus, "embedding", "vec_id",
        seeds, "cid", "embedding", threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((20L, 900000L)), s"planted pair missing from $pairs")
    // within-cell completeness: every within-cell exact pair ≥ τ must be
    // emitted (the operator's recall loss is ONLY cross-cell, per the
    // SemDeDup contract) — check against brute force restricted to cells
    val asgnRows = corpus.join(broadcast(
        seeds.select($"cid".as("_cid"), $"embedding".as("_cvec"))))
      .groupBy($"vec_id")
      .agg(max_by($"_cid",
          struct(round(graft.functions.GraftFunctions.cosine_sim(
            $"embedding", $"_cvec"), 6), -$"_cid")).as("cell"),
        first($"embedding").as("v"))
      .as[(Long, Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (d, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), (x, y)) => (d + x * y, na + x * x, nb + y * y) }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      (ai, ac, av) <- asgnRows; (bi, bc, bv) <- asgnRows
      if ai < bi && ac == bc && cos(av, bv) >= 0.9 + 1e-9
    } yield (ai, bi)).toSet
    assert(brute.subsetOf(pairs),
      s"within-cell pairs missed: ${brute.diff(pairs)}")
  }

  test("semdedup on a kernel-assigned corpus: ivfAssign cells + shared pair stage ≡ within-cell brute force") {
    // the 100 TB form: cells come from the shuffle-free nearest_centroid
    // kernel (assign-at-ingest), semanticNearDupsAssigned only runs the
    // per-cell pair join — vectors shuffle exactly once, by cell
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val sample = e.orderBy("vec_id").limit(128)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = Knn.trainCentroids(sample, nCells = 8)
    val assigned = Knn.ivfAssign(e, "embedding", centroids).cache()
    val pairs = Dedup.semanticNearDupsAssigned(assigned, "embedding", "vec_id",
        "_cell", threshold = 0.35)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val rows = assigned.select($"vec_id", $"_cell", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (d, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), (x, y)) => (d + x * y, na + x * x, nb + y * y) }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      (ai, ac, av) <- rows; (bi, bc, bv) <- rows
      if ai < bi && ac == bc &&
        BigDecimal(cos(av, bv)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.35
    } yield (ai, bi)).toSet
    assert(pairs === brute)
    assert(pairs.nonEmpty, "threshold chosen to yield pairs on this corpus")
    // triangle sub-blocking (the mega-cell parallelism path) must emit the
    // IDENTICAL pair set — each pair survives in exactly one
    // (cell, blockLo, blockHi) shuffle key, no dedup pass
    val blocked = Dedup.semanticNearDupsAssigned(assigned, "embedding", "vec_id",
        "_cell", threshold = 0.35, subBlocks = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(blocked.length === blocked.distinct.length,
      "sub-blocked plan emitted a duplicate pair")
    assert(blocked.toSet === pairs)
    assigned.unpersist()
  }

  test("int8 quantization: codes bounded, reconstruction within amax/254, dot exact, zero-vector safe") {
    import graft.ops.Quantize
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(-0.003f, 0.001f, 0.002f, -0.0015f)),   // tiny dynamic range
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))               // all-zero guard
    ).toDF("vec_id", "embedding")
    val got = vecs.select($"vec_id", Quantize.int8($"embedding").as("q"),
        Quantize.int8Scale($"embedding").as("s"))
      .as[(Long, Seq[Int], Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 === Seq(64, -127, 32, 0))       // 0.5·127 = 63.5 → half-away 64
    assert(got(3L)._1 === Seq(0, 0, 0, 0), "zero vector must not produce NaN codes")
    for ((id, (q, s)) <- got; c <- q) assert(math.abs(c) <= 127, s"$id code $c")
    // reconstruction: |q·s − x| ≤ s/2 = amax/254
    val orig = vecs.as[(Long, Seq[Float])].collect().toMap
    for ((id, (q, s)) <- got if id != 3L; (c, x) <- q.zip(orig(id)))
      assert(math.abs(c * s - x) <= s / 2 + 1e-12, s"vec $id elem $x")
    // integer dot is exact: compare against BigInt arithmetic on the codes
    val dot = vecs.filter($"vec_id" === 1L).select(Quantize.int8($"embedding").as("a"))
      .crossJoin(vecs.filter($"vec_id" === 2L).select(Quantize.int8($"embedding").as("b")))
      .select(Quantize.dotInt($"a", $"b")).as[Long].head()
    val expected = got(1L)._1.zip(got(2L)._1).map { case (x, y) => x.toLong * y }.sum
    assert(dot === expected)
  }

  test("sign-bit packing and Hamming top-k: hand bits, distances, tie order") {
    import graft.ops.Quantize
    // dim 8 → one word; alternating signs pack to 0b01010101 = 85
    val alt = (0 until 8).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    val one = Seq((1L, alt)).toDF("vec_id", "embedding")
    assert(Quantize.signPack(one, "embedding", 8)
      .select($"bits").as[Seq[Long]].head() === Seq(85L))
    // dim 64 → two words; all-positive fills both 32-bit words; -0.0f and
    // 0.0f both count as non-negative (>= 0)
    val allPos = Seq((1L, Seq.fill(32)(0.0f) ++ Seq.fill(32)(-0.0f)))
      .toDF("vec_id", "embedding")
    assert(Quantize.signPack(allPos, "embedding", 64)
      .select($"bits").as[Seq[Long]].head()
      === Seq(4294967295L, 4294967295L))
    // Hamming top-k: probe = all-positive; corpus distances 0, 1, 2, 2 —
    // the distance-2 tie breaks by vec_id ascending
    def vec(negIdx: Set[Int]): Seq[Float] =
      (0 until 64).map(i => if (negIdx(i)) -1.0f else 1.0f)
    val corpus = Seq(
      (10L, vec(Set())),          // d=0
      (11L, vec(Set(5))),         // d=1
      (13L, vec(Set(2, 40))),     // d=2 (tie, higher id)
      (12L, vec(Set(0, 63))),     // d=2 (tie, lower id)
      (14L, vec((0 until 10).toSet))) // d=10
    .toDF("vec_id", "embedding")
    val probe = Seq((99L, vec(Set()))).toDF("vec_id", "embedding")
    val got = Quantize.hammingTopK(corpus, "embedding", "vec_id",
        probe, "vec_id", k = 4, dim = 64)
      .orderBy($"rank").as[(Long, Long, Int, Int)].collect().toSeq
    assert(got === Seq((99L, 10L, 0, 1), (99L, 11L, 1, 2),
      (99L, 12L, 2, 3), (99L, 13L, 2, 4)))
  }

  test("ANN recall eval: exhaustive-probe IVF scores perfect recall; partial probe bounded") {
    // retrievalEval measuring the ANN stack against brute-force truth —
    // the standard index-quality loop. With nProbe = nCells the IVF scan
    // IS exhaustive and shares topK's (score DESC, id) order, so every
    // metric must be exactly 1.0; a partial probe stays a valid bounded
    // result list.
    import graft.ops.{Knn, Retrieval}
    val W = org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding")
    val sample = emb.select("embedding").limit(256).collect()
      .map(_.getSeq[Float](0).toArray)
    val cents = Knn.trainCentroids(sample, nCells = 8)
    val assigned = Knn.ivfAssign(emb, "embedding", cents).localCheckpoint(true)
    val probes = emb.filter($"vec_id".isin(3L, 7L, 11L)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def resultsFor(nProbe: Int) = probes.map { case (qid, v) =>
      Knn.ivfSearch(assigned, "embedding", "vec_id", cents, v,
          k = 10, nProbe = nProbe)
        .select(lit(qid).as("q_id"), $"vec_id", $"score")
        .withColumn("rank", row_number().over(
          W.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")))
        .select($"q_id", $"vec_id", $"rank")
    }.reduce(_ unionByName _)
    val truth = probes.map { case (qid, v) =>
      Knn.topK(emb, "embedding", "vec_id", v, k = 10, "cosine")
        .select(lit(qid).as("q_id"), $"vec_id", lit(1).as("rel"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val full = Retrieval.retrievalEval(resultsFor(8), truth,
        "q_id", "vec_id", "rank", "rel", k = 10)
      .filter($"q_id" === -1L)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(full === ((-1L, 3L, 30L, 1.0, 1.0, 1.0, 1.0)))
    val part = Retrieval.retrievalEval(resultsFor(2), truth,
        "q_id", "vec_id", "rank", "rel", k = 10)
      .filter($"q_id" === -1L)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(part._4 <= 1.0 && part._4 >= 0.0 && part._2 === 3L)
    assigned.unpersist()
  }

  test("approx_count_distinct is within HLL tolerance of exact") {
    val li = graft.Tables.lineitem(spark, TestSpark.sf)
    val row = li.agg(
      approx_count_distinct($"l_partkey").as("approx"),
      countDistinct($"l_partkey").as("exact")).head()
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    // Spark's default HLL++ rsd is 0.05; 3σ bound with margin
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.15, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("lsh knn recall on planted near-duplicate neighbors") {
    // the synthetic embeddings are mutually near-orthogonal (zero pairs with
    // cosine ≥ 0.8 at any sf), so recall@k of moderate-similarity neighbors
    // is NOT what hyperplane LSH promises — near-duplicate retrieval is.
    // Plant noisy copies (cosine ≈ 0.999) and require they are retrieved.
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val originals = e.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().take(10)
    val planted = originals.map { case (id, v) =>
      (id + 1000000L, v.zipWithIndex.map { case (x, i) =>
        x + (if (i % 7 == 0) 0.003f else -0.002f) }, "planted")
    }.toSeq.toDF("vec_id", "embedding", "label")
    val corpus = e.select($"vec_id", $"embedding", lit("orig").as("label"))
      .unionByName(planted)
    val hits = originals.count { case (id, v) =>
      Knn.lshBucketed(corpus, "embedding", "vec_id", v.toArray, 3, dim = 64)
        .select("vec_id").as[Long].collect().toSet.contains(id + 1000000L)
    }
    assert(hits >= 8, s"planted near-dup recall: $hits/10")
  }

  test("cluster labels: chains collapse to component min, dedupByPairs keeps reps") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; 99 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterLabels(pairs).as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 99L))
  }

  test("end-to-end near-dup corpus dedup: minhash pairs → clusters → keepers") {
    val kept = Dedup.dedupByPairs(corpus, "doc_id",
        Dedup.minhashNearDups(corpus, "text", "doc_id",
          threshold = 0.5, shingleN = 3, numHashes = 64, bands = 32))
      .select("doc_id").as[Long].collect().toSet
    // 1,2,5 are exact dups and 3 is a near dup of 1 → one representative (1);
    // 4 is unrelated and survives
    assert(kept === Set(1L, 4L))
  }

  test("ivf: probe-cell scan finds the exact neighbors, scans a corpus fraction") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val sample = e.select("embedding").limit(256).collect().map(_.getSeq[Float](0).toArray)
    val centroids = Knn.trainCentroids(sample, nCells = 8, iterations = 5)
    assert(centroids.length === 8)
    val assigned = Knn.ivfAssign(e, "embedding", centroids).cache()
    // every row lands in a valid cell
    val cells = assigned.select("_cell").as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
    val probe = e.filter($"vec_id" === 5).select("embedding").head().getSeq[Float](0).toArray
    // nProbe = nCells → identical to exact search
    val full = Knn.ivfSearch(assigned, "embedding", "vec_id", centroids, probe, 5, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Knn.topK(e, "embedding", "vec_id", probe, 5, "cosine")
      .select("vec_id").as[Long].collect().toSeq
    assert(full === exact)
    // nProbe = 2 → must at least find the probe's own vector, scanning less
    val narrow = Knn.ivfSearch(assigned, "embedding", "vec_id", centroids, probe, 5, nProbe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(narrow.contains(5L))
    assigned.unpersist()
  }

  test("filtered ivf probe: pre-filter = exact filtered top-k; post-filter demonstrably under-returns") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val sample = e.select("embedding").limit(256).collect().map(_.getSeq[Float](0).toArray)
    val centroids = Knn.trainCentroids(sample, nCells = 8, iterations = 5)
    val assigned = Knn.ivfAssign(e, "embedding", centroids).cache()
    val probe = e.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val lbl = e.filter($"vec_id" === 0).select("label").head().getInt(0)
    val k = 5
    // exhaustive probe (nProbe = nCells) with the pre-filter ≡ brute-force
    // top-k over the filtered corpus — the preserved contract
    val pre = Knn.ivfSearchFiltered(assigned, "embedding", "vec_id",
        centroids, probe, k, nProbe = 8, predicate = $"label" === lbl)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Knn.topK(e.filter($"label" === lbl), "embedding", "vec_id",
        probe, k, "cosine")
      .select("vec_id").as[Long].collect().toSeq
    assert(pre === brute)
    assert(pre.length === k)
    // the naive post-filter: unfiltered top-k, THEN drop non-matching rows —
    // non-matching rows occupied shortlist slots, so it returns fewer than
    // k matches (labels are spread, so the global top-5 is never all-lbl)
    val post = Knn.ivfSearch(assigned, "embedding", "vec_id", centroids,
        probe, k, nProbe = 8)
      .filter($"label" === lbl)
      .select("vec_id").as[Long].collect().toSeq
    assert(post.length < k,
      s"post-filter returned $post — expected recall loss vs pre-filter $pre")
    // and everything the post-filter did find, the pre-filter also has
    assert(post.toSet.subsetOf(pre.toSet))
    assigned.unpersist()
  }

  test("salted join and salted count match their unsalted equivalents on skewed data") {
    // planted skew: one hot key with 2000 rows, 50 cold keys
    val big = spark.range(0, 2050).select(
      when($"id" < 2000, lit(7L)).otherwise($"id" - 1949).as("k"),
      ($"id" * 3).as("payload"))
    val small = Seq((7L, "hot"), (13L, "cold"), (51L, "cold2")).toDF("k", "tag")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.select(sum($"payload")).head().getLong(0) ===
      plain.select(sum($"payload")).head().getLong(0))
    val counts = Skew.saltedCount(big, "k", salt = 8)
      .as[(Long, Long)].collect().toMap
    assert(counts(7L) === 2000L)
    assert(counts(51L) === 1L)
  }

  test("salting spreads BYTE-IDENTICAL hot rows, the degenerate skew case") {
    // one default record repeated 4000× — a content-only salt would give
    // every copy the same salt and keep the hot key on a single reducer
    val big = spark.range(0, 4000).select(lit(7L).as("k"), lit("default").as("payload"))
    val small = Seq((7L, "hot")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() === 4000L)
    val counts = Skew.saltedCount(big, "k", salt = 8).as[(Long, Long)].collect().toMap
    assert(counts(7L) === 4000L)
    // observe the spread directly with the same salt construction
    val spread = big.select(
        pmod(monotonically_increasing_id(), lit(8L)).as("s"))
      .select(countDistinct($"s")).head().getLong(0)
    assert(spread >= 6, s"identical rows spread over only $spread of 8 salts")
  }

  test("stratified sample: deterministic under a seed, proportions within tolerance") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val fractions = Map("en" -> 0.5, "de" -> 0.2)
    val s1 = docs.stat.sampleBy("lang", fractions, 42L).select("doc_id").as[Long].collect().toSet
    val s2 = docs.stat.sampleBy("lang", fractions, 42L).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "same seed must reproduce the same sample")
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, frac) <- fractions if perLang.getOrElse(lang, 0L) >= 20) {
      val got = sampled.getOrElse(lang, 0L).toDouble / perLang(lang)
      assert(math.abs(got - frac) < 0.25, s"$lang: sampled fraction $got vs $frac")
    }
    assert(!sampled.keySet.exists(l => !fractions.contains(l)),
      "languages with no fraction must not be sampled")
  }

  test("decontamination: planted eval overlap is flagged, clean docs survive") {
    val test = Seq(
      (900L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      // contains the holdout's "alpha beta gamma delta epsilon" 5-gram
      (1L, "intro words alpha beta gamma delta epsilon outro"),
      // same words, different order — no shared 5-gram
      (2L, "epsilon delta gamma beta alpha zeta other words here"),
      // completely disjoint vocabulary
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val hits = Dedup.contamination(train, test, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet === Set(1L), s"only doc 1 shares a 5-gram: $hits")
    assert(hits(1L) === 1L,
      "doc 1 shares exactly one 5-gram (alpha beta gamma delta epsilon); its " +
        "other windows shift past the holdout's two shingles")
    val clean = Dedup.decontaminate(train, test, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L, 3L))
  }

  test("fuzzy decontamination: near-verbatim leak caught, tangential overlap passes") {
    val base = (1 to 12).map("w" + _)
    val test = Seq((900L, base.mkString(" "))).toDF("doc_id", "text")
    val train = Seq(
      // verbatim copy → jaccard 1.0
      (1L, base.mkString(" ")),
      // one token swapped mid-sequence: breaks 3 of 10 3-shingles, j = 7/13 ≈ 0.54
      (2L, base.updated(5, "EDIT").mkString(" ")),
      // shares a 5-token run only: tangential quote, j = 3/15 = 0.2
      (3L, ((1 to 5).map("w" + _) ++ (1 to 5).map("q" + _)).mkString(" ")),
      // disjoint
      (4L, (1 to 10).map("z" + _).mkString(" "))).toDF("doc_id", "text")
    val hits = Dedup.contaminationFuzzy(train, test, "text", "doc_id",
      threshold = 0.5).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(hits.keySet === Set(1L, 2L), s"got $hits")
    assert(hits(1L)._3 === 1.0)
    assert(math.abs(hits(2L)._3 - 7.0 / 13.0) < 1e-6)
    val clean = Dedup.decontaminateFuzzy(train, test, "text", "doc_id",
      threshold = 0.5).select("doc_id").as[Long].collect().toSet
    assert(clean === Set(3L, 4L))
    // the holdout side broadcasts — the train side must not shuffle-join it
    val plan = Dedup.contaminationFuzzy(train, test, "text", "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom decontamination: no false negatives vs exact, clean docs survive") {
    val base = (1 to 20).map("w" + _)
    val test = Seq((1L, base.mkString(" "))).toDF("doc_id", "text")
    val train = Seq(
      (100L, base.take(8).mkString(" ") + " " + (1 to 5).map("u" + _).mkString(" ")),
      (101L, (1 to 12).map("z" + _).mkString(" ")),
      (102L, base.mkString(" "))).toDF("doc_id", "text")
    val exact = Dedup.contamination(train, test, "text", "doc_id", 5, 1)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.contaminationBloom(train, test, "text", "doc_id", 5, 1)
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet === Set(100L, 102L))
    // every exact hit flagged, with at least the exact gram count
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n, s"doc $id: $bloom vs $exact") }
    // the clean doc survives decontamination (fpp 1e-6 on 3 grams)
    val clean = Dedup.decontaminateBloom(train, test, "text", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(101L))
    // deterministic across repartitionings
    val b2 = Dedup.contaminationBloom(train.repartition(5), test, "text",
      "doc_id", 5, 1).as[(Long, Long)].collect().toMap
    assert(b2 === bloom)
  }

  test("segment dedup: first occurrence survives, docs reassemble, full dups vanish") {
    val segA = (1 to 4).map("a" + _).mkString(" ")   // 4-token segments, S=4
    val segB = (1 to 4).map("b" + _).mkString(" ")
    val segC = (1 to 4).map("c" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$segA $segB"),        // both segments novel → intact
      (2L, s"$segA $segC"),        // seg 0 seen in doc 1 → keeps only segC
      (3L, s"$segA $segB"),        // exact copy of doc 1 → vanishes
      (4L, s"$segC $segC x1 x2"),  // segC seen (doc 2); partial tail segment novel
      (5L, "   ")                  // whitespace-only → no segments → vanishes
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, "text", "doc_id", segTokens = 4)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L) === ((1L, s"$segA $segB", 2L, 2L)))
    assert(out(2L) === ((2L, segC, 1L, 2L)))
    // doc 4: segC dropped (first seen in doc 2), its own repeat dropped
    // (within-doc dup), the 2-token tail survives
    assert(out(4L) === ((4L, "x1 x2", 1L, 3L)))
    // the dedup exchange must carry hashes/keys, not segment bodies: no
    // Exchange input may include the passage (or token-array) column —
    // only the doc-grain join of the original `text` bodies ships text
    val plan = Dedup.dedupSegments(docs, "text", "doc_id", 4)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchangeInputs = "\\(\\d+\\) Exchange\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, plan.take(2000))
    val bodies = exchangeInputs.filter(in =>
      in.contains("passage") || in.contains("_tk"))
    assert(bodies.isEmpty, s"segment bodies crossed an exchange: $bodies")
  }

  test("hard negatives: same-label excluded, nearest different-label ranks first") {
    // label-0 cluster near (1,0); label-1 vectors at known cosines to it
    val corpus = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.9f, 0.1f), 0),   // same label, cos ≈ 0.994 — must NOT appear
      (2L, Array(0.6f, 0.8f), 1),   // cos 0.6
      (3L, Array(0f, 1f), 1),       // cos 0.0
      (4L, Array(0.8f, 0.6f), 1)    // cos 0.8 — the hardest negative
    ).toDF("vec_id", "embedding", "label")
    val qs = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"label")
    val out = Knn.hardNegatives(qs, "q_id", "q_vec", "label",
        corpus, "vec_id", "embedding", "label", 2)
      .select("q_id", "vec_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(out === Set((0L, 4L, 1), (0L, 2L, 2)))
  }

  test("stratifiedKFold: exact per-stratum balance, repartition-invariant, tiny strata") {
    // uneven strata, sizes not multiples of k, plus a stratum smaller than k
    val rows = (1 to 503).map(i => (i.toLong, "s" + (i % 3))) ++
      (1000L to 1001L).map(i => (i, "tiny"))
    val df = rows.toDF("id", "g")
    val got = Mixing.stratifiedKFold(df, "id", "g", k = 5)
    val sizes = got.groupBy(col("g"), col("fold")).count()
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    for ((g, ss) <- sizes)
      assert(ss.max - ss.min <= 1, s"stratum $g folds ${ss.toSeq}")
    // every row assigned exactly once, folds in range
    val all = got.as[(Long, String, Int)].collect()
    assert(all.length === rows.size)
    assert(all.forall(r => r._3 >= 0 && r._3 < 5))
    // a 2-row stratum lands in 2 distinct folds (balance at n < k)
    assert(all.filter(_._2 == "tiny").map(_._3).distinct.length === 2)
    // deterministic and partitioning-independent
    val again = Mixing.stratifiedKFold(df.repartition(7), "id", "g", 5)
      .as[(Long, String, Int)].collect().toSet
    assert(again === all.toSet)
    // few buckets (forced collisions) still balance exactly
    val small = Mixing.stratifiedKFold(df, "id", "g", 5, buckets = 4)
      .groupBy(col("g"), col("fold")).count()
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    for ((g, ss) <- small) assert(ss.max - ss.min <= 1, s"buckets=4 $g")
    // null id / stratum excluded
    val withNull = Seq((Some(1L), Some("a")), (None, Some("a")),
      (Some(2L), None)).toDF("id", "g")
    assert(Mixing.stratifiedKFold(withNull, "id", "g", 5).count() === 1)
  }

  test("sample k per group: exact k, window-equivalent, prefix-stable, repartition-invariant") {
    val docs = graft.Tables.documents(spark, TestSpark.sf).select("lang", "doc_id")
    val s5 = Mixing.sampleKPerGroup(docs, "lang", "doc_id", 5)
    val got = s5.as[(String, Long, Int)].collect().toSet
    s5.groupBy("lang").count().as[(String, Long)].collect()
      .foreach { case (l, c) => assert(c === 5, s"lang $l") }
    // ≡ the window formulation on the same ranking key (the shape the op
    // deliberately avoids at scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang")
      .orderBy(graft.functions.GraftFunctions.fnv64(
        concat(lit("s0:"), $"doc_id".cast("string"))).cast("double").asc,
        $"doc_id")
    val exp = docs.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"lang", $"doc_id", $"rn".cast("int"))
      .as[(String, Long, Int)].collect().toSet
    assert(got === exp)
    // dealt-from-the-top: k=8's first five rows ARE the k=5 sample
    val s8 = Mixing.sampleKPerGroup(docs, "lang", "doc_id", 8)
      .filter($"rn" <= 5).as[(String, Long, Int)].collect().toSet
    assert(s8 === got)
    val sp = Mixing.sampleKPerGroup(docs.repartition(7), "lang", "doc_id", 5)
      .as[(String, Long, Int)].collect().toSet
    assert(sp === got)
    // a group smaller than k returns whole
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("lang", "doc_id")
    assert(Mixing.sampleKPerGroup(tiny, "lang", "doc_id", 5).count() === 3)
  }

  test("exactDedupBy keeps the best-scoring copy, not the first") {
    val docs = Seq(
      (1L, "x y"), (2L, "x  y"), (3L, "x   y"),  // same normalized content
      (4L, "unique")).toDF("doc_id", "text")
    // longest raw text wins: doc 3 has the most whitespace
    val best = Dedup.exactDedupBy(docs, "text", "doc_id", length(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(best === Set(3L, 4L))
    // min-id semantics for comparison: exactDedup keeps doc 1
    val first = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(first === Set(1L, 4L))
  }

  test("matryoshka top-k ranks by prefix cosine only") {
    // prefix (2 dims) ranking disagrees with full ranking by construction:
    // vec 2 matches the query prefix exactly but diverges in the tail
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 10f)),   // identical to query
      (2L, Array(1f, 0f, 0f, -10f)),  // same prefix, opposite tail
      (3L, Array(0f, 1f, 5f, 50f))    // orthogonal prefix, aligned tail
    ).toDF("vec_id", "embedding")
    val q = Array(1f, 0f, 0f, 10f)
    val got = Quantize.matryoshkaTopK(corpus, "embedding", "vec_id", q,
        k = 3, dims = 2)
      .select("vec_id").as[Long].collect().toSeq
    // prefix cosines: v1 = v2 = 1 (tie → id order), v3 = 0
    assert(got === Seq(1L, 2L, 3L))
    // full-dimension ranking disagrees: v3 ≈ 0.99 beats v2 ≈ −0.98
    val full = Knn.topK(corpus, "embedding", "vec_id", q, 3, "cosine")
      .select("vec_id").as[Long].collect().toSeq
    assert(full === Seq(1L, 3L, 2L))
  }

  test("segment dedup equals a naive reference on random corpora (seeded)") {
    val vocab = Array("a", "b", "c")
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val segTok = 1 + rnd.nextInt(3)
      val docs = (1L to 12L).map(i =>
        i -> Array.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))))
      val segs = docs.flatMap { case (id, toks) =>
        toks.grouped(segTok).zipWithIndex
          .map { case (seg, idx) => (id, idx, seg.mkString(" ")) } }
      val firsts = segs.groupBy(_._3)
        .map { case (g, occ) => g -> occ.map(o => (o._1, o._2)).min }
      val kept = segs.filter(s => firsts(s._3) == ((s._1, s._2)))
      val expect = kept.groupBy(_._1).map { case (id, ks) =>
        val sorted = ks.sortBy(_._2)
        (id, sorted.map(_._3).mkString(" "), sorted.length.toLong,
          segs.count(_._1 == id).toLong)
      }.toSet
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.dedupSegments(df, "text", "doc_id", segTok)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === expect, s"trial=$trial segTokens=$segTok")
    }
  }

  test("cluster-safe split: near-dup components share a side, singletons hash alone") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // component {1,2,3} (chained pairs), component {4,5}; 6 singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.splitByCluster(docs, "doc_id", pairs,
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .select("doc_id", "cluster_rep", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1L && out(2L)._2 === 1L && out(3L)._2 === 1L)
    assert(out(4L)._2 === 4L && out(5L)._2 === 4L)
    assert(out(6L)._2 === 6L)
    // the leakage guarantee: one split per component
    assert(Set(out(1L)._3, out(2L)._3, out(3L)._3).size === 1)
    assert(out(4L)._3 === out(5L)._3)
    // and the split agrees with hashing the rep directly
    val direct = graft.ops.Mixing.splitByHash(
        Seq(("1"), ("4"), ("6")).toDF("k"), "k",
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .as[(String, String)].collect().toMap
    assert(out(2L)._3 === direct("1") && out(5L)._3 === direct("4")
      && out(6L)._3 === direct("6"))
  }

  test("weighted sample: window-equivalent, weight-responsive, null/zero weights dropped") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), length(col("text")).cast("double").as("w"))
    val got = Mixing.weightedSampleK(docs, "doc_id", "w", k = 25)
      .as[(Long, Int)].collect().toSet
    // ≡ the window formulation over the same micro-key
    val two53 = 9007199254740992.0
    val u = (pmod(graft.functions.GraftFunctions.fnv64(
        concat(lit("w0:"), col("doc_id").cast("string"))),
      lit(9007199254740992L)).cast("double") + lit(0.5)) / lit(two53)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(round(log(u) / col("w") * lit(1e6)).cast("long").desc, col("doc_id"))
    val exp = docs.filter(col("w") > 0)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 25)
      .select(col("doc_id"), col("rn").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got === exp)
    // repartition-stable
    val g2 = Mixing.weightedSampleK(docs.repartition(9), "doc_id", "w", 25)
      .as[(Long, Int)].collect().toSet
    assert(g2 === got)
    // a giant weight dominates; zero/null weights never sampled
    val skew = Seq[(Long, java.lang.Double)](
        (1L, 1.0), (2L, 1e9), (3L, 0.0), (4L, null))
      .toDF("doc_id", "w")
    val s2 = Mixing.weightedSampleK(skew, "doc_id", "w", 2)
      .as[(Long, Int)].collect().sortBy(_._2).map(_._1)
    assert(s2.toSeq === Seq(2L, 1L)) // ln(u)/1e9 ≈ 0 beats ln(u)/1
  }

  test("deterministic shuffle: exhaustive cover, contiguous positions, repartition-stable") {
    val docs = graft.Tables.documents(spark, TestSpark.sf).select("doc_id")
    val n = docs.count()
    val s = Mixing.shuffleDeterministic(docs, "doc_id", nShards = 8)
    val rows = s.select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // every row exactly once, shards in range
    assert(rows.length === n)
    assert(rows.map(_._1).distinct.length === n)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // positions are contiguous 1..|shard| within each shard
    rows.groupBy(_._2).foreach { case (sh, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length), s"shard $sh") }
    // no shard hogs the corpus (hash balance: within 3x of fair share)
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.max < 3.0 * n / 8, s"skewed shards: $sizes")
    // identical permutation regardless of input partitioning
    val s2 = Mixing.shuffleDeterministic(docs.repartition(7), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(s2.toSet === rows.toSet)
  }

  test("hash split: exhaustive partition, rerun/repartition-stable, duplicates co-located") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text")
    val cuts = Seq("train" -> 8, "val" -> 1, "test" -> 1)
    val split = Mixing.splitByHash(docs, "text", cuts)
    val byId = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(byId.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(byId.size === docs.count(), "every row gets exactly one split")
    // stability: a repartitioned rerun assigns identically (no row-order
    // or seed sensitivity — the property a random split does NOT have)
    val again = Mixing.splitByHash(docs.repartition(13), "text", cuts)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === byId)
    // duplicate texts land in the same split by construction
    val planted = docs.limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .unionByName(docs)
    val splits = Mixing.splitByHash(planted, "text", cuts)
      .groupBy("text").agg(countDistinct(col("split")).as("ns"))
      .agg(max(col("ns"))).as[Long].head()
    assert(splits === 1L, "a text must never straddle splits")
    // rough proportion sanity (binomial, wide bound): train ≈ 80 %
    val trainFrac = byId.values.count(_ == "train").toDouble / byId.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // null keys get a NULL split — never silently dumped into the last cut
    val withNull = Seq((1L, "some text"), (2L, null))
      .toDF("doc_id", "text")
    val nullSplit = Mixing.splitByHash(withNull, "text", cuts)
      .filter($"doc_id" === 2L).select("split").collect()(0)
    assert(nullSplit.isNullAt(0), "null key must yield null split")
  }

  test("temperature mixing: tail domains upsample, mass hits the target, caps at 1") {
    val docs = (1 to 800).map(i => (i.toLong, "big")) ++
      (1 to 200).map(i => (i.toLong + 1000, "mid")) ++
      (1 to 8).map(i => (i.toLong + 2000, "tiny"))
    val df = docs.toDF("doc_id", "dom")
    val f = Mixing.temperatureFractions[String](df, "dom", alpha = 0.5, targetSize = 100)
    // flattening: the smaller the domain, the LARGER its sampling fraction
    assert(f("tiny") > f("mid") && f("mid") > f("big"), f.toString)
    // with no fraction capped, expected sample mass equals the target
    val expected = f("big") * 800 + f("mid") * 200 + f("tiny") * 8
    assert(f.values.forall(_ < 1.0) && math.abs(expected - 100) < 1e-6,
      s"uncapped fractions must hit the target exactly, got $expected via $f")
    // a tiny domain under a large target caps at 1 instead of oversampling
    val capped = Mixing.temperatureFractions[String](df, "dom", alpha = 0.5, targetSize = 1000)
    assert(capped("tiny") === 1.0, capped.toString)
    // α = 1 keeps natural proportions: every fraction = target / total
    val natural = Mixing.temperatureFractions[String](df, "dom", alpha = 1.0, targetSize = 504)
    assert(natural.values.forall(v => math.abs(v - 0.5) < 1e-9), natural.toString)
    // seeded mix is deterministic
    val m1 = Mixing.mixByTemperature[String](df, "dom", 0.5, 100).select("doc_id")
      .as[Long].collect().toSet
    val m2 = Mixing.mixByTemperature[String](df, "dom", 0.5, 100).select("doc_id")
      .as[Long].collect().toSet
    assert(m1 === m2)
  }

  test("epoch materialization: copy counts, fractional coin rates, determinism, no shuffle") {
    val docs = (1L to 1000L).map { i =>
      (i, Seq("en", "de", "zh", "es", "fr")(i.toInt % 5))
    }.toDF("doc_id", "dom")
    val eps = Map("en" -> 1.2, "de" -> 2.5, "zh" -> 0.4, "es" -> 0.0)
    val out = Mixing.materializeEpochs(docs, "dom", "doc_id", eps)
      .as[(Long, String, Int)].collect()
    val copies = out.groupBy(_._1).view.mapValues(_.length).toMap
    val domOf = docs.as[(Long, String)].collect().toMap
    // integer floors hold exactly; epoch indices are 1..copies
    assert(out.forall { case (id, _, e) => e >= 1 && e <= copies(id) })
    assert(copies.forall { case (id, n) => domOf(id) match {
      case "en" => n == 1 || n == 2
      case "de" => n == 2 || n == 3
      case "zh" => n == 1 // zh rows present only via the coin
      case _ => false     // es×0 and unspecified fr never appear
    }})
    // coin rates ≈ fractional parts (binomial over 200 docs/domain)
    def extraFrac(d: String, base: Int) = {
      val ids = domOf.collect { case (id, dd) if dd == d => id }
      ids.count(id => copies.getOrElse(id, 0) > base).toDouble / ids.size
    }
    assert(math.abs(extraFrac("en", 1) - 0.2) < 0.1)
    assert(math.abs(extraFrac("de", 2) - 0.5) < 0.12)
    assert(math.abs(extraFrac("zh", 0) - 0.4) < 0.12)
    // deterministic under repartition — same (id, epoch) multiset
    val again = Mixing.materializeEpochs(docs.repartition(11), "dom", "doc_id", eps)
      .as[(Long, String, Int)].collect()
    assert(again.sorted.toSeq === out.sorted.toSeq)
    // scale contract: pure map + generator — no exchange in the plan
    val plan = Mixing.materializeEpochs(docs, "dom", "doc_id", eps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sequence packing: next-fit bins match the hand-computed layout") {
    val docs = Seq((1L, 300), (2L, 300), (3L, 100), (4L, 500), (5L, 600), (6L, 10))
      .toDF("doc_id", "n_tok")
    val packed = Packing.packNextFit(docs, "doc_id", "n_tok", budget = 512,
      partitions = 1)
      .select($"doc_id", $"bin_id", $"oversized")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // next-fit in id order: [1], [2,3], [4], [5 oversized], [6]
    val binOf = packed.map(p => p._1 -> p._2).toMap
    assert(binOf(2L) === binOf(3L), "300+100 share a bin")
    assert(Set(binOf(1L), binOf(2L), binOf(4L), binOf(5L), binOf(6L)).size === 5,
      "five distinct bins")
    assert(packed.filter(_._3).map(_._1).toSeq === Seq(5L), "only the 600-token doc is oversized")
    // multi-partition contract: every doc packed once, no non-oversized bin
    // over budget, deterministic across runs
    val big = graft.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tok"))
    def run() = Packing.packNextFit(big, "doc_id", "n_tok", budget = 512, partitions = 4)
    val a = run().collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = run().collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a === b, "packing must be deterministic")
    assert(a.map(_._1).distinct.size === a.size, "every doc packed exactly once")
    val over = run().groupBy("bin_id").agg(sum($"n_tok").as("bt"))
      .filter($"bt" > 512).count()
    assert(over === 0, "no bin exceeds the budget (no oversized docs in this corpus)")
  }

  test("passage chunking: hand-computed windows, overlap coverage, empty-doc row") {
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")),  // 10 tokens
      (2L, "only three words"),
      (3L, "   ")                                          // whitespace-only
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkPassages(docs, "text", "doc_id", size = 4, stride = 3)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: starts 0,3,6,9 → windows of 4,4,4,1 tokens
    assert(got(1L) === Seq(
      (1L, 0, "t0 t1 t2 t3", 4), (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t6 t7 t8 t9", 4), (1L, 3, "t9", 1)))
    assert(got(2L) === Seq((2L, 0, "only three words", 3)))
    assert(got(3L) === Seq((3L, 0, "", 0)), "empty doc must yield one empty chunk")
    // overlap coverage: every token index is inside ≥ 1 window, and
    // consecutive windows share size − stride tokens
    val starts = got(1L).map(c => c._2 * 3)
    assert(starts.zip(starts.tail).forall { case (a, b) => b - a == 3 })
  }

  test("text analysis stats are sane on documents") {
    val d = graft.Tables.documents(spark, TestSpark.sf)
    val stats = TextAnalysis.documentStats(d, "text")
    val row = stats.filter($"doc_id" === 0).head()
    assert(row.getAs[Int]("token_count") > 0)
    assert(row.getAs[Double]("quality") >= 0.0 && row.getAs[Double]("quality") <= 1.0)
    val langAcc = stats.filter($"lang" === $"lang_pred").count().toDouble / stats.count()
    assert(langAcc > 0.3, s"language-id heuristic accuracy too low: $langAcc")
  }

  test("repetition signals: planted repetition scores as the hand-computed fractions") {
    val docs = Seq(
      // 13 × "spam": dup_word = 12/13 > 0.9, 12 bigrams all equal → flagged
      (1L, Seq.fill(13)("spam").mkString(" ")),
      // all-distinct 5 tokens: top_bigram = 1/4 = 0.25 EXCEEDS 0.18 but the
      // doc is below minTokens — the length gate must keep it clean (an
      // ungated threshold would flag every short document)
      (2L, "one two three four five"),
      // "a b a b a b": dup 4/6, top bigram [a b]×3 of 5 → 0.6; short → clean
      (3L, "a b a b a b"),
      (4L, "solo"),         // < 2 tokens → dropped
      (5L, ""),             // no tokens → dropped
      // 8 × "x y" = 16 tokens: top bigram [x y]×8 of 15 > 0.18 at n ≥ 12 →
      // flagged by the bigram rule alone (dup 14/16 = 0.875 < 0.9)
      (6L, Seq.fill(8)("x y").mkString(" ")),
      // 12 distinct tokens: top_bigram = 1/11 ≈ 0.09 < 0.18 → clean even
      // though the length gate is open
      (7L, (1 to 12).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select($"doc_id", $"dup_word_frac", $"top_bigram_frac", $"repetitive")
      .as[(Long, Double, Double, Boolean)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 6L, 7L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(math.abs(byId(1L)._2 - 12.0 / 13) < 1e-6 && byId(1L)._3 === 1.0 && byId(1L)._4)
    assert(byId(2L)._2 === 0.0 && byId(2L)._3 === 0.25 && !byId(2L)._4)
    assert(math.abs(byId(3L)._2 - 2.0 / 3) < 1e-6 && byId(3L)._3 === 0.6 && !byId(3L)._4)
    assert(byId(6L)._2 === 0.875 && math.abs(byId(6L)._3 - 8.0 / 15) < 1e-6 && byId(6L)._4)
    assert(!byId(7L)._4 && math.abs(byId(7L)._3 - 1.0 / 11) < 1e-6)
  }

  test("substring spans: planted verbatim run found maximal, offsets exact") {
    // doc 1 tokens[5..18] (14 tokens) verbatim inside doc 2 at [2..15];
    // doc 3 shares nothing long enough (an isolated 8-token window only)
    val shared = (1 to 14).map("s" + _)
    val d1 = ((1 to 5).map("a" + _) ++ shared ++ (1 to 4).map("z" + _)).mkString(" ")
    val d2 = ((1 to 2).map("b" + _) ++ shared ++ (1 to 6).map("y" + _)).mkString(" ")
    val d3 = ((1 to 8).map("s" + _) ++ (1 to 10).map("q" + _)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "text", "doc_id",
      k = 8, minSpanTokens = 12)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    // (1,2): maximal span of 14 tokens at a_start=5, b_start=2 — ONE row,
    // not the 7 individual shingle matches. (1,3)/(2,3): s1..s8 is only an
    // 8-token span < 12 → excluded by the floor.
    assert(spans === Set((1L, 2L, 5, 2, 14)))
    // lowering the floor to k surfaces the short (·,3) spans too
    val all = Dedup.substringSpans(docs, "text", "doc_id",
      k = 8, minSpanTokens = 8)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(all === Set((1L, 2L, 5, 2, 14), (1L, 3L, 5, 0, 8), (2L, 3L, 2, 0, 8)))
  }

  test("substring spans: within-doc repeats don't pair, postings cap drops template noise") {
    val rep = (1 to 8).map("r" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$rep x1 x2 $rep"),          // same shingle twice in ONE doc
      (2L, s"pad1 pad2 pad3 $rep tail")  // cross-doc match at two diagonals
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "text", "doc_id",
      k = 8, minSpanTokens = 8)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    // doc1 holds the run at offsets 0 and 10, doc2 at 3 → two spans, one
    // per diagonal; never a (1,1) self pair
    assert(spans === Set((1L, 2L, 0, 3, 8), (1L, 2L, 10, 3, 8)))
    // a postings cap of 2 still admits pairs; the 3-element bucket
    // (two doc-1 positions + one doc-2) is skipped entirely
    val capped = Dedup.substringSpans(docs, "text", "doc_id",
      k = 8, minSpanTokens = 8, maxPostings = 2)
      .as[(Long, Long, Int, Int, Int)].collect()
    assert(capped.isEmpty)
  }

  test("piiScrub: masks and counts each class; order handles ip-in-email-domain; idempotent") {
    val docs = Seq(
      (1L, "mail a.b@x.org and b%c@y.co.uk now"),
      (2L, "server 10.0.200.7 then 192.168.1.1 up"),
      (3L, "call +4915112345678 ok"),
      (4L, "weird a@10.2.3.4 case"),   // numeric mail domain: NOT an email
      (5L, "clean text only")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs, "text")
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones", $"text_scrubbed")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2, 0, 0, "mail <EMAIL> and <EMAIL> now")))
    assert(got(1) === ((2L, 0, 2, 0, "server <IP> then <IP> up")))
    assert(got(2) === ((3L, 0, 0, 1, "call <PHONE> ok")))
    // the email pattern requires an ALPHABETIC TLD, so an address with a
    // numeric domain is not an email — the embedded IP is masked instead
    assert(got(3) === ((4L, 0, 1, 0, "weird a@<IP> case")))
    assert(got(4) === ((5L, 0, 0, 0, "clean text only")))
    // idempotence: masks contain no digits/@, a second pass is a no-op
    val twice = TextAnalysis.piiScrub(
      got.toSeq.map(r => (r._1, r._5)).toDF("doc_id", "text"), "text")
      .select($"text_scrubbed").as[String].collect().sorted
    assert(twice.toSeq === got.map(_._5).sorted.toSeq)
  }

  test("stripMarkup: blocks vanish with contents, tags strip, entities decode in order") {
    val docs = Seq(
      (1L, "<html><body><h1>Title</h1><p>hello <b>bold</b> world</p></body></html>"),
      (2L, "before<script type=\"a\">var x = 1 < 2; alert('hi')</script>after"),
      (3L, "a<style>.c{color:red}</style>b"),
      (4L, "T &amp; Q says &lt;tag&gt; &quot;q&#39; &amp;lt;raw"),
      (5L, "multi  \t spaces\n\nand lines"),
      (6L, "no markup at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(docs, "text")
      .select($"doc_id", $"n_tags", $"text_plain")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 10, "Title hello bold world")))
    // script CONTENTS gone, not just the tags; the bare `<` merges into
    // one tag-shaped raw token (leftmost-greedy), so raw count is 2
    assert(got(1) === ((2L, 2, "before after")))
    assert(got(2) === ((3L, 2, "a b")))
    // &amp; decodes LAST: '&amp;lt;' yields literal '&lt;', not '<'
    assert(got(3) === ((4L, 0, "T & Q says <tag> \"q' &lt;raw")))
    assert(got(4) === ((5L, 0, "multi spaces and lines")))
    assert(got(5) === ((6L, 0, "no markup at all")))
  }

  test("cutSpans: doc_b loses exactly the covered tokens, doc_a untouched, overlaps union") {
    val shared = (1 to 14).map("s" + _)
    val d1 = ((1 to 5).map("a" + _) ++ shared ++ (1 to 4).map("z" + _)).mkString(" ")
    val d2 = ((1 to 2).map("b" + _) ++ shared ++ (1 to 6).map("y" + _)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "text", "doc_id", k = 8, minSpanTokens = 12)
    val cut = Dedup.cutSpans(docs, "text", "doc_id", spans)
      .as[(Long, Int, Int, String)].collect()
    // only doc 2 (the doc_b side) is affected; its 14 shared tokens vanish
    assert(cut.toSeq === Seq((2L, 22, 14,
      ((1 to 2).map("b" + _) ++ (1 to 6).map("y" + _)).mkString(" "))))
    // overlapping spans: hand-built overlapping intervals on one doc union
    // to a single covered range (positions 2..9 ∪ 5..12 → 2..12)
    val overlap = Seq((9L, 2L, 2, 2, 8), (9L, 2L, 5, 5, 8))
      .toDF("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    val toks = (0 to 14).map("t" + _).mkString(" ")
    val got = Dedup.cutSpans(Seq((2L, toks)).toDF("doc_id", "text"),
      "text", "doc_id", overlap).as[(Long, Int, Int, String)].collect()
    assert(got.toSeq === Seq((2L, 15, 11,
      Seq("t0", "t1", "t13", "t14").mkString(" "))))
  }

  test("substring spans equal a brute-force reference on dense random corpora") {
    // tiny vocab → coincidental shingle collisions everywhere: stresses
    // multi-diagonal coalescing, within-doc repeats, and run maximality
    val vocab = Array("p", "q", "r")
    def brute(docs: Seq[(Long, Array[String])], k: Int, minSpan: Int)
        : Set[(Long, Long, Int, Int, Int)] = {
      val out = scala.collection.mutable.Set[(Long, Long, Int, Int, Int)]()
      for {
        (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
        if ta.length >= k && tb.length >= k
      } {
        val matches = for {
          sa <- 0 to ta.length - k; sb <- 0 to tb.length - k
          if ta.slice(sa, sa + k).sameElements(tb.slice(sb, sb + k))
        } yield (sa, sb)
        matches.groupBy { case (sa, sb) => sa - sb }.values.foreach { diag =>
          val sas = diag.map(_._1).sorted
          var runStart = sas.head; var prev = sas.head
          def emit(last: Int): Unit = {
            val span = last - runStart + k
            if (span >= minSpan)
              out += ((ida, idb, runStart, runStart - (diag.head._1 - diag.head._2), span))
          }
          for (sa <- sas.tail) {
            if (sa != prev + 1) { emit(prev); runStart = sa }
            prev = sa
          }
          emit(prev)
        }
      }
      out.toSet
    }
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 8) {
      val docs = (1L to 12L).map(i =>
        i -> Array.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))))
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.substringSpans(df, "text", "doc_id",
        k = 3, minSpanTokens = 4, maxPostings = 1000000)
        .as[(Long, Long, Int, Int, Int)].collect().toSet
      assert(got === brute(docs, 3, 4), s"trial=$trial docs=$docs")
    }
  }

  test("substring spans: single exchange serves both the window and the span aggregation") {
    val docs = (1L to 20L).map(i => (i, s"w$i " + (1 to 10).map("c" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val plan = Dedup.substringSpans(docs, "text", "doc_id", k = 8, minSpanTokens = 8)
      .queryExecution.executedPlan.toString
    // exchanges: one for the postings groupBy(hash), one for the
    // (doc_a, doc_b, diag) window; the span groupBy's keys extend the
    // window partition so it must NOT add a third
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$plan")
  }

  private def bruteLevenshtein(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edit-distance join: full recall vs brute force on random domains") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 6; tau <- 1 to 2) {
      // short alphabet + short strings → dense near-miss space, including
      // strings below the τ+1 segment floor (the short-pool path)
      val strs = (1 to 60).map { _ =>
        val len = rnd.nextInt(9) // 0..8 — includes empty string
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val df = strs.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
        .toDF("id", "name")
      val expected = (for {
        a <- strs; b <- strs if a < b
        d = bruteLevenshtein(a, b) if d <= tau
      } yield (a, b, d)).toSet
      val got = Dedup.editDistancePairs(df, "name", tau)
        .select("name_a", "name_b", "dist")
        .as[(String, String, Int)].collect().toSet
      assert(got === expected, s"trial=$trial tau=$tau strs=$strs")
    }
  }

  test("edit-distance join: counts expand back to source-row multiplicities") {
    val df = Seq("cat", "cat", "cat", "bat", "hat", "hat", "dog")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    val got = Dedup.editDistancePairs(df, "name", tau = 1)
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(got === Set(("bat", "cat", 1, 1L, 3L), ("bat", "hat", 1, 1L, 2L),
      ("cat", "hat", 1, 3L, 2L)))
  }

  test("edit-distance join plans equi-join candidates, no cartesian on the long-string path") {
    val df = (1L to 50L).map(i => (i, s"partname-$i")).toDF("id", "name")
    val plan = Dedup.editDistancePairs(df, "name", tau = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
  test("bpe merges: the Sennrich low/lower/newest example, ties break lexicographically") {
    val df = Seq("low low low lower lower newest").toDF("text")
    val got = TextAnalysis.bpeMerges(df, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // step1: lo and ow tie at 5 -> 'l' < 'o' picks (l,o)
    // step2: (lo,w) at 5 beats we(3)/er(2)
    // step3: (low,e) and (e,r) tie at 2 -> 'e' < 'low' picks (e,r)
    assert(got === Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L)))
  }

  test("bpe merges: greedy within-word chaining merges adjacent repeats left-to-right") {
    // counting is OVERLAPPING (Sennrich's get_stats: 'aaaa' has 3 a-a
    // pairs × 3 words = 9) but the MERGE is greedy non-overlapping
    // left-to-right, so step 2's top pair is (aa,aa), never (a,aa)
    val df = Seq("aaaa aaaa aaaa").toDF("text")
    val got = TextAnalysis.bpeMerges(df, "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("bpe driver-local trainer ≡ distributed, merge-for-merge, on a real corpus") {
    // the production trainer (bpeMergesLocal: collected vocab artifact +
    // incremental pair counts + lazy-invalidation heap) must replay the
    // distributed trainer's exact trajectory — same pair, same count,
    // every step — including tie-breaks and overlap counting
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf)
      .select($"text")
    val dist = TextAnalysis.bpeMerges(docs, "text", nMerges = 12)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val local = TextAnalysis.bpeMergesLocal(docs, "text", nMerges = 12)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(local === dist)
    // the Sennrich cases hold for the local form too
    val ex = Seq("low low low lower lower newest").toDF("text")
    assert(TextAnalysis.bpeMergesLocal(ex, "text", nMerges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      === Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L)))
    val rep = Seq("aaaa aaaa aaaa").toDF("text")
    assert(TextAnalysis.bpeMergesLocal(rep, "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
      === Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
    // exhaustion: a fully-merged corpus stops early instead of looping
    val tiny = Seq("ab ab").toDF("text")
    assert(TextAnalysis.bpeMergesLocal(tiny, "text", nMerges = 10)
      .count() === 1L)
  }

  test("incremental SNM: exactly the merged-corpus delta-touching pairs (hand case)") {
    // delta keys before every base row (sentinel path), interleaved mid-block,
    // adjacent delta-delta, and a delta-only block — all four shapes
    val base = Seq((2L, "aab"), (4L, "aad"), (6L, "aaf"), (8L, "aah"),
      (10L, "aaj"), (12L, "aal"), (14L, "ban"), (16L, "bap")).toDF("id", "k")
    val delta = Seq((1L, "aaa"), (7L, "aag"), (9L, "aai"), (20L, "caa"),
      (21L, "cab")).toDF("id", "k")
    val idx = Dedup.snmIndex(base, "k", "id", bucketSize = 3)
    val got = Dedup.incrementalSnmPairs(idx, delta, "k", "id",
        window = 2, bucketSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val deltaIds = Set(1L, 7L, 9L, 20L, 21L)
    val ref = Dedup.sortedNeighborPairs(base.unionByName(delta), "k", "id",
        window = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(got === ref && got.nonEmpty)
    // a fetch gap between two delta neighborhoods must NOT fake adjacency:
    // distant deltas in one block pair with their own neighbors only
    val base2 = (1L to 40L).map(i => (i, f"a$i%03d")).toDF("id", "k")
    val delta2 = Seq((100L, "a0025"), (101L, "a0355")).toDF("id", "k")
    val idx2 = Dedup.snmIndex(base2, "k", "id", bucketSize = 3)
    val got2 = Dedup.incrementalSnmPairs(idx2, delta2, "k", "id",
        window = 2, bucketSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ref2 = Dedup.sortedNeighborPairs(base2.unionByName(delta2), "k", "id",
        window = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 100L || p._2 >= 100L)
    assert(got2 === ref2)
  }

  test("incremental SNM ≡ merged recompute on seeded random corpora") {
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      val rows = (1L to n.toLong).map { i =>
        val k = (1 to 3).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        (i, k)
      }
      val df = rows.toDF("id", "k")
      val base = df.filter($"id" % 5 =!= 0)
      val delta = df.filter($"id" % 5 === 0)
      val deltaIds = rows.map(_._1).filter(_ % 5 == 0).toSet
      val idx = Dedup.snmIndex(base, "k", "id", bucketSize = 4)
      val got = Dedup.incrementalSnmPairs(idx, delta, "k", "id",
          window = 3, bucketSize = 4)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val ref = Dedup.sortedNeighborPairs(df, "k", "id", window = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        .filter(p => deltaIds(p._1) || deltaIds(p._2))
      assert(got === ref, s"trial $trial: ${got.size} vs ${ref.size}")
    }
  }

  test("foldClusterLabels ≡ clusterLabels over the union; untouched labels pass through") {
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val prior = Dedup.clusterLabels(basePairs)
    // one pair merges {1,2,3} with {10,11}; one creates a brand-new cluster;
    // {20,21} is untouched and must not re-enter the loop
    val newPairs = Seq((3L, 10L), (30L, 31L)).toDF("id_a", "id_b")
    val got = Dedup.foldClusterLabels(prior, newPairs)
      .as[(Long, Long)].collect().toSet
    val ref = Dedup.clusterLabels(basePairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toSet
    assert(got === ref)
    assert(got.contains((11L, 1L)) && got.contains((20L, 20L)) &&
      got.contains((31L, 30L)))
  }

  test("sorted neighborhood: window pairs in (key,id) order, blocks never straddle") {
    val df = Seq(
      (1L, "aaa"), (2L, "aab"), (3L, "aac"), (4L, "aad"),
      (5L, "zzz") // different first char -> its own block, no pairs
    ).toDF("id", "k")
    val got = Dedup.sortedNeighborPairs(df, "k", "id", window = 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1), (2L, 4L, 1), (3L, 4L, 1)))
    // sort-order ties break on id: equal keys pair deterministically
    val ties = Seq((7L, "mm"), (5L, "mm"), (6L, "mm")).toDF("id", "k")
    val tp = Dedup.sortedNeighborPairs(ties, "k", "id", window = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(tp === Set((5L, 6L), (6L, 7L)))
  }

  test("snm composite key: runtime guards on id castability/sign and key charset") {
    // valid long-range ids (incl. Long.MaxValue, 19 digits) pass untruncated
    val ok = Seq((Long.MaxValue, "aaa"), (0L, "aab")).toDF("id", "k")
    val cs = Dedup.snmIndex(ok, "k", "id", bucketSize = 2)
      .orderBy("_cs").select("_cs").as[String].collect()
    assert(cs(0).endsWith("9223372036854775807") && cs(1).endsWith("0000000000000000000"))
    def mustFail(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val e = intercept[Exception] {
        Dedup.snmIndex(df, "k", "id", bucketSize = 2).collect()
      }
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("snm composite key")), s"$what: $e")
    }
    // a 20-digit string id would previously lpad-TRUNCATE silently
    mustFail(Seq(("99999999999999999999", "aaa"), ("1", "aab")).toDF("id", "k"),
      "20-digit id")
    mustFail(Seq((-1L, "aaa"), (1L, "aab")).toDF("id", "k"), "negative id")
    mustFail(Seq(("not-a-number", "aaa")).toDF("id", "k"), "non-numeric id")
    // keys containing the separator or U+0000 corrupt composite order
    mustFail(Seq((1L, "aa\u0001b")).toDF("id", "k"), "U+0001 in key")
    mustFail(Seq((1L, "aa\u0000b")).toDF("id", "k"), "U+0000 in key")
    // null key/id: null _cs, no error (pre-guard behavior)
    val withNull = Seq((Some(1L), Some("aaa")), (None, Some("aab")),
      (Some(3L), None)).toDF("id", "k")
    assert(Dedup.snmIndex(withNull, "k", "id", bucketSize = 2)
      .filter(col("_cs").isNull).count() === 2L)
  }

  test("hammingTopK: null embeddings dropped on both sides, not a crash") {
    import graft.ops.Quantize
    def vec(negIdx: Set[Int]): Seq[Float] =
      (0 until 64).map(i => if (negIdx(i)) -1.0f else 1.0f)
    val corpus = Seq(
      (10L, Some(vec(Set()))),
      (11L, None),                       // failed embed call -> null vector
      (12L, Some(vec(Set(5))))
    ).toDF("vec_id", "embedding")
    val probes = Seq((99L, Some(vec(Set()))), (98L, None))
      .toDF("vec_id", "embedding")
    val got = Quantize.hammingTopK(corpus, "embedding", "vec_id",
        probes, "vec_id", k = 3, dim = 64)
      .orderBy("rank").as[(Long, Long, Int, Int)].collect().toSeq
    assert(got === Seq((99L, 10L, 0, 1), (99L, 12L, 1, 2)))
  }

  test("dedupEval: hand-checked P/R/F1, orientation/duplicate-tolerant, 0/0 is null") {
    // truth: {(1,2), (3,4), (5,6)}; pred: {(1,2) dup+reversed, (3,9), (7,8)}
    // -> tp=1, precision 1/3, recall 1/3, f1 = 2/(3+3) = 1/3
    val pred = Seq((2L, 1L), (1L, 2L), (3L, 9L), (7L, 8L), (7L, 7L))
      .toDF("id_a", "id_b") // self-pair must be ignored
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Dedup.dedupEval(pred, truth)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r === ((3L, 3L, 1L, 0.333333, 0.333333, 0.333333)))
    // perfect predictor
    val p2 = Dedup.dedupEval(truth, truth)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(p2 === ((3L, 3L, 3L, 1.0, 1.0, 1.0)))
    // empty pred: precision undefined (null), recall 0
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val e = Dedup.dedupEval(empty, truth).collect().head
    assert(e.getLong(0) === 0L && e.isNullAt(3) && e.getDouble(4) === 0.0)
    // empty truth: recall undefined (null)
    val e2 = Dedup.dedupEval(truth, empty).collect().head
    assert(e2.isNullAt(4) && e2.getDouble(3) === 0.0)
  }

  test("dedupEval threshold sweep: precision rises and recall falls monotonically in θ") {
    // the θ-tuning curve a pipeline reads off dedupEval: sliding-window
    // docs (stride 3, L = i%6+8) + drop-5 copies at +1000 as truth
    val ids = (0L until 60L).toDF("doc_id")
    def mkText(len: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(0L), len - 1),
        j => concat(lit("w"), (col("doc_id") * 3 + j).cast("string"))), " ")
    val fullLen = pmod(col("doc_id"), lit(6)) + 8
    val base = ids.select(col("doc_id"), mkText(fullLen).as("text"))
    val copies = ids
      .select(col("doc_id").as("_o"),
        mkText(greatest(fullLen - 5, lit(3))).as("text"))
      .select((col("_o") + 1000L).as("doc_id"), col("text"))
    val corpus = base.unionByName(copies).cache()
    val truth = ids.select(col("doc_id").as("id_a"),
      (col("doc_id") + 1000L).as("id_b"))
    val curve = Seq(0.3, 0.5, 0.7, 0.9).map { th =>
      val r = Dedup.dedupEval(
        Dedup.jaccardPairs(corpus, "text", "doc_id", 1, th), truth)
        .collect().head
      (th, Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4))
    }
    // recall monotone non-increasing in θ (a stricter gate keeps fewer
    // true pairs); precision monotone non-decreasing (survivors are the
    // higher-jaccard pairs, and truth pairs dominate the high end here)
    curve.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 + 1e-9, s"recall must fall: $a -> $b")
      assert(b._2.getOrElse(1.0) >= a._2.getOrElse(0.0) - 1e-9,
        s"precision must rise on this fixture: $a -> $b")
    case _ => }
    assert(curve.head._3 > curve.last._3, "the sweep must actually move")
    corpus.unpersist()
  }

}
