package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class NnDescentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val graph =
    NnDescent.nnDescentBuild(emb, "embedding", "vec_id", degree = 10, rounds = 3)
      .localCheckpoint(true)

  test("build contract: bounded out-degree, no self-loops, deterministic under repartition") {
    val deg = graph.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(deg <= 10, s"out-degree $deg exceeds the degree bound")
    assert(graph.filter(col("src") === col("dst")).count() === 0L)
    // no duplicate (src, dst) pairs eating degree slots (r20: the build
    // path now dedupes the merge pool like the insert path always did)
    assert(graph.groupBy("src", "dst").count()
      .filter(col("count") > 1).count() === 0L)
    // every node has out-edges (bucketed init gives everyone candidates)
    assert(graph.select("src").distinct().count() === emb.count())
    val g2 = NnDescent.nnDescentBuild(emb.repartition(7), "embedding",
      "vec_id", degree = 10, rounds = 3)
    assert(graph.exceptAll(g2).isEmpty && g2.exceptAll(graph).isEmpty,
      "graph build must be partitioning-independent")
  }

  test("NN-descent rounds improve graph quality (mean kept score non-decreasing)") {
    def meanScore(rounds: Int): Double =
      NnDescent.nnDescentBuild(emb, "embedding", "vec_id", degree = 10,
        rounds = rounds).agg(avg("score")).head().getDouble(0)
    val m = (0 to 3).map(meanScore)
    m.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"round must not degrade kept-edge quality: $m")
    case _ => }
    assert(m.last > m.head, s"3 rounds should beat random init: $m")
  }

  test("beam search: recall@10 vs exact on a 20-query panel; visited stays bounded") {
    val queries = emb.filter(col("vec_id") < 20).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = emb.count().toInt
    var recall = 0.0
    var top1 = 0
    queries.foreach { case (_, qv) =>
      val truth = Knn.topK(emb, "embedding", "vec_id", qv, 10, "cosine")
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
      val r = NnDescent.beamSearchTrace(graph, emb, "embedding", "vec_id",
        qv, k = 10, ef = 32, maxHops = 6, nEntries = 4)
      assert(r.visited <= n, "visited can never exceed the corpus")
      assert(r.ids.size === 10)
      recall += r.ids.map(_._1).toSet.intersect(truth.toSet).size / 10.0
      if (r.ids.head._1 == truth.head) top1 += 1
    }
    recall /= queries.length
    assert(recall >= 0.7, s"beam recall@10 $recall below floor on ${TestSpark.sf}")
    assert(top1 >= 18, s"top-1 found for only $top1/20 queries")
  }

  test("beam search degenerates to exact when ef covers the whole corpus") {
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val n = emb.count().toInt
    // ef = n: the beam holds everything reachable; on a connected-enough
    // graph the result is the exact top-k
    val r = NnDescent.beamSearchTrace(graph, emb, "embedding", "vec_id",
      qv, k = 10, ef = n, maxHops = 20, nEntries = 8)
    val truth = Knn.topK(emb, "embedding", "vec_id", qv, 10, "cosine")
      .select(col("vec_id").cast("long"), round(col("score"), 6))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // self (score 1.0) must lead both
    assert(r.ids.head._1 === 0L && r.ids.head._2 === 1.0)
    assert(r.ids.map(_._1).toSet.intersect(truth.map(_._1).toSet).size >= 9,
      s"near-exhaustive beam should recover the exact top-10: ${r.ids} vs ${truth.toSeq}")
  }

  test("incremental insert: fold of two batches reaches recall parity with the full rebuild") {
    val base = emb.filter(col("vec_id") < 300)
    val b1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val b2 = emb.filter(col("vec_id") >= 400)
    val folded = NnDescent.nnDescentInsert(
      NnDescent.nnDescentInsert(
        NnDescent.nnDescentBuild(base, "embedding", "vec_id", 10, 3),
        base, b1, "embedding", "vec_id", 10),
      emb.filter(col("vec_id") < 400), b2, "embedding", "vec_id", 10)
      .localCheckpoint(true)
    // contract: still bounded degree, no self-loops, every node present
    assert(folded.groupBy("src").count().agg(max("count")).head().getLong(0) <= 10)
    assert(folded.filter(col("src") === col("dst")).count() === 0L)
    assert(folded.select("src").distinct().count() === emb.count())
    // no duplicate (src, dst) pairs eating degree slots
    assert(folded.groupBy("src", "dst").count()
      .filter(col("count") > 1).count() === 0L)
    // probe recall parity floor vs the rebuild graph (same panel as the
    // beam test) — the fold never revisits old-old pairs, so exact
    // equality is not the contract; staying within 0.1 recall is
    val queries = emb.filter(col("vec_id") < 20).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def recall(g: org.apache.spark.sql.DataFrame): Double = {
      var r = 0.0
      queries.foreach { qv =>
        val truth = Knn.topK(emb, "embedding", "vec_id", qv, 10, "cosine")
          .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
        val got = NnDescent.beamSearchTrace(g, emb, "embedding", "vec_id",
          qv, 10, ef = 32, maxHops = 6, nEntries = 4)
        r += got.ids.map(_._1).toSet.intersect(truth).size / 10.0
      }
      r / queries.length
    }
    val rFold = recall(folded)
    val rBuild = recall(graph)
    assert(rFold >= rBuild - 0.1,
      s"folded-graph recall $rFold too far below rebuild $rBuild")
  }

  test("batched beam search equals the per-query driver loop exactly (r19 verdict item 2)") {
    val qdf = emb.filter(col("vec_id") % 37 === 3).orderBy("vec_id").limit(6)
      .select(col("vec_id").as("qid"), col("embedding")).localCheckpoint(true)
    val got = NnDescent.beamSearchBatch(graph, emb, "embedding", "vec_id",
      qdf, "qid", "embedding", k = 10, ef = 32, maxHops = 6, nEntries = 4)
      .collect().toSeq.groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, s) => (-s, id) }.toSeq
      }
    val queries = qdf.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(queries.nonEmpty && got.size === queries.length)
    queries.foreach { case (q, qv) =>
      val single = NnDescent.beamSearchTrace(graph, emb, "embedding",
        "vec_id", qv, k = 10, ef = 32, maxHops = 6, nEntries = 4).ids
      assert(got(q) === single, s"batch/single divergence for query $q")
    }
  }

  test("centroid-routed entries: frame matches driver routing; batch equals single; recall holds") {
    val sample = emb.select("embedding").limit(256).collect()
      .map(_.getSeq[Float](0).toArray)
    val centroids = Knn.trainCentroids(sample, nCells = 16)
    val anchors = NnDescent.cellAnchors(emb, "embedding", "vec_id", centroids)
    assert(anchors.nonEmpty && anchors.values.toSet.size === anchors.size)
    val qdf = emb.filter(col("vec_id") % 41 === 5).orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding")).localCheckpoint(true)
    val queries = qdf.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val frame = NnDescent.routedEntryFrame(qdf, "qid", "embedding",
      centroids, anchors, nEntries = 4).localCheckpoint(true)
    val frameMap = frame.collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    queries.foreach { case (q, qv) =>
      val routed = NnDescent.routedEntries(centroids, anchors, qv, 4)
      assert(routed.nonEmpty && routed.distinct === routed)
      assert(frameMap(q) === routed.toSet,
        s"routedEntryFrame and driver routedEntries disagree for query $q")
    }
    val got = NnDescent.beamSearchBatch(graph, emb, "embedding", "vec_id",
      qdf, "qid", "embedding", k = 10, ef = 32, maxHops = 6,
      entries = Some(frame))
      .collect().toSeq.groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, s) => (-s, id) }.toSeq
      }
    var recall = 0.0
    queries.foreach { case (q, qv) =>
      val single = NnDescent.beamSearchTrace(graph, emb, "embedding",
        "vec_id", qv, k = 10, ef = 32, maxHops = 6,
        entryIds = NnDescent.routedEntries(centroids, anchors, qv, 4))
      assert(got(q) === single.ids,
        s"routed batch/single divergence for query $q")
      val truth = Knn.topK(emb, "embedding", "vec_id", qv, 10, "cosine")
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      recall += single.ids.map(_._1).toSet.intersect(truth).size / 10.0
    }
    recall /= queries.length
    assert(recall >= 0.7,
      s"routed-entry recall@10 $recall below the flat-entry floor")
  }

  test("convergence early-exit: converged fixture stops before the cap with the identical graph") {
    // 6 tight clusters of 8 (one dominant axis per cluster, distinct
    // small per-member perturbations): the true kNN graph is
    // within-cluster and NN-descent reaches its fixpoint in ~2 rounds —
    // the remaining rounds would change zero edges
    val data = (for (c <- 0 until 6; i <- 0 until 8) yield {
      val v = new Array[Float](16)
      v(c) = 1f
      v(6 + i) = 0.05f * (i + 1)
      ((c * 8 + i).toLong, v.toSeq)
    }).toDF("vec_id", "embedding").localCheckpoint(true)
    val (gEarly, rounds) = NnDescent.nnDescentBuildTrace(data, "embedding",
      "vec_id", degree = 5, rounds = 8, convergeDelta = 1e-12)
    assert(rounds < 8, s"converged fixture must early-exit, ran $rounds/8")
    val gFull = NnDescent.nnDescentBuild(data, "embedding", "vec_id",
      degree = 5, rounds = 8, convergeDelta = 0.0)
    assert(gEarly.exceptAll(gFull).isEmpty && gFull.exceptAll(gEarly).isEmpty,
      "early-exit graph must be identical to the full-round build at the fixpoint")
  }

  test("nHint skips the sizing scan without changing the build") {
    val g2 = NnDescent.nnDescentBuild(emb, "embedding", "vec_id",
      degree = 10, rounds = 3, nHint = emb.count())
    assert(graph.exceptAll(g2).isEmpty && g2.exceptAll(graph).isEmpty,
      "size-hinted build must be identical")
  }

  test("contracts: degree/rounds/ef validation") {
    intercept[IllegalArgumentException] {
      NnDescent.nnDescentBuild(emb, "embedding", "vec_id", degree = 0)
    }
    intercept[IllegalArgumentException] {
      NnDescent.beamSearchTrace(graph, emb, "embedding", "vec_id",
        new Array[Float](64), k = 10, ef = 5)
    }
  }
}
