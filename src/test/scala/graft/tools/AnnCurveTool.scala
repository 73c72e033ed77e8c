package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Knn

/** Commit-grade ANN quality curve (r15 VERDICT item 5): recall@10 and
  * probe scan cost vs nProbe for IVF and IVF-PQ against brute-force
  * cosine truth on the embeddings fixture — the index-tuning evidence a
  * production deploy reads before picking nProbe. Same index-build
  * recipe as the q_ivf_knn / q_ivfpq_knn queries (first-256 sample,
  * nCells=16 quantizer, m=8/ksub=16 codebooks, shortlist=64), 20-query
  * panel (vec_id < 20).
  *
  * Usage: Test/runMain graft.tools.AnnCurveTool <sfDir> <outJson>
  * Output: one JSON object with the per-nProbe curve rows; recall must be
  * monotone non-decreasing in nProbe (the tool asserts it for IVF, whose
  * prefix-probing makes it a theorem — see [[Knn.annRecallCurve]]).
  */
object AnnCurveTool {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outJson = if (args.length > 1) args(1) else "ANN_CURVE.json"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val sample = emb.select("embedding").limit(256).collect()
      .map(_.getSeq[Float](0).toArray)
    val nCells = 16
    val centroids = Knn.trainCentroids(sample, nCells)
    val codebooks = Knn.trainPq(sample, m = 8, ksub = 16)
    val queries = emb.filter(col("vec_id") < 20)
      .orderBy(col("vec_id"))
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val assigned = Knn.ivfAssign(emb, "embedding", centroids)
    val curve = Knn.annRecallCurve(assigned, "embedding", "vec_id",
      centroids, codebooks, queries, k = 10,
      nProbes = Seq(1, 2, 4, 8, 16), shortlist = 64)
    curve.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.recallIvf >= a.recallIvf,
          s"IVF recall not monotone: $a -> $b")
      case _ =>
    }
    assert(curve.last.recallIvf == 1.0,
      s"nProbe = nCells must be exact, got ${curve.last}")
    // SHORTLIST axis (r16 verdict item 1): the nProbe sweep holds the
    // shortlist at 64, so IVF-PQ's plateau there can't be attributed —
    // quantization loss or shortlist starvation? Sweep shortlist at two
    // fixed nProbe values against the same truth; "full" = corpus size
    // (the exact-search degenerate case at nProbe = nCells).
    val nFull = emb.count().toInt
    val shortlists = Seq(16, 64, 256, nFull)
    val slCurve = Knn.annShortlistCurve(assigned, "embedding", "vec_id",
      centroids, codebooks, queries, k = 10,
      nProbes = Seq(4, nCells), shortlists = shortlists)
    slCurve.groupBy(_.nProbe).foreach { case (p, pts) =>
      pts.sortBy(_.shortlist).sliding(2).foreach {
        case Seq(a, b) => assert(b.recallIvfPq >= a.recallIvfPq,
          s"IVF-PQ recall not monotone in shortlist at nProbe=$p: $a -> $b")
        case _ =>
      }
    }
    val exactPt = slCurve.find(x => x.nProbe == nCells && x.shortlist == nFull).get
    assert(exactPt.recallIvfPq == 1.0,
      s"nProbe = nCells + full shortlist must be exact, got $exactPt")
    val rows = curve.map { p =>
      s"""{"n_probe":${p.nProbe},"recall_ivf":${p.recallIvf},""" +
        s""""recall_ivfpq":${p.recallIvfPq},"scan_frac":${p.scanFrac}}"""
    }.mkString("[", ",", "]")
    val slRows = slCurve.map { p =>
      s"""{"n_probe":${p.nProbe},"shortlist":${p.shortlist},""" +
        s""""recall_ivfpq":${p.recallIvfPq}}"""
    }.mkString("[", ",", "]")
    // THIRD method axis (r18 verdict item 5): the graph index. Recall@10
    // vs beam width ef for NN-descent + beam search against the same
    // brute-force truth, with the visited-node fraction as the cost
    // column (the graph analogue of scan_frac). Monotone-in-ef is NOT a
    // theorem here (a wider beam explores a different frontier), so it is
    // measured, not asserted — the curve is the evidence a deploy reads.
    val nng = graft.ops.NnDescent.nnDescentBuild(emb, "embedding", "vec_id",
      degree = 10, rounds = 3).localCheckpoint(true)
    val efGrid = Seq(10, 16, 32, 64)
    val truths = queries.map { qv =>
      qv -> Knn.topK(emb, "embedding", "vec_id", qv, 10, "cosine")
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
    }
    def nngCurve(entriesFor: Array[Float] => Seq[Long]): String =
      efGrid.map { ef =>
        var r = 0.0; var vis = 0.0; var t1 = 0
        truths.foreach { case (qv, truth) =>
          val b = graft.ops.NnDescent.beamSearchTrace(nng, emb, "embedding",
            "vec_id", qv, k = 10, ef = ef, maxHops = 6, nEntries = 4,
            entryIds = entriesFor(qv))
          r += b.ids.map(_._1).toSet.intersect(truth.toSet).size / 10.0
          vis += b.visited.toDouble / nFull
          if (b.ids.head._1 == truth.head) t1 += 1
        }
        val q = queries.size
        f"""{"ef":$ef,"recall_nng":${math.rint(r / q * 1e6) / 1e6}%s,"visited_frac":${math.rint(vis / q * 1e6) / 1e6}%s,"top1_hits":$t1}"""
      }.mkString("[", ",", "]")
    val nngRows = nngCurve(_ => Nil)
    // FOURTH axis (r19 verdict item 5): centroid-ROUTED entry points —
    // the flat stand-in for HNSW's upper layers. Same graph, same truth,
    // entries = the anchors of the 4 nearest quantizer cells per query
    // instead of the 4 smallest ids; the visited fraction is what the
    // routing buys.
    val anchors = graft.ops.NnDescent.cellAnchors(emb, "embedding",
      "vec_id", centroids)
    val nngRoutedRows = nngCurve(qv =>
      graft.ops.NnDescent.routedEntries(centroids, anchors, qv, 4))
    // FIFTH axis: the degree dial. Degree 16 + a SINGLE routed entry
    // reaches the r19-verdict target frontier (measured: recall 0.885 at
    // 13.6 % visited, top-1 20/20 at ef=10 on sf0.1) — the denser
    // neighborhood means the beam collects the true top-10 from within
    // the query's own region instead of wandering for coverage; the cost
    // is a 1.6× edge table and a ~2.5× one-time build.
    val nng16 = graft.ops.NnDescent.nnDescentBuild(emb, "embedding",
      "vec_id", degree = 16, rounds = 3).localCheckpoint(true)
    def nng16Curve(): String = efGrid.map { ef =>
      var r = 0.0; var vis = 0.0; var t1 = 0
      truths.foreach { case (qv, truth) =>
        val b = graft.ops.NnDescent.beamSearchTrace(nng16, emb, "embedding",
          "vec_id", qv, k = 10, ef = ef, maxHops = 6,
          entryIds = graft.ops.NnDescent.routedEntries(centroids, anchors, qv, 1))
        r += b.ids.map(_._1).toSet.intersect(truth.toSet).size / 10.0
        vis += b.visited.toDouble / nFull
        if (b.ids.head._1 == truth.head) t1 += 1
      }
      val q = queries.size
      f"""{"ef":$ef,"recall_nng":${math.rint(r / q * 1e6) / 1e6}%s,"visited_frac":${math.rint(vis / q * 1e6) / 1e6}%s,"top1_hits":$t1}"""
    }.mkString("[", ",", "]")
    val nng16Rows = nng16Curve()
    val json =
      s"""{"sf_dir":"$sfDir","k":10,"n_cells":$nCells,"m":8,"ksub":16,""" +
        s""""shortlist":64,"n_queries":${queries.size},"curve":$rows,""" +
        s""""shortlist_full":$nFull,"shortlist_curve":$slRows,""" +
        s""""nng_degree":10,"nng_rounds":3,"nng_curve":$nngRows,""" +
        s""""nng_routed_curve":$nngRoutedRows,""" +
        s""""nng16_routed1_curve":$nng16Rows}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
