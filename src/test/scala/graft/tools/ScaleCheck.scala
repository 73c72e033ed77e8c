package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity harness (not a ScalaTest — run on demand):
  *
  * {{{
  * sbt "Test/runMain graft.tools.ScaleCheck"          # k = 1,2,4 at sf0.1
  * }}}
  *
  * Self-unions the documents/embeddings tables k× with per-replica
  * DISSIMILARITY transforms — texts through a replica-specific vowel
  * substitution (every token changes → cross-replica shingle overlap ≈ 0),
  * embeddings through a replica-specific circular shift (cross-replica
  * cosine ≈ random) — so each replica pairs only within itself and the
  * true-pair count grows LINEARLY with k. That isolates input-size scaling:
  * a time factor near the 2× data ratio per doubling is linear behavior, a
  * factor near 4× is the quadratic blowup that would sink a 100 TB run.
  * (A naive suffix-token replica design makes every doc near-dup its k−1
  * copies — output itself quadratic in k — and measures nothing useful.)
  * Prints one JSON line per (op, k) and a growth-factor summary.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ks = sys.env.getOrElse("SPARK_GRAFT_SCALE_KS", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    // k is capped by the number of distinct vowel maps: replica r would be
    // byte-identical to replica r-5 (map r % 5 repeats, and map 0 is the
    // identity), re-introducing the quadratic-output trap documented above
    require(ks.max <= 5, s"k must be ≤ 5 (distinct replica alphabets), got $ks")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val step = 10000000L
    // replica-specific vowel rotation: every word containing a vowel
    // changes, so cross-replica token/shingle overlap collapses while
    // within-replica pair structure stays identical to the original
    val vowelMaps = Array("aeiou", "eioua", "iouae", "ouaei", "uaeio")
    def replicateDocs(df: DataFrame, k: Int): DataFrame =
      (0 until k).map { r =>
        val withId = df.withColumn("doc_id", col("doc_id") + lit(r * step))
        if (r == 0) withId
        else withId.withColumn("text",
          translate(col("text"), "aeiou", vowelMaps(r % vowelMaps.length)))
      }.reduce(_ unionByName _)
    // replica-specific circular shift: shifted random vectors are ~orthogonal
    // to every other replica's, so cosine pairs stay within a replica
    def replicateEmb(df: DataFrame, dim: Int, k: Int): DataFrame =
      (0 until k).map { r =>
        val withId = df.withColumn("vec_id", col("vec_id") + lit(r * step))
        if (r == 0) withId
        else withId.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r)))
      }.reduce(_ unionByName _)

    // SPARK_GRAFT_SCALE_OPS=a,b runs just those ops (dev loop for a new
    // entry without the full ~20-op sweep); skipped ops record NaN, which
    // the summary drops.
    val opsFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def timed(name: String, k: Int, rows: Long)(body: => Long): Double = {
      if (opsFilter.exists(!_.contains(name))) return Double.NaN
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","k":$k,"rows":$rows,"out_rows":$n,"sec":$sec%.3f}""")
      sec
    }

    // events replicate by user-id shift: users (and so funnels, cohorts,
    // sessions) pair only within their replica — event volume and per-user
    // structure both scale linearly with k
    def replicateEvents(df: DataFrame, k: Int): DataFrame =
      (0 until k).map { r =>
        df.withColumn("user_id", col("user_id") + lit(r * step))
          .withColumn("event_id", col("event_id") + lit(r * step))
      }.reduce(_ unionByName _)
    // the adversarial tail for the funnel ops: one bot user whose event
    // count grows with k (20k views per replica unit, then one click +
    // purchase) — the de-skewed single-shuffle fold must stay linear, and
    // the segmented variant bounds its buffers at (user, day) grain
    def plantHotUser(ev: DataFrame, k: Int): DataFrame = {
      val n = 20000 * k
      val bot = spark.range(n).select(
        lit(888888888L).as("user_id"),
        expr("timestamp_micros(cast(1704067200000000 + id * 1000000 as long))").as("ts"),
        (col("id") + 500000000L).as("event_id"),
        when(col("id") < n - 2, "view")
          .when(col("id") === n - 2, "click").otherwise("purchase").as("event_type"),
        lit(1.0).as("value"))
      ev.select("user_id", "ts", "event_id", "event_type", "value")
        .unionByName(bot)
    }

    // Adversarial boilerplate for the segment/substring hot-key checks: an
    // 8-token VOWEL-FREE footer (the cross-page-footer case) prefixed to
    // 50 % of docs AFTER replication — vowel-free tokens survive the
    // replica vowel rotation unchanged, so this is ONE global hot segment
    // hash / shingle bucket whose absolute frequency grows linearly with k
    // (the worst shape: a per-replica hot key would cap at sf-constant
    // frequency). Exactly 8 tokens so it aligns with dedupSegments'
    // segTokens=8 chunk 0 and forms exactly one complete 8-shingle.
    val boiler8 = "qwrtb zxcvb bnmpl sdfgh hjklm qwwrt rrttz zzxxc"
    def plantBoilerplate(df: DataFrame): DataFrame =
      df.withColumn("text",
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(boiler8 + " "), col("text"))).otherwise(col("text")))

    // Per-replica Caesar rotation for the edit-join domain check: a
    // BIJECTIVE char map preserves every within-replica edit distance,
    // while any nonzero rotation changes every letter, pushing
    // cross-replica distances to ≥ the name's letter count (≫ τ) — so
    // distinct names, candidates, and true pairs all grow exactly ×k.
    // Shifts 0,5,10,15,20 are distinct for k ≤ 5.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def replicateNames(df: DataFrame, k: Int): DataFrame =
      (0 until k).map { r =>
        val s = (r * 5) % 26
        if (r == 0) df
        else df.withColumn("p_name",
          translate(col("p_name"), alpha, alpha.drop(s) + alpha.take(s)))
      }.reduce(_ unionByName _)

    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // fixed-data frame for axis checks that scale a MODEL dimension
    // (nLangs) instead of the corpus — see langid_nb_nlangs
    val docs0 = docs.localCheckpoint(true)
    val nDocs0 = docs0.count()
    val partNames = graft.Tables.part(spark, sfDir).select("p_name")
    val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val events = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val results = scala.collection.mutable.Map[(String, Int), Double]()

    // ANN index artifacts are trained ONCE on the base corpus and reused at
    // every k — the realistic setup (the quantizer does not retrain because
    // the corpus grew) and the only fair one (training is O(sample), not
    // O(corpus), and must not pollute the probe timing)
    val sample = emb.select("embedding").limit(256).collect()
      .map(_.getSeq[Float](0).toArray)
    val centroids = graft.ops.Knn.trainCentroids(sample, nCells = 16)
    val codebooks = graft.ops.Knn.trainPq(sample, m = 8, ksub = 16)
    val probeVec = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val funnelStages = Seq("view", "click", "purchase")
    // train-once artifacts for the apply-side checks: the BPE merge table
    // and the Lloyd quantizer ship with the pipeline and do NOT retrain
    // because the corpus grew (the centroid/codebook convention above)
    val bpeArt = graft.ops.TextAnalysis.bpeMerges(
        graft.Tables.documents(spark, sfDir), "text", nMerges = 8)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val kmCents = graft.ops.Knn.kmeansFit(emb, "embedding", "vec_id",
        k = 16, iterations = 2)
      .orderBy("cell").collect().map(_.getSeq[Long](2)).toSeq
    // r20: base-corpus graph + routing anchors for the nng_batch_queries
    // axis (probe count scales, corpus fixed — artifacts built once)
    val nngBase = graft.ops.NnDescent.nnDescentBuild(emb, "embedding",
      "vec_id", degree = 10, rounds = 1).localCheckpoint(true)
    val anchBase = graft.ops.NnDescent.cellAnchors(emb, "embedding",
      "vec_id", centroids)

    // warm-up pass over every op shape so the first measured k does not
    // absorb codegen/classload compilation
    {
      val d0 = docs.limit(500).localCheckpoint(true)
      val e0 = emb.limit(500).localCheckpoint(true)
      val ev0 = events.limit(2000).localCheckpoint(true)
      graft.ops.Dedup.exactDedup(d0, "text", "doc_id").count()
      graft.ops.Dedup.minhashNearDups(d0, "text", "doc_id", threshold = 0.8).count()
      graft.ops.Dedup.jaccardPairs(d0, "text", "doc_id", shingleN = 3, threshold = 0.8).count()
      graft.ops.Dedup.substringSpans(d0, "text", "doc_id").count()
      graft.ops.Dedup.embeddingNearDups(e0, "embedding", "vec_id", dim = 64,
        threshold = 0.9).count()
      graft.ops.Knn.ivfPqSearch(graft.ops.Knn.ivfAssign(e0, "embedding", centroids),
        "embedding", "vec_id", centroids, codebooks, probeVec, 10, nProbe = 4).count()
      graft.ops.Quantize.topKInt8(e0, "embedding", "vec_id",
        emb.filter(col("vec_id") === 0), k = 10).count()
      graft.ops.Funnel.depthHistogram(ev0, "user_id", "ts", "event_id",
        "event_type", funnelStages).count()
      graft.ops.Funnel.segmentedDepthHistogram(ev0, "user_id", "ts", "event_id",
        "event_type", funnelStages, to_date(col("ts"))).count()
      graft.ops.Selection.selectToTokenBudget(
        d0.select(col("doc_id"),
          size(graft.ops.Dedup.tokens(col("text"))).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("score")),
        "doc_id", "n_tok", "score", budget = 10000L, buckets = 64).count()
      graft.ops.Dedup.dedupSegments(d0, "text", "doc_id", segTokens = 8).count()
      graft.ops.Mixing.sampleKPerGroup(
        d0.select(col("doc_id"), pmod(col("doc_id"), lit(5)).cast("string").as("g")),
        "g", "doc_id", k = 100).count()
      graft.ops.Selection.bigramLogProb(d0, "text", "doc_id").count()
      graft.ops.CorpusStats.corpusDiversity(e0, "embedding").count()
      graft.ops.Dedup.incrementalDedup(d0, d0, "text", "doc_id").count()
      graft.ops.CorpusStats.oovRate(d0, "text", "doc_id", 100).count()
      graft.ops.Knn.kmeansFit(e0, "embedding", "vec_id", k = 4, iterations = 1).count()
      graft.ops.Funnel.topPaths(ev0, "user_id", "ts", "event_id", "event_type",
        gapMicros = 1800000000L, n = 15).count()
      graft.ops.Dedup.editDistancePairs(partNames.limit(500), "p_name", tau = 2).count()
      graft.ops.Funnel.cusumChangepoints(ev0, "ts", "event_type", 5, 15).count()
      graft.ops.Funnel.abTestConversion(ev0, "user_id", "event_type", "purchase").count()
      graft.ops.Graph.pageRank(
        graft.ops.CorpusStats.bigramCounts(d0, "text"), "w1", "w2", "c_xy", 2).count()
      graft.ops.TextAnalysis.bpeMerges(d0, "text", nMerges = 4).count()
      graft.ops.Retrieval.itemCooccurrence(
        ev0.select(col("user_id"), pmod(col("event_id"), lit(100)).cast("int").as("item")),
        "user_id", "item", maxItemsPerUser = 50, minPairCount = 2L, topK = 10).count()
      graft.ops.Dedup.sortedNeighborPairs(
        d0.select(col("doc_id"), substring(lower(col("text")), 1, 32).as("_key")),
        "_key", "doc_id", window = 5).count()
      graft.ops.Graph.triangleCounts(
        graft.ops.CorpusStats.bigramCounts(d0, "text"), "w1", "w2").count()
      graft.ops.Funnel.attribution(ev0, "user_id", "ts", "event_id",
        "event_type", "purchase").count()
      graft.ops.Funnel.trendSlopes(ev0, "ts", "event_type").count()
      graft.ops.Funnel.cohortLtv(ev0, "user_id", "ts", "value").count()
      graft.ops.Funnel.scd2Merge(
        graft.ops.Funnel.scd2History(ev0, "user_id", "event_type", "ts", "event_id"),
        ev0.withColumn("ts", expr("ts + interval 400 days")),
        "user_id", "event_type", "ts", "event_id").count()
      graft.ops.Funnel.scd2History(ev0, "user_id", "event_type", "ts", "event_id").count()
      graft.ops.Funnel.ewmaHalf(ev0, "user_id", "value", "ts", "event_id").count()
      graft.ops.Selection.paretoFront(
        ev0.select(to_date(col("ts")).as("day"), col("value")), "day", "value").count()
      graft.ops.CorpusStats.pmiCollocations(d0, "text", minCount = 2, topK = 10).count()
    }
    // Fixed delta for the incremental-dedup check: the 5th vowel alphabet is
    // never a replica alphabet at k ≤ 4 (replicas use maps 0..k-1), so the
    // delta's content stays disjoint from EVERY base replica — the anti
    // join rejects nothing and the survivor/keeper side is k-invariant by
    // construction. (At k = 5 replica 4 shares this alphabet and the delta
    // becomes all-duplicate — semantics change, no blowup.)
    val deltaFixed = docs
      .withColumn("doc_id", col("doc_id") + lit(9L * step))
      .withColumn("text", translate(col("text"), "aeiou", vowelMaps(4)))
      .localCheckpoint(true)
    // Fixed delta for the incremental-ER check: the r=4 Caesar alphabet
    // (shift 20) is never a base replica alphabet at k ≤ 4, so delta keys
    // stay disjoint from every base replica — probe cost must track the
    // base artifact scan (the deltaFixed stance, sorted-key edition)
    val partKeyed = graft.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), lower(trim(col("p_name"))).as("_key"))
    def replicateKeyedNames(k: Int): DataFrame = (0 until k).map { r =>
      val sft = (r * 5) % 26
      val b = partKeyed.withColumn("id", col("id") + lit(r * step))
      if (r == 0) b
      else b.withColumn("_key",
        translate(col("_key"), alpha, alpha.drop(sft) + alpha.take(sft)))
    }.reduce(_ unionByName _)
    val erDelta = partKeyed.filter(col("id") % 9 === 0)
      .withColumn("id", col("id") + lit(9L * step))
      .withColumn("_key", translate(col("_key"), alpha,
        alpha.drop(20) + alpha.take(20)))
      .localCheckpoint(true)
    for (k <- ks) {
      val d = replicateDocs(docs, k).localCheckpoint(true)
      val e = replicateEmb(emb, 64, k).localCheckpoint(true)
      val ev = plantHotUser(replicateEvents(events, k), k).localCheckpoint(true)
      val nd = d.count(); val ne = e.count(); val nev = ev.count()
      results(("exact_dedup", k)) = timed("exact_dedup", k, nd) {
        graft.ops.Dedup.exactDedup(d, "text", "doc_id").count()
      }
      results(("minhash_neardup", k)) = timed("minhash_neardup", k, nd) {
        graft.ops.Dedup.minhashNearDups(d, "text", "doc_id", threshold = 0.8).count()
      }
      results(("jaccard_pairs", k)) = timed("jaccard_pairs", k, nd) {
        graft.ops.Dedup.jaccardPairs(d, "text", "doc_id",
          shingleN = 3, threshold = 0.8).count()
      }
      // vowel rotation rewrites every vowel-bearing token, so cross-replica
      // positional 8-shingles never collide — span pairs stay within a
      // replica and the true span count grows linearly with k
      results(("substring_spans", k)) = timed("substring_spans", k, nd) {
        graft.ops.Dedup.substringSpans(d, "text", "doc_id").count()
      }
      results(("embedding_lsh", k)) = timed("embedding_lsh", k, ne) {
        graft.ops.Dedup.embeddingNearDups(e, "embedding", "vec_id",
          dim = 64, threshold = 0.9).count()
      }
      results(("ivfpq_probe", k)) = timed("ivfpq_probe", k, ne) {
        graft.ops.Knn.ivfPqSearch(graft.ops.Knn.ivfAssign(e, "embedding", centroids),
          "embedding", "vec_id", centroids, codebooks, probeVec, 10, nProbe = 4).count()
      }
      // r19: graph-index build — candidates per node per round are
      // <= (2*degree)^2 by construction, so a round is O(n*degree^2):
      // linear in corpus size at fixed degree. 2 rounds keeps the sweep
      // bounded; the per-round shape is what's being scale-checked.
      results(("nng_build", k)) = timed("nng_build", k, ne) {
        graft.ops.NnDescent.nnDescentBuild(e, "embedding", "vec_id",
          degree = 10, rounds = 2).count()
      }
      // r19: incremental graph insert — a FIXED-size batch (the original
      // emb table) folds into a graph over the k×-replicated corpus: cost
      // is one corpus pass for the batch's exact neighbors + the touched-
      // node re-trim, so per-doubling growth tracks the corpus scan, not
      // the batch
      val nngPre = graft.ops.NnDescent.nnDescentBuild(e, "embedding",
        "vec_id", degree = 10, rounds = 1).localCheckpoint(true)
      results(("nng_insert", k)) = timed("nng_insert", k, ne) {
        val batch = emb.select(col("vec_id") + lit(90000000L) as "vec_id",
          col("embedding"))
        graft.ops.NnDescent.nnDescentInsert(nngPre, e, batch,
          "embedding", "vec_id", degree = 10).count()
      }
      // r20: BATCHED beam-search serving over the k×-replicated corpus —
      // fixed base-replica probe panel, graph/quantizer/anchors built per
      // k OUTSIDE the timed body (the nngPre serve-time stance): each hop
      // is a frontier×edge equi-join + visited anti-join + score join,
      // all corpus-keyed, so per-doubling growth must track the shared
      // scans, never per-probe job count
      val nngAnch = graft.ops.NnDescent.cellAnchors(e, "embedding",
        "vec_id", centroids)
      results(("nng_batch", k)) = timed("nng_batch", k, ne) {
        val probes = emb.filter(pmod(col("vec_id"), lit(41)) === 5)
          .select(col("vec_id").as("qid"), col("embedding"))
        val entries = graft.ops.NnDescent.routedEntryFrame(probes, "qid",
          "embedding", centroids, nngAnch, nEntries = 4)
        graft.ops.NnDescent.beamSearchBatch(nngPre, e, "embedding",
          "vec_id", probes, "qid", "embedding", k = 10, ef = 32,
          maxHops = 6, entries = Some(entries)).count()
      }
      // r20: the QUERY axis — probe count ×k at FIXED base corpus/graph;
      // per-query state is (qid, vid) rows flowing through the same
      // shared per-hop joins, so the factor must stay ≤ the 2× panel
      // ratio (a per-probe driver loop would pay k× the hop JOBS and
      // blow far past it)
      if (opsFilter.forall(_.contains("nng_batch_queries"))) {
        results(("nng_batch_queries", k)) = timed("nng_batch_queries", k,
          50L * k) {
          val panel = (0 until k).map { r =>
            emb.filter(pmod(col("vec_id"), lit(41)) === 5)
              .select((col("vec_id") + lit(r * step)).as("qid"),
                col("embedding"))
          }.reduce(_ unionByName _)
          val entries = graft.ops.NnDescent.routedEntryFrame(panel, "qid",
            "embedding", centroids, anchBase, nEntries = 4)
          graft.ops.NnDescent.beamSearchBatch(nngBase, emb, "embedding",
            "vec_id", panel, "qid", "embedding", k = 10, ef = 32,
            maxHops = 6, entries = Some(entries)).count()
        }
      }
      results(("int8_probe", k)) = timed("int8_probe", k, ne) {
        graft.ops.Quantize.topKInt8(e, "embedding", "vec_id",
          emb.filter(col("vec_id") === 0), k = 10).count()
      }
      results(("funnel", k)) = timed("funnel", k, nev) {
        graft.ops.Funnel.depthHistogram(ev, "user_id", "ts", "event_id",
          "event_type", funnelStages).count()
      }
      results(("funnel_segmented", k)) = timed("funnel_segmented", k, nev) {
        graft.ops.Funnel.segmentedDepthHistogram(ev, "user_id", "ts", "event_id",
          "event_type", funnelStages, to_date(col("ts"))).count()
      }
      // budget grows with k so the SELECTED FRACTION stays constant —
      // otherwise the boundary bucket's share of the data would shrink
      // with k and the measurement would conflate scaling with selectivity
      results(("token_budget", k)) = timed("token_budget", k, nd) {
        val proj = d.select(col("doc_id"),
          size(graft.ops.Dedup.tokens(col("text"))).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("score"))
        graft.ops.Selection.selectToTokenBudget(proj, "doc_id", "n_tok",
          "score", budget = 120000L * k, buckets = 64).count()
      }
      results(("mixture_budget", k)) = timed("mixture_budget", k, nd) {
        val proj = d.select(col("doc_id"),
          pmod(col("doc_id"), lit(3)).cast("string").as("dom"),
          size(graft.ops.Dedup.tokens(col("text"))).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("score"))
        graft.ops.Selection.selectToTokenBudgetByGroup(proj, "dom", "doc_id",
          "n_tok", "score",
          budgets = Map("0" -> 40000L * k, "1" -> 40000L * k, "2" -> 40000L * k),
          buckets = 64).count()
      }
      results(("retention", k)) = timed("retention", k, nev) {
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(to_date(min(col("ts"))).as("cohort_day"))
        ev.join(cohort, "user_id")
          .select(col("cohort_day"),
            datediff(to_date(col("ts")), col("cohort_day")).as("day_offset"),
            col("user_id"))
          .filter(col("day_offset").between(0, 6))
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct("user_id").as("active_users"))
          .count()
      }
      // vowel rotation makes every replica's 8-token segments distinct, so
      // surviving rows (and reassembly work) grow linearly with k
      results(("segment_dedup", k)) = timed("segment_dedup", k, nd) {
        graft.ops.Dedup.dedupSegments(d, "text", "doc_id", segTokens = 8).count()
      }
      // HOT-KEY adversarial (r5 verdict item 5): one global boilerplate
      // segment in 50 % of ALL docs. dedupSegments' min-window sends every
      // posting of the hot hash to one task — that task's work is O(hot
      // count), linear, and the rows are 16 bytes; the check confirms no
      // quadratic shape hides behind the skew. substringSpans' hot shingle
      // bucket exceeds maxPostings=256 at every k and is dropped as a
      // stop-shingle (documented recall trade: the segment-grain dedup is
      // the op that actually handles boilerplate), so the candidate pair
      // expansion never sees the n²/4 hot pairs.
      val dHot = plantBoilerplate(d).localCheckpoint(true)
      results(("segment_dedup_hotkey", k)) = timed("segment_dedup_hotkey", k, nd) {
        graft.ops.Dedup.dedupSegments(dHot, "text", "doc_id", segTokens = 8).count()
      }
      results(("substring_spans_hotkey", k)) = timed("substring_spans_hotkey", k, nd) {
        graft.ops.Dedup.substringSpans(dHot, "text", "doc_id").count()
      }
      // Cap-sensitivity demo, k=1 only: at maxPostings=4096 the hot bucket
      // (n/2 = 2500 postings at sf0.1) is ADMITTED and the pair expansion
      // pays ~n²/8 rows before the span-length filter discards them — the
      // measured gap between this row and substring_spans_hotkey is what
      // the 256 cap is worth under boilerplate skew.
      if (k == 1) {
        timed("substring_spans_hotkey_cap4096", k, nd) {
          graft.ops.Dedup.substringSpans(dHot, "text", "doc_id",
            maxPostings = 4096).count()
        }
      }
      dHot.unpersist()
      // group count is CONSTANT (pmod 5) while rows grow: the bounded
      // top-k aggregation must stay scan-dominated — a window formulation
      // would sort ever-growing groups in single tasks
      results(("sample_k_per_group", k)) = timed("sample_k_per_group", k, nd) {
        graft.ops.Mixing.sampleKPerGroup(
          d.select(col("doc_id"), pmod(col("doc_id"), lit(5)).cast("string").as("g")),
          "g", "doc_id", k = 100).count()
      }
      // rotated replicas mint new vocabulary, so the bigram model table
      // grows ~linearly with k alongside the token stream
      results(("bigram_logprob", k)) = timed("bigram_logprob", k, nd) {
        graft.ops.Selection.bigramLogProb(d, "text", "doc_id").count()
      }
      results(("corpus_diversity", k)) = timed("corpus_diversity", k, ne) {
        graft.ops.CorpusStats.corpusDiversity(e, "embedding").count()
      }
      // output fixed at k=100: the E-S top-k must stay scan-dominated
      results(("weighted_sample", k)) = timed("weighted_sample", k, nd) {
        graft.ops.Mixing.weightedSampleK(
          d.select(col("doc_id"), length(col("text")).cast("long").as("w"))
            .withColumn("w", col("w").cast("double")),
          "doc_id", "w", k = 100).count()
      }
      // stats table constant at |groups| = 5; z is then a projection
      results(("z_scores", k)) = timed("z_scores", k, nd) {
        graft.ops.CorpusStats.zScores(
          d.select(col("doc_id"), pmod(col("doc_id"), lit(5)).cast("string").as("g"),
            length(col("text")).cast("long").as("v")),
          "g", "v").count()
      }
      // DELTA FIXED, base ×k (the production increment shape): the base
      // reduces to 8-byte keys at the scan and the survivor/keeper/semi
      // side is delta-bounded (disjoint delta — see deltaFixed above), so
      // the per-doubling factor tracks the base key scan+shuffle, ≤ the
      // 2× data ratio, with no delta-side recompute hiding in it
      results(("incremental_dedup", k)) = timed("incremental_dedup", k, nd) {
        graft.ops.Dedup.incrementalDedup(d, deltaFixed, "text", "doc_id").count()
      }
      // vocab size FIXED (500) while the corpus grows ×k — rotated
      // replicas mint new vocabulary, so the word-count aggregate grows
      // linearly while TakeOrdered's k and the broadcast membership probe
      // stay bounded; per-doubling factor ≤ 2 means no global-sort or
      // vocab-sized shuffle crept in
      results(("oov_rate", k)) = timed("oov_rate", k, nd) {
        graft.ops.CorpusStats.oovRate(d, "text", "doc_id", 500).count()
      }
      // rolling actives: users ×k (replicas shift user ids) while the day
      // spine stays fixed — the (day, user) grain and the spine join both
      // grow linearly; the hot user adds one more (day, user) row per day
      results(("rolling_active", k)) = timed("rolling_active", k, nev) {
        graft.ops.Funnel.rollingActiveUsers(ev, "user_id", "ts", 7).count()
      }
      // rolling actives with the SPINE ×k while the dense (day, user)
      // grain stays FIXED (base events, un-replicated): one sparse user
      // adds one event per day across 1000·k days beyond the base range,
      // so |spine| grows ~linearly while |daily| barely moves. The
      // interval-coverage shape does ≤|daily|·windowDays + |spine| work
      // → time stays FLAT in k; the day-spine BNLJ this replaced did
      // |daily|·|spine| predicate evaluations → linear growth with a
      // |daily|-sized constant, which is exactly what this entry detects
      if (opsFilter.forall(_.contains("rolling_active_spine"))) {
        val sparse = spark.range(1000L * k).select(
          lit(777777777L).as("user_id"),
          expr("timestamp_micros(cast(1735689600000000 + id * 86400000000 as long))")
            .as("ts"),
          (col("id") + 600000000L).as("event_id"),
          lit("view").as("event_type"), lit(1.0).as("value"))
        val evSpine = events.unionByName(sparse).localCheckpoint(true)
        val nsp = evSpine.count()
        results(("rolling_active_spine", k)) = timed("rolling_active_spine", k, nsp) {
          graft.ops.Funnel.rollingActiveUsers(evSpine, "user_id", "ts", 7).count()
        }
        evSpine.unpersist()
      }
      // conversion latency: converting users ×k; only (user, 2 ts) rows
      // shuffle, so growth is the two type-filtered scans
      results(("time_to_convert", k)) = timed("time_to_convert", k, nev) {
        graft.ops.Funnel.timeToConvert(ev, "user_id", "ts", "event_type",
          "view", "purchase").count()
      }
      // session paths under the HOT USER (events 1 s apart → the bot never
      // hits the 30-min gap: ONE session of 20k·k events): the maxEvents
      // prefix cap bounds the path buffer to 64 structs, so the bot costs
      // its share of the user-grain sort and nothing quadratic/unbounded
      results(("top_paths_hotuser", k)) = timed("top_paths_hotuser", k, nev) {
        graft.ops.Funnel.topPaths(ev, "user_id", "ts", "event_id", "event_type",
          gapMicros = 1800000000L, n = 15).count()
      }
      // distributed Lloyd: k and iterations FIXED while rows grow ×k —
      // assignment is a per-row broadcast-literal argmin (no join/shuffle)
      // and each update collects k rows, so per-doubling cost must track
      // the two scans; the driver loop is k·d longs per iteration
      results(("kmeans", k)) = timed("kmeans", k, ne) {
        graft.ops.Knn.kmeansFit(e, "embedding", "vec_id",
          k = 8, iterations = 2).count()
      }
      // PassJoin with the name DOMAIN ×k (Caesar replicas, see
      // replicateNames): index, probe, candidate join, and true pairs all
      // scale with the domain — a super-linear factor here means a
      // degenerate segment bucket (the uniform-prefix pathology)
      if (opsFilter.forall(_.contains("edit_join"))) {
        val pn = replicateNames(partNames, k).localCheckpoint(true)
        val np = pn.count()
        results(("edit_join", k)) = timed("edit_join", k, np) {
          graft.ops.Dedup.editDistancePairs(pn, "p_name", tau = 2).count()
        }
        pn.unpersist()
      }
      // user-shifted event replicas: per-user history identical per
      // replica, so versions/EWMA outputs grow ×k and both ops must track
      // the single user-grain exchange linearly
      results(("scd2", k)) = timed("scd2", k, nev) {
        graft.ops.Funnel.scd2History(ev, "user_id", "event_type",
          "ts", "event_id").count()
      }
      results(("ewma", k)) = timed("ewma", k, nev) {
        graft.ops.Funnel.ewmaHalf(ev, "user_id", "value",
          "ts", "event_id").count()
      }
      // pareto: the day domain is k-invariant under user-shift
      // replication, so the collapsed window is constant work and the
      // time must track the one corpus-pass aggregate
      results(("pareto", k)) = timed("pareto", k, nev) {
        graft.ops.Selection.paretoFront(
          ev.select(to_date(col("ts")).as("day"), col("value")),
          "day", "value").count()
      }
      // vowel-rotated doc replicas: vocab and bigram vocab ×k, token
      // mass ×k, top-k output fixed — counts aggregates must stay linear
      results(("pmi", k)) = timed("pmi", k, nd) {
        graft.ops.CorpusStats.pmiCollocations(d, "text",
          minCount = 5, topK = 20).count()
      }
      // day spine fixed, per-day counts ×k: the sequential fold runs on
      // the (type, day) grain, so only the corpus collapse may scale
      results(("cusum", k)) = timed("cusum", k, nev) {
        graft.ops.Funnel.cusumChangepoints(ev, "ts", "event_type", 5, 15).count()
      }
      // users ×k per replica: one user-grain exchange, 1-row output
      results(("ab_test", k)) = timed("ab_test", k, nev) {
        graft.ops.Funnel.abTestConversion(ev, "user_id", "event_type",
          "purchase").count()
      }
      // bigram vocab, nodes, and edges all ×k under vowel rotation; each
      // pagerank iteration is an edge-join + dst aggregate → linear
      results(("pagerank", k)) = timed("pagerank", k, nd) {
        graft.ops.Graph.pageRank(
          graft.ops.CorpusStats.bigramCounts(d, "text"),
          "w1", "w2", "c_xy", iterations = 2).count()
      }
      // disjoint vowel-rotated bigram graphs (see triangles): nodes,
      // edges, and per-round (node, neighbor-label) pairs all ×k; each
      // LPA round is one edge-join + count + per-node min_by/argmax
      // aggregate (no window — see Graph.lpaCommunities) → linear
      results(("lpa", k)) = timed("lpa", k, nd) {
        graft.ops.Graph.lpaCommunities(
          graft.ops.CorpusStats.bigramCounts(d, "text"),
          "w1", "w2", rounds = 2).count()
      }
      // LONG-CHAIN graph (the componentsStar target shape): chain count
      // ×k at FIXED length 512, so the star contraction's round count —
      // a function of chain length only — is k-invariant and each round
      // is edge-grain joins + map-side-combined min aggregates → linear
      results(("components_star", k)) = timed("components_star", k, 40L * k * 512L) {
        val L = 512L
        val pairs = spark.range(40L * k * L)
          .filter(pmod(col("id"), lit(L)) =!= (L - 1))
          .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
        graft.ops.Graph.componentsStar(pairs).count()
      }
      // vowel-rotated lines never collide across replicas, so the C4
      // cross-corpus line-dedup key space grows ×k — rules are scan-side,
      // the one line-grain shuffle must stay linear
      results(("c4_clean", k)) = timed("c4_clean", k, nd) {
        graft.ops.TextAnalysis.c4CleanLines(
          d.select(col("doc_id"), concat(col("text"), lit(".")).as("text")),
          "doc_id", "text").count()
      }
      // id-shifted replicas spell disjoint URL namespaces (the q_url_dedup
      // construction on the shifted doc_id), so canonical-grain groups ×k
      // while the ONE map-side-combined aggregate must stay linear
      results(("url_dedup", k)) = timed("url_dedup", k, nd) {
        val g = shiftright(col("doc_id"), 2)
        val urls = d.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("https://site"), g, lit(".com/p"), g))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("HTTPS://SITE"), g, lit(".COM:443/p"), g, lit("#s")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("https://site"), g, lit(".com/p"), g,
              lit("/?utm_source=feed")))
          .otherwise(concat(lit("https://site"), g, lit(".com/p"), g,
            lit("?page=2"))).as("url"))
        graft.ops.TextAnalysis.urlDedup(urls, "url", "doc_id").count()
      }
      // grounding is pure scan-side (two codegen shingle passes + an
      // array intersect per row) — zero shuffle, must track the scan
      results(("grounding", k)) = timed("grounding", k, nd) {
        graft.ops.Retrieval.groundingScore(
          d.select(col("doc_id"),
            substring(col("text"), 1, 120).as("answer"),
            col("text").as("context")),
          "answer", "context").count()
      }
      // synthetic per-doc-unique token docs (the testdata table's 31-word
      // vocab is a degenerate domain for an inverted index): doc i carries
      // 20 tokens w<i>_j, its snippet the first 15 — true (snippet ⊂
      // source) pairs and posting lists both grow exactly ×k
      results(("containment", k)) = timed("containment", k, 10000L * k) {
        val base = spark.range(5000L * k).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 20).map(j =>
            concat(lit("w"), col("id"), lit(s"_$j")): org.apache.spark.sql.Column): _*)
            .as("text"))
        val snip = base.select((col("doc_id") + 100000000L).as("doc_id"),
          array_join(slice(graft.ops.Dedup.tokens(col("text")), 1, 15), " ")
            .as("text"))
        graft.ops.Dedup.containmentPairs(base.unionByName(snip), "text",
          "doc_id", shingleN = 1, threshold = 0.9).count()
      }
      // vowel-rotated replicas: vocab, (doc, word) tf grain, and the df
      // join all ×k; the per-doc top-k collect is doc-vocab bounded
      results(("tfidf_keywords", k)) = timed("tfidf_keywords", k, nd) {
        graft.ops.TextAnalysis.tfidfKeywords(d, "text", "doc_id", k = 5)
          .count()
      }
      // one n-gram pass + a 10-group count/countDistinct: the distinct
      // set ×k under vowel rotation, the group grain fixed
      results(("distinct_ngrams", k)) = timed("distinct_ngrams", k, nd) {
        graft.ops.TextAnalysis.distinctNgramRatio(
          d.select(pmod(col("doc_id"), lit(10)).as("grp"), col("text")),
          "text", "grp").count()
      }
      // href regexp scan + canonical-grain count; the 49999 modulus is
      // coprime to the replica id shift, so target sets shift per replica
      // and the aggregate key space grows with k (scan dominates)
      results(("link_graph", k)) = timed("link_graph", k, nd) {
        val t = pmod(col("doc_id") * 7 + 3, lit(49999))
        val html = d.select(col("doc_id"),
          concat(col("text"), lit(" <a href=\"https://t"), t,
            lit(".com/p?utm_source=x\">l</a>")).as("html"))
        graft.ops.TextAnalysis.extractLinks(html, "html", "doc_id")
          .select(graft.ops.TextAnalysis.canonicalizeUrl(col("url")).as("u"))
          .groupBy(col("u")).agg(count(lit(1))).count()
      }
      // pure scan-side integer predicates — no shuffle at all
      results(("gopher_rules", k)) = timed("gopher_rules", k, nd) {
        graft.ops.TextAnalysis.gopherRules(d, "doc_id", "text").count()
      }
      // families derive from replicated ids with nFam ∝ rows, so the
      // planted pair count grows linearly while per-row codec work
      // (WAV synth + DFT / GIF encode + frame dHash) dominates
      results(("audio_neardup", k)) = timed("audio_neardup", k, nd) {
        graft.multimodal.Multimodal.audioNearDups(
          graft.multimodal.Multimodal.syntheticWavFamilies(
            d, "doc_id", math.max(1L, nd / 10)), maxHamming = 2).count()
      }
      results(("video_neardup", k)) = timed("video_neardup", k, nd) {
        graft.multimodal.Multimodal.videoNearDups(
          graft.multimodal.Multimodal.syntheticGifFamilies(
            d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id",
            math.max(1L, nd / 20)), maxHamming = 6).count()
      }
      // one d²-bounded Gram aggregate + one projection scan — both linear;
      // the BigInt trajectory is driver-side constant work
      results(("power_iteration", k)) = timed("power_iteration", k, ne) {
        graft.ops.Spectral.dominantProjection(e, "embedding", "vec_id",
          dim = 64, iterations = 2).count()
      }
      // same Gram + driver trajectory as power_iteration, plus the per-row
      // codegen rejection scan — both corpus passes linear, artifacts d²
      results(("abtt", k)) = timed("abtt", k, ne) {
        graft.ops.Spectral.removeDominant(e, "embedding", "vec_id",
          dim = 64, iterations = 2).count()
      }
      // one literal-argmin scan into a k×(d+1) driver artifact — the
      // streaming maintenance unit cost; rows ×k, artifact fixed
      results(("centroid_state", k)) = timed("centroid_state", k, ne) {
        val standing: Seq[Seq[Long]] =
          (0 until 8).map(c => Seq.tabulate(64)(i =>
            if (i % 8 == c) 1000000L else 0L))
        graft.ops.Knn.centroidBatchState(e, "embedding", standing)
          .counts.sum
      }
      // vocab ×k under vowel rotation, hot tokens' RELATIVE mass fixed:
      // the MG candidate exchange stays ≤ k·P rows, the verify scan and
      // the bounded isin-groupBy must track the corpus linearly
      results(("heavy_hitters", k)) = timed("heavy_hitters", k, nd) {
        graft.ops.CorpusStats.heavyHitters(
          d.where(col("text").isNotNull)
            .select(explode(graft.ops.Dedup.tokens(col("text"))).as("value")),
          "value", phi = 0.003).count()
      }
      // word-frequency table ×k; merge steps run on it, corpus touched once
      results(("bpe_train", k)) = timed("bpe_train", k, nd) {
        graft.ops.TextAnalysis.bpeMerges(d, "text", nMerges = 4).count()
      }
      // users ×k over a fixed item catalog (event_id mod 100): pair grid
      // fixed, per-pair counts ×k — the per-user self-join stays bounded
      // by the cap and total work tracks users
      results(("item_cooccur", k)) = timed("item_cooccur", k, nev) {
        graft.ops.Retrieval.itemCooccurrence(
          ev.select(col("user_id"),
            pmod(col("event_id"), lit(100)).cast("int").as("item")),
          "user_id", "item", maxItemsPerUser = 50, minPairCount = 2L,
          topK = 10).count()
      }
      // rows ×k inside each first-char block: sort ~k·log k, pairs ×k
      results(("snm_dedup", k)) = timed("snm_dedup", k, nd) {
        graft.ops.Dedup.sortedNeighborPairs(
          d.select(col("doc_id"),
            substring(lower(col("text")), 1, 32).as("_key")),
          "_key", "doc_id", window = 5).count()
      }
      // every vocab word carries a vowel, so rotated replica graphs are
      // DISJOINT: nodes, edges, wedges, and triangles all ×k
      results(("triangles", k)) = timed("triangles", k, nd) {
        graft.ops.Graph.triangleCounts(
          graft.ops.CorpusStats.bigramCounts(d, "text"), "w1", "w2").count()
      }
      // users ×k: segment windows extend the user exchange, output fixed
      // at |channels| rows
      results(("attribution", k)) = timed("attribution", k, nev) {
        graft.ops.Funnel.attribution(ev, "user_id", "ts", "event_id",
          "event_type", "purchase").count()
      }
      results(("trend", k)) = timed("trend", k, nev) {
        graft.ops.Funnel.trendSlopes(ev, "ts", "event_type").count()
      }
      results(("cohort_ltv", k)) = timed("cohort_ltv", k, nev) {
        graft.ops.Funnel.cohortLtv(ev, "user_id", "ts", "value").count()
      }
      // users ×k: two rank windows + artifact joins, all (type)-keyed —
      // the hot user rides inside one group's sort
      results(("mad_outliers", k)) = timed("mad_outliers", k, nev) {
        graft.ops.CorpusStats.madOutliers(ev, "event_type", "value").count()
      }
      // value rows ×k on both sides of fixed decile cut points
      results(("psi", k)) = timed("psi", k, nev) {
        graft.ops.CorpusStats.psi(
          ev.filter(col("event_id") % 2 === 0).select(col("value")),
          ev.filter(col("event_id") % 2 === 1).select(col("value")),
          "value").count()
      }
      results(("benford", k)) = timed("benford", k, nev) {
        graft.ops.CorpusStats.benfordAudit(ev, "value").count()
      }
      // one entity-grain exchange; the bot user's 20k·k events stream
      // through the lead window without buffering
      results(("time_weighted", k)) = timed("time_weighted", k, nev) {
        graft.ops.Funnel.timeWeightedAvg(ev, "user_id", "ts",
          "value", "event_id").count()
      }
      // probes ×k against a history ×k: the as-of merge is one shuffle +
      // sort of |probes| + |history|
      results(("pit_join", k)) = timed("pit_join", k, nev) {
        val hist = graft.ops.Funnel.scd2History(ev, "user_id", "event_type",
          "ts", "event_id")
        val probes = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("ts"),
            col("event_id").as("probe_id"))
        graft.ops.Funnel.pointInTimeJoin(probes, hist, "user_id", "ts",
          "event_type").count()
      }
      // orders ×k on both snapshot sides: one full-outer equi-join
      results(("snapshot_diff", k)) = timed("snapshot_diff", k, nev) {
        val o = (0 until k).map(r =>
          graft.Tables.orders(spark, sfDir)
            .withColumn("o_orderkey", col("o_orderkey") + lit(r * step)))
          .reduce(_ unionByName _)
        graft.ops.Funnel.snapshotDiff(
          o.filter(col("o_orderkey") % 5 =!= 0)
            .select(col("o_orderkey"), col("o_totalprice")),
          o.filter(col("o_orderkey") % 5 =!= 1)
            .select(col("o_orderkey"), col("o_totalprice")),
          "o_orderkey", Seq("o_totalprice")).count()
      }
      // token mass ×k; the ranking window runs on the vocab grain (which
      // also grows ~×k under vowel rotation — still far under corpus)
      results(("vocab_coverage", k)) = timed("vocab_coverage", k, nd) {
        graft.ops.CorpusStats.vocabCoverage(
          graft.ops.CorpusStats.vocabCounts(d, "text"),
          Seq(0.5, 0.9, 0.99)).count()
      }
      // rows ×k: one range sort + weight-offset selection
      results(("weighted_quantiles", k)) = timed("weighted_quantiles", k, nev) {
        graft.ops.CorpusStats.exactWeightedQuantiles(
          ev.select(col("value").as("x"),
            (pmod(col("event_id"), lit(50)) + 1).as("w")),
          "x", "w", Seq(0.25, 0.5, 0.95)).length.toLong
      }
      // user-day intervals ×k against a FIXED set of type-day intervals:
      // bucket replication is span-bounded, the join a pure equi-join, so
      // candidates and true overlaps both track the left side linearly
      results(("interval_join", k)) = timed("interval_join", k, nev) {
        val lefts = ev.groupBy(col("user_id"), to_date(col("ts")).as("_d"))
          .agg(unix_micros(min(col("ts"))).as("ls"),
            (unix_micros(max(col("ts"))) + 1L).as("le"))
          .select(col("user_id"), col("ls"), col("le"))
        val rights = ev.groupBy(col("event_type"), to_date(col("ts")).as("_d"))
          .agg(unix_micros(min(col("ts"))).as("rs"),
            (unix_micros(max(col("ts"))) + 1L).as("re"))
          .select(col("event_type"), col("rs"), col("re"))
        graft.ops.Interval.overlapJoin(lefts, "ls", "le",
          rights, "rs", "re", bucketWidth = 3600L * 1000000L).count()
      }
      // merges trained ONCE on the base corpus; encode is a scan-side
      // codegen kernel, so time must track rows — no shuffle to bend it
      results(("bpe_encode", k)) = timed("bpe_encode", k, nd) {
        d.select(graft.functions.GraftFunctions.bpe_encode(
            graft.ops.Dedup.tokens(col("text")), bpeArt).as("_s"))
          .agg(sum(size(col("_s")))).head.getLong(0)
      }
      // range-sort + offset selection: sort is the only corpus-scale work
      results(("exact_quantiles", k)) = timed("exact_quantiles", k, nev) {
        graft.ops.CorpusStats.exactQuantiles(
          ev, "value", Seq(0.25, 0.5, 0.95))._1.length.toLong
      }
      // serve-time cell routing under the train-once quantizer: a per-row
      // literal argmin, the assign-at-ingest scan of the SemDeDup/IVF path
      results(("kmeans_assign", k)) = timed("kmeans_assign", k, ne) {
        graft.ops.Knn.kmeansAssign(e, "embedding", kmCents)
          .groupBy("_cell").count().count()
      }
      // SCD2 merge with the base ×k and the DELTA FIXED (replica-0 users,
      // after the base range): the open-row stitch join scales with base
      // entities, closed rows stream through — time must stay ≤ linear
      if (opsFilter.forall(_.contains("scd2_merge"))) {
        val baseHist = graft.ops.Funnel.scd2History(ev, "user_id",
          "event_type", "ts", "event_id").localCheckpoint(true)
        val deltaFixedEv = spark.range(1000).select(
          (col("id") % 200).as("user_id"),
          expr("timestamp_micros(cast(1893456000000000 + id * 1000000 as long))")
            .as("ts"),
          (col("id") + 700000000L).as("event_id"),
          when(col("id") % 3 === 0, "view").otherwise("click").as("event_type"),
          lit(1.0).as("value"))
        results(("scd2_merge", k)) = timed("scd2_merge", k, nev) {
          graft.ops.Funnel.scd2Merge(baseHist, deltaFixedEv,
            "user_id", "event_type", "ts", "event_id").count()
        }
        baseHist.unpersist()
      }
      // users ×k collapse to one score row each; the decile assignment and
      // Brier sums are user-grain — linear through two keyed aggregates
      results(("calibration", k)) = timed("calibration", k, nev) {
        val pu = ev.groupBy(col("user_id"))
          .agg(expr("(1000000L * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)) div count(*)")
            .as("p_micro"),
            (sum(col("value")) > 100.0).as("y"))
        graft.ops.Funnel.calibration(pu, "p_micro", "y", nBuckets = 10).count()
      }
      // users ×k, one user-grain exchange; the bot's 20k·k-touch journey
      // rides the capBuckets guard (credit ages cap at capBuckets
      // half-lives), output fixed at |channels| rows
      results(("attribution_decay", k)) = timed("attribution_decay", k, nev) {
        graft.ops.Funnel.attributionDecay(ev, "user_id", "ts", "event_id",
          "event_type", "purchase", halfLifeUs = 86400000000L).count()
      }
      // SNM under a planted HOT BLOCK (the top_paths-bot analogue): a
      // third of all rows share one long constant key prefix, so they all
      // sort into ONE first-char block, adjacent and Jaro-similar — the
      // per-block window sort carries 0.33·n·k rows in one task and the
      // matched chain folds into one giant component; time must stay
      // ~k·log k, never k² (window pairs are O(n·window) by construction)
      results(("er_snm_hotblock", k)) = timed("er_snm_hotblock", k, nd) {
        val names = d.select(col("doc_id").as("id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("zqqhotblock"),
              lpad(col("doc_id").cast("string"), 14, "0")))
            .otherwise(substring(lower(col("text")), 1, 32)).as("_key"))
        val pairs = graft.ops.Dedup.sortedNeighborPairs(names, "_key", "id",
            window = 5)
          .filter(round(graft.functions.GraftFunctions.jaro_winkler(
            col("key_a"), col("key_b")), 6) >= 0.92)
          .select(col("id_a"), col("id_b"))
        graft.ops.Dedup.clusterLabels(pairs).count()
      }
      // rows ×k through one range-repartition + in-partition sort on the
      // interleaved key — the layout pass is a single ordered exchange
      results(("zorder", k)) = timed("zorder", k, nev) {
        graft.ops.Bucketing.zorderBy(ev,
          pmod(col("user_id"), lit(1024L)),
          pmod(expr("unix_micros(ts) div 3600000000L"), lit(4096L)),
          partitions = 32).count()
      }
      // vectors ×k through one XOR+popcount scan into the k-bounded
      // TopKByScore partial aggregation; probes fixed
      results(("hamming_knn", k)) = timed("hamming_knn", k, ne) {
        graft.ops.Quantize.hammingTopK(e, "embedding", "vec_id",
          emb.filter(col("vec_id").isin(3L, 7L, 11L)), "vec_id",
          k = 10, dim = 64).count()
      }
      // vectors ×k through one posexplode scan per slice into the
      // dim-grain (64-row) artifact; everything after is artifact-sized
      results(("embedding_drift", k)) = timed("embedding_drift", k, ne) {
        graft.ops.CorpusStats.embeddingDrift(
          e.filter(col("vec_id") % 2 === 0).select(col("embedding")),
          e.filter(col("vec_id") % 2 === 1).select(col("embedding")),
          "embedding").count()
      }
      // events ×k collapse onto the FIXED daily spine (replicas shift
      // users, not dates): the pair join stays days², only the daily
      // aggregate scales — near-flat is the pass
      results(("theil_sen", k)) = timed("theil_sen", k, nev) {
        graft.ops.Funnel.theilSenSlopes(ev, "ts", "event_type",
          "value").count()
      }
      results(("seasonal_decompose", k)) = timed("seasonal_decompose", k, nev) {
        graft.ops.Funnel.seasonalDecompose(ev, "event_type", "ts",
          "value").count()
      }
      // incremental ER, steady state: the sorted-key/bucket artifact is
      // prebuilt (standing-pipeline stance) and the timed body is the
      // probe — delta fixed, base ×k: cost must track the artifact scan
      // (directory aggregate + bucket semi-join); the delta-neighborhood
      // window frame is delta-sized and k-invariant
      if (opsFilter.forall(_.contains("incremental_er"))) {
        val erBase = replicateKeyedNames(k).localCheckpoint(true)
        val nbase = erBase.count()
        val erIdx = graft.ops.Dedup.snmIndex(erBase, "_key", "id",
          bucketSize = 64).localCheckpoint(true)
        results(("incremental_er", k)) = timed("incremental_er", k, nbase) {
          graft.ops.Dedup.incrementalSnmPairs(erIdx, erDelta, "_key", "id",
            window = 5, bucketSize = 64).count()
        }
        erIdx.unpersist(); erBase.unpersist()
      }
      // near-dup increment, steady state: the band-table ARTIFACT is
      // prebuilt (as a standing pipeline would have it materialized) and
      // the timed body is the probe — delta fixed, base ×k, so cost must
      // track the base band SCAN (the broadcast probe and candidate-
      // bounded verify are delta-sized); output pairs stay ~constant
      // (rotated base replicas don't near-dup the 5th-alphabet delta)
      if (opsFilter.forall(_.contains("incremental_neardup"))) {
        val bandArt = graft.ops.Dedup.minhashBandTable(
          d, "text", "doc_id", shingleN = 3, numHashes = 48, bands = 24)
          .localCheckpoint(true)
        results(("incremental_neardup", k)) = timed("incremental_neardup", k, nd) {
          graft.ops.Dedup.incrementalNearDups(d, deltaFixed, "text", "doc_id",
            threshold = 0.5, shingleN = 3, numHashes = 48, bands = 24,
            baseBandTable = Some(bandArt)).count()
        }
        bandArt.unpersist()
      }
      // bigram graphs of rotated replicas are DISJOINT (every vocab word
      // carries a vowel): nodes, edges, and the hash-selected seed set all
      // ×k; each hop is one edge-vs-frontier equi-join + settled anti-join
      // at NODE grain — linear per hop, hop count fixed, no pair explosion
      results(("bfs_distance", k)) = timed("bfs_distance", k, nd) {
        val g = graft.ops.CorpusStats.bigramCounts(d, "text")
        val nodes = g.select(col("w1").as("id"))
          .unionByName(g.select(col("w2").as("id"))).distinct()
        graft.ops.Graph.bfsDistances(g, "w1", "w2",
          nodes.filter(pmod(abs(hash(col("id"))), lit(10)) === 3), "id",
          maxHops = 3).count()
      }
      // spearman: lineitem (quantity, price) pairs with per-replica value
      // shifts into DISJOINT ranges — rows AND both value grains ×k (the
      // y grain is already ≈ corpus-sized, the shape the partition-offset
      // distributed rank exists for); the rank join and the five sums are
      // row-linear, so time must track the 2× data ratio per doubling
      if (opsFilter.forall(_.contains("spearman"))) {
        val li = graft.Tables.lineitem(spark, sfDir)
          .select(col("l_quantity"), col("l_extendedprice"))
        val vstep = 1000000000L
        val pairs = (0 until k).map { r =>
          li.select(
            (graft.SparkEntry.roundAway(col("l_quantity") * 100)
              .cast("long") + lit(r * vstep)).as("x"),
            (graft.SparkEntry.roundAway(col("l_extendedprice") * 100)
              .cast("long") + lit(r * vstep)).as("y"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        val np = pairs.count()
        results(("spearman", k)) = timed("spearman", k, np) {
          graft.ops.CorpusStats.spearmanCorrelation(pairs, "x", "y").count()
        }
        pairs.unpersist()
      }
      // docs ×k through trigram explode → dense-bounded model broadcast →
      // (doc, lang)-grain partial-aggregated scoring; the training exchange
      // is ≤ nLangs·buckets rows at ANY k, so time must track data
      results(("langid_nb", k)) = timed("langid_nb", k, nd) {
        // synthetic 5-class labels: the replicated frame carries no lang
        // column, and label content is irrelevant to the scaling shape
        val labeled = d.withColumn("_lang",
          concat(lit("l"), pmod(col("doc_id"), lit(5)).cast("string")))
        graft.ops.TextAnalysis.langidNb(labeled, d, "text", "_lang",
          "doc_id", buckets = 1024).count()
      }
      // nLangs AXIS (r16 verdict #2): data FIXED at the base corpus,
      // classes = 4·k — the fused NbTrigramArgmax kernel walks the bytes
      // once regardless of nLangs, so doubling the class count adds only
      // contiguous long-adds; the time factor must sit far below the 2.0
      // the k axis nominally advertises (the pre-fusion per-class HOF
      // folds re-walked the trigram array per class interpreted, and
      // would track ~2.0 here)
      results(("langid_nb_nlangs", k)) = timed("langid_nb_nlangs", k, nDocs0) {
        val labeled = docs0.withColumn("_lang",
          concat(lit("l"), lpad(pmod(col("doc_id"), lit(4 * k)).cast("string"), 3, "0")))
        graft.ops.TextAnalysis.langidNb(labeled, docs0, "text", "_lang",
          "doc_id", buckets = 1024).count()
      }
      // docs ×k through unigram+bigram feature explode → bounded-model
      // broadcast join → id-grain sum; the train exchange is map-side
      // combined to ≤ 2·buckets rows per partition at ANY k
      results(("quality_nb", k)) = timed("quality_nb", k, nd) {
        val labeled = d.withColumn("_y", pmod(col("doc_id"), lit(2)) === 0)
        graft.ops.TextAnalysis.qualityNb(labeled, d, "text", "_y",
          "doc_id", buckets = 1024).count()
      }
      // docs ×k through the trigram stream: model tables live at n-gram
      // grain (vowel-rotated replicas have disjoint trigram vocabularies,
      // so the type tables also grow ×k) and every model join keys on
      // n-gram types — linear by construction, no broadcast anywhere
      results(("kn_logprob", k)) = timed("kn_logprob", k, nd) {
        graft.ops.Selection.knLogProb(d, "text", "doc_id").count()
      }
      // docs ×k through one per-row rolling-hash pass + posexplode —
      // scan-side, no shuffle; chunk count is content-proportional
      results(("cdc_chunks", k)) = timed("cdc_chunks", k, nd) {
        graft.ops.TextAnalysis.cdcChunks(d, "text", "doc_id",
          window = 8, maskBits = 5).count()
      }
      // docs ×k through chunker → 8-byte-hash keeper aggregate → id-grain
      // reassembly; vowel-rotated replicas share no chunks, so keeper
      // groups stay replica-local and the fold must track data linearly
      results(("cdc_dedup_apply", k)) = timed("cdc_dedup_apply", k, nd) {
        graft.ops.Dedup.dedupCdcChunks(d, "text", "doc_id",
          window = 8, maskBits = 5).count()
      }
      // docs ×k through the token explode → broadcast lexicon semi-join →
      // id-grain map-side-combined count; a 300-word lexicon must not
      // change the scan's per-token cost
      results(("blocklist", k)) = timed("blocklist", k, nd) {
        graft.ops.TextAnalysis.blocklistFilter(d, "text", "doc_id",
          (1 to 300).map(i => s"blk$i") ++ Seq("dup", "slow"),
          maxHits = 1L).count()
      }
      // r18: split-API KN with pruning — same join ladder as kn_logprob
      // but the trig grain is thresholded (replicas mint disjoint trigram
      // vocabularies, so the model tables still grow ×k); pruning must
      // not add a scaling term
      results(("kn_pruned", k)) = timed("kn_pruned", k, nd) {
        graft.ops.Selection.knScore(
          graft.ops.Selection.knTrain(d, "text", minCount = 2),
          d, "text", "doc_id").count()
      }
      // r18: per-group KN + perplexity terciles (the CCNet composition);
      // grouping on a synthetic 5-value doc_id-derived label isolates the GROUPED model +
      // histogram-tercile scaling from langid_nb (measured separately).
      // Groups are constant (5 langs) while every grain grows ×k; the
      // tercile pass is one (group, bucket) count collect + boundary-only
      // windows — nothing corpus-sized on one task
      results(("ccnet_buckets", k)) = timed("ccnet_buckets", k, nd) {
        val dl = d.select(col("doc_id"), col("text"),
          concat(lit("l"), pmod(col("doc_id"), lit(5)).cast("string"))
            .as("lang_pred"))
        val kn = graft.ops.Selection.knScore(
          graft.ops.Selection.knTrain(dl, "text", groupCols = Seq("lang_pred")),
          dl, "text", "doc_id", groupCols = Seq("lang_pred"))
          .localCheckpoint(false)
        graft.ops.Selection.pplTerciles(kn, "lang_pred", "doc_id",
          "avg_logprob", buckets = 64).count()
      }
      // r18: the lazy broadcast-model langid — docs ×k through the
      // trigram-bucket explode collapsed to (id, bucket, cnt), one
      // bounded broadcast join, (id, lang) sum, id-grain argmin; the
      // model build exchange stays ≤ nLangs·buckets rows at any k
      results(("langid_nb_lazy", k)) = timed("langid_nb_lazy", k, nd) {
        val labeled = d.withColumn("_lang",
          concat(lit("l"), pmod(col("doc_id"), lit(4)).cast("string")))
        graft.ops.TextAnalysis.langidNbLazy(labeled, d, "text", "_lang",
          "doc_id", buckets = 1024).count()
      }
      // r18: MaxSim late-interaction rerank — FIXED query count, corpus
      // ×k: the exact-cosine shortlist scan is the only growing term
      // (candidates stay 3×8, the O(|q|·|d|·dim) kernel runs on 24 pairs
      // at every k — bounded-candidate by construction)
      results(("maxsim_rerank", k)) = timed("maxsim_rerank", k, ne) {
        def mv(c: org.apache.spark.sql.Column) = array(
          slice(c, 1, 16), slice(c, 17, 16), slice(c, 33, 16), slice(c, 49, 16))
        val qs = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val cands = graft.ops.Knn.knnJoin(qs, "q_id", "qv",
          e, "vec_id", "embedding", k = 8).select(col("q_id"), col("vec_id"))
        graft.ops.Retrieval.maxSimRerank(cands,
          qs.select(col("q_id"), mv(col("qv")).as("qvecs")), "q_id", "qvecs",
          e.select(col("vec_id"), mv(col("embedding")).as("dvecs")),
          "vec_id", "dvecs", k = 4).count()
      }
      // r18: Aho–Corasick phrase blocklist — docs ×k through ONE automaton
      // pass (scan-side, zero shuffle); a 300-phrase lexicon rides as a
      // bounded reference object and must not add a per-doc scaling term
      results(("phrase_blocklist", k)) = timed("phrase_blocklist", k, nd) {
        graft.ops.TextAnalysis.phraseBlocklist(d, "text", "doc_id",
          (1 to 300).map(i => s"zz$i zz") ++ Seq("batch batch", "join order"),
          maxHits = 1L).count()
      }
      // r18: incremental KN — three doc-disjoint batches fold at TYPE
      // grain, then derive + score; the fold's union+re-sum is a type-grain
      // exchange (never doc-grain), so the whole path must track data
      // linearly like kn_logprob
      results(("kn_incremental", k)) = timed("kn_incremental", k, nd) {
        def sl(i: Int) = d.filter(pmod(col("doc_id"), lit(3)) === i)
        val types = Seq(sl(1), sl(2)).foldLeft(
          graft.ops.Selection.knTypes(sl(0), "text")) { (t, b) =>
          graft.ops.Selection.knUpdateTypes(t, b, "text")
        }
        graft.ops.Selection.knScore(graft.ops.Selection.knFromTypes(types),
          d, "text", "doc_id").count()
      }
      // r18: distributed LR — 8 GD iterations, each ONE map-side-combined
      // aggregate over the materialized feature table (d+1 doubles reach
      // the driver per iteration); docs ×k scales each aggregate linearly,
      // the iteration count stays constant
      results(("lr_quality", k)) = timed("lr_quality", k, nd) {
        val fc = Seq("f_bias", "f_dr", "f_sr", "f_ms")
        val at = graft.ops.TextAnalysis.docAttributes(d, "text", "doc_id")
          .select(col("doc_id"), lit(1.0).as("f_bias"),
            col("distinct_ratio").as("f_dr"), col("stop_ratio").as("f_sr"),
            col("max_tok_share").as("f_ms"),
            (col("max_tok_share") > lit(0.09)).cast("double").as("y"))
          .localCheckpoint(false)
        val w = graft.ops.Learn.lrTrain(at, fc, "y", iters = 8, lr = 1.0)
        graft.ops.Learn.lrScore(at, fc, w).count()
      }
      // r19: unigram tokenizer — ONE corpus pass to the word-frequency
      // table, hard-EM over the distinct-word grain (vowel rotation makes
      // each replica's words unique, so the word table grows ~linearly
      // with k), scan-side Viterbi for the final segmentation; the model
      // stays vocab-bounded at every k
      results(("unigram_tok", k)) = timed("unigram_tok", k, nd) {
        val m = graft.ops.Unigram.unigramTrain(d, "text",
          vocabSize = 48, maxPieceLen = 4, iters = 2)
        graft.ops.Unigram.unigramSegment(
          graft.ops.Unigram.unigramPrune(m, 1L), d, "text", "doc_id").count()
      }
      // r20: SOFT-EM over the VOCAB axis — corpus ×k (rotated replicas
      // mint new substrings, so a 256·k-piece seed actually fills: 1024
      // multi-char pieces at k=4, the non-toy rung) while the per-word
      // forward–backward DP is O(len·maxLen) hash probes INDEPENDENT of
      // vocab size; the factor must track the corpus scan + the bounded
      // vocab-grain seed TakeOrdered, never the vocab quadratically
      results(("unigram_em_vocab", k)) = timed("unigram_em_vocab", k, nd) {
        val m = graft.ops.Unigram.unigramTrainSoft(d, "text",
          vocabSize = 256 * k, maxPieceLen = 4, iters = 2)
        graft.ops.Unigram.unigramSegment(
          graft.ops.Unigram.unigramPruneToVocab(m, 128 * k), d,
          "text", "doc_id").count()
      }
      // r19: CCNet sampled-middle — one scan-side filter over the
      // bucketed frame (buckets synthesized here: the op's own cost is
      // the point, not the upstream trajectory's)
      results(("ccnet_sample", k)) = timed("ccnet_sample", k, nd) {
        val bucketed = d.select(col("doc_id"),
          element_at(typedLit(Seq("en", "zh", "es", "de", "fr")),
            (pmod(col("doc_id"), lit(5)) + 1).cast("int")).as("lang_pred"),
          when(pmod(col("doc_id"), lit(3)) === 0, "head")
            .when(pmod(col("doc_id"), lit(3)) === 1, "middle")
            .otherwise("tail").as("ppl_bucket"))
        graft.ops.Selection.ccnetSample(bucketed, "lang_pred", "doc_id",
          Map("en" -> 32, "zh" -> 48, "es" -> 16), defaultKeep64 = 8).count()
      }
    }
    // growth factors per doubling-pair of k values
    for (Seq(a, b) <- ks.sliding(2).toSeq; op <- results.keys.map(_._1).toSeq.distinct.sorted
         if !results((op, a)).isNaN && !results((op, b)).isNaN) {
      val f = results((op, b)) / math.max(results((op, a)), 1e-9)
      println(f"""{"op":"$op","k_from":$a,"k_to":$b,"data_ratio":${b.toDouble / a}%.1f,"time_factor":$f%.2f}""")
    }
    spark.stop()
  }
}
