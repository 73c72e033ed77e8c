package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the optimizations we rely on for 100 TB scale must
  * actually appear in the plan — a regression here is a performance bug
  * even when results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("langidNb scoring is zero-shuffle; blocklist is one aggregate exchange over a broadcast join") {
    import org.apache.spark.sql.functions._
    // the real parquet table: a Range source advertises distinct keys and
    // Catalyst elides the aggregate exchange entirely, which would make
    // both assertions vacuous
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    // scoring: after the bounded model collect, the returned frame must be
    // scan + projections only — no join, no exchange (the 100 TB contract:
    // classifying a corpus never shuffles it)
    val scored = graft.ops.TextAnalysis.langidNb(docs, docs, "text", "lang",
      "doc_id", buckets = 64)
    val sp = scored.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!sp.contains("Exchange"), s"scoring must not shuffle:\n$sp")
    // blocklist: the lexicon joins as a broadcast and the id-grain count
    // is the ONLY shuffle exchange
    val bl = graft.ops.TextAnalysis.blocklistFilter(docs, "text", "doc_id",
      (1 to 50).map(i => s"w$i"), maxHits = 0L)
    val bp = bl.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(bp.contains("BroadcastHashJoin"), bp.take(1500))
    val nx = "\\(\\d+\\) Exchange\\b".r.findAllIn(bp).size
    assert(nx == 1, s"expected exactly the aggregate exchange, got $nx:\n$bp")
  }

  test("qualityNb: bounded model broadcasts — the corpus is never sort-merge-joined") {
    import org.apache.spark.sql.functions._
    // parquet table, not a Range source (same vacuous-assert dodge as above)
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val scored = graft.ops.TextAnalysis.qualityNb(
      docs.withColumn("_y", pmod(col("doc_id"), lit(2)) === 0),
      docs, "text", "_y", "doc_id", buckets = 64)
    val p = scored.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the 2×buckets model reaches the feature stream as a broadcast; every
    // exchange left is a map-side-combined aggregate (train counts, priors,
    // id-grain score sum) — document bodies never shuffle
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join in qualityNb:\n$p")
  }

  test("filters and column pruning reach the parquet scan") {
    val p = plan("q_proj_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(o_orderstatus"), p)
    // only the 5 needed columns are read, not the whole orders schema
    assert(p.contains("o_orderkey") && !p.contains("o_orderdate"), p)
  }

  test("small dimension join is broadcast") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("large join is sort-merge (no broadcast of the fact side)") {
    val p = plan("q_join_smj")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("semi/anti joins plan as such") {
    val p = plan("q_join_semi_anti")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    val knn = plan("q_knn_cosine")
    assert(knn.contains("TakeOrderedAndProject"), knn)
  }

  test("aggregation is partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("custom vector expressions stay inside whole-stage codegen") {
    val df = SparkEntry.queries("q_knn_cosine")(spark, TestSpark.sf)
    df.collect()   // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage;
    // cosine_sim must sit inside one (no interpreted fallback in the plan)
    assert("""\*\(\d+\) Project \[.*cosine_sim""".r.findFirstIn(p).isDefined, p)
  }

  test("knn join pre-aggregates top-k per partition — no full-corpus exchange per query") {
    val p = plan("q_knn_join")
    // bounded TopKByScore: ObjectHashAggregate partial (map side, before the
    // exchange) + final — the shuffle carries ≤ k (score,id) rows per
    // (partition, query), never the scored corpus×queries product
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.toLowerCase.contains("partial_topkbyscore"), p)
    // and no window rank anywhere: a Window here would mean the whole
    // corpus lands in each query's single partition (the 100 TB OOM shape)
    assert(!p.contains("Window"), p)
  }

  test("dynamic partition pruning: dim filter prunes the partitioned fact scan at runtime") {
    val df = SparkEntry.queries("q_dpp_prune")(spark, TestSpark.sf)
    df.collect() // finalize the adaptive plan + populate scan metrics
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    // the fact scan must carry the runtime DynamicPruningExpression in its
    // PartitionFilters — the dim broadcast reused as the pruning IN-list
    assert(finalPlan.toString.toLowerCase.contains("dynamicpruningexpression"),
      finalPlan.toString)
    // AQE leaves are QueryStageExec wrappers — unwrap them (and nested
    // adaptive plans) manually; collectWithSubqueries stops at leaves
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case o => (o.children ++ o.subqueries).flatMap(scans)
    }
    val scan = scans(finalPlan)
      .filter(_.metadata.get("Location").exists(_.contains("orders_by_month")))
      .head
    // runtime evidence: partitions actually read < partitions in the layout
    val layoutDirs = new java.io.File(
        "/tmp/graft-layout/" +
          TestSpark.sf.replaceAll("[^A-Za-z0-9._-]", "_") + "/orders_by_month")
      .listFiles().count(_.getName.startsWith("o_month="))
    val read = scan.metrics("numPartitions").value
    assert(read == 12, s"expected the 12 months of 1996, read $read")
    assert(read < layoutDirs, s"no pruning: read $read of $layoutDirs")
  }

  test("misra-gries candidate pass partial-aggregates; tfidf top-k has no corpus window") {
    import org.apache.spark.sql.functions._
    // the MG sketch must plan as ObjectHashAggregate(partial) → Exchange →
    // final, so the exchange carries ≤ k counter maps per partition —
    // key-cardinality independence IS the operator's reason to exist
    val vals = spark.range(20000).select(
      concat(lit("v"), pmod(col("id"), lit(5000))).as("value"))
    val mg = new graft.functions.MisraGries(32).toColumn
    import spark.implicits._
    val p = vals.as[String].select(mg).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.toLowerCase.contains("partial_misragries"), p)
    // tfidf ranks inside a doc-grain collect+slice — a Window here would
    // concentrate the corpus into one task
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma w"), col("id")).as("text"))
    val tp = graft.ops.TextAnalysis.tfidfKeywords(docs, "text", "doc_id", 3)
      .queryExecution.optimizedPlan
    val hasWindow = tp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(!hasWindow, "tfidf top-k must not route through a window")
  }

  test("writePartitioned hot-partition guard: salted mode spreads a hot value over N files") {
    import org.apache.spark.sql.functions._
    // 10k rows of one HOT partition value + 10 cold values of 20 rows
    val hot = spark.range(10000).select(lit("hot").as("k"), col("id"))
    val cold = spark.range(200).select(
      concat(lit("c"), pmod(col("id"), lit(10))).as("k"), col("id"))
    val df = hot.unionByName(cold)
    def files(dir: String, v: String): Int =
      new java.io.File(s"$dir/k=$v").listFiles()
        .count(_.getName.endsWith(".parquet"))
    // default: one task → one file per value (the hot value serializes)
    val d1 = java.nio.file.Files.createTempDirectory("graft-wp1").toString
    graft.ops.Bucketing.writePartitioned(df, d1, "k")
    assert(files(d1, "hot") === 1)
    // salted: the hot value's write spreads over up to 4 tasks/files.
    // At test size AQE's partition coalescing folds the tiny salted
    // shards back into one task (the right behavior — small partitions
    // never fragment; at production bytes they exceed the advisory size
    // and stay spread), so pin the MECHANISM with coalescing off.
    val d4 = java.nio.file.Files.createTempDirectory("graft-wp4").toString
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      graft.ops.Bucketing.writePartitioned(df, d4, "k", filesPerPartition = 4)
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    assert(files(d4, "hot") >= 2 && files(d4, "hot") <= 4, files(d4, "hot"))
    (0 until 10).foreach(i => assert(files(d4, s"c$i") <= 4))
    // nothing lost or duplicated, and maxRecordsPerFile splits oversize files
    assert(spark.read.parquet(d4).count() === 10200)
    val dm = java.nio.file.Files.createTempDirectory("graft-wpm").toString
    graft.ops.Bucketing.writePartitioned(df, dm, "k",
      maxRecordsPerFile = 3000L)
    assert(files(dm, "hot") >= 4, files(dm, "hot")) // 10k rows / 3k cap
    assert(spark.read.parquet(dm).count() === 10200)
  }

  test("runtime bloom filter lands on the fact side below the shuffle") {
    val df = SparkEntry.queries("q_bloom_join")(spark, TestSpark.sf)
    val p = df.queryExecution.optimizedPlan.toString
    // the injected runtime filter: bloom built from the filtered dim side,
    // probed as might_contain(l_orderkey) on the fact side — row-level
    // runtime filtering, the DPP complement
    assert(p.contains("might_contain"), p)
    assert(p.contains("bloom_filter_agg"), p)
    // and it must actually shuffle (no broadcast): the bloom path's
    // production shape for joins too big to broadcast
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastHashJoin"), phys)
  }

  test("vector table time-bounded reads prune date_day partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vt-prune").toString
    val docs = Tables.documents(spark, TestSpark.sf).limit(20)
      .select(org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(0.1f)).as("passage_embedding"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("doc_id") % 2 === 0,
          org.apache.spark.sql.functions.lit("2024-01-01 00:00:00"))
          .otherwise(org.apache.spark.sql.functions.lit("2024-01-02 00:00:00"))
          .cast("timestamp").as("date"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("doc_id").cast("string").as("_id"))
    graft.sink.VectorTable.append(docs, dir)
    val q = graft.sink.VectorTable.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("date_day") === "2024-01-01")
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the date_day predicate must land in PartitionFilters (source pruning),
    // not a post-scan Filter — at 100 TB this is the difference between
    // reading one day and reading the table
    assert(p.contains("PartitionFilters: [isnotnull(date_day"), p)
    assert(q.count() === 10)
  }

  test("exact dedup aggregates hashes, not document bodies, across the shuffle") {
    val df = graft.ops.Dedup.exactDedup(
      Tables.documents(spark, TestSpark.sf), "text", "doc_id")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("LeftSemi"), p)      // bodies rejoin via semi join
    assert(p.contains("fnv64"), p)
  }

  test("rolling active users: interval-coverage equi-join — no nested loop anywhere") {
    val p = plan("q_rolling_active")
    // per-user runs close into coverage intervals that explode into
    // covered days and map-side count — and the spine is a broadcast LEFT
    // SEMI filter; the day-spine RANGE join this replaces planned as a
    // BroadcastNestedLoopJoin whose per-row work scales with the SPINE
    // (O(|daily|·|spine|) predicate evaluations — 500–3,600× the needed
    // comparisons on a multi-year deployment)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Generate"), p)          // the offsets explode
    assert(p.contains("LeftSemi"), p)          // broadcast spine filter
    assert(p.contains("BroadcastExchange"), p) // …with the spine as build side
    // raw events collapse to the (day, user) distinct grain before any join
    assert(p.contains("HashAggregate"), p)
  }

  test("incremental near-dup: delta bands broadcast against the base band scan") {
    val p = plan("q_incremental_neardup")
    // the base×delta candidate probe must be a broadcast hash join with the
    // (tiny, fresh) delta band table as build side — the base band table is
    // scanned, never shuffled, which is the whole point of the increment
    assert(p.contains("BroadcastHashJoin"), p)
    // the exact-Jaccard verify joins shingle sets back by candidate id
    // (two-pointer sorted-intersect kernel since r8)
    assert(p.contains("sorted_intersect_count"), p)
  }

  test("TPC-H shapes: dims broadcast (by hint), facts sort-merge, top-k bounded") {
    // at test sf EVERY table clears the auto-broadcast threshold; disable it
    // so the plan shows the scale shape — the EXPLICIT broadcast() hints on
    // the dimension sides must still win, the unhinted fact chain must not
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q3 = plan("q_tpch_q3")
      assert(q3.contains("BroadcastHashJoin"), q3)      // BUILDING customers (hint)
      assert(q3.contains("SortMergeJoin"), q3)          // orders ⋈ lineitem
      assert(q3.contains("TakeOrderedAndProject"), q3)  // top-10, no global sort
      assert(q3.contains("PushedFilters"), q3)          // date filters reach the scans
      val q5 = plan("q_tpch_q5")
      assert(q5.contains("BroadcastHashJoin"), q5)      // supplier/nation/region (hint)
      assert(q5.contains("SortMergeJoin"), q5)          // customer/orders/lineitem chain
      assert(!q5.contains("CartesianProduct"), q5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("new selection/retrieval ops keep their scale shapes") {
    // sampleKPerGroup: bounded top-k AGGREGATION, never a per-group window
    // sort (the group-skew OOM shape it exists to avoid)
    val sk = plan("q_sample_per_group")
    assert(sk.contains("ObjectHashAggregate"), sk)
    assert(!sk.contains("WindowExec") && !"\\(\\d+\\) Window\\n".r.findFirstIn(sk).isDefined, sk)
    // hardNegatives: the query set broadcasts (corpus never shuffles for
    // the join) and the top-k is the bounded partial aggregation
    val hn = plan("q_hard_negatives")
    assert(hn.contains("BroadcastNestedLoopJoin") || hn.contains("BroadcastHashJoin"), hn)
    assert(hn.contains("ObjectHashAggregate"), hn)
    // bm25Join: one hash exchange per phase — term-grain postings, query-
    // grain scores, plus the stats and query-term-distinct aggregates
    val bj = plan("q_bm25_join")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(bj).size
    assert(exchanges <= 4, s"bm25Join grew to $exchanges exchanges\n$bj")
  }

  test("Q20: lineitem scanned once — part prune below the agg, window not a second agg") {
    val q20 = plan("q_tpch_q20")
    // exactly ONE lineitem scan: the (partkey, suppkey) aggregate feeds
    // both the 50%-threshold comparison (via a window) and the qualifying
    // set — the naive two-consumer shape scanned and aggregated it twice
    val lineitemScans = "Location:[^\\n]*lineitem".r.findAllIn(q20).size
    assert(lineitemScans === 1, s"expected 1 lineitem scan, got $lineitemScans\n$q20")
    assert(q20.contains("Window"), q20)
    // the SMALL-part prune is a broadcast semi join below the aggregation
    assert(q20.contains("LeftSemi"), q20)
  }

  test("subquery shapes decorrelate: EXISTS → semi join, NOT EXISTS → anti join") {
    // the correlated EXISTS (Q4) and NOT EXISTS (Q22) must never plan as
    // per-row probes — at 100 TB a re-executed subquery per outer row is
    // the difference between one join and a million scans
    val q4 = plan("q_tpch_q4")
    assert(q4.contains("LeftSemi"), q4)
    // disable auto-broadcast so the anti join can't satisfy the broadcast
    // assertion by itself — the 1-row scalar-average side must broadcast
    // because of the EXPLICIT hint, and nothing may go cartesian
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q22 = plan("q_tpch_q22")
      assert(q22.contains("LeftAnti"), q22)
      assert(q22.contains("BroadcastNestedLoopJoin"), q22)
      assert(!q22.contains("CartesianProduct"), q22)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("full TPC-H suite shapes: residual disjunctions, outer-join ON pushdown, self-join anti residuals") {
    // Q6 is scan-only: every predicate must reach the parquet reader and no
    // join may appear at all
    val q6 = plan("q_tpch_q6")
    assert(q6.contains("PushedFilters"), q6)
    assert(q6.contains("GreaterThanOrEqual(l_shipdate") &&
      q6.contains("LessThan(l_quantity"), q6)
    assert(!q6.contains("Join"), q6)
    // Q19's OR-of-conjunctions must ride a single equi hash join (common
    // p_partkey = l_partkey extracted, disjunction as residual) — a
    // nested-loop product over lineitem × part is the 100 TB failure mode
    val q19 = plan("q_tpch_q19")
    assert(q19.contains("BroadcastHashJoin"), q19)
    assert(!q19.contains("CartesianProduct") && !q19.contains("BroadcastNestedLoopJoin"), q19)
    // Q13's ON-clause dimension filter must prune the orders scan without
    // turning the outer join inner
    val q13 = plan("q_tpch_q13")
    assert(q13.contains("LeftOuter"), q13)
    assert(q13.contains("Not(EqualTo(o_orderpriority"), q13)
    // Q21's EXISTS/NOT-EXISTS pair collapses to per-order SET logic: ONE
    // scan of lineitem (the r4 semi + anti decorrelation shuffled the fact
    // table three times), one orderkey aggregation, and no self-join of
    // the fact table anywhere in the plan
    val q21 = plan("q_tpch_q21")
    assert(q21.contains("collect_set"), q21)
    assert(!q21.contains("CartesianProduct"), q21)
    val q21lp = SparkEntry.queries("q_tpch_q21")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    val lineitemScans = q21lp.collectLeaves().count(
      _.output.exists(_.name == "l_orderkey"))
    assert(lineitemScans == 1,
      s"q21 must scan lineitem exactly once, found $lineitemScans scans")
    // Q2's target-part semi join must prune lineitem BELOW the
    // (partkey, suppkey) aggregation: the logical plan's Aggregate that
    // groups by BOTH keys must contain the LeftSemi join in its subtree
    // (string-index comparisons on the plan dump can't express this —
    // other aggregates/joins surround it)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val q2lp = SparkEntry.queries("q_tpch_q2")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    val psAggs = q2lp.collect {
      case a: Aggregate
        if a.groupingExpressions.size == 2 &&
          a.groupingExpressions.flatMap(_.references.map(_.name))
            .toSet == Set("l_partkey", "l_suppkey") => a
    }
    assert(psAggs.nonEmpty, q2lp.treeString)
    assert(psAggs.exists(_.find {
      case j: Join => j.joinType == LeftSemi
      case _ => false
    }.isDefined), "the (partkey, suppkey) aggregate must sit ABOVE the " +
      "target-part semi join:\n" + q2lp.treeString)
  }

  test("LLM-op shapes: passage chunking is shuffle-free, int8 probe is bounded") {
    // chunking = scan → generate → project: every document expands on its
    // own input partition; any Exchange here would mean the operator
    // reshuffles the corpus just to split strings
    val cp = plan("q_chunk_passages")
    assert(cp.contains("Generate"), cp)
    assert(!cp.contains("Exchange"), cp)
    // the quantized probe: one broadcast of the 1-row probe codes, a
    // TakeOrderedAndProject cap — and NO hash-partitioned shuffle of the
    // corpus (the scan streams straight into scoring)
    val i8 = plan("q_int8_knn")
    assert(i8.contains("TakeOrderedAndProject"), i8)
    assert(i8.contains("BroadcastExchange"), i8)
    // FormattedMode prints a shuffle as `Exchange (N)` with the
    // hashpartitioning expression on its own Arguments line — grep the
    // expression itself, never the juxtaposed "Exchange hashpartitioning"
    // (which can never appear and would make this assertion vacuous)
    assert(!i8.contains("hashpartitioning"), i8)
  }

  test("IVF-PQ probe prunes cells at the scan and scores codes, not vectors") {
    // the 16 centroid literals push the plan string past the default
    // truncation threshold, which would cut the markers this test greps for
    val before = spark.conf.get("spark.sql.debug.maxToStringFields")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try {
      val p = plan("q_ivfpq_knn")
      // cell pruning: projection collapse inlines the `_cell` argmin (the
      // nearest_centroid kernel) straight into the pre-shortlist Filter —
      // the IN test runs against the scan output
      assert(p.contains("nearest_centroid"), p.take(4000))
      // the shortlist ranking runs on the ADC kernel over PQ codes
      assert(p.contains("pq_adc"), p.take(4000))
      assert(p.contains("TakeOrderedAndProject"), p.take(4000))
    } finally spark.conf.set("spark.sql.debug.maxToStringFields", before)
  }

  test("decontamination broadcasts the holdout fingerprint — train side joins without a shuffle") {
    // force the scale shape: at test SF everything fits the broadcast
    // threshold, so disable auto-broadcast and check the EXPLICIT hint on
    // the holdout's shingle hashes still wins — at 100 TB this is the
    // difference between shipping 8-byte eval-set hashes to every executor
    // and shuffling the entire training corpus's shingles
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_decontaminate")
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
      assert(p.contains("fnv64"), p)   // membership tests 8-byte hashes, not text
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("embedding near-dup plans as banded LSH — no nested-loop product anywhere") {
    val p = plan("q_embedding_neardup")
    // the O(n²) exact variant planned a BroadcastNestedLoopJoin over the
    // `a.id < b.id` theta product; the registered LSH variant must not
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // candidate pairing comes from the band-hash bucket aggregation
    assert(p.contains("hyperplane_lsh"), p)
  }

  test("bucketed tables join with ZERO exchange — the recurring-join co-location layout") {
    import org.apache.spark.sql.functions.col
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    graft.ops.Bucketing.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    graft.ops.Bucketing.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)
    // at test sf the small side fits the broadcast threshold, which bypasses
    // bucketing entirely; at the layout's real scale both sides are big —
    // force the SMJ path the layout exists for
    val threshBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.ops.Bucketing.colocatedJoin(
        spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)   // co-located: no shuffle either side
      assert(p.contains("SelectedBucketsCount"), p)
      // and it computes the right thing
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshBefore)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("as-of join is join-free: one shuffle + sort + running window, no pair expansion") {
    val clicks = Tables.events(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = Tables.events(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id").as("purchase_id"))
    val p = graft.ops.AsOf.asofJoin(clicks, purchases, "user_id", "ts")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the merge formulation contains NO join operator at all — a range
    // theta-join here would expand every qualifying (click, purchase) pair
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    // At 100 TB a shuffle join whose build side is pre-filtered should not
    // scan+shuffle the whole fact side: Spark injects a bloom-filter
    // semi-filter (might_contain on the join key) into the fact scan. The
    // thresholds are tuned down because the test tables are tiny; the
    // optimization itself (and that our join shapes remain eligible for
    // it) is what this pins.
    import org.apache.spark.sql.functions.col
    val before = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, TestSpark.sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = Tables.lineitem(spark, TestSpark.sf)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("might_contain"), p)
      assert(p.contains("bloom_filter_agg"), p)
    } finally before.foreach { case (k, v) => spark.conf.set(k, v) }
  }
  test("round-8 analytics shapes: collapsed-grain windows, broadcast join-backs, no cartesian") {
    // pareto: the front joins BACK to the corpus as a broadcast hash join
    // (the front is |distinct minCol| rows), and the global-order window
    // runs on the collapsed grain — exactly one SinglePartition exchange
    val pareto = plan("q_pareto")
    assert(pareto.contains("BroadcastHashJoin"), pareto)
    assert(!pareto.contains("CartesianProduct"), pareto)
    assert("SinglePartition".r.findAllIn(pareto).size === 1, pareto)
    // auc / gini: the rank windows run on the distinct-score/value grain
    // AFTER a hash aggregate — one SinglePartition exchange each, and the
    // corpus-scale pass is the partial-aggregated groupBy, never a sort
    for (q <- Seq("q_auc", "q_gini")) {
      val p = plan(q)
      assert("SinglePartition".r.findAllIn(p).size === 1, s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // edit-distance join: candidates come from an equi-join (shuffle or
    // broadcast hash), and the only nested-loop is the bounded short-pool
    // broadcast — never a cartesian product
    val ej = plan("q_edit_join")
    assert(!ej.contains("CartesianProduct"), ej)
    // attribution: the (user, segment) windows EXTEND the user partition,
    // so the whole credit pipeline adds no exchange beyond the user grain
    // + the per-user conversion-count aggregate + the final channel rollup
    val attr = plan("q_attribution")
    assert(!attr.contains("CartesianProduct"), attr)
    assert("hashpartitioning".r.findAllIn(attr).size <= 4, attr)
  }

  test("round-9 shapes: PIT as-of collapse, interval equi-join, keyed quantile windows") {
    // point-in-time join must be the as-of MERGE plan: no join operator at
    // all on the probe path — union + one entity-grain window
    val pit = plan("q_pit_join")
    assert(!pit.contains("CartesianProduct") &&
      !pit.contains("BroadcastNestedLoopJoin"), pit)
    assert(!pit.contains("SortMergeJoin") && !pit.contains("BroadcastHashJoin"),
      "PIT must collapse to the join-free as-of merge:\n" + pit)
    assert(pit.contains("Window"), pit)
    // interval overlap join: bucketized EQUI-join, never a nested loop
    val ij = plan("q_interval_join")
    assert(!ij.contains("CartesianProduct") &&
      !ij.contains("BroadcastNestedLoopJoin"), ij)
    // grouped quantiles: both window functions and the final aggregate run
    // keyed — no SinglePartition exchange anywhere (the ntile trap)
    val gq = plan("q_grouped_quantiles")
    assert(!gq.contains("SinglePartition"), gq)
    // MAD outliers: two rank windows + artifact joins, all keyed; the
    // group-grain artifacts broadcast back, nothing cartesian
    val mad = plan("q_mad_outliers")
    assert(!mad.contains("CartesianProduct") && !mad.contains("SinglePartition"),
      mad)
    // cusum closed form: the fold is two window passes over the day spine
    // sharing the type partition — no collect_list aggregate in the plan
    val cu = plan("q_cusum")
    assert(!cu.contains("collect_list"), cu)
  }

  test("r19 ops: ccnetSample is a pure scan-side filter; unigramSegment pays ONE exchange and no join") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    // ccnetSample over an already-materialized bucketed frame: the rate
    // map is a literal, the coin a codegen expression — zero exchanges,
    // zero joins (the 100 TB contract: curation never shuffles the corpus)
    val bucketed = docs.select(col("doc_id"),
      coalesce(col("lang"), lit("und")).as("lang_pred"),
      when(pmod(col("doc_id"), lit(3)) === 0, "head")
        .when(pmod(col("doc_id"), lit(3)) === 1, "middle")
        .otherwise(lit("tail")).as("ppl_bucket"))
    val cs = graft.ops.Selection.ccnetSample(bucketed, "lang_pred", "doc_id",
      Map("en" -> 32, "zh" -> 48), defaultKeep64 = 8)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!cs.contains("Exchange") && !cs.contains("Join"),
      s"ccnetSample must be one scan-side filter:\n$cs")
    // unigramSegment under a driver-built model: the lattice rides as a
    // codegen reference object, so the plan is scan → generate → project →
    // ONE id-grain aggregate exchange; no join anywhere (the model is
    // never a join side)
    val model = graft.ops.Unigram.unigramTrain(docs.limit(50), "text",
      vocabSize = 8, maxPieceLen = 3, iters = 1)
    val seg = graft.ops.Unigram.unigramSegment(model, docs, "text", "doc_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!seg.contains("Join"), s"segment must not join the model:\n$seg")
    val nx = "\\(\\d+\\) Exchange\\b".r.findAllIn(seg).size
    assert(nx == 1, s"expected exactly the id-grain aggregate exchange, got $nx:\n$seg")
  }

}
