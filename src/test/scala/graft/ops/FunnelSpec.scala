package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two funnel plans are the same function: single-shuffle fold vs
  * segmented transition-mapping composition, including on a planted
  * hot-user tail where the segmented variant's buffers stay bounded. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def hist(df: org.apache.spark.sql.DataFrame) =
    Funnel.depthHistogram(df, "user_id", "ts", "event_id", "event_type", stages)
      .as[(Int, Long)].collect().sorted.toSeq

  private def segHist(df: org.apache.spark.sql.DataFrame) =
    Funnel.segmentedDepthHistogram(df, "user_id", "ts", "event_id", "event_type",
        stages, to_date(col("ts")))
      .as[(Int, Long)].collect().sorted.toSeq

  test("segmented == single-shuffle on a skewed corpus with a hot user") {
    // user 1: bot — 50k view events across 10 days, then one click and one
    // purchase on the last day (depth 3; the purchase only counts because
    // it follows the click, which follows a view). user 2: click before
    // any view (depth 1 — the early click can't count). user 3: only
    // heartbeats (depth 0, survives via the missing-user correction).
    // user 4: view then click, purchase BEFORE the click (depth 2).
    val bot = (0 until 50000).map { i =>
      (1L, f"2024-01-${1 + i % 10}%02dT00:${(i / 600) % 60}%02d:${(i / 10) % 60}%02d", i.toLong, "view")
    }
    val tail = Seq(
      (1L, "2024-01-10T23:59:58", 90001L, "click"),
      (1L, "2024-01-10T23:59:59", 90002L, "purchase"),
      (2L, "2024-01-01T00:00:00", 90003L, "click"),
      (2L, "2024-01-02T00:00:00", 90004L, "view"),
      (3L, "2024-01-01T00:00:00", 90005L, "heartbeat"),
      (4L, "2024-01-01T00:00:00", 90006L, "view"),
      (4L, "2024-01-02T00:00:00", 90007L, "purchase"),
      (4L, "2024-01-03T00:00:00", 90008L, "click"))
    val df = (bot ++ tail).toDF("user_id", "_t", "event_id", "event_type")
      .withColumn("ts", col("_t").cast("timestamp")).drop("_t")

    val expected = Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L))
    assert(hist(df) === expected)
    assert(segHist(df) === expected)
  }

  test("segmentation grain does not change the answer (associativity)") {
    val df = Seq(
      (1L, "2024-01-01T01:00:00", 1L, "view"),
      (1L, "2024-01-01T02:00:00", 2L, "click"),    // same day as the view
      (1L, "2024-01-02T00:00:00", 3L, "purchase"), // next day
      (2L, "2024-01-01T00:00:00", 4L, "view"))
      .toDF("user_id", "_t", "event_id", "event_type")
      .withColumn("ts", col("_t").cast("timestamp")).drop("_t")
    val byDay = segHist(df)
    val byHour = Funnel.segmentedDepthHistogram(df, "user_id", "ts", "event_id",
        "event_type", stages, date_trunc("hour", col("ts")))
      .as[(Int, Long)].collect().sorted.toSeq
    assert(byDay === hist(df))
    assert(byHour === byDay)
  }

  test("transition matrix: hand-checked counts and per-source probabilities") {
    val ev = Seq(
      // user 1: v -> c -> v -> p ; user 2: v -> v
      (1L, 1000L, 1L, "v"), (1L, 2000L, 2L, "c"),
      (1L, 3000L, 3L, "v"), (1L, 4000L, 4L, "p"),
      (2L, 1000L, 5L, "v"), (2L, 2000L, 6L, "v")
    ).toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(t * 1000)"))
    val got = Funnel.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // src v: v->c 1, v->p 1, v->v 1 (p = 1/3 each); src c: c->v 1 (p=1)
    assert(got.keySet === Set(("v", "c"), ("v", "p"), ("v", "v"), ("c", "v")))
    assert(got(("v", "c")) === ((1L, 0.333333)))
    assert(got(("v", "v")) === ((1L, 0.333333)))
    assert(got(("c", "v")) === ((1L, 1.0)))
    // cross-user pairs must NOT appear (user 1's last p never chains into
    // user 2's first v) — implied by the keyset assertion above
  }

  test("timeToConvert: first-view → first-purchase-after, pre-view purchases ignored") {
    val ev = Seq(
      // user 1: view at 100s, purchases at 90s (BEFORE view — ignored) and 110s
      (1L, 100L, 1L, "view"), (1L, 90L, 2L, "purchase"), (1L, 110L, 3L, "purchase"),
      // user 2: two views (first wins), purchase 30s after the FIRST view
      (2L, 200L, 4L, "view"), (2L, 220L, 5L, "view"), (2L, 230L, 6L, "purchase"),
      // user 3: never purchases; user 4: purchase only (no view) — both absent
      (3L, 300L, 7L, "view"), (4L, 400L, 8L, "purchase")
    ).toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)"))
    val got = Funnel.timeToConvert(ev, "user_id", "ts", "event_type",
      "view", "purchase")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 10.0, 2L -> 30.0))
  }

  test("rolling active users: trailing-window distinct with cross-day repeats") {
    // user 1 active days 1+2 (counted ONCE per window), user 2 day 1,
    // user 3 days 3 and 10 — day 10's trailing week sees only user 3
    val ev = Seq(
      (1L, "2024-01-01", 1L, "view"), (1L, "2024-01-02", 2L, "view"),
      (1L, "2024-01-01", 3L, "view"),                      // same user+day dup
      (2L, "2024-01-01", 4L, "view"),
      (3L, "2024-01-03", 5L, "view"), (3L, "2024-01-10", 6L, "view")
    ).toDF("user_id", "_d", "event_id", "event_type")
      .withColumn("ts", col("_d").cast("timestamp")).drop("_d")
    val got = Funnel.rollingActiveUsers(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => d.toString -> n }
    assert(got.toSeq === Seq(
      "2024-01-01" -> 2L,   // users 1, 2
      "2024-01-02" -> 2L,   // users 1 (once), 2 from day 1
      "2024-01-03" -> 3L,   // users 1, 2, 3
      "2024-01-10" -> 1L))  // only user 3's day-10 activity is in window
    // windowDays = 1 degenerates to plain DAU
    val dau = Funnel.rollingActiveUsers(ev, "user_id", "ts", windowDays = 1)
      .orderBy("day").as[(java.sql.Date, Long)].collect().map(_._2).toSeq
    assert(dau === Seq(2L, 1L, 1L, 1L))
  }

  test("rollingActiveSketches: per-day window union ≡ exact counts ≡ single-build sketch") {
    // 40 users spread over 10 days with heavy cross-day repeats; at this
    // cardinality the lgK=12 sketch is in sparse mode, so BOTH the
    // window-union path and a direct single-build sketch over each
    // window's users must be EXACT — pinning register-losslessness of the
    // union without relying on estimator internals
    val ev = (0 until 200).map { i =>
      (i % 40L, f"2024-02-${i % 10 + 1}%02d", i.toLong, "view")
    }.toDF("user_id", "_d", "event_id", "event_type")
      .withColumn("ts", col("_d").cast("timestamp")).drop("_d")
    val est = Funnel.rollingActiveSketches(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => d.toString -> n }
    val exact = Funnel.rollingActiveUsers(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => d.toString -> n }
    assert(est.toSeq === exact.toSeq)
    // single-build reference: one sketch built directly over each trailing
    // window's user stream (no per-day intermediate, no union)
    val daily = ev.select(to_date(col("ts")).as("_day"), col("user_id").as("_u"))
      .distinct()
    val direct = daily
      .select(explode(expr("sequence(_day, date_add(_day, 6))")).as("day"),
        col("_u"))
      .join(daily.select(col("_day").as("day")).distinct(), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("_u"), lit(12))).as("n"))
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect().map { case (d, n) => d.toString -> n }
    assert(est.toSeq === direct.toSeq)
  }

  test("topPaths: gap splits sessions, paths order chronologically, cut is deterministic") {
    // user 1: two sessions (gap > 30 min between event 2 and 3);
    // user 2: one session matching user 1's first path — so "v>c" counts 2
    val gap = 1800000000L
    val ev = Seq(
      (1L, 0L, 1L, "v"), (1L, 60L, 2L, "c"),          // session A: v>c
      (1L, 7200L, 3L, "p"),                           // session B (2h later): p
      (2L, 0L, 4L, "v"), (2L, 30L, 5L, "c"),          // session: v>c
      (3L, 0L, 7L, "v"), (3L, 0L, 6L, "c")            // same ts: event_id orders c>v
    ).toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)"))
    val got = Funnel.topPaths(ev, "user_id", "ts", "event_id", "event_type",
      gapMicros = gap, n = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("v>c", 2L), ("c>v", 1L), ("p", 1L)))
    // maxEvents truncates to the session PREFIX — the bot-session skew
    // guard: user 1's first session becomes just "v" and merges with
    // nothing; user 2's "v>c" stays intact only if under the cap
    val capped = Funnel.topPaths(ev, "user_id", "ts", "event_id", "event_type",
      gapMicros = gap, n = 10, maxEvents = 1)
      .as[(String, Long)].collect().toSeq
    assert(capped === Seq(("v", 2L), ("c", 1L), ("p", 1L)))
    // a bounded cut keeps the most frequent first, path tie-break ascending
    val top1 = Funnel.topPaths(ev, "user_id", "ts", "event_id", "event_type",
      gapMicros = gap, n = 1).as[(String, Long)].collect().toSeq
    assert(top1 === Seq(("v>c", 2L)))
    // plan: ONE user-grain exchange serves window + session counter + path
    // agg; the cut is TakeOrderedAndProject, never a global Sort. n must
    // be < input maxRows or EliminateLimits drops the Limit (the bm25
    // plan-test lesson), so assert at n = 2 on the 7-row input
    val plan = Funnel.topPaths(ev, "user_id", "ts", "event_id", "event_type",
      gapMicros = gap, n = 2).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userExchanges >= 1, plan)
  }

  test("ts ties break on the tiebreaker column, matching the staged-mins oracle order") {
    // two events at the identical timestamp: event_id order decides whether
    // the click follows the view
    val df = Seq(
      (1L, "2024-01-01T00:00:00", 2L, "click"),
      (1L, "2024-01-01T00:00:00", 1L, "view"))
      .toDF("user_id", "_t", "event_id", "event_type")
      .withColumn("ts", col("_t").cast("timestamp")).drop("_t")
    assert(hist(df) === Seq((2, 1L)))
    assert(segHist(df) === Seq((2, 1L)))
  }

  test("dailyAnomalies flags a planted spike, skips warm-up and calendar gaps") {
    // type "a": days 1..8 have 10 events each, day 9 has 40 (spike),
    // day 10 back to 10 but its trailing window CONTAINS the spike so
    // variance explodes → not flagged. days 1..7 (and day 8, whose
    // 7-day lookback needs day 1..7 but the first flaggable day is the
    // 8th) — only days with a FULL 7-row, 7-calendar-day history emit.
    // type "b": constant 5/day → flat history, zero variance, never
    // flagged. type "c": has a calendar GAP (day 5 missing) → first
    // emitted day must wait until 7 consecutive days follow the gap.
    val rows = (1 to 8).flatMap(d => (0 until 10).map(i => (f"2024-01-$d%02dT01:00:$i%02d", "a", 1L))) ++
      (0 until 40).map(i => (f"2024-01-09T01:${i / 60}%02d:${i % 60}%02d", "a", 1L)) ++
      (0 until 10).map(i => (f"2024-01-10T01:00:$i%02d", "a", 1L)) ++
      (1 to 10).flatMap(d => (0 until 5).map(i => (f"2024-01-$d%02dT02:00:$i%02d", "b", 1L))) ++
      (1 to 10).filter(_ != 5).flatMap(d => (0 until 3).map(i => (f"2024-01-$d%02dT03:00:$i%02d", "c", 1L)))
    val ev = rows.toDF("_t", "event_type", "user_id")
      .withColumn("ts", col("_t").cast("timestamp")).drop("_t")
    val out = Funnel.dailyAnomalies(ev, "ts", "event_type", lookbackDays = 7,
        zThreshold = 3)
      .select(col("day").cast("string"), col("event_type"), col("n_events"),
        col("is_anomaly"), col("direction"))
      .as[(String, String, Long, Boolean, String)].collect().toSeq.sorted
    val a = out.filter(_._2 == "a")
    // type a emits days 8, 9, 10; only day 9 is a spike
    assert(a.map(r => (r._1, r._4, r._5)) === Seq(
      ("2024-01-08", false, "none"),
      ("2024-01-09", true, "spike"),
      ("2024-01-10", false, "none")))
    // flat history never flags (zero variance, zero deviation)
    val b = out.filter(_._2 == "b")
    assert(b.nonEmpty && b.forall(r => !r._4 && r._5 == "none"))
    // the gap day resets type c's warm-up: windows spanning the missing
    // day 5 are rejected, and 7 consecutive days never accumulate before
    // the corpus ends → no c rows at all
    assert(!out.exists(_._2 == "c"))
  }
  test("scd2: runs collapse to versions, ties break on event_id, current version open") {
    val df = Seq(
      (1L, "a", "2024-01-01 00:00:01", 1L),
      (1L, "a", "2024-01-01 00:00:02", 2L),
      (1L, "b", "2024-01-01 00:00:03", 3L),
      (1L, "a", "2024-01-01 00:00:04", 4L),
      // same-timestamp burst: order must come from event_id
      (2L, "y", "2024-01-01 00:00:10", 11L),
      (2L, "x", "2024-01-01 00:00:10", 10L),
      (2L, "y", "2024-01-01 00:00:10", 12L)
    ).toDF("user_id", "event_type", "ts_s", "event_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val got = Funnel.scd2History(df, "user_id", "event_type", "ts", "event_id")
      .select($"user_id", $"event_type",
        date_format($"valid_from", "ss").as("f"),
        date_format($"valid_to", "ss").as("t"), $"version")
      .as[(Long, String, String, String, Int)].collect().toSet
    assert(got === Set(
      (1L, "a", "01", "03", 1), (1L, "b", "03", "04", 2), (1L, "a", "04", null, 3),
      (2L, "x", "10", "10", 1), (2L, "y", "10", null, 2)))
  }

  test("scd2: both windows and the change filter share ONE exchange") {
    val df = Seq((1L, "a", "2024-01-01 00:00:01", 1L))
      .toDF("user_id", "event_type", "ts_s", "event_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val plan = Funnel.scd2History(df, "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("ewma: integer fold matches the hand computation, singletons pass through") {
    val df = Seq(
      (1L, 1.0, "2024-01-01 00:00:01", 1L),
      (1L, 2.0, "2024-01-01 00:00:02", 2L),
      (1L, 3.0, "2024-01-01 00:00:03", 3L),
      (2L, 5.17, "2024-01-01 00:00:01", 4L)
    ).toDF("user_id", "value", "ts_s", "event_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val got = Funnel.ewmaHalf(df, "user_id", "value", "ts", "event_id")
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, e) => u -> ((n, e)) }.toMap
    // s = 100 -> (100+200)/2 = 150 -> (150+300)/2 = 225
    assert(got(1L) === ((3L, 2.25)))
    assert(got(2L) === ((1L, 5.17)))
  }

  test("ewma: signed values fold with FLOOR division, matching Math.floorDiv replay") {
    // refund-shaped stream: the fold must floor (shiftright), not
    // truncate toward zero — (-3 + 0)/2 is -2 floored, -1 truncated
    val rnd = new scala.util.Random(7)
    val vals = Seq(-0.03, 0.0, -5.25, 2.0, -1.01) ++
      (1 to 40).map(_ => rnd.nextInt(2001) / 100.0 - 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, v, i.toLong, i.toLong) }
      .toDF("user_id", "value", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.ewmaHalf(df, "user_id", "value", "ts", "event_id")
      .as[(Long, Long, Double)].collect().head
    val scaled = vals.map(v => Math.round(v * 100))
    val expect = scaled.tail.foldLeft(scaled.head)((a, x) => Math.floorDiv(a + x, 2L))
    assert(got === ((1L, vals.size.toLong, expect.toDouble / 100)))
  }

  test("time-weighted avg: holding periods weight values, chatty idle does not dominate") {
    // sensor: value 100 held for 1s, then 0 held for 9s, then last event
    // (no holding) -> TWA = (100*1 + 0*9) / 10 = 10.0; plain avg = 40
    val df = Seq((1L, 100.0, 0L, 1L), (1L, 0.0, 1L, 2L), (1L, 20.0, 10L, 3L),
      (2L, 5.0, 0L, 4L))  // single event -> zero span -> dropped
      .toDF("user_id", "value", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.timeWeightedAvg(df, "user_id", "ts", "value", "event_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 3L, 10000000L, 10.0)))
  }

  test("theil-sen: one corrupted day cannot move the median slope; single pair exact") {
    // days 0..4, daily sums 1,2,3,4 then a 100 outlier: 6 of 10 pairwise
    // slopes are exactly 1 -> median 1.0 (OLS would report ~19)
    val df = (0 until 5).map { i =>
      (1L + i, "a", 86400L * i, if (i == 4) 100.0 else 1.0 + i)
    }.toDF("event_id", "event_type", "t", "value")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.theilSenSlopes(df, "ts", "event_type", "value")
      .as[(String, Long, Long, Double)].collect().head
    assert(got === (("a", 5L, 10L, 1.0)))
    // two days -> ONE pair: lo and hi are the same row, median = its slope
    // (the doubled-median must count it twice, not halve it)
    val two = Seq((1L, "b", 0L, 3.0), (2L, "b", 86400L, 8.0))
      .toDF("event_id", "event_type", "t", "value")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val g2 = Funnel.theilSenSlopes(two, "ts", "event_type", "value")
      .as[(String, Long, Long, Double)].collect().head
    assert(g2 === (("b", 2L, 1L, 5.0)))
  }

  test("seasonal decomposition: planted weekly spike separates into seasonal, residual 0") {
    // 21 contiguous days, one event/day: value 14 on day-of-cycle 0
    // (datediff-epoch % 7), else 7. Centered MA(7) = exactly 8 for every
    // full window; detrended = +6 / −1; per-cycle means equal those, so
    // residuals vanish. Edge days (first/last 3) carry no trend.
    val df = (0 until 21).map { i =>
      (1L + i, "a", 86400L * i, if (i % 7 == 0) 14.0 else 7.0)
    }.toDF("event_id", "event_type", "t", "value")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.seasonalDecompose(df, "event_type", "ts", "value")
      .orderBy($"d")
      .as[(String, java.sql.Date, Double, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(got.length === 21)
    assert(got.take(3).forall(r => r._4.isEmpty && r._5.isEmpty && r._6.isEmpty))
    assert(got.takeRight(3).forall(_._4.isEmpty))
    val mid = got.slice(3, 18)
    assert(mid.forall(r => r._4 === Some(8.0) && r._6 === Some(0.0)))
    assert(got(7) === (("a", java.sql.Date.valueOf("1970-01-08"), 14.0,
      Some(8.0), Some(6.0), Some(0.0))))
    assert(got(8)._5 === Some(-1.0))
    // a GAP voids the window: drop day 10 — days 7..13 lose their full
    // contiguous window, day 10±3 spans 7 calendar days only when intact
    val gappy = df.filter($"event_id" =!= 11L)
    val g2 = Funnel.seasonalDecompose(gappy, "event_type", "ts", "value")
      .where($"trend".isNotNull).select($"d")
      .as[java.sql.Date].collect().map(_.toString).toSet
    assert(!g2.contains("1970-01-08") && !g2.contains("1970-01-14") &&
      g2.contains("1970-01-15"))
  }

  test("snapshotDiff: all four classes, null-safe change detection") {
    val a = Seq((1L, Some("x"), Some(1.0)), (2L, Some("y"), Some(2.0)),
      (3L, Option.empty[String], Some(3.0)), (4L, Some("z"), Some(4.0)))
      .toDF("k", "st", "price")
    val b = Seq((1L, Some("x"), Some(1.0)),          // unchanged
      (2L, Some("y"), Some(9.0)),                    // changed (value)
      (3L, Some("w"), Some(3.0)),                    // changed (null -> value)
      (5L, Some("n"), Option.empty[Double]))         // added (with a null col)
      .toDF("k", "st", "price")                      // 4 removed
    val got = Funnel.snapshotDiff(a, b, "k", Seq("st", "price"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // the emitted columns come from the NEW snapshot (old's for removed)
    val rows = Funnel.snapshotDiff(a, b, "k", Seq("st", "price"))
      .as[(Long, String, Option[String], Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(rows(2L) === ((Some("y"), Some(9.0))))
    assert(rows(4L) === ((Some("z"), Some(4.0))))
  }

  test("snapshotDiff: value→null change reports the NEW null, not the stale old value") {
    // k=1: price 7.0 -> null (changed); the payload must carry the NEW
    // null — a coalesce() would resurrect 7.0 and corrupt the documented
    // `added ∪ changed → scd2Merge` feed (r9 ADVICE). k=2: st "x" -> null
    // with price unchanged — same rule on a string column.
    val a = Seq((1L, Some("a"), Some(7.0)), (2L, Some("x"), Some(1.0)))
      .toDF("k", "st", "price")
    val b = Seq((1L, Some("a"), Option.empty[Double]),
      (2L, Option.empty[String], Some(1.0)))
      .toDF("k", "st", "price")
    val rows = Funnel.snapshotDiff(a, b, "k", Seq("st", "price"))
      .as[(Long, String, Option[String], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) === (("changed", Some("a"), None)))
    assert(rows(2L) === (("changed", None, Some(1.0))))
  }

  test("point-in-time join: active version at edges, zero-length versions never match") {
    // user 1: attr a@10, b@20, a@30 (open). Probes: t=10 (a v1, inclusive
    // left edge), t=19 (a v1), t=20 (b v2 — left edge of next), t=99 (a v3)
    // user 2: two changes at the SAME ts (a@10/b@10 by tie) -> version 1
    // is zero-length and must never be the active match
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "b", 10L, 5L))
      .toDF("user_id", "attr", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val hist = Funnel.scd2History(ev, "user_id", "attr", "ts", "event_id")
    val probes = Seq((1L, 10L, 101L), (1L, 19L, 102L), (1L, 20L, 103L),
      (1L, 99L, 104L), (2L, 10L, 105L), (1L, 5L, 106L))
      .toDF("user_id", "t", "probe_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.pointInTimeJoin(probes, hist, "user_id", "ts", "attr")
      .select($"probe_id", $"active_attr", $"version")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      101L -> (("a", 1)), 102L -> (("a", 1)), 103L -> (("b", 2)),
      104L -> (("a", 3)), 105L -> (("b", 2))))
    // probe 106 (before any version) dropped by inner semantics
    assert(!got.contains(106L))
  }

  test("cusum: planted level shift matches a hand fold, both sides flag") {
    // one event per (day, count) unit: day d gets x_d events of type 'a'
    val xs = Seq(10, 10, 10, 10, 10, 20, 20, 20, 20, 20)
    val rows = for {
      (x, di) <- xs.zipWithIndex
      j <- 0 until x
    } yield (1L, "a", f"2024-01-${di + 1}%02d 12:00:00", (di * 100 + j).toLong)
    val df = rows.toDF("user_id", "event_type", "ts_s", "event_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val got = Funnel.cusumChangepoints(df, "ts", "event_type",
        driftK = 2, thresholdH = 10)
      .orderBy("day")
      .select($"n_events", $"s_pos", $"s_neg", $"is_change")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    // hand fold: n=10, total=150; sp += 10x-170, sn += 130-10x, floor 0
    var sp = 0L; var sn = 0L
    val want = xs.map { x =>
      sp = math.max(0L, sp + 10L * x - 150 - 2 * 10)
      sn = math.max(0L, sn - 10L * x + 150 - 2 * 10)
      (x.toLong, sp / 10.0, sn / 10.0, sp > 100 || sn > 100)
    }
    assert(got === want)
    assert(got.count(_._4) === 4) // days 4,5 (dip side) and 9,10 (spike side)
  }

  test("ab test: planted uplift flips significance exactly at the z boundary") {
    // arm0 = even users, arm1 = odd. 100 users/arm; arm0 converts 50,
    // arm1 converts 26: D=24*100? -> z^2 = 100*D^2*T / (38416-scale...)
    // decided in integers; this split is significant at 1.96 while
    // 50 vs 37 is not (z = 1.86)
    def events(conv0: Int, conv1: Int) = {
      val rows = (0 until 200).map { u =>
        val converts = if (u % 2 == 0) u / 2 < conv0 else u / 2 < conv1
        (u.toLong, if (converts) "purchase" else "view")
      }
      rows.toDF("user_id", "event_type")
    }
    def sig(conv0: Int, conv1: Int) =
      Funnel.abTestConversion(events(conv0, conv1), "user_id", "event_type",
          "purchase")
        .select($"significant", $"direction")
        .as[(Boolean, String)].collect().head
    assert(sig(50, 26) === ((true, "arm0")))
    assert(sig(26, 50) === ((true, "arm1")))
    assert(sig(50, 37) === ((false, "none")))
    // degenerate: nobody converts / everybody converts -> never significant
    assert(sig(0, 0) === ((false, "none")))
    assert(sig(100, 100) === ((false, "none")))
  }

  test("scd2 merge: incremental ≡ batch recompute on random split streams") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      // null is a legal attribute VALUE (null-safe run compare in
      // scd2History) — the merge must not confuse it with row absence, so
      // ~1/4 of attrs are null, including entities whose very first delta
      // run is null and entities the history has never seen
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(8).toLong,
          Seq("a", "b", "c", null)(rnd.nextInt(4)).asInstanceOf[String],
          i.toLong, i.toLong)
      }
      def df(xs: Seq[(Long, String, Long, Long)]) =
        xs.toDF("user_id", "attr", "t", "event_id")
          .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
      val (old, delta) = rows.splitAt(200)
      def rowsOf(d: org.apache.spark.sql.DataFrame) = d
        .select($"user_id", $"attr",
          date_format($"valid_from", "HH:mm:ss").as("f"),
          date_format($"valid_to", "HH:mm:ss").as("t"), $"version")
        .as[(Long, String, String, String, Int)].collect().toSet
      val batch = Funnel.scd2History(df(rows), "user_id", "attr", "ts", "event_id")
      val incr = Funnel.scd2Merge(
        Funnel.scd2History(df(old), "user_id", "attr", "ts", "event_id"),
        df(delta), "user_id", "attr", "ts", "event_id")
      assert(rowsOf(incr) === rowsOf(batch), s"trial=$trial")
    }
    // edge (the null-sentinel traps, pinned deterministically): a NEW
    // entity whose first delta run has a null attr keeps its version-1
    // row, and an existing entity whose delta starts with a null-attr
    // run closes the open row — exactly one open version each
    locally {
      val oldN = Seq((Some(1L), Option("a"), 1L, 1L))
      val delN = Seq((Some(1L), Option.empty[String], 5L, 5L),
        (Some(2L), Option.empty[String], 6L, 6L))
      def dfo(xs: Seq[(Option[Long], Option[String], Long, Long)]) =
        xs.toDF("user_id", "attr", "t", "event_id")
          .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
      val batchN = Funnel.scd2History(dfo(oldN ++ delN),
        "user_id", "attr", "ts", "event_id")
      val incrN = Funnel.scd2Merge(
        Funnel.scd2History(dfo(oldN), "user_id", "attr", "ts", "event_id"),
        dfo(delN), "user_id", "attr", "ts", "event_id")
      def setOf(d: org.apache.spark.sql.DataFrame) = d
        .select($"user_id", $"attr", $"valid_to".isNull.as("open"), $"version")
        .as[(Long, Option[String], Boolean, Int)].collect().toSet
      assert(setOf(incrN) === setOf(batchN))
      assert(setOf(incrN).count(r => r._1 == 1L && r._3) === 1)
      assert(setOf(incrN).exists(r => r._1 == 2L && r._2.isEmpty && r._4 == 1))
    }

    // edge: delta contains only entities the history has never seen
    val h = Funnel.scd2History(
      Seq((1L, "a", 1L, 1L)).toDF("user_id", "attr", "t", "event_id")
        .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t"),
      "user_id", "attr", "ts", "event_id")
    val d2 = Seq((2L, "b", 5L, 5L)).toDF("user_id", "attr", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val m = Funnel.scd2Merge(h, d2, "user_id", "attr", "ts", "event_id")
      .select($"user_id", $"attr", $"version")
      .as[(Long, String, Int)].collect().toSet
    assert(m === Set((1L, "a", 1), (2L, "b", 1)))
  }

  test("attribution: hand-checked credit under all three models") {
    // user 1: view, click, PURCHASE, view, PURCHASE, click (trailing
    //         click unattributed)
    //   conv1 touches: view(1), click(2) -> first=view last=click
    //     linear: view 0.5, click 0.5
    //   conv2 touches: view(4) alone -> first=last=view, linear 1.0
    // user 2: click, view, click, PURCHASE
    //   touches click,view,click -> first=click last=click
    //     linear: 3 touches -> 0.333333+0.333333+0.333334 (remainder last)
    //     = click 0.666667, view 0.333333
    // user 3: view only, never converts -> nothing
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (1L, 5L, "purchase"), (1L, 6L, "click"),
      (2L, 1L, "click"), (2L, 2L, "view"), (2L, 3L, "click"), (2L, 4L, "purchase"),
      (3L, 1L, "view")
    ).map { case (u, t, et) => (u, t, t, et) }
      .toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.attribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // firsts: conv1 view, conv2 view, user2 click; lasts: click, view, click
    assert(got === Map(
      "view" -> ((2L, 1L, 1.833333)),   // 0.5 + 1.0 + 0.333333
      "click" -> ((1L, 2L, 1.166667)))) // 0.5 + 0.666667 (incl remainder)
  }

  test("attributionDecay: recency dominates, credits sum to exactly one per conversion") {
    // user 1: view 3 days before, click 1 day before, purchase.
    // weights: view b=3 -> 2^27, click b=1 -> 2^29; T = 2^27 + 2^29
    // view = floor(1e6 * 2^27 / T) = floor(1e6/5) = 200000 -> 0.2
    // click (last) = 1e6 - 200000 = 800000 -> 0.8
    val day = 86400L
    val ev = Seq(
      (1L, "view", 0L, 1L), (1L, "click", 2 * day, 2L),
      (1L, "purchase", 3 * day, 3L),
      // user 2: two same-bucket touches (both < 1 half-life old) split
      // evenly, remainder to last
      (2L, "a", day - 10, 4L), (2L, "b", day - 5, 5L), (2L, "purchase", day, 6L))
      .toDF("user_id", "event_type", "t", "event_id")
      .withColumn("ts", expr("timestamp_micros(t * 1000000)")).drop("t")
    val got = Funnel.attributionDecay(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", halfLifeUs = day * 1000000L)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("view") === ((1L, 0.2)))
    assert(got("click") === ((1L, 0.8)))
    assert(got("a") === ((1L, 0.5)) && got("b") === ((1L, 0.5)))
    // total credit across channels = number of conversions exactly
    assert(math.abs(got.values.map(_._2).sum - 2.0) < 1e-9)
  }

  test("trend: planted linear series recovers the exact slope; single-day types drop") {
    // type 'up': counts 2,4,6,8 on days 0..3 -> slope exactly 2
    // type 'noisy': 5,1,5 -> slope 0 (symmetric) -> 'flat'
    // type 'once': one day only -> undefined, omitted
    val rows =
      (for (d <- 0 to 3; j <- 0 until 2 * (d + 1)) yield ("up", d, j)) ++
      (for ((c, d) <- Seq(5, 1, 5).zipWithIndex; j <- 0 until c) yield ("noisy", d, j)) ++
      Seq(("once", 0, 0))
    val ev = rows.zipWithIndex.map { case ((t, d, _), i) => (t, d.toLong, i.toLong) }
      .toDF("event_type", "d", "event_id")
      .withColumn("ts", expr("timestamp_micros(d * 86400000000)")).drop("d")
    val got = Funnel.trendSlopes(ev, "ts", "event_type")
      .as[(String, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "up" -> ((4L, 2.0, "rising")),
      "noisy" -> ((3L, 0.0, "flat"))))
  }

  test("cohort ltv: cent-exact cumulative values over the cohort grid") {
    // cohort W0: users 1,2 (first events in week 0); user 1 returns in
    // week 1. cohort W1: user 3.
    val ev = Seq(
      (1L, 0L, 10.10), (2L, 1L, 5.25),      // week 0, cohort W0
      (1L, 8L, 2.40),                        // week 1 activity, cohort W0
      (3L, 7L, 7.77)                         // cohort W1
    ).zipWithIndex.map { case ((u, d, v), i) => (u, d, v, i.toLong) }
      .toDF("user_id", "d", "value", "event_id")
      // day 0 = Monday 2024-01-01, so weeks align with date_trunc
      .withColumn("ts",
        expr("timestamp_micros((19723 + d) * 86400000000)")).drop("d")
    val got = Funnel.cohortLtv(ev, "user_id", "ts", "value")
      .select($"cohort_week".cast("string"), $"age_weeks", $"cohort_users",
        $"n_active", $"week_value", $"cum_value")
      .as[(String, Int, Long, Long, Double, Double)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L, 2L, 15.35, 15.35),
      ("2024-01-01", 1, 2L, 1L, 2.40, 17.75),
      ("2024-01-08", 0, 1L, 1L, 7.77, 7.77)))
  }

  test("calibration: perfectly calibrated buckets read their own rate, Brier exact") {
    // bucket 0.2: 5 rows p=0.2, one positive -> obs 0.2 == mean_pred
    // bucket 0.8: 5 rows p=0.8, four positive -> obs 0.8
    val rows = (Seq.fill(4)((200000L, false)) :+ ((200000L, true))) ++
      (Seq.fill(4)((800000L, true)) :+ ((800000L, false)))
    val df = rows.toDF("p_micro", "y")
    val got = Funnel.calibration(df, "p_micro", "y", nBuckets = 10)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(2) === ((5L, 0.2, 0.2, 0.16)))   // (0.2-0)^2*4/5 + (0.2-1)^2/5
    assert(got(8) === ((5L, 0.8, 0.8, 0.16)))
    assert(got(-1)._1 === 10L)
    assert(got(-1)._4 === 0.16)                 // overall Brier
    // p = 1.0 lands in the TOP bucket (the least() cap), out-of-range drops
    val edge = Seq((1000000L, true), (-5L, true), (2000000L, false))
      .toDF("p_micro", "y")
    val e = Funnel.calibration(edge, "p_micro", "y", 10)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(e === Map(9 -> 1L, -1 -> 1L))
  }

  test("mannKendall: monotone series, ties replay, constant flat, single day") {
    def mk(counts: Seq[(String, Int)]): Map[String, (Long, Long, Double, String)] = {
      // counts = (type, events-on-day-i) in day order; expand to events
      val rows = counts.zipWithIndex.flatMap { case ((t, c), i) =>
        Seq.fill(c)((t, f"2024-01-${i + 1}%02d 10:00:00"))
      }
      Funnel.mannKendall(
        rows.toDF("event_type", "tss")
          .select(col("event_type"), col("tss").cast("timestamp").as("ts")),
        "ts", "event_type")
        .as[(String, Long, Long, Double, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    // strictly increasing daily volume 1..6: S = 15 pairs all +1
    // var = 6*5*17/18 - ties(all t=1 -> 0) = 28.333; z = 14/sqrt(28.333)
    val up = mk((1 to 6).map(c => ("a", c)))("a")
    assert(up._1 === 6L && up._2 === 15L)
    assert(math.abs(up._3 - 14.0 / math.sqrt(6.0 * 5 * 17 / 18.0)) < 1e-6)
    assert(up._4 === "rising")
    // strictly decreasing mirrors negative
    val dn = mk((1 to 6).map(c => ("d", 7 - c)))("d")
    assert(dn._2 === -15L && dn._4 === "falling")
    assert(math.abs(dn._3 + up._3) < 1e-9)
    // constant volume: all sign pairs 0 -> S = 0, z = 0 (covers Var = 0)
    val fl = mk(Seq.fill(4)(("f", 3)))("f")
    assert(fl === ((4L, 0L, 0.0, "flat")))
    // tied replay: volumes 1,2,2,3 -> S = 5 (pairs: +1*5, 0 for the tie)
    // ties: t=2 for value 2 -> tt = 2*1*9 = 18
    // var = (4*3*13 - 18)/18 = 7.6667; z = 4/sqrt(7.6667) = 1.4446 -> flat
    val tied = mk(Seq(("t", 1), ("t", 2), ("t", 2), ("t", 3)))("t")
    assert(tied._2 === 5L)
    assert(math.abs(tied._3 - 4.0 / math.sqrt((4.0 * 3 * 13 - 18) / 18.0)) < 1e-6)
    assert(tied._4 === "flat")
    // a type seen on a single day: no pairs, S = 0, flat
    val solo = mk(Seq(("s", 2)))("s")
    assert(solo === ((1L, 0L, 0.0, "flat")))
  }

  test("logRank: identical curves chi2 ~ 0, separated curves significant, replay") {
    def lr(rows: Seq[(Int, Long, Boolean)])
        : (Long, Long, Long, Double, Option[Double], Option[Boolean]) =
      Funnel.logRank(rows.toDF("g", "t", "dd"), "g", "t", "dd")
        .as[(Long, Long, Long, Double, Option[Double], Option[Boolean])]
        .collect().head
    // identical span/death structure in both groups -> O = E, chi2 = 0
    val same = (1 to 20).flatMap(i => Seq((0, i.toLong % 5, i % 3 == 0),
      (1, i.toLong % 5, i % 3 == 0)))
    val gs = lr(same)
    assert(gs._1 === 20L && gs._2 === 20L)
    assert(gs._5.get === 0.0 && gs._6 === Some(false))
    // group 0 all dies at t=1, group 1 survives (censored) far out
    val sep = Seq.fill(10)((0, 1L, true)) ++ Seq.fill(10)((1, 9L, false))
    val gsep = lr(sep)
    assert(gsep._3 === 10L && gsep._5.get > 3.841 && gsep._6 === Some(true))
    // hand replay on a small mixed case (micro-exact E and V terms)
    val rows = Seq((0, 1L, true), (0, 2L, true), (0, 3L, false),
      (1, 1L, false), (1, 2L, true), (1, 3L, true))
    val got = lr(rows)
    // pooled death times: t=1 (d=1: g0), t=2 (d=2: one each), t=3 (d=1: g1)
    // t=1: na=3, n=6; t=2: na=2, n=4; t=3: na=1, n=2
    def em(d: Long, na: Long, n: Long): Long =
      math.round(d.toDouble * na / n * 1e6)
    def vm(d: Long, na: Long, n: Long): Long =
      math.round(d.toDouble * (na.toDouble / n) * ((n - na).toDouble / n)
        * ((n - d).toDouble / (n - 1)) * 1e6)
    val e = em(1, 3, 6) + em(2, 2, 4) + em(1, 1, 2)
    val v = vm(1, 3, 6) + vm(2, 2, 4) + vm(1, 1, 2)
    val oa = 2.0
    val chi = (oa - e / 1e6) * (oa - e / 1e6) / (v / 1e6)
    assert(got._3 === 2L)
    assert(got._4 === math.round(e / 1e6 * 1e6) / 1e6)
    assert(math.abs(got._5.get - chi) < 1e-5, s"${got._5} vs $chi")
    // exactly two groups required
    intercept[IllegalArgumentException] {
      Funnel.logRank(Seq((0, 1L, true), (1, 1L, true), (2, 1L, true))
        .toDF("g", "t", "dd"), "g", "t", "dd").collect()
    }
  }

  test("cupedAdjust: perfect covariate collapses arms, effect preserved, degenerate") {
    def cuped(rows: Seq[(Int, Long, Long)]): Map[Int, (Long, Double, Double, Double, Double)] =
      Funnel.cupedAdjust(rows.toDF("arm", "x", "y"), "arm", "x", "y",
          scale = 1L)
        .as[(Int, Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // y = 2x exactly: theta = 2, rho2 = 1, and BOTH arms' adjusted means
    // collapse to 2*pooled-mean — all between-arm difference was
    // pre-existing covariate imbalance
    val perfect = cuped(Seq((0, 1L, 2L), (0, 2L, 4L), (1, 5L, 10L), (1, 6L, 12L)))
    assert(perfect(0)._4 === 2.0 && perfect(0)._5 === 1.0)
    val pooledMean2 = 2.0 * (1 + 2 + 5 + 6) / 4.0
    assert(perfect(0)._3 === pooledMean2 && perfect(1)._3 === pooledMean2)
    assert(perfect(0)._2 === 3.0 && perfect(1)._2 === 11.0) // raw means differ
    // treatment effect orthogonal to the covariate survives adjustment:
    // symmetric x across arms, arm1 y = x + 10 -> adj diff exactly 10
    val eff = cuped(Seq((0, 1L, 1L), (0, 3L, 3L), (1, 1L, 11L), (1, 3L, 13L)))
    assert(eff(1)._3 - eff(0)._3 === 10.0)
    assert(eff(1)._2 - eff(0)._2 === 10.0)
    // zero pre-period variance -> theta = 0, CUPED is a no-op
    val deg = cuped(Seq((0, 7L, 1L), (0, 7L, 3L), (1, 7L, 5L)))
    assert(deg(0)._4 === 0.0 && deg(0)._5 === 0.0)
    assert(deg(0)._3 === deg(0)._2 && deg(1)._3 === deg(1)._2)
    // nulls excluded
    val withNull = Seq((Some(0), Some(1L), Some(2L)), (None, Some(1L), Some(2L)),
      (Some(1), None, Some(2L))).toDF("arm", "x", "y")
    assert(Funnel.cupedAdjust(withNull, "arm", "x", "y", 1L).count() === 1)
  }

  test("kaplanMeier: hand curve, censoring leaves risk set silently, S=0 edge") {
    def ev(rows: (Long, Int, Int)*): org.apache.spark.sql.DataFrame =
      rows.flatMap { case (u, f, l) => Seq((u, f), (u, l)) }
        .map { case (u, day) => (u, f"2024-01-${day}%02d 12:00:00") }
        .toDF("user_id", "tss")
        .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    def mic(x: Double): Long = math.round(math.log(x) * 1e6)
    def s(cum: Long): Double = math.round(math.exp(cum / 1e6) * 1e6) / 1e6
    // corpus max = day 28; censor cutoff day 21. spans: u1 1d(dead),
    // u2 2d(censored, last 27), u3 3d(dead), u4 3d(dead),
    // u5 5d(censored, last 28)
    val km = Funnel.kaplanMeier(
      ev((1L, 2, 3), (2L, 25, 27), (3L, 10, 13), (4L, 15, 18), (5L, 23, 28)),
      "ts", "user_id", censorDays = 7)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    // t=1: n=5 d=1 -> S=0.8; t=3: risk {u3,u4,u5}=3, d=2 -> S=0.8*(1/3)
    assert(km.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1, 5L, 1L), (3, 3L, 2L)))
    assert(km(0)._4 === s(mic(4.0 / 5)))
    assert(km(1)._4 === s(mic(4.0 / 5) + mic(1.0 / 3)))
    // counting censored users as churned (the naive dashboard) would have
    // put u2 in the deaths — here it only shrinks the t=3 risk set
    assert(km(1)._2 === 3L)
    // everyone dead, all remaining die at the last time -> S hits exactly 0
    val all = Funnel.kaplanMeier(
      ev((1L, 1, 2), (2L, 1, 3), (3L, 1, 3)), "ts", "user_id",
      censorDays = 0)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(all.map(r => (r._1, r._2, r._3, r._4)).toSeq ===
      Seq((1, 3L, 1L, s(mic(2.0 / 3))), (2, 2L, 2L, 0.0)))
    // single-event users have span 0 and enter the risk set at t=0
    val z = Funnel.kaplanMeier(
      ev((1L, 1, 1), (2L, 2, 20)), "ts", "user_id", censorDays = 7)
      .as[(Int, Long, Long, Double)].collect()
    assert(z.map(r => (r._1, r._2, r._3)).toSeq === Seq((0, 2L, 1L)))
  }

  test("auc: hand pair-counting with ties, perfect and inverted separation") {
    def auc(rows: Seq[(Long, Boolean)]) =
      Funnel.aucScoreVsLabel(rows.toDF("score", "label"), "score", "label")
        .as[(Long, Long, Double)].collect().toSeq
    // pos {3,2} vs neg {1,2}: pairs 3>1, 3>2, 2>1 full + tie 2=2 half
    // -> 3.5/4 = 0.875
    assert(auc(Seq((3L, true), (2L, true), (1L, false), (2L, false))) ===
      Seq((2L, 2L, 0.875)))
    assert(auc(Seq((9L, true), (8L, true), (1L, false))) === Seq((2L, 1L, 1.0)))
    assert(auc(Seq((1L, true), (8L, false), (9L, false))) === Seq((1L, 2L, 0.0)))
    // all ties -> exactly 0.5
    assert(auc(Seq((5L, true), (5L, false), (5L, false))) === Seq((1L, 2L, 0.5)))
    // degenerate single-class -> empty
    assert(auc(Seq((1L, true), (2L, true))).isEmpty)
  }

  test("aucByGroup: per-group equals ungrouped per slice, single-class dropped") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      val label = rnd.nextBoolean()
      val score = (rnd.nextInt(30) + (if (label) i % 3 * 4 else 0)).toLong
      (g, score, label)
    }
    val got = Funnel.aucByGroup(rows.toDF("g", "score", "label"),
        "g", "score", "label")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = rows.filter(_._1 == g).map(r => (r._2, r._3))
      val exp = Funnel.aucScoreVsLabel(slice.toDF("score", "label"),
          "score", "label")
        .as[(Long, Long, Double)].collect().head
      assert(got(g) === ((exp._1, exp._2, exp._3)), s"group $g")
    }
    // a single-class group is dropped; the others survive
    val mixed = rows ++ Seq.fill(5)(("onlypos", 9L, true))
    val m = Funnel.aucByGroup(mixed.toDF("g", "score", "label"),
        "g", "score", "label")
      .as[(String, Long, Long, Double)].collect().map(_._1).toSet
    assert(m === Set("g0", "g1", "g2"))
  }

}
