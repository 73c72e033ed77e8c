package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis (ordered event-sequence matching): how deep does each
  * user get through stage 1 → stage 2 → … → stage n, with later stages
  * only counting AFTER earlier ones — a per-user state machine where the
  * only legal transition is acc → acc+1 on seeing the (acc+1)-th stage
  * event.
  *
  * Two exact implementations of the same semantics, different memory
  * envelopes:
  *
  *  - [[depthHistogram]] (single-shuffle): collect + sort + HOF fold per
  *    user. Events are pre-filtered to the funnel stage types BEFORE the
  *    collect — semantically identical (non-stage events never advance the
  *    state machine) but the aggregation buffer holds funnel events only,
  *    so a bot with 10⁸ heartbeat events costs nothing. A bot with 10⁸
  *    *view* events still concentrates in one buffer — that adversarial
  *    tail is what [[segmentedDepthHistogram]] is for.
  *
  *  - [[segmentedDepthHistogram]] (bounded-buffer): the fold is
  *    associative once each time segment is summarized as a state-
  *    transition MAPPING (exit state per entry state, an (n+1)-vector) —
  *    function composition is associative even though the event fold
  *    itself is order-sensitive. Stage 1 folds each (user, segment)'s
  *    sorted events from every possible entry state; stage 2 composes the
  *    per-segment mappings in segment order. Buffers are bounded by
  *    events-per-(user, segment) and segments-per-user — pick the segment
  *    grain (day, hour) so both fit; no single-user buffer ever holds the
  *    full history. Two shuffles instead of one: the price of skew
  *    immunity, paid only when the tail calls for it.
  *
  * Users whose events are ALL outside the stage types have depth 0 but
  * fall out of the filtered groupBy; both entry points add them back via
  * two count-distinct scalars (a broadcast-friendly 1-row correction, not
  * a second shuffle of the fact table).
  */
object Funnel {

  /** Stage index per event: 1-based position in `stages`, 0 if absent. */
  private def stageIdx(et: Column, stages: Seq[String]): Column =
    stages.zipWithIndex.foldLeft(lit(0)) { case (acc, (st, i)) =>
      when(et === st, i + 1).otherwise(acc)
    }

  /** One state-machine step: advance iff this event is the next stage. */
  private def step(acc: Column, x: Column): Column =
    when(x === acc + 1, acc + 1).otherwise(acc)

  /** (depth-histogram of funnel users) ∪ (depth-0 row for users with no
    * stage-typed events), summed and zero-row-pruned so the result matches
    * a plain per-user GROUP BY over the unfiltered events. */
  private def withMissingUsers(depths: DataFrame, all: DataFrame,
                               funnelOnly: DataFrame, userCol: String): DataFrame = {
    val hist = depths.groupBy(col("funnel_depth"))
      .agg(count(lit(1)).as("n_users"))
    val missing = all.agg(countDistinct(col(userCol)).as("_n")).crossJoin(
        funnelOnly.agg(countDistinct(col(userCol)).as("_nf")))
      .select(lit(0).cast("int").as("funnel_depth"),
        (col("_n") - col("_nf")).as("n_users"))
    hist.unionByName(missing)
      .groupBy(col("funnel_depth"))
      .agg(sum(col("n_users")).as("n_users"))
      .filter(col("n_users") > 0)
  }

  /** Single-shuffle funnel: per-user sorted-event fold at user grain.
    * Result: (funnel_depth INT, n_users LONG), one row per non-empty
    * depth. Sort order within a user is (ts, tie) — pass a unique
    * tiebreaker so the fold order is deterministic under ts ties. */
  def depthHistogram(events: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, typeCol: String,
                     stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val fevs = events.filter(col(typeCol).isin(stages.map(x => x: Any): _*))
    val depths = fevs
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tieCol).as("tie"),
        stageIdx(col(typeCol), stages).as("st")))).as("evs"))
      .select(aggregate(col("evs"), lit(0), (acc, e) => step(acc, e("st")))
        .cast("int").as("funnel_depth"))
    withMissingUsers(depths, events, fevs, userCol)
  }

  /** Bounded-buffer funnel: fold each (user, segment) into a transition
    * mapping, then compose mappings in segment order. Exact — same result
    * as [[depthHistogram]] for any segmentation, because composition of
    * the per-segment transition functions is associative. `segment` must
    * be orderable and chronologically consistent with `tsCol` (e.g.
    * `to_date(ts)`). */
  def segmentedDepthHistogram(events: DataFrame, userCol: String, tsCol: String,
                              tieCol: String, typeCol: String,
                              stages: Seq[String], segment: Column): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.size
    val fevs = events.filter(col(typeCol).isin(stages.map(x => x: Any): _*))
    val perSegment = fevs
      .groupBy(col(userCol), segment.as("_seg"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tieCol).as("tie"),
        stageIdx(col(typeCol), stages).as("st")))).as("evs"))
      // exit state from every possible entry state: the segment's whole
      // event list collapses to an (n+1)-int mapping before the second
      // shuffle — the wire carries vectors, not events
      .select(col(userCol), col("_seg"),
        array((0 to n).map(e =>
          aggregate(col("evs"), lit(e), (acc, ev) => step(acc, ev("st")))): _*)
          .as("_m"))
    val depths = perSegment
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("_seg").as("g"), col("_m").as("m"))))
        .as("segs"))
      .select(aggregate(col("segs"), lit(0),
          (acc, sgm) => element_at(sgm("m"), acc + 1))
        .cast("int").as("funnel_depth"))
    withMissingUsers(depths, events, fevs, userCol)
  }

  /** First-order Markov transition matrix over per-user event sequences —
    * the "what happens after X" companion to the funnel (which fixes the
    * stage order up front): for every consecutive (src → dst) pair in a
    * user's chronological stream, the count and the per-src transition
    * probability. Output: (src, dst, n, p), p = n / Σ_dst n rounded
    * through integer micro-units (the cross-engine half-case discipline).
    *
    * Scale shape: one shuffle at user grain for the lead() window (the
    * sessionize shape — a user's events sort within one task), then the
    * pair counting aggregates map-side into a \|types\|² table; the
    * per-src total is a window over that tiny table, not a second pass. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    events
      .select(col(userCol), col(typeCol).as("src"),
        lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") * lit(1e6) / sum(col("n")).over(wSrc))
          .cast("long").cast("double") / lit(1e6))
  }

  /** Per-user conversion latency: seconds from each user's FIRST
    * `fromType` event to their FIRST `toType` event at-or-after it
    * (users who never convert are absent). Output:
    * (userCol, convert_s DOUBLE — exact micros ÷ 10⁶).
    *
    * Scale shape: two user-grain aggregations share one exchange — the
    * first-`from` aggregate and the first-`to`-after-it aggregate both
    * group by user (the second's keys extend the first join's
    * partitioning), and only (user, 2 timestamps) rows ever shuffle;
    * events are pre-filtered to the two types at the scan. Feed the
    * result to `percentile`/histograms for the latency distribution — the
    * registered query does exactly that. */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String,
                    fromType: String, toType: String): DataFrame = {
    val typed = events
      .filter(col(typeCol).isin(fromType, toType))
      .select(col(userCol), col(tsCol), col(typeCol))
    val firstFrom = typed.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_from"))
    typed.filter(col(typeCol) === toType)
      .join(firstFrom, Seq(userCol))
      .filter(col(tsCol) >= col("_from"))
      .groupBy(col(userCol), col("_from"))
      .agg(min(col(tsCol)).as("_to"))
      .select(col(userCol),
        ((unix_micros(col("_to")) - unix_micros(col("_from")))
          .cast("double") / lit(1e6)).as("convert_s"))
  }

  /** Rolling active users — distinct users in the trailing `windowDays`
    * window ending each active day (windowDays = 1 → DAU, 7 → WAU, 30 →
    * MAU on a daily grain). Output: (day DATE, active_users LONG).
    *
    * Scale shape — per-user coverage INTERVALS, so every aggregation is
    * codegen'd and nothing re-shuffles after the user grain: the corpus
    * collapses to the distinct (day, user) grain (map-side combined, the
    * only pass over raw events), a user-grain window marks a new RUN
    * wherever the gap to the previous active day exceeds `windowDays`
    * (overlapping/abutting visibility windows fuse — gaps-and-islands),
    * runs close into [first, last+windowDays−1] intervals on the same
    * exchange (grouping keys extend the window partitioning), and the
    * intervals explode into covered days that partial-aggregate into
    * per-day counts in the SAME stage — a plain `count`, since interval
    * coverage already deduplicated per user. The broadcast LEFT SEMI
    * against the (tiny) active-day spine keeps only days with same-day
    * activity, the output-grain contract. Rejected shapes, in order: the
    * day-spine RANGE join (plans as BroadcastNestedLoopJoin —
    * O(\|daily\|·\|spine\|) predicate evaluations, 500–3,600× the needed
    * comparisons on a multi-year spine); exploding (day, user) into
    * window-end days and `countDistinct` (the dedup re-shuffles
    * windowDays·\|daily\| rows — measured 2.4× single-node DuckDB at 8×
    * data, because a user's days land in different partitions of the
    * distinct-grain exchange); collect_set day arrays per user (one
    * exchange, but ObjectHashAggregate drops off codegen — measured 1.7×
    * at the same 8×). A windowed `sum` cannot express rolling DISTINCT
    * at all (users repeat across days). Null `userCol` rows are ignored.
    * At extreme scale [[rollingActiveSketches]] trades exactness for a
    * per-day HLL union over the same spine. */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be ≥ 1: $windowDays")
    val W = org.apache.spark.sql.expressions.Window
    val daily = events
      .filter(col(userCol).isNotNull)
      .select(to_date(col(tsCol)).as("_day"), col(userCol).as("_u"))
      .distinct()
    val spine = daily.select(col("_day").as("day")).distinct()
    val byUser = W.partitionBy(col("_u")).orderBy(col("_day"))
    // new run iff this day's window no longer overlaps/abuts the previous
    // day's: gap > windowDays (first row: lag is null → 0 → run 0)
    daily
      .withColumn("_new",
        when(datediff(col("_day"), lag(col("_day"), 1).over(byUser)) > windowDays,
          1).otherwise(0))
      .withColumn("_run", sum(col("_new"))
        .over(byUser.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col("_u"), col("_run"))
      .agg(min(col("_day")).as("_s"), max(col("_day")).as("_e"))
      .select(explode(sequence(col("_s"),
        date_add(col("_e"), windowDays - 1))).as("day"))
      .join(broadcast(spine), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Sketch-family rolling actives — the extreme-scale variant of
    * [[rollingActiveUsers]]: ONE mergeable HLL sketch per active day (the
    * standing per-slice artifact, built by
    * [[graft.ops.CorpusStats.distinctSketches]] on the day slice), then a
    * trailing-window UNION per window-end day. The corpus is scanned once
    * to build the per-day sketches and never again — the rolling pass
    * works on \|spine\| sketch rows, O(\|spine\|·windowDays·2^lgK), versus
    * the exact shape's \|daily\|·windowDays row explosion; on a standing
    * pipeline the per-day sketches append as days close, so yesterday's
    * curve never recomputes. Each day's sketch explodes to the
    * `windowDays` window-end days it is visible to (an equi-keyed
    * Generate — correct here because sketch UNION, unlike user counting,
    * cannot fuse overlapping windows into intervals) and a broadcast
    * left-semi spine filter keeps only active end-days. HLL union is
    * register-lossless at equal lgK; the estimate
    * carries the lgK error envelope (±1.6 % std at lgK=12) instead of
    * exactness — the documented trade. Output: (day DATE, active_est
    * LONG). */
  def rollingActiveSketches(events: DataFrame, userCol: String, tsCol: String,
                            windowDays: Int, lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be ≥ 1: $windowDays")
    val perDay = CorpusStats.distinctSketches(
      events.select(to_date(col(tsCol)).as("_day"), col(userCol).as("_u")),
      "_u", "_day", lgK)
    val spine = perDay.select(col("_day").as("day"))
    perDay
      .select(explode(sequence(col("_day"),
        date_add(col("_day"), windowDays - 1))).as("day"), col("sketch"))
      .join(broadcast(spine), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("active_est"))
  }

  /** Top-n most frequent session PATHS — the whole-journey companion to
    * [[transitionMatrix]] (which sees only consecutive pairs): sessionize
    * by inactivity gap, render each session's chronological event-type
    * sequence as one `a>b>c` path string, count identical paths
    * corpus-wide, keep the n most common (count DESC, path ASC — the
    * deterministic cut).
    *
    * Scale shape: ONE user-grain shuffle does all the session work — the
    * gap window, the running session counter, the in-session row_number
    * AND the per-(user, session) path aggregation all have keys extending
    * the user partition, so EnsureRequirements plans them on a single
    * exchange; paths then aggregate map-side into a distinct-path-bounded
    * table and the cut is `TakeOrderedAndProject`, never a global sort.
    * Tie order inside a session is (ts, tieCol) — exact.
    *
    * `maxEvents` is the skew guard: sessions longer than `maxEvents`
    * contribute their PREFIX path (first `maxEvents` events) — filtered by
    * in-session row_number BEFORE the aggregation, so a bot whose "session"
    * never hits the gap (10⁸ heartbeats) costs a bounded buffer and a
    * bounded path string instead of a 10⁸-struct collect. The truncation
    * is the analysis semantics, not an approximation: journeys are only
    * readable to some depth anyway, and both engines apply the same cut. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, typeCol: String,
               gapMicros: Long, n: Int, maxEvents: Int = 64): DataFrame = {
    require(gapMicros > 0, s"gap must be positive: $gapMicros")
    require(n > 0, s"n must be positive: $n")
    require(maxEvents > 0, s"maxEvents must be positive: $maxEvents")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val marked = events.select(col(userCol), col(tsCol), col(tieCol), col(typeCol),
      when(lag(col(tsCol), 1).over(w).isNull ||
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) > gapMicros,
        1).otherwise(0).as("_new"))
    val sess = marked.withColumn("_sid",
      sum(col("_new")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    sess
      .withColumn("_rn", row_number().over(
        W.partitionBy(col(userCol), col("_sid")).orderBy(col(tsCol), col(tieCol))))
      .filter(col("_rn") <= maxEvents)
      .groupBy(col(userCol), col("_sid"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col(tsCol), col(tieCol), col(typeCol)))),
        e => e.getField(typeCol)), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(n)
  }

  /** Trailing-window z-score anomaly flags on the daily event volume per
    * event type — the monitoring query a standing ingest pipeline runs
    * every morning: is today's count more than `zThreshold` sample
    * standard deviations from the trailing `lookbackDays`-day mean?
    * Output: (day DATE, event_type, n_events LONG, trailing_mean DOUBLE,
    * is_anomaly BOOLEAN, direction 'spike'|'dip'|'none'), one row per
    * (type, day) that has a FULL lookback history (the first
    * `lookbackDays` days per type are warm-up and emit nothing — a
    * partial window would make the flag depend on where the data starts).
    *
    * Exactness: the z-test is decided in INTEGER arithmetic so the
    * boolean is reproducible bit-for-bit on any engine — no engine-order
    * floating-point sums anywhere near the decision. With x the day's
    * count, m = lookbackDays, S/SS the trailing sum and sum-of-squares,
    * z² > t² ⟺ (x·m − S)²·(m−1) > t²·(m·SS − S²)·m — every factor a
    * DECIMAL(38,0)-exact integer (headroom: daily counts to ~10¹², m to
    * ~10³ stay under 10³⁸). `zThreshold` is an Int for the same reason.
    * Degenerate flat history (variance 0): any deviation is flagged, an
    * infinite-z convention both engines share. `trailing_mean` (S/m,
    * rounded to 1e-6) is one integer division — IEEE-identical
    * cross-engine.
    *
    * Scale shape: the corpus collapses to the (day, type) grain in ONE
    * map-side-combined aggregation — the only pass over raw events; the
    * trailing window then runs over a spine-×-types table (thousands of
    * rows at any corpus size) partitioned by type. Nothing after the
    * first exchange scales with the corpus. */
  def dailyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                     lookbackDays: Int = 7, zThreshold: Int = 3): DataFrame = {
    require(lookbackDays >= 2, s"lookbackDays must be ≥ 2: $lookbackDays")
    require(zThreshold >= 1, s"zThreshold must be ≥ 1: $zThreshold")
    val W = org.apache.spark.sql.expressions.Window
    val trail = W.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(-lookbackDays, -1)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec)
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
    daily
      .withColumn("_s", sum(col("n_events")).over(trail))
      // per-day squares in DECIMAL before the sum — a LONG x² would
      // overflow at daily counts past ~3·10⁹
      .withColumn("_ss", sum(big(col("n_events")) * big(col("n_events"))).over(trail))
      .withColumn("_m", count(col("n_events")).over(trail))
      // rows-between counts ROWS, not days: a calendar gap inside the
      // lookback means the window spans more than lookbackDays days →
      // the row is warm-up too (checked via datediff against the m-th
      // previous day's date)
      .withColumn("_span_ok",
        datediff(col("day"), lag(col("day"), lookbackDays)
          .over(W.partitionBy(col(typeCol)).orderBy(col("day")))) === lookbackDays)
      .filter(col("_m") === lookbackDays && col("_span_ok"))
      .withColumn("_dev", big(col("n_events")) * big(col("_m")) - big(col("_s")))
      .withColumn("_lhs", col("_dev") * col("_dev") * big(col("_m") - 1))
      .withColumn("_rhs",
        big(lit(zThreshold * zThreshold)) * big(col("_m")) *
          (big(col("_m")) * big(col("_ss")) - big(col("_s")) * big(col("_s"))))
      .select(col("day"), col(typeCol), col("n_events"),
        round(col("_s").cast("double") / col("_m").cast("double"), 6)
          .as("trailing_mean"),
        (col("_lhs") > col("_rhs")).as("is_anomaly"),
        when(col("_lhs") > col("_rhs"),
          when(col("_dev") > 0, "spike").otherwise("dip"))
          .otherwise("none").as("direction"))
  }

  /** Two-proportion z-test for an A/B conversion experiment, decided in
    * exact integer arithmetic (the [[dailyAnomalies]] stance — no
    * floating point anywhere near the boolean).
    *
    * Users are assigned to arms by `user_id mod 2` (deterministic on any
    * engine; swap in a salted hash upstream for real experiments), a user
    * converts if they ever emit `convType`, and with n_i users / c_i
    * conversions per arm, D = c₀n₁ − c₁n₀, T = n₀+n₁, C = c₀+c₁, the
    * pooled two-proportion test z² > t² cross-multiplies to
    *
    *   10⁴ · D² · T  >  zT100² · n₀n₁ · C · (T−C)     (t = zT100/100)
    *
    * — every factor exact in DECIMAL(38,0) (D² alone overflows LONG at
    * n ≈ 3·10⁹ users, so the decision runs in decimals with ~10³⁸
    * headroom). Degenerate experiments (C = 0 or C = T) have zero pooled
    * variance and D = 0 — not significant, a convention both engines
    * derive rather than special-case.
    *
    * Scale shape: one user-grain aggregation (map-side combined) collapses
    * the corpus, then a 2-row arm aggregate and a 1-row pivot — nothing
    * after the first exchange scales with events. Output: one row
    * (n_0, n_1, conv_0, conv_1, rate_0, rate_1, significant, direction).
    */
  def abTestConversion(events: DataFrame, userCol: String, typeCol: String,
                       convType: String, zT100: Int = 196): DataFrame = {
    require(zT100 > 0, s"zT100 must be positive: $zT100")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val perUser = events
      .groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("_conv"))
      .select(pmod(col(userCol), lit(2)).cast("int").as("_arm"), col("_conv"))
    val arms = perUser.groupBy(col("_arm"))
      .agg(count(lit(1)).as("_n"), sum(col("_conv")).as("_c"))
    val one = arms
      .agg(
        sum(when(col("_arm") === 0, col("_n")).otherwise(0L)).as("n_0"),
        sum(when(col("_arm") === 1, col("_n")).otherwise(0L)).as("n_1"),
        sum(when(col("_arm") === 0, col("_c")).otherwise(0L)).as("conv_0"),
        sum(when(col("_arm") === 1, col("_c")).otherwise(0L)).as("conv_1"))
    one
      .withColumn("_D", big(col("conv_0")) * big(col("n_1")) -
        big(col("conv_1")) * big(col("n_0")))
      .withColumn("_T", big(col("n_0")) + big(col("n_1")))
      .withColumn("_C", big(col("conv_0")) + big(col("conv_1")))
      .withColumn("_lhs", big(lit(10000)) * col("_D") * col("_D") * col("_T"))
      .withColumn("_rhs",
        big(lit(zT100.toLong * zT100)) * big(col("n_0")) * big(col("n_1")) *
          col("_C") * (col("_T") - col("_C")))
      .select(col("n_0"), col("n_1"), col("conv_0"), col("conv_1"),
        round(col("conv_0").cast("double") / col("n_0"), 6).as("rate_0"),
        round(col("conv_1").cast("double") / col("n_1"), 6).as("rate_1"),
        (col("_lhs") > col("_rhs")).as("significant"),
        when(col("_lhs") > col("_rhs"),
          when(col("_D") > 0, "arm0").otherwise("arm1"))
          .otherwise("none").as("direction"))
  }

  /** Per-type daily-volume TREND: the ordinary-least-squares slope of
    * daily event counts against the day offset from the type's first
    * day — the "is this stream growing or shrinking, and how fast"
    * monitor next to [[dailyAnomalies]] (level breaks) and
    * [[cusumChangepoints]] (sustained shifts).
    *
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x the integer day
    * offset and y the daily count — numerator and denominator are EXACT
    * DECIMAL(38,0) integers (y up to ~10¹² daily rows and spines to 10⁴
    * days stay far inside 38 digits), and the only floating-point step
    * is the final single division both engines perform on identical
    * operands. Types observed on one distinct day have an undefined
    * slope and are omitted (den = 0).
    *
    * Scale shape: the corpus collapses to the (type, day) grain in one
    * map-side-combined pass; the five sums reduce per type in a second
    * spine-sized aggregate. Output: (event_type, n_days, slope_per_day,
    * direction 'rising'|'falling'|'flat'). */
  def trendSlopes(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    // dailyCounts' count column is named "x" — alias it to the
    // regression's y up front so the OLS sums read sx/sy/sxy/sxx over
    // matching names (x = day offset, y = daily count, as in the oracle)
    val daily = dailyCounts(events, tsCol, typeCol).withColumnRenamed("x", "_y")
    val withX = daily
      .withColumn("_x",
        datediff(col("day"),
          min(col("day")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col(typeCol))))
          .cast("long"))
    withX
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"),
        sum(big(col("_x"))).as("_sx"),
        sum(big(col("_y"))).as("_sy"),
        sum(big(col("_x")) * big(col("_y"))).as("_sxy"),
        sum(big(col("_x")) * big(col("_x"))).as("_sxx"))
      .withColumn("_num",
        big(col("n_days")) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_den",
        big(col("n_days")) * col("_sxx") - col("_sx") * col("_sx"))
      .filter(col("_den") =!= lit(0))
      .select(col(typeCol), col("n_days"),
        round(col("_num").cast("double") / col("_den").cast("double"), 6)
          .as("slope_per_day"),
        when(col("_num") > 0, "rising").when(col("_num") < 0, "falling")
          .otherwise("flat").as("direction"))
  }

  /** Theil–Sen slope — the ROBUST companion of [[trendSlopes]]: the
    * median of all pairwise day-to-day slopes of the per-(type, day)
    * VALUE series (daily sums of scaled-LONG cents). OLS flips sign on a
    * single corrupted day; the pairwise median shrugs off up to ~29 %
    * outliers (the estimator's breakdown point) — the right trend reading
    * for telemetry with ingestion hiccups.
    *
    * Exactness: each pairwise slope is ONE double division of exact
    * integers — bit-identical across engines — and the median uses the
    * doubled-median selection (lo + hi, halved once at the end), so no
    * engine-ordering effect exists even at even pair counts; ties among
    * equal slopes are value-identical whichever row ranks first. Scale:
    * the pair join is at the DAILY-SPINE grain (days², not events²) —
    * a year is ~66k pairs per type; the corpus-scale work is the one
    * (type, day) aggregate. Types with a single day have no pairs and
    * are absent. Output: (typeCol, n_days, n_pairs, slope_per_day). */
  def theilSenSlopes(events: DataFrame, tsCol: String, typeCol: String,
                     valCol: String, scale: Int = 2): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val f = math.pow(10, scale).toLong
    val daily = events
      .select(col(typeCol), to_date(col(tsCol)).as("_day"),
        graft.SparkEntry.roundAway(col(valCol).cast("double") * f)
          .cast("long").as("_v"))
      .groupBy(col(typeCol), col("_day"))
      .agg(sum(col("_v")).as("_dv"))
      .withColumn("_d", datediff(col("_day"), to_date(lit("1970-01-01"))))
      .localCheckpoint(false)   // two consumers: pair join probes it twice
    val a = daily.select(col(typeCol), col("_d").as("_d1"), col("_dv").as("_v1"))
    val b = daily.select(col(typeCol), col("_d").as("_d2"), col("_dv").as("_v2"))
    val slopes = a.join(b, Seq(typeCol.replace("`", "")), "inner")
      .filter(col("_d2") > col("_d1"))
      .select(col(typeCol),
        ((col("_v2") - col("_v1")).cast("double") /
          ((col("_d2") - col("_d1")).cast("double") * f)).as("_slope"))
    val wOrd = W.partitionBy(col(typeCol)).orderBy(col("_slope"))
    val wAll = W.partitionBy(col(typeCol))
    val ranked = slopes
      .withColumn("_rn", row_number().over(wOrd).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wAll))
    // doubled-median (the madOutliers idiom): lo + hi summed separately so
    // an odd count adds the middle row TWICE, then one halving — shiftright
    // for floor-by-2 (long `/` would be double division)
    val med = ranked
      .filter(col("_rn") === shiftright(col("_n") - 1, 1) ||
        col("_rn") === shiftright(col("_n"), 1))
      .groupBy(col(typeCol))
      .agg(max(col("_n")).as("n_pairs"),
        ((sum(when(col("_rn") === shiftright(col("_n") - 1, 1), col("_slope"))
            .otherwise(lit(0.0))) +
          sum(when(col("_rn") === shiftright(col("_n"), 1), col("_slope"))
            .otherwise(lit(0.0)))) / 2).as("_m"))
    val nDays = daily.groupBy(col(typeCol)).agg(count(lit(1)).as("n_days"))
    nDays.join(med, Seq(typeCol.replace("`", "")))
      .select(col(typeCol), col("n_days"), col("n_pairs"),
        round(col("_m"), 6).as("slope_per_day"))
  }

  /** Weekly cohort LTV matrix: users cohort by the week of their first
    * event; each later week of activity adds its value to the cohort's
    * running total at that age. The retention-revenue curve every
    * subscription/marketplace dashboard draws, computed exactly —
    * per-event values round to cents ONCE (scaled longs, the decSum
    * stance), so cohort cells are order-independent integer sums and the
    * cumulative curve is a prefix sum over a (cohorts × ages) grid.
    *
    * Scale shape: one user-grain aggregate finds cohorts, one
    * (cohort, age)-grain aggregate collapses the corpus (the join that
    * tags events with their user's cohort is the only corpus-scale
    * shuffle), and the cumulative window runs over the tiny grid.
    * Output: (cohort_week DATE, age_weeks INT, cohort_users, n_active,
    * week_value, cum_value). */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val firsts = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("_cw"))
    val sized = firsts.groupBy(col("_cw")).agg(count(lit(1)).as("cohort_users"))
    val cells = events
      .join(firsts, Seq(userCol))
      .select(col("_cw"),
        (datediff(to_date(date_trunc("week", col(tsCol))), col("_cw")) / 7)
          .cast("int").as("age_weeks"),
        col(userCol),
        round(col(valueCol) * 100).cast("long").as("_v"))
      .groupBy(col("_cw"), col("age_weeks"))
      .agg(countDistinct(col(userCol)).as("n_active"), sum(col("_v")).as("_wv"))
    cells
      .withColumn("_cum", sum(col("_wv")).over(
        W.partitionBy(col("_cw")).orderBy(col("age_weeks"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .join(sized, Seq("_cw"))
      .select(col("_cw").as("cohort_week"), col("age_weeks"),
        col("cohort_users"), col("n_active"),
        (col("_wv").cast("double") / 100).as("week_value"),
        (col("_cum").cast("double") / 100).as("cum_value"))
  }

  /** Multi-touch conversion attribution: split each conversion's credit over
    * the touches (non-conversion events) since the user's PREVIOUS
    * conversion, under the three standard models at once — first-touch,
    * last-touch, and linear. Touches after a user's final conversion are
    * unattributed; a conversion with no preceding touches carries no
    * credit (both documented conventions, shared by the oracle).
    *
    * Linear credit is EXACT: each touch gets ⌊10⁶/n⌋ micro-units and the
    * last touch absorbs the remainder, so every conversion distributes
    * precisely 10⁶ units and channel totals are order-independent integer
    * sums (the decSum discipline applied to fractional credit — naive
    * 1.0/n doubles would drift by accumulation order).
    *
    * Scale shape: one user-grain exchange drives the conversion-counting
    * window; the (user, segment) windows EXTEND that partition key, so
    * Spark plans the whole credit assignment on the same exchange; the
    * final channel aggregate is a map-side-combined rollup to |channels|
    * rows. Nothing after the first exchange scales with the corpus.
    *
    * Output: (channel, first_touch, last_touch, linear_credit), one row
    * per channel with any credit. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String, convType: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wUser = W.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val marked = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol),
        // the first row's preceding frame is EMPTY → sum null, not 0
        coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
          .over(wUser.rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("_s"))
    val nConvs = marked.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(count(lit(1)).as("_nc"))
    val touches = marked.filter(col(typeCol) =!= convType)
      .join(nConvs, Seq(userCol))
      .filter(col("_s") < col("_nc"))
    val wSeg = W.partitionBy(col(userCol), col("_s"))
      .orderBy(col(tsCol), col(tieCol))
    val credited = touches
      .select(col(typeCol),
        row_number().over(wSeg).as("_rn"),
        count(lit(1)).over(W.partitionBy(col(userCol), col("_s"))).as("_n"))
      .select(col(typeCol),
        when(col("_rn") === 1, 1L).otherwise(0L).as("_first"),
        when(col("_rn") === col("_n"), 1L).otherwise(0L).as("_last"),
        (expr("1000000L div _n") +
          when(col("_rn") === col("_n"),
            lit(1000000L) - col("_n") * expr("1000000L div _n"))
            .otherwise(0L)).as("_lin"))
    credited
      .groupBy(col(typeCol).as("channel"))
      .agg(sum(col("_first")).as("first_touch"),
        sum(col("_last")).as("last_touch"),
        round(sum(col("_lin")).cast("double") / 1e6, 6).as("linear_credit"))
  }

  /** TIME-DECAY multi-touch attribution — the fourth standard model next
    * to [[attribution]]'s first/last/linear: a touch's credit halves for
    * every `halfLifeUs` of age at its conversion. Decided in EXACT
    * integers (the linear-credit convention, weighted): the decay bucket
    * is b = ⌊Δ/halfLife⌋ capped at `capBuckets`, the raw weight the
    * integer 2^(cap−b), each touch takes ⌊10⁶·w/ΣW⌋ micro-credits and
    * the segment's LAST touch absorbs the remainder — so per-conversion
    * credit sums to exactly 10⁶ and every number reproduces bit-for-bit
    * on any engine (no pow(), no float decay anywhere).
    *
    * Same shape as [[attribution]]: one user-grain exchange for the
    * conversion segmentation, segment-keyed windows extending it, plus
    * one (user, segment) join attaching each conversion's timestamp.
    * Output: (channel, n_touches, decay_credit). */
  def attributionDecay(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String, convType: String,
                       halfLifeUs: Long, capBuckets: Int = 30): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive: $halfLifeUs")
    require(capBuckets >= 1 && capBuckets <= 60,
      s"capBuckets in 1..60: $capBuckets")
    val W = org.apache.spark.sql.expressions.Window
    val wUser = W.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val marked = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol),
        coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
          .over(wUser.rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("_s"))
    val nConvs = marked.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(count(lit(1)).as("_nc"))
    val convs = marked.filter(col(typeCol) === convType)
      .select(col(userCol), col("_s"), unix_micros(col(tsCol)).as("_cts"))
    val seg = W.partitionBy(col(userCol), col("_s"))
    val wSeg = seg.orderBy(col(tsCol), col(tieCol))
    val credited = marked.filter(col(typeCol) =!= convType)
      .join(nConvs, Seq(userCol)).filter(col("_s") < col("_nc"))
      .join(convs, Seq(userCol, "_s"))
      .withColumn("_b", least(lit(capBuckets.toLong),
        expr(s"(_cts - unix_micros(`$tsCol`)) div ${halfLifeUs}L")))
      .withColumn("_w", expr(s"shiftleft(1L, cast($capBuckets - _b AS INT))"))
      .withColumn("_T", sum(col("_w")).over(seg))
      .withColumn("_c0", expr("(1000000L * _w) div _T"))
      .withColumn("_sumc", sum(col("_c0")).over(seg))
      .withColumn("_rn", row_number().over(wSeg))
      .withColumn("_n", count(lit(1)).over(seg))
      .withColumn("_credit", col("_c0") +
        when(col("_rn") === col("_n"), lit(1000000L) - col("_sumc"))
          .otherwise(0L))
    credited.groupBy(col(typeCol).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("_credit")).cast("double") / 1e6, 6).as("decay_credit"))
  }

  /** CALIBRATION table + Brier score — the eval-suite member next to
    * [[aucScoreVsLabel]] (discrimination) and Gini (concentration): AUC
    * can be perfect while probabilities are nonsense; calibration asks
    * whether "predicted 0.7" converts 70 % of the time. Predictions
    * arrive as MICRO-units (p·10⁶ as LONG — rationals like n⁺/n enter
    * exactly via `(1e6·n⁺) div n`, never a float); equal-width buckets
    * are exact integer cuts ⌊p_micro·B/10⁶⌋ capped at B−1, per-bucket
    * mean prediction and observed rate are single divisions of exact
    * sums, and the Brier score Σ(p_micro − y·10⁶)²/(n·10¹²) accumulates
    * via the decSum hi/lo split (per-row squares ≤ 10¹², exact to ~10¹³
    * rows). Output: (bucket 0..B−1, n, mean_pred, obs_rate,
    * brier_contrib) + a bucket −1 total row whose brier_contrib is the
    * score. */
  def calibration(scored: DataFrame, microPredCol: String, labelCol: String,
                  nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be ≥ 2: $nBuckets")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def splitSum(e: Column): Column =
      sum(shiftright(e, 18)).cast(dec38) * lit(262144L).cast(dec38) +
        sum(e.bitwiseAND(lit(262143L))).cast(dec38)
    val rows = scored.select(
      col(microPredCol).cast("long").as("_p"),
      when(col(labelCol), 1L).otherwise(0L).as("_y"))
      .where(col("_p").isNotNull && col("_p").between(0L, 1000000L))
      .withColumn("_bkt",
        least(lit(nBuckets - 1), expr(s"cast((_p * $nBuckets) div 1000000L AS INT)")))
      .withColumn("_sq", (col("_p") - col("_y") * 1000000L) *
        (col("_p") - col("_y") * 1000000L))
    val per = rows.groupBy(col("_bkt").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_p")).as("_sp"),
        sum(col("_y")).as("_sy"), splitSum(col("_sq")).as("_sq2"))
    val tot = per.agg(lit(-1).as("bucket"), sum(col("n")).as("n"),
      sum(col("_sp")).as("_sp"), sum(col("_sy")).as("_sy"),
      sum(col("_sq2")).as("_sq2"))
    per.unionByName(tot)
      .select(col("bucket"), col("n"),
        round(col("_sp").cast("double") / (col("n").cast("double") * 1e6), 6)
          .as("mean_pred"),
        round(col("_sy").cast("double") / col("n").cast("double"), 6)
          .as("obs_rate"),
        round(col("_sq2").cast("double") / (col("n").cast("double") * 1e12), 6)
          .as("brier"))
  }

  /** Exact ROC-AUC of a score against a binary label, by the
    * Mann-Whitney rank formulation with midrank tie handling —
    * AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) — the standard evaluation for
    * "does engagement predict conversion", computed EXACTLY: with the
    * distinct-score grain's (n_all, n_pos) counts and cumBefore the
    * running count of strictly-lower scores, twice the positive rank sum
    * is the integer Σ n_pos·(2·cumBefore + n_all + 1), and
    * AUC = (2R⁺ − 2·n⁺(n⁺+1)/2) / (2·n⁺·n⁻) is ONE division of exact
    * DECIMAL(38,0) integers (2R⁺ overflows LONG at ~3·10⁹ entities).
    * No sort of the corpus, no per-row ranks: the running sum lives on
    * the COLLAPSED distinct-score table.
    *
    * Scale shape: one entity-grain pass produces (score, label); one
    * map-side-combined aggregate collapses to the distinct-score grain;
    * the rank arithmetic is a window over that bounded table. Degenerate
    * single-class inputs (n⁺ = 0 or n⁻ = 0) are omitted (AUC undefined).
    * Output: one row (n_pos, n_neg, auc). */
  def aucScoreVsLabel(scored: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = scored
      .groupBy(col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_np"))
    val ranked = grain.withColumn("_cumBefore",
      coalesce(sum(col("_n")).over(
        W.orderBy(col("_s")).rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    ranked
      .agg(
        sum(col("_np")).as("n_pos"),
        sum(col("_n") - col("_np")).as("n_neg"),
        sum(big(col("_np")) *
          (big(lit(2)) * big(col("_cumBefore")) + big(col("_n")) + big(lit(1))))
          .as("_r2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("n_pos"), col("n_neg"),
        round((col("_r2") - big(col("n_pos")) * (big(col("n_pos")) + big(lit(1))))
          .cast("double") /
          (big(lit(2)) * big(col("n_pos")) * big(col("n_neg"))).cast("double"), 6)
          .as("auc"))
  }

  /** Per-group AUC — [[aucScoreVsLabel]] partitioned by segment: the
    * fairness/robustness slice of model evaluation ("the ranker AUCs
    * 0.81 overall but 0.54 on mobile users" is the finding that matters).
    * Same tie-aware rank-sum formulation — doubled midranks over each
    * group's score grain, exact DECIMAL(38) integers, one divide —
    * with every window and aggregate partitioned by the group key.
    * Single-class groups are dropped (AUC undefined), matching the
    * ungrouped convention. Scale shape: one (group, score)-grain
    * aggregate, group-partitioned cumulative windows over the collapsed
    * grain, one group-grain reduce. Output: (group, n_pos, n_neg, auc). */
  def aucByGroup(scored: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val W = org.apache.spark.sql.expressions.Window
    val grain = scored.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_np"))
    val ranked = grain.withColumn("_cumBefore",
      coalesce(sum(col("_n")).over(
        W.partitionBy(col("_g")).orderBy(col("_s"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    ranked
      .groupBy(col("_g"))
      .agg(sum(col("_np")).as("n_pos"),
        sum(col("_n") - col("_np")).as("n_neg"),
        sum(big(col("_np")) *
          (big(lit(2)) * big(col("_cumBefore")) + big(col("_n")) + big(lit(1))))
          .as("_r2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("_g").as(groupCol), col("n_pos"), col("n_neg"),
        round((col("_r2") - big(col("n_pos")) * (big(col("n_pos")) + big(lit(1))))
          .cast("double") /
          (big(lit(2)) * big(col("n_pos")) * big(col("n_neg"))).cast("double"), 6)
          .as("auc"))
  }

  /** Two-sided CUSUM changepoint statistics (Page 1954) on the daily
    * event volume per type: the sequential drift detector that catches
    * SUSTAINED small shifts the [[dailyAnomalies]] z-test misses (a +10 %
    * level change never trips a 3σ single-day test, but its cumulative
    * sum grows linearly).
    *
    *   S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)),
    *   S⁻_t = max(0, S⁻_{t-1} − (x_t − μ + k)),  flag when either > h
    *
    * with μ the type's own full-series mean, `driftK`/`thresholdH` in
    * count units. Exactness: everything is scaled by the type's day
    * count n, so μ·n = total is an integer and the whole recursion runs
    * in LONG arithmetic — S values, comparisons, and flags are bit-exact
    * on any engine; the reported s_pos/s_neg divide back by n once at
    * the end (headroom: |S·n| ≤ n·Σx ≤ ~10¹⁵ at 10³ days × 10¹²-count
    * days — far under 2⁶³).
    *
    * Scale shape: the corpus collapses to the (day, type) grain in one
    * map-side-combined aggregation — the only pass over raw events. The
    * fold is inherently sequential, but it runs per type over the DAY
    * SPINE (thousands of rows at any corpus size), as an HOF scan over
    * the type's sorted daily counts — the [[dailyAnomalies]]
    * nothing-after-the-first-exchange-scales-with-the-corpus stance.
    *
    * Output: (event_type, day, n_events, s_pos, s_neg, is_change), one
    * row per (type, day); s_pos/s_neg rounded to 1e-6. */
  def cusumChangepoints(events: DataFrame, tsCol: String, typeCol: String,
                        driftK: Int, thresholdH: Int): DataFrame =
    cusumFromDaily(dailyCounts(events, tsCol, typeCol), typeCol,
      driftK, thresholdH)

  /** Mann–Kendall trend test over per-type daily volumes — the
    * SIGNIFICANCE companion to [[trendSlopes]] (OLS magnitude) and
    * [[theilSenSlopes]] (robust magnitude): S = Σ_{i<j} sign(x_j − x_i)
    * over day-ordered counts asks "is there ANY monotone trend", immune
    * to outliers and to the series' scale, with the tie-corrected normal
    * z for significance. The standard seasonal-free trend gate on
    * operational volume series.
    *
    * Exactness: S is an exact integer (sum of ±1/0 over day pairs); the
    * tie term Σ t(t−1)(2t+5) and n(n−1)(2n+5) are exact DECIMAL(38)
    * integers; Var(S) = (n(n−1)(2n+5) − Σ…)/18 and the
    * continuity-corrected z = (S ∓ 1)/√Var are ONE fixed-shape IEEE
    * expression each (z = 0 exactly when S = 0, which also covers the
    * all-tied Var = 0 degenerate — sign pairs are all 0 there).
    * Direction calls use the ROUNDED z against ±1.96 so both engines
    * agree bit-for-bit.
    *
    * Scale shape: the corpus collapses to the (type, day) grain in one
    * map-side-combined pass ([[dailyCounts]]); the pair join runs at
    * days² PER TYPE (the [[theilSenSlopes]] stance — spine-sized, never
    * events²); ties come from one (type, value)-grain aggregate. Output:
    * (event_type, n_days, s, z, direction). */
  def mannKendall(events: DataFrame, tsCol: String,
                  typeCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val daily = dailyCounts(events, tsCol, typeCol)
      .withColumn("_d", datediff(col("day"), to_date(lit("1970-01-01"))))
      .localCheckpoint(false)   // three consumers: pair join twice + ties
    val a = daily.select(col(typeCol), col("_d").as("_d1"), col("x").as("_v1"))
    val b = daily.select(col(typeCol), col("_d").as("_d2"), col("x").as("_v2"))
    val sTab = a.join(b, Seq(typeCol.replace("`", "")))
      .filter(col("_d2") > col("_d1"))
      .groupBy(col(typeCol))
      .agg(coalesce(sum(signum(col("_v2") - col("_v1")).cast("long")),
        lit(0L)).as("_s"))
    val nTab = daily.groupBy(col(typeCol)).agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy(col(typeCol), col("x"))
      .agg(count(lit(1)).as("_t"))
      .groupBy(col(typeCol))
      .agg(coalesce(sum(big(col("_t")) * (col("_t") - 1)
        * (lit(2L) * col("_t") + 5)), big(lit(0))).as("_tt"))
    val n = big(col("n_days"))
    val varNum = (n * (n - 1) * (lit(2L) * n + 5) - col("_tt"))
    val varD = varNum.cast("double") / lit(18.0)
    // types observed on a single day have no pairs: left join keeps them
    // with S = 0, z = 0, direction 'flat'
    nTab
      .join(sTab, Seq(typeCol.replace("`", "")), "left_outer")
      .join(ties, Seq(typeCol.replace("`", "")))
      .select(col(typeCol), col("n_days"),
        coalesce(col("_s"), lit(0L)).as("s"),
        col("_tt"))
      .select(col(typeCol), col("n_days"), col("s"),
        round(when(col("s") === 0, lit(0.0)).otherwise(
          when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varD))
            .otherwise((col("s") + 1).cast("double") / sqrt(varD))), 6)
          .as("z"))
      .withColumn("direction",
        when(col("z") > 1.96, "rising")
          .when(col("z") < -1.96, "falling")
          .otherwise(lit("flat")))
  }

  /** Per-user observed activity span + churn status — the shared input
    * grain of [[kaplanMeier]] and [[logRank]]: span = datediff(last,
    * first) event date; churned iff the last event is at least
    * `censorDays` before the corpus's max date (otherwise the user is
    * right-censored — still alive as far as the data can say). One
    * user-grain aggregate over events + a broadcast 1-row max. Output:
    * (userCol, _t, _dead). */
  def userSpans(events: DataFrame, tsCol: String, userCol: String,
                censorDays: Int): DataFrame = {
    require(censorDays >= 0, s"censorDays must be ≥ 0: $censorDays")
    val users = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("_first"),
        to_date(max(col(tsCol))).as("_last"))
    val maxLast = users.agg(max(col("_last")).as("_maxd"))
    users.crossJoin(broadcast(maxLast))
      .select(col(userCol), datediff(col("_last"), col("_first")).as("_t"),
        (col("_last") <= date_sub(col("_maxd"), censorDays)).as("_dead"))
  }

  /** Two-group log-rank test — "do these two cohorts churn at different
    * rates", the hypothesis-test companion to [[kaplanMeier]]'s curve
    * (eyeballing two KM curves is not a test): at every pooled churn
    * time, compare group A's observed deaths to its expectation under
    * the null that both groups share one hazard, O_A − E_A =
    * Σ_t (d_At − d_t·n_At/n_t), with the hypergeometric variance
    * V = Σ_t d_t·(n_At/n_t)·(n_Bt/n_t)·(n_t − d_t)/(n_t − 1); χ² =
    * (O−E)²/V is 1-df chi-square under the null (3.841 = 95 %).
    *
    * Determinism: O is an exact integer; each E_t and V_t term is ONE
    * fixed-shape IEEE expression over exact integers, micro-rounded to
    * a LONG before the cross-time sums (the χ² per-cell discipline) —
    * order-independent; χ² and the 3.841 call use the ROUNDED values so
    * both engines agree. Risk counts come from a dense (time × group)
    * frame (the [[graft.ops.CorpusStats.ksStatisticBy]] device — n_At
    * must exist at pooled times where A has no span). Times with
    * n_t ≤ 1 or d_t = 0 contribute nothing; V = 0 (no comparable
    * times) yields null χ².
    *
    * Scale shape: the user-grain span table collapses to the (time,
    * group) grain; the dense frame is ≤ spine × 2 rows. Output:
    * (n_a, n_b, o_a, e_a, chi2, significant). */
  def logRank(spans: DataFrame, groupCol: String, timeCol: String,
              deadCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = spans.where(col(groupCol).isNotNull &&
        col(timeCol).isNotNull && col(deadCol).isNotNull)
      .select(col(groupCol).as("_g"), col(timeCol).as("_t"),
        col(deadCol).cast("boolean").as("_dd"))
    val gv = base.groupBy(col("_g"), col("_t"))
      .agg(sum(when(col("_dd"), 1L).otherwise(0L)).as("_dg"),
        count(lit(1)).as("_cg"))
    val times = base.groupBy(col("_t")).agg(lit(1).as("_one")).drop("_one")
    val groups = base.groupBy(col("_g")).agg(count(lit(1)).as("_ng"))
    val dense = times.crossJoin(groups.select(col("_g"), col("_ng")))
      .join(gv, Seq("_g", "_t"), "left_outer")
      .select(col("_g"), col("_t"), col("_ng"),
        coalesce(col("_dg"), lit(0L)).as("_dg"),
        coalesce(col("_cg"), lit(0L)).as("_cg"))
      .withColumn("_below", coalesce(sum(col("_cg")).over(
        W.partitionBy(col("_g")).orderBy(col("_t"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_nrisk", col("_ng") - col("_below"))
    // two-group pivot on the time grain: smallest group value = A
    val gVals = groups.select(col("_g")).orderBy(col("_g"))
      .collect().map(_.get(0))
    require(gVals.length == 2,
      s"logRank requires exactly 2 groups, got ${gVals.length}")
    val byTime = dense.groupBy(col("_t"))
      .agg(sum(when(col("_g") === gVals(0), col("_dg")).otherwise(0L)).as("_da"),
        sum(col("_dg")).as("_d"),
        sum(when(col("_g") === gVals(0), col("_nrisk")).otherwise(0L)).as("_na"),
        sum(col("_nrisk")).as("_n"))
      .where(col("_d") > 0 && col("_n") > 1)
    val eMic = round(col("_d").cast("double") * col("_na").cast("double")
      / col("_n").cast("double") * lit(1e6)).cast("long")
    val vMic = round(col("_d").cast("double")
      * (col("_na").cast("double") / col("_n").cast("double"))
      * ((col("_n") - col("_na")).cast("double") / col("_n").cast("double"))
      * ((col("_n") - col("_d")).cast("double")
        / (col("_n") - 1).cast("double")) * lit(1e6)).cast("long")
    val sums = byTime
      .agg(coalesce(sum(col("_da")), lit(0L)).as("_oa"),
        coalesce(sum(eMic), lit(0L)).as("_e"),
        coalesce(sum(vMic), lit(0L)).as("_v"))
    val nA = groups.where(col("_g") === gVals(0))
      .select(col("_ng").as("n_a"))
    val nB = groups.where(col("_g") === gVals(1))
      .select(col("_ng").as("n_b"))
    val chi2 = ((col("_oa").cast("double") - col("_e").cast("double") / 1e6)
      * (col("_oa").cast("double") - col("_e").cast("double") / 1e6)
      / (col("_v").cast("double") / 1e6))
    sums.crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .select(col("n_a"), col("n_b"), col("_oa").as("o_a"),
        round(col("_e").cast("double") / 1e6, 6).as("e_a"),
        when(col("_v") === 0, lit(null).cast("double"))
          .otherwise(round(chi2, 6)).as("chi2"),
        when(col("_v") === 0, lit(null).cast("boolean"))
          .otherwise(round(chi2, 6) > 3.841).as("significant"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — the standard
    * experimentation trick next to [[abTestConversion]]: adjust each
    * arm's post-period metric by its pre-period covariate,
    * ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled across arms, so
    * between-user variance that existed BEFORE the experiment stops
    * drowning the treatment effect (sample-size-equivalent gain ≈
    * 1/(1−ρ²)).
    *
    * Exactness: inputs arrive as integer-scaled user-grain values (the
    * cents/micro contract); all five pooled sums and the per-arm sums
    * are exact DECIMAL(38) integers, θ is ONE double division of exact
    * cross-products n·Σxy − Σx·Σy over n·Σx² − (Σx)², and each arm's
    * adjusted mean uses the CLOSED FORM adj = ȳ_a − θ·(x̄_a − x̄) over
    * those integers — never a per-row float sum, so results are
    * order-independent. ρ² = (n·Σxy − ΣxΣy)²/((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))
    * rides the same integers. Zero pre-period variance (or a single
    * user) degrades to θ = 0 — CUPED becomes a no-op, not a crash.
    *
    * Scale shape: one arm-grain aggregate + one 1-row pooled aggregate
    * broadcast back; nothing beyond arm cardinality shuffles. Output:
    * (arm, n_users, raw_mean, adj_mean, theta, rho2) — means in input
    * units via `scale`. */
  def cupedAdjust(users: DataFrame, armCol: String, preCol: String,
                  postCol: String, scale: Long = 100L): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(c: Column): Column = c.cast(dec38)
    val base = users.where(col(armCol).isNotNull &&
        col(preCol).isNotNull && col(postCol).isNotNull)
      .select(col(armCol).as("_a"), col(preCol).as("_x"), col(postCol).as("_y"))
    val pooled = base.agg(count(lit(1)).cast(dec38).as("_n"),
      coalesce(sum(big(col("_x"))), big(lit(0))).as("_sx"),
      coalesce(sum(big(col("_y"))), big(lit(0))).as("_sy"),
      coalesce(sum(big(col("_x")) * col("_x")), big(lit(0))).as("_sxx"),
      coalesce(sum(big(col("_y")) * col("_y")), big(lit(0))).as("_syy"),
      coalesce(sum(big(col("_x")) * col("_y")), big(lit(0))).as("_sxy"))
    val arms = base.groupBy(col("_a"))
      .agg(count(lit(1)).as("n_users"),
        coalesce(sum(big(col("_x"))), big(lit(0))).as("_ax"),
        coalesce(sum(big(col("_y"))), big(lit(0))).as("_ay"))
    val covN = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val varXN = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val varYN = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val theta = when(varXN <= 0, lit(0.0))
      .otherwise(covN.cast("double") / varXN.cast("double"))
    val rho2 = when(varXN <= 0 || varYN <= 0, lit(0.0))
      .otherwise(covN.cast("double") * covN.cast("double")
        / (varXN.cast("double") * varYN.cast("double")))
    val sD = lit(scale.toDouble)
    val rawMean = (col("_ay").cast("double")
      / col("n_users").cast("double") / sD)
    val adjMean = (rawMean - theta
      * (col("_ax").cast("double") / col("n_users").cast("double")
        - col("_sx").cast("double") / col("_n").cast("double")) / sD)
    arms.crossJoin(broadcast(pooled))
      .select(col("_a").as(armCol), col("n_users"),
        round(rawMean, 6).as("raw_mean"),
        round(adjMean, 6).as("adj_mean"),
        round(theta, 6).as("theta"),
        round(rho2, 6).as("rho2"))
  }

  /** Kaplan–Meier survival over user activity lifetimes — the
    * right-censoring-honest churn curve: S(t) = Π_{t_i ≤ t}
    * (1 − d_i/n_i) over observed churn times, where a user whose last
    * event falls within `censorDays` of the corpus end is CENSORED (we
    * only know they lived ≥ their observed span — counting them as
    * churned is the classic retention-dashboard bias this estimator
    * exists to fix; they leave the risk set without adding a death).
    *
    * Per user: span = datediff(last, first); churned iff last event ≤
    * corpus-max − censorDays. Per distinct churn time t: d = churns at
    * t, n_risk = users (churned OR censored) with span ≥ t. Exactness:
    * d and n_risk are exact integers from two grain-level cumulative
    * windows; ln(1 − d/n) = ln((n−d)/n) quantizes to a round(ln·10⁶)
    * LONG per step and the product becomes an EXACT integer prefix sum
    * over the time grain; S = exp(cum/10⁶) round-6 (one fixed-shape
    * IEEE exp both engines share — the [[graft.ops.CorpusStats]]
    * p-value discipline). Output one row per distinct churn time:
    * (t_days, n_risk, n_events, s_hat), S monotone non-increasing.
    *
    * Scale shape: one user-grain aggregate over events (the only
    * corpus-scale pass), then everything lives on the ≤ spine-sized
    * distinct-span grain: two ordered windows + one prefix sum. */
  def kaplanMeier(events: DataFrame, tsCol: String, userCol: String,
                  censorDays: Int = 7): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val spans = userSpans(events, tsCol, userCol, censorDays)
      .select(col("_t"), col("_dead"))
    val grain = spans.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        count(lit(1)).as("_c"))
    val wOrd = W.orderBy(col("_t"))
    val enriched = grain
      .withColumn("_below", coalesce(sum(col("_c")).over(
        wOrd.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_total", sum(col("_c")).over(
        wOrd.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .where(col("_d") > 0)
      .withColumn("_n", col("_total") - col("_below"))
      // n = d can only happen on the LAST death time (the whole remaining
      // risk set churns): S steps to exactly 0 there — guard the ln(0)
      .withColumn("_l", when(col("_n") > col("_d"),
        round(log((col("_n") - col("_d")).cast("double")
          / col("_n").cast("double")) * lit(1e6)).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("_cum", sum(col("_l")).over(
        W.orderBy(col("_t")).rowsBetween(W.unboundedPreceding, 0)))
    enriched.select(col("_t").as("t_days"), col("_n").as("n_risk"),
      col("_d").as("n_events"),
      when(col("_n") === col("_d"), lit(0.0))
        .otherwise(round(exp(col("_cum").cast("double") / lit(1e6)), 6))
        .as("s_hat"))
  }

  /** The (type, day, x) daily-count table — the ADDITIVE ARTIFACT behind
    * [[cusumChangepoints]]: a standing pipeline materializes one slice per
    * micro-batch and folds with [[mergeDailyCounts]]; the monitor then
    * re-derives CUSUM from the artifact alone, never rescanning events
    * (the vocabCounts / bm25-stats lifecycle). */
  def dailyCounts(events: DataFrame, tsCol: String, typeCol: String): DataFrame =
    events.groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))

  /** Fold accumulated daily-count slices: counts are additive over
    * disjoint event slices, so a plain keyed sum is the exact merge. */
  def mergeDailyCounts(slices: DataFrame, typeCol: String): DataFrame =
    slices.groupBy(col(typeCol), col("day")).agg(sum(col("x")).as("x"))

  /** [[cusumChangepoints]] from a prebuilt daily-count table.
    *
    * The one-sided CUSUM recurrence s_i = max(0, s_{i−1} + z_i) has the
    * exact closed form s_i = P_i − min(0, min_{j≤i} P_j) with P the
    * prefix sum of z (the max-subarray-suffix identity: s_i is the best
    * sum ending at i, floored at the empty suffix). So instead of an
    * array-accumulator fold (which buffered each type's whole series in
    * one row and paid O(days²) element copies in per-step `concat`),
    * the scan is two window passes over the (type, day) spine — prefix
    * sum, then running min — sharing ONE exchange and ONE sort. No
    * collect_list anywhere; memory per row is constant regardless of
    * spine length, so the op now holds at fine-grained time buckets too.
    *
    * Exactness: all LONG — z_i = n·x_i − Σx − k·n, so |P_i| ≤
    * days·max|z| ≈ 10³·10¹⁵ = 10¹⁸ at 10³ days × 10¹²-count days,
    * inside 2⁶³ ≈ 9.2·10¹⁸ (tighter headroom than the fold's |S·n| but
    * still exact through every realistic spine). */
  def cusumFromDaily(daily: DataFrame, typeCol: String,
                     driftK: Int, thresholdH: Int): DataFrame = {
    require(driftK >= 0, s"driftK must be ≥ 0: $driftK")
    require(thresholdH > 0, s"thresholdH must be positive: $thresholdH")
    val W = org.apache.spark.sql.expressions.Window
    val wAll = W.partitionBy(col(typeCol))
    val wRun = W.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val zp = col("_n") * col("x") - col("_total") - lit(driftK.toLong) * col("_n")
    val zn = -col("_n") * col("x") + col("_total") - lit(driftK.toLong) * col("_n")
    daily
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_total", sum(col("x")).over(wAll))
      .withColumn("_pp", sum(zp).over(wRun))
      .withColumn("_pn", sum(zn).over(wRun))
      .withColumn("_sp", col("_pp") - least(lit(0L), min(col("_pp")).over(wRun)))
      .withColumn("_sn", col("_pn") - least(lit(0L), min(col("_pn")).over(wRun)))
      .select(col(typeCol), col("day"), col("x").cast("long").as("n_events"),
        round(col("_sp").cast("double") / col("_n"), 6).as("s_pos"),
        round(col("_sn").cast("double") / col("_n"), 6).as("s_neg"),
        (col("_sp") > lit(thresholdH.toLong) * col("_n") ||
         col("_sn") > lit(thresholdH.toLong) * col("_n")).as("is_change"))
  }

  /** Slowly-changing-dimension Type-2 history build: collapse an event
    * stream into one VERSIONED row per run of equal `attrCol` values per
    * entity — (entity, attr, valid_from, valid_to, version), half-open
    * intervals [valid_from, valid_to), valid_to null on the current
    * version. The standard warehouse dimension-history shape (Kimball's
    * SCD Type 2), built here directly from the raw event log.
    *
    * Mechanics: one lag() marks rows where the attribute differs from the
    * entity's previous row (null-safe, so the first row always opens
    * version 1); surviving change rows get valid_to = next change's
    * valid_from and version = row_number. Both windows and the filter
    * share one (entity)-grain exchange — the filter preserves the sort,
    * so the second window adds NO exchange and NO sort (asserted in
    * PlanSpec). Ties inside one timestamp break on `tieCol` — without it
    * the version sequence of a same-timestamp burst would be
    * partitioning-dependent.
    *
    * Scale: the only pass over raw events is the first window; everything
    * after operates on change rows only. An entity's full history never
    * concentrates in memory (no collect_list) — pure streaming window
    * evaluation, so a bot entity with 10⁸ events costs sort time, not
    * buffer space. */
  def scd2History(events: DataFrame, entityCol: String, attrCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    // row 1 opens version 1 UNCONDITIONALLY, guarded by row_number — a
    // bare `!(lag <=> attr)` silently drops the first run when its attr
    // is null, because lag's "no previous row" null is indistinguishable
    // from a null previous VALUE (the scd2Merge presence-marker lesson,
    // one level down). Both window functions share the one (entity)-grain
    // Window operator, so this adds no exchange and no sort.
    events
      .select(col(entityCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attrCol)))
      .select(col(entityCol), col(attrCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(
          W.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol)))
          .as("valid_to"),
        row_number().over(
          W.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol)))
          .cast("int").as("version"))
  }

  /** Incremental maintenance for [[scd2History]]: merge a DELTA of events
    * (all strictly later than every already-folded event for their
    * entity — the watermark contract an append-only ingest provides) into
    * an existing history WITHOUT rescanning old events. Exactness
    * contract: `scd2Merge(scd2History(old), delta) ≡ scd2History(old ∪
    * delta)` row-for-row (unit-tested as that property, and driver-gated
    * by q_scd2_merge whose oracle recomputes from scratch).
    *
    * Mechanics: the delta folds to its own versions per entity; per
    * affected entity the OPEN history row (valid_to null) stitches
    * against the delta's first version — same attribute ⇒ the delta's
    * first run extends the open version (its rows vanish into it), new
    * attribute ⇒ the open version closes at the delta's first
    * valid_from; delta versions renumber from the entity's last version.
    * Shuffle mass: the delta plus ONE open row per affected entity —
    * closed history rows stream through untouched (at 100 TB the history
    * is partition-pruned on entity and never rewritten, the
    * merge-on-read pattern). */
  def scd2Merge(history: DataFrame, delta: DataFrame, entityCol: String,
                attrCol: String, tsCol: String, tieCol: String): DataFrame = {
    val dv = scd2History(delta, entityCol, attrCol, tsCol, tieCol)
    // per entity: the delta's first run (decides how the open row
    // stitches) and the history's open row (attr + last version).
    // Presence is an EXPLICIT marker (_hasDelta/_hasOpen), never attr
    // nullness — scd2History itself supports null attribute values
    // (null-safe lag compare), so "attr is null after the outer join"
    // is ambiguous between "row absent" and "row present, attr null".
    val firstRun = dv.filter(col("version") === 1)
      .select(col(entityCol), col(attrCol).as("_a1"),
        col("valid_from").as("_f1"), col("valid_to").as("_t1"),
        lit(1).as("_hasDelta"))
    val open = history.filter(col("valid_to").isNull)
    val closed = history.filter(col("valid_to").isNotNull)
    // open rows: untouched entity → stays open; first delta run has the
    // same attr → the run CONTINUES, close at the run's own end (null if
    // the delta ends inside it); new attr → close at the delta's start
    val openAdj = open.join(firstRun, Seq(entityCol), "left_outer")
      .select(col(entityCol), col(attrCol), col("valid_from"),
        when(col("_hasDelta").isNull,
            lit(null).cast(open.schema("valid_to").dataType))
          .when(col(attrCol) <=> col("_a1"), col("_t1"))
          .otherwise(col("_f1")).as("valid_to"),
        col("version"))
    // delta rows: an absorbed first run vanishes; the rest renumber after
    // the entity's last version (minus one when run 1 was absorbed).
    // Absorption requires an open row to EXIST (_hasOpen) — without the
    // marker, a brand-new entity whose first run has a null attr would
    // match `null <=> null` against the nonexistent open row and vanish.
    val absorbed = col("_hasOpen").isNotNull && (col("_ao") <=> col("_a1"))
    val deltaAdj = dv
      .join(open.select(col(entityCol), col(attrCol).as("_ao"),
        col("version").as("_V"), lit(1).as("_hasOpen")),
        Seq(entityCol), "left_outer")
      .join(firstRun.select(col(entityCol), col("_a1")), Seq(entityCol))
      .filter(!(col("version") === 1 && absorbed))
      .select(col(entityCol), col(attrCol), col("valid_from"), col("valid_to"),
        (col("version") + coalesce(col("_V"), lit(0)) -
          when(absorbed, 1).otherwise(0)).as("version"))
    closed.unionByName(openAdj).unionByName(deltaAdj)
  }

  /** SNAPSHOT DIFF — the CDC primitive next to [[scd2History]]: compare
    * two keyed snapshots of the same table and classify every key as
    * `added` (only in the new snapshot), `removed` (only in the old),
    * `changed` (present in both, any compared column differs — null-safe,
    * so null→value and value→null both count), or `unchanged`. This is
    * what an ingest runs when the upstream can't emit a change stream:
    * diff the snapshots, feed `added ∪ changed` to [[scd2Merge]].
    *
    * One full-outer equi-join on the key — no row hashing (a hash can
    * collide and silently mis-classify `changed` as `unchanged`; with
    * column-wise null-safe comparisons the classification is exact), no
    * shuffle beyond the join's. Output: key + `change_type` + the NEW
    * snapshot's compared columns (old's for `removed`). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val a = oldSnap.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"_a_$c")) :+ lit(1).as("_inA"): _*)
    val b = newSnap.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"_b_$c")) :+ lit(1).as("_inB"): _*)
    val differs = compareCols.map(c => !(col(s"_a_$c") <=> col(s"_b_$c")))
      .reduce(_ || _)
    a.join(b, Seq(keyCol), "full_outer")
      .select(col(keyCol) +:
        when(col("_inA").isNull, lit("added"))
          .when(col("_inB").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type") +:
        compareCols.map(c => when(col("_inB").isNotNull, col(s"_b_$c"))
          .otherwise(col(s"_a_$c")).as(c)): _*)
  }

  /** POINT-IN-TIME join — enrich each probe row with the [[scd2History]]
    * version ACTIVE at its timestamp (the warehouse PIT-correctness
    * query: "what was this entity's attribute when the event happened",
    * never the current value). The naive encoding is the interval theta
    * join `valid_from ≤ t < valid_to` — a range-pair explosion; but an
    * SCD2 history tiles each entity's timeline contiguously, so the
    * active version is exactly the LATEST version starting at-or-before
    * the probe, and the whole query collapses to [[AsOf.asofJoin]] on
    * `valid_from`: one shuffle + sort, join-free plan, no interval
    * machinery at all.
    *
    * Zero-length versions (two changes at the same timestamp — the
    * earlier one's interval is empty) are active at no instant and are
    * dropped up front; that also restores the as-of precondition of one
    * right row per (entity, time). Probes before an entity's first
    * version drop (inner semantics, matching the interval definition).
    * Output: every probe column + `asof_<ts>` (the active version's
    * valid_from) + `active_<attr>` + `version`. */
  def pointInTimeJoin(probes: DataFrame, history: DataFrame,
                      entityCol: String, tsCol: String,
                      attrCol: String): DataFrame = {
    val live = history.filter(col("valid_to").isNull ||
      col("valid_to") > col("valid_from"))
    val h = live.select(col(entityCol), col("valid_from").as(tsCol),
      col(attrCol).as(s"active_$attrCol"), col("version"))
    AsOf.asofJoin(probes, h, entityCol, tsCol)
  }

  /** TIME-WEIGHTED average per entity — the telemetry-correct mean: each
    * value holds from its event until the next event, so
    * TWA = Σ vᵢ·gapᵢ / Σ gapᵢ over [first, last] (the last event has no
    * holding period and contributes nothing; single-event entities have
    * zero span and are dropped). A plain avg() over-weights chatty
    * periods — a sensor that reports 1000×/s while idle and 1×/h under
    * load averages to its idle value.
    *
    * Exactness: v = round(value·10^scale) LONG, gaps in LONG
    * microseconds; per-row products v·gap stay in LONG to |v|·gap ≈
    * 9·10¹⁸ (10⁷-scaled values × ~10¹¹ µs ≈ year-long gaps — document
    * your domain if beyond), summed via the decSum hi/lo split into
    * DECIMAL(38,0), one final double division. ONE entity-grain
    * exchange; the lead() window and the aggregate share it.
    * Output: (entity, n_events, span_us, twa). */
  def timeWeightedAvg(events: DataFrame, entityCol: String, tsCol: String,
                      valCol: String, tieCol: String,
                      scale: Int = 2): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(entityCol)).orderBy(col("_t"), col(tieCol))
    def splitSum(e: Column): Column =
      sum(shiftright(e, 18)).cast(dec38) * lit(262144L).cast(dec38) +
        sum(e.bitwiseAND(lit(262143L))).cast(dec38)
    val f = math.pow(10, scale).toLong
    events
      .select(col(entityCol),
        graft.SparkEntry.roundAway(col(valCol).cast("double") * f)
          .cast("long").as("_v"),
        unix_micros(col(tsCol)).as("_t"), col(tieCol))
      .withColumn("_gap", lead(col("_t"), 1).over(w) - col("_t"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_gap")).as("_den"),
        splitSum(when(col("_gap").isNotNull, col("_v") * col("_gap"))
          .otherwise(0L)).as("_num"))
      .filter(col("_den") > 0)
      .select(col(entityCol), col("n_events"), col("_den").as("span_us"),
        round(col("_num").cast("double")
          / (col("_den").cast("double") * f), 6).as("twa"))
  }

  /** Integer-exact exponentially-weighted moving average (α = 1/2) of a
    * fixed-scale value per entity: the stream fold
    * s₁ = x₁, sᵢ = ⌊(sᵢ₋₁ + xᵢ)/2⌋ over events ordered by (ts, tie),
    * with x = round(value·scale) — every step a LONG add and shift, so
    * the result is reproducible bit-for-bit on any engine (the
    * [[dailyAnomalies]] stance: no floating-point accumulation anywhere).
    * α = 1/2 is the fold whose halving is exact in integers; arbitrary α
    * would reintroduce per-step rounding drift between engines.
    *
    * ⌊·⌋ is FLOOR division for every sign, implemented as the arithmetic
    * shift `shiftright(s + x, 1)` — NOT SQL's `div`, which truncates
    * toward zero and diverges from a floor-dividing engine (DuckDB `//`,
    * Python) as soon as a scaled value is negative (refunds,
    * adjustments). Signed value columns are therefore fully supported
    * and engine-portable; EwmaSignSpec pins the negative-domain fold
    * against a JVM Math.floorDiv replay.
    *
    * Returns (entity, n_events, ewma DOUBLE) — ewma is the final state
    * divided back by `scale`, one exact division.
    *
    * Scale shape: ONE entity-grain exchange; the fold is a codegen'd HOF
    * over the entity's sorted values. The fold is order-sensitive, so the
    * buffer holds the entity's scaled values (8 bytes each) — pre-filter
    * or cap events per entity upstream for adversarial bot tails (the
    * [[topPaths]] `maxEvents` treatment). A bounded-buffer segment
    * composition à la [[segmentedDepthHistogram]] does NOT apply: under
    * floor division the per-segment map is affine only up to ±1 per step,
    * and this op's contract is exactness. */
  def ewmaHalf(events: DataFrame, entityCol: String, valCol: String,
               tsCol: String, tieCol: String, scale: Int = 100): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    events
      .select(col(entityCol),
        struct(col(tsCol), col(tieCol),
          round(col(valCol) * scale).cast("long").as("_x")).as("_e"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        transform(sort_array(collect_list(col("_e"))), e => e.getField("_x"))
          .as("_vals"))
      .withColumn("_acc", expr(
        "aggregate(slice(_vals, 2, size(_vals) - 1), _vals[0], (a, x) -> shiftright(a + x, 1))"))
      .select(col(entityCol), col("n_events"),
        (col("_acc").cast("double") / scale).as("ewma"))
  }

  /** ADDITIVE seasonal decomposition of the per-type daily series —
    * classical decompose (the moving-average method behind STL's
    * textbook predecessor): daily = trend + seasonal + residual, with
    * trend the centered `period`-day moving average (only CALENDAR-
    * contiguous full windows — a gap day voids the window rather than
    * silently averaging 6 of 7), seasonal the per-(type, day-of-cycle)
    * mean of the detrended series, residual the remainder. The monitoring
    * companion of [[trendSlopes]]/[[cusumChangepoints]]: "is Monday's dip
    * seasonal or a regression?" needs the season stripped first.
    *
    * Exactness discipline: daily sums are scaled LONGs; trend and
    * seasonal are micro-scaled FLOOR divisions — floor on both engines
    * (DuckDB `//` floors; here `floor(a/b)` in double, exact while
    * |numerator| < 2⁵³ ≈ 9·10¹⁵ micro-scaled — i.e. period-window daily
    * sums below ~10⁷ in value units at scale 2; document your domain
    * beyond). Day-of-cycle is `datediff(epoch) % period` — no engine-
    * specific weekday numbering. Two exchanges: the (type, date)
    * aggregate + type-grain window, then the (type, season) window.
    * Output: (event_type, d, daily, trend, seasonal, residual), the
    * last three null on edge/gap days without a full centered window. */
  def seasonalDecompose(events: DataFrame, typeCol: String, tsCol: String,
                        valCol: String, scale: Int = 2,
                        period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd ≥ 3 (centered MA): $period")
    val W = org.apache.spark.sql.expressions.Window
    val half = period / 2
    val f = math.pow(10, scale).toLong
    def fdiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("d"),
        graft.SparkEntry.roundAway(col(valCol).cast("double") * f)
          .cast("long").as("_v"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("_v")).as("_dsum"))
    val w7 = W.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-half, half)
    val wS = W.partitionBy(col("event_type"), col("_season"))
    val t = daily
      .withColumn("_s7", sum(col("_dsum")).over(w7))
      .withColumn("_c7", count(lit(1)).over(w7))
      .withColumn("_span",
        datediff(max(col("d")).over(w7), min(col("d")).over(w7)))
      .withColumn("_trend_m",
        when(col("_c7") === period && col("_span") === period - 1,
          fdiv(lit(1000000L) * col("_s7"), lit(period))))
      .withColumn("_det_m", lit(1000000L) * col("_dsum") - col("_trend_m"))
      .withColumn("_season",
        pmod(datediff(col("d"), to_date(lit("1970-01-01"))), lit(period)))
    val se = t.withColumn("_seas_m",
      when(col("_det_m").isNotNull,
        fdiv(sum(col("_det_m")).over(wS), count(col("_det_m")).over(wS))))
    val den = 1e6 * f
    se.select(col("event_type"), col("d"),
      round(col("_dsum") / lit(f.toDouble), 6).as("daily"),
      round(col("_trend_m").cast("double") / lit(den), 6).as("trend"),
      round(col("_seas_m").cast("double") / lit(den), 6).as("seasonal"),
      round((col("_det_m") - col("_seas_m")).cast("double") / lit(den), 6)
        .as("residual"))
  }
}
