package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators (SURVEY §2b streaming rows).
  *
  * Every transform here is a plain `DataFrame => DataFrame` over the
  * `events` schema, so the *same code* runs batch and streaming — the
  * Spark-diff test harness relies on that: identical input through
  * `MemoryStream`/file-source must equal the batch run.
  *
  * The reference topology is processing-time only (its sole watermark
  * call is `noWatermarks()`, reference MSK `DataStreamJob.java:163`);
  * watermarks, windows and keyed state below are the north-star
  * extensions, all built on Structured Streaming primitives that shard
  * state by key across executors (scale: state store per partition, no
  * driver-side state).
  */
object StreamingOps {

  /** Tumbling event-time window aggregation. */
  def tumblingAgg(df: DataFrame, tsCol: String, width: String): DataFrame =
    df.groupBy(window(col(tsCol), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Sliding event-time window aggregation. */
  def slidingAgg(df: DataFrame, tsCol: String, width: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Session windows: events within `gap` of each other merge per key. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("n"), col("total"))

  private def hashedWithWatermark(df: DataFrame, textCol: String,
                                  tsCol: String, watermark: String): DataFrame =
    df.withColumn("content_hash",
        graft.functions.GraftFunctions.fnv64(lower(trim(col(textCol)))))
      .withWatermark(tsCol, watermark)

  /** Content-hash streaming dedup — the replay-safe fix for the
    * reference's uuid-identity duplicate leak (SURVEY §2a O2/O5):
    * identical `text` is emitted once, EVER. State caveat: because the
    * dedup subset is the key alone (no event-time column),
    * `dropDuplicates` never evicts this state — exactly-once-per-content
    * forever, at the cost of state that grows with distinct contents.
    * For a watermark-BOUNDED state footprint use
    * [[contentDedupWithinWatermark]]. */
  def contentDedup(df: DataFrame, textCol: String, tsCol: String,
                   watermark: String): DataFrame =
    hashedWithWatermark(df, textCol, tsCol, watermark)
      .dropDuplicates("content_hash")

  /** [[contentDedup]] with a BOUNDED state footprint:
    * `dropDuplicatesWithinWatermark` keeps each key's state only until the
    * watermark passes its last sighting plus the horizon, then EVICTS it —
    * so state scales with the duplicate-arrival window, not with every
    * distinct content ever seen. Replays within the horizon (the
    * at-least-once failure mode) are still suppressed; a duplicate
    * arriving after eviction would be re-emitted, the explicit trade for
    * bounded state at 100 TB stream volumes. */
  def contentDedupWithinWatermark(df: DataFrame, textCol: String, tsCol: String,
                                  watermark: String): DataFrame =
    hashedWithWatermark(df, textCol, tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream–stream interval join: each left event matched to right events
    * of the same user within `[left.ts − lookback, left.ts]`. The time-range
    * predicate + both-side watermarks are what make this runnable as a
    * STREAMING join: they bound the state store to the lookback+watermark
    * horizon per key (without them Spark would have to buffer both streams
    * forever). State is sharded by the join key across executors — the
    * 100 TB shape is many small per-key buffers, no global state.
    *
    * Same code runs batch (where the predicates are just a theta join), so
    * the Spark-diff harness can equality-check streamed vs batch output.
    *
    * `idCol` names the per-row identifier both inputs carry (each side's is
    * emitted as `l_<idCol>` / `r_<idCol>`). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lookback: String,
                   watermark: String, idCol: String = "event_id"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(tsCol, watermark) else left)
      .select(col(keyCol).as("l_key"), col(tsCol).as("l_ts"),
        col(idCol).as(s"l_$idCol"))
    val r = (if (right.isStreaming) right.withWatermark(tsCol, watermark) else right)
      .select(col(keyCol).as("r_key"), col(tsCol).as("r_ts"),
        col(idCol).as(s"r_$idCol"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_key").as(keyCol), col(s"l_$idCol"), col(s"r_$idCol"),
        col("l_ts"), col("r_ts"))
  }

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class UserCount(user_id: Long, n: Long, total: Double)

  /** Running per-user counters via explicit keyed state
    * (`flatMapGroupsWithState`) — emits the updated running count for
    * each key touched in the micro-batch. State is one small record per
    * key, sharded by groupBy key across the cluster. */
  def runningUserCounters(ds: Dataset[EventRow]): Dataset[UserCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserCount, UserCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, events: Iterator[EventRow], state: GroupState[UserCount]) =>
          val prev = state.getOption.getOrElse(UserCount(userId, 0L, 0.0))
          var n = prev.n; var total = prev.total
          events.foreach { e => n += 1; total += e.value }
          val next = UserCount(userId, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same running counters on Spark 4's arbitrary-state API
    * (`transformWithState` + [[UserCounterProcessor]]): typed `ValueState`
    * handles, first-class timers/TTL, and the RocksDB state store as the
    * required backend — the forward path for stateful streaming (the
    * `flatMapGroupsWithState` variant above is the classic API, kept for
    * comparison; both must produce identical results). Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * …state.RocksDBStateStoreProvider` on the session. */
  def runningUserCountersTws(ds: Dataset[EventRow]): Dataset[UserCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new UserCounterProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }
}

/** [[StreamingOps.runningUserCountersTws]]'s per-key processor: one
  * `ValueState[UserCount]` per user, no timers (TimeMode.None). Top-level
  * class — the processor is serialized into tasks, and a nested one would
  * drag the enclosing object's state along. */
final class UserCounterProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, StreamingOps.EventRow, StreamingOps.UserCount] {
  import StreamingOps.UserCount
  @transient private var state: org.apache.spark.sql.streaming.ValueState[UserCount] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[UserCount]("counter",
      org.apache.spark.sql.Encoders.product[UserCount],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long,
                               rows: Iterator[StreamingOps.EventRow],
                               timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserCount] = {
    val prev = Option(state.get()).getOrElse(UserCount(key, 0L, 0.0))
    var n = prev.n; var total = prev.total
    rows.foreach { e => n += 1; total += e.value }
    val next = UserCount(key, n, total)
    state.update(next)
    Iterator.single(next)
  }
}
