package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for every left event, the most recent right row at or
  * before it" — the temporal-alignment operator every event-analytics /
  * feature-backfill pipeline needs (align clicks to purchases, trades to
  * quotes, telemetry to config pushes). Spark has no built-in; the naive
  * encodings are both scale-killers:
  *
  *  - range theta-join (`l.key = r.key AND r.t <= l.t`) explodes to every
  *    qualifying pair per key (quadratic in per-key row counts) and then
  *    needs a ranked dedup;
  *  - per-key `collect_list` + UDF buffers whole keys in memory.
  *
  * This implementation is the MERGE formulation: union both sides tagged,
  * ONE hash shuffle on the key, one sort by (time, side), and a running
  * `last(non-null right payload)` window. Cost is the information-theoretic
  * floor for an as-of join — shuffle + sort of |L| + |R| rows — with
  * bounded state (one struct per partition-row during the window scan), no
  * pair expansion, no per-key buffering. At 100 TB both inputs stream
  * through a single exchange each.
  */
object AsOf {

  /** Inner as-of join. `left` and `right` must share the `key` and `time`
    * column names (rename upstream); every other column name must be
    * distinct across the two inputs. Right rows must be unique per
    * (key, time) — a duplicate-time as-of is ill-defined (DuckDB's native
    * ASOF JOIN has the same precondition); dedupe upstream (e.g.
    * `max_by`-aggregate per (key, time)).
    *
    * Output: every left column, plus the matched right row's time as
    * `asof_<time>`, plus the right payload columns. Left rows with no
    * right row at-or-before them are dropped (inner semantics; the
    * unmatched rows carry a null match struct before the final filter, so
    * left-join semantics is the same plan minus that filter). */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, time: String): DataFrame = {
    val rPayload = right.columns.filterNot(c => c == key || c == time)
    val clash = rPayload.intersect(left.columns)
    require(clash.isEmpty, s"right payload columns collide with left: ${clash.mkString(",")}")
    // the merge plan's internal columns are reserved — an input column named
    // _asof_* would be silently shadowed or break resolution deep in the plan
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("_asof_"))
    require(reserved.isEmpty,
      s"input columns use reserved _asof_* names: ${reserved.distinct.mkString(",")}")

    val side = "_asof_side"
    val matchStruct = "_asof_r"
    // null keys never equi-match and null times never satisfy t' <= t, so
    // such rows are dropped UP FRONT on both sides — without this, a
    // null-time right row would sort FIRST (asc = nulls first) and wrongly
    // match every left row that has no real prior right row
    val lClean = left.filter(col(key).isNotNull && col(time).isNotNull)
    val rClean = right.filter(col(key).isNotNull && col(time).isNotNull)
    // right rows carry their payload in ONE nullable struct so the window
    // needs a single last(); its time rides along as field `_asof_t`
    val r = rClean.select(
      col(key), col(time), lit(0).as(side),
      struct((col(time).as("_asof_t") +: rPayload.map(col)): _*).as(matchStruct))
    val l = lClean.withColumn(side, lit(1))
    // allowMissingColumns: left rows get a null match struct, right rows
    // get nulls for the left payload columns
    val merged = l.unionByName(r, allowMissingColumns = true)

    // side orders right (0) before left (1) at equal time: a right row AT
    // the left row's time matches (<= semantics). Equal-time LEFT rows are
    // order-independent — none of them contributes to the running last().
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = merged
      .withColumn("_asof_m", last(col(matchStruct), ignoreNulls = true).over(w))
      .filter(col(side) === 1 && col("_asof_m").isNotNull)

    val out = left.columns.map(col) ++
      (col(s"_asof_m._asof_t").as(s"asof_$time") +:
        rPayload.map(c => col(s"_asof_m.`$c`").as(c)))
    matched.select(out: _*)
  }
}
