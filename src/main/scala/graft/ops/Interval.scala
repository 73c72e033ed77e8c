package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — the two-table generalization of the point-in-
  * range shapes ([[AsOf]] as-of join, theta-range join): match every left
  * interval with every right interval it overlaps, `[s, e)` half-open on
  * LONG instants (touching intervals do NOT match).
  *
  * The naive plan for `lS < rE AND rS < lE` is a nested-loop/range
  * explosion — no equi-key, so Spark falls back to
  * BroadcastNestedLoopJoin, quadratic at scale. Here each interval
  * explodes into the fixed-width time buckets it covers
  * (`⌊s/w⌋ .. ⌊(e−1)/w⌋`), candidates equi-join per bucket, and the
  * residual predicate restores exactness. The FIRST-COMMON-BUCKET rule —
  * keep a pair only in bucket `max(⌊lS/w⌋, ⌊rS/w⌋)`, the bucket of the
  * later start, which both intervals provably cover — makes every
  * overlapping pair survive in EXACTLY one bucket, so no distinct pass
  * (the sub-block-replication argument from
  * [[Dedup.semanticNearDupsAssigned]], applied to time).
  */
object Interval {

  /** Bucketized overlap join. `lStart`/`lEnd`/`rStart`/`rEnd` are LONG
    * instant columns (e.g. `unix_micros`); rows with `end ≤ start` are
    * dropped (empty intervals overlap nothing). Output: the left columns
    * followed by the right columns, one row per overlapping pair.
    *
    * Scale shape: replication factor per row is ceil(span/width) — pick
    * `bucketWidth` near the typical interval length so most intervals
    * land in 1–2 buckets; the join is a pure equi-join on the bucket id
    * (shuffle or broadcast hash, never a nested loop — PlanSpec pins
    * this). The inherent hot spot of overlap joins — a bucket with many
    * CONCURRENT intervals — is a data property, not a plan defect; widen
    * the bucket or salt the heavy window if one interval overlaps
    * millions. Instants are required non-negative (epoch times): `div`
    * truncation equals floor there, keeping bucket ids exact LONG
    * arithmetic. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def withBuckets(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.filter(col(e) > col(s) && col(s) >= 0)
        .withColumn(s"_b0$tag", expr(s"$s div ${bucketWidth}L"))
        .withColumn("_bkt", explode(sequence(col(s"_b0$tag"),
          expr(s"($e - 1) div ${bucketWidth}L"))))
    val l = withBuckets(left, lStart, lEnd, "l")
    val r = withBuckets(right, rStart, rEnd, "r")
    l.join(r, Seq("_bkt"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bkt") === greatest(col("_b0l"), col("_b0r")))
      .drop("_bkt", "_b0l", "_b0r")
  }

  /** [[overlapJoin]] plus the overlap length — the common consumer shape
    * ("how long did these two intervals coexist"):
    * `overlap = least(lE, rE) − greatest(lS, rS)`, exact LONG. */
  def overlapJoinWithLength(left: DataFrame, lStart: String, lEnd: String,
                            right: DataFrame, rStart: String, rEnd: String,
                            bucketWidth: Long): DataFrame =
    overlapJoin(left, lStart, lEnd, right, rStart, rEnd, bucketWidth)
      .withColumn("overlap_len",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
}
