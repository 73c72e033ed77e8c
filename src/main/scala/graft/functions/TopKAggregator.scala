package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate inside a [[TopKByScore]] buffer. */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k by (score desc, id asc) as a typed UDAF.
  *
  * Top-k is a mergeable sketch: the global top-k is always contained in the
  * union of per-partition top-ks, so each partial buffer can be trimmed to
  * k without losing correctness. Catalyst plans this as
  * ObjectHashAggregate(partial) → Exchange → ObjectHashAggregate(final):
  * the exchange carries at most k rows per (input partition, group) — the
  * fix for the knn-join shape where a window rank shuffled the entire
  * corpus into each query's single partition.
  *
  * Buffers append up to `cap` before re-trimming so the O(n log n) sort
  * amortizes across ~3k appends instead of running per row.
  */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Array[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")
  private val cap = math.max(k * 4, 64)

  private def top(buf: Array[ScoredId]): Array[ScoredId] = {
    java.util.Arrays.sort(buf, (a: ScoredId, b: ScoredId) => {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    })
    if (buf.length <= k) buf else java.util.Arrays.copyOf(buf, k)
  }

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(b: Array[ScoredId], v: ScoredId): Array[ScoredId] = {
    val grown = java.util.Arrays.copyOf(b, b.length + 1)
    grown(b.length) = v
    if (grown.length > cap) top(grown) else grown
  }

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] = {
    val both = new Array[ScoredId](a.length + b.length)
    System.arraycopy(a, 0, both, 0, a.length)
    System.arraycopy(b, 0, both, a.length, b.length)
    top(both)
  }

  override def finish(r: Array[ScoredId]): Seq[ScoredId] = top(r.clone()).toSeq

  override def bufferEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
