package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter inside a [[MisraGries]] buffer. */
final case class MgEntry(value: String, weight: Long)

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * Agarwal et al. 2013, "Mergeable Summaries" — both public) as a typed
  * UDAF, completing the sketch family next to HLL/KLL/Theta.
  *
  * Guarantee: with `k` counters over n rows, every item's surviving
  * weight undercounts its true frequency by at most n/(k+1), so every
  * item with true count > n/(k+1) SURVIVES regardless of arrival order
  * or partitioning — the candidate set is a deterministic superset of
  * the φ-heavy hitters whenever k ≥ ⌈1/φ⌉. Surviving WEIGHTS are
  * order-dependent (inherent to MG); callers wanting exact counts run
  * the bounded verify pass ([[graft.ops.CorpusStats.heavyHitters]]).
  *
  * Why it matters at 100 TB: a groupBy-count over a huge key space
  * (all n-grams, URLs) shuffles the full distinct-key set; this sketch
  * caps the exchange at ≤ 2k rows per partition — ObjectHashAggregate
  * partial → Exchange(≤ 2k·P rows) → final merge (≤ k out) — independent
  * of key cardinality.
  *
  * Reduce uses the DataSketches frequent-items purge (Anderson et al.
  * 2017, public) instead of the classic decrement-by-one: counters live
  * in a 2k-slot buffer, and only when it FILLS is the (k+1)-th largest
  * weight subtracted from all (dropping ≥ k entries, so the next ≥ k
  * non-resident rows insert for free). The classic rule rebuilt the
  * whole map on EVERY non-resident row — O(k) allocations per row once
  * full, the dominant path on heavy-tailed corpora (r15 ADVICE); the
  * purge amortizes that rebuild to O(1) per row while the guarantee is
  * unchanged: each purge subtracting `cut` destroys ≥ cut·(k+1) weight
  * (the k+1 largest each lose exactly `cut`), so Σ cuts ≤ n/(k+1) and
  * every item with true count > n/(k+1) still survives.
  *
  * Merge rule (Agarwal et al.): add counters; if more than k survive,
  * subtract the (k+1)-th largest weight from all and drop the
  * non-positive — error bounds add, keeping the n/(k+1) total.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[MgEntry]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b
    else b.get(v) match {
      case Some(w) => b.updated(v, w + 1L) // persistent-trie update, O(log)
      case None if b.size < 2 * k => b.updated(v, 1L)
      case None =>
        // amortized purge: subtract the (k+1)-th largest from everything,
        // drop the non-positive (≥ k entries go, freeing ≥ k cheap
        // inserts), then seat the arriving value
        val cut = b.valuesIterator.toArray.sortBy(-_).apply(k)
        b.collect { case (x, w) if w > cut => (x, w - cut) }
          .updated(v, 1L)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (x, w)) =>
      m.updated(x, m.getOrElse(x, 0L) + w)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.collect { case (x, w) if w > cut => (x, w - cut) }
    }
  }

  override def finish(r: Map[String, Long]): Seq[MgEntry] =
    r.toSeq.sortBy { case (x, w) => (-w, x) }.map { case (x, w) => MgEntry(x, w) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[MgEntry]] =
    ExpressionEncoder[Seq[MgEntry]]()
}
