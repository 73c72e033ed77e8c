package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: group documents into bins whose
  * token totals fit a context-window budget (one bin = one training
  * sequence built by concatenation). The reference pipeline stops at
  * per-document embeddings; packing is the step a pre-training corpus
  * needs between curation and the trainer.
  *
  * Algorithm: deterministic NEXT-FIT per partition — documents are hash-
  * partitioned by id (deterministic, no sampling), sorted by id within
  * each partition, and a sequential scan opens a new bin whenever the
  * current document would overflow the budget. Next-fit uses < 2·OPT + P
  * bins (P = partitions, one possibly-short tail bin each) and touches
  * each row once. Bins never span partitions, so the scan parallelizes
  * embarrassingly; the `mapPartitions` is the deliberate non-Catalyst
  * stage (a sequential running-state scan — the same category as the
  * embedding stage, not expressible as a window without a stateful
  * "reset on overflow" frame).
  *
  * A document larger than the budget gets a bin of its own (flagged via
  * `oversized`) — the caller decides whether to truncate or drop. Rows
  * with a null or NEGATIVE id/token count are dropped (nothing to pack;
  * a negative count is an upstream bug — e.g. non-ANSI `size(null)` = -1
  * — and must not silently pack as a zero-width doc).
  *
  * Bin ids are `(partitionId << 32) | localBin`: globally unique without
  * any cross-partition coordination.
  */
object Packing {

  def packNextFit(df: DataFrame, idCol: String, tokenCol: String,
                  budget: Int, partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val prepared = df
      .select(col(idCol).cast("long").as("_id"), col(tokenCol).cast("int").as("_tok"))
      .na.drop()
      .filter(col("_tok") >= 0)
      .repartition(n, col("_id"))
      .sortWithinPartitions("_id")
      .as[(Long, Int)]
    prepared.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId().toLong
      var localBin = -1L
      var used = budget.toLong + 1 // forces a fresh bin on the first row
      rows.map { case (id, tok) =>
        if (used + tok > budget) { localBin += 1; used = 0L }
        used += tok
        (id, tok, (pid << 32) | localBin, tok > budget)
      }
    }.toDF(idCol, tokenCol, "bin_id", "oversized")
  }
}
