package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF-PQ index as a continuously-maintained PARTITIONED TABLE — the
  * piece that turns [[Knn.ivfPqSearch]]'s "at 100 TB the codes table is
  * laid out partitioned by `_cell`" doc-note into an on-disk reality with
  * a streaming maintenance path.
  *
  * Layout: `dir/batch=<id>/_cell=<c>/part-….parquet`. Each micro-batch computes
  * its rows' coarse cells ([[Knn.ivfAssign]]) and PQ codes
  * ([[Knn.pqEncode]]) ONCE at ingest and lands in its own `batch=<id>`
  * partition with overwrite semantics — the same exactly-once-effect
  * recipe as [[graft.sink.VectorTable.appendIdempotent]], so at-least-once
  * replay rewrites instead of duplicating. `_cell` is a physical partition
  * column: a probe's `nProbe`-cell filter becomes PartitionFilters at the
  * parquet scan — pruned cells are never read from storage, which is the
  * multiplicative IVF×PQ saving the index exists for.
  *
  * The quantizer/codebooks are trained once (bounded sample) and must stay
  * fixed for the table's lifetime — codes are meaningless under any other
  * codebook (see [[Knn.pqSearch]]'s versioning caveat). Re-training means
  * re-encoding: write a new table, not new batches of an old one.
  *
  * Float vectors ride along in the data files for the exact re-rank step;
  * only the shortlist's row groups ever read them, while ADC scoring
  * touches the m-byte codes column.
  */
object VectorIndex {

  /** One micro-batch → indexed rows: `_cell` (coarse quantizer) and `_pq`
    * (codes) computed at ingest. */
  def encodeBatch(batch: DataFrame, vecCol: String,
                  centroids: Array[Array[Float]],
                  codebooks: Array[Array[Array[Float]]]): DataFrame =
    Knn.pqEncode(Knn.ivfAssign(batch, vecCol, centroids), vecCol, codebooks)

  /** Idempotent micro-batch append: replayed batch ids overwrite their own
    * `batch=<id>` partition. Pass as the `foreachBatch` body for a
    * streaming index. */
  def appendIdempotent(batch: DataFrame, vecCol: String,
                       centroids: Array[Array[Float]],
                       codebooks: Array[Array[Array[Float]]],
                       dir: String, batchId: Long): Unit =
    encodeBatch(batch, vecCol, centroids, codebooks)
      .write.mode("overwrite")
      .partitionBy("_cell")
      .parquet(s"$dir/batch=$batchId")

  /** The indexed table across all batches; `basePath` keeps `batch` out of
    * the document schema, `_cell` comes back as the partition column. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/batch=*")
      .drop("batch")

  /** Compaction: fold the per-micro-batch layout (one small `batch=<id>`
    * dir per trigger — thousands of small files after a day of streaming)
    * into a plain `_cell`-partitioned table, one id kept per row
    * deterministically (the [[graft.sink.VectorTable.dedupeById]] rule,
    * paranoia against concurrent replay). The operational companion of
    * [[appendIdempotent]]: streams write small-and-replay-safe, a periodic
    * compaction job rewrites cold batches into scan-efficient cell
    * partitions. [[probe]] works identically on either layout — `_cell`
    * stays the physical partition column. */
  def compact(spark: SparkSession, batchedDir: String, outDir: String,
              idCol: String): Unit =
    graft.sink.VectorTable.dedupeById(read(spark, batchedDir), idCol)
      // cluster by cell before writing: dedupeById leaves rows hashed by
      // id, so every write task would otherwise emit a file into (almost)
      // every _cell directory — shufflePartitions × nCells small files,
      // re-creating the fragmentation compaction exists to remove
      .repartition(col("_cell"))
      .write.mode("overwrite")
      .partitionBy("_cell")
      .parquet(outDir)

  /** [[probe]] for a [[compact]]-written table (no `batch=` level). */
  def probeCompacted(spark: SparkSession, dir: String, vecCol: String,
                     idCol: String, centroids: Array[Array[Float]],
                     codebooks: Array[Array[Array[Float]]],
                     queryVec: Array[Float], k: Int,
                     nProbe: Int, shortlist: Int = 64): DataFrame =
    Knn.ivfPqSearch(spark.read.parquet(dir), vecCol, idCol,
      centroids, codebooks, queryVec, k, nProbe, shortlist)

  /** IVF-PQ probe against the on-disk layout: identical semantics to
    * [[Knn.ivfPqSearch]] over the same rows, but cell pruning happens at
    * the SCAN (PartitionFilters) — non-probed cells are never read. */
  def probe(spark: SparkSession, dir: String, vecCol: String, idCol: String,
            centroids: Array[Array[Float]],
            codebooks: Array[Array[Array[Float]]],
            queryVec: Array[Float], k: Int,
            nProbe: Int, shortlist: Int = 64): DataFrame =
    Knn.ivfPqSearch(read(spark, dir), vecCol, idCol,
      centroids, codebooks, queryVec, k, nProbe, shortlist)
}
