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
    * stays the physical partition column. In-place overwrite: only safe
    * with no concurrent readers — a probe that must run DURING compaction
    * belongs on the generational layout ([[compactGen]]/[[probeLive]]). */
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

  // ------------------------------------------------------------------
  // Generational compaction — the read-during-compaction contract.
  //
  // [[compact]] overwrites its output IN PLACE, which is only safe when
  // nothing reads the table meanwhile. The generational layout removes
  // that window: each compaction writes a complete snapshot into a
  // temporary directory, then PUBLISHES it with one atomic FS rename to
  // `gen=<n>` — a concurrent reader resolves the latest complete
  // generation and either sees the old snapshot or the new one, never a
  // half-written mix. The generation carries a `_watermark` file naming
  // the highest `batch=<id>` it folded, so the live view is
  // `gen=<latest> ∪ batches > watermark`: streaming appends (and replays
  // of already-folded batches, which rewrite dirs the live view no longer
  // reads) stay visible and consistent throughout.

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def listIds(spark: SparkSession, dir: String,
                      prefix: String): Seq[Long] = {
    val (f, p) = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(n => n.stripPrefix(prefix).toLong)
  }

  /** Latest PUBLISHED generation id under `tableDir`, if any. */
  def latestGen(spark: SparkSession, tableDir: String): Option[Long] =
    listIds(spark, tableDir, "gen=").sorted.lastOption

  /** `batch=<id>` dirs that are provably COMMITTED — the `_SUCCESS` marker
    * Spark's commit protocol writes last is present. A directory being
    * written (or overwrite-replayed: overwrite deletes the dir, marker
    * included, before rewriting) concurrently has no marker and is
    * excluded — folding it would capture a partial batch AND advance the
    * watermark past rows that only land when the write commits, making
    * them permanently invisible to [[readLive]]. A committed id above an
    * in-flight smaller id is safe under the single-writer streaming
    * contract: `foreachBatch` commits batches in order, so a hole below
    * the committed max can only be a replay REWRITE of a batch some
    * earlier listing already folded. */
  private def committedBatchIds(spark: SparkSession,
                                batchedDir: String): Seq[Long] = {
    val (f, _) = fs(spark, batchedDir)
    listIds(spark, batchedDir, "batch=").filter(b => f.exists(
      new org.apache.hadoop.fs.Path(s"$batchedDir/batch=$b/_SUCCESS")))
  }

  /** The max batch id a generation folded (its `_watermark` sidecar). */
  private def watermarkOf(spark: SparkSession, tableDir: String,
                          gen: Long): Long = {
    val (f, _) = fs(spark, tableDir)
    val wm = new org.apache.hadoop.fs.Path(s"$tableDir/gen=$gen/_watermark")
    val in = f.open(wm)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    finally in.close()
  }

  /** Compact every COMMITTED `batch=<id>` dir into the next generation
    * snapshot and publish it atomically. Batches appended (or still being
    * written) after/during the listing simply stay live through the tail
    * union until the next compaction — no coordination with the writer is
    * needed, because only `_SUCCESS`-committed dirs are folded and the
    * watermark is the max COMMITTED id ([[committedBatchIds]]). */
  def compactGen(spark: SparkSession, batchedDir: String, tableDir: String,
                 idCol: String): Unit = {
    val batchIds = committedBatchIds(spark, batchedDir)
    require(batchIds.nonEmpty, s"nothing committed to compact under $batchedDir")
    val nextGen = latestGen(spark, tableDir).getOrElse(-1L) + 1
    val tmp = s"$tableDir/_tmp-gen=$nextGen"
    graft.sink.VectorTable.dedupeById(
        spark.read.option("basePath", batchedDir)
          .parquet(batchIds.map(b => s"$batchedDir/batch=$b"): _*)
          .drop("batch"), idCol)
      .repartition(col("_cell"))
      .write.mode("overwrite")
      .partitionBy("_cell")
      .parquet(tmp)
    val (f, _) = fs(spark, tableDir)
    val wm = f.create(new org.apache.hadoop.fs.Path(s"$tmp/_watermark"), true)
    try wm.write(batchIds.max.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally wm.close()
    // the publish: one atomic rename — readers see gen=<n> complete or not
    // at all
    if (!f.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$tableDir/gen=$nextGen")))
      throw new java.io.IOException(s"failed to publish $tableDir/gen=$nextGen")
    // prune generations older than the PREVIOUS one: the previous stays on
    // disk for readers that resolved it just before this publish
    listIds(spark, tableDir, "gen=").sorted.dropRight(2).foreach { g =>
      f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/gen=$g"), true)
    }
  }

  /** The live view: latest published generation plus every COMMITTED batch
    * newer than its watermark (all committed batches when no generation
    * exists yet) — an in-flight write's partial files are never read. */
  def readLive(spark: SparkSession, batchedDir: String,
               tableDir: String): DataFrame =
    latestGen(spark, tableDir) match {
      case None =>
        val ids = committedBatchIds(spark, batchedDir)
        require(ids.nonEmpty, s"no committed batches under $batchedDir")
        spark.read.option("basePath", batchedDir)
          .parquet(ids.map(b => s"$batchedDir/batch=$b"): _*)
          .drop("batch")
      case Some(g) =>
        val wmId = watermarkOf(spark, tableDir, g)
        val genDf = spark.read.parquet(s"$tableDir/gen=$g")
        val tailIds = committedBatchIds(spark, batchedDir).filter(_ > wmId)
        if (tailIds.isEmpty) genDf
        else genDf.unionByName(
          spark.read.option("basePath", batchedDir)
            .parquet(tailIds.map(b => s"$batchedDir/batch=$b"): _*)
            .drop("batch")
            .select(genDf.columns.map(col).toIndexedSeq: _*))
    }

  /** [[probe]] over the [[readLive]] view — correct at every instant of a
    * concurrent [[compactGen]]. */
  def probeLive(spark: SparkSession, batchedDir: String, tableDir: String,
                vecCol: String, idCol: String,
                centroids: Array[Array[Float]],
                codebooks: Array[Array[Array[Float]]],
                queryVec: Array[Float], k: Int,
                nProbe: Int, shortlist: Int = 64): DataFrame =
    Knn.ivfPqSearch(readLive(spark, batchedDir, tableDir), vecCol, idCol,
      centroids, codebooks, queryVec, k, nProbe, shortlist)

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
