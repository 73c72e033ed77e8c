package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed stand-in for the reference's OpenSearch knn index
  * (SURVEY §1.4): schema `(passage_embedding array<float>, date timestamp,
  * text string, _id string)`.
  *
  * Scale design: partitioned by `date_day` so time-bounded retrieval prunes
  * partitions at the scan, mirroring how a 100 TB corpus would be laid out
  * (daily ingest partitions); within a partition, parquet row groups keep
  * the embedding column contiguous for vectorized reads. The reference's
  * "5 shards" static layout maps to dynamic partitioning here.
  */
object VectorTable {

  /** The canonical vector-document schema (FIXTURES A4 / reference index
    * mapping `index-creation-function/lambda_function.py:69-96`). */
  val schema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("passage_embedding", ArrayType(FloatType)),
      StructField("date", TimestampType),
      StructField("text", StringType),
      StructField("_id", StringType)))
  }

  /** Idempotent create-if-absent — the engine-side analogue of the
    * reference's index-bootstrap lambda
    * (`index-creation-function/lambda_function.py:35-49`: HEAD the index,
    * PUT mapping only when missing). Creates the table directory and a
    * `_schema.json` sidecar so consumers starting BEFORE the first batch
    * ([[readOrEmpty]]) can resolve the document schema. Safe to call on
    * every job start; never touches data files.
    *
    * Goes through the Hadoop FileSystem API resolved from the path — a
    * `java.io.File` implementation would silently no-op on the object
    * stores (s3a://, hdfs://) this sink targets in production. */
  def bootstrap(dir: String): Unit = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    fs.mkdirs(path)
    val sidecar = new org.apache.hadoop.fs.Path(path, "_schema.json")
    if (!fs.exists(sidecar)) {
      val out = fs.create(sidecar, false)
      try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** [[read]], but an empty bootstrapped table (no parquet files yet)
    * yields a 0-row DataFrame with the canonical schema instead of
    * failing schema inference. Hadoop-FS-based for the same reason as
    * [[bootstrap]]. */
  def readOrEmpty(spark: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def hasParquet: Boolean = {
      if (!fs.exists(path)) return false
      val it = fs.listFiles(path, /* recursive = */ true)
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) return true
      }
      false
    }
    if (hasParquet) read(spark, dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def append(docs: DataFrame, dir: String): Unit =
    docs.withColumn("date_day", to_date(col("date")))
      .write.mode("append")
      .partitionBy("date_day")
      .parquet(dir)

  /** Idempotent micro-batch write: each batch lands in its own
    * `batch=<id>` partition with OVERWRITE semantics, so an at-least-once
    * replay of batch N rewrites `batch=N` instead of appending duplicates —
    * the standard foreachBatch exactly-once-effect pattern, and the fix for
    * the reference's duplicate-on-replay sink (`DataStreamJob.java:191`
    * drops `_id`, so its store mints a fresh doc id per replayed record). */
  def appendIdempotent(docs: DataFrame, dir: String, batchId: Long): Unit =
    docs.withColumn("date_day", to_date(col("date")))
      .write.mode("overwrite")
      .partitionBy("date_day")
      .parquet(s"$dir/batch=$batchId")

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Read an [[appendIdempotent]]-written table. `basePath` keeps the
    * `batch` partition column out of the schema. */
  def readBatched(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/batch=*")
      .drop("batch")

  /** Belt-and-braces replay cleanup for `_id`-keyed tables written with
    * plain [[append]]: keep one row per `_id`, chosen DETERMINISTICALLY
    * (min row-content hash wins) so two compaction runs over the same input
    * produce byte-identical output even when a replayed batch carried
    * divergent content for an id — `dropDuplicates` would keep whichever
    * row a scan met first. One hash shuffle on `_id` with map-side partial
    * `min_by` — at 100 TB this is the compaction job, not a read-path tax. */
  def dedupeById(docs: DataFrame, idCol: String = "_id"): DataFrame = {
    val others = docs.columns.filterNot(_ == idCol)
    val rowStruct = struct(others.map(col): _*)
    docs.groupBy(col(idCol))
      .agg(min_by(rowStruct, xxhash64(rowStruct)).as("_row"))
      .select(docs.columns.map(c =>
        if (c == idCol) col(c) else col(s"_row.`$c`").as(c)): _*)
  }

  /** Compaction: fold an [[appendIdempotent]]-written table (one tiny
    * `batch=<id>` dir per micro-batch — thousands of small files after a
    * day of streaming) into the plain `date_day`-partitioned layout of
    * [[append]]/[[read]]. The operational companion of the idempotent
    * sink: streams write small-and-replay-safe, a periodic compaction job
    * rewrites cold batches into scan-efficient daily partitions. Reads the
    * batched table once, dedupes `_id` (paranoia against concurrent
    * replay), writes `outDir` partitioned by day. */
  def compact(spark: SparkSession, batchedDir: String, outDir: String): Unit =
    dedupeById(readBatched(spark, batchedDir))
      .withColumn("date_day", to_date(col("date")))
      .write.mode("overwrite")
      .partitionBy("date_day")
      .parquet(outDir)
}
