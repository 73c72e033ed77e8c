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
  def append(docs: DataFrame, dir: String): Unit =
    docs.withColumn("date_day", to_date(col("date")))
      .write.mode("append")
      .partitionBy("date_day")
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
