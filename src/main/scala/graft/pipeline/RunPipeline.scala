package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.embed.{EmbeddingModels, RetryPolicy, StubEmbeddingProvider}

/** Runtime configuration for the pipeline runner — the Spark analogue of the
  * reference's application-properties loading
  * (`…/DataStreamJob.java:90-103` reads `KinesisConsumerConfig` /
  * `MSKConnectionConfig` property groups at startup) and of its
  * start/poll/stop lifecycle lambda (`startFlinkApplication/index.py:28-44`).
  *
  * Keys (k=v args, later wins; `@/path/file.properties` loads a Java
  * properties file in place):
  *
  *  - `mode`            batch | streaming | streaming-kafka
  *  - `source.path`     input dir/file (batch + streaming modes)
  *  - `kafka.bootstrap` bootstrap servers (streaming-kafka)
  *  - `kafka.topic`     topic (streaming-kafka)
  *  - `kafka.startingOffsets` earliest (default) | latest | json
  *  - `kafka.option.*`  passed through to the consumer (SASL etc.)
  *  - `sink.kind`       parquet (default) | memory | http —
  *                      [[graft.sink.VectorSink]] implementation; `memory`
  *                      treats `sink.dir` as the in-memory table name
  *                      (test/demo backend)
  *  - `sink.dir`        vector-table output dir (parquet) or table name (memory)
  *  - `sink.endpoint`   http: base URL of the bulk-indexing store
  *  - `sink.index`      http: target index name
  *  - `sink.bulkMaxDocs` / `sink.flushMs` / `sink.maxAttempts`
  *                      http: bulk sizing, buffer age cap (reference runs
  *                      1 ms, `DataStreamJob.java:173`), retry attempts
  *  - `sink.authHeader` http: `Name: value` auth header (the SigV4
  *                      interceptor seam, `DataStreamJob.java:158-170`)
  *  - `sink.deadletter.dir`  http: NDJSON dead-letter dir for bulks that
  *                      exhaust their retries
  *  - `checkpoint.dir`  streaming checkpoint location
  *  - `model`           titan-v1 (default) | titan-v2 — reference registry
  *  - `embed.endpoint`  HTTP embedding endpoint URL → uses
  *                      [[graft.embed.HttpEmbeddingProvider]]; absent → the
  *                      deterministic stub (no-egress default)
  *  - `embed.maxInFlight`  bounded concurrency (default 1000, the
  *                      reference's `unorderedWait` capacity)
  *  - `embed.maxAttempts`  retry attempts before dead-letter (default 3)
  *  - `deadletter.dir`  where embed dead-letters land (batch + streaming;
  *                      streaming uses the per-batch idempotent layout)
  *  - `chunk.size`      opt-in O3.5 passage chunking, every mode: window
  *                      size in tokens; `chunk.stride` (default = size)
  *                      sets the overlap stride
  *  - `timeout.s`       streaming: stop gracefully after N seconds (0 = run
  *                      until external termination)
  */
final case class PipelineConfig(settings: Map[String, String]) {
  def get(key: String): Option[String] = settings.get(key)
  def apply(key: String): String = settings.getOrElse(key,
    throw new IllegalArgumentException(s"missing required config key: $key"))
  def getOrElse(key: String, default: String): String = settings.getOrElse(key, default)

  def mode: String = getOrElse("mode", "batch")
  def modelAlias: String = getOrElse("model", "titan-v1")
  def sinkKind: String = getOrElse("sink.kind", "parquet")
  def maxInFlight: Int = getOrElse("embed.maxInFlight", "1000").toInt
  def retryPolicy: RetryPolicy =
    RetryPolicy(maxAttempts = getOrElse("embed.maxAttempts", "3").toInt)
  def kafkaExtra: Map[String, String] =
    settings.collect { case (k, v) if k.startsWith("kafka.option.") =>
      k.stripPrefix("kafka.option.") -> v }

  def validated: PipelineConfig = {
    require(Set("batch", "streaming", "streaming-kafka")(mode), s"unknown mode: $mode")
    require(Set("parquet", "memory", "http")(sinkKind), s"unknown sink.kind: $sinkKind")
    EmbeddingModels.dimOf(modelAlias) // throws on unknown model
    mode match {
      case "batch" | "streaming" => apply("source.path")
      case "streaming-kafka"     => apply("kafka.bootstrap"); apply("kafka.topic")
    }
    if (sinkKind == "http") { apply("sink.endpoint"); apply("sink.index") }
    else apply("sink.dir")
    if (mode != "batch") apply("checkpoint.dir")
    this
  }
}

object PipelineConfig {
  /** `k=v` args in order (later wins); `@file` loads a properties file. */
  def parse(args: Seq[String]): PipelineConfig =
    PipelineConfig(args.foldLeft(Map.empty[String, String]) { (acc, arg) =>
      if (arg.startsWith("@")) acc ++ loadProperties(arg.drop(1))
      else arg.split("=", 2) match {
        case Array(k, v) => acc + (k.trim -> v.trim)
        case _ => throw new IllegalArgumentException(s"expected k=v or @file, got: $arg")
      }
    })

  private def loadProperties(path: String): Map[String, String] = {
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }
}

/** Config-driven pipeline runner: `runMain graft.pipeline.RunPipeline
  * mode=batch source.path=… sink.dir=…` (or `@app.properties`). */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val conf = PipelineConfig.parse(args.toSeq).validated
    val spark = SparkSession.builder()
      .appName("graft-rag-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, conf) finally spark.stop()
  }

  /** Separated from `main` so tests can drive it with their own session. */
  def run(spark: SparkSession, conf: PipelineConfig): Unit = {
    // no-egress default is the deterministic stub; an explicit endpoint
    // opts into the real process-boundary HTTP provider
    val provider: graft.embed.EmbeddingProvider = conf.get("embed.endpoint") match {
      case Some(url) => graft.embed.HttpEmbeddingProvider(url, conf.modelAlias)
      case None      => StubEmbeddingProvider(conf.modelAlias)
    }
    val sink: graft.sink.VectorSink = conf.sinkKind match {
      case "memory" => graft.sink.MemoryVectorSink(conf("sink.dir"))
      case "http" => graft.sink.HttpVectorSink(
        endpoint = conf("sink.endpoint"),
        index = conf("sink.index"),
        bulkMaxDocs = conf.getOrElse("sink.bulkMaxDocs", "500").toInt,
        flushIntervalMs = conf.getOrElse("sink.flushMs", "200").toLong,
        maxAttempts = conf.getOrElse("sink.maxAttempts", "3").toInt,
        authHeader = conf.get("sink.authHeader").map { h =>
          h.split(":", 2) match {
            case Array(k, v) => (k.trim, v.trim)
            case _ => throw new IllegalArgumentException(
              s"sink.authHeader must be 'Name: value', got: $h")
          }
        },
        deadLetterDir = conf.get("sink.deadletter.dir"))
      case _ => graft.sink.ParquetVectorSink(conf("sink.dir"))
    }
    // opt-in O3.5 passage chunking for EVERY mode: chunk.size=<tokens>
    // (chunk.stride defaults to size → disjoint windows)
    val chunking: Option[(Int, Int)] = conf.get("chunk.size").map { sz =>
      (sz.toInt, conf.getOrElse("chunk.stride", sz).toInt) }
    // explicit DDL stage, reference index-creation-lambda parity: the
    // table exists with its schema before any data flows
    sink.bootstrap()
    conf.mode match {
      case "batch" =>
        val raw = spark.read.text(conf("source.path")).toDF("value")
        // cached: the dead-letter write and the sink write must read ONE
        // embedding pass — an uncached plan would re-embed every document
        // (double provider cost) and let a flaky record land in both
        // outputs or neither
        val attempts = RagPipeline.embedSafe(RagPipeline.preEmbed(raw, chunking),
          provider, conf.retryPolicy, conf.maxInFlight).cache()
        try {
          conf.get("deadletter.dir").foreach { dl =>
            // run-scoped OVERWRITE mirrors the streaming batch=<id> layout:
            // re-running the same batch job replaces its dead-letters
            // instead of appending duplicates (the run key is the source
            // path, which identifies the batch input)
            val runId = java.lang.Long.toHexString(
              graft.functions.TextHashing.fnv64(conf("source.path")))
            RagPipeline.embedDeadLetters(attempts)
              .write.mode("overwrite").parquet(s"$dl/run=$runId")
          }
          sink.append(
            RagPipeline.toVectorDocs(RagPipeline.embedSuccesses(attempts)))
        } finally attempts.unpersist()

      case "streaming" =>
        val q = conf.get("deadletter.dir") match {
          case Some(dl) => RagPipeline.streamingSafeTo(spark, conf("source.path"),
            sink, dl, conf("checkpoint.dir"), provider, conf.retryPolicy, chunking)
          case None => RagPipeline.streamingTo(spark, conf("source.path"),
            sink, conf("checkpoint.dir"), provider, chunking)
        }
        awaitWithTimeout(q, conf)

      case "streaming-kafka" =>
        val q = RagPipeline.streamingKafka(spark, conf("kafka.bootstrap"),
          conf("kafka.topic"), conf("sink.dir"), conf("checkpoint.dir"),
          conf.getOrElse("kafka.startingOffsets", "earliest"),
          conf.kafkaExtra, provider, chunking)
        awaitWithTimeout(q, conf)
    }
  }

  private def awaitWithTimeout(q: org.apache.spark.sql.streaming.StreamingQuery,
                               conf: PipelineConfig): Unit = {
    val timeoutS = conf.getOrElse("timeout.s", "0").toLong
    if (timeoutS > 0) { q.awaitTermination(timeoutS * 1000); q.stop() }
    else q.awaitTermination()
  }
}
