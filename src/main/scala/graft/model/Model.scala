package graft.model

import org.apache.spark.sql.types._

/** Record types of the RAG embedding pipeline.
  *
  * Mirrors the reference's wire/POJO shapes (SURVEY.md §1.2):
  *  - wire JSON `{"text": ..., "created_at": ...}` — reference
  *    `kds-producer-lambda/lambda_function.py:13-19`
  *  - parsed POJO `CustomMessage {String text; String created_at}` —
  *    reference `pojo/CustomMessage.java:5-6`
  *  - enriched `{text, created_at, _id}` —
  *    reference `operators/map/CustomMessageToJSONObject.java:25-37`
  *  - sink doc `{passage_embedding, date, text}` —
  *    reference `DataStreamJob.java:183-193`
  *
  * Timestamps are carried as ISO-8601 strings end-to-end, exactly like the
  * reference; the vector-table sink parses them into a real timestamp.
  */
final case class CustomMessage(text: String, created_at: String)

final case class EnrichedMessage(text: String, created_at: String, _id: String)

final case class EmbeddedRecord(
    text: String,
    created_at: String,
    _id: String,
    embedding: Array[Float],
    inputTextTokenCount: Int)

/** Embedding attempt with its outcome: exactly one of `embedding` /
  * `embed_error` is non-null. The error column is the dead-letter channel
  * for the embedding stage — the reference instead returns a null poison
  * pill that NPEs the sink (reference
  * `operators/asyncIO/BedRockEmbeddingModelAsyncCustomMessage.java:109-117`). */
final case class EmbeddedAttempt(
    text: String,
    created_at: String,
    _id: String,
    embedding: Array[Float],
    inputTextTokenCount: Int,
    embed_error: String)

/** What lands in the vector table (reference sink doc + our kept `_id`). */
final case class VectorDoc(
    passage_embedding: Array[Float],
    date: java.sql.Timestamp,
    text: String,
    _id: String)

object Schemas {
  /** Wire-format read schema (FIXTURES.md A1). */
  val wire: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("created_at", StringType)))

  /** Wire schema + corrupt-record capture column for the dead-letter channel
    * (the reference instead crashes on malformed input, SURVEY §1.3). */
  val wireWithCorrupt: StructType = wire.add("_corrupt_record", StringType)

  /** Vector-table schema (FIXTURES.md A4 + kept `_id`). */
  val vectorTable: StructType = StructType(Seq(
    StructField("passage_embedding", ArrayType(FloatType)),
    StructField("date", TimestampType),
    StructField("text", StringType),
    StructField("_id", StringType)))
}
