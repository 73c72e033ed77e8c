package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.embed.{EmbeddingModels, StubEmbeddingProvider}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // FIXTURES.md A1 fixture set
  private val wireLines = Seq(
    """{"text": "Hello World", "created_at": "2024-01-01T12:00:00.000Z"}""",
    """{"text": "", "created_at": "2024-01-01T12:00:01.000Z"}""",           // empty → dropped
    """{"text": "   ", "created_at": "2024-01-01T12:00:02.000Z"}""",        // whitespace → kept!
    """{"created_at": "2024-01-01T12:00:03.000Z"}""",                        // missing text → dropped
    """{"text": "no date"}""",                                               // missing created_at → kept
    """not json at all""",                                                   // corrupt → dead letter
    """{"text": "extra", "created_at": "2024-01-01T12:00:04.000Z", "unknown": 1}""")

  test("parse routes corrupt records to dead letters, keeps the rest") {
    val raw = wireLines.toDF("value")
    val parsed = RagPipeline.parseWire(raw)
    assert(RagPipeline.deadLetters(parsed).count() === 1)
    assert(parsed.filter($"_corrupt_record".isNull).count() === 6)
  }

  test("filter keeps whitespace-only text (reference isEmpty semantics)") {
    val raw = wireLines.toDF("value")
    val kept = RagPipeline.filterNonEmpty(RagPipeline.enrich(RagPipeline.parseWire(raw)))
    val texts = kept.select("text").as[String].collect().toSet
    assert(texts === Set("Hello World", "   ", "no date", "extra"))
  }

  test("enrich assigns unique uuid-v4 _ids") {
    val raw = wireLines.toDF("value")
    val ids = RagPipeline.enrich(RagPipeline.parseWire(raw))
      .select("_id").as[String].collect()
    assert(ids.distinct.length === ids.length)
    ids.foreach(id => assert(id.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")))
  }

  test("stub embedder: deterministic, correct dims, reference token count") {
    val p1 = StubEmbeddingProvider("titan-v1")
    val p2 = StubEmbeddingProvider("titan-v2")
    assert(p1.dim === 1536 && p2.dim === 1024)
    assert(EmbeddingModels.registry("titan-v1")._1 === "amazon.titan-embed-text-v1")
    assert(EmbeddingModels.registry("titan-v2")._1 === "amazon.titan-embed-text-v2:0")
    val a = p1.embed("Hello World"); val b = p1.embed("Hello World")
    assert(a.embedding.toSeq == b.embedding.toSeq, "stub must be deterministic")
    assert(a.embedding.length === 1536)
    assert(a.inputTextTokenCount === 2)
    assert(p1.embed("different text").embedding.toSeq != a.embedding.toSeq)
    assert(a.embedding.forall(v => v >= -0.25f && v < 0.25f))
  }

  test("batch pipeline end-to-end: sink doc shape (FIXTURES A4)") {
    val raw = wireLines.toDF("value")
    val docs = RagPipeline.batch(raw, StubEmbeddingProvider("titan-v2"))
    assert(docs.columns.toSeq === Seq("passage_embedding", "date", "text", "_id"))
    val rows = docs.collect()
    assert(rows.length === 4)
    val hello = rows.find(_.getString(2) == "Hello World").get
    assert(hello.getSeq[Float](0).length === 1024)
    assert(hello.getTimestamp(1).toInstant.toString === "2024-01-01T12:00:00Z")
    // missing created_at → null date survives (dead-letter-free semantics)
    assert(rows.count(_.isNullAt(1)) === 1)
  }

  test("flagship entry returns top-10 with scores") {
    val out = graft.SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.length === 10)
    assert(out.columns.toSeq === Seq("_id", "text", "score"))
  }
}
