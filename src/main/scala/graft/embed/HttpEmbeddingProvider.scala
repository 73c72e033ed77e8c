package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Generic HTTP/JSON embedding provider — the process-boundary-crossing
  * implementation of [[EmbeddingProvider]] that the reference's async
  * operator contract calls for (reference
  * `operators/asyncIO/BedRockEmbeddingModelAsyncCustomMessage.java:47-117`:
  * async `InvokeModel` with a JSON `inputText` request and an
  * `embedding` + `inputTextTokenCount` JSON response — the public Titan
  * wire shape, reproduced here against any HTTP endpoint).
  *
  * No cloud SDK: plain `java.net.http.HttpClient` (JDK 11+). Request:
  * `POST {"inputText": "…"}`; response: `{"embedding": [f, …],
  * "inputTextTokenCount": n}`.
  *
  * Failure contract (what [[EmbeddingStage.embedIteratorSafe]] relies on):
  *  - non-2xx → `IOException` (retryable, then dead-letter);
  *  - connect/read beyond the configured timeouts → `HttpTimeoutException`
  *    (an `IOException` — the call is SELF-bounding, it can't hold a
  *    concurrency permit past `requestTimeoutMs`);
  *  - thread interrupt (a cancelled in-flight call) → `InterruptedException`
  *    propagates and releases the permit.
  *
  * Thread-safe: `HttpClient` is immutable/thread-safe and `@transient lazy`
  * so the case class serializes to executors and each JVM builds its own
  * client.
  */
final case class HttpEmbeddingProvider(
    endpoint: String,
    modelAlias: String = "titan-v2",
    connectTimeoutMs: Long = 2000,
    requestTimeoutMs: Long = 10000) extends EmbeddingProvider {

  override val dim: Int = EmbeddingModels.dimOf(modelAlias)

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    .build()

  override def embed(text: String): EmbeddingResult = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"inputText": ${JsonCodec.quote(text)}}""", StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"embedding endpoint HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val (vec, tokens) = JsonCodec.parseEmbedding(resp.body())
    if (vec.length != dim)
      throw new java.io.IOException(
        s"embedding endpoint returned ${vec.length} dims, expected $dim")
    EmbeddingResult(vec, tokens)
  }
}

/** Minimal JSON encode/decode for the embedding wire shape — enough for the
  * `inputText` request and the `embedding`/`inputTextTokenCount` response,
  * with full string escaping, so no JSON library dependency is needed. */
private[embed] object JsonCodec {

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Extract `"embedding": [floats…]` and `"inputTextTokenCount": n` from a
    * JSON object body. Tolerant of whitespace and key order; rejects bodies
    * without a well-formed embedding array. */
  def parseEmbedding(body: String): (Array[Float], Int) = {
    val arr = extractArray(body, "embedding")
      .getOrElse(throw new java.io.IOException(
        s"no embedding array in response: ${body.take(200)}"))
    val floats = new Array[Float](arr.length)
    var i = 0
    while (i < arr.length) {
      floats(i) = java.lang.Float.parseFloat(arr(i).trim)
      i += 1
    }
    val tokens = extractNumber(body, "inputTextTokenCount").map(_.toInt).getOrElse(0)
    (floats, tokens)
  }

  private def extractArray(body: String, key: String): Option[Array[String]] = {
    val k = "\"" + key + "\""
    val ki = body.indexOf(k)
    if (ki < 0) return None
    val open = body.indexOf('[', ki + k.length)
    if (open < 0) return None
    val close = body.indexOf(']', open)
    if (close < 0) return None
    val inner = body.substring(open + 1, close).trim
    Some(if (inner.isEmpty) Array.empty[String] else inner.split(","))
  }

  private def extractNumber(body: String, key: String): Option[Long] = {
    val k = "\"" + key + "\""
    val ki = body.indexOf(k)
    if (ki < 0) return None
    val colon = body.indexOf(':', ki + k.length)
    if (colon < 0) return None
    var i = colon + 1
    while (i < body.length && body.charAt(i).isWhitespace) i += 1
    val start = i
    while (i < body.length && (body.charAt(i).isDigit || body.charAt(i) == '-')) i += 1
    if (i == start) None else Some(body.substring(start, i).toLong)
  }
}
