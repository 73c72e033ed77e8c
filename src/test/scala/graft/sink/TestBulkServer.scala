package graft.sink

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Shared in-test `_bulk` endpoint: id-keyed doc store + instrumentation.
  * `failFirst` 503s the first n bulk requests; `itemErrorsFirst` answers
  * 200 with `"errors": true` for the first n; `alwaysFail` 500s everything. */
final class TestBulkServer(failFirst: Int = 0, itemErrorsFirst: Int = 0,
                           alwaysFail: Boolean = false) {
  val docs = new ConcurrentHashMap[String, String]()
  val bulkSizes = new CopyOnWriteArrayList[Integer]()
  val authSeen = new CopyOnWriteArrayList[String]()
  val sigSeen = new CopyOnWriteArrayList[Array[String]]()
  private val reqs = new AtomicInteger(0)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(Executors.newCachedThreadPool())
  server.createContext("/_bulk", (ex: HttpExchange) => {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    Option(ex.getRequestHeaders.getFirst("Authorization")).foreach(authSeen.add)
    // signing instrumentation: (x-amz-date, x-amz-content-sha256, auth, body)
    if (ex.getRequestHeaders.containsKey("x-amz-date"))
      sigSeen.add(Array(
        ex.getRequestHeaders.getFirst("x-amz-date"),
        Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256")).orNull,
        Option(ex.getRequestHeaders.getFirst("Authorization")).orNull,
        body))
    val n = reqs.incrementAndGet()
    def respond(code: Int, payload: String): Unit = {
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    if (alwaysFail || n <= failFirst) respond(503, """{"message":"unavailable"}""")
    else if (n <= failFirst + itemErrorsFirst)
      respond(200, """{"took":1,"errors":true,"items":[{"index":{"status":429}}]}""")
    else {
      val lines = body.split('\n').filter(_.nonEmpty)
      val pairs = lines.grouped(2).collect { case Array(action, doc) =>
        val id = action.split("\"_id\":\"")(1).takeWhile(_ != '"')
        (id, doc)
      }.toSeq
      pairs.foreach { case (id, doc) => docs.put(id, doc) }
      bulkSizes.add(pairs.size)
      respond(200, """{"took":1,"errors":false,"items":[]}""")
    }
  })
  server.start()
  val url = s"http://127.0.0.1:${server.getAddress.getPort}"
  def attempts: Int = reqs.get()
  def stop(): Unit = server.stop(0)
}
