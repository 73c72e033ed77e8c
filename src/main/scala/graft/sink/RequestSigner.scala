package graft.sink

import java.net.URI
import java.nio.charset.StandardCharsets

/** Request-signing seam for [[HttpVectorSink]] — the point where the
  * reference installs its SigV4 interceptor on the OpenSearch client
  * (`…/DataStreamJob.java:158-170`). The sink calls [[headers]] per
  * request with everything a canonical signature needs (method, URI,
  * the headers already set, the exact payload bytes) and attaches
  * whatever comes back. Serializable: signers ship to executors inside
  * the sink's case class, one per partition loop.
  */
trait RequestSigner extends Serializable {
  /** Headers to ADD to the outgoing request (e.g. `Authorization`,
    * `x-amz-date`, `x-amz-content-sha256`). `baseHeaders` are the
    * headers the sink has already decided to send (content-type, any
    * static auth pair) — sign them, don't re-emit them. */
  def headers(method: String, uri: URI, baseHeaders: Seq[(String, String)],
              body: Array[Byte]): Seq[(String, String)]
}

/** AWS Signature Version 4 — implemented from the public specification
  * (the "Signature Version 4 signing process" developer-guide algorithm;
  * no SDK involved):
  *
  *  1. canonical request =
  *     `method \n uri-path \n sorted-query \n canonical-headers \n
  *      signed-header-names \n hex(sha256(payload))`
  *  2. string to sign =
  *     `AWS4-HMAC-SHA256 \n <amzDate> \n
  *      <date>/<region>/<service>/aws4_request \n
  *      hex(sha256(canonical request))`
  *  3. signing key = HMAC-chain of `"AWS4"+secret` over date, region,
  *     service, `"aws4_request"`; signature = hex(HMAC(key, stringToSign)).
  *
  * Signed headers: `host`, every base header, `x-amz-date`, and (when
  * `signPayloadHeader`, the OpenSearch/S3 convention) an
  * `x-amz-content-sha256` carrying the payload hash. The clock is
  * injectable so tests (and the AWS documentation's published
  * `20150830T123600Z` IAM example, which this implementation reproduces
  * byte-for-byte — see RequestSignerSpec) can pin the date.
  */
final case class SigV4Signer(
    accessKey: String,
    secretKey: String,
    region: String,
    service: String,
    signPayloadHeader: Boolean = true,
    clock: () => java.time.Instant = () => java.time.Instant.now())
  extends RequestSigner {

  import SigV4Signer._

  override def headers(method: String, uri: URI,
                       baseHeaders: Seq[(String, String)],
                       body: Array[Byte]): Seq[(String, String)] = {
    val t = clock().atZone(java.time.ZoneOffset.UTC)
    val amzDate = t.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'"))
    val dateStamp = amzDate.take(8)
    val payloadHash = hex(sha256(body))

    val host = uri.getHost +
      (if (uri.getPort > 0) s":${uri.getPort}" else "")
    val extra =
      Seq("x-amz-date" -> amzDate) ++
        (if (signPayloadHeader) Seq("x-amz-content-sha256" -> payloadHash)
         else Seq.empty)
    // canonical form: lowercase names, trimmed values, sorted by name
    val toSign = ((("host" -> host) +: baseHeaders) ++ extra)
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT), v.trim) }
      .sortBy(_._1)
    val signedNames = toSign.map(_._1).mkString(";")
    val canonicalHeaders = toSign.map { case (k, v) => s"$k:$v\n" }.mkString

    val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val query = canonicalQuery(uri)
    val canonicalRequest =
      s"$method\n$path\n$query\n$canonicalHeaders\n$signedNames\n$payloadHash"

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${hex(sha256(utf8(canonicalRequest)))}"

    val kSigning = Seq(dateStamp, region, service, "aws4_request")
      .foldLeft(utf8("AWS4" + secretKey))((k, s) => hmac(k, s))
    val signature = hex(hmac(kSigning, stringToSign))

    extra :+ ("Authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=$signedNames, Signature=$signature"))
  }
}

object SigV4Signer {
  /** Query canonicalization: parameters sorted by name then value, each
    * RFC 3986-encoded (unreserved chars bare, space as `%20`). */
  private[sink] def canonicalQuery(uri: URI): String = {
    val raw = Option(uri.getRawQuery).getOrElse("")
    if (raw.isEmpty) ""
    else raw.split('&').toSeq.filter(_.nonEmpty)
      .map { p =>
        val i = p.indexOf('=')
        if (i < 0) (p, "") else (p.take(i), p.drop(i + 1))
      }
      .map { case (k, v) => (rfc3986(urlDecode(k)), rfc3986(urlDecode(v))) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
  }

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private[sink] def rfc3986(s: String): String = {
    val b = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { byte =>
      val c = byte.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        b.append(c)
      else b.append(f"%%${byte & 0xff}%02X")
    }
    b.toString
  }

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(utf8(data))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString
}
