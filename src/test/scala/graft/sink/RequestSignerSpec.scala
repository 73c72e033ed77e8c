package graft.sink

import java.net.URI

import org.scalatest.funsuite.AnyFunSuite

/** [[SigV4Signer]] against the AWS developer guide's PUBLISHED worked
  * example (the `AKIDEXAMPLE` / `20150830T123600Z` IAM `ListUsers`
  * request) — the signature constant below is printed in the public
  * documentation, so a byte-for-byte match proves the canonicalization,
  * string-to-sign, and HMAC key-derivation steps independently of this
  * repo's own arithmetic. */
class RequestSignerSpec extends AnyFunSuite {

  private val docSigner = SigV4Signer(
    accessKey = "AKIDEXAMPLE",
    secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
    region = "us-east-1",
    service = "iam",
    // the IAM example signs content-type;host;x-amz-date only — no
    // x-amz-content-sha256 header (that is the S3/OpenSearch convention
    // the sink path uses)
    signPayloadHeader = false,
    clock = () => java.time.Instant.parse("2015-08-30T12:36:00Z"))

  test("reproduces the AWS documentation example signature byte-for-byte") {
    val out = docSigner.headers(
      "GET",
      URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      Seq("Content-Type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Array.emptyByteArray).toMap
    assert(out("x-amz-date") === "20150830T123600Z")
    assert(out("Authorization") ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("query canonicalization sorts by name then value and RFC3986-encodes") {
    assert(SigV4Signer.canonicalQuery(
      URI.create("https://h/p?b=2&a=x%20y&a=1")) === "a=1&a=x%20y&b=2")
    assert(SigV4Signer.canonicalQuery(URI.create("https://h/p")) === "")
    assert(SigV4Signer.rfc3986("a b+c~d/e") === "a%20b%2Bc~d%2Fe")
  }

  test("payload-hash header mode: x-amz-content-sha256 carries sha256(body) and is signed") {
    val body = "hello".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = docSigner.copy(signPayloadHeader = true)
      .headers("POST", URI.create("https://search.example.com/_bulk"),
        Seq("Content-Type" -> "application/x-ndjson"), body).toMap
    val expectedSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map(b => f"${b & 0xff}%02x").mkString
    assert(out("x-amz-content-sha256") === expectedSha)
    assert(out("Authorization").contains(
      "SignedHeaders=content-type;host;x-amz-content-sha256;x-amz-date"))
    assert(out("Authorization").matches(".*Signature=[0-9a-f]{64}$"))
  }

  test("a non-default port rides in the signed host header") {
    val out = docSigner.headers("POST",
      URI.create("http://127.0.0.1:9443/_bulk"), Seq.empty,
      Array.emptyByteArray).toMap
    // changing the port must change the signature (host is signed):
    val out2 = docSigner.headers("POST",
      URI.create("http://127.0.0.1:9444/_bulk"), Seq.empty,
      Array.emptyByteArray).toMap
    assert(out("Authorization") !== out2("Authorization"))
  }
}
