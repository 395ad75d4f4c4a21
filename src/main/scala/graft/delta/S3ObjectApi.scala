package graft.delta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * AWS Signature Version 4 request signing, implemented from the public
 * spec (docs.aws.amazon.com "Create a signed AWS API request") — the same
 * choice the reference makes rather than depending on an SDK
 * (reference: src/storage/s3.ts:83-200). Pure functions over strings and
 * bytes; verified against AWS's published known-answer test vector in
 * S3ObjectApiSpec.
 */
object SigV4 {

  def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  def sha256Hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** SigV4 "UriEncode": RFC 3986 unreserved chars pass through, everything
    * else percent-encodes (UTF-8, uppercase hex). */
  def uriEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
      if (unreserved) sb.append(c) else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical URI: each path segment encoded, '/' separators preserved. */
  def uriEncodePath(path: String): String =
    path.split("/", -1).map(uriEncode).mkString("/")

  /**
   * Compute the `Authorization` header for a request.
   *
   * @param headers header name→value pairs to SIGN (the caller must send
   *                exactly these values; names are lowercased and sorted
   *                per the spec)
   * @param amzDate ISO8601-basic timestamp (`yyyyMMdd'T'HHmmss'Z'`), also
   *                sent as `x-amz-date`
   */
  def authorization(method: String, path: String, query: String,
                    headers: Seq[(String, String)], payloadSha256: String,
                    amzDate: String, region: String, service: String,
                    accessKey: String, secretKey: String): String = {
    val canon = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val signedNames = canon.map(_._1).mkString(";")
    val canonicalRequest = Seq(
      method,
      uriEncodePath(path),
      query,
      canon.map { case (k, v) => s"$k:$v\n" }.mkString, // block keeps its trailing \n
      signedNames,
      payloadSha256).mkString("\n")
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), date), region), service), "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedNames, Signature=$signature"
  }
}

/**
 * Runnable S3-style conditional-PUT [[ObjectApi]] over the JDK's built-in
 * `HttpClient` — no vendor SDK required; the REST + SigV4 contract is
 * public and is exactly what the reference's own S3/R2 clients speak
 * (reference: src/storage/s3.ts:40, src/storage/r2.ts:22-27).
 *
 * `putIfNoneMatch` sends `PUT` with `If-None-Match: *`, so create-if-absent
 * is arbitrated ON THE SERVER: 2xx = this writer created the object,
 * 412/409 = a racer already had — never a client-side exists-then-put.
 * Works path-style against AWS S3, Cloudflare R2, GCS's XML API, and MinIO.
 * Register for a scheme via
 * `DeltaLog.registerCommitStore("s3", _ => new ConditionalPutCommitStore(api))`.
 *
 * Keys may be full `s3://bucket/key` URIs (mapped to `/bucket/key` on the
 * endpoint), absolute paths, or http(s) URLs.
 */
final class S3HttpObjectApi(
    endpoint: URI, region: String, accessKey: String, secretKey: String,
    client: HttpClient =
      HttpClient.newBuilder().version(HttpClient.Version.HTTP_1_1).build())
  extends ObjectApi {

  // Lenient key parsing (keys may contain spaces etc. — they are encoded
  // only when the request URI is built): "s3://bucket/k" → "/bucket/k",
  // "file:/tmp/x" → "/tmp/x", http(s) URLs keep their own path.
  private val FullScheme = "^([A-Za-z][A-Za-z0-9+.-]*)://".r
  private val BareScheme = "^([A-Za-z][A-Za-z0-9+.-]*):(/.*)$".r

  private def pathFor(key: String): String = key match {
    case k if k.startsWith("http://") || k.startsWith("https://") =>
      val rest = k.substring(k.indexOf("://") + 3)
      val slash = rest.indexOf('/')
      if (slash < 0) "/" else rest.substring(slash)
    case k => FullScheme.findFirstMatchIn(k) match {
        case Some(m) => s"/${k.substring(m.end)}"
        case None => k match {
          case BareScheme(_, p) => p
          case p if p.startsWith("/") => p
          case p => s"/$p"
        }
      }
  }

  override def putIfNoneMatch(key: String, body: Array[Byte]): Boolean = {
    val path = pathFor(key)
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val payloadHash = SigV4.sha256Hex(body)
    val hostHeader = endpoint.getHost +
      (if (endpoint.getPort > 0) s":${endpoint.getPort}" else "")
    // `host` is signed from the URI (the client transmits exactly that
    // value); the JDK client forbids setting Host explicitly.
    val auth = SigV4.authorization("PUT", path, "",
      Seq("host" -> hostHeader, "if-none-match" -> "*",
        "x-amz-content-sha256" -> payloadHash, "x-amz-date" -> amzDate),
      payloadHash, amzDate, region, "s3", accessKey, secretKey)
    val req = HttpRequest.newBuilder()
      .uri(endpoint.resolve(SigV4.uriEncodePath(path)))
      .header("If-None-Match", "*")
      .header("x-amz-content-sha256", payloadHash)
      .header("x-amz-date", amzDate)
      .header("Authorization", auth)
      .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case c if c >= 200 && c < 300 => true
      case 412 | 409 => false // precondition failed: a racer's object exists
      case c => throw new StorageException(
        s"conditional PUT returned HTTP $c: ${resp.body().take(200)}",
        key, "putIfNoneMatch")
    }
  }
}
