package graft.delta

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkTestBase
import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/**
 * The runnable object-store commit backend, tested end to end with no
 * network: a local in-process HTTP server emulates the S3 conditional-PUT
 * contract (server-side `If-None-Match: *` arbitration, SigV4 signature
 * verification with the shared secret) and the same contract assertions
 * run against every [[ObjectApi]] implementation.
 */
class S3ObjectApiSpec extends SparkTestBase {
  import spark.implicits._

  private val AccessKey = "AKIDEXAMPLE"
  private val SecretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val Region = "us-east-1"

  test("SigV4 matches AWS's published known-answer test vector") {
    // docs.aws.amazon.com "Create a signed AWS API request", worked example:
    // GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
    // at 20150830T123600Z with the documented example credentials.
    val auth = SigV4.authorization(
      method = "GET", path = "/", query = "Action=ListUsers&Version=2010-05-08",
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payloadSha256 = SigV4.sha256Hex(Array.emptyByteArray),
      amzDate = "20150830T123600Z", region = "us-east-1", service = "iam",
      accessKey = AccessKey, secretKey = SecretKey)
    assert(auth ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  /** In-process S3-conditional-PUT emulator. Arbitration is a
    * ConcurrentHashMap.putIfAbsent (server-side atomic, like S3's);
    * signatures are VERIFIED by recomputation with the shared secret;
    * winners optionally materialize to the local filesystem so Delta log
    * readers observe what the store accepted. */
  private def withEmulator(materialize: Boolean)(
      run: (URI, ConcurrentHashMap[String, Array[Byte]]) => Unit): Unit = {
    val objects = new ConcurrentHashMap[String, Array[Byte]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val body = ex.getRequestBody.readAllBytes()
          val h = ex.getRequestHeaders
          val decoded = java.net.URLDecoder.decode(ex.getRequestURI.getRawPath, "UTF-8")
          val amzDate = h.getFirst("x-amz-date")
          val contentSha = h.getFirst("x-amz-content-sha256")
          val status =
            if (ex.getRequestMethod != "PUT") 405
            else if (contentSha != SigV4.sha256Hex(body)) 400
            else if (h.getFirst("If-None-Match") != "*") 400
            else {
              // verify the signature by recomputation with the shared secret
              val expected = SigV4.authorization("PUT", decoded, "", Seq(
                  "host" -> h.getFirst("Host"),
                  "if-none-match" -> "*",
                  "x-amz-content-sha256" -> contentSha,
                  "x-amz-date" -> amzDate),
                contentSha, amzDate, Region, "s3", AccessKey, SecretKey)
              if (h.getFirst("Authorization") != expected) 403
              else if (objects.putIfAbsent(decoded, body) == null) {
                if (materialize) {
                  val p = Paths.get(decoded)
                  Files.createDirectories(p.getParent)
                  Files.write(p, body)
                }
                200
              } else 412
            }
          ex.sendResponseHeaders(status, -1)
        } catch {
          case e: Exception =>
            try ex.sendResponseHeaders(500, -1) catch { case _: Exception => () }
            throw e
        } finally ex.close()
      }
    })
    server.start()
    try run(URI.create(s"http://127.0.0.1:${server.getAddress.getPort}"), objects)
    finally server.stop(0)
  }

  /** Contract every ObjectApi implementation must satisfy: N racing
    * conditional writers of one key → exactly one winner, and the stored
    * bytes are the winner's. */
  private def assertConditionalPutContract(api: ObjectApi, key: String,
                                           readBack: String => Option[Array[Byte]]): Unit = {
    val racers = (0 until 8).map { i =>
      Future(api.putIfNoneMatch(key, s"writer-$i".getBytes(UTF_8)) -> i)
    }
    val results = Await.result(Future.sequence(racers), 60.seconds)
    val winners = results.filter(_._1)
    assert(winners.size == 1, s"exactly one conditional PUT must win: $results")
    val stored = new String(readBack(key).get, UTF_8)
    assert(stored == s"writer-${winners.head._2}",
      "stored object must be the winning writer's body")
    // the losing retry path: a later put of the same key still loses
    assert(!api.putIfNoneMatch(key, "late".getBytes(UTF_8)))
  }

  test("ObjectApi contract: in-memory double and HTTP client agree") {
    val mem = new InMemoryObjectApi()
    assertConditionalPutContract(mem, "mem://bucket/commit.json", mem.get)
    withEmulator(materialize = false) { (endpoint, objects) =>
      val api = new S3HttpObjectApi(endpoint, Region, AccessKey, SecretKey)
      assertConditionalPutContract(api, "s3://bucket/with space/commit.json",
        k => Option(objects.get("/bucket/with space/commit.json")))
    }
  }

  test("bad credentials are rejected by signature verification, not trusted") {
    withEmulator(materialize = false) { (endpoint, _) =>
      val bad = new S3HttpObjectApi(endpoint, Region, AccessKey, "WRONG-SECRET")
      val e = intercept[StorageException](
        bad.putIfNoneMatch("s3://bucket/x.json", "b".getBytes(UTF_8)))
      assert(e.getMessage.contains("403"))
    }
  }

  test("DeltaTable multi-writer race through the HTTP conditional-PUT store") {
    withEmulator(materialize = true) { (endpoint, _) =>
      val dir = Files.createTempDirectory("graft-s3t").toString
      val t = DeltaTable.forPath(spark, dir)
      t.log.commitStoreOverride = Some(new ConditionalPutCommitStore(
        new S3HttpObjectApi(endpoint, Region, AccessKey, SecretKey)))
      t.write(Seq((0, "base")).toDF("id", "s"))
      val writers = (1 to 4).map { i =>
        Future(DeltaTable.forPath(spark, dir) match { case w =>
          w.log.commitStoreOverride = Some(new ConditionalPutCommitStore(
            new S3HttpObjectApi(endpoint, Region, AccessKey, SecretKey)))
          w.write(Seq((i, s"w$i")).toDF("id", "s"))
        })
      }
      val versions = Await.result(Future.sequence(writers), 120.seconds)
      info(s"writer versions: $versions")
      info(s"log: ${new java.io.File(dir, "_delta_log").list().sorted.mkString(",")}")
      // every concurrent append landed at a distinct version, none lost
      assert(versions.sorted == (1L to 4L))
      assert(t.version == 4)
      assert(t.toDF().select("id").as[Int].collect().sorted.toSeq == (0 to 4))
    }
  }
}
