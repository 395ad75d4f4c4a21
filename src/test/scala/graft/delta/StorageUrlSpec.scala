package graft.delta

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkTestBase
import java.net.{InetSocketAddress, URI, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.Path
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/**
 * Storage URL factory: one call from URL to a correctly-wired DeltaTable
 * (reference createStorage/parseStorageUrl, src/storage/index.ts:210-470).
 * The s3 test runs BOTH planes end-to-end: the data plane through
 * [[InMemoryFileSystem]] registered as `fs.s3.impl`, and the commit plane
 * through an HTTP emulator speaking the S3 conditional-PUT contract
 * (SigV4-verified `If-None-Match: *`), with accepted commits materialized
 * into the data plane exactly like a real bucket where both planes are the
 * same store.
 */
class StorageUrlSpec extends SparkTestBase {
  import spark.implicits._

  private val AccessKey = "AKIDEXAMPLE"
  private val SecretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val Region = "us-east-1"

  test("parseUrl: every reference URL form maps to its typed location") {
    import Storage._
    assert(parseUrl("/tmp/t") == LocalLocation("/tmp/t"))
    assert(parseUrl("file:///tmp/t") == LocalLocation("/tmp/t"))
    assert(parseUrl("file://localhost/tmp/t") == LocalLocation("/tmp/t"))
    assert(parseUrl("mem://suite/a/b") == MemoryLocation("suite", "/a/b"))
    assert(parseUrl("memory://") == MemoryLocation("default", ""))
    assert(parseUrl("memory://store") == MemoryLocation("store", ""))
    assert(parseUrl("s3://bucket/pre/fix") ==
      ObjectLocation("s3", "bucket", "pre/fix", None))
    assert(parseUrl("s3://bucket") == ObjectLocation("s3", "bucket", "", None))
    // virtual-hosted-style host → bucket + region extracted (reference rule)
    assert(parseUrl("s3://my-bucket.s3.eu-west-1.amazonaws.com/p") ==
      ObjectLocation("s3", "my-bucket", "p", Some("eu-west-1")))
    assert(parseUrl("r2://acct-bucket/x") ==
      ObjectLocation("r2", "acct-bucket", "x", None))
    assert(parseUrl("s3a://b/k") == ObjectLocation("s3a", "b", "k", None))
    intercept[ValidationException](parseUrl("ftp://host/x"))
    // a remote file:// authority must be refused, not silently read as a
    // local path (only localhost / empty authority are local)
    intercept[ValidationException](parseUrl("file://nas-server/exports/t"))
  }

  test("forUrl: file:// and bare-path tables round-trip") {
    val dir = Files.createTempDirectory("graft-url-file").toString
    val t = Storage.forUrl(spark, s"file://$dir")
    t.write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    assert(Storage.forUrl(spark, dir).toDF().count() == 2)
  }

  test("forUrl: mem:// installs the in-memory store; handles share state") {
    val t = Storage.forUrl(spark, "mem://url-spec/t1")
    t.write(Seq((1, "a")).toDF("id", "s"))
    val again = Storage.forUrl(spark, "memory://url-spec/t1")
    assert(again.toDF().count() == 1)
    again.write(Seq((2, "b")).toDF("id", "s"))
    assert(t.toDF().count() == 2)
  }

  test("forUrl: object URLs without credentials are refused loudly") {
    val e = intercept[ValidationException](
      Storage.forUrl(spark, "s3://bucket/table"))
    assert(e.getMessage.contains("If-None-Match"))
  }

  /** S3 conditional-PUT emulator (same contract as S3ObjectApiSpec's):
    * SigV4 verified by recomputation, arbitration by map putIfAbsent,
    * winners materialized via `materialize`. */
  private def withEmulator(materialize: (String, Array[Byte]) => Unit)(
      run: URI => Unit): Unit = {
    val objects = new ConcurrentHashMap[String, Array[Byte]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          val body = ex.getRequestBody.readAllBytes()
          val h = ex.getRequestHeaders
          val decoded = URLDecoder.decode(ex.getRequestURI.getRawPath, UTF_8)
          val amzDate = h.getFirst("x-amz-date")
          val contentSha = h.getFirst("x-amz-content-sha256")
          val status =
            if (ex.getRequestMethod != "PUT" || h.getFirst("If-None-Match") != "*") 400
            else {
              val expected = SigV4.authorization("PUT", decoded, "", Seq(
                  "host" -> h.getFirst("Host"),
                  "if-none-match" -> "*",
                  "x-amz-content-sha256" -> contentSha,
                  "x-amz-date" -> amzDate),
                contentSha, amzDate, Region, "s3", AccessKey, SecretKey)
              if (h.getFirst("Authorization") != expected) 403
              else if (objects.putIfAbsent(decoded, body) == null) {
                materialize(decoded, body); 200
              } else 412
            }
          ex.sendResponseHeaders(status, -1)
        } finally ex.close()
      }
    })
    server.start()
    try run(URI.create(s"http://127.0.0.1:${server.getAddress.getPort}"))
    finally server.stop(0)
  }

  test("forUrl: s3:// end-to-end — conditional-write OCC + multi-writer race") {
    val bucket = "graft-url-bucket"
    // DATA plane: the in-memory FileSystem serves scheme `s3` for this test
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3.impl", classOf[InMemoryFileSystem].getName)
    val conf = spark.sessionState.newHadoopConf()
    val dataFs = new Path(s"s3://$bucket/").getFileSystem(conf)
    // COMMIT plane: HTTP conditional PUT; accepted objects materialize into
    // the data plane (in a real bucket the two planes are the same store)
    withEmulator((key, body) => {
      val rel = key.stripPrefix(s"/$bucket")
      val out = dataFs.create(new Path(s"s3://$bucket$rel"), true)
      try out.write(body) finally out.close()
    }) { endpoint =>
      val cfg = Storage.ObjectStoreConfig(endpoint, AccessKey, SecretKey)
      val url = s"s3://$bucket/tables/events"
      val t = Storage.forUrl(spark, url, Some(cfg))
      t.write(Seq((0, "base")).toDF("id", "s"))
      assert(t.toDF().count() == 1)
      // four racing writers through four independently-wired handles: every
      // commit lands at a distinct version through the conditional PUT
      val writers = (1 to 4).map { i =>
        Future(Storage.forUrl(spark, url, Some(cfg))
          .write(Seq((i, s"w$i")).toDF("id", "s")))
      }
      val versions = Await.result(Future.sequence(writers), 120.seconds)
      assert(versions.sorted == (1L to 4L))
      assert(t.toDF().select("id").as[Int].collect().sorted.toSeq == (0 to 4))
      // region override precedence: config beats URL, beats default
      assert(Storage.parseUrl(s"s3://b.s3.eu-west-1.amazonaws.com/p") match {
        case Storage.ObjectLocation(_, _, _, r) => r.contains("eu-west-1")
        case _ => false
      })
    }
  }
}
