package graft.delta

import java.net.URI
import org.apache.spark.sql.SparkSession

/**
 * One-call storage wiring from a URL — the reference's `parseStorageUrl` /
 * `createStorage` / `createStorageFromUrl` surface (reference:
 * src/storage/index.ts:210-470) re-expressed for the Spark/Hadoop stack.
 * The reference returns a `StorageBackend` that is both data and log plane;
 * here the data plane is whatever Hadoop `FileSystem` handles the URL's
 * scheme (built-in for `file:`, [[InMemoryFileSystem]] for `mem:`,
 * hadoop-aws/gcs connectors for object stores in a real deployment), and
 * the factory's job is the part Spark does NOT do for you: picking the
 * scheme-correct atomic [[CommitStore]] so OCC commits stay safe —
 * `link(2)` for `file:`, the shared map's `putIfAbsent` for `mem:`, and the
 * store's own conditional PUT (`If-None-Match: *`, [[S3HttpObjectApi]]) for
 * `s3:`/`r2:`-style URLs.
 */
object Storage {

  /** Parsed storage URL (reference `ParsedStorageUrl`, storage/index.ts:210). */
  sealed trait Location
  /** Plain filesystem path (`file://...` or a bare path). */
  final case class LocalLocation(path: String) extends Location
  /** In-memory store: `mem://store/path` (reference spelling `memory://`
    * accepted); each authority is an independent namespace. */
  final case class MemoryLocation(store: String, path: String) extends Location
  /** Object store: `s3://bucket/prefix`, `s3a://...`, `r2://...` (R2 speaks
    * the same S3-compatible HTTP contract). Region comes from a
    * virtual-hosted-style host when present, as in the reference. */
  final case class ObjectLocation(scheme: String, bucket: String, path: String,
                                  region: Option[String]) extends Location

  /** Endpoint + credentials for object-store URLs. The endpoint is the
    * service base URL (AWS regional endpoint, R2 account endpoint, MinIO
    * host); `region` overrides the URL-derived/default signing region. */
  final case class ObjectStoreConfig(endpoint: URI, accessKey: String,
                                     secretKey: String,
                                     region: Option[String] = None)

  private val ObjectSchemes = Set("s3", "s3a", "s3n", "r2")
  private val VirtualHosted = "^(.+?)\\.s3[.-]([a-z0-9-]+)\\.amazonaws\\.com$".r

  /** Parse a storage URL into its typed location (reference
    * `parseStorageUrl`, storage/index.ts:210-290). Unknown schemes are
    * refused loudly rather than guessed at. */
  def parseUrl(url: String): Location = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return LocalLocation(url)
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    scheme match {
      case "file" =>
        // file:///p -> /p ; file://localhost/p -> /p (reference rules;
        // Windows drive handling is irrelevant on the JVM/Linux target).
        // Any OTHER authority (file://nas-server/p) names a remote host
        // this factory cannot reach — refuse it rather than silently
        // reinterpreting it as a local path that happens to exist.
        val p =
          if (rest.startsWith("localhost/")) rest.substring("localhost".length)
          else rest
        if (!p.startsWith("/"))
          throw new ValidationException(
            s"file:// URL with a non-local authority is not supported: $url" +
              " (use file:///absolute/path or file://localhost/path)")
        LocalLocation(p)
      case "mem" | "memory" =>
        val slash = rest.indexOf('/')
        if (slash < 0) MemoryLocation(if (rest.isEmpty) "default" else rest, "")
        else MemoryLocation(
          if (slash == 0) "default" else rest.substring(0, slash),
          rest.substring(slash).stripSuffix("/"))
      case s if ObjectSchemes(s) =>
        val slash = rest.indexOf('/')
        val (host, path) =
          if (slash < 0) (rest, "")
          else (rest.substring(0, slash), rest.substring(slash + 1))
        host match {
          case VirtualHosted(bucket, region) =>
            ObjectLocation(s, bucket, path, Some(region))
          case bucket => ObjectLocation(s, bucket, path, None)
        }
      case other =>
        throw new ValidationException(
          s"unsupported storage URL scheme '$other://' (supported: file://, " +
            "mem://, s3://, s3a://, r2://, or a bare filesystem path)")
    }
  }

  /**
   * Open (or create) a Delta table from a storage URL, with the
   * scheme-correct commit arbitration wired in one call (reference
   * `createStorage(url)`, storage/index.ts:433-470):
   *
   *  - `file:///path` / bare path → local table; OCC via `link(2)`
   *    ([[LinkCommitStore]], automatic);
   *  - `mem://store/path` → installs [[InMemoryFileSystem]] into the
   *    session and uses the shared map's atomic `putIfAbsent`;
   *  - `s3://bucket/prefix` (also `s3a`, `r2`) → OCC through the store's
   *    conditional PUT; REQUIRES an [[ObjectStoreConfig]], because without
   *    the `If-None-Match` contract concurrent writers can silently lose
   *    commits. The DATA plane additionally needs a Hadoop FileSystem for
   *    the scheme (hadoop-aws's `s3a` in real deployments — this library
   *    adds no SDK dependency, matching its zero-dependency commit client).
   */
  def forUrl(spark: SparkSession, url: String,
             objectStore: Option[ObjectStoreConfig] = None): DeltaTable =
    parseUrl(url) match {
      case LocalLocation(p) => DeltaTable.forPath(spark, p)
      case MemoryLocation(store, path) =>
        InMemoryFileSystem.install(spark)
        DeltaTable.forPath(spark, s"mem://$store$path")
      case ObjectLocation(scheme, bucket, path, urlRegion) =>
        val cfg = objectStore.getOrElse(throw new ValidationException(
          s"$scheme:// tables need ObjectStoreConfig(endpoint, accessKey, " +
            "secretKey): commit safety requires the store's conditional PUT " +
            "(If-None-Match); without it concurrent writers can lose commits"))
        val region = cfg.region.orElse(urlRegion).getOrElse("us-east-1")
        val t = DeltaTable.forPath(spark, s"$scheme://$bucket/$path")
        t.log.commitStoreOverride = Some(new ConditionalPutCommitStore(
          new S3HttpObjectApi(cfg.endpoint, region, cfg.accessKey, cfg.secretKey)))
        t
    }
}
