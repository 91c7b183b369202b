package graft.sources

import java.nio.file.{Files, Path}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Blob-store JSON source/sink (SURVEY.md §2.1 S9 / §2.2 K6) — the
  * reference's bronze landing zone re-expressed against a storage
  * abstraction (`utils/azure_client.py:26-143`):
  *
  *   - K6 sink: upload a raw API page as a timestamped JSON blob,
  *     `prefix/%Y/%m/%d/%H_%M_%S.json` (`generate_blob_name`,
  *     azure_client.py:90-102). The payload is the bounded raw API
  *     response — a driver-side artifact, never distributed data.
  *   - S9 source: list blobs under a prefix modified inside a lookback
  *     window, newest first (`list_recent_bronze_files`,
  *     azure_client.py:104-143), download each, parse with the
  *     explicit-schema [[JsonIngest]] path into bronze rows.
  *
  * [[BlobStore]] is the seam: [[LocalBlobStore]] backs tests and the
  * zero-egress sandbox; a cloud-SDK client implements the same three
  * calls in production. Clock and cutoffs are PARAMETERS (never
  * `now()` inside the dataflow), so ingestion reruns are reproducible.
  */
object BlobJson {

  final case class BlobInfo(name: String, lastModifiedMs: Long)

  /** Three-call storage seam — the whole surface the reference's
    * client uses. */
  trait BlobStore {
    def put(container: String, name: String, bytes: Array[Byte],
        overwrite: Boolean = true): Unit
    def get(container: String, name: String): Array[Byte]
    def list(container: String, prefix: String): Seq[BlobInfo]
  }

  /** Local-filesystem store: container = directory, blob name =
    * relative path. Writes are atomic (temp file + move) so a
    * concurrent lister never sees a half-written blob. */
  final class LocalBlobStore(root: Path) extends BlobStore {
    private def p(container: String, name: String): Path = {
      val resolved = root.resolve(container).resolve(name).normalize()
      require(resolved.startsWith(root), s"blob name escapes the store: $name")
      resolved
    }
    override def put(container: String, name: String, bytes: Array[Byte],
        overwrite: Boolean): Unit = {
      val target = p(container, name)
      if (!overwrite) require(!Files.exists(target), s"blob exists: $name")
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempFile(target.getParent, ".tmp", ".part")
      Files.write(tmp, bytes)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    override def get(container: String, name: String): Array[Byte] =
      Files.readAllBytes(p(container, name))
    override def list(container: String, prefix: String): Seq[BlobInfo] = {
      val base = root.resolve(container)
      if (!Files.isDirectory(base)) return Seq.empty
      val s = Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => BlobInfo(base.relativize(f).toString,
            Files.getLastModifiedTime(f).toMillis))
          .filter(_.name.startsWith(prefix))
          .toSeq
      } finally s.close()
    }
  }

  private val tsFormat = DateTimeFormatter.ofPattern("yyyy/MM/dd/HH_mm_ss")
    .withZone(ZoneOffset.UTC)

  /** `prefix/%Y/%m/%d/%H_%M_%S.json` — the reference's timestamped
    * layout (azure_client.py:90-102). The instant is a parameter. */
  def generateBlobName(prefix: String, at: Instant,
      suffix: String = "json"): String =
    s"$prefix/${tsFormat.format(at)}.$suffix"

  /** K6: land one raw API page. */
  def uploadJson(store: BlobStore, container: String, name: String,
      json: String, overwrite: Boolean = true): Unit =
    store.put(container, name, json.getBytes("UTF-8"), overwrite)

  /** S9 listing: `.json` blobs under the prefix modified within the
    * lookback window, newest first (azure_client.py:104-143). */
  def listRecent(store: BlobStore, container: String, prefix: String,
      hoursBack: Int, now: Instant): Seq[String] = {
    val cutoff = now.minusSeconds(hoursBack.toLong * 3600).toEpochMilli
    store.list(container, prefix)
      .filter(b => b.name.endsWith(".json") && b.lastModifiedMs > cutoff)
      .sortBy(_.name)(Ordering[String].reverse)
      .map(_.name)
  }

  /** S9 end to end: recent blobs → JSON lines → explicit-schema bronze
    * rows. Download happens on the driver because each blob is one
    * bounded API page (the reference shape); the PARSE is distributed
    * — blobs become a Dataset[String] and [[JsonIngest.fromJson]]'s
    * schema-first read runs as a normal Spark job. */
  def readRecent(spark: SparkSession, store: BlobStore, container: String,
      prefix: String, hoursBack: Int, now: Instant,
      partitionDate: String): DataFrame = {
    import spark.implicits._
    val docs = listRecent(store, container, prefix, hoursBack, now)
      .map(n => new String(store.get(container, n), "UTF-8"))
    JsonIngest.fromJson(spark, spark.createDataset(docs), partitionDate)
  }
}
