package graft

import java.nio.file.Files
import java.time.Instant

import graft.sources.BlobJson
import graft.sources.BlobJson.LocalBlobStore

/** S9/K6: blob JSON landing zone against the local store — timestamped
  * sink layout, recent-window listing, and the end-to-end recent-blobs
  * → bronze read. */
class BlobJsonSpec extends SparkSpec {

  private def repoJson(id: Long, name: String): String =
    s"""{"id": $id, "name": "$name", "full_name": "o/$name",
        "owner": {"login": "o", "type": "User"},
        "stargazers_count": ${id * 10}, "forks_count": 1,
        "watchers_count": 1, "open_issues_count": 0, "size": 100,
        "default_branch": "main", "language": "Scala", "topics": ["t"],
        "created_at": "2024-01-01T00:00:00Z",
        "updated_at": "2024-01-02T00:00:00Z",
        "pushed_at": "2024-01-03T00:00:00Z",
        "has_wiki": true, "has_pages": false,
        "archived": false, "disabled": false}"""

  private def freshStore = new LocalBlobStore(
    Files.createTempDirectory("graft-blob"))

  test("timestamped blob names follow the reference layout") {
    val at = Instant.parse("2026-03-04T05:06:07Z")
    assert(BlobJson.generateBlobName("github_repositories", at) ===
      "github_repositories/2026/03/04/05_06_07.json")
  }

  test("put/get round-trips; non-overwrite refuses; escapes rejected") {
    val store = freshStore
    BlobJson.uploadJson(store, "bronze", "a/b.json", """{"x": 1}""")
    assert(new String(store.get("bronze", "a/b.json"), "UTF-8") === """{"x": 1}""")
    intercept[IllegalArgumentException] {
      BlobJson.uploadJson(store, "bronze", "a/b.json", "{}", overwrite = false)
    }
    intercept[IllegalArgumentException] {
      store.put("bronze", "../../etc/passwd", Array[Byte](1))
    }
  }

  test("recent listing filters by window and sorts newest first") {
    val now = Instant.now()
    // mtimes set explicitly: list() filters on mtime, not the name
    val base = Files.createTempDirectory("graft-blob2")
    val s2 = new LocalBlobStore(base)
    for ((h, i) <- Seq(1, 10, 40).zipWithIndex) {
      val name = s"github_repositories/2026/01/0${i + 1}/00_00_00.json"
      BlobJson.uploadJson(s2, "bronze", name, "[]")
      Files.setLastModifiedTime(
        base.resolve("bronze").resolve(name),
        java.nio.file.attribute.FileTime.from(now.minusSeconds(h * 3600L)))
    }
    // a non-json straggler is never listed
    s2.put("bronze", "github_repositories/notes.txt", Array[Byte](1))
    val recent = BlobJson.listRecent(s2, "bronze", "github_repositories/",
      hoursBack = 24, now = now)
    assert(recent === Seq(
      "github_repositories/2026/01/02/00_00_00.json",
      "github_repositories/2026/01/01/00_00_00.json"))
  }

  test("recent blobs parse into bronze rows through the schema-first path") {
    val store = freshStore
    val now = Instant.now()
    // two pages: one array-shaped (the raw API response), one NDJSON
    BlobJson.uploadJson(store, "bronze",
      BlobJson.generateBlobName("github_repositories", now.minusSeconds(60)),
      s"[${repoJson(1, "alpha")}, ${repoJson(2, "beta")}]")
    BlobJson.uploadJson(store, "bronze",
      BlobJson.generateBlobName("github_repositories", now.minusSeconds(120)),
      repoJson(3, "gamma"))
    val bronze = BlobJson.readRecent(spark, store, "bronze",
      "github_repositories/", hoursBack = 24, now = now,
      partitionDate = "2026-08-13")
    val rows = bronze.orderBy("repository_id").collect()
    assert(rows.map(_.getAs[Long]("repository_id")).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[String]("name")).toSeq ===
      Seq("alpha", "beta", "gamma"))
    assert(rows.forall(_.getAs[String]("partition_date") == "2026-08-13"))
  }
}
