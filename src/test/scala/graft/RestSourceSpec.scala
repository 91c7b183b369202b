package graft

import graft.sources.{FixturePageSource, RestSource}

class RestSourceSpec extends SparkSpec {

  private def rec(id: Long, name: String) =
    s"""{"id":$id,"name":"$name","full_name":"o/$name","description":"d","owner":{"login":"o"},"license":null,"stargazers_count":1,"forks_count":0,"watchers_count":1,"size":1,"language":"Go","topics":[],"created_at":"2024-01-01T00:00:00Z","updated_at":"2024-01-02T00:00:00Z","pushed_at":"2024-01-02T00:00:00Z","has_wiki":false,"archived":false}"""

  private def idOf(json: String): String =
    json.split("\"id\":")(1).split(",")(0)

  test("pagination stops on empty page and dedups across pages") {
    val src = new FixturePageSource(Seq(
      Seq(rec(1, "a"), rec(2, "b")),
      Seq(rec(2, "b-dup"), rec(3, "c")),
      Seq.empty))
    val out = RestSource.collect(src, maxPages = 10, identity = idOf)
    assert(out.length === 3, "id 2 deduped, first occurrence wins")
    assert(src.calls === 3, "stopped after the empty page")
  }

  test("maxPages caps the loop (rate-budget guard)") {
    val endless = new FixturePageSource(
      Seq.fill(100)(Seq(rec(9, "x"))))
    var throttled = 0
    RestSource.collect(endless, maxPages = 3, identity = idOf,
      onPage = _ => throttled += 1)
    assert(endless.calls === 3 && throttled === 3)
  }

  test("ingest lands deduped records as typed bronze rows") {
    val src = new FixturePageSource(Seq(
      Seq(rec(1, "a"), rec(2, "b")), Seq(rec(2, "b")), Seq.empty))
    val bronze = RestSource.ingest(spark, src, "2024-06-15", identity = idOf)
    assert(bronze.count() === 2)
    assert(bronze.columns.contains("repository_id"))
    assert(bronze.schema("created_at").dataType.typeName === "timestamp")
  }
}
