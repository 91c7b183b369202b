package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.pipeline.{BatchedClassifier, HttpClassificationTransport}
import graft.sources.{HttpPageSource, RestSource}

/** The REAL HTTP transports (java.net.http) driven against an
  * in-process JDK HttpServer — actual sockets, zero egress. Covers the
  * reference's request-loop semantics: pagination termination,
  * Retry-After rate-limit handling, 5xx exponential-backoff retry,
  * loud unretryable 4xx, the GitHub `items` envelope, and the batch
  * classification POST end to end through BatchedClassifier on
  * executors. */
class HttpTransportSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(route: (String, HttpExchange => Unit)*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    route.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) =>
        try h(ex) finally ex.close())
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, bodyText: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = bodyText.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def pageParam(ex: HttpExchange): Int =
    ex.getRequestURI.getQuery.split("&").collectFirst {
      case kv if kv.startsWith("page=") => kv.drop(5).toInt
    }.get

  private def repoJson(id: Int): String =
    s"""{"id": $id, "full_name": "o/r$id"}"""

  test("paginates plain-array pages until the empty page") {
    withServer("/repos" -> { ex =>
      val p = pageParam(ex)
      val items = if (p < 2) Seq(repoJson(p * 2), repoJson(p * 2 + 1)) else Nil
      respond(ex, 200, items.mkString("[", ",", "]"))
    }) { base =>
      val src = new HttpPageSource(s"$base/repos", perPage = 2,
        backoffBaseMs = 1, sleeper = _ => ())
      val recs = RestSource.collect(src, maxPages = 10)
      assert(recs.length === 4)
      assert(recs.head.contains(""""id":0"""))
    }
  }

  test("unwraps the GitHub search 'items' envelope") {
    withServer("/search" -> { ex =>
      val p = pageParam(ex)
      val items = if (p == 0) Seq(repoJson(7)) else Nil
      respond(ex, 200,
        s"""{"total_count": 1, "items": ${items.mkString("[", ",", "]")}}""")
    }) { base =>
      val src = new HttpPageSource(s"$base/search?q=stars", perPage = 1,
        sleeper = _ => ())
      assert(RestSource.collect(src).length === 1)
    }
  }

  test("rate limit honors Retry-After then succeeds; 5xx backs off") {
    val hits = new AtomicInteger()
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer("/flaky" -> { ex =>
      hits.incrementAndGet() match {
        case 1 => respond(ex, 429, "slow down", Map("Retry-After" -> "7"))
        case 2 => respond(ex, 503, "boom")
        case _ => respond(ex, 200, s"[${repoJson(1)}]")
      }
    }) { base =>
      val src = new HttpPageSource(s"$base/flaky", backoffBaseMs = 8,
        sleeper = slept += _)
      assert(src.fetchPage(0).length === 1)
      assert(hits.get() === 3)
      assert(slept.head === 7000) // Retry-After seconds, not backoff
      assert(slept(1) === 16)     // second attempt: base << 1
    }
  }

  test("a huge Retry-After is clamped to maxBackoffMs; HTTP-date falls back to backoff") {
    val hits = new AtomicInteger()
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer("/hostile" -> { ex =>
      hits.incrementAndGet() match {
        // a hostile/broken server must not park the driver for a day
        case 1 => respond(ex, 429, "later", Map("Retry-After" -> "86400"))
        // RFC 7231 also allows an HTTP-date here — not a crash, a backoff
        case 2 => respond(ex, 429, "later",
          Map("Retry-After" -> "Fri, 31 Dec 1999 23:59:59 GMT"))
        case _ => respond(ex, 200, s"[${repoJson(1)}]")
      }
    }) { base =>
      val src = new HttpPageSource(s"$base/hostile", backoffBaseMs = 8,
        maxBackoffMs = 50, sleeper = slept += _)
      assert(src.fetchPage(0).length === 1)
      assert(slept.head === 50, "86400 s Retry-After clamps to maxBackoffMs")
      assert(slept(1) === 16, "HTTP-date form falls back to base << 1")
    }
  }

  test("failure text never echoes request header values (auth tokens)") {
    val secret = "Bearer sekrit-token-123"
    withServer(
      "/nope" -> { ex => respond(ex, 404, "missing") },
      "/dead" -> { ex => respond(ex, 500, "down") }) { base =>
      val e1 = intercept[IllegalArgumentException] {
        new HttpPageSource(s"$base/nope", headers = Map("Authorization" -> secret),
          sleeper = _ => ()).fetchPage(0)
      }
      val e2 = intercept[IllegalStateException] {
        new HttpPageSource(s"$base/dead", headers = Map("Authorization" -> secret),
          maxAttempts = 2, backoffBaseMs = 1, sleeper = _ => ()).fetchPage(0)
      }
      Seq(e1, e2).foreach { e =>
        assert(!e.getMessage.contains("sekrit"),
          s"header value leaked into: ${e.getMessage}")
      }
    }
  }

  test("unretryable 4xx and exhausted retries fail loudly") {
    withServer(
      "/nope" -> { ex => respond(ex, 404, "missing") },
      "/dead" -> { ex => respond(ex, 500, "down") }) { base =>
      intercept[IllegalArgumentException] {
        new HttpPageSource(s"$base/nope", sleeper = _ => ()).fetchPage(0)
      }
      val e = intercept[IllegalStateException] {
        new HttpPageSource(s"$base/dead", maxAttempts = 2,
          backoffBaseMs = 1, sleeper = _ => ()).fetchPage(0)
      }
      assert(e.getMessage.contains("after 2 attempts"))
    }
  }

  test("http ingest lands typed bronze rows end to end") {
    withServer("/repos" -> { ex =>
      val p = pageParam(ex)
      val full = s"""{"id": 42, "name": "n", "full_name": "o/n",
        "owner": {"login": "o", "type": "User"},
        "stargazers_count": 5, "forks_count": 1, "watchers_count": 1,
        "open_issues_count": 0, "size": 10, "default_branch": "main",
        "language": "Scala", "topics": ["t"],
        "created_at": "2024-01-01T00:00:00Z",
        "updated_at": "2024-01-01T00:00:00Z",
        "pushed_at": "2024-01-01T00:00:00Z",
        "has_wiki": true, "has_pages": false,
        "archived": false, "disabled": false}"""
      respond(ex, 200, if (p == 0) s"[$full]" else "[]")
    }) { base =>
      val bronze = RestSource.ingest(spark,
        new HttpPageSource(s"$base/repos", sleeper = _ => ()), "2026-08-13")
      val row = bronze.head()
      assert(row.getAs[Long]("repository_id") === 42L)
      assert(row.getAs[String]("owner_login") === "o")
    }
  }

  test("a verdict with missing fields raises a descriptive transport error, not an NPE") {
    withServer("/classify" -> { ex =>
      // second verdict lacks `category` and `confidence`
      respond(ex, 200,
        """{"verdicts": [
          {"repositoryId": 1, "category": "AI/ML", "subcategory": "s", "confidence": 0.9},
          {"repositoryId": 2, "subcategory": "s"}]}""")
    }) { base =>
      val e = intercept[java.io.IOException] {
        new HttpClassificationTransport(s"$base/classify").classifyBatch(Seq(
          graft.pipeline.RepoForClassification(1L, "a", "d", Seq("t"), "Scala", 1L),
          graft.pipeline.RepoForClassification(2L, "b", "d", Seq("t"), "Scala", 1L)))
      }
      assert(e.getMessage.contains("index 1") &&
        e.getMessage.contains("category") && e.getMessage.contains("confidence"),
        s"error must name the malformed entry and fields: ${e.getMessage}")
    }
  }

  test("classification POST round-trips through BatchedClassifier on executors") {
    withServer("/classify" -> { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val inputs = mapper.readTree(body).get("inputs")
      val root = mapper.createObjectNode()
      val arr = root.putArray("verdicts")
      (0 until inputs.size()).foreach { i =>
        val in = inputs.get(i)
        val o = arr.addObject()
        o.put("repositoryId", in.get("repositoryId").asLong())
        // deterministic echo rule the assertion can re-derive
        o.put("category", if (in.get("stars").asLong() >= 10) "AI/ML" else "Other")
        o.put("subcategory", in.get("language").asText())
        o.put("confidence", 0.9)
      }
      respond(ex, 200, mapper.writeValueAsString(root))
    }) { base =>
      val df = (1 to 25).map(i => (i.toLong, s"r$i", s"d$i",
        Seq("t"), "Scala", if (i % 2 == 0) 20L else 5L))
        .toDF("repository_id", "name", "description", "topics", "language",
          "stargazers_count")
      val out = new BatchedClassifier(
        new HttpClassificationTransport(s"$base/classify"), batchSize = 10)
        .classify(df)
      assert(out.count() === 25)
      val cats = out.orderBy("repository_id")
        .select("technology_category").as[String].collect()
      assert(cats.zipWithIndex.forall { case (c, i) =>
        c == (if ((i + 1) % 2 == 0) "AI/ML" else "Other")
      })
    }
  }
}
