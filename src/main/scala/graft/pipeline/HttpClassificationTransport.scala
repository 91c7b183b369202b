package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** REAL HTTP [[ClassificationTransport]] over `java.net.http` — the
  * production seam where the reference POSTs classification batches to
  * its LLM endpoint (`utils/llm_classifier.py:150-196`). Protocol:
  * POST `{"inputs": [{repositoryId, name, description, topics,
  * language, stars}, ...]}` → 200 with `{"verdicts": [{repositoryId,
  * category, subcategory, confidence}, ...]}`, exactly one verdict per
  * input (the caller, [[BatchedClassifier]], enforces the count and
  * owns batch-level retry, matching the reference's retry loop —
  * transport-level IO errors simply throw so that loop sees them).
  *
  * Serialization contract: the transport ships to executors, so the
  * HttpClient is `@transient lazy` — each executor builds its own on
  * first use. Tested against an in-process `com.sun.net.httpserver`
  * instance (BatchedClassifierSpec) — real sockets, zero egress.
  */
final class HttpClassificationTransport(
    endpoint: String,
    headers: Map[String, String] = Map.empty,
    requestTimeout: Duration = Duration.ofSeconds(60))
    extends ClassificationTransport {

  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def classifyBatch(
      batch: Seq[RepoForClassification]): Seq[ClassificationVerdict] = {
    val payload = {
      val root = mapper.createObjectNode()
      val arr = root.putArray("inputs")
      batch.foreach { r =>
        val o = arr.addObject()
        o.put("repositoryId", r.repositoryId)
        o.put("name", r.name)
        o.put("description", r.description)
        val t = o.putArray("topics")
        r.topics.foreach(t.add)
        o.put("language", r.language)
        o.put("stars", r.stars)
      }
      mapper.writeValueAsString(root)
    }
    val b = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new java.io.IOException(
      s"classification endpoint returned HTTP ${resp.statusCode()}: " +
        resp.body().take(200))
    val root = mapper.readTree(resp.body())
    require(root.has("verdicts") && root.get("verdicts").isArray,
      s"malformed response: ${resp.body().take(120)}")
    val arr = root.get("verdicts")
    (0 until arr.size()).map { i =>
      val v = arr.get(i)
      // validate per-verdict fields so a malformed entry surfaces as a
      // descriptive transport IOException (which BatchedClassifier's
      // retry loop handles) instead of an opaque NPE
      val missing = VerdictFields.filterNot(v.has)
      if (missing.nonEmpty) throw new java.io.IOException(
        s"malformed verdict at index $i: missing field(s) " +
          s"${missing.mkString(",")} in ${v.toString.take(200)}")
      ClassificationVerdict(
        v.get("repositoryId").asLong(),
        v.get("category").asText(),
        v.get("subcategory").asText(),
        v.get("confidence").asDouble())
    }
  }

  private val VerdictFields =
    Seq("repositoryId", "category", "subcategory", "confidence")
}
