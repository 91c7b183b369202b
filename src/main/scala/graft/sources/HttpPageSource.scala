package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** REAL HTTP [[PageSource]] over `java.net.http` — the production
  * transport for the S1–S3 REST collectors, mirroring the reference's
  * request loop (`notebooks/github_data_ingestion.py:92-232`) and its
  * rate-limit / error handling (`personal_repos_ingestion.py:110-131`):
  *
  *   - page URL: `{base}{sep}page={n}&per_page={k}`;
  *   - 200 → body parsed as a JSON array, or an object whose `items`
  *     field is the array (the GitHub search-API envelope); each
  *     element is re-serialized to one record string for
  *     [[JsonIngest]]'s schema-first parse;
  *   - 429/403 (rate limit) → honor `Retry-After` seconds when present
  *     (clamped to `maxBackoffMs` — a hostile or broken server must not
  *     be able to park the driver for a day; a non-integer value, e.g.
  *     the RFC 7231 HTTP-date form, falls back to exponential backoff),
  *     else exponential backoff, then retry;
  *   - 5xx / IO errors → exponential backoff retry up to `maxAttempts`;
  *   - other 4xx → fail loudly (a bad request never resolves itself).
  *
  * Every sleep counts against `maxAttempts`, and no failure path echoes
  * request header VALUES (they routinely carry auth tokens) — error
  * text names only the URL, status, and a body snippet.
  *
  * The JSON split uses Jackson (already on Spark's classpath — Spark's
  * own JSON datasource is built on it). Tested against an in-process
  * `com.sun.net.httpserver` instance (RestSourceSpec) — real sockets,
  * zero egress.
  */
final class HttpPageSource(
    baseUrl: String,
    perPage: Int = 100,
    headers: Map[String, String] = Map.empty,
    maxAttempts: Int = 4,
    backoffBaseMs: Long = 500,
    maxBackoffMs: Long = 30000,
    requestTimeout: Duration = Duration.ofSeconds(30),
    sleeper: Long => Unit = Thread.sleep) extends PageSource {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  private val mapper = new ObjectMapper()

  override def fetchPage(page: Int): Seq[String] = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val uri = URI.create(s"$baseUrl${sep}page=$page&per_page=$perPage")
    var attempt = 0
    while (true) {
      attempt += 1
      val resp: Either[Throwable, HttpResponse[String]] =
        try {
          val b = HttpRequest.newBuilder(uri).timeout(requestTimeout).GET()
          headers.foreach { case (k, v) => b.header(k, v) }
          Right(client.send(b.build(), HttpResponse.BodyHandlers.ofString()))
        } catch { case e: java.io.IOException => Left(e) }
      resp match {
        case Right(r) if r.statusCode() == 200 =>
          return parseRecords(r.body())
        case Right(r) if r.statusCode() == 429 || r.statusCode() == 403 =>
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"rate-limited after $maxAttempts attempts: HTTP ${r.statusCode()} $uri")
          val retryAfter = r.headers().firstValue("Retry-After")
          val ms =
            if (retryAfter.isPresent)
              // integer-seconds form only; the HTTP-date form (RFC 7231)
              // falls back to exponential backoff rather than throwing
              scala.util.Try(retryAfter.get.trim.toLong * 1000)
                .getOrElse(backoffBaseMs << (attempt - 1))
            else backoffBaseMs << (attempt - 1)
          sleeper(clampBackoff(ms))
        case Right(r) if r.statusCode() >= 500 =>
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"server error after $maxAttempts attempts: HTTP ${r.statusCode()} $uri")
          sleeper(clampBackoff(backoffBaseMs << (attempt - 1)))
        case Right(r) =>
          throw new IllegalArgumentException(
            s"unretryable HTTP ${r.statusCode()} for $uri: ${r.body().take(200)}")
        case Left(e) =>
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"IO failure after $maxAttempts attempts for $uri", e)
          sleeper(clampBackoff(backoffBaseMs << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def clampBackoff(ms: Long): Long =
    math.min(math.max(ms, 0L), maxBackoffMs)

  /** Top-level JSON array, or the GitHub search envelope's `items`. */
  private def parseRecords(body: String): Seq[String] = {
    val root = mapper.readTree(body)
    val arr =
      if (root.isArray) root
      else if (root.has("items") && root.get("items").isArray) root.get("items")
      else throw new IllegalArgumentException(
        s"expected a JSON array or an 'items' envelope, got: ${body.take(120)}")
    (0 until arr.size()).map(i => mapper.writeValueAsString(arr.get(i)))
  }
}
