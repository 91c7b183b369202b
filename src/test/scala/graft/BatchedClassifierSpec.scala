package graft

import graft.pipeline.{BatchedClassifier, ClassificationTransport,
  ClassificationVerdict, RepoForClassification, Silver}
import org.apache.spark.sql.functions._

/** The batched transport shape: batch boundaries, the retry ladder, the
  * one-verdict-per-input contract, and Silver integration. Call
  * recording uses a synchronized companion (valid under local[*]: one
  * JVM). */
object BatchedClassifierSpec {
  private val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
  private val failures = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = synchronized { calls.clear(); failures.set(0) }
  def record(n: Int): Unit = synchronized { calls += n }
  def batchSizes: Seq[Int] = synchronized { calls.toSeq }
  def failFirst(n: Int): Unit = failures.set(n)
  def shouldFail(): Boolean = failures.getAndDecrement() > 0

  /** Deterministic fixture transport: category from id mod 3. */
  class FixtureTransport extends ClassificationTransport {
    def classifyBatch(batch: Seq[RepoForClassification]): Seq[ClassificationVerdict] = {
      record(batch.length)
      if (shouldFail()) throw new RuntimeException("transient transport error")
      batch.map(r => ClassificationVerdict(
        r.repositoryId, s"cat${r.repositoryId % 3}", "sub", 0.85))
    }
  }

  /** Violates the one-verdict-per-input contract. */
  class ShortTransport extends ClassificationTransport {
    def classifyBatch(batch: Seq[RepoForClassification]): Seq[ClassificationVerdict] =
      batch.drop(1).map(r => ClassificationVerdict(r.repositoryId, "x", "y", 0.5))
  }
}

class BatchedClassifierSpec extends SparkSpec {
  import BatchedClassifierSpec._
  import spark.implicits._

  private def repos(n: Int) =
    (1 to n).map(i => (i.toLong, s"repo$i", s"desc$i",
      Seq("topic"), "Scala", 10L))
      .toDF("repository_id", "name", "description", "topics", "language",
        "stargazers_count")

  test("batches are bounded by batchSize within each partition") {
    reset()
    val out = new BatchedClassifier(new FixtureTransport, batchSize = 10)
      .classify(repos(25).repartition(1))
    assert(out.count() === 25)
    assert(batchSizes.sorted === Seq(5, 10, 10), s"got $batchSizes")
    assert(out.filter($"repository_id" === 3).head()
      .getAs[String]("technology_category") === "cat0")
  }

  test("transient failures are retried up to maxAttempts") {
    reset()
    failFirst(2) // first two calls throw; the third succeeds
    val out = new BatchedClassifier(new FixtureTransport,
      batchSize = 100, maxAttempts = 3).classify(repos(5).repartition(1))
    assert(out.count() === 5)
    assert(batchSizes.length === 3, "two failed attempts + one success")
  }

  test("persistent failure surfaces after maxAttempts") {
    reset()
    failFirst(1000)
    val ex = intercept[org.apache.spark.SparkException] {
      new BatchedClassifier(new FixtureTransport,
        batchSize = 100, maxAttempts = 3).classify(repos(3).repartition(1))
        .count()
    }
    assert(ex.getMessage.contains("failed after 3 attempts") ||
      ex.getCause != null)
  }

  test("a transport returning the wrong cardinality is rejected") {
    reset()
    intercept[org.apache.spark.SparkException] {
      new BatchedClassifier(new ShortTransport, batchSize = 10)
        .classify(repos(4).repartition(1)).count()
    }
  }

  test("Silver.transform accepts a batched classifier") {
    reset()
    val bronze = graft.queries.DemoBronze.fromPart(spark, "/root/testdata/sf0.001")
      .limit(40)
    val silver = Silver.transform(bronze, "2024-06-15",
      classifier = new BatchedClassifier(new FixtureTransport, batchSize = 16))
    assert(silver.count() === 40)
    assert(batchSizes.forall(_ <= 16))
    assert(silver.select("classification_confidence").head().getDouble(0) === 0.85)
  }
}
