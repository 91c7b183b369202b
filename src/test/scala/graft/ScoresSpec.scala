package graft

import graft.functions.Scores._
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class ScoresSpec extends SparkSpec {
  import spark.implicits._

  test("license categories") {
    val out = Seq("MIT License", "Apache License 2.0", "GNU GPL v3", "Zlib", null)
      .toDF("l").select(licenseCategory($"l")).as[String].collect()
    assert(out === Seq("permissive", "permissive", "copyleft", "other", "none"))
  }

  test("activity score tiers") {
    val out = Seq(0, 30, 31, 90, 91, 365, 366)
      .toDF("d").select(activityScore($"d")).as[Int].collect()
    assert(out === Seq(100, 100, 70, 70, 40, 40, 10))
  }

  test("momentum clamps to 100 and guards zero age") {
    val out = Seq((1000L, 0), (50L, 100), (10000L, 10))
      .toDF("stars", "age").select(momentumScore($"stars", $"age"))
      .as[Double].collect()
    assert(out === Seq(100.0, 5.0, 100.0))
  }

  test("quality score is additive and clamped") {
    val out = Seq(
      (true, 3, 1000L, 10),  // 25+25+30+20 = 100
      (false, 0, 0L, 400),   // 0
      (true, 1, 50L, 100)    // 25+15+10+10 = 60
    ).toDF("hd", "nt", "stars", "push")
      .select(qualityScore($"hd", $"nt", $"stars", $"push")).as[Int].collect()
    assert(out === Seq(100, 0, 60))
  }

  test("health grades") {
    val out = Seq(95, 80, 65, 50, 10).toDF("s")
      .select(healthGrade($"s")).as[String].collect()
    assert(out === Seq("A", "B", "C", "D", "F"))
  }

  test("lang distribution maps topics through the lookup and splits 70/30") {
    // 'python' and 'go' each match exactly one dict entry (no stray 'r')
    val out = Seq(("scala", Seq("python", "go")))
      .toDF("primary", "topics")
      .select(langDistribution($"primary", $"topics").as("m"))
      .select(explode($"m")).as[(String, Double)].collect().toMap
    assert(out === Map("scala" -> 70.0, "Python" -> 15.0, "Go" -> 15.0))
    assert(out.values.sum === 100.0)
  }

  test("lang distribution with no matching topics gives primary 100%") {
    // 'web' and 'ml' match no dict entry
    val out = Seq(("rust", Seq("web", "ml"))).toDF("primary", "topics")
      .select(explode(langDistribution($"primary", $"topics")))
      .as[(String, Double)].collect().toMap
    assert(out === Map("rust" -> 100.0))
  }

  test("lang distribution: invalid primary and no matches => Unknown") {
    val out = Seq(("null", Seq("web"))).toDF("primary", "topics")
      .select(explode(langDistribution($"primary", $"topics")))
      .as[(String, Double)].collect().toMap
    assert(out === Map("Unknown" -> 100.0))
  }

  test("lang distribution skips exact-match primary but keeps its share in the denominator") {
    // topic 'go' maps to 'Go' == primary -> skipped from the map, but its
    // append still counts: per = 30/2 = 15, total = 70 + 15 = 85
    // (reference behavior: sum < 100 pre-normalize, then scaled back up)
    val out = Seq(("Go", Seq("go", "python"))).toDF("primary", "topics")
      .select(explode(langDistribution($"primary", $"topics")))
      .as[(String, Double)].collect().toMap
    assert(out === Map("Go" -> 82.4, "Python" -> 17.6))
  }

  test("lang distribution counts duplicate appends ('r' quirk) in the denominator") {
    // 'spark' and 'kernel' both contain 'r' -> R appended twice; n_t = 2,
    // per = 15, others = [R] once => total = 85
    val out = Seq(("Scala", Seq("spark", "kernel"))).toDF("primary", "topics")
      .select(explode(langDistribution($"primary", $"topics")))
      .as[(String, Double)].collect().toMap
    assert(out === Map("Scala" -> 82.4, "R" -> 17.6))
  }

  test("text quality score and token count") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).as[Int].head() === 9)
    assert(df.select(TextAnalysis.markerCount($"text", "the")).as[Int].head() === 2)
    val fp = df.select(TextAnalysis.fingerprint($"text")).as[String].head()
    assert(fp.matches("[0-9a-f]{32}"))
    // whitespace-insensitive fingerprint
    val fp2 = Seq("the  quick   brown fox jumps over the lazy dog").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[String].head()
    assert(fp === fp2)
  }

  test("pii scrub redacts emails/urls/phones and counts match") {
    val df = Seq(
      "mail bob@x.io and visit https://a.b/c?d=1 or call 555-123-4567 now",
      "no pii here at all",
      "two mails a@b.co c.d@e-f.org").toDF("text")
    val scrubbed = df.select(TextAnalysis.scrubPii($"text")).as[String].collect()
    assert(scrubbed(0) === "mail <EMAIL> and visit <URL> or call <PHONE> now")
    assert(scrubbed(1) === "no pii here at all")
    assert(scrubbed(2) === "two mails <EMAIL> <EMAIL>")
    val counts = df.select(TextAnalysis.piiCounts($"text").as("c"))
      .select($"c.n_email", $"c.n_url", $"c.n_phone")
      .as[(Long, Long, Long)].collect()
    assert(counts.toSeq === Seq((1L, 1L, 1L), (0L, 0L, 0L), (2L, 0L, 0L)))
  }

  test("ngram repetition stats match hand-computed values") {
    // "a b a b a b": 3-grams = [aba, bab, aba, bab] -> 4 total, 2
    // distinct, most frequent appears 2x
    val out = Seq("a b a b a b", "x y z w", "q q q q q", "a b")
      .toDF("text")
      .select(TextAnalysis.ngramRepetition($"text", 3).as("r"))
      .select($"r.n_grams", $"r.n_distinct", $"r.top_n")
      .as[(Long, Long, Long)].collect()
    assert(out(0) === ((4L, 2L, 2L)))
    assert(out(1) === ((2L, 2L, 1L))) // x y z, y z w — all unique
    assert(out(2) === ((3L, 1L, 3L))) // q q q three times
    assert(out(3) === ((0L, 0L, 0L))) // too short
  }
}
