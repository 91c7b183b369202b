package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("as-of attaches the latest right row at or before each left ts") {
    val left = Seq(
      (1L, ts(0), "e0"), (1L, ts(10), "e10"), (1L, ts(20), "e20"),
      (2L, ts(5), "x5")
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(0), "v0"), (1L, ts(10), "v10"), (1L, ts(15), "v15"),
      (2L, ts(6), "v6") // after the only left row for key 2
    ).toDF("k", "vt", "payload")

    val out = AsOfJoin.asOf(left, right, "k", "t", "vt")
      .orderBy("k", "t").as[(Long, Timestamp, String, String)].collect()
    assert(out === Seq(
      (1L, ts(0), "e0", "v0"),    // tie: right at same ts matches
      (1L, ts(10), "e10", "v10"),
      (1L, ts(20), "e20", "v15"), // carries the 15-min version forward
      (2L, ts(5), "x5", null)))   // nothing at-or-before => null (left join)
  }

  test("forward as-of attaches the earliest right row at or after each left ts") {
    val left = Seq(
      (1L, ts(0), "e0"), (1L, ts(10), "e10"), (1L, ts(20), "e20"),
      (2L, ts(5), "x5")
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts(0), "v0"), (1L, ts(12), "v12"),
      (2L, ts(3), "v3") // before the only left row for key 2
    ).toDF("k", "vt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "t", "vt",
      direction = "forward")
      .orderBy("k", "t").as[(Long, Timestamp, String, String)].collect()
    assert(out === Seq(
      (1L, ts(0), "e0", "v0"),     // tie matches in forward mode too
      (1L, ts(10), "e10", "v12"),  // next right row after ts 10
      (1L, ts(20), "e20", null),   // nothing at-or-after
      (2L, ts(5), "x5", null)))    // v3 is BEFORE => no forward match
  }

  test("tolerance nulls matches farther than the bound, keeps the rest") {
    val left = Seq((1L, ts(60), "e")).toDF("k", "t", "ev")
    val right = Seq((1L, ts(0), "old"), (1L, ts(55), "recent"))
      .toDF("k", "vt", "payload")
    // backward nearest is ts(55), 5 min away: within 600 s, outside 120 s
    def run(tol: Double) =
      AsOfJoin.asOf(left, right, "k", "t", "vt",
        toleranceSec = Some(tol))
        .as[(Long, Timestamp, String, String)].head()._4
    assert(run(600.0) === "recent")
    assert(run(120.0) === null)
    // forward with tolerance: nearest-after is missing entirely
    val fwd = AsOfJoin.asOf(left, right, "k", "t", "vt",
      direction = "forward", toleranceSec = Some(600.0))
      .as[(Long, Timestamp, String, String)].head()._4
    assert(fwd === null)
  }

  test("nearest row wins atomically even when its payload value is null") {
    // right rows: (ts 0, "a") and (ts 100, null). Left at ts 101 must
    // get the NEAREST row's value — null — not "a" carried past it;
    // and with tolerance 5 s the old row must NOT masquerade as a
    // within-tolerance match.
    val left = Seq((1L, ts(101), "e")).toDF("k", "t", "ev")
    val right = Seq((1L, ts(0), "a"), (1L, ts(100), null))
      .toDF("k", "vt", "payload")
    val plain = AsOfJoin.asOf(left, right, "k", "t", "vt")
      .as[(Long, Timestamp, String, String)].head()
    assert(plain._4 === null, "nearest row's (null) value, not an older row's")
    val tol = AsOfJoin.asOf(left, right, "k", "t", "vt",
      toleranceSec = Some(300.0))
      .as[(Long, Timestamp, String, String)].head()
    assert(tol._4 === null)
  }

  test("null right timestamps are never matchable in either direction") {
    val left = Seq((1L, ts(10), "e10")).toDF("k", "t", "ev")
    // a null-ts right row would sort nulls-first (backward asc /
    // forward desc_nulls_first) ahead of every real row — it must be
    // invisible, not a universal match
    val right = Seq(
      (1L, Option(ts(0)), "v0"),
      (1L, Option.empty[Timestamp], "vnull")
    ).toDF("k", "vt", "payload")
    val back = AsOfJoin.asOf(left, right, "k", "t", "vt")
      .as[(Long, Timestamp, String, String)].head()
    assert(back === ((1L, ts(10), "e10", "v0")))
    val fwd = AsOfJoin.asOf(left, right, "k", "t", "vt",
      direction = "forward")
      .as[(Long, Timestamp, String, String)].head()
    assert(fwd === ((1L, ts(10), "e10", null)))
    // a key with ONLY null-ts right rows matches nothing
    val onlyNull = right.filter($"vt".isNull)
    val none = AsOfJoin.asOf(left, onlyNull, "k", "t", "vt")
      .as[(Long, Timestamp, String, String)].head()
    assert(none === ((1L, ts(10), "e10", null)))
  }

  test("tolerance verdict is exact at the boundary (integer micros, not doubles)") {
    // diff exactly equal to the bound must MATCH (<=), bound + 1 micro
    // must not — double-seconds arithmetic can flip this
    val base = new Timestamp(1700000000000L)
    def plusMicros(us: Long) = {
      val t = new Timestamp(base.getTime + us / 1000)
      t.setNanos((t.getNanos / 1000000 * 1000000) + (us % 1000 * 1000).toInt)
      t
    }
    val left = Seq((1L, plusMicros(1800L * 1000000), "e")).toDF("k", "t", "ev")
    val atBound = Seq((1L, base, "v")).toDF("k", "vt", "payload")
    val hit = AsOfJoin.asOf(left, atBound, "k", "t", "vt",
      toleranceSec = Some(1800.0))
      .as[(Long, Timestamp, String, String)].head()
    assert(hit._4 === "v", "diff == bound must match under <=")
    val leftOver = Seq((1L, plusMicros(1800L * 1000000 + 1), "e"))
      .toDF("k", "t", "ev")
    val miss = AsOfJoin.asOf(leftOver, atBound, "k", "t", "vt",
      toleranceSec = Some(1800.0))
      .as[(Long, Timestamp, String, String)].head()
    assert(miss._4 === null, "diff == bound + 1 micro must not match")
  }

  test("null left timestamps match nothing in either direction") {
    val left = Seq((1L, null.asInstanceOf[Timestamp], "e")).toDF("k", "t", "ev")
    val right = Seq((1L, ts(5), "x")).toDF("k", "vt", "payload")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.asOf(left, right, "k", "t", "vt", direction = dir)
        .as[(Long, Timestamp, String, String)].head()
      assert(out._4 === null, s"direction $dir must not match a null ts")
    }
  }

  test("as-of never drops or duplicates left rows") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts", $"value")
    val snaps = ev.groupBy($"user_id",
        org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("hs"))
      .agg(org.apache.spark.sql.functions.max($"value").as("m"))
    val joined = AsOfJoin.asOf(ev, snaps, "user_id", "ts", "hs")
    assert(joined.count() === ev.count())
    assert(joined.select("event_id").distinct().count() === ev.count())
  }
}
