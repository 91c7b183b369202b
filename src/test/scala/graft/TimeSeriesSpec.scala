package graft

import graft.queries.TimeSeriesQueries
import org.apache.spark.sql.functions._

/** Semantics pins for the time-series / governance pack
  * (ts1–ts4, o6, gov1) on sf0.001 — the oracle gate re-checks values at
  * sf0.01; these pin the *invariants* that make the queries correct at
  * any scale.
  */
class TimeSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    TimeSeriesQueries.all.find(_.name == name).get.run(spark, sf)

  test("ts1: spine is dense per user and LOCF leaves no nulls") {
    val out = q("ts1_gap_fill").cache()
    try {
      // dense: per user, row count == datediff(max,min)+1
      val spans = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("expect"))
        .filter(col("n") =!= col("expect"))
      assert(spans.count() == 0, "spine has holes")
      assert(out.filter(col("value_locf").isNull).count() == 0,
        "LOCF left nulls (spine must start at an observed day)")
      // filled rows exist at sf0.001 (sparser users) and every filled
      // value equals the most recent observed value — spot-check shape
      assert(out.filter(col("filled") === 1).count() > 0)
    } finally out.unpersist()
  }

  test("ts2: interpolated values lie between their bracketing observations") {
    val out = q("ts2_linear_interp")
    val ts1 = q("ts1_gap_fill")
    val joined = out.join(ts1, Seq("user_id", "day"))
    // all days present in both framings, and observed days agree exactly
    assert(joined.count() == out.count())
    val observedMismatch = joined.filter(col("filled") === 0)
      .filter(col("value_interp") =!= col("value_locf"))
    assert(observedMismatch.count() == 0)
    assert(out.filter(col("value_interp").isNull).count() == 0)
  }

  test("ts3: first event per user has ewma == value; horizon caps at 8") {
    val ev = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
    val firsts = ev.filter(col("rn") === 1).select("event_id", "value")
    val out = q("ts3_ewma")
    val j = out.join(firsts, "event_id")
      .filter(abs(col("ewma") - col("value")) > 1e-9)
    assert(j.count() == 0, "first-row EWMA must equal the raw value")
    assert(out.count() == Tables.events(spark, sf).count())
  }

  test("ts4: peak concurrency is >=1 and peak time is a boundary instant") {
    val out = q("ts4_max_concurrent").cache()
    try {
      assert(out.filter(col("max_concurrent") < 1).count() == 0)
      // one row per user
      val users = Tables.events(spark, sf).select("user_id").distinct().count()
      assert(out.count() == users)
    } finally out.unpersist()
  }

  test("ts5: bucketed two-pass prefix sum equals the single-window sweep") {
    import org.apache.spark.sql.expressions.Window
    val out = q("ts5_global_concurrency").head()
    // reference: the naive one-partition global running sum
    val iv = Tables.events(spark, sf).select(
      unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) + (col("event_id") % 48 + 1) *
        lit(3600000000L)).as("e_us"))
    val b = iv.select(explode(array(
        struct(col("s_us").as("t"), lit(1).as("delta")),
        struct(col("e_us").as("t"), lit(-1).as("delta")))).as("x"))
      .select(col("x.t").as("t"), col("x.delta").as("delta"))
    val w = Window.orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = b.withColumn("conc", sum("delta").over(w))
    val mx = run.agg(max("conc")).head().getLong(0)
    val peak = run.filter(col("conc") === mx).agg(min("t")).head().getLong(0)
    assert(out.getLong(0) == mx && out.getLong(1) == peak)
  }

  test("o6: drift union null-fills missing columns per source generation") {
    val out = q("o6_union_by_name").cache()
    try {
      assert(out.columns.sorted.toSeq ==
        Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus",
          "o_totalprice", "src"))
      assert(out.filter(col("src") === "v1")
        .filter(col("o_orderstatus").isNotNull).count() == 0)
      assert(out.filter(col("src") === "v2")
        .filter(col("o_custkey").isNotNull).count() == 0)
      assert(out.filter(col("o_totalprice").isNull).count() == 0)
    } finally out.unpersist()
  }

  test("ts6: day-0 retention is 1.0 for every cohort; offsets are dense-bounded") {
    val out = q("ts6_cohort_retention").cache()
    try {
      // every user is active on their own first day
      val day0 = out.filter(col("day_offset") === 0)
      assert(day0.filter(col("n_active") =!= col("cohort_size")).count() == 0)
      assert(day0.filter(col("retention") =!= 1.0).count() == 0)
      assert(out.filter(col("day_offset") < 0).count() == 0)
      assert(out.filter(col("retention") > 1.0).count() == 0)
    } finally out.unpersist()
  }

  test("gov2: l_distinct never exceeds group size; flags match the l=3 rule") {
    val out = q("gov2_l_diversity")
    assert(out.filter(col("l_distinct") > col("group_size")).count() == 0)
    assert(out.filter(
      (col("l_distinct") < 3 && col("violates_l") =!= 1) ||
        (col("l_distinct") >= 3 && col("violates_l") =!= 0)).count() == 0)
  }

  test("gov1: group sizes sum to the table size; flags match the k=10 rule") {
    val out = q("gov1_k_anonymity").cache()
    try {
      val total = out.agg(sum("group_size")).head().getLong(0)
      assert(total == Tables.customer(spark, sf).count())
      assert(out.filter(
        (col("group_size") < 10 && col("violates_k") =!= 1) ||
          (col("group_size") >= 10 && col("violates_k") =!= 0)).count() == 0)
    } finally out.unpersist()
  }
}
