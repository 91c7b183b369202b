package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Each query gets one untimed warmup execution (JIT + whole-stage
  * codegen compilation + parquet footer cache), then one timed run —
  * `value` is steady-state operator throughput, which is what a
  * long-running cluster job sees; `cold_total` keeps the first-run wall
  * clock for transparency.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Host-calibration workload: fixed and data-independent — codegen'd
    // arithmetic over a 1G-row range, a 4096-key hash shuffle, and a
    // hash aggregation, i.e. the same machinery the real queries spend
    // their time in. Its runtime varies only with the host. Per-query
    // numbers divided by `calibration_sec` are comparable across rounds
    // even when the bench machine changes (observed r6→r7: ~1.5–1.7×
    // uniform wall-clock drift on identical code at the same commit —
    // see README "Bench methodology").
    //
    // r18 hardening: every r17 block's pre/post probes disagreed
    // 25–48% because the 200M-row probe finished sub-second — inside
    // JIT/GC jitter. Now SECONDS-long (1G rows, ~2–4 s a run), two
    // warmups, median of 5; a window is trustworthy only when pre and
    // post agree within ~5%, and the driver's cross-round ratios
    // should be read against that agreement.
    def calibration(): Double = {
      import org.apache.spark.sql.functions._
      def run(): Unit = spark.range(0, 1000000000L, 1, 32)
        .select(pmod(xxhash64(col("id")), lit(4096)).as("k"), col("id"))
        .groupBy("k").agg(sum("id").as("s"), count(lit(1)).as("c"))
        .agg(sum(col("s") + col("c"))).collect()
      run(); run(); Seq.fill(5)(time(run())).sorted.apply(2)
    }

    // optional filter for local iteration: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // calibration BEFORE and AFTER the suite: the pair brackets host
    // drift across the ~10 min run (observed runs where the end-of-suite
    // calibration was 15% slower than a back-to-back rerun's while raw
    // query times moved the other way — one sample can't adjudicate
    // that; two can)
    val calibPre = calibration()
    var coldTotal = 0.0
    // median of 3 timed runs after one cold warmup: sub-second queries
    // showed 4-10× single-run spread across full-suite runs (JVM/GC/host
    // noise), which burned two rounds of phantom-regression adjudication;
    // the median is stable to <30% across back-to-back suites
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t = try {
        coldTotal += time(fn(spark, sfDir).count()) // warmup (cold)
        Seq.fill(3)(time(fn(spark, sfDir).count())).sorted.apply(1)
      } catch { case _: Throwable => -1.0 }
      // each invocation builds fresh lineage, so persisted frames from
      // prior queries are dead weight — drop them to keep memory flat
      spark.catalog.clearCache()
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val calib = calibration()
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"calibration_sec":$calib,"calibration_pre_sec":$calibPre,"sf":"$sfDir"}"""
    println(line)
    // Persist the full per-query map (driver artifacts keep only a
    // truncated stdout tail, which made cross-round per-query ratios
    // unreproducible — round-7 advisory). Overwritten per run; committed
    // runs live under docs/bench/.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "docs/bench/latest.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist result file: $e")
    }
    spark.stop()
  }
}
