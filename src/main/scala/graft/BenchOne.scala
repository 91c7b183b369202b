package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val fn = SparkEntry.queries(name)
    println(f"[benchone] $name cold=${time(fn(spark, sfDir).count())}%.2f")
    spark.catalog.clearCache()
    println(f"[benchone] $name warm=${time(fn(spark, sfDir).count())}%.2f")
    spark.catalog.clearCache()
    println(f"[benchone] $name warm2=${time(fn(spark, sfDir).count())}%.2f")
    spark.stop()
  }
}
