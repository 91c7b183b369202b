package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Mirrors the reference's lakehouse catalog-scan surface
  * (SURVEY.md §2.1 S6/S7: `spark.table` / `spark.read.format("delta").load`,
  * reference `notebooks/silver_to_gold_analytics.py:87-97`) on plain
  * partitioned Parquet — the storage layer available in this environment.
  *
  * At 100 TB these reads parallelize per parquet row-group; all queries
  * below project/filter *before* wide operations so Catalyst pushes the
  * scan down (check `PushedFilters`/`ReadSchema` in explain output).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and truncate to
    * micros with integer `div` — a double division would lose precision on
    * int64 nanosecond epochs (~1.7e18 > 2^53). Matches the ns→µs
    * truncation an engine with native ns support performs on cast.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
