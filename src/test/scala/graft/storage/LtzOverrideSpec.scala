package graft.storage

import graft.SparkSpec

/** The staged-write LTZ MICROS override is session-global conf, so
  * overlapping stages must refcount it: the first entry flips INT96 →
  * TIMESTAMP_MICROS, the LAST exit restores — an interleaved restore
  * would let a still-planning stage write stats-less INT96 files. */
class LtzOverrideSpec extends SparkSpec {

  private val TsKey = "spark.sql.parquet.outputTimestampType"

  test("overlapping enters keep MICROS until the last exit") {
    val prior = spark.conf.get(TsKey, "INT96")
    try {
      spark.conf.set(TsKey, "INT96")
      assert(ParquetCatalog.LtzMicrosOverride.enter(spark))
      assert(spark.conf.get(TsKey) == "TIMESTAMP_MICROS")
      // second concurrent stage enters while the first still writes
      assert(ParquetCatalog.LtzMicrosOverride.enter(spark))
      // first stage finishes: the conf must NOT flip back mid-flight
      ParquetCatalog.LtzMicrosOverride.exit(spark)
      assert(spark.conf.get(TsKey) == "TIMESTAMP_MICROS",
        "restore interleaved into a still-running stage")
      ParquetCatalog.LtzMicrosOverride.exit(spark)
      assert(spark.conf.get(TsKey) == "INT96")
    } finally spark.conf.set(TsKey, prior)
  }

  test("an explicit non-INT96 session choice is respected (no override)") {
    val prior = spark.conf.get(TsKey, "INT96")
    try {
      spark.conf.set(TsKey, "TIMESTAMP_MILLIS")
      assert(!ParquetCatalog.LtzMicrosOverride.enter(spark))
      assert(spark.conf.get(TsKey) == "TIMESTAMP_MILLIS")
    } finally spark.conf.set(TsKey, prior)
  }
}
