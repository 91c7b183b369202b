package graft

/** Driver-contract smoke: the flagship entry must return non-empty,
  * bounded output on sf0.001 (what the driver checks each round). */
class EntrySpec extends SparkSpec {
  test("flagship entry returns a non-empty top-5") {
    val out = SparkEntry.entry(spark).collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(out.head.schema.fieldNames.contains("technology_category"))
  }
}
