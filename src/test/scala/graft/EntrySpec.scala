package graft

/** Driver-contract smoke: the flagship entry must return non-empty,
  * bounded output on sf0.001 (what the driver checks each round). */
class EntrySpec extends SparkSpec {
  test("flagship entry returns a non-empty top-5") {
    val out = SparkEntry.entry(spark).collect()
    assert(out.nonEmpty && out.length <= 5)
    assert(out.head.schema.fieldNames.contains("technology_category"))
  }

  test("live query pack equals the committed inventory, name for name") {
    val in = getClass.getResourceAsStream("/graft/inventory.txt")
    assert(in != null, "missing graft/inventory.txt resource")
    val inventory =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    val live = SparkEntry.queries.keySet
    assert(live == inventory,
      s"dropped from pack: ${(inventory -- live).toSeq.sorted.mkString(",")}; " +
        s"not in inventory: ${(live -- inventory).toSeq.sorted.mkString(",")}")
    // every query has an oracle: the correctness gate covers the full pack
    assert(SparkEntry.oracleSql.keySet == live)
  }
}
