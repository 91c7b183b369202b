package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY.md §4 / the 100 TB design
  * notes): when one join key carries a disproportionate share of the
  * rows, a plain shuffle join sends that key's whole partition to one
  * reducer. Salting splits the hot key across `saltFactor` reducers:
  * the big side gets a deterministic salt from a discriminator column,
  * the small side is replicated once per salt value.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) covers sort-merge joins automatically; explicit salting
  * remains the tool for aggregate-then-join patterns and for engines
  * where the skew is known up front. Results are identical to the
  * unsalted join — verified by property test.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, discriminator: String): DataFrame = {
    require(saltFactor > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(discriminator)), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
